package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kernel.TextStats

/** Deduplication operators for training-data pipelines, scale-first:
  *
  *  - exact dedup by content hash (the reference's memoization semantics,
  *    `cache_manager.py:23-25`, applied table-wide);
  *  - exact word-set Jaccard pairs (oracle-checkable; O(n²) in candidate
  *    pairs — the truth baseline for the approximate paths);
  *  - MinHash + banded LSH (Broder 1997 / MMDS ch.3): shingle → minhash
  *    signature → band buckets → candidate pairs → exact-Jaccard verify.
  *    All columnar (`transform`/`sequence`/`xxhash64`), no UDF: at scale
  *    the only shuffle is the band-bucket self-join, which AQE skew-splits;
  *  - SimHash (Charikar 2002) with the 4×16-bit pigeonhole block join:
  *    hamming ≤ 3 pairs are guaranteed to collide on ≥1 block;
  *  - embedding-cosine near-dup: exact all-pairs (small/verify) and a
  *    hyperplane-LSH bucketed variant (the 100 TB path).
  */
object Dedup {

  // ------------------------------------------------------------ exact dedup
  /** Keep one row per distinct `textCol` content (first by `idCol`). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = sha2(col(textCol), 256)
    df.withColumn("content_hash", h)
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
  }

  /** [[exact]]'s corpus-filter form: the SURVIVING rows with `df`'s full
    * schema — exactly one document (minimum `idCol`) per distinct
    * `textCol` content. One hash-partitioned window, no rejoin; the
    * standard FIRST dedup pass (cheap, catches the bulk) ahead of
    * [[nearDupFilter]].
    */
  def exactFilter(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  // ------------------------------------- incremental paragraph Bloom dedup

  /** Dolma-style incremental PARAGRAPH dedup against an at-rest Bloom
    * filter (Soldaini et al. 2024 §2.2 use exactly this shape to dedup
    * 3 T tokens): each document is split into paragraphs (`\n` units);
    * a paragraph seen in ANY earlier run — membership tracked by a
    * Bloom filter persisted under `bloomDir` — is removed, within-batch
    * duplicates keep their first occurrence (min `(doc, position)`),
    * and surviving paragraphs reassemble in original order. Documents
    * whose every paragraph was seen before drop out entirely.
    *
    * Why a Bloom filter at 100 TB: the seen-set is bounded RAM
    * (`expectedInsertions`·~10 bits regardless of corpus text size), the
    * probe is a broadcast + stateless map over the batch (ZERO shuffle
    * of prior runs' data), and false positives only OVER-remove — the
    * safe direction for training data (never re-admits a duplicate).
    * Membership keys are `xxhash64(paragraph)` LONGS on both the insert
    * and probe sides — the type-consistent discipline from
    * [[graft.ops.Relational.antiJoinBloom]]'s post-mortem; hash
    * collisions fold into the same over-removal budget as the fpp.
    *
    * The filter under `bloomDir` is REPLACED each run by (old ∪ this
    * batch's paragraphs) via temp-write + atomic rename — re-writing the
    * same batch leaves the filter unchanged, and for a given batch
    * SEQUENCE the decisions are deterministic. (The returned DataFrame
    * judges the batch against the PRIOR filter — consume it before
    * feeding the same rows again, as with any seen-set dedup.) Returns
    * `(idCol, clean_text, n_kept, n_dropped)`.
    */
  def paragraphBloomDedup(docs: DataFrame, idCol: String, textCol: String,
                          bloomDir: String,
                          expectedInsertions: Long = 1L << 22,
                          fpp: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(bloomDir)
    val fs = dirPath.getFileSystem(hconf)
    val filterPath = new org.apache.hadoop.fs.Path(dirPath, "bloom.bin")

    val prior: Option[org.apache.spark.util.sketch.BloomFilter] =
      if (fs.exists(filterPath)) {
        val in = fs.open(filterPath)
        try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(in))
        finally in.close()
      } else None

    val paras = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_para")))
      .where(trim(col("_para")) =!= "")
      .withColumn("_ph", xxhash64(col("_para")))

    // within-batch first occurrence: one hash-partitioned window, text
    // never shuffled twice (the _para column rides the same exchange)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_ph")).orderBy(col(idCol), col("_pos"))
    val firsts = paras.withColumn("_rn", row_number().over(w))

    val bc = prior.map(spark.sparkContext.broadcast(_))
    val seenBefore = bc match {
      case Some(f) =>
        val probe = udf((h: Long) => f.value.mightContainLong(h))
        probe(col("_ph"))
      case None => lit(false)
    }
    val kept = firsts
      .withColumn("_dup", col("_rn") > 1 || seenBefore)
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            filter(
              sort_array(collect_list(struct(col("_pos"), col("_para"), col("_dup")))),
              x => !x.getField("_dup")),
            x => x.getField("_para")),
          "\n").as("clean_text"),
        sum(when(col("_dup"), 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("_dup"), 1L).otherwise(0L)).as("n_dropped"))
      .where(col("n_kept") > 0)

    // grow the at-rest filter by THIS batch's distinct paragraph hashes
    // (kept and dropped alike — both are now "seen"); distributed build,
    // merged with the prior filter, swapped in atomically
    val batchFilter = paras.select(col("_ph")).distinct()
      .stat.bloomFilter("_ph", expectedInsertions, fpp)
    prior.foreach(batchFilter.mergeInPlace)
    // Saturation guard (ADVICE r05): the merged filter keeps the FIRST
    // run's bit-array size while insertions accumulate run over run, so
    // `expectedInsertions` must be sized for the LIFETIME corpus, not
    // one batch. Past that budget the false-positive rate climbs toward
    // 1 and novel paragraphs are silently over-removed — fail loudly at
    // the point of no return and warn well before it.
    val fppNow = batchFilter.expectedFpp()
    require(fppNow <= 0.5,
      f"paragraph Bloom filter under $bloomDir is saturated " +
        f"(expectedFpp=$fppNow%.3f): cumulative distinct paragraphs exceed " +
        f"expectedInsertions=$expectedInsertions - rebuild the filter with a " +
        f"lifetime-corpus-sized budget before deduping further batches")
    if (fppNow > math.min(0.5, fpp * 10))
      System.err.println(
        f"[paragraphBloomDedup] WARNING: filter at $bloomDir nearing " +
          f"saturation (expectedFpp=$fppNow%.4f vs configured $fpp%.4f); " +
          f"size expectedInsertions for the lifetime corpus")
    fs.mkdirs(dirPath)
    val tmp = new org.apache.hadoop.fs.Path(dirPath, s".bloom.${System.nanoTime()}.tmp")
    val out = fs.create(tmp, true)
    try batchFilter.writeTo(out) finally out.close()
    if (fs.exists(filterPath)) fs.delete(filterPath, false)
    require(fs.rename(tmp, filterPath), s"bloom filter swap failed under $bloomDir")
    kept
  }

  // ----------------------------------------------- exact word-set Jaccard
  private def wordSet(text: Column): Column =
    array_distinct(split(lower(trim(text)), "\\s+"))

  /** All pairs with word-set Jaccard ≥ threshold. Exact — drives the
    * DuckDB oracle and the recall tests of the approximate variants.
    * Jaccard = |A∩B| / (|A|+|B|−|A∩B|), computed on integer counts (the
    * double division is bit-identical across engines).
    *
    * Prefix-filtered (AllPairs, Bayardo et al. WWW'07): tokens are
    * globally ordered by (frequency, token) and only the rarest
    * ⌊(1−t)·|d|⌋+1 tokens of each doc join — two docs with Jaccard ≥ t
    * must share a prefix token under a common global order, so no pair
    * is lost, while frequent tokens (the n² blowup of the naive
    * every-token join) almost never reach the join. Candidates are then
    * verified with exact set intersection. Identical output to
    * [[wordJaccardPairsNaive]] (asserted in tests and by the DuckDB
    * oracle, which runs the naive algorithm).
    */
  def wordJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The tokenized frame feeds the frequency census, the prefix window
    // AND both verify joins; left as a plain plan every reference
    // re-derives scan → lower/split → distinct (12 parquet scans of the
    // corpus in the executed plan at r06 measurement). A LAZY local
    // checkpoint shares ONE materialization among all consumers — built
    // fresh per invocation (RDD-scoped, nothing survives the query), no
    // eager job at call time. Non-fault-tolerant storage is fine here:
    // this operator is the exact small-scale truth baseline, not the
    // 100 TB path ([[minhashNearDupPairs]] is).
    val sets = df.select(col(idCol).as("id"), wordSet(col(textCol)).as("ws"))
      .withColumn("nw", size(col("ws")))
      .localCheckpoint(false)
    val tok = sets.select(col("id"), col("nw"), explode(col("ws")).as("w"))
    val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("f"))
    // prefix length = |d| − ⌈t·|d|⌉ + 1 (smallest-shared-element lemma).
    // NOT floor((1−t)·|d|)+1: when t·|d| is an exact integer, (1−t) in FP
    // is slightly under (e.g. 0.0999…), making the prefix one token short
    // and losing qualifying pairs. The 1e-9 slack can only lengthen the
    // prefix (extra candidates are re-verified, never emitted wrongly).
    val prefixLen = col("nw") - ceil(lit(threshold) * col("nw") - lit(1e-9)) + 1
    // prefix is self-joined for candidates — one more lazy shared
    // materialization so the freq join + ranking window run once, not
    // twice (same rationale as `sets` above)
    val prefix = tok.join(freq, Seq("w"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("f"), col("w"))))
      .where(col("rk") <= prefixLen)
      .select(col("id"), col("w"))
      .localCheckpoint(false)
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    val jac = col("n_both").cast("double") /
      (col("na") + col("nb") - col("n_both")).cast("double")
    cand
      .join(sets.select(col("id").as("a_id"), col("ws").as("wsa"), col("nw").as("na")), Seq("a_id"))
      .join(sets.select(col("id").as("b_id"), col("ws").as("wsb"), col("nw").as("nb")), Seq("b_id"))
      .withColumn("n_both", size(array_intersect(col("wsa"), col("wsb"))))
      .where(jac >= threshold)
      .select(col("a_id"), col("b_id"), round(jac, 4).as("jac"))
  }

  /** The naive every-token self-join — O(Σ group²) over word groups, so
    * hot tokens make it quadratic. Kept as the executable spec
    * [[wordJaccardPairs]] is verified against.
    */
  def wordJaccardPairsNaive(df: DataFrame, idCol: String, textCol: String,
                            threshold: Double): DataFrame = {
    val t = df
      .select(col(idCol).as("id"), wordSet(col(textCol)).as("ws"))
      .withColumn("nw", size(col("ws")))
      .select(col("id"), col("nw"), explode(col("ws")).as("w"))
    val jac = col("n_both").cast("double") /
      (col("na") + col("nb") - col("n_both")).cast("double")
    t.as("a").join(t.as("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("n_both"), max(col("a.nw")).as("na"), max(col("b.nw")).as("nb"))
      .where(jac >= threshold)
      .select(col("a_id"), col("b_id"), round(jac, 4).as("jac"))
  }

  // ------------------------------------------------------- MinHash + LSH
  /** k-word shingles (lowercased); docs shorter than k collapse to one
    * whole-text shingle.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** MinHash signature: element h is min over shingles of xxhash64(s, h).
    * Fully columnar; xxhash64 is Spark's codegen'd 64-bit hash.
    *
    * Shaped as ONE `aggregate` traversal of the shingle array (accumulator
    * = the running per-hash minima) rather than numHashes independent
    * `array_min(transform(sh, …))` scans: the latter references `sh`
    * numHashes times, and after projection collapse Catalyst re-evaluates
    * the whole shingling expression per reference — a numHashes× blowup.
    * Signatures are identical (same xxhash64(s, h) values, same minima;
    * `sh` is never empty — [[shingles]] emits ≥ 1 element).
    */
  def minHash(sh: Column, numHashes: Int): Column =
    aggregate(sh,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
        (m, h) => least(m, xxhash64(s, h))))

  /** Banded LSH candidate pairs from minhash signatures: split the
    * signature into `numBands` bands, bucket by (band idx, band hash),
    * emit distinct id pairs sharing any bucket. The band self-join is the
    * only shuffle; buckets are pre-aggregated so only multi-member buckets
    * join.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, sigCol: String,
                    numBands: Int): DataFrame = {
    val banded = bandBuckets(sigs, idCol, sigCol, numBands)
    banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** `(id, band_idx, band_key)` rows — the banding stage shared by the
    * exact and capped candidate joins.
    */
  private def bandBuckets(sigs: DataFrame, idCol: String, sigCol: String,
                          numBands: Int): DataFrame = {
    val rows = floor(size(col(sigCol)) / numBands).cast("int")
    sigs.select(col(idCol).as("id"),
        posexplode(transform(sequence(lit(0), lit(numBands - 1)),
          b => xxhash64(slice(col(sigCol), b * rows + 1, rows), b))))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")
  }

  /** [[lshCandidates]] with a hot-bucket cap — the defense AQE cannot
    * provide. A band bucket with m members emits m(m−1)/2 pairs; a
    * near-dup-saturated corpus (mirror farms, boilerplate-only pages) puts
    * millions of ids in ONE bucket and the pair explosion is Ω(m²)
    * regardless of how AQE splits the join. Buckets over `maxBucket`
    * members therefore switch to a STAR topology: every member pairs with
    * the bucket's minimum id only (m−1 pairs). Precision is untouched
    * (every candidate is still exact-verified downstream); pair-level
    * recall inside a hot bucket drops by design, but CLUSTER-level
    * connectivity — what dedup consumes — is preserved: all members stay
    * reachable through the representative, and a saturated bucket is
    * saturated precisely because its members are mutual near-dups, so the
    * star edges survive verification (asserted in tests with a
    * pathological hot bucket).
    */
  def lshCandidatesCapped(sigs: DataFrame, idCol: String, sigCol: String,
                          numBands: Int, maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("band_idx"), col("band_key"))
    val sized = bandBuckets(sigs, idCol, sigCol, numBands)
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("rep", min(col("id")).over(w))
    val cold = sized.where(col("bsz") <= maxBucket)
      .select(col("id"), col("band_idx"), col("band_key"))
    val coldPairs = cold.as("a").join(cold.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
    // rep = min(id) of the bucket, so rep < id holds for every emitted row
    val hotPairs = sized.where(col("bsz") > maxBucket && col("id") =!= col("rep"))
      .select(col("rep").as("a_id"), col("id").as("b_id"))
    coldPairs.union(hotPairs).distinct()
  }

  /** Scala twin of `array_distinct(shingles(text, k))` — split/lower/trim
    * semantics match the columnar expressions exactly (split keeps empty
    * trailing fields like Spark's `split`, distinct keeps first
    * occurrence).
    */
  def shingleSet(text: String, k: Int): Array[String] = {
    // Spark's trim strips only ' ' (0x20), unlike String.trim which also
    // strips \n/\t — texts ending in '\n' keep it and split then yields a
    // trailing empty token that participates in shingles
    var b = 0
    var e = text.length
    while (b < e && text.charAt(b) == ' ') b += 1
    while (e > b && text.charAt(e - 1) == ' ') e -= 1
    val toks = text.substring(b, e).toLowerCase.split("\\s+", -1)
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length < k) out.add(toks.mkString(" "))
    else {
      var i = 0
      while (i + k <= toks.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        out.add(sb.toString); i += 1
      }
    }
    out.toArray(new Array[String](out.size))
  }

  /** Scala twin of [[minHash]], bit-identical: Spark's `xxhash64(s, h)`
    * chains XXH64 over its arguments (string with seed 42, then the long
    * index with the running hash as seed) — reproduced here on primitive
    * longs so the 10^2 shingles × 10^2 hash slots per doc don't go
    * through interpreted higher-order-function evaluation (CodegenFallback
    * boxes every element).
    */
  def minHashSig(sh: Array[String], numHashes: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val b = sh(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val base = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      var h = 0
      while (h < numHashes) {
        // the columnar twin's hash index comes from sequence(), which is
        // IntegerType — Spark hashes ints via hashInt, not hashLong
        val v = XXH64.hashInt(h, base)
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    sig
  }

  /** `(id, sh, mh)` signature rows — shingle set + MinHash signature per
    * document, the stage shared by the single-corpus pair job and the
    * at-rest cross-corpus index. null-text rows are dropped, preserving
    * the columnar twin's semantics (shingles(null) → null → no LSH row);
    * String.valueOf would have turned them into the literal "null" and
    * paired them all at jac=1.0.
    */
  private def sigRows(df: DataFrame, idCol: String, textCol: String,
                      shingleK: Int, numHashes: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val idField = df.schema(idCol)
    val outSchema = StructType(Seq(
      idField.copy(name = "id"),
      StructField("sh", ArrayType(StringType, containsNull = false)),
      StructField("mh", ArrayType(LongType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val textIdx = 1
    df.select(col(idCol), col(textCol)).mapPartitions { it =>
      it.flatMap { r =>
        if (r.isNullAt(textIdx)) Iterator.empty
        else {
          val s = shingleSet(r.getString(textIdx), shingleK)
          Iterator.single(org.apache.spark.sql.Row(r.get(0), s, minHashSig(s, numHashes)))
        }
      }
    }(enc)
  }

  /** MinHash-LSH near-dup pairs, exact-verified: LSH prunes to candidates,
    * then each candidate pair is checked with exact shingle-set Jaccard.
    * `threshold` should sit near (1/numBands)^(numBands/numHashes) for the
    * usual S-curve; verification makes precision exact (recall is the
    * approximate part — asserted ≥ bound in tests). Shingling + signature
    * run as a typed per-row kernel (values identical to the columnar
    * [[shingles]]/[[minHash]] expressions, asserted in tests); the only
    * shuffle is the band-bucket self-join. A finite `maxBucket` routes
    * band buckets larger than the cap through [[lshCandidatesCapped]]'s
    * star topology (the hot-bucket Ω(m²) defense).
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          shingleK: Int = 3, numHashes: Int = 32,
                          numBands: Int = 8,
                          threshold: Double = 0.8,
                          maxBucket: Int = Int.MaxValue): DataFrame = {
    val sh = sigRows(df, idCol, textCol, shingleK, numHashes)
    val cand =
      if (maxBucket == Int.MaxValue)
        lshCandidates(sh.select(col("id"), col("mh")), "id", "mh", numBands)
      else
        lshCandidatesCapped(sh.select(col("id"), col("mh")), "id", "mh", numBands, maxBucket)
    val jac = size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
      size(array_union(col("a.sh"), col("b.sh"))).cast("double")
    cand.join(sh.as("a"), cand("a_id") === col("a.id"))
      .join(sh.as("b"), cand("b_id") === col("b.id"))
      .where(jac >= threshold)
      .select(col("a_id"), col("b_id"), round(jac, 4).as("jac"))
  }

  /** The END-TO-END corpus near-dedup job as ONE call — the FineWeb /
    * RefinedWeb-style pipeline stage: MinHash signatures → banded-LSH
    * candidates (hot buckets star-capped) → exact shingle-Jaccard verify
    * ([[minhashNearDupPairs]]) → connected components (pointer doubling,
    * [[connectedComponents]]) → keep exactly ONE document per cluster
    * (the minimum id — deterministic canonical representative) plus
    * every document that near-dups nothing. Returns the SURVIVING
    * corpus with `df`'s full schema.
    *
    * Scale shape: the only shuffles are the band-bucket self-join, the
    * CC rounds (hash-partitioned, O(log diameter)), and one final
    * left-anti join of the corpus against the loser ids — each already
    * individually 100 TB-vetted; nothing new is materialized beyond the
    * pair list.
    */
  def nearDupFilter(df: DataFrame, idCol: String, textCol: String,
                    shingleK: Int = 3, numHashes: Int = 32,
                    numBands: Int = 8, threshold: Double = 0.8,
                    maxBucket: Int = 4096): DataFrame = {
    val pairs = minhashNearDupPairs(df, idCol, textCol, shingleK, numHashes,
      numBands, threshold, maxBucket)
    val clusters = connectedComponents(pairs)
    // every clustered id except its component's minimum is a loser; docs
    // absent from the pair list survive untouched (left_anti keeps them)
    val losers = clusters.where(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  // ---------------------------- incremental cross-corpus dedup (at rest)

  /** Materialize a REFERENCE corpus's MinHash signatures at rest — the
    * incremental-crawl dedup shape: the existing 100 TB corpus is
    * signatured ONCE; every new crawl batch then dedups against
    * `{dir}/sigs` without re-reading (or even retaining) the reference
    * TEXT — the stored shingle sets make candidate verification
    * self-contained. Layout: `{dir}/sigs` = (id, sh, mh) parquet,
    * `{dir}/meta` = one row pinning (shingle_k, num_hashes, num_bands)
    * so probes can never band-mismatch the index.
    */
  def writeMinhashIndex(df: DataFrame, idCol: String, textCol: String,
                        dir: String, shingleK: Int = 3, numHashes: Int = 32,
                        numBands: Int = 8): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    sigRows(df, idCol, textCol, shingleK, numHashes)
      .write.mode("overwrite").parquet(s"$dir/sigs")
    Seq((shingleK, numHashes, numBands))
      .toDF("shingle_k", "num_hashes", "num_bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** GROW a signature index by one batch — the streaming/incremental
    * writer: `{dir}/sigs` gains this batch's rows under a
    * `batch_id=N` partition via DYNAMIC overwrite, so a replayed batch
    * rewrites exactly its own partition (idempotent under at-least-once
    * delivery — the property [[graft.streaming.StreamingRun]]'s
    * near-dup stream leans on). The first append also pins the meta row;
    * later appends REQUIRE matching parameters instead of silently
    * band-mismatching the existing signatures.
    */
  def appendMinhashSigs(df: DataFrame, idCol: String, textCol: String,
                        dir: String, batchId: Long,
                        shingleK: Int = 3, numHashes: Int = 32,
                        numBands: Int = 8): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/meta")
    // the PATH's filesystem, not the default one — an s3a:// index on an
    // hdfs-default cluster must not throw Wrong FS
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(metaPath)) {
      val meta = spark.read.parquet(s"$dir/meta")
        .select(col("shingle_k"), col("num_hashes"), col("num_bands")).head()
      require(meta.getInt(0) == shingleK && meta.getInt(1) == numHashes &&
        meta.getInt(2) == numBands,
        s"index $dir pins (k=${meta.getInt(0)}, hashes=${meta.getInt(1)}, " +
          s"bands=${meta.getInt(2)}); refusing mismatched append")
    } else {
      Seq((shingleK, numHashes, numBands))
        .toDF("shingle_k", "num_hashes", "num_bands")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
    // a writeMinhashIndex layout has data files at the sigs root; adding
    // batch_id=N dirs next to them breaks partition discovery — refuse
    // loudly instead of corrupting the index
    val sigsPath = new org.apache.hadoop.fs.Path(s"$dir/sigs")
    if (fs.exists(sigsPath))
      require(!fs.listStatus(sigsPath).exists(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet")),
        s"$dir/sigs is an unpartitioned writeMinhashIndex layout; " +
          "appendMinhashSigs needs a batch-partitioned index dir")
    sigRows(df, idCol, textCol, shingleK, numHashes)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$dir/sigs")
  }

  /** Exact-verified near-dup pairs of a NEW batch against a
    * [[writeMinhashIndex]] index: `(new_id, ref_id, jac)`. Signature
    * parameters come from the index's own meta row — a probe cannot
    * band-mismatch what was written. The only corpus-scale shuffle is
    * the (band, key) equi-join of the new batch's bands against the
    * index's; `maxBucket` bounds a hot bucket's REF side to its
    * `maxBucket` smallest ids (a new doc in a saturated bucket still
    * meets enough representatives to be verified and dropped — the
    * DROP decision needs ONE surviving match, so the cap costs pair
    * completeness, not dedup correctness, mirroring
    * [[lshCandidatesCapped]]'s star argument).
    */
  def minhashPairsAgainstIndex(newDf: DataFrame, idCol: String,
                               textCol: String, dir: String,
                               threshold: Double = 0.8,
                               maxBucket: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = newDf.sparkSession
    val meta = spark.read.parquet(s"$dir/meta")
      .select(col("shingle_k"), col("num_hashes"), col("num_bands"))
      .head()
    val (shingleK, numHashes, numBands) =
      (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val refSigs = spark.read.parquet(s"$dir/sigs")
    val newSigs = sigRows(newDf, idCol, textCol, shingleK, numHashes)
    val newB = bandBuckets(newSigs.select(col("id"), col("mh")), "id", "mh", numBands)
    val refB0 = bandBuckets(refSigs.select(col("id"), col("mh")), "id", "mh", numBands)
    val refB =
      if (maxBucket == Int.MaxValue) refB0
      else {
        val w = Window.partitionBy(col("band_idx"), col("band_key"))
          .orderBy(col("id"))
        refB0.withColumn("_rn", row_number().over(w))
          .where(col("_rn") <= maxBucket).drop("_rn")
      }
    val cand = newB.as("n").join(refB.as("r"),
        col("n.band_idx") === col("r.band_idx") &&
          col("n.band_key") === col("r.band_key"))
      .select(col("n.id").as("new_id"), col("r.id").as("ref_id"))
      .distinct()
    val jac = size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
      size(array_union(col("a.sh"), col("b.sh"))).cast("double")
    cand.join(newSigs.as("a"), cand("new_id") === col("a.id"))
      .join(refSigs.as("b"), cand("ref_id") === col("b.id"))
      .where(jac >= threshold)
      .select(col("new_id"), col("ref_id"), round(jac, 4).as("jac"))
  }

  /** The incremental-crawl filter: the NEW batch minus every document
    * near-duplicating the at-rest reference corpus. Full input schema
    * preserved; null-text rows survive (they have no signature and can
    * match nothing, like [[nearDupFilter]]).
    */
  def dedupAgainstIndex(newDf: DataFrame, idCol: String, textCol: String,
                        dir: String, threshold: Double = 0.8,
                        maxBucket: Int = Int.MaxValue): DataFrame = {
    val losers = minhashPairsAgainstIndex(newDf, idCol, textCol, dir,
      threshold, maxBucket)
      .select(col("new_id").as(idCol)).distinct()
    newDf.join(losers, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------------- SimHash
  /** 64-bit SimHash per row via the [[TextStats]] kernel (typed stage). */
  def simHashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, TextStats.simHash64(TextStats.tokens(text)))
      })
      .toDF("id", "simhash")
  }

  /** Near-dup pairs with hamming(simhash) ≤ maxHamming (≤ 3 for exactness):
    * pigeonhole on 4×16-bit blocks — any pair within hamming 3 agrees on at
    * least one block, so the block-equality join loses no pairs; the
    * `bit_count(xor)` verify makes precision exact.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = simHashes(df, idCol, textCol)
    val blocked = sigs.select(col("id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "block_idx").withColumnRenamed("col", "block_val")
    val ham = expr("bit_count(a.simhash ^ b.simhash)")
    blocked.as("a").join(blocked.as("b"),
        col("a.block_idx") === col("b.block_idx") &&
          col("a.block_val") === col("b.block_val") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"), ham.as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  // ---------------------------------------- generic 64-bit Hamming dedup
  /** Near-dup pairs over ANY 64-bit hash column (SimHash, dHash, pHash,
    * any fingerprint) with `hamming ≤ maxHamming` — EXACT recall at
    * corpus scale via multi-index Hamming (Norouzi & Fleet, CVPR'12):
    * the hash splits into four 16-bit blocks; a pair within Hamming r
    * must agree within d = r/4 bits on at least ONE block (pigeonhole —
    * all four blocks differing by ≥ d+1 would total ≥ 4d+4 > r). The
    * probe side therefore explodes each block value to its full
    * radius-d Hamming ball (C(16,≤d) = 1/17/137 variants for d=0/1/2)
    * and the candidate step is a plain (block_idx, value) equi-join —
    * shuffle-shaped, AQE-splittable, never a similarity join. The
    * `bit_count(xor)` verify makes precision exact, so the pair list is
    * exactly the Hamming-ball graph.
    *
    * This generalizes [[simHashPairs]]'s fixed d=0 block join to radius
    * d ≤ 2, i.e. maxHamming ≤ 11 — past that the ball enumeration stops
    * paying for itself and a caller should band a wider hash instead.
    */
  def hammingPairs64(sigs: DataFrame, idCol: String, hashCol: String,
                     maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 11,
      s"hammingPairs64: maxHamming=$maxHamming outside [0,11] " +
        "(4 blocks x radius-2 balls cover at most 11)")
    val d = maxHamming / 4
    val masks: Seq[Long] = {
      val b = Seq.newBuilder[Long]
      b += 0L
      if (d >= 1) for (i <- 0 until 16) b += 1L << i
      if (d >= 2)
        for (i <- 0 until 16; j <- i + 1 until 16) b += (1L << i) | (1L << j)
      b.result()
    }
    val base = sigs.select(col(idCol).cast("long").as("id"),
      col(hashCol).cast("long").as("h"))
    val index = base.select(col("id"), col("h"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("h"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "block_idx").withColumnRenamed("col", "block_val")
    val probes =
      if (masks.size == 1) index
      else index.select(col("id"), col("h"), col("block_idx"),
        explode(array(masks.map(m =>
          col("block_val").bitwiseXOR(lit(m))): _*)).as("block_val"))
    val ham = expr("bit_count(a.h ^ b.h)")
    probes.as("a").join(index.as("b"),
        col("a.block_idx") === col("b.block_idx") &&
          col("a.block_val") === col("b.block_val") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"), ham.as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** `(id, cluster)` for EVERY input row, clustering by transitive
    * Hamming proximity of a 64-bit hash: identical hashes collapse FIRST
    * (one groupBy — a mirror-heavy crawl's exact re-posts never reach
    * the pair join), [[hammingPairs64]] connects the distinct hash
    * values, and [[connectedComponents]] elects each component's minimum
    * id. Singletons map to themselves. Because each hash group's
    * representative is its minimum id, the component minimum over
    * representatives IS the global minimum over member ids — the label
    * is the same one a pair-per-duplicate construction would elect,
    * without materializing quadratic pairs inside identical-hash groups.
    */
  def hammingClusters(sigs: DataFrame, idCol: String, hashCol: String,
                      maxHamming: Int): DataFrame = {
    val base = sigs.select(col(idCol).cast("long").as("id"),
      col(hashCol).cast("long").as("h"))
    val reps = base.groupBy(col("h")).agg(min(col("id")).as("rep"))
    val cross = hammingPairs64(reps.select(col("rep").as("id"), col("h")),
      "id", "h", maxHamming).select(col("a_id"), col("b_id"))
    val cc = connectedComponents(cross)
    val repCluster = reps.join(cc, reps("rep") === cc("id"), "left")
      .select(col("h"), coalesce(col("cluster"), col("rep")).as("cluster"))
    base.join(repCluster, "h").select(col("id"), col("cluster"))
  }

  // -------------------------------------------- pair → cluster resolution
  /** Connected components over near-dup pairs — the step that turns pair
    * lists (exact, MinHash, SimHash, cosine — any of the operators above)
    * into dedup CLUSTERS with a canonical representative (the minimum
    * id). Min-label propagation WITH pointer doubling: each round every
    * node takes the smallest label in its closed neighborhood (one
    * hash-partitioned join + one aggregate, the Pregel-style hop), then
    * chases its own label one step (`cluster := label(cluster)`, a second
    * keyed join over the same map). The hop alone converges in
    * O(component diameter) rounds; the doubling step compresses label
    * chains geometrically, so the combined round count is
    * O(log diameter) — a path of 10^6 chained near-dups resolves in ~20
    * rounds instead of 10^6, and `maxIter = 25` covers any diameter a
    * physical corpus can produce (≈2^25 hops). If the cap is somehow
    * exhausted anyway, the call FAILS (require) rather than returning
    * silently split clusters — under-dedup that nothing downstream could
    * detect.
    *
    * Each round TRUNCATES lineage (`localCheckpoint(eager = true)`) —
    * `persist` alone is not enough for an iterative self-joining plan:
    * the cached data short-circuits execution but the *logical* tree
    * still nests 4× per round (two copies of `hop`, each holding two
    * copies of `labels`), so analysis cost grows exponentially and OOMs
    * the driver near round 10. Checkpointing replaces the tree with a
    * flat scan of the materialized rows; on a real cluster the same
    * call site takes `sparkContext.setCheckpointDir` + `checkpoint()`
    * for fault-tolerant truncation.
    *
    * Returns `(id, cluster)` for every id appearing in `pairs`, where
    * `cluster` is the component's minimum id.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "a_id",
                          bCol: String = "b_id",
                          maxIter: Int = 25): DataFrame =
    connectedComponentsWithStats(pairs, aCol, bCol, maxIter)._1

  /** [[connectedComponents]] plus the number of propagation rounds it
    * took to converge — the observable the deep-chain tests and the
    * BENCH.md large-component evidence pin (rounds ≈ log2(diameter)).
    */
  def connectedComponentsWithStats(pairs: DataFrame, aCol: String = "a_id",
                                   bCol: String = "b_id",
                                   maxIter: Int = 25): (DataFrame, Int) = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist() // lazily: the labels init below materializes the cache
      // (an explicit count() here was one more driver barrier per call)
    // a localCheckpoint'd frame pins its materialized rows in the block
    // manager until GC'd; an iterative loop must release superseded
    // rounds EXPLICITLY or N rounds pin 2N+1 copies of the label table
    def ckptRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    var labelsRdd = ckptRdd(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("cluster")).as("nbr"))
      // hop: min label over the closed neighborhood. PERSISTED (lazy),
      // not localCheckpoint'd (r06): hop is consumed twice by the
      // doubling self-join below, the cache keeps that one physical
      // computation, and the round's single eager materialization of
      // `next` truncates lineage exactly as before — one action barrier
      // per round instead of three. `_old` rides along so convergence is
      // a filter over the materialized round result, not another join.
      val hop = labels.as("l")
        .join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("l.id").as("id"),
          least(col("l.cluster"), coalesce(col("nbr"), col("l.cluster"))).as("cluster"),
          col("l.cluster").as("_old"))
        .persist()
      // pointer doubling: cluster := label(cluster). Every label is a
      // node id of the same component, so the lookup stays in-component
      // and is monotone non-increasing; left join + coalesce keeps the
      // row when the label's own row hasn't updated yet this round.
      val nextFull = hop.as("h")
        .join(hop.as("p"), col("h.cluster") === col("p.id"), "left")
        .select(col("h.id").as("id"),
          least(col("h.cluster"),
            coalesce(col("p.cluster"), col("h.cluster"))).as("cluster"),
          col("h._old").as("_old"))
        .localCheckpoint(true)
      val changed = nextFull
        .where(col("cluster") =!= col("_old")).limit(1).count() > 0
      val next = nextFull.drop("_old")
      // next is materialized (eager) and changed computed: the previous
      // round's blocks are dead weight now
      hop.unpersist()
      labelsRdd.foreach(_.unpersist(false))
      labels = next
      labelsRdd = ckptRdd(nextFull)
      converged = !changed
      it += 1
    }
    edges.unpersist()
    require(converged,
      s"connectedComponents did not converge within maxIter=$maxIter " +
        s"rounds - with pointer doubling that is a component of diameter " +
        s"~2^$maxIter; raise maxIter rather than accept split clusters")
    (labels, it)
  }

  // ----------------------------------------------- embedding-cosine dedup
  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Exact all-pairs cosine ≥ threshold — the truth baseline (O(n²·d),
    * superseded by [[cosineNearDupLsh]] at corpus scale). The vector set
    * is collected and broadcast (the same smaller-side-fits contract as a
    * broadcast join: n·d doubles, e.g. 10^6×128 ≈ 1 GB is the ceiling)
    * and every executor computes its rows' dot products against the
    * broadcast side in primitive arrays — Spark's higher-order array
    * functions are CodegenFallback (interpreted + boxed per element), two
    * orders of magnitude slower for this. `idCol` must be numeric.
    * Rounding is HALF_UP at 4 dp (matches `round(x, 4)` in Spark/DuckDB)
    * and the threshold applies to the rounded value — FP-safe compares.
    */
  def cosinePairsExact(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .as[(Long, Array[Double])]
    def norm(v: Array[Double]): Double = {
      var s = 0.0; var k = 0
      while (k < v.length) { s += v(k) * v(k); k += 1 }
      math.sqrt(s)
    }
    // enforce the documented smaller-side-fits contract instead of OOMing
    // inside collect(): past ~10^6×128 doubles the LSH twin is the path.
    // limit(2^20+1) bounds the collect itself (no pre-count pass — a
    // count() here re-scanned and re-decoded the whole table per call)
    val all0 = typed.limit((1 << 20) + 1).collect()
    require(all0.length <= (1 << 20),
      s"cosinePairsExact is the exact verify baseline (n <= 2^20 vectors); " +
        s"got more - use cosineNearDupLshMulti for corpus-scale near-dup")
    val all = all0.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(
      (all.map(_._1), all.map(_._2), all.map(p => norm(p._2))))
    typed.mapPartitions { it =>
      val (ids, vecs, ns) = bc.value
      it.flatMap { case (id, v) =>
        val na = norm(v)
        val out = Vector.newBuilder[(Long, Long, Double)]
        var j = 0
        while (j < ids.length) {
          if (ids(j) > id) {
            val w = vecs(j)
            var dot = 0.0; var k = 0
            while (k < v.length && k < w.length) { dot += v(k) * w(k); k += 1 }
            val cos = new java.math.BigDecimal(dot / (na * ns(j)))
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
            if (cos >= threshold) out += ((id, ids(j), cos))
          }
          j += 1
        }
        out.result()
      }
    }.toDF("a_id", "b_id", "cos")
  }

  /** Scale path: random-hyperplane LSH buckets (sign signature over
    * `planes`), exact cosine verify within buckets. Recall is tunable via
    * plane count / multiple tables ([[Similarity.annLshTopK]]); precision
    * is exact.
    */
  def cosineNearDupLsh(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, planes: Seq[Seq[Double]]): DataFrame = {
    val sig = Similarity.hyperplaneSig(col(vecCol), planes)
    val withSig = df.select(col(idCol).as("id"), col(vecCol).as("vec"), sig.as("bucket"))
    val cosv = round(Similarity.cosine(col("a.vec"), col("b.vec")), 4)
    withSig.as("a").join(withSig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"), cosv.as("cos"))
      .where(col("cos") >= threshold)
  }

  /** OR-amplified [[cosineNearDupLsh]]: `tables` independent hyperplane
    * tables (seeds `seed..seed+tables-1`), candidates = pairs sharing a
    * bucket in ANY table (union + distinct), then one exact cosine verify.
    * Recall per pair at angle θ is 1 − (1 − (1−θ/π)^planesPerTable)^tables
    * — tunable to the corpus' near-dup band; precision stays exact. The
    * per-table bucket self-joins are the only shuffles (AQE skew-splits
    * hot buckets), so the shape survives corpus scale.
    *
    * Signatures and the cosine verify both run as typed primitive-array
    * kernels ([[Similarity.sigOf]] is asserted bit-identical to the
    * columnar [[Similarity.hyperplaneSig]]; the verify rounds HALF_UP at
    * 4 dp exactly like `round(x, 4)`): Spark's higher-order array
    * functions are CodegenFallback, and the interpreted fold over
    * |candidates| × 3 array traversals dominated this operator's
    * wall-time before the kernel rewrite (5.8 s → sub-second at sf0.1).
    */
  def cosineNearDupLshMulti(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, tables: Int = 2,
                            planesPerTable: Int = 4, dim: Int = 64,
                            seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df
      .select(col(idCol).cast("long"), transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Array[Double])]
    val planesAll: Array[Array[Array[Double]]] = (0 until tables).map(t =>
      Similarity.randomPlanes(planesPerTable, dim, seed + t).map(_.toArray).toArray).toArray
    val sigs = typed.mapPartitions { it =>
      it.flatMap { case (id, v) =>
        Iterator.tabulate(planesAll.length)(t => (id, t, Similarity.sigOf(v, planesAll(t))))
      }
    }.toDF("id", "t", "bucket")
    val cand = sigs.as("a").join(sigs.as("b"),
        col("a.t") === col("b.t") &&
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id")).distinct()
    val withVec = typed.toDF("id", "vec")
    cand.join(withVec.as("a"), cand("a_id") === col("a.id"))
      .join(withVec.as("b"), cand("b_id") === col("b.id"))
      .select(col("a_id"), col("b_id"), col("a.vec").as("va"), col("b.vec").as("vb"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .mapPartitions { it =>
        def norm(v: Array[Double]): Double = {
          var s = 0.0; var k = 0
          while (k < v.length) { s += v(k) * v(k); k += 1 }
          math.sqrt(s)
        }
        it.flatMap { case (a, b, va, vb) =>
          var dot = 0.0; var k = 0
          val n = math.min(va.length, vb.length)
          while (k < n) { dot += va(k) * vb(k); k += 1 }
          val cos = new java.math.BigDecimal(dot / (norm(va) * norm(vb)))
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          if (cos >= threshold) Iterator.single((a, b, cos)) else Iterator.empty
        }
      }.toDF("a_id", "b_id", "cos")
  }
}
