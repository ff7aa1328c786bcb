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

  // ----------------------------------------------- exact word-set Jaccard
  private def wordSet(text: Column): Column =
    array_distinct(split(lower(trim(text)), "\\s+"))

  /** All pairs with word-set Jaccard ≥ threshold. Exact — drives the
    * DuckDB oracle and the recall tests of the approximate variants.
    * Jaccard = |A∩B| / (|A|+|B|−|A∩B|), computed on integer counts (the
    * double division is bit-identical across engines).
    */
  def wordJaccardPairs(df: DataFrame, idCol: String, textCol: String,
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
    */
  def minHash(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(sh, s => xxhash64(s, h))))

  /** Banded LSH candidate pairs from minhash signatures: split the
    * signature into `numBands` bands, bucket by (band idx, band hash),
    * emit distinct id pairs sharing any bucket. The band self-join is the
    * only shuffle; buckets are pre-aggregated so only multi-member buckets
    * join.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, sigCol: String,
                    numBands: Int): DataFrame = {
    val rows = floor(size(col(sigCol)) / numBands).cast("int")
    val banded = sigs.select(col(idCol).as("id"),
        posexplode(transform(sequence(lit(0), lit(numBands - 1)),
          b => xxhash64(slice(col(sigCol), b * rows + 1, rows), b))))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")
    banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs, exact-verified: LSH prunes to candidates,
    * then each candidate pair is checked with exact shingle-set Jaccard.
    * `threshold` should sit near (1/numBands)^(numBands/numHashes) for the
    * usual S-curve; verification makes precision exact (recall is the
    * approximate part — asserted ≥ bound in tests).
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          shingleK: Int = 3, numHashes: Int = 32,
                          numBands: Int = 8,
                          threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleK)).as("sh"))
      .withColumn("mh", minHash(col("sh"), numHashes))
    val cand = lshCandidates(sh.select(col("id"), col("mh")), "id", "mh", numBands)
    val jac = size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
      size(array_union(col("a.sh"), col("b.sh"))).cast("double")
    cand.join(sh.as("a"), cand("a_id") === col("a.id"))
      .join(sh.as("b"), cand("b_id") === col("b.id"))
      .where(jac >= threshold)
      .select(col("a_id"), col("b_id"), round(jac, 4).as("jac"))
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

  // ----------------------------------------------- embedding-cosine dedup
  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Exact all-pairs cosine ≥ threshold via index-explode + equi-join —
    * the truth baseline (O(n²) pairs; fine at verify scale, superseded by
    * [[cosineNearDupLsh]] at corpus scale). Threshold is applied to the
    * 4 dp-rounded value so the oracle compare is FP-safe.
    */
  def cosinePairsExact(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val ex = df.select(col(idCol).as("id"), posexplode(toDouble(col(vecCol))))
      .toDF("id", "i", "v")
    val norms = ex.groupBy(col("id")).agg(sqrt(sum(col("v") * col("v"))).as("n"))
    val cos = round(col("dot") / (col("an") * col("bn")), 4)
    ex.as("a").join(ex.as("b"), col("a.i") === col("b.i") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(sum(col("a.v") * col("b.v")).as("dot"))
      .join(norms.withColumnRenamed("id", "a_id").withColumnRenamed("n", "an"), Seq("a_id"))
      .join(norms.withColumnRenamed("id", "b_id").withColumnRenamed("n", "bn"), Seq("b_id"))
      .where(cos >= threshold)
      .select(col("a_id"), col("b_id"), cos.as("cos"))
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
}
