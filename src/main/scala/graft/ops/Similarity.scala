package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`): brute-force cosine top-k as the exact baseline, and
  * a multi-table random-hyperplane LSH variant as the scale path
  * (Indyk–Motwani / Charikar SRP-LSH — public algorithms, built from
  * scratch on Catalyst primitives: `zip_with`, `aggregate`, `transform`).
  */
object Similarity extends Serializable {

  /** Sequential-fold dot product in double precision (deterministic:
    * left-to-right over the array, same order every run/engine).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Deterministic pseudo-random unit hyperplanes (seeded; no wall-clock). */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Sign signature of `vec` against `planes`, packed into one long:
    * bit b = (vec · planes(b)) > 0. Columnar — each plane is a literal
    * array, the dot is a codegen'd fold.
    */
  def hyperplaneSig(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      when(dot(vec, typedLit(p)) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact brute-force cosine top-k for one query id: broadcast the single
    * query row, score all, take k. The ranking key is the 6 dp-rounded
    * similarity with id tie-break, so the cut is total and deterministic.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val q = df.where(col(idCol) === queryId).select(col(vecCol).as("qv"))
    df.crossJoin(broadcast(q))
      .select(col(idCol), round(cosine(col(vecCol), col("qv")), 6).as("sim"))
      .orderBy(desc("sim"), asc(idCol))
      .limit(k)
  }

  /** Scala twin of [[dot]]/[[hyperplaneSig]]: identical left-to-right FP
    * fold, run on primitive arrays — Spark's higher-order array functions
    * are CodegenFallback (interpreted, boxed per element), which makes the
    * per-row planes×dims signature loop the dominant cost columnar.
    */
  def sigOf(v: Array[Double], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var s = 0.0
      var j = 0
      val n = math.min(v.length, p.length)
      while (j < n) { s += v(j) * p(j); j += 1 }
      if (s > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** IVF (inverted-file) ANN: vectors are partitioned into `nlist` cells
    * by nearest centroid and a query probes only the `nprobe` closest
    * cells, scoring those exactly — the classic coarse-quantizer design
    * (Sivic–Zisserman "Video Google" inverted files; IVF-Flat in FAISS
    * terms), built from scratch.
    *
    * Centroids are trained with Lloyd iterations ON THE DRIVER over a
    * seeded, bounded sample (default 2048 vectors, ordered by
    * xxhash64(id)): distributed FP reductions sum in nondeterministic
    * order, so driver-side sequential training is what keeps centroids —
    * and therefore cell assignment — bit-stable run to run. Training on
    * a sample and assigning the full corpus distributively is also the
    * correct 100 TB shape (assignment is the only full-data pass, a
    * stateless typed map; at rest the table would be written bucketed by
    * `cell` so probes prune partitions).
    *
    * With `nprobe == nlist` every cell is probed and the result equals
    * [[bruteForceTopK]] exactly (asserted in tests); smaller `nprobe`
    * trades recall for a ~nlist/nprobe scan reduction.
    */
  /** Squared-L2 nearest centroid (sequential scan, deterministic).
    * Loops over the CENTROID's dimensionality: a shorter (corrupt)
    * vector fails fast with an index error instead of being silently
    * scored on a prefix and baked into the wrong cell.
    */
  private[graft] def nearestCell(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cs.length) {
      val w = cs(c); var d = 0.0; var j = 0
      while (j < w.length) { val t = v(j) - w(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Lloyd iterations over a driver-side sample (sequential FP folds keep
    * the centroids — and therefore cell assignment — bit-stable run to
    * run; a distributed reduction would sum in nondeterministic order).
    */
  private[graft] def trainCentroids(sample: Array[Array[Double]], nlist: Int,
                                    iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    var centroids = Array.tabulate(math.min(nlist, sample.length))(i => sample(i).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val c = nearestCell(v, centroids)
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
        counts(c) += 1
      }
      centroids = Array.tabulate(centroids.length) { c =>
        if (counts(c) == 0) centroids(c) // empty cell keeps its centroid
        else { val s = sums(c); var j = 0; while (j < dim) { s(j) /= counts(c); j += 1 }; s }
      }
      it += 1
    }
    centroids
  }

  /** The `nprobe` cells nearest to a query vector. */
  private[graft] def probeCells(qv: Array[Double], centroids: Array[Array[Double]],
                                nprobe: Int): Seq[Int] = {
    val dim = qv.length
    centroids.indices
      .sortBy { c =>
        var d = 0.0; var j = 0
        while (j < dim && j < centroids(c).length) {
          val t = qv(j) - centroids(c)(j); d += t * t; j += 1
        }
        d
      }
      .take(math.min(nprobe, centroids.length))
  }

  /** The shared IVF front half — seeded deterministic sample →
    * driver-trained centroids → broadcast, plus the typed (id, vec)
    * view. ONE implementation so [[ivfTopK]], [[ivfBuildIndex]] and
    * [[ivfTopKBatch]] can never drift apart on sampling or training
    * (their equality contracts are test-pinned).
    */
  private def trainBroadcast(df: DataFrame, idCol: String, vecCol: String,
                             nlist: Int, iters: Int, sampleN: Int, seed: Long)
      : (org.apache.spark.sql.Dataset[(Long, Array[Double])],
         org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df
      .select(col(idCol).cast("long"), transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Array[Double])]
    val sample = typed.toDF("id", "vec")
      .orderBy(xxhash64(col("id"), lit(seed)), col("id")).limit(sampleN)
      .as[(Long, Array[Double])].collect()
    require(sample.nonEmpty, "empty input")
    val centroids = trainCentroids(sample.map(_._2), nlist, iters)
    (typed, spark.sparkContext.broadcast(centroids))
  }

  /** The one full-corpus pass: stateless nearest-centroid assignment. */
  private def assignCells(typed: org.apache.spark.sql.Dataset[(Long, Array[Double])],
                          bcC: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])
      : DataFrame = {
    val spark = typed.sparkSession
    import spark.implicits._
    typed.mapPartitions { rows =>
      val cs = bcC.value
      rows.map { case (id, v) => (id, v, nearestCell(v, cs)) }
    }.toDF("id", "vec", "cell")
  }

  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 3,
              sampleN: Int = 2048, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (typed, bcC) = trainBroadcast(df, idCol, vecCol, nlist, iters, sampleN, seed)
    // ---- probe list (driver — the single-query operator's one lookup) ----
    val qv = typed.toDF("id", "vec").where(col("id") === queryId)
      .as[(Long, Array[Double])].head()._2
    val probed: Set[Int] = probeCells(qv, bcC.value, nprobe).toSet
    // ---- assign + scan probed cells (distributed, one typed pass) ----
    val probedDf = assignCells(typed, bcC).where(col("cell").isInCollection(probed))
    probedDf.crossJoin(broadcast(
        typed.toDF("id", "vec").where(col("id") === queryId).select(col("vec").as("qv"))))
      .select(col("id"), round(cosine(col("vec"), col("qv")), 6).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }

  /** Primitive cosine rounded to 6 dp exactly like Spark's
    * `round(col, 6)` (BigDecimal.valueOf = decimal string repr, HALF_UP)
    * — so the typed batch kernel is bit-identical to the columnar
    * [[cosine]] + `round` path the single-query operators use.
    */
  private[graft] def cos6(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
    val n = math.min(a.length, b.length)
    while (j < n) { dot += a(j) * b(j); j += 1 }
    j = 0
    while (j < a.length) { na += a(j) * a(j); j += 1 }
    j = 0
    while (j < b.length) { nb += b(j) * b(j); j += 1 }
    val c = dot / (math.sqrt(na) * math.sqrt(nb))
    // Spark's round() passes NaN/Infinity through untouched — a zero-norm
    // vector must yield a NaN row here too, not a BigDecimal.valueOf
    // NumberFormatException that kills the whole batch job
    if (java.lang.Double.isNaN(c) || java.lang.Double.isInfinite(c)) c
    else java.math.BigDecimal.valueOf(c)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** [[cos6]] at 4 dp — the precision the [[Dedup]] cosine-dedup family
    * standardizes on (`round(x, 4)` parity; NaN/Infinity pass through).
    */
  private[graft] def cos4(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
    val n = math.min(a.length, b.length)
    while (j < n) { dot += a(j) * b(j); j += 1 }
    j = 0
    while (j < a.length) { na += a(j) * a(j); j += 1 }
    j = 0
    while (j < b.length) { nb += b(j) * b(j); j += 1 }
    val c = dot / (math.sqrt(na) * math.sqrt(nb))
    if (java.lang.Double.isNaN(c) || java.lang.Double.isInfinite(c)) c
    else java.math.BigDecimal.valueOf(c)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** BATCH IVF top-k — the shape a 100 TB dedup actually runs: millions
    * of probe queries as a DataFrame, ZERO driver round-trips per query
    * (the single-query [[ivfTopK]] collects its one probe vector on the
    * driver; here assignment, probing, scoring and the top-k cut are all
    * distributed). Per query:
    *
    *  1. the query is assigned to its `nprobe` nearest cells (typed map
    *     over broadcast centroids, `nprobe` rows per query);
    *  2. the corpus — assigned to cells in one stateless pass — is
    *     equi-joined on `cell`, so each query scores only `~nprobe/nlist`
    *     of the corpus (the join is THE scan reduction; hash-partitioned
    *     on cell, AQE skew-splits hot cells);
    *  3. candidates are scored with the primitive cosine kernel and cut
    *     to k per query by a `row_number` window over (qid) — also
    *     hash-partitioned, no global sort.
    *
    * With `nprobe == nlist` the result equals [[bruteForceTopK]] run per
    * query (asserted in tests); smaller `nprobe` trades recall for the
    * scan reduction. Returns `(qid, id, sim)`, k rows per query, ties
    * broken (sim desc, id asc).
    */
  def ivfTopKBatch(corpus: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String,
                   qidCol: String, qvecCol: String,
                   k: Int, nlist: Int = 16, nprobe: Int = 4, iters: Int = 3,
                   sampleN: Int = 2048, seed: Long = 42L): DataFrame = {
    val (typed, bcC) = trainBroadcast(corpus, idCol, vecCol, nlist, iters, sampleN, seed)
    scoreProbedCells(assignCells(typed, bcC),
      assignQueries(queries, qidCol, qvecCol, bcC, nprobe), k)
  }

  /** Queries fanned out to their `nprobe` probed cells:
    * `(qid, qv, cell)`, nprobe rows per query.
    */
  private def assignQueries(queries: DataFrame, qidCol: String, qvecCol: String,
                            bcC: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
                            nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    queries
      .select(col(qidCol).cast("long"), transform(col(qvecCol), x => x.cast("double")))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val cs = bcC.value
        rows.flatMap { case (qid, qv) =>
          probeCells(qv, cs, nprobe).iterator.map(c => (qid, qv, c))
        }
      }.toDF("qid", "qv", "cell")
  }

  private def scoreProbedCells(assigned: DataFrame, qAssigned: DataFrame,
                               k: Int): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val scored = qAssigned.join(assigned, "cell")
      .select(col("qid"), col("id"), col("qv"), col("vec"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .mapPartitions(_.map { case (qid, id, qv, v) => (qid, id, cos6(qv, v)) })
      .toDF("qid", "id", "sim")
    val w = Window.partitionBy(col("qid")).orderBy(desc("sim"), asc("id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** Batch probe of an [[ivfBuildIndex]] index at rest: the union of all
    * probed cells becomes the partition filter on the corpus scan (the
    * scan touches only directories some query probes — at most
    * `nlist`, typically far fewer for a clustered query load), then the
    * per-query cell equi-join restricts each query to ITS `nprobe`
    * cells. Same scoring + window cut as [[ivfTopKBatch]].
    */
  def ivfProbeIndexBatch(spark: SparkSession, dir: String, queries: DataFrame,
                         qidCol: String, qvecCol: String,
                         k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$dir/centroids")
      .orderBy(col("cell"))
      .select(col("centroid")).as[Seq[Double]].collect().map(_.toArray)
    val bcC = spark.sparkContext.broadcast(centroids)
    // ONE query fan-out pass, persisted: the probed-cell union (≤ nlist
    // values, collected driver-side so it can be a PARTITION filter
    // literal on the corpus scan) and the scoring join both read it
    val qAssigned = assignQueries(queries, qidCol, qvecCol, bcC, nprobe).persist()
    val probedUnion = qAssigned.select(col("cell")).distinct()
      .as[Int].collect().sorted
    val corpus = spark.read.parquet(s"$dir/corpus")
      .where(col("cell").isin(probedUnion.map(Integer.valueOf): _*))
    // qAssigned stays persisted for the returned plan's lifetime (a few
    // MB of (qid, qv, cell) rows; the union collect above materialized
    // it) — Spark's ContextCleaner releases the blocks when the frame is
    // garbage-collected, and an explicit unpersist here would force the
    // scoring join to recompute the whole fan-out
    scoreProbedCells(corpus, qAssigned, k)
  }

  /** The missing last step of [[ivfTopK]] at 100 TB: materialize the
    * IVF-assigned corpus AT REST, Hive-partitioned by `cell`, plus its
    * centroid table — so a probe query's `cell IN (...)` predicate becomes
    * a PARTITION filter and the scan touches only the `nprobe` probed
    * directories (the partition-pruning twin of the A8 point lookup).
    * Layout: `{dir}/corpus/cell=N/` parquet parts and `{dir}/centroids`
    * (cell → centroid vector). Assignment is the only full-data pass, a
    * stateless typed map; each cell directory is coalesced by a
    * cell-keyed repartition so the index does not shatter into
    * tasks × cells small files.
    */
  def ivfBuildIndex(df: DataFrame, idCol: String, vecCol: String, dir: String,
                    nlist: Int = 16, iters: Int = 3,
                    sampleN: Int = 2048, seed: Long = 42L): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val (typed, bcC) = trainBroadcast(df, idCol, vecCol, nlist, iters, sampleN, seed)
    val centroids = bcC.value
    assignCells(typed, bcC)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/corpus")
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Probe an [[ivfBuildIndex]] index: rank cells by the (tiny) centroid
    * table, then scan ONLY those cell directories — the `cell IN probed`
    * filter is a partition filter, so at corpus scale the probe reads
    * `nprobe/nlist` of the data (asserted on the physical scan in tests).
    */
  def ivfProbeIndex(spark: SparkSession, dir: String, queryVec: Array[Double],
                    k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$dir/centroids")
      .orderBy(col("cell"))
      .select(col("centroid")).as[Seq[Double]].collect().map(_.toArray)
    val probed = probeCells(queryVec, centroids, nprobe)
    spark.read.parquet(s"$dir/corpus")
      .where(col("cell").isin(probed.map(Integer.valueOf): _*))
      .select(col("id"), round(cosine(col("vec"), typedLit(queryVec.toSeq)), 6).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }

  // ------------------------------------------ product quantization (PQ)
  /** Per-subspace PQ codebooks (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011): the vector splits into `m`
    * contiguous subvectors of dim/m and each subspace gets its own
    * `ksub`-centroid k-means ([[trainCentroids]] — driver-side over the
    * deterministic sample, so codebooks are bit-stable run to run).
    * Result layout: `books(sub)(code)(dim/m)`.
    */
  private[graft] def trainPq(sample: Array[Array[Double]], m: Int, ksub: Int,
                             iters: Int): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    require(ksub >= 2 && ksub <= 256, s"ksub=$ksub outside [2,256] (one code byte)")
    val dsub = dim / m
    Array.tabulate(m) { sub =>
      val slices = sample.map(v =>
        java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
      trainCentroids(slices, ksub, iters)
    }
  }

  /** Encode one vector as `m` code bytes — 8–16 bytes standing in for a
    * multi-KB float vector, the memory shape that lets a 10^12-vector
    * corpus's index live in RAM.
    */
  private[graft] def pqEncodeOne(v: Array[Double],
                                 books: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = books.length
    val dsub = v.length / m
    val code = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      val slice = java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub)
      code(sub) = nearestCell(slice, books(sub)).toByte
      sub += 1
    }
    code
  }

  /** Asymmetric-distance tables for a query: per subspace, the dot of
    * the query slice with every codeword (`dots`) and every codeword's
    * squared norm (`norms2`). An ADC scan is then `m` table lookups per
    * corpus vector: cos(q, v̂) = Σ dots / (|q| · sqrt(Σ norms2)).
    */
  private[graft] def adcTables(qv: Array[Double],
                               books: Array[Array[Array[Double]]])
      : (Array[Array[Double]], Array[Array[Double]]) = {
    val m = books.length
    val dsub = qv.length / m
    val dots = Array.ofDim[Array[Double]](m)
    val norms2 = Array.ofDim[Array[Double]](m)
    var sub = 0
    while (sub < m) {
      val ks = books(sub).length
      dots(sub) = new Array[Double](ks)
      norms2(sub) = new Array[Double](ks)
      var c = 0
      while (c < ks) {
        val w = books(sub)(c)
        var d = 0.0; var n2 = 0.0; var j = 0
        while (j < dsub) {
          d += qv(sub * dsub + j) * w(j)
          n2 += w(j) * w(j)
          j += 1
        }
        dots(sub)(c) = d; norms2(sub)(c) = n2
        c += 1
      }
      sub += 1
    }
    (dots, norms2)
  }

  private[graft] def adcCosine(code: Array[Byte], qNorm: Double,
                               dots: Array[Array[Double]],
                               norms2: Array[Array[Double]]): Double = {
    var d = 0.0; var n2 = 0.0; var sub = 0
    while (sub < code.length) {
      val c = code(sub) & 0xff
      d += dots(sub)(c); n2 += norms2(sub)(c)
      sub += 1
    }
    val denom = qNorm * math.sqrt(n2)
    if (denom == 0.0) 0.0 else d / denom
  }

  /** PQ-compressed corpus: `(id, code binary)` + broadcast codebooks —
    * ONE stateless full-corpus pass, no shuffle. The sample/training
    * discipline is [[trainBroadcast]]'s, so codes are deterministic at
    * any parallelism.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               m: Int = 8, ksub: Int = 16, iters: Int = 5,
               sampleN: Int = 2048, seed: Long = 42L)
      : (DataFrame, org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df
      .select(col(idCol).cast("long"), transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Array[Double])]
    val sample = typed.toDF("id", "vec")
      .orderBy(xxhash64(col("id"), lit(seed)), col("id")).limit(sampleN)
      .as[(Long, Array[Double])].collect()
    require(sample.nonEmpty, "empty input")
    val books = trainPq(sample.map(_._2), m, ksub, iters)
    val bc = spark.sparkContext.broadcast(books)
    val codes = typed.mapPartitions { rows =>
      val b = bc.value
      rows.map { case (id, v) => (id, pqEncodeOne(v, b)) }
    }.toDF("id", "code")
    (codes, bc)
  }

  /** PQ top-k with exact refinement: ADC-scan the 8–16-byte codes for
    * `refine × k` candidates (table lookups only — at scale this pass
    * touches code bytes, never float vectors), then re-rank JUST those
    * candidates against their true vectors for exact cos6 scores. The
    * candidate cut is the only approximation; recall is pinned in
    * PqSpec against [[bruteForceTopK]].
    */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
             queryId: Long, k: Int,
             m: Int = 8, ksub: Int = 16, iters: Int = 5, refine: Int = 4,
             sampleN: Int = 2048, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (codes, bc) = pqEncode(df, idCol, vecCol, m, ksub, iters, sampleN, seed)
    val typed = df
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("vec"))
    val qv = typed.where(col("id") === queryId)
      .as[(Long, Array[Double])].head()._2
    val (dots, norms2) = adcTables(qv, bc.value)
    var qn = 0.0; qv.foreach(x => qn += x * x)
    val qNorm = math.sqrt(qn)
    val bcT = spark.sparkContext.broadcast((dots, norms2))
    val approx = codes.as[(Long, Array[Byte])].mapPartitions { rows =>
      val (d, n2) = bcT.value
      rows.map { case (id, code) => (id, adcCosine(code, qNorm, d, n2)) }
    }.toDF("id", "approx")
      .orderBy(desc("approx"), asc("id"))
      .limit(refine * k)
    approx.join(typed, Seq("id"))
      .crossJoin(broadcast(typed.where(col("id") === queryId).select(col("vec").as("qv"))))
      .select(col("id"), round(cosine(col("vec"), col("qv")), 6).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }

  /** PQ index AT REST: `{dir}/codes` = (id, code) parquet — m bytes per
    * vector, the artifact small enough to hold a trillion-vector corpus
    * — and `{dir}/books` = flattened codebooks. Probes never read raw
    * vectors.
    */
  def pqBuildIndex(df: DataFrame, idCol: String, vecCol: String, dir: String,
                   m: Int = 8, ksub: Int = 16, iters: Int = 5,
                   sampleN: Int = 2048, seed: Long = 42L): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val (codes, bc) = pqEncode(df, idCol, vecCol, m, ksub, iters, sampleN, seed)
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    val books = bc.value
    books.zipWithIndex.flatMap { case (sub, s2) =>
      sub.zipWithIndex.map { case (w, c) => (s2, c, w.toSeq) }
    }.toSeq.toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/books")
  }

  /** Probe a [[pqBuildIndex]] index: ADC scan of the code table only —
    * approximate scores (no raw vectors exist in the index to refine
    * against; PqSpec pins recall of the true top-1).
    */
  def pqProbeIndex(spark: SparkSession, dir: String, queryVec: Array[Double],
                   k: Int): DataFrame = {
    import spark.implicits._
    val books: Array[Array[Array[Double]]] = {
      val rows = spark.read.parquet(s"$dir/books")
        .select(col("sub"), col("code"), col("centroid"))
        .as[(Int, Int, Seq[Double])].collect()
      val m = rows.map(_._1).max + 1
      Array.tabulate(m) { s2 =>
        val subRows = rows.filter(_._1 == s2).sortBy(_._2)
        subRows.map(_._3.toArray)
      }
    }
    val (dots, norms2) = adcTables(queryVec, books)
    var qn = 0.0; queryVec.foreach(x => qn += x * x)
    val qNorm = math.sqrt(qn)
    val bcT = spark.sparkContext.broadcast((dots, norms2))
    spark.read.parquet(s"$dir/codes").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val (d, n2) = bcT.value
        rows.map { case (id, code) =>
          (id, math.rint(adcCosine(code, qNorm, d, n2) * 1e6) / 1e6)
        }
      }.toDF("id", "approx_sim")
      .orderBy(desc("approx_sim"), asc("id"))
      .limit(k)
  }

  /** ANN top-k via L independent hyperplane-LSH tables: a candidate is any
    * row sharing the query's bucket in ≥1 table; candidates are scored
    * exactly and cut to k. Collision probability per table for angle θ is
    * (1−θ/π)^planesPerTable; L tables union to the target recall — tune
    * (L, planesPerTable) to corpus size (more planes → smaller buckets →
    * cheaper verify, lower per-table recall). Signatures are computed in a
    * typed per-row kernel ([[sigOf]], bit-identical to the columnar
    * [[hyperplaneSig]]); `idCol` must be numeric.
    */
  def annLshTopK(df: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int,
                 tables: Int = 10, planesPerTable: Int = 5,
                 dim: Int = 64, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val planesArr: Array[Array[Array[Double]]] = (0 until tables).map(t =>
      randomPlanes(planesPerTable, dim, seed + t).map(_.toArray).toArray).toArray
    val bucketed = df
      .select(col(idCol).cast("long"), transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        it.flatMap { case (id, v) =>
          Iterator.tabulate(planesArr.length)(t => (id, v, t, sigOf(v, planesArr(t))))
        }
      }
      .toDF("id", "vec", "t", "bucket")
    val qb = bucketed.where(col("id") === queryId)
      .select(col("t"), col("bucket"), col("vec").as("qv"))
    bucketed.join(broadcast(qb), Seq("t", "bucket"))
      .select(col("id"), col("vec"), col("qv")).dropDuplicates("id")
      .select(col("id"), round(cosine(col("vec"), col("qv")), 6).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }
}
