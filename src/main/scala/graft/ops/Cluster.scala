package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed k-means clustering over embedding columns, and the
  * SemDeDup-style semantic near-dedup built on top of it (Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540): cluster the corpus embeddings,
  * then resolve cosine-duplicate groups WITHIN each cluster only — the
  * clustering bounds the quadratic pair search the way LSH bands do for
  * MinHash ([[Dedup.minhashNearDupPairs]]).
  *
  * Reference analog: the reference pipeline dedups by exact content
  * hash only (`app/services/cache_manager.py:23-25`); semantic dedup is
  * the embedding-space generalization a training-data pipeline needs.
  *
  * Scale shape of an iteration: ONE full pass over the corpus
  * (nearest-centroid assignment + per-partition partial sums, all
  * map-side — no per-row shuffle), then a shuffle of at most
  * `numPartitions x k` tiny partial rows to fold the new centroids.
  * The corpus itself is never shuffled during training; only the final
  * assignment materializes a `cluster` column. Centroids are broadcast
  * (`k x dim` doubles — `require`-bounded below rather than OOMing the
  * driver).
  *
  * Determinism: FP addition is not associative, so a distributed
  * double-sum makes centroids — and therefore assignments — drift with
  * the partitioning (Spark MLlib's KMeans has exactly this property).
  * Here the reduction is EXACT and therefore order-free: coordinates
  * are quantized to 2^-24 fixed point (half an ulp at |x| = 1 — below
  * the float input's own precision), summed per partition in overflow-
  * guarded Longs, and folded across partitions in BigInt. Exact sums
  * commute, so the same input + same seed gives BIT-IDENTICAL
  * centroids at ANY parallelism — ClusterSpec pins 1-partition ==
  * 7-partition equality. That is the property the north rule's
  * match-rate contract wants from a two-cluster-size run: N and 4N
  * executors produce the same model, not merely similar ones.
  */
object Cluster {

  /** Fixed-point scale for exact accumulation: 2^24 (half an ulp at
    * |x| = 1 for float inputs — quantization sits below the input's own
    * precision). With the |coordinate| <= 2^30 bound each quantized
    * term fits 2^54, so a partition can exactly accumulate 2^8 = 256
    * worst-case rows — and billions of typical unit-scale rows — before
    * the 2^62 overflow guard trips (loudly).
    */
  private val QuantumBits = 24
  private val Quantum: Double = (1L << QuantumBits).toDouble
  private val MaxQ: Long = 1L << 54
  private val OverflowGuard: Long = 1L << 62

  /** Fitted model: `centroids(c)` is the mean vector of cluster `c`;
    * `iterations` actually run; `shift` = the last iteration's maximum
    * centroid L2 movement; `converged` = shift <= tol before maxIter.
    * A non-converged k-means is still a VALID quantizer (unlike a
    * non-converged connected-components pass, which silently splits
    * clusters — hence no `require` here, but the flag is surfaced so
    * callers can decide).
    */
  final case class KMeansModel(centroids: Array[Array[Double]],
                               iterations: Int,
                               shift: Double,
                               converged: Boolean)

  private def typedVecs(df: DataFrame, idCol: String, vecCol: String)
      : Dataset[(Long, Array[Double])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), transform(col(vecCol), x => x.cast("double")))
      .as[(Long, Array[Double])]
  }

  /** Deterministic farthest-point (maxmin) seeding over the sample —
    * the derandomized k-means++ variant: first point = first sample row
    * (the seeded-hash order makes that pseudo-random already), each
    * next centroid = the sample point farthest from all chosen so far
    * (ties → lowest index). For separated clusters this provably picks
    * one seed per cluster, where first-k seeding falls into
    * split/merged local optima with constant probability.
    */
  private[graft] def initFarthest(sample: Array[Array[Double]], k: Int)
      : Array[Array[Double]] = {
    val n = sample.length
    val m = math.min(k, n)
    val chosen = new Array[Array[Double]](m)
    chosen(0) = sample(0).clone()
    val d2 = new Array[Double](n)
    var i = 0
    while (i < n) { d2(i) = dist2(sample(i), chosen(0)); i += 1 }
    var c = 1
    while (c < m) {
      var best = 0; var bestD = -1.0; var j = 0
      while (j < n) {
        if (d2(j) > bestD) { bestD = d2(j); best = j }
        j += 1
      }
      chosen(c) = sample(best).clone()
      j = 0
      while (j < n) {
        val d = dist2(sample(j), chosen(c))
        if (d < d2(j)) d2(j) = d
        j += 1
      }
      c += 1
    }
    chosen
  }

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var j = 0
    val n = math.min(a.length, b.length)
    while (j < n) { val t = a(j) - b(j); s += t * t; j += 1 }
    s
  }

  /** Lloyd's algorithm, distributed, deterministic. Init =
    * [[initFarthest]] over a seeded deterministic sample, refined by up
    * to `maxIter` full-corpus iterations. Empty clusters keep their
    * previous centroid (no respawn — respawn heuristics are
    * nondeterministic under partition order). If the corpus has fewer
    * than `k` sampled points the model has that many centroids instead.
    */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
                maxIter: Int = 10, tol: Double = 1e-9,
                sampleN: Int = 2048, seed: Long = 42L): KMeansModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val typed = typedVecs(df, idCol, vecCol)
    val sample = typed.toDF("id", "vec")
      .orderBy(xxhash64(col("id"), lit(seed)), col("id")).limit(sampleN)
      .as[(Long, Array[Double])].collect()
    require(sample.nonEmpty, "empty input")
    val dim = sample.head._2.length
    // broadcast contract: centroids must fit comfortably on every
    // executor AND the per-partition partial-sum buffers (k x dim
    // doubles each) must too. 2^24 doubles = 128 MB is the ceiling.
    require(k.toLong * dim <= (1L << 24),
      s"k x dim = ${k.toLong * dim} exceeds the 2^24-double broadcast " +
        s"contract - shard the corpus or reduce k")
    var centroids = initFarthest(sample.map(_._2), k)
    val kEff = centroids.length
    var it = 0
    var shift = Double.MaxValue
    while (it < maxIter && shift > tol) {
      val bc = spark.sparkContext.broadcast(centroids)
      // ---- one corpus pass: assign + per-partition EXACT partial sums
      // (quantized-Long accumulation; overflow-guarded so a pathological
      // partition fails loudly instead of wrapping silently) ----
      val partials: Dataset[(Int, Array[Long], Long)] =
        typed.mapPartitions { rows =>
          val cs = bc.value
          val d = if (cs.nonEmpty) cs(0).length else 0
          val sums = Array.fill(cs.length)(new Array[Long](d))
          val counts = new Array[Long](cs.length)
          rows.foreach { case (_, v) =>
            val c = Similarity.nearestCell(v, cs)
            val s = sums(c)
            var j = 0
            while (j < d) {
              val q = Math.round(v(j) * Quantum)
              require(math.abs(q) <= MaxQ,
                s"|coordinate| ${v(j)} exceeds the 2^30 exact-accumulation " +
                  s"bound - rescale the embeddings")
              val nq = s(j) + q
              require(math.abs(nq) < OverflowGuard,
                "partition partial sum near Long overflow - lower " +
                  "spark.sql.files.maxPartitionBytes so partitions hold " +
                  "fewer rows")
              s(j) = nq
              j += 1
            }
            counts(c) += 1
          }
          Iterator.tabulate(cs.length)(c => (c, sums(c), counts(c)))
            .filter(_._3 > 0L)
        }
      // ---- tiny shuffle (<= numPartitions x k rows): BigInt fold —
      // exact, therefore independent of arrival order ----
      val folded: Array[(Int, Array[Double])] =
        partials.groupByKey(_._1).mapGroups { (cluster, rows) =>
          val parts = rows.toArray
          val d = parts.head._2.length
          val acc = Array.fill(d)(BigInt(0))
          var n = 0L
          parts.foreach { case (_, s, c) =>
            var j = 0
            while (j < d) { acc(j) += BigInt(s(j)); j += 1 }
            n += c
          }
          // one correctly-rounded conversion per coordinate: the mean is
          // a function of the EXACT integer sum, so it is bit-identical
          // no matter how rows were partitioned
          (cluster, acc.map(a =>
            (BigDecimal(a) / (BigDecimal(n) * BigDecimal(1L << QuantumBits))).toDouble))
        }.collect()
      val next = centroids.map(_.clone())
      folded.foreach { case (c, v) => next(c) = v }
      shift = 0.0
      var c = 0
      while (c < kEff) {
        var d2 = 0.0; var j = 0
        while (j < dim) {
          val t = next(c)(j) - centroids(c)(j); d2 += t * t; j += 1
        }
        val d1 = math.sqrt(d2)
        if (d1 > shift) shift = d1
        c += 1
      }
      bc.unpersist(false)
      centroids = next
      it += 1
    }
    KMeansModel(centroids, it, shift, converged = shift <= tol)
  }

  /** Stateless nearest-centroid assignment — the one post-training
    * corpus pass. Returns `(id, cluster)`; join back on `idCol` for the
    * full row. Deterministic ties: [[Similarity.nearestCell]] keeps the
    * lowest index on equal distance.
    */
  def assignClusters(df: DataFrame, idCol: String, vecCol: String,
                     centroids: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    typedVecs(df, idCol, vecCol).mapPartitions { rows =>
      val cs = bc.value
      rows.map { case (id, v) => (id, Similarity.nearestCell(v, cs)) }
    }.toDF("id", "cluster")
  }

  /** Within-assigned-cluster cosine-duplicate pairs at >= `threshold`
    * (rounded HALF_UP at 4 dp exactly like `round(x, 4)` — the same
    * FP-safe compare every cosine operator in [[Dedup]] uses). The
    * cluster-equality self-join bounds candidates to sum(m_c^2) instead
    * of n^2; `maxCluster` makes the bound LOUD — a cluster bigger than
    * the cap fails with instructions instead of detonating a quadratic
    * join (the same posture as [[Dedup.minhashNearDupPairs]]'s
    * `maxBucket`, but hard failure rather than star-edges: unlike an LSH
    * bucket, an oversized k-means cluster means k itself is mis-sized
    * for the corpus and the fix is upstream).
    */
  def semanticDupPairs(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, k: Int = 16,
                       maxCluster: Int = 4096, maxIter: Int = 10,
                       sampleN: Int = 2048, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val model = kmeansFit(df, idCol, vecCol, k, maxIter,
      sampleN = sampleN, seed = seed)
    val assigned = typedVecs(df, idCol, vecCol).mapPartitions { rows =>
      // local re-broadcast of the final centroids happens via closure:
      // k x dim is require-bounded, and one serialized copy per task
      // closure is the same cost class as TorrentBroadcast at this size
      val cs = model.centroids
      rows.map { case (id, v) => (id, v, Similarity.nearestCell(v, cs)) }
    }.toDF("id", "vec", "cluster")
    val sizes = assigned.groupBy(col("cluster")).count()
      .agg(max(col("count"))).as[Long].head()
    require(sizes <= maxCluster,
      s"largest k-means cluster has $sizes members > maxCluster=$maxCluster " +
        s"- raise k (target n/k well under the cap) so the within-cluster " +
        s"pair search stays bounded")
    assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.vec").as("va"), col("b.vec").as("vb"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .mapPartitions { it =>
        it.flatMap { case (a, b, va, vb) =>
          val cos = Similarity.cos4(va, vb)
          if (cos >= threshold) Iterator.single((a, b, cos)) else Iterator.empty
        }
      }.toDF("a_id", "b_id", "cos")
  }

  /** SemDeDup as one call: k-means → within-cluster cosine pairs →
    * connected components → keep the minimum id per duplicate group.
    * Returns the SURVIVING corpus with `df`'s full schema (same
    * contract as [[Dedup.nearDupFilter]], the MinHash rendition).
    *
    * Note the recall asymmetry vs exact all-pairs: a duplicate pair
    * split across two k-means clusters is missed (the paper accepts
    * this — duplicates are near-identical embeddings, which quantize
    * together except exactly on a cell boundary). OpsSpec measures the
    * miss rate against [[Dedup.cosinePairsExact]] on the fixture
    * corpus.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, k: Int = 16,
                    maxCluster: Int = 4096, maxIter: Int = 10,
                    sampleN: Int = 2048, seed: Long = 42L): DataFrame = {
    val pairs = semanticDupPairs(df, idCol, vecCol, threshold, k,
      maxCluster, maxIter, sampleN, seed)
    val clusters = Dedup.connectedComponents(pairs)
    val losers = clusters.where(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
