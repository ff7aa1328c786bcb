package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kernel.TextStats

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): select raw-corpus documents whose hashed n-gram
  * distribution looks like a TARGET corpus, by importance weights under
  * two bag-of-hashed-ngrams models. The published recipe: hashed
  * unigram+bigram features, per-corpus smoothed multinomials, per-doc
  * weight = Σ_f count_f · (log p_target(f) − log p_raw(f)), then
  * Gumbel-top-k resampling (sampling without replacement proportional
  * to exp(weight)).
  *
  * Scale shape:
  *  - each corpus model is ONE distributed pass — `treeAggregate` of a
  *    dim-long count array (dim·8 bytes, corpus-size-independent; 2^18
  *    buckets = 2 MB), counts are EXACT Longs so the model is
  *    bit-identical at any parallelism (same discipline as
  *    `ops/Cluster`'s fixed-point sums);
  *  - weighting/scoring is a stateless map against the broadcast
  *    log-ratio array — zero shuffle over the raw corpus;
  *  - resampling is a global top-k on (weight + Gumbel), a sort-limit —
  *    Spark's TakeOrdered, no full sort materialization.
  *
  * Determinism: hashing is [[TextStats.hashToken]]; Gumbel noise is
  * derived from each document's id hash, not a RNG — re-runs select the
  * same documents (the property q46/q61 also guarantee).
  */
object Dsir {

  /** Hashed unigram+bigram RAW counts (no normalization — DSIR's
    * weights are count-weighted sums), sorted bucket ids.
    */
  def hashCounts(text: String, dim: Int): (Array[Int], Array[Long]) = {
    val toks = TextStats.tokens(if (text == null) "" else text)
    if (toks.isEmpty) return (Array.empty, Array.empty)
    val m = new java.util.HashMap[Integer, Long](toks.length * 3)
    def add(s: String): Unit = {
      val h = (TextStats.hashToken(s) % dim).toInt
      val i = Integer.valueOf(if (h < 0) h + dim else h)
      m.put(i, m.getOrDefault(i, 0L) + 1L)
    }
    var i = 0
    while (i < toks.length) {
      add(toks(i))
      if (i + 1 < toks.length) add(toks(i) + "_" + toks(i + 1))
      i += 1
    }
    val idx = new Array[Int](m.size)
    val it = m.keySet().iterator()
    var j = 0
    while (it.hasNext) { idx(j) = it.next(); j += 1 }
    java.util.Arrays.sort(idx)
    (idx, idx.map(k => m.get(Integer.valueOf(k))))
  }

  /** Laplace-smoothed log-probabilities of the corpus's hashed-feature
    * multinomial: log((count_i + alpha) / (total + alpha·dim)). One
    * distributed pass; exact Long counts → bit-identical at any
    * parallelism. Fails loudly on an empty corpus (a silent all-zero
    * model would make every weight 0).
    *
    * CHOOSE `alpha` SO THAT alpha·dim ≪ the corpus's token mass: when
    * the smoothing mass dominates (tiny target corpus, huge dim), the
    * per-feature probabilities collapse toward 1/dim scaled by each
    * corpus's total — the log-RATIO then degenerates to a constant
    * (pure length signal) and can even invert the ranking. alpha·dim at
    * or below ~10 % of the smaller corpus's mass keeps the ratio
    * dominated by real counts.
    */
  def featureLogProbs(df: DataFrame, textCol: String, dim: Int,
                      alpha: Double = 1.0): Array[Double] = {
    require(dim > 0, s"dim must be positive, got $dim")
    require(alpha > 0, s"alpha must be positive (unsmoothed zeros give -inf logs), got $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    val texts: Dataset[String] = df.select(col(textCol).cast("string")).as[String]
    val counts = texts.rdd.treeAggregate(new Array[Long](dim))(
      seqOp = { (acc, t) =>
        val (ix, c) = hashCounts(t, dim)
        var i = 0
        while (i < ix.length) { acc(ix(i)) += c(i); i += 1 }
        acc
      },
      combOp = { (a, b) =>
        var i = 0
        while (i < dim) { a(i) += b(i); i += 1 }
        a
      },
      depth = 2)
    var total = 0L
    var i = 0
    while (i < dim) { total += counts(i); i += 1 }
    require(total > 0, "empty corpus: no tokens to model")
    val logDen = math.log(total + alpha * dim)
    counts.map(c => math.log(c + alpha) - logDen)
  }

  /** Per-document importance weights against two corpus models:
    * `(idCol, weight, avg_weight)` where weight = Σ count_f·logRatio(f)
    * and avg_weight divides by the doc's feature mass (length-invariant
    * diagnostic). Stateless map over broadcast log-ratio — no shuffle.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        logTarget: Array[Double],
                        logRaw: Array[Double]): DataFrame = {
    require(logTarget.length == logRaw.length,
      s"model dims differ: ${logTarget.length} vs ${logRaw.length}")
    val dim = logTarget.length
    val ratio = new Array[Double](dim)
    var i = 0
    while (i < dim) { ratio(i) = logTarget(i) - logRaw(i); i += 1 }
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(ratio)
    val wUdf = udf { (t: String) =>
      val (ix, c) = hashCounts(t, dim)
      val r = bc.value
      var w = 0.0
      var mass = 0L
      var j = 0
      while (j < ix.length) { w += c(j) * r(ix(j)); mass += c(j); j += 1 }
      (w, if (mass == 0) 0.0 else w / mass)
    }
    df.select(col(idCol), wUdf(col(textCol).cast("string")).as("_w"))
      .select(col(idCol), round(col("_w._1"), 6).as("weight"),
        round(col("_w._2"), 6).as("avg_weight"))
  }

  /** Gumbel-top-k resampling: keep the k rows maximizing
    * weight + Gumbel(id) — sampling WITHOUT replacement proportional to
    * exp(weight) (Gumbel-max trick), with the noise derived from
    * xxhash64 of the id so selection is deterministic across re-runs.
    * `temperature` scales the weights (0⁺ → hard top-k, 1 = DSIR).
    */
  def resampleTopK(weighted: DataFrame, idCol: String, k: Int,
                   temperature: Double = 1.0,
                   weightCol: String = "weight"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    // u in (0,1): top 53 bits of the id hash, nudged off exact zero
    val u = (shiftrightunsigned(xxhash64(col(idCol)), 11).cast("double") +
      lit(0.5)) * lit(math.pow(2, -53))
    val gumbel = -log(-log(u))
    weighted
      .withColumn("_key", col(weightCol) / lit(temperature) + gumbel)
      .orderBy(col("_key").desc, col(idCol))
      .limit(k)
      .drop("_key")
  }
}
