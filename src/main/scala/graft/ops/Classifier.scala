package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kernel.TextStats

/** Hashed linear text classifier — the fastText-shaped supervised
  * filter every modern pretraining pipeline runs (quality scoring à la
  * GPT-3/LLaMA "looks-like-reference-corpus" filters, spam gates,
  * topicality): bag of hashed unigram+bigram features into a fixed
  * `dim`-wide weight vector, logistic loss, trained by full-batch
  * gradient descent where each iteration is ONE distributed pass
  * (`treeAggregate`) producing a dense gradient of size `dim` —
  * independent of corpus size.
  *
  * Scale shape (the whole point vs a driver-side sklearn fit):
  *  - features are hashed (Weinberger et al., ICML 2009): no vocabulary
  *    build, no string dictionary to broadcast, memory fixed at `dim`;
  *  - per-iteration cost = one map over the (persisted, pre-featurized)
  *    corpus + a depth-2 tree reduce of `dim` doubles; 10^12 docs scale
  *    the map linearly while the reduce stays `dim`-bounded;
  *  - scoring is a stateless broadcast-weights map — shuffle-free,
  *    streaming-safe.
  *
  * Determinism: fixed hash ([[TextStats.hashToken]]), fixed iteration
  * count and step; float-sum reduction order varies across runs, so
  * weights are reproducible to ~1e-12 but not bit-identical — tests
  * assert decision-level properties (accuracy/loss), not golden bits.
  */
object Classifier {

  /** Trained model: hashed-feature logistic regression. */
  final case class Model(dim: Int, bias: Double, weights: Array[Double],
                         lossHistory: Array[Double]) {
    def score(text: String): Double = {
      val (idx, v) = Classifier.hashFeatures(text, dim)
      var z = bias
      var i = 0
      while (i < idx.length) { z += weights(idx(i)) * v(i); i += 1 }
      1.0 / (1.0 + math.exp(-z))
    }
  }

  /** Lowercased whitespace unigrams + adjacent bigrams, hashed into
    * [0, dim), duplicate indices summed, then L2-normalized (bounds
    * every feature vector to unit norm so one long page cannot swamp
    * the gradient). Deterministic.
    */
  def hashFeatures(text: String, dim: Int): (Array[Int], Array[Float]) = {
    val toks = TextStats.tokens(if (text == null) "" else text)
    if (toks.isEmpty) return (Array.empty, Array.empty)
    val m = new java.util.HashMap[Integer, Float](toks.length * 3)
    def add(s: String): Unit = {
      val h = (TextStats.hashToken(s) % dim).toInt
      val i = Integer.valueOf(if (h < 0) h + dim else h)
      m.put(i, m.getOrDefault(i, 0f) + 1f)
    }
    var i = 0
    while (i < toks.length) {
      add(toks(i))
      if (i + 1 < toks.length) add(toks(i) + "_" + toks(i + 1))
      i += 1
    }
    val n = m.size
    val idx = new Array[Int](n)
    val it = m.keySet().iterator()
    var j = 0
    while (it.hasNext) { idx(j) = it.next(); j += 1 }
    java.util.Arrays.sort(idx)
    val v = new Array[Float](n)
    var norm = 0.0
    j = 0
    while (j < n) { val c = m.get(idx(j)).toDouble; norm += c * c; j += 1 }
    val inv = 1.0 / math.sqrt(norm)
    j = 0
    while (j < n) { v(j) = (m.get(idx(j)) * inv).toFloat; j += 1 }
    (idx, v)
  }

  /** Train on `(textCol, labelCol)` (label ∈ {0,1}). `iters` full-batch
    * GD steps at step size `lr` with L2 strength `l2`. The featurized
    * corpus is persisted once; each iteration reads it, never the raw
    * text. Fails loudly on empty input or labels outside {0,1}.
    */
  def trainLogistic(df: DataFrame, textCol: String, labelCol: String,
                    dim: Int = 1 << 18, iters: Int = 30,
                    lr: Double = 2.0, l2: Double = 1e-8): Model = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two, got $dim")
    require(iters >= 1 && lr > 0, "iters >= 1, lr > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val feat: Dataset[(Double, Array[Int], Array[Float])] = df
      .select(col(labelCol).cast("double"), col(textCol).cast("string"))
      .as[(Double, String)]
      .map { case (y, t) =>
        require(y == 0.0 || y == 1.0, s"label must be 0/1, got $y")
        val (ix, v) = hashFeatures(t, dim)
        (y, ix, v)
      }.persist()
    val n = feat.count()
    require(n > 0, "empty training set")
    val sc = spark.sparkContext
    var w = new Array[Double](dim)
    var b = 0.0
    val losses = new Array[Double](iters)
    var it = 0
    while (it < iters) {
      val bw = sc.broadcast(w)
      val bb = b
      // one pass: dense gradient + bias grad + loss, tree-combined so
      // the driver merges log(p) partials, not p arrays
      val (grad, gradB, loss) = feat.rdd.treeAggregate(
        (new Array[Double](dim), 0.0, 0.0))(
        seqOp = { case ((g, gb, l), (y, ix, v)) =>
          val wv = bw.value
          var z = bb
          var i = 0
          while (i < ix.length) { z += wv(ix(i)) * v(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          val err = p - y
          i = 0
          while (i < ix.length) { g(ix(i)) += err * v(i); i += 1 }
          val eps = 1e-12
          (g, gb + err,
            l - (y * math.log(p + eps) + (1 - y) * math.log(1 - p + eps)))
        },
        combOp = { case ((g1, gb1, l1), (g2, gb2, l2x)) =>
          var i = 0
          while (i < dim) { g1(i) += g2(i); i += 1 }
          (g1, gb1 + gb2, l1 + l2x)
        },
        depth = 2)
      bw.destroy()
      val inv = 1.0 / n
      val w2 = new Array[Double](dim)
      var i = 0
      while (i < dim) { w2(i) = w(i) - lr * (grad(i) * inv + l2 * w(i)); i += 1 }
      w = w2
      b -= lr * gradB * inv
      losses(it) = loss * inv
      it += 1
    }
    feat.unpersist()
    Model(dim, b, w, losses)
  }

  /** Score column: sigmoid(w·x + b) per row against the broadcast
    * model — stateless map, no shuffle, streaming-safe.
    */
  def scored(df: DataFrame, model: Model, textCol: String,
             scoreCol: String = "score"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val s = udf((t: String) => bc.value.score(t))
    df.withColumn(scoreCol, round(s(col(textCol)), 6))
  }
}
