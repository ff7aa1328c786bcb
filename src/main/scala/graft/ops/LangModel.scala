package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kernel.CharLm

/** Distributed training + scoring for the [[CharLm]] perplexity filter
  * (CCNet-style, LREC 2020 — see the kernel's scaladoc).
  *
  * Scale shape of training: ONE pass over the reference corpus —
  * per-partition `LongMap` pre-aggregation of n-gram, prefix and
  * alphabet counts (map-side combine in primitive-keyed maps, no boxed
  * rows until emission) — then a single count shuffle whose volume is
  * bounded by `numPartitions x vocabulary`, NOT by corpus size. The
  * model collects to the driver under a loud `maxVocab` bound and
  * broadcasts as two sorted long arrays (binary-search lookup, zero
  * allocation per scored n-gram).
  *
  * Counts are exact integers, so the trained model is bit-identical at
  * any parallelism (LangModelSpec pins 1 vs 5 partitions) — the same
  * cross-cluster-size reproducibility contract as [[Cluster.kmeansFit]].
  *
  * Scoring is embarrassingly parallel (per-row sequential fold in
  * document order — deterministic regardless of partitioning).
  */
object LangModel {

  /** Train a char n-gram model on `df(textCol)`. `minCount` prunes
    * rare FULL n-grams (noise/PII hapaxes) after aggregation; prefix
    * counts stay unpruned so probabilities remain properly normalized
    * against the true context mass. Null texts are skipped.
    */
  def trainCharLm(df: DataFrame, textCol: String, n: Int = 3,
                  alpha: Double = 0.5, minCount: Long = 1L,
                  maxVocab: Int = 1 << 22): CharLm.Model = {
    require(n >= 2, s"n must be >= 2, got $n")
    val spark = df.sparkSession
    import spark.implicits._
    val texts: Dataset[String] =
      df.select(col(textCol).cast("string")).where(col(textCol).isNotNull).as[String]
    // kind: 0 = full n-gram, 1 = (n-1)-prefix, 2 = alphabet char
    val counts = texts.mapPartitions { it =>
      val grams = new scala.collection.mutable.LongMap[Long]()
      val prefs = new scala.collection.mutable.LongMap[Long]()
      val chars = new scala.collection.mutable.LongMap[Long]()
      it.foreach { t =>
        val s = CharLm.normalize(t)
        var i = 0
        while (i < s.length) {
          chars(s.charAt(i).toLong) = 1L
          if (i + n <= s.length) {
            val g = CharLm.ngramHash(s, i, n)
            grams(g) = grams.getOrElse(g, 0L) + 1L
          }
          if (i + n - 1 <= s.length) {
            val p = CharLm.ngramHash(s, i, n - 1)
            prefs(p) = prefs.getOrElse(p, 0L) + 1L
          }
          i += 1
        }
      }
      grams.iterator.map { case (k, c) => (0, k, c) } ++
        prefs.iterator.map { case (k, c) => (1, k, c) } ++
        chars.iterator.map { case (k, _) => (2, k, 1L) }
    }.toDF("kind", "key", "cnt")
      .groupBy(col("kind"), col("key")).agg(sum(col("cnt")).as("cnt"))
    val collected = counts
      .limit(3 * maxVocab + 3) // bound the collect itself, then require
      .as[(Int, Long, Long)].collect()
    require(collected.length <= 3 * maxVocab,
      s"model vocabulary exceeds maxVocab=$maxVocab per table - raise " +
        s"maxVocab, raise minCount, or train on a smaller reference slice")
    val grams = collected.iterator
      .filter(r => r._1 == 0 && r._3 >= minCount).map(r => (r._2, r._3))
      .toArray.sortBy(_._1)
    val prefs = collected.iterator.filter(_._1 == 1).map(r => (r._2, r._3))
      .toArray.sortBy(_._1)
    val alphabet = collected.count(_._1 == 2)
    require(alphabet > 0, "empty training corpus (no normalized characters)")
    CharLm.Model(n, alpha, alphabet,
      grams.map(_._1), grams.map(_._2), prefs.map(_._1), prefs.map(_._2))
  }

  /** Per-document perplexity: `(id, perplexity)` rounded HALF_UP at
    * 4 dp (the engine's FP-compare convention); `NaN` for documents
    * shorter than the model order. Join back on `idCol` for full rows.
    */
  def scorePerplexity(df: DataFrame, idCol: String, textCol: String,
                      model: CharLm.Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, t) =>
          val p = if (t == null) Double.NaN else m.perplexity(t)
          val r =
            if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) p
            else java.math.BigDecimal.valueOf(p)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          (id, r)
        }
      }.toDF(idCol, "perplexity")
  }

  /** The CCNet head/middle/tail cut as a filter: keep documents with
    * perplexity <= `maxPerplexity`. Documents with NO evidence (shorter
    * than the model order, i.e. NaN score) are DROPPED — a sub-n-char
    * "document" carries no usable training signal either way. Returns
    * the surviving corpus with `df`'s full schema.
    */
  def perplexityFilter(df: DataFrame, idCol: String, textCol: String,
                       model: CharLm.Model, maxPerplexity: Double): DataFrame = {
    val keep = scorePerplexity(df, idCol, textCol, model)
      .where(!isnan(col("perplexity")) && col("perplexity") <= maxPerplexity)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
