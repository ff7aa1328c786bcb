package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Classifier

/** Hashed linear classifier: separable fixture trains to high holdout
  * accuracy, loss decreases, feature hashing is deterministic and
  * collision-tolerant, scoring is a shuffle-free broadcast map.
  */
class ClassifierSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val spamVocab = Array("free", "crypto", "bonus", "winner",
    "click", "pills", "casino", "jackpot", "unsubscribe", "viagra")
  private val hamVocab = Array("the", "committee", "reviewed", "quarterly",
    "results", "research", "method", "analysis", "climate", "report")

  /** Deterministic docs: ~12 words from the class vocab + 3 shared noise
    * words, seeded by id.
    */
  private def doc(id: Long, spam: Boolean): String = {
    val vocab = if (spam) spamVocab else hamVocab
    var h = graft.kernel.TextStats.mix64(id * 2 + (if (spam) 1 else 0))
    val sb = new StringBuilder
    (0 until 12).foreach { _ =>
      h = graft.kernel.TextStats.mix64(h)
      sb.append(vocab(((h % vocab.length) + vocab.length).toInt % vocab.length)).append(' ')
    }
    sb.append("common shared words")
    sb.toString
  }

  private def corpus(n: Int, offset: Long = 0L) =
    (0 until n).map { i =>
      val spam = i % 2 == 0
      (offset + i, doc(offset + i, spam), if (spam) 1 else 0)
    }.toDF("id", "text", "label")

  test("separable fixture: holdout accuracy >= 0.98, loss halves") {
    val model = Classifier.trainLogistic(corpus(400), "text", "label",
      dim = 1 << 16, iters = 40)
    assert(model.lossHistory.last < model.lossHistory.head * 0.5,
      model.lossHistory.mkString(","))
    val hold = corpus(200, offset = 10000L)
    val scoredDf = Classifier.scored(hold, model, "text")
    val acc = scoredDf
      .select(avg(when((col("score") > 0.5) === (col("label") === 1), 1.0)
        .otherwise(0.0)))
      .as[Double].head()
    assert(acc >= 0.98, s"holdout accuracy $acc")
  }

  test("hashFeatures: deterministic, L2-normalized, sorted unique indices") {
    val (i1, v1) = Classifier.hashFeatures("alpha beta gamma alpha", 1 << 10)
    val (i2, v2) = Classifier.hashFeatures("alpha beta gamma alpha", 1 << 10)
    assert(i1.toSeq === i2.toSeq && v1.toSeq === v2.toSeq)
    assert(i1.toSeq === i1.sorted.toSeq && i1.distinct.length === i1.length)
    val norm = v1.map(x => x.toDouble * x).sum
    assert(math.abs(norm - 1.0) < 1e-6, s"norm $norm")
    assert(Classifier.hashFeatures("", 64)._1.isEmpty)
    assert(Classifier.hashFeatures(null, 64)._1.isEmpty)
  }

  test("tiny dim (forced collisions) still trains without error") {
    val model = Classifier.trainLogistic(corpus(100), "text", "label",
      dim = 64, iters = 10)
    assert(model.weights.length === 64)
    assert(model.lossHistory.last <= model.lossHistory.head)
  }

  test("bad labels and empty input fail loudly") {
    intercept[Exception] {
      Classifier.trainLogistic(Seq((1L, "x", 2)).toDF("id", "text", "label"),
        "text", "label", dim = 64, iters = 1)
    }
    intercept[Exception] {
      Classifier.trainLogistic(corpus(0), "text", "label", dim = 64, iters = 1)
    }
    intercept[IllegalArgumentException] {
      Classifier.trainLogistic(corpus(10), "text", "label", dim = 100, iters = 1)
    }
  }

  test("scoring plan is a shuffle-free map over broadcast weights") {
    val model = Classifier.trainLogistic(corpus(100), "text", "label",
      dim = 1 << 12, iters = 5)
    val plan = Classifier.scored(corpus(50), model, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
