package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.PageGen
import graft.kernel.CharLm
import graft.ops.LangModel

class LangModelSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val trainTexts = PageGen.pages(150).map(_.text)
  private lazy val trainDf = trainTexts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text").cache()

  private lazy val model = LangModel.trainCharLm(trainDf, "text", n = 3)

  test("trained model equals an independent naive string-keyed reference") {
    // naive reference: plain Map[String,Long] counts, no hashing, no Spark
    val n = 3
    var grams = Map.empty[String, Long]
    var prefs = Map.empty[String, Long]
    var chars = Set.empty[Char]
    trainTexts.foreach { t =>
      val s = CharLm.normalize(t)
      s.foreach(chars += _)
      s.sliding(n).filter(_.length == n)
        .foreach(g => grams = grams.updated(g, grams.getOrElse(g, 0L) + 1L))
      s.sliding(n - 1).filter(_.length == n - 1)
        .foreach(p => prefs = prefs.updated(p, prefs.getOrElse(p, 0L) + 1L))
    }
    assert(model.alphabetSize === chars.size)
    assert(model.gramKeys.length === grams.size)
    assert(model.prefKeys.length === prefs.size)
    // every naive count is findable under the kernel hash with equal count
    grams.foreach { case (g, c) =>
      val k = CharLm.ngramHash(g, 0, n)
      val i = java.util.Arrays.binarySearch(model.gramKeys, k)
      assert(i >= 0, s"n-gram '$g' missing from model")
      assert(model.gramCounts(i) === c, s"count mismatch for '$g'")
    }
    // scoring parity on a held-out doc: naive add-alpha vs kernel
    val doc = PageGen.pages(160).last.text
    val s = CharLm.normalize(doc)
    val denomAdd = model.alpha * chars.size
    val events = s.sliding(n).filter(_.length == n).toSeq
    val naive = events.map { g =>
      -math.log((grams.getOrElse(g, 0L) + model.alpha) /
        (prefs.getOrElse(g.take(n - 1), 0L) + denomAdd))
    }.sum / events.size
    assert(math.abs(model.crossEntropy(doc) - naive) < 1e-9)
  }

  test("in-domain text scores far lower perplexity than gibberish") {
    val heldOut = PageGen.pages(170).drop(150).map(_.text)
    val r = new scala.util.Random(3)
    val gibberish = Seq.fill(10)(
      Array.fill(300)((r.nextInt(94) + 33).toChar).mkString)
    val inPpl = heldOut.map(model.perplexity)
    val outPpl = gibberish.map(model.perplexity)
    assert(inPpl.max < outPpl.min,
      s"in-domain max ${inPpl.max} not below gibberish min ${outPpl.min}")
  }

  test("training is bit-deterministic across parallelism (1 vs 5 partitions)") {
    val m1 = LangModel.trainCharLm(trainDf.repartition(1), "text", n = 3)
    val m5 = LangModel.trainCharLm(trainDf.repartition(5), "text", n = 3)
    assert(m1.alphabetSize === m5.alphabetSize)
    assert(java.util.Arrays.equals(m1.gramKeys, m5.gramKeys))
    assert(java.util.Arrays.equals(m1.gramCounts, m5.gramCounts))
    assert(java.util.Arrays.equals(m1.prefKeys, m5.prefKeys))
    assert(java.util.Arrays.equals(m1.prefCounts, m5.prefCounts))
  }

  test("minCount prunes hapax n-grams; maxVocab fails loudly") {
    val pruned = LangModel.trainCharLm(trainDf, "text", n = 3, minCount = 3L)
    assert(pruned.gramKeys.length < model.gramKeys.length)
    assert(pruned.gramCounts.forall(_ >= 3L))
    val e = intercept[IllegalArgumentException] {
      LangModel.trainCharLm(trainDf, "text", n = 3, maxVocab = 10)
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  test("scorePerplexity: NaN for sub-order docs; filter drops them and gibberish") {
    val docs = Seq(
      (1L, trainTexts.head),                    // in-domain
      (2L, "ab"),                               // shorter than n -> NaN
      (3L, "q%#@Zx!!~^&*()_+|\\qwZZ##@@!!XX"))  // hostile line noise
      .toDF("doc_id", "body")
    val scored = LangModel.scorePerplexity(docs, "doc_id", "body", model)
      .as[(Long, Double)].collect().toMap
    assert(scored(2L).isNaN)
    assert(!scored(1L).isNaN && scored(1L) < scored(3L))
    val kept = LangModel.perplexityFilter(docs, "doc_id", "body", model,
        maxPerplexity = scored(1L) + 1.0)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("scoring plan is shuffle-free: a stateless map against the broadcast model") {
    val scored = LangModel.scorePerplexity(trainDf, "id", "text", model)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "perplexity scoring must not shuffle:\n" + plan.take(600))
  }

  test("normalize: digits fold to 0, whitespace collapses, case folds") {
    assert(CharLm.normalize("  Ab3 \t\n 45x  ") === "ab0 00x")
    assert(CharLm.normalize("\n\t ") === "")
  }
}
