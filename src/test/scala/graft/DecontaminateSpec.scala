package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Decontaminate

class DecontaminateSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // train corpus with known contamination: docs 10/11 quote eval text
  // verbatim (shifted window), doc 12 shares nothing, doc 13 shares a
  // 3-gram but not a 4-gram, doc 14 differs only by CASE and whitespace
  private val evalDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs"))
  private val trainDocs = Seq(
    (10L, "intro words then the quick brown fox jumps and more"),
    (11L, "jumps over the lazy dog is a classic pangram ending"),
    (12L, "completely disjoint sentence with original content here"),
    (13L, "my box with something else entirely now"),
    (14L, "PACK  MY   BOX WITH five unrelated tail words"))

  private lazy val evalDf = evalDocs.toDF("doc_id", "text")
  private lazy val trainDf = trainDocs.toDF("doc_id", "text")

  test("overlapReport finds exactly the 4-gram-sharing docs, with counts") {
    val rep = Decontaminate.overlapReport(trainDf, evalDf, "doc_id", "text", n = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // doc 10: "the quick brown fox" + "quick brown fox jumps" (2 grams, 1 eval doc)
    // doc 11: "jumps over the lazy" + "over the lazy dog" (2 grams, 1 eval doc)
    // doc 14: "pack my box with" + "my box with five" after
    // lower+ws-collapse (2 grams, 1 eval doc)
    assert(rep === Seq((10L, 1L, 2L), (11L, 1L, 2L), (14L, 1L, 2L)))
  }

  test("removeContaminated drops hit docs, keeps the rest, schema intact") {
    val out = Decontaminate.removeContaminated(trainDf, evalDf, "doc_id", "text", n = 4)
    assert(out.columns.toSeq === trainDf.columns.toSeq)
    assert(out.select("doc_id").as[Long].collect().sorted === Seq(12L, 13L))
    // minHits=3 tolerates the 2-gram hits: everything survives but the
    // verbatim quoters are also only at 2 — raise to prove the knob
    val loose = Decontaminate.removeContaminated(trainDf, evalDf, "doc_id", "text",
      n = 4, minHits = 3L)
    assert(loose.select("doc_id").as[Long].collect().sorted ===
      Seq(10L, 11L, 12L, 13L, 14L))
  }

  test("hashed-gram join == naive string-gram join on a generated corpus") {
    val base = graft.fixtures.PageGen.pages(80).zipWithIndex
      .map { case (p, i) => (i.toLong, p.text) }
    val df = base.toDF("doc_id", "text")
    val eval = df.where($"doc_id" % 7 === 0)
    val train = df.where($"doc_id" % 7 =!= 0)
    val n = 4
    // naive reference: exact string n-grams, plain Scala
    def grams(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+")
      if (toks.length < n) Set.empty
      else toks.sliding(n).map(_.mkString(" ")).toSet
    }
    val evalGrams = base.filter(_._1 % 7 == 0).flatMap(g => grams(g._2)).toSet
    val expected = base.filter(_._1 % 7 != 0).flatMap { case (id, t) =>
      val hit = grams(t).intersect(evalGrams)
      if (hit.isEmpty) None else Some(id -> hit.size.toLong)
    }.toMap
    val got = Decontaminate.overlapReport(train, eval, "doc_id", "text", n)
      .select($"id", $"grams_hit").as[(Long, Long)].collect().toMap
    assert(got === expected)
    // broadcast and shuffle paths agree
    val shuffled = Decontaminate.overlapReport(train, eval, "doc_id", "text", n,
      broadcastEval = false)
      .select($"id", $"grams_hit").as[(Long, Long)].collect().toMap
    assert(shuffled === expected)
  }

  test("broadcast probe plan: eval side broadcast, no train-side exchange before the join") {
    val rep = Decontaminate.overlapReport(trainDf, evalDf, "doc_id", "text", n = 4)
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in:\n$plan")
  }

  test("degenerate inputs: short docs, empty eval, n=1") {
    val shorts = Seq((1L, "one two three")).toDF("doc_id", "text")
    assert(Decontaminate.overlapReport(shorts, evalDf, "doc_id", "text", n = 4).count() === 0)
    val emptyEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Decontaminate.removeContaminated(trainDf, emptyEval, "doc_id", "text", n = 4)
      .count() === trainDf.count())
    // n=1: any shared token contaminates
    val rep1 = Decontaminate.overlapReport(
      Seq((1L, "dog walks")).toDF("doc_id", "text"),
      Seq((9L, "lazy dog")).toDF("doc_id", "text"), "doc_id", "text", n = 1)
      .as[(Long, Long, Long)].collect()
    assert(rep1.toSeq === Seq((1L, 1L, 1L)))
  }
}
