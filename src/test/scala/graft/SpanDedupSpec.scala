package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.kernel.TextStats
import graft.ops.SpanDedup

class SpanDedupSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("windowHashSpans: spans cover exact token runs; hashes agree on equal runs") {
    val t = "  alpha beta gamma  delta epsilon "
    val spans = TextStats.tokenSpans(t)
    assert(spans.map { case (s, e) => t.substring(s, e) }.toSeq ===
      Seq("alpha", "beta", "gamma", "delta", "epsilon"))
    val w = TextStats.windowHashSpans(t, 2)
    assert(w.length === 4)
    assert(t.substring(w(0)._2, w(0)._3) === "alpha beta")
    // identical token runs hash identically even with different spacing/case
    val w2 = TextStats.windowHashSpans("ALPHA   beta!", 2)
    assert(w2.length === 1)
    // '!' sticks to the token, so only case/spacing-insensitivity is claimed
    val wSame = TextStats.windowHashSpans("ALPHA   beta", 2)
    assert(wSame.head._1 === w(0)._1)
    assert(TextStats.windowHashSpans("one two", 8).isEmpty)
  }

  test("removeDuplicateSpans: canonical occurrence survives, copies are cut") {
    val boiler = "all rights reserved contact us for licensing terms today"
    val docs = Seq(
      (1L, s"unique first text $boiler and a tail"),
      (2L, s"different document $boiler closing words here"),
      (3L, "entirely novel content with no duplication at all present"))
      .toDF("doc_id", "body")
    val out = SpanDedup.removeDuplicateSpans(docs, "doc_id", "body", k = 8)
      .select($"doc_id", $"body").as[(Long, String)].collect().toMap
    // doc 1 holds the canonical (least (id, offset)) occurrence
    assert(out(1L).contains(boiler))
    assert(!out(2L).contains(boiler), s"copy not cut: '${out(2L)}'")
    assert(out(2L).contains("different document"))
    assert(out(2L).contains("closing words here"))
    assert(out(3L) === "entirely novel content with no duplication at all present")
  }

  test("removeDuplicateSpans: consecutive duplicate windows merge into one span") {
    val longDup = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (10L, s"head $longDup tail-a"),
      (20L, s"intro $longDup tail-b")).toDF("doc_id", "body")
    val out = SpanDedup.removeDuplicateSpans(docs, "doc_id", "body", k = 8)
      .select($"doc_id", $"body").as[(Long, String)].collect().toMap
    assert(out(10L) === s"head $longDup tail-a")
    // the whole 30-token run disappears as ONE merged span
    assert(out(20L) === "intro  tail-b")
  }

  test("removeDuplicateSpans equals a naive single-machine reference on the fixture corpus") {
    val base = graft.fixtures.PageGen.pages(60).zipWithIndex
      .map { case (p, i) => (i.toLong, p.text) }
    // plant cross-doc boilerplate in a third of the docs
    val boiler = "standard footer navigation copyright notice terms privacy policy sitemap"
    val corpus = base.map { case (id, t) =>
      if (id % 3 == 0) (id, s"$t $boiler") else (id, t)
    }
    val k = 8
    // ---- naive reference: same semantics, plain Scala maps ----
    val all = corpus.flatMap { case (id, t) =>
      TextStats.windowHashSpans(t, k).map { case (h, s, e) => (h, id, s, e) }
    }
    val byHash = all.groupBy(_._1).filter(_._2.size >= 2)
    val expected = corpus.map { case (id, t) =>
      val spans = byHash.valuesIterator.flatten
        .filter(w => w._2 == id)
        .filterNot { w =>
          val c = byHash(w._1).minBy(x => (x._2, x._3))
          c._2 == w._2 && c._3 == w._3
        }
        .map(w => (w._3, w._4)).toSeq.sorted
      val merged = spans.foldLeft(Vector.empty[(Int, Int)]) { case (acc, (s, e)) =>
        if (acc.nonEmpty && s <= acc.last._2)
          acc.init :+ ((acc.last._1, math.max(acc.last._2, e)))
        else acc :+ ((s, e))
      }
      val sb = new java.lang.StringBuilder(t)
      merged.reverseIterator.foreach { case (s, e) => sb.delete(s, e) }
      id -> sb.toString
    }.toMap
    // ---- distributed result, at two partitionings ----
    Seq(1, 5).foreach { parts =>
      val got = SpanDedup.removeDuplicateSpans(
          corpus.toDF("doc_id", "body").repartition(parts), "doc_id", "body", k)
        .select($"doc_id", $"body").as[(Long, String)].collect().toMap
      assert(got === expected, s"mismatch at $parts partitions")
    }
    // the planted boilerplate survives exactly once
    val out = expected.values.toSeq
    assert(out.count(_.contains(boiler)) === 1)
  }

  test("plan: the span pipeline stays equi-join shaped, never cartesian") {
    val docs = Seq((1L, "a b c d e f g h i"), (2L, "a b c d e f g h j"))
      .toDF("doc_id", "body")
    val out = SpanDedup.removeDuplicateSpans(docs, "doc_id", "body", k = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "span dedup must stay hash-join shaped:\n" + plan.take(600))
  }

  test("duplicateSpanStats: counts and doc spread for duplicated windows") {
    val docs = Seq(
      (1L, "a b c d e f g h tail"), (2L, "a b c d e f g h other"),
      (3L, "a b c d e f g h a b c d e f g h")).toDF("doc_id", "body")
    val stats = SpanDedup.duplicateSpanStats(docs, "doc_id", "body", k = 8)
      .orderBy(desc("cnt")).as[(Long, Long, Long)].collect()
    assert(stats.nonEmpty)
    // the 'a..h' window occurs 4x (docs 1, 2, and twice in 3) over 3 docs
    assert(stats.head._2 === 4L && stats.head._3 === 3L)
  }
}
