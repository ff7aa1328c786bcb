package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.AhoCorasick

class AhoCorasickSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** All occurrences including overlapping — the AC semantics. */
  private def naiveCount(text: String, pat: String): Int = {
    var c = 0
    var i = text.indexOf(pat)
    while (i >= 0) { c += 1; i = text.indexOf(pat, i + 1) }
    c
  }

  test("textbook example: overlapping patterns all found (he/she/his/hers)") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"), caseInsensitive = false)
    val got = ac.countMatches("ushers")
    // "ushers": she@1, he@2, hers@2
    assert(got.toSeq === Seq(1, 1, 0, 1))
    assert(ac.countTotal("ushers") === 3L)
    assert(ac.distinctMatches("ushers") === 3)
    assert(ac.containsAny("ushers"))
    assert(!ac.containsAny("zzz"))
  }

  test("self-overlapping pattern: 'aa' occurs twice in 'aaa'") {
    val ac = AhoCorasick.build(Seq("aa"), caseInsensitive = false)
    assert(ac.countMatches("aaa").toSeq === Seq(2))
  }

  test("case folding on build and scan") {
    val ac = AhoCorasick.build(Seq("Bad Word"))
    assert(ac.countTotal("this BAD WORD and bad word too") === 2L)
  }

  test("differential fuzz vs naive indexOf over a small alphabet") {
    val rnd = new scala.util.Random(42)
    (0 until 30).foreach { trial =>
      val pats = (0 until 12).map(_ =>
        (0 until 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        .distinct
      val text = (0 until 400).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val ac = AhoCorasick.build(pats, caseInsensitive = false)
      val got = ac.countMatches(text)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) === naiveCount(text, p), s"trial $trial pattern '$p'")
      }
      assert(ac.countTotal(text) === got.map(_.toLong).sum)
    }
  }

  test("null/empty text and bad patterns") {
    val ac = AhoCorasick.build(Seq("x"))
    assert(ac.countTotal(null) === 0L)
    assert(ac.countMatches("").forall(_ == 0))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq.empty))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("ok", "")))
  }

  test("phraseScan op: counts per doc, flag, shuffle-free plan") {
    val df = Seq(
      (1L, "the stream join ran a stream join again"),
      (2L, "window merge here"),
      (3L, "nothing relevant")).toDF("id", "text")
    val out = graft.ops.TextOps.phraseScan(df, "id", "text",
        Seq("stream join", "window merge"))
      .as[(Long, Long, Int, Boolean)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 2L, 1, true)))
    assert(out(1) === ((2L, 1L, 1, true)))
    assert(out(2) === ((3L, 0L, 0, false)))
    val plan = graft.ops.TextOps.phraseScan(df, "id", "text", Seq("x"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
