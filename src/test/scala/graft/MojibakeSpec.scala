package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import graft.kernel.Mojibake

/** Mojibake repair: kernel round-trips (windows-1252 and latin-1
  * mis-decodes, single/double/triple encoded), conservatism on clean
  * text, and the `fix_mojibake` Catalyst expression (equality with the
  * kernel, null safety, WholeStageCodegen).
  */
class MojibakeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** WHATWG windows-1252 high window (0x80–0x9F): unlike Java's cp1252
    * decoder (which REPLACES the five undefined bytes with U+FFFD,
    * destroying them), browsers map them to the C1 controls — and
    * browser-shaped mis-decodes are the mojibake that reaches a crawl.
    */
  private val whatwgHigh = "\u20ac\u0081\u201a\u0192\u201e\u2026\u2020\u2021" +
    "\u02c6\u2030\u0160\u2039\u0152\u008d\u017d\u008f" +
    "\u0090\u2018\u2019\u201c\u201d\u2022\u2013\u2014" +
    "\u02dc\u2122\u0161\u203a\u0153\u009d\u017e\u0178"

  /** What a WHATWG cp1252 (resp. latin-1) mis-decode of s's UTF-8 bytes shows. */
  private def moji(s: String): String = {
    val b = s.getBytes(UTF_8)
    val sb = new StringBuilder(b.length)
    b.foreach { x =>
      val u = x & 0xff
      sb.append(if (u >= 0x80 && u <= 0x9f) whatwgHigh.charAt(u - 0x80) else u.toChar)
    }
    sb.toString
  }
  private def mojiL1(s: String): String = new String(s.getBytes(UTF_8), ISO_8859_1)

  private val clean = Seq(
    "Café crème brûlée — déjà vu",
    "αβγ δε ζη", // Greek: multibyte UTF-8, classic mojibake source
    "O’Brien — “quoted” … naïve",
    "résumé ± 3°C £20 €5")

  test("repair inverts a windows-1252 mis-decode (single round)") {
    clean.foreach { s =>
      val broken = moji(s)
      assert(broken != s)
      assert(Mojibake.repair(broken) === s, s"for [$s]")
    }
  }

  test("repair inverts a latin-1 mis-decode too") {
    clean.foreach { s => assert(Mojibake.repair(mojiL1(s)) === s, s"for [$s]") }
  }

  test("double and triple encoding unwind fully; quadruple stops at the round cap") {
    val s = "héllo wörld — ’tis"
    assert(Mojibake.repair(moji(moji(s))) === s)
    assert(Mojibake.repair(moji(moji(moji(s)))) === s)
    // 4x encoded: MaxRounds=3 leaves one layer — still strictly better
    assert(Mojibake.repair(moji(moji(moji(moji(s))))) === moji(s))
  }

  test("clean text is untouched (same reference where possible)") {
    // legit accented text: lone high bytes are invalid UTF-8 -> no round
    clean.foreach { s => assert(Mojibake.repair(s) eq s) }
    val ascii = "plain ascii, no high bytes at all"
    assert(Mojibake.repair(ascii) eq ascii)
    val cjk = "日本語のテキストそのまま"
    assert(Mojibake.repair(cjk) eq cjk)
    assert(Mojibake.repair(null) === null)
    assert(Mojibake.repair("") === "")
  }

  test("mixed legit+broken text is left alone (conservative: strict decode fails)") {
    val mixed = "café " + moji("é") // E9 byte next to C3 A9 bytes
    assert(Mojibake.repair(mixed) eq mixed)
  }

  test("isMojibake flags repaired strings only") {
    assert(Mojibake.isMojibake(moji("résumé")))
    assert(!Mojibake.isMojibake("résumé"))
    assert(!Mojibake.isMojibake("ascii"))
    assert(!Mojibake.isMojibake(null))
  }

  test("fix_mojibake expression == kernel, null-safe, inside WholeStageCodegen") {
    graft.functions.GraftFunctions.register(spark)
    val rows = (clean.map(moji) ++ clean ++ Seq("ascii only", moji(moji("déjà"))))
      .toDF("t").repartition(2)
    val got = rows.selectExpr("t", "fix_mojibake(t) AS f")
      .as[(String, String)].collect()
    got.foreach { case (t, f) => assert(f === Mojibake.repair(t), s"for [$t]") }
    assert(Seq[Option[String]](None).toDF("t")
      .selectExpr("fix_mojibake(t)").first().isNullAt(0))
    val q = rows.selectExpr("length(fix_mojibake(t))")
    q.collect()
    assert(q.queryExecution.executedPlan.toString
      .contains("*(1) Project [length(fix_mojibake("),
      q.queryExecution.executedPlan.toString)
  }
}
