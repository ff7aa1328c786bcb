package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Compress

/** Compression-ratio signal: band properties (repetitive ≪ prose <
  * random), determinism, inflate round-trip (the deflate stream is
  * real), and the `compression_ratio` expression (kernel equality,
  * null safety, WholeStageCodegen).
  */
class CompressSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def prose(n: Int): String = {
    // deterministic pseudo-prose: varied words, natural-ish zipf shape
    val words = Array("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dogs", "while", "seven", "wizards", "quietly", "brew",
      "strange", "elixirs", "beneath", "ancient", "oaks")
    val sb = new StringBuilder
    var h = 12345L
    while (sb.length < n) {
      h = graft.kernel.TextStats.mix64(h)
      sb.append(words(((h % words.length) + words.length).toInt % words.length)).append(' ')
    }
    sb.toString.take(n)
  }

  private def random(n: Int): String = {
    val sb = new StringBuilder
    var h = 987654321L
    while (sb.length < n) {
      h = graft.kernel.TextStats.mix64(h)
      // printable ASCII 33..126: near-incompressible
      sb.append((33 + (math.abs(h) % 94)).toChar)
    }
    sb.toString
  }

  test("bands: repetitive spam << pseudo-prose < near-random; empty is neutral 1.0") {
    val spam = "buy cheap meds now " * 200
    val rSpam = Compress.ratio(spam)
    val rProse = Compress.ratio(prose(4000))
    val rRand = Compress.ratio(random(4000))
    assert(rSpam < 0.1, s"spam ratio $rSpam")
    assert(rProse > rSpam && rProse < rRand, s"prose $rProse rand $rRand")
    assert(rRand > 0.7, s"random ratio $rRand")
    assert(Compress.ratio("") === 1.0)
    assert(Compress.ratio(null) === 1.0)
  }

  test("deterministic and the deflate stream actually inflates back") {
    val t = prose(2000)
    assert(Compress.ratio(t) === Compress.ratio(t))
    val raw = t.getBytes("UTF-8")
    // independent check that deflatedSize counts a REAL raw-deflate
    // stream: re-deflate with a fresh Deflater and inflate the result
    val d = new java.util.zip.Deflater(Compress.Level, true)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    assert(out.size().toLong === Compress.deflatedSize(raw))
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(out.toByteArray)
    val round = new Array[Byte](raw.length + 16)
    val n = inf.inflate(round)
    inf.end()
    assert(n === raw.length && round.take(n).sameElements(raw))
  }

  test("tiny input may exceed 1.0 (block overhead) and is reported honestly") {
    assert(Compress.ratio("ab") >= 1.0)
  }

  test("compression_ratio expression == kernel, null-safe, inside WholeStageCodegen") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(prose(1000), random(1000), "x" * 500, "", "short")
      .toDF("t").repartition(2)
    val got = rows.selectExpr("t", "compression_ratio(t) AS r")
      .as[(String, Double)].collect()
    got.foreach { case (t, r) => assert(r === Compress.ratio(t), s"len ${t.length}") }
    assert(Seq[Option[String]](None).toDF("t")
      .selectExpr("compression_ratio(t)").first().isNullAt(0))
    val q = rows.selectExpr("compression_ratio(t) > 0.5")
    q.collect()
    assert(q.queryExecution.executedPlan.toString
      .contains("*(1) Project [(compression_ratio("),
      q.queryExecution.executedPlan.toString)
  }
}
