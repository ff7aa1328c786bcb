package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Html
import graft.ops.Structured

class StructuredSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("tables: header row, caption, entity cells, ragged rows") {
    val html =
      """<table><caption>Results &amp; Notes</caption>
        |<tr><th>Name</th><th>Score</th></tr>
        |<tr><td>alpha</td><td>10</td></tr>
        |<tr><td>beta</td></tr>
        |</table>""".stripMargin
    val ts = Html.extractTables(html)
    assert(ts.size === 1)
    val t = ts.head
    assert(t.caption === "Results & Notes")
    assert(t.headers === Vector("Name", "Score"))
    assert(t.rows === Vector(Vector("alpha", "10"), Vector("beta")))
  }

  test("tables: colspan duplicates, rowspan carries down (grid fill)") {
    val html =
      """<table>
        |<tr><td rowspan=2>A</td><td>B1</td><td>C1</td></tr>
        |<tr><td>B2</td><td>C2</td></tr>
        |<tr><td colspan=2>W</td><td>C3</td></tr>
        |</table>""".stripMargin
    val t = Html.extractTables(html).head
    assert(t.rows === Vector(
      Vector("A", "B1", "C1"),
      Vector("A", "B2", "C2"),
      Vector("W", "W", "C3")))
  }

  test("tables: nested tables enumerate separately, outer cell excludes inner text") {
    val html =
      """<table><tr><td>outer <table><tr><td>inner</td></tr></table></td>
        |<td>plain</td></tr></table>""".stripMargin
    val ts = Html.extractTables(html)
    assert(ts.size === 2)
    assert(ts(0).rows === Vector(Vector("outer", "plain")))
    assert(ts(1).rows === Vector(Vector("inner")))
    // implied-close soup (no </tr>/</td>) still yields rows
    val soup = "<table><tr><td>a<td>b<tr><td>c<td>d</table>"
    assert(Html.extractTables(soup).head.rows ===
      Vector(Vector("a", "b"), Vector("c", "d")))
  }

  test("head metadata: og/meta map, canonical, title, JSON-LD verbatim") {
    val html =
      """<html><head><title> The  Page </title>
        |<meta property="og:title" content="OG Title">
        |<meta name="description" content="A description">
        |<meta property="og:title" content="ignored duplicate">
        |<meta content="no key, skipped">
        |<link rel="canonical" href="https://example.com/x">
        |<script type="application/ld+json">{"@type":"Article","x":1}</script>
        |<script>var notLd = 1;</script>
        |</head><body><p>text</p></body></html>""".stripMargin
    val m = Html.extractMetadata(html)
    assert(m.title === "The Page")
    assert(m.canonical === "https://example.com/x")
    assert(m.meta("og:title") === "OG Title")
    assert(m.meta("description") === "A description")
    assert(!m.meta.contains(""))
    assert(m.jsonLd === Vector("""{"@type":"Article","x":1}"""))
  }

  test("driver entries pipe42/pipe43/pipe44 self-verify against the fixture's expected counts") {
    // the entries `require` fixture-vs-extracted totals internally
    assert(SparkEntry.queries("pipe42_html_tables")(spark, "").count() > 0)
    assert(SparkEntry.queries("pipe43_head_metadata")(spark, "").count() > 0)
    assert(SparkEntry.queries("pipe44_markdown")(spark, "").count() > 0)
  }

  test("markdown op: structure survives, garbage and null rows isolate to empty") {
    val rows = Seq(
      (1L, "<h2>T</h2><ul><li>a</li></ul>".getBytes("UTF-8")),
      (2L, Array.tabulate[Byte](64)(i => (i * 37 % 251).toByte)), // binary junk
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "html")
    val got = Structured.markdown(rows, "doc_id", "html")
      .as[(Long, String, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 === "## T\n\n- a")
    assert(got(1L)._3 === got(1L)._2.length)
    assert(got(3L)._2 === "")
    assert(got.size === 3) // junk row present, never throws
  }

  test("spark ops: per-document fan-out over binary html, failures isolated") {
    val rows = Seq(
      (1L, "<table><tr><th>H</th></tr><tr><td>v1</td></tr><tr><td>v2</td></tr></table>"
        .getBytes("UTF-8")),
      (2L, "<p>no tables here</p><meta property='og:type' content='article'>"
        .getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "html")
    val t = Structured.tables(rows, "doc_id", "html")
      .as[(Long, Int, String, Seq[String], Int, Seq[String])].collect()
    assert(t.length === 2)
    assert(t.forall(_._1 === 1L))
    assert(t.map(_._6).toSeq === Seq(Seq("v1"), Seq("v2")))
    val m = Structured.headMetadata(rows, "doc_id", "html")
      .as[(Long, String, String, Map[String, String], Seq[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(m(2L)._4("og:type") === "article")
    assert(m(3L)._2 === "" && m(3L)._4.isEmpty)
  }
}
