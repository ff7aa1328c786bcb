package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.{CssSelect, Html}

class CssSelectSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val doc = Html.parse("""
    <html><body>
      <div id="main" class="article wide">
        <h1>Title One</h1>
        <p class="lead intro">First para</p>
        <p>Second <b>para</b></p>
        <p data-k="v1">Third para</p>
        <div class="nested">
          <p>Deep para</p>
          <a href="https://x.example/a" rel="nofollow external">link A</a>
          <a href="/b">link B</a>
        </div>
      </div>
      <ul>
        <li>one</li><li>two</li><li>three</li><li>four</li><li>five</li>
      </ul>
      <div class="footer"><p>fine print</p><script>var x = "<p>no</p>";</script></div>
    </body></html>""")

  private def texts(sel: String): Vector[String] =
    CssSelect.select(doc, sel).map(CssSelect.innerText)

  private def tags(sel: String): Vector[String] =
    CssSelect.select(doc, sel).map(_.name)

  test("type, class, id, compound") {
    assert(texts("h1") === Vector("Title One"))
    assert(texts("p.lead") === Vector("First para"))
    assert(texts(".intro") === Vector("First para"))
    assert(texts("#main > h1") === Vector("Title One"))
    assert(tags("div.article.wide") === Vector("div"))
    assert(texts("p.lead.intro") === Vector("First para"))
    assert(texts("p.absent") === Vector())
    // class matching is whole-token: 'wide' must not match 'wider'
    val d2 = Html.parse("""<div class="wider">x</div>""")
    assert(CssSelect.select(d2, ".wide").isEmpty)
  }

  test("attribute selectors: presence, =, ^=, $=, *=, ~=") {
    assert(texts("[data-k]") === Vector("Third para"))
    assert(texts("[data-k=v1]") === Vector("Third para"))
    assert(texts("[data-k='v1']") === Vector("Third para"))
    assert(texts("a[href^='https://']") === Vector("link A"))
    assert(texts("a[href$='/b']") === Vector("link B"))
    assert(texts("a[href*='x.example']") === Vector("link A"))
    assert(texts("a[rel~=external]") === Vector("link A"))
    assert(texts("a[rel~=ext]") === Vector(), "~= must be whole-token")
  }

  test("combinators: descendant, child, sibling") {
    assert(texts("#main p").length === 4, "descendant reaches the nested p")
    assert(texts("#main > p").length === 3, "child does not")
    assert(texts("h1 + p") === Vector("First para"))
    assert(texts("h1 ~ p").length === 3, "general sibling: all following p at that level")
    assert(texts(".nested a + a") === Vector("link B"))
    assert(texts("div div p") === Vector("Deep para"))
  }

  test("pseudo-classes: first/last/only/nth-child") {
    assert(texts("li:first-child") === Vector("one"))
    assert(texts("li:last-child") === Vector("five"))
    assert(texts("li:nth-child(2)") === Vector("two"))
    assert(texts("li:nth-child(odd)") === Vector("one", "three", "five"))
    assert(texts("li:nth-child(even)") === Vector("two", "four"))
    assert(texts("li:nth-child(2n+1)") === Vector("one", "three", "five"))
    assert(texts("li:nth-child(-n+2)") === Vector("one", "two"))
    assert(texts("li:nth-child(3n)") === Vector("three"))
    assert(texts(".footer p:only-child") === Vector(),
      "script sibling makes p not an only child")
  }

  test("selector lists union in document order, deduplicated") {
    val got = texts("h1, p.lead, h1")
    assert(got === Vector("Title One", "First para"))
    val all = CssSelect.select(doc, "*")
    assert(CssSelect.select(doc, "p, *").length === all.length,
      "union with * must not duplicate")
  }

  test("inner text skips script subtrees; syntax errors are loud") {
    assert(texts(".footer").head === "fine print", "script text must not leak")
    intercept[CssSelect.CssError](CssSelect.compile(""))
    intercept[CssSelect.CssError](CssSelect.compile("p..x"))
    intercept[CssSelect.CssError](CssSelect.compile("p["))
    intercept[CssSelect.CssError](CssSelect.compile("p:hover"))
    intercept[CssSelect.CssError](CssSelect.compile("p >"))
    intercept[CssSelect.CssError](CssSelect.compile("a, "))
  }

  test("containment properties over fixture pages") {
    val pages = graft.fixtures.PageGen.pages(60, seed = 5L)
    pages.foreach { p =>
      val root = Html.parse(graft.kernel.CharsetSniff.decode(p.html))
      val all = CssSelect.select(root, "*")
      val divs = CssSelect.select(root, "div")
      assert(divs.forall(_.name == "div"))
      assert(divs.toSet.subsetOf(all.toSet))
      val childP = CssSelect.select(root, "div > p").toSet
      val descP = CssSelect.select(root, "div p").toSet
      assert(childP.subsetOf(descP), "child matches must be descendant matches")
      val first = CssSelect.select(root, "p:first-child").toSet
      val nth1 = CssSelect.select(root, "p:nth-child(1)").toSet
      assert(first === nth1, ":first-child == :nth-child(1)")
    }
  }

  test("Spark operator: rows per match, document order, C5 isolation") {
    val rows = Seq(
      (1L, """<div class="c"><p>a</p><p>b</p></div>""".getBytes("UTF-8")),
      (2L, """<p class="c">only</p>""".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
    val got = graft.ops.Structured.cssSelect(
      rows.toDF("doc_id", "html"), "doc_id", "html", "div.c p, p.c")
      .select($"doc_id", $"match_idx", $"text")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toVector
    assert(got === Vector((1L, 0, "a"), (1L, 1, "b"), (2L, 0, "only")))
    // attrs column carries the scrape targets
    val hrefs = graft.ops.Structured.cssSelect(
      Seq((9L, """<a href="/x">t</a>""".getBytes("UTF-8"))).toDF("doc_id", "html"),
      "doc_id", "html", "a[href]")
      .select($"attrs").as[Map[String, String]].collect()
    assert(hrefs.head("href") === "/x")
    intercept[Exception](graft.ops.Structured.cssSelect(
      rows.toDF("doc_id", "html"), "doc_id", "html", "p:::"))
  }
}
