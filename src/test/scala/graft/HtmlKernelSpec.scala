package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Html

class HtmlKernelSpec extends AnyFunSuite {

  test("entity decode: named, numeric dec/hex, unknown left verbatim") {
    assert(Html.decodeEntities("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") ===
      "a & b <c> \"d\" 'e'")
    assert(Html.decodeEntities("&#65;&#x42;") === "AB")
    assert(Html.decodeEntities("&bogus; & plain") === "&bogus; & plain")
    assert(Html.decodeEntities("x&nbsp;y") === "x y")
  }

  test("whitespace collapse folds runs incl NBSP and trims") {
    assert(Html.collapseWs("  a \t\n b  c  ") === "a b c")
    assert(Html.collapseWs("") === "")
  }

  test("tokenizer: tags, attributes, comments, doctype, stray <") {
    val toks = Html.tokenize(
      """<!DOCTYPE html><!-- c --><p class="x" id=y disabled>a < b</p>""")
    assert(toks === Vector(
      Html.TStart("p", Map("class" -> "x", "id" -> "y", "disabled" -> ""), selfClosing = false),
      Html.TText("a < b"),
      Html.TEnd("p")))
  }

  test("tokenizer: raw-text script/style dropped, title kept") {
    val toks = Html.tokenize(
      "<title>T &amp; t</title><script>if (a<b) {x</p>}</script><style>p{}</style><p>ok</p>")
    assert(toks.collect { case Html.TText(t) => t } === Vector("T & t", "ok"))
  }

  test("tokenizer: CDATA and self-closing") {
    val toks = Html.tokenize("<div><![CDATA[x &amp; y]]><br/></div>")
    assert(toks(1) === Html.TText("x &amp; y")) // CDATA not entity-decoded
    assert(toks(2) === Html.TStart("br", Map.empty, selfClosing = true))
  }

  test("DOM: implied <p> close and <li> close; unmatched end ignored") {
    val root = Html.parse("<body><p>one<p>two</ul><ul><li>a<li>b</ul></body>")
    val body = root.children.head.asInstanceOf[Html.Element]
    val names = body.children.collect { case e: Html.Element => e.name }
    assert(names === Seq("p", "p", "ul"))
    val ul = body.children.last.asInstanceOf[Html.Element]
    assert(ul.children.collect { case e: Html.Element => e.name } === Seq("li", "li"))
  }

  test("unclosed tags close at EOF without crash") {
    val ex = Html.extract("<div><p>" + ("word " * 30))
    assert(ex.text.startsWith("word word"))
  }

  private val samplePage =
    """<!DOCTYPE html>
      |<html><head><title>Sample &amp; Title</title>
      |<style>.x{color:red}</style><script>var a = "<p>";</script></head>
      |<body>
      |<nav><a href="/">Home</a> <a href="/x">Products</a> <a href="/y">About us page</a></nav>
      |<h1>Deep learning at scale</h1>
      |<p>This is the first long content paragraph that definitely carries more than
      |sixteen words of meaningful body text for the extractor to keep around here.</p>
      |<p>A second paragraph follows with another healthy amount of words so that the
      |density classifier marks it as main content too, beyond any doubt at all.</p>
      |<aside><a href="/ad">Buy now</a> great deals</aside>
      |<footer>Copyright 2024 <a href="/tos">Terms</a></footer>
      |</body></html>""".stripMargin

  test("extraction: boilerplate stripped, content kept, blocks joined with newline") {
    val ex = Html.extract(samplePage)
    assert(ex.title === "Sample & Title")
    assert(!ex.text.contains("Home"))
    assert(!ex.text.contains("Copyright"))
    assert(!ex.text.contains("Buy now"))
    assert(!ex.text.contains("color:red"))
    assert(!ex.text.contains("var a"))
    val lines = ex.text.split('\n')
    assert(lines.length >= 2)
    assert(lines.exists(_.startsWith("This is the first long content paragraph")))
    assert(lines.exists(_.startsWith("A second paragraph follows")))
    assert(ex.contentBlocks >= 2)
    assert(ex.boilerBlocks >= 3)
    assert(ex.headings === Vector("Deep learning at scale"))
    assert(ex.language === "en")
  }

  test("extraction is deterministic and has no trailing newline") {
    val a = Html.extract(samplePage)
    val b = Html.extract(samplePage)
    assert(a === b)
    assert(!a.text.endsWith("\n"))
  }

  test("link-dense blocks are boilerplate even outside nav") {
    val html = "<body><div><a href='1'>one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen</a></div></body>"
    assert(Html.extract(html).text === "")
  }

  test("language detection on stopword profiles") {
    assert(graft.kernel.Lang.detect("the cat and the dog are in the house with a bird") === "en")
    assert(graft.kernel.Lang.detect("le chat et le chien sont dans la maison avec un oiseau") === "fr")
    assert(graft.kernel.Lang.detect("der Hund und die Katze sind mit einem Vogel") === "de")
    assert(graft.kernel.Lang.detect("el gato y el perro en la casa con un pájaro") === "es")
    assert(graft.kernel.Lang.detect("zzz qqq") === "und")
    assert(graft.kernel.Lang.detect("") === "und")
  }
}
