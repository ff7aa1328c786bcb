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

  test("charset sniffing: BOM > meta > utf-8 validation > windows-1252") {
    import graft.kernel.CharsetSniff
    def enc(s: String, cs: String): Array[Byte] =
      s.getBytes(java.nio.charset.Charset.forName(cs))
    // BOM wins over a contradicting meta
    val u16 = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      enc("<meta charset=\"shift_jis\"><p>BOM beats meta: café</p>", "UTF-16LE")
    assert(CharsetSniff.sniff(u16) === "UTF-16LE")
    assert(CharsetSniff.decode(u16).contains("café"))
    // bare meta charset, quoted and unquoted, case-insensitive
    assert(CharsetSniff.sniff(enc("<META CHARSET=WINDOWS-1252><p>x</p>", "windows-1252"))
      === "windows-1252")
    assert(CharsetSniff.sniff(enc("<meta charset='Shift_JIS'>", "US-ASCII")) === "Shift_JIS")
    // http-equiv form; iso-8859-1 label resolves to windows-1252 (WHATWG)
    val he = enc("<meta http-equiv=\"Content-Type\" content=\"text/html; charset=ISO-8859-1\">" +
      "<p>le café coûte 3€</p>", "windows-1252")
    assert(CharsetSniff.sniff(he) === "windows-1252")
    assert(CharsetSniff.decode(he).contains("café coûte 3€"))
    // undeclared valid UTF-8 stays UTF-8 (incl. astral plane)
    val u8 = "<p>emoji 😀 und schöne Wörter</p>".getBytes("UTF-8")
    assert(CharsetSniff.sniff(u8) === "UTF-8")
    assert(CharsetSniff.decode(u8).contains("schöne"))
    // undeclared NON-utf8 bytes fall back to windows-1252
    val legacy = enc("<p>naïve façade</p>", "windows-1252")
    assert(CharsetSniff.sniff(legacy) === "windows-1252")
    assert(CharsetSniff.decode(legacy).contains("naïve façade"))
    // overlong/surrogate/truncated sequences are invalid UTF-8
    assert(!CharsetSniff.isValidUtf8(Array(0xc0.toByte, 0xaf.toByte))) // overlong
    assert(!CharsetSniff.isValidUtf8(Array(0xed.toByte, 0xa0.toByte, 0x80.toByte))) // surrogate
    assert(!CharsetSniff.isValidUtf8("é".getBytes("UTF-8").take(1))) // truncated
    assert(CharsetSniff.isValidUtf8("😀éx".getBytes("UTF-8")))
    // unknown labels are skipped, not fatal; later valid labels win
    val unk = enc("<meta charset=\"x-banana\"><meta charset=\"koi8-r\">", "US-ASCII")
    assert(CharsetSniff.sniff(unk) === "KOI8-R")
    // a '>' INSIDE a quoted attribute value must not truncate the tag
    // before the charset label (WHATWG get-an-attribute: quoted values
    // are skipped when finding the tag end)
    val gtInAttr = enc("<meta content=\"a>b; charset=windows-1251\" " +
      "http-equiv=\"Content-Type\"><p>x</p>", "US-ASCII")
    assert(CharsetSniff.sniff(gtInAttr) === "windows-1251")
    val gtSingle = enc("<meta content='x>y' charset='koi8-r'>", "US-ASCII")
    assert(CharsetSniff.sniff(gtSingle) === "KOI8-R")
    // an apostrophe INSIDE an unquoted value (content=O'Brien — valid
    // HTML) must not swallow the real '>': a later href charset= is NOT
    // a declaration (quotes only delimit when they FOLLOW '=')
    val unquotedApos = "<meta name=author content=O'Brien>" +
      "<a href=\"/convert?charset=latin1\">schön</a>"
    assert(CharsetSniff.sniff(unquotedApos.getBytes("UTF-8")) === "UTF-8")
    // ...but a REAL tag end before the label still bounds the tag: the
    // charset label in a FOLLOWING tag's attribute is that tag's
    val closed = "<meta content=\"a\"><p>charset=latin1 talk</p>".getBytes("UTF-8") ++
      Array(0xf0.toByte) // invalid UTF-8 tail → must fall back to 1252
    assert(CharsetSniff.sniff(closed) === "windows-1252")
    // charset= OUTSIDE a <meta> tag must NOT override detection (review
    // fix: an href query string or inline JS is not a declaration)
    val href = "<a href=\"/convert?charset=latin1\">x</a><p>sch\u00f6n \u00fcberall</p>".getBytes("UTF-8")
    assert(CharsetSniff.sniff(href) === "UTF-8")
    assert(CharsetSniff.decode(href).contains("sch\u00f6n \u00fcberall"))
    // a BOM-less UTF-8 page whose FIRST char encodes as 0xEF.. keeps it
    // (review fix: only a real EF BB BF sequence is a BOM)
    val efStart = "\uffed<p>leading geometric char</p>".getBytes("UTF-8")
    assert((efStart(0) & 0xff) === 0xef && (efStart(2) & 0xff) != 0xbf)
    assert(CharsetSniff.decode(efStart).startsWith("\uffed"))
    // WHATWG: a meta-declared UTF-16 label on ASCII-compatible bytes
    // means UTF-8 (genuine UTF-16 could never reach the ASCII prescan)
    val u16label = enc("<meta charset=\"utf-16le\"><p>ascii body text</p>", "US-ASCII")
    assert(CharsetSniff.sniff(u16label) === "UTF-8")
    assert(CharsetSniff.decode(u16label).contains("ascii body text"))
    // full pipeline: the same page in three encodings extracts identically
    val page = "<html><head><title>t</title>%CS%</head><body><p>" +
      "der große café-garten bietet schöne plätze und noch mehr davon " +
      "für viele lange abende mit den netten nachbarn und guten freunden</p></body></html>"
    val utf8 = page.replace("%CS%", "<meta charset=\"utf-8\">").getBytes("UTF-8")
    val w1252 = enc(page.replace("%CS%", "<meta charset=\"windows-1252\">"), "windows-1252")
    val utf16 = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      enc(page.replace("%CS%", ""), "UTF-16LE")
    val a = Html.extract(utf8).text
    assert(a.nonEmpty && a === Html.extract(w1252).text && a === Html.extract(utf16).text)
  }

  test("extractLinks: resolution, fragments, pseudo-links, crawl junk") {
    val page = "https://example.com/a/b/page.html"
    val html = """<body>
      <a href="https://other.com/x">abs</a>
      <a href="//cdn.example.com/lib.js">proto-relative</a>
      <a href="/root.html">root-rel</a>
      <a href="sibling.html">path-rel</a>
      <a href="../up.html">dot-dot</a>
      <a href="#frag">fragment-only</a>
      <a href="/keep#frag">fragment-stripped</a>
      <a href="javascript:void(0)">js</a>
      <a href="mailto:x@y.z">mail</a>
      <a href="tel:+123">tel</a>
      <a>no href</a>
      <a href="http://spaced.com/a b">unencoded space</a>
      </body>"""
    val links = Html.extractLinks(html, page)
    assert(links === Vector(
      "https://other.com/x",
      "https://cdn.example.com/lib.js",
      "https://example.com/root.html",
      "https://example.com/a/b/sibling.html",
      "https://example.com/a/up.html",
      "https://example.com/keep",
      "http://spaced.com/a b"))
    // byte entry point goes through charset sniffing
    assert(Html.extractLinks(html.getBytes("UTF-8"), page) === links)
  }

  test("extractAnchors: href + anchor text pairs, nesting and junk handled") {
    val page = "https://example.com/p"
    val html = """<body>
      <a href="/one">First  <b>Link</b>
      text</a>
      <a href="/two">second</a>
      <a href="#frag">fragmentary</a>
      <a href="/three">unclosed opens another <a href="/four">fourth</a>
      <p>stray text outside anchors</p>
      <a href="/empty"></a>
      <a href="/last">trailing unclosed"""
    val got = Html.extractAnchors(html, page)
    assert(got === Vector(
      ("https://example.com/one", "First Link text"),
      ("https://example.com/two", "second"),
      ("https://example.com/three", "unclosed opens another"),
      ("https://example.com/four", "fourth"),
      ("https://example.com/empty", ""),
      ("https://example.com/last", "trailing unclosed")))
    // consistency: anchors' hrefs == extractLinks' output
    assert(got.map(_._1) === Html.extractLinks(html, page))
    assert(Html.extractAnchors(html.getBytes("UTF-8"), page) === got)
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
