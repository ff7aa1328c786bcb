package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Markdown

class MarkdownSpec extends AnyFunSuite {

  private def md(html: String): String = Markdown.fromHtml(html)

  test("headings map to ATX levels") {
    assert(md("<h1>Top</h1><h2>Sub</h2><h6>Deep</h6>") ===
      "# Top\n\n## Sub\n\n###### Deep")
  }

  test("paragraphs collapse whitespace and separate with blank lines") {
    assert(md("<p>one\n  two</p><p>three</p>") === "one two\n\nthree")
  }

  test("emphasis: strong, em, del, nested") {
    assert(md("<p><strong>bold</strong> and <em>it</em></p>") ===
      "**bold** and *it*")
    assert(md("<p><b>b <i>bi</i></b></p>") === "**b *bi***")
    assert(md("<p><del>gone</del></p>") === "~~gone~~")
  }

  test("emphasis with flanking whitespace moves the space outside") {
    assert(md("<p>a<strong> b </strong>c</p>") === "a **b** c")
  }

  test("links and images") {
    assert(md("""<p><a href="https://x.io/a">text</a></p>""") ===
      "[text](https://x.io/a)")
    assert(md("""<p><img src="i.png" alt="pic"></p>""") === "![pic](i.png)")
    // javascript: href drops the link, keeps the text
    assert(md("""<p><a href="javascript:void(0)">keep</a></p>""") === "keep")
    // parens in URLs percent-escaped so the () syntax survives
    assert(md("""<p><a href="https://x.io/a(1)">t</a></p>""") ===
      "[t](https://x.io/a%281%29)")
  }

  test("inline code spans grow their fence past interior backticks") {
    assert(md("<p><code>x = 1</code></p>") === "`x = 1`")
    assert(md("<p><code>a ` b</code></p>") === "``a ` b``")
    assert(md("<p><code>`lead</code></p>") === "`` `lead ``")
  }

  test("inline code is not markdown-escaped") {
    assert(md("<p><code>a*b_c[d]</code></p>") === "`a*b_c[d]`")
  }

  test("pre becomes a fenced block preserving interior whitespace") {
    assert(md("<pre>if (a)\n  b()\n</pre>") === "```\nif (a)\n  b()\n```")
  }

  test("pre>code with language class carries the info string") {
    assert(md("""<pre><code class="language-scala">val x = 1</code></pre>""") ===
      "```scala\nval x = 1\n```")
  }

  test("fence grows past backtick runs in the payload") {
    assert(md("<pre>a ``` b</pre>") === "````\na ``` b\n````")
  }

  test("unordered and ordered lists, start attribute honored") {
    assert(md("<ul><li>a</li><li>b</li></ul>") === "- a\n- b")
    assert(md("""<ol start="3"><li>x</li><li>y</li></ol>""") === "3. x\n4. y")
  }

  test("nested lists indent under the parent item") {
    assert(md("<ul><li>a<ul><li>a1</li><li>a2</li></ul></li><li>b</li></ul>") ===
      "- a\n\n  - a1\n  - a2\n- b")
  }

  test("multi-block list items continue at bullet indent") {
    assert(md("<ul><li><p>one</p><p>two</p></li></ul>") === "- one\n\n  two")
  }

  test("blockquote prefixes every line and nests") {
    assert(md("<blockquote><p>a</p><p>b</p></blockquote>") === "> a\n>\n> b")
    assert(md("<blockquote><blockquote><p>deep</p></blockquote></blockquote>") ===
      "> > deep")
  }

  test("hr and br") {
    assert(md("<p>a</p><hr><p>b</p>") === "a\n\n---\n\nb")
    assert(md("<p>line one<br>line two</p>") === "line one\\\nline two")
  }

  test("tables render as GFM pipe tables with header separator") {
    val html = "<table><tr><th>h1</th><th>h2</th></tr>" +
      "<tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
    assert(md(html) ===
      "| h1 | h2 |\n| --- | --- |\n| a | b |\n| c | d |")
  }

  test("table colspan duplicates across the grid; pipes escaped in cells") {
    val html = """<table><tr><th colspan="2">w</th></tr><tr><td>a|x</td><td>b</td></tr></table>"""
    assert(md(html) ===
      "| w | w |\n| --- | --- |\n| a\\|x | b |")
  }

  test("table without th row promotes the first row to header") {
    assert(md("<table><tr><td>x</td></tr><tr><td>y</td></tr></table>") ===
      "| x |\n| --- |\n| y |")
  }

  test("table caption precedes the table as its own block") {
    assert(md("<table><caption>Cap</caption><tr><td>v</td></tr></table>") ===
      "Cap\n\n| v |\n| --- |")
  }

  test("markdown-significant source characters are escaped") {
    assert(md("<p>2 * 3 = 6 and a_b and [x]</p>") ===
      "2 \\* 3 = 6 and a\\_b and \\[x\\]")
    assert(md("<p># not a heading</p>") === "\\# not a heading")
    assert(md("<p>- not a bullet</p>") === "\\- not a bullet")
    assert(md("<p>1. not ordered</p>") === "\\1. not ordered")
  }

  test("script, style, head and form controls contribute nothing") {
    val html = "<head><title>T</title><style>p{}</style></head>" +
      "<body><script>var x;</script><p>only</p>" +
      "<select><option>no</option></select></body>"
    assert(md(html) === "only")
  }

  test("entities decode before rendering (and get re-escaped if needed)") {
    assert(md("<p>a &amp; b &lt;c&gt;</p>") === "a & b <c>")
    assert(md("<p>&#42;lit&#42;</p>") === "\\*lit\\*")
  }

  test("definition lists: dt plain, dd colon-prefixed") {
    assert(md("<dl><dt>term</dt><dd>meaning</dd></dl>") === "term\n\n: meaning")
  }

  test("inline runs around block children split into separate paragraphs") {
    assert(md("<div>pre<p>mid</p>post</div>") === "pre\n\nmid\n\npost")
  }

  test("malformed HTML: unclosed tags and stray closers still render") {
    assert(md("<p>open<ul><li>item") === "open\n\n- item")
    assert(md("</div><p>x</p>") === "x")
    assert(md("") === "")
  }

  test("bytes entry point goes through charset sniffing") {
    val bytes = "<p>café</p>".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(Markdown.fromHtml(bytes) === "café")
  }

  test("deterministic on a composite page") {
    val page =
      """<html><head><title>t</title></head><body>
        |<h1>Title</h1><p>Intro <strong>text</strong> with <a href="/x">link</a>.</p>
        |<ul><li>one</li><li>two<ol><li>n1</li></ol></li></ul>
        |<pre><code class="language-py">print(1)</code></pre>
        |<table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table>
        |</body></html>""".stripMargin
    val once = md(page)
    assert(once === md(page))
    assert(once ===
      "# Title\n\nIntro **text** with [link](/x).\n\n- one\n- two\n\n  1. n1\n\n" +
        "```py\nprint(1)\n```\n\n| k | v |\n| --- | --- |\n| a | 1 |")
  }
}
