package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.kernel.{Html, HtmlStream}
import graft.fixtures.PageGen

/** Differential suite: the streaming kernel must produce results
  * identical to the DOM path (the executable spec) on every input —
  * grammar fixtures, hand-built edge cases, and random tag soup.
  */
class HtmlStreamSpec extends AnyFunSuite {

  private def both(html: String): (Html.Extraction, Html.Extraction) =
    (HtmlStream.extract(html), Html.extractDom(html))

  test("streaming == DOM over the full fixture grammar (incl. malformed, entities, dups)") {
    val pages = PageGen.pages(400)
    val htmls = pages.filterNot(p => p.html.take(5).sameElements("%PDF-".getBytes))
    assert(htmls.nonEmpty)
    htmls.foreach { p =>
      val s = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
      val (a, b) = both(s)
      assert(a == b, s"mismatch for ${p.url}")
    }
  }

  test("streaming == DOM over boosted fixture pages (bench shape)") {
    PageGen.pages(60, seed = 9L, boost = 6)
      .filterNot(p => p.html.take(5).sameElements("%PDF-".getBytes))
      .foreach { p =>
        val s = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
        val (a, b) = both(s)
        assert(a == b, s"mismatch for ${p.url}")
      }
  }

  private val edgeCases = Seq(
    "",
    "plain text no tags",
    "<p>simple</p>",
    "<p>unclosed paragraph <div>next block</div>",
    "<ul><li>one<li>two<li>three</ul>",
    "<table><tr><td>a<td>b<tr><td>c</table>",
    "<dl><dt>t<dd>d<dt>t2</dl>",
    "<nav><a href='/x'>nav link</a><p>inside nav</p></nav><p>real content here with plenty of words to count as a content block for sure</p>",
    "<p>a<script>var x = '<p>not text</p>';</script>b</p>",
    "<p>a<style>p { color: red }</style>b</p>",
    "<textarea>typed <b>stuff</b> &amp; more</textarea><p>after</p>",
    "<title>The &amp; Title</title><h1>Head</h1><p>body text long enough to be content when repeated words words words words words words words words words words words words</p>",
    "<title></title><title>second</title>",
    "<p>ent &amp; &lt; &gt; &quot; &apos; &nbsp; &#65; &#x42; &#xzz; &unknown; &toolongentityname; &am</p>",
    "<p>cut &am<b>p;</b></p>",
    "<!-- comment --><p>x</p><!-- unterminated",
    "<![CDATA[raw &amp; undecoded]]><p>y</p>",
    "<![CDATA[unterminated cdata",
    "<!DOCTYPE html><?xml version='1.0'?><p>z</p>",
    "<p>stray < bracket and 1 < 2 comparisons</p>",
    "</>",
    "</p>",
    "</unmatched></div><p>after unmatched ends</p>",
    "<p a/b>attr junk</p>",
    "<a x/y>link text</a>",
    "<img src=a/><br><hr><p>after voids</p>",
    "<img src=a/ alt=b><p>quirk: slash inside unquoted value</p>",
    "<a href=\"/x\">anchor text</a> outside",
    "<p><a href='/1'>l1</a> <a href='/2'>l2</a> mostly links</p>",
    "<h1>Heading</h1><h2>Sub <h3>nested</h3></h2><p>body</p>",
    "<header><p>masthead</p></header><article><p>the real article body with lots and lots and lots of words to pass the classifier threshold easily here</p></article><footer>foot</footer>",
    "<div><aside>ad ad ad</aside><p>content sentence with more than sixteen words in it so that it is kept by the number rules classifier</p></div>",
    "<P>UPPER<EM>case</EM> TAGS</P><NAV>up nav</NAV>",
    "<p>nbsp run    collapse</p>",
    "<script>while (i<n) { if (a</script><p>after script with lt</p>",
    "<script>never closed",
    "<style>never closed either",
    "<title>never closed title",
    "<p>text at eof with open tags <b><i>nested",
    "<svg:circle r='1'/><x-custom attr>custom tag text</x-custom>",
    "<p =>weird</p>",
    "<p a = 'v' b=c d>mixed attrs</p>",
    "<br/><br /><p>breaks collapse to spaces</p>",
    "<li>li outside list</li>",
    "<td>td outside table</td>",
    "<body><p>first</p><p>second paragraph has enough words to be considered a content block by the classifier rules in use here</p></body>")

  test("streaming == DOM on hand-built edge cases") {
    edgeCases.zipWithIndex.foreach { case (h, i) =>
      val (a, b) = both(h)
      assert(a == b, s"mismatch on edge case #$i: $h")
    }
  }

  private val soupFragment: Gen[String] = Gen.frequency(
    12 -> Gen.oneOf("word", "the and of longer run of plain words here",
      "Schöne Wörter", "x", " ", "  ", "1 < 2", "a & b"),
    8 -> Gen.oneOf("<p>", "</p>", "<div>", "</div>", "<li>", "<ul>", "</ul>",
      "<td>", "<tr>", "<table>", "</table>", "<a href='/x'>", "</a>",
      "<h1>", "</h1>", "<h3>", "</h3>", "<nav>", "</nav>", "<footer>",
      "</footer>", "<aside>", "</aside>", "<b>", "</b>", "<br>", "<hr>",
      "<img src=x>", "<span class='y'>", "</span>", "<dt>", "<dd>", "<dl>"),
    3 -> Gen.oneOf("&amp;", "&lt;", "&#65;", "&#x42;", "&bogus;", "&nbsp;", "&", ";"),
    2 -> Gen.oneOf("<!-- c -->", "<![CDATA[cd&ata]]>", "<!DOCTYPE html>", "<?pi?>"),
    2 -> Gen.oneOf("<script>s<</script>", "<style>.c{}</style>",
      "<title>t</title>", "<textarea>ta</textarea>"),
    1 -> Gen.oneOf("<", ">", "</", "<a x/y>", "<p a/b>", "</unknown>", "<p", "<p attr='unterminated"))

  test("streaming == DOM on random tag soup (property, 500 seeded samples)") {
    val soup: Gen[String] =
      Gen.chooseNum(0, 60).flatMap(k => Gen.listOfN(k, soupFragment).map(_.mkString))
    var seed = Seed(42L)
    (1 to 500).foreach { k =>
      val h = soup.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val (a, b) = both(h)
      assert(a == b, s"mismatch on soup sample #$k: $h")
    }
  }

  test("tokenizer terminates on bare-slash attribute junk") {
    // regression: `<a x/y>` used to loop forever in the attribute scan
    val r = Html.extract("<a x/y>link</a><p>after</p>")
    assert(r.text.contains("after") || r.text.nonEmpty || r.text.isEmpty) // must terminate
    assert(Html.tokenize("<a x/y>ok</a>").nonEmpty)
  }
}
