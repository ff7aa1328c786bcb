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

  // ---- hostile corpus (round-3 verdict item 7): the shapes real crawls
  // are ugliest at — unclosed raw-text elements, nested/implied tables,
  // entity edge cases, >64 KB attributes, pathological nesting. Both
  // kernels must agree byte-for-byte AND match the frozen goldens in
  // src/test/resources/golden/hostile_html.tsv, so the behavior on
  // hostile input is pinned across refactors, not just self-consistent.

  private[graft] def hostileCorpus: Seq[(String, String)] = {
    // the Boilerpipe rules need > 16 words for a lone block to classify
    // as content - every block meant to SURVIVE extraction carries this
    // filler, so the goldens pin non-empty extracted text
    val pad = "with plenty of additional plain filler words so the block " +
      "clears the classifier threshold of sixteen words easily"
    val bigAttr = "x" * 70000
    val bigText = ("lorem ipsum dolor sit amet " * 3000).trim // ~80 KB
    val deepDivs = "<div>" * 1000 + s"<p>deep core text $pad</p>" + "</div>" * 1000
    val manyOpenPs = s"<p>open $pad " * 5000
    Seq(
      "unclosed-script" ->
        s"<p>before the script $pad</p><script>var a = 1; // never closed",
      "unclosed-title" -> s"<title>title never closes <p>swallowed by title $pad</p>",
      "unclosed-textarea" -> s"<p>kept paragraph $pad</p><textarea>swallowed",
      "script-with-fake-close" ->
        s"<script>var s = \"</scr\" + \"ipt>\"; x();</script><p>after the script $pad</p>",
      "nested-tables" ->
        (s"<table><tr><td>outer cell one $pad<table><tr><td>inner cell $pad" +
          s"<table><tr><td>innermost cell $pad</td></tr></table>" +
          s"</td></tr></table></td><td>outer cell two $pad</td></tr></table>"),
      "implied-table-closes" ->
        s"<table><tr><td>cell a $pad<td>cell b $pad<tr><td>cell c $pad<td>cell d $pad</table><p>after the table $pad</p>",
      "entity-edge-cases" ->
        (s"<p>double &amp;amp; nul &#0; huge &#x110000; surrogate &#xD800; " +
          s"bare &ampnothing unknown &NotARealEntity; trailing & $pad</p>"),
      "giant-attribute" ->
        s"<p>visible before $pad</p><a href='$bigAttr'>link</a><p>visible after the giant attribute $pad</p>",
      "giant-text-block" -> s"<p>$bigText</p>",
      "deep-nesting" -> deepDivs,
      "five-thousand-open-p" -> manyOpenPs,
      "mixed-case-tags" ->
        s"<DIV><P>Mixed case paragraph $pad</P><ScRiPt>drop()</sCrIpT><P>second paragraph $pad</P></DIV>",
      "newlines-and-gt-in-attrs" ->
        s"<p\n  class=\"a>b\"\n  data-x='1\n2'>attr soup paragraph $pad</p>",
      "unclosed-comment" -> s"<p>kept text $pad</p><!-- comment that never closes <p>gone</p>",
      "unclosed-cdata" -> s"<p>kept text $pad</p><![CDATA[swallowed forever",
      "unclosed-pi-and-doctype" -> s"<?php echo 'x'; <p>in pi</p><!DOCTYPEgarbage<p>tail $pad</p>",
      "null-bytes-in-text" -> s"<p>null\u0000byte laden\u0000paragraph $pad</p>",
      "multibyte-content" ->
        s"<p>emoji \ud83d\ude00 and CJK \u6f22\u5b57\u6df7\u5408 and umlauts \u00e4\u00f6\u00fc $pad</p>",
      "nested-anchors" ->
        s"<p><a href='/a'>outer <a href='/b'>inner</a> tail</a> $pad</p>",
      "stray-lt-in-text" -> s"<p>5<6 and a<b and x < y are all just text $pad</p>",
      "duplicate-roots" ->
        s"<html><body><p>first body paragraph $pad</p></body></html><html><body><p>second body paragraph $pad</p></body></html>")
  }

  test("hostile corpus: streaming == DOM and both match the frozen goldens") {
    def sha(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(b).map("%02x".format(_)).mkString
    val golden: Map[String, String] = {
      val src = scala.io.Source.fromResource("golden/hostile_html.tsv")
      try src.getLines().map { l =>
        val Array(id, h) = l.split('\t'); id -> h
      }.toMap
      finally src.close()
    }
    assert(golden.size === hostileCorpus.size)
    hostileCorpus.foreach { case (id, html) =>
      val (a, b) = both(html)
      assert(a == b, s"kernel mismatch on hostile '$id'")
      assert(sha(a.text.getBytes("UTF-8")) === golden(id),
        s"extraction drifted from golden for hostile '$id'")
    }
  }
}
