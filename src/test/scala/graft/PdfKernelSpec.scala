package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.{Pdf, PdfWriter}
import java.nio.charset.StandardCharsets.ISO_8859_1

class PdfKernelSpec extends AnyFunSuite {

  private def pdf(pages: Seq[Seq[String]], compress: Boolean = false) =
    PdfWriter.build(pages, compress)

  test("writer → parser roundtrip, uncompressed") {
    val bytes = pdf(Seq(Seq("hello world", "line two"), Seq("page two")))
    assert(new String(bytes.take(5), ISO_8859_1) === "%PDF-")
    val doc = Pdf.parseDoc(bytes)
    val ps = Pdf.pages(doc)
    assert(ps.length === 2)
    assert(ps.head.width === 612.0 && ps.head.height === 792.0)
    assert(Pdf.pageText(ps(0).content) === "hello world\nline two\n")
    assert(Pdf.pageText(ps(1).content) === "page two\n")
  }

  test("writer → parser roundtrip, FlateDecode") {
    val bytes = pdf(Seq(Seq("compressed content here", "with two lines")), compress = true)
    val ps = Pdf.pages(Pdf.parseDoc(bytes))
    assert(Pdf.pageText(ps.head.content) === "compressed content here\nwith two lines\n")
  }

  test("string escapes and special chars survive") {
    val line = "parens (nested (deep)) and \\ backslash"
    val ps = Pdf.pages(Pdf.parseDoc(pdf(Seq(Seq(line)))))
    assert(Pdf.pageText(ps.head.content) === line + "\n")
  }

  test("content-stream operators: TJ array, quote, hex strings") {
    val content = ("BT /F1 12 Tf 72 720 Td [(Hel) -120 (lo)] TJ 0 -14 Td (next) Tj " +
      "(third)' <776F726C64> Tj ET").getBytes(ISO_8859_1)
    assert(Pdf.pageText(content) === "Hello\nnext\nthirdworld\n")
  }

  test("chunker: 25 pages → chunks of 10/10/5 with exact boundary math") {
    val pages = (1 to 25).map(i => Seq(s"page $i body"))
    val chunks = Pdf.chunkBytes(pdf(pages, compress = true))
    assert(chunks.length === 3)
    val counts = chunks.map(c => Pdf.pages(Pdf.parseDoc(c)).length)
    assert(counts === Vector(10, 10, 5))
  }

  test("fuzz: random documents roundtrip + chunk-associativity (400 seeded samples)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val lineGen = Gen.chooseNum(0, 40).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(
        Gen.alphaNumStr.map(_.take(30)),
        Gen.oneOf("paren ( close )", "back \\ slash", "tabs\tand\rctrl",
          "octal  bell", "ümlaut ß ç", "", "  spaces  "))).map(_.map(identity)))
    val docGen = for {
      nPages <- Gen.chooseNum(1, 23)
      pages <- Gen.listOfN(nPages, lineGen)
      compress <- Gen.oneOf(true, false)
    } yield (pages.map(_.toSeq), compress)
    var seed = Seed(11L)
    (1 to 400).foreach { k =>
      val ((pages, compress), _) = (docGen.pureApply(Gen.Parameters.default, seed), ())
      seed = seed.next
      val bytes = PdfWriter.build(pages.map(p => if (p.isEmpty) Seq("") else p), compress)
      val whole = Pdf.extractChunk(bytes)
      assert(whole.pages.size === pages.size, s"sample #$k page count")
      // chunk associativity: concat of chunk texts == whole-doc text
      val viaChunks = Pdf.chunkBytes(bytes).map(Pdf.extractChunk)
      assert(viaChunks.map(_.text).mkString === whole.text, s"sample #$k assoc")
      assert(Pdf.extractDocChunks(bytes) === viaChunks, s"sample #$k direct==bytes")
    }
  }

  test("extractDocChunks == chunkBytes.map(extractChunk) over fixture PDFs") {
    graft.fixtures.PageGen.pages(200, seed = 5L)
      .filter(p => new String(p.html.take(5)) == "%PDF-")
      .foreach { p =>
        val direct = Pdf.extractDocChunks(p.html)
        val viaBytes = Pdf.chunkBytes(p.html).map(Pdf.extractChunk)
        assert(direct === viaBytes, p.url)
      }
  }

  test("chunk concat == whole-document extraction (associativity contract)") {
    val pages = (1 to 23).map(i => Seq(s"alpha $i", s"beta $i"))
    val whole = pdf(pages, compress = true)
    val viaChunks = Pdf.chunkBytes(whole).map(c => Pdf.extractChunk(c).text).mkString
    val direct = Pdf.pages(Pdf.parseDoc(whole)).map(p => Pdf.pageText(p.content)).mkString
    assert(viaChunks === direct)
  }

  test("chunker is deterministic: identical payloads → identical chunk bytes") {
    val pages = (1 to 12).map(i => Seq(s"dup page $i"))
    val a = Pdf.chunkBytes(pdf(pages, compress = true))
    val b = Pdf.chunkBytes(pdf(pages, compress = true))
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("extractChunk: page_number restarts at 1, confidence 1.0 at 4dp, mediabox dims") {
    val r = Pdf.extractChunk(pdf(Seq(Seq("a"), Seq("b"))))
    assert(r.pages.map(_.page_number) === Vector(1, 2))
    assert(r.pages.forall(p => p.confidence === 1.0))
    assert(r.pages.forall(p => p.width === 612.0 && p.height === 792.0))
    assert(r.text === "a\nb\n")
  }

  test("custom mediabox propagates") {
    val bytes = PdfWriter.build(Seq(Seq("wide")), compress = false, mediaBox = (1024.0, 512.0))
    val p = Pdf.pages(Pdf.parseDoc(bytes)).head
    assert(p.width === 1024.0 && p.height === 512.0)
  }

  test("non-PDF bytes raise ParseError") {
    intercept[Pdf.ParseError](Pdf.parseDoc("<html>not a pdf</html>".getBytes(ISO_8859_1)))
  }
}
