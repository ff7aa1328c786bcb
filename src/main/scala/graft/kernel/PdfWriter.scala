package graft.kernel

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater

/** Minimal, fully deterministic PDF writer.
  *
  * Produces the co-designed input domain for the hand-built parser in
  * [[Pdf]]: classic xref-table PDFs with one content stream per page,
  * Helvetica Type1 font, `BT/Tf/Td/Tj/ET` text operators, optional
  * FlateDecode streams. Used (a) by the fixture generator for the ~10 %
  * binary payload rows of the page table (the reference's PDF ingestion
  * path, `/root/reference/app/api/routes.py:25-26`), and (b) by the
  * chunker in [[Pdf.chunkBytes]] to re-serialize ≤10-page sub-PDFs
  * (mirroring `/root/reference/app/services/pdf_splitter.py:46-129`).
  */
object PdfWriter {

  /** Escape a PDF literal string. */
  def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '('  => sb.append("\\(")
      case ')'  => sb.append("\\)")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c    => sb.append(c)
    }
    sb.toString
  }

  /** Content stream for one page: one Td+Tj per line, top-down. */
  def pageContent(lines: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("BT\n/F1 12 Tf\n72 720 Td\n")
    lines.zipWithIndex.foreach { case (l, i) =>
      if (i > 0) sb.append("0 -14 Td\n")
      sb.append('(').append(esc(l)).append(") Tj\n")
    }
    sb.append("ET")
    sb.toString.getBytes(ISO_8859_1)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Build a PDF whose page i shows `pages(i)` as lines of text.
    * @param mediaBox (width, height) per page, defaults to US-Letter.
    */
  def build(pages: Seq[Seq[String]], compress: Boolean,
            mediaBox: (Double, Double) = (612.0, 792.0)): Array[Byte] = {
    require(pages.nonEmpty, "pdf needs at least one page")
    buildRaw(pages.map(pageContent), compress, Seq.fill(pages.size)(mediaBox))
  }

  /** Build from already-rendered content streams (used by the chunker). */
  def buildRaw(contents: Seq[Array[Byte]], compress: Boolean,
               boxes: Seq[(Double, Double)]): Array[Byte] = {
    val n = contents.size
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = new Array[Long](n * 2 + 4) // 1-indexed object offsets

    def fmtNum(d: Double): String =
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString

    w("%PDF-1.4\n%âãÏÓ\n")
    // obj 1: Catalog
    offsets(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    // obj 2: Pages
    offsets(2) = out.size()
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count $n >>\nendobj\n")
    val fontObj = 3 + 2 * n
    // page + content objects
    (0 until n).foreach { i =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      val (mw, mh) = boxes(i)
      offsets(pageObj) = out.size()
      w(s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 ${fmtNum(mw)} ${fmtNum(mh)} ] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents $contObj 0 R >>\nendobj\n")
      offsets(contObj) = out.size()
      val raw = contents(i)
      val body = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"$contObj 0 obj\n<< /Length ${body.length}$filter >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }
    // font object
    offsets(fontObj) = out.size()
    w(s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    // xref
    val xrefPos = out.size()
    val total = fontObj + 1
    w(s"xref\n0 $total\n")
    w("0000000000 65535 f \n")
    (1 until total).foreach { i => w(f"${offsets(i)}%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }
}
