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

  /** [[build]] plus URI link annotations: page i carries `links(i)` as
    * `/Annots` Link annotations with URI actions — the PDF-outlink
    * fixture for [[Pdf.pageLinks]]. One page also gets a GoTo (internal)
    * annotation that extraction must skip.
    */
  def buildWithLinks(pages: Seq[Seq[String]], links: Seq[Seq[String]],
                     compress: Boolean): Array[Byte] = {
    require(pages.nonEmpty && pages.size == links.size)
    val n = pages.size
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def esc(u: String): String =
      u.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val firstAnnObj = 3 + 2 * n
    val annObjOf: Seq[Seq[Int]] = {
      var next = firstAnnObj
      links.map(ls => ls.map { _ => val o = next; next = o + 1; o })
    }
    val gotoObj = firstAnnObj + links.map(_.size).sum // internal annot on page 0
    val fontObj = gotoObj + 1
    val total = fontObj + 1
    val offsets = new Array[Long](total)
    w("%PDF-1.4\n%âãÏÓ\n")
    offsets(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size()
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count $n >>\nendobj\n")
    (0 until n).foreach { i =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      offsets(pageObj) = out.size()
      val annRefs = annObjOf(i).map(o => s"$o 0 R") ++
        (if (i == 0) Seq(s"$gotoObj 0 R") else Nil)
      val annots =
        if (annRefs.nonEmpty) s" /Annots [ ${annRefs.mkString(" ")} ]" else ""
      w(s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >>$annots /Contents $contObj 0 R >>\nendobj\n")
      offsets(contObj) = out.size()
      val raw = pageContent(pages(i))
      val body = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"$contObj 0 obj\n<< /Length ${body.length}$filter >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }
    (0 until n).foreach { i =>
      links(i).zip(annObjOf(i)).zipWithIndex.foreach { case ((uri, obj), k) =>
        offsets(obj) = out.size()
        w(s"$obj 0 obj\n<< /Type /Annot /Subtype /Link " +
          s"/Rect [ 50 ${700 - 20 * k} 300 ${715 - 20 * k} ] " +
          s"/A << /S /URI /URI (${esc(uri)}) >> >>\nendobj\n")
      }
    }
    offsets(gotoObj) = out.size()
    w(s"$gotoObj 0 obj\n<< /Type /Annot /Subtype /Link /Rect [ 50 50 100 60 ] " +
      s"/A << /S /GoTo /D [ 3 0 R /Fit ] >> >>\nendobj\n")
    offsets(fontObj) = out.size()
    w(s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xrefPos = out.size()
    w(s"xref\n0 $total\n")
    w("0000000000 65535 f \n")
    (1 until total).foreach { i => w(f"${offsets(i)}%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** [[build]] plus an `/Outlines` bookmark tree from a flat
    * `(depth, title)` list (depth 0 = top level, increments of at most
    * +1). Non-ASCII titles are emitted as UTF-16BE-with-BOM hex text
    * strings (§7.9.2.2), ASCII ones as literal strings — both reader
    * paths exercised.
    */
  def buildWithOutlines(pages: Seq[Seq[String]],
                        outline: Seq[(Int, String)],
                        compress: Boolean): Array[Byte] = {
    require(pages.nonEmpty)
    outline.headOption.foreach { case (d, _) => require(d == 0, "first item depth 0") }
    val n = pages.size
    val k = outline.length
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val fontObj = 3 + 2 * n
    val rootObj = fontObj + 1
    val itemObj = (0 until k).map(i => rootObj + 1 + i)
    val total = rootObj + 1 + k
    val offsets = new Array[Long](total)
    // tree relations from the flat list
    val depth = outline.map(_._1).toArray
    val parent = Array.fill(k)(-1)
    val stack = scala.collection.mutable.Stack.empty[Int]
    (0 until k).foreach { i =>
      while (stack.nonEmpty && depth(stack.top) >= depth(i)) stack.pop()
      require(stack.isEmpty && depth(i) == 0 ||
        stack.nonEmpty && depth(i) == depth(stack.top) + 1,
        s"outline depth jump at item $i")
      parent(i) = if (stack.isEmpty) -1 else stack.top
      stack.push(i)
    }
    def kidsOf(p: Int): Seq[Int] = (0 until k).filter(parent(_) == p)
    def titleStr(t: String): String =
      if (t.forall(c => c >= 0x20 && c < 0x7f))
        "(" + t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)") + ")"
      else {
        val b = Array[Byte](0xfe.toByte, 0xff.toByte) ++
          t.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
        hexStr(b)
      }
    w("%PDF-1.4\n%âãÏÓ\n")
    offsets(1) = out.size()
    w(s"1 0 obj\n<< /Type /Catalog /Pages 2 0 R /Outlines $rootObj 0 R >>\nendobj\n")
    offsets(2) = out.size()
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count $n >>\nendobj\n")
    (0 until n).foreach { i =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      offsets(pageObj) = out.size()
      w(s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents $contObj 0 R >>\nendobj\n")
      offsets(contObj) = out.size()
      val raw = pageContent(pages(i))
      val body = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"$contObj 0 obj\n<< /Length ${body.length}$filter >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }
    offsets(fontObj) = out.size()
    w(s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    offsets(rootObj) = out.size()
    val tops = kidsOf(-1)
    val rootKids =
      if (tops.isEmpty) ""
      else s" /First ${itemObj(tops.head)} 0 R /Last ${itemObj(tops.last)} 0 R"
    w(s"$rootObj 0 obj\n<< /Type /Outlines /Count $k$rootKids >>\nendobj\n")
    (0 until k).foreach { i =>
      offsets(itemObj(i)) = out.size()
      val sibs = kidsOf(parent(i))
      val at = sibs.indexOf(i)
      val prev = if (at > 0) s" /Prev ${itemObj(sibs(at - 1))} 0 R" else ""
      val next = if (at < sibs.length - 1) s" /Next ${itemObj(sibs(at + 1))} 0 R" else ""
      val ch = kidsOf(i)
      val fl =
        if (ch.isEmpty) ""
        else s" /First ${itemObj(ch.head)} 0 R /Last ${itemObj(ch.last)} 0 R"
      val par = if (parent(i) < 0) rootObj else itemObj(parent(i))
      w(s"${itemObj(i)} 0 obj\n<< /Title ${titleStr(outline(i)._2)} " +
        s"/Parent $par 0 R$prev$next$fl >>\nendobj\n")
    }
    val xrefPos = out.size()
    w(s"xref\n0 $total\n")
    w("0000000000 65535 f \n")
    (1 until total).foreach { i => w(f"${offsets(i)}%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** One embedded image for [[buildWithImages]]: `codec` ∈
    * `"g4"` (data = 0/1 pixels, width*height — encoded via
    * [[Ccitt.encodeG4]] into a /CCITTFaxDecode stream),
    * `"jpeg"` (data = a ready JFIF payload → /DCTDecode),
    * `"gray"` (data = 8-bit luminance samples → /FlateDecode).
    */
  final case class ImageSpec(name: String, width: Int, height: Int,
                             codec: String, data: Array[Byte])

  /** [[build]] plus image XObjects per page — the scanned-document
    * fixture shape: page i shows `pages(i)`'s text AND draws every
    * image in `images(i)` via `Do`. Geometry in the content stream is
    * cosmetic; extraction reads the XObject streams themselves.
    */
  def buildWithImages(pages: Seq[Seq[String]],
                      images: Seq[Seq[ImageSpec]],
                      compress: Boolean): Array[Byte] = {
    require(pages.nonEmpty && pages.size == images.size)
    val n = pages.size
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val imgCounts = images.map(_.size)
    val firstImgObj = 3 + 2 * n // images come after page+content pairs
    val imgObjOf: Seq[Seq[Int]] = {
      var next = firstImgObj
      images.map(specs => specs.map { _ => val o = next; next = o + 1; o })
    }
    val fontObj = firstImgObj + imgCounts.sum
    val total = fontObj + 1
    val offsets = new Array[Long](total)

    w("%PDF-1.4\n%âãÏÓ\n")
    offsets(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size()
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count $n >>\nendobj\n")
    (0 until n).foreach { i =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      offsets(pageObj) = out.size()
      val xobjRefs = images(i).zip(imgObjOf(i))
        .map { case (s, o) => s"/${s.name} $o 0 R" }.mkString(" ")
      val xobj = if (images(i).nonEmpty) s" /XObject << $xobjRefs >>" else ""
      w(s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >>$xobj >> /Contents $contObj 0 R >>\nendobj\n")
      offsets(contObj) = out.size()
      val draw = images(i).map(s =>
        s"q ${s.width} 0 0 ${s.height} 50 50 cm /${s.name} Do Q\n").mkString
      val raw = pageContent(pages(i)) ++ draw.getBytes(ISO_8859_1)
      val body = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"$contObj 0 obj\n<< /Length ${body.length}$filter >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }
    (0 until n).foreach { i =>
      images(i).zip(imgObjOf(i)).foreach { case (s, obj) =>
        offsets(obj) = out.size()
        val (body, entries) = s.codec match {
          case "g4" =>
            require(s.data.length == s.width * s.height, s"g4 pixels for ${s.name}")
            (Ccitt.encodeG4(s.data, s.width, s.height),
              s"/BitsPerComponent 1 /ColorSpace /DeviceGray /Filter /CCITTFaxDecode " +
                s"/DecodeParms << /K -1 /Columns ${s.width} /Rows ${s.height} >>")
          case "jpeg" =>
            (s.data,
              "/BitsPerComponent 8 /ColorSpace /DeviceGray /Filter /DCTDecode")
          case "gray" =>
            require(s.data.length == s.width * s.height, s"gray pixels for ${s.name}")
            (deflate(s.data),
              "/BitsPerComponent 8 /ColorSpace /DeviceGray /Filter /FlateDecode")
          case other => throw new IllegalArgumentException(s"unknown codec '$other'")
        }
        w(s"$obj 0 obj\n<< /Type /XObject /Subtype /Image /Width ${s.width} " +
          s"/Height ${s.height} $entries /Length ${body.length} >>\nstream\n")
        out.write(body)
        w("\nendstream\nendobj\n")
      }
    }
    offsets(fontObj) = out.size()
    w(s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xrefPos = out.size()
    w(s"xref\n0 $total\n")
    w("0000000000 65535 f \n")
    (1 until total).foreach { i => w(f"${offsets(i)}%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  private def hexStr(b: Array[Byte]): String =
    "<" + b.map(x => f"${x & 0xff}%02X").mkString + ">"

  // ---------------------------------------- filter encoders (fixtures)
  /** PDF LZW encoder (TIFF variant, EarlyChange=1) — width schedule
    * mirrors the DECODER's table size (one behind the encoder's `next`),
    * Clear emitted at table saturation.
    */
  def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 64)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    var table = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    var next = 258
    emit(256) // Clear
    if (data.nonEmpty) {
      var w = Vector(data(0))
      var i = 1
      def codeOf(s: Seq[Byte]): Int =
        if (s.length == 1) s.head & 0xff else table(s)
      def postEmit(): Unit = {
        // decoder's table is one entry behind the encoder's `next`
        if ((next - 1) + 1 >= (1 << width) && width < 12) width += 1
      }
      while (i < data.length) {
        val c = data(i)
        val wc = w :+ c
        if (wc.length > 1 && (table.contains(wc))) w = wc
        else if (wc.length == 1) w = wc
        else {
          emit(codeOf(w))
          table(wc) = next
          next += 1
          postEmit()
          if (next == 4095) { // reset before the table pins at 4096
            emit(256)
            table = scala.collection.mutable.HashMap.empty
            next = 258
            width = 9
          }
          w = Vector(c)
        }
        i += 1
      }
      emit(codeOf(w))
      next += 1 // the decoder adds an entry for this code too
      postEmit()
    }
    emit(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  def rleEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + data.length / 128 + 8)
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(257 - run); out.write(data(i))
        i += run
      } else {
        var lit = 1
        while (i + lit < data.length && lit < 128 &&
          (i + lit + 1 >= data.length || data(i + lit) != data(i + lit + 1))) lit += 1
        out.write(lit - 1)
        out.write(data, i, lit)
        i += lit
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }

  def ahxEncode(data: Array[Byte]): Array[Byte] =
    (data.map(b => f"${b & 0xff}%02X").mkString + ">").getBytes(ISO_8859_1)

  def a85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(data.length * 5 / 4 + 8)
    var i = 0
    while (i + 4 <= data.length) {
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (data(i + k) & 0xff); k += 1 }
      val g = new Array[Char](5)
      var j = 4
      while (j >= 0) { g(j) = ('!' + (v % 85)).toChar; v /= 85; j -= 1 }
      sb.appendAll(g)
      i += 4
    }
    val rem = data.length - i
    if (rem > 0) {
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (if (k < rem) data(i + k) & 0xff else 0); k += 1 }
      val g = new Array[Char](5)
      var j = 4
      while (j >= 0) { g(j) = ('!' + (v % 85)).toChar; v /= 85; j -= 1 }
      sb.appendAll(g.take(rem + 1))
    }
    sb.append("~>")
    sb.toString.getBytes(ISO_8859_1)
  }

  private def encodeFilter(name: String, data: Array[Byte]): Array[Byte] = name match {
    case "FlateDecode"     => deflate(data)
    case "LZWDecode"       => lzwEncode(data)
    case "RunLengthDecode" => rleEncode(data)
    case "ASCIIHexDecode"  => ahxEncode(data)
    case "ASCII85Decode"   => a85Encode(data)
    case other             => throw new IllegalArgumentException(s"no encoder for $other")
  }

  /** Classic build whose content streams ride the given `/Filter` chain
    * (decode order, per spec; encoding applies the chain reversed) —
    * the fixture domain for the non-Flate filters old crawl PDFs use.
    */
  def buildWithFilters(pages: Seq[Seq[String]], filters: Seq[String],
                       mediaBox: (Double, Double) = (612.0, 792.0)): Array[Byte] = {
    require(pages.nonEmpty && filters.nonEmpty)
    val n = pages.size
    val contents = pages.map(pageContent)
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def fmtNum(d: Double): String =
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    val offsets = new Array[Long](n * 2 + 4)
    val filterEntry =
      if (filters.size == 1) s" /Filter /${filters.head}"
      else s" /Filter [ ${filters.map("/" + _).mkString(" ")} ]"
    w("%PDF-1.4\n%âãÏÓ\n")
    offsets(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size()
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count $n >>\nendobj\n")
    val fontObj = 3 + 2 * n
    (0 until n).foreach { i =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      val (mw, mh) = mediaBox
      offsets(pageObj) = out.size()
      w(s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 ${fmtNum(mw)} ${fmtNum(mh)} ] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents $contObj 0 R >>\nendobj\n")
      offsets(contObj) = out.size()
      val body = filters.reverse.foldLeft(contents(i))((acc, f) => encodeFilter(f, acc))
      w(s"$contObj 0 obj\n<< /Length ${body.length}$filterEntry >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }
    offsets(fontObj) = out.size()
    w(s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xrefPos = out.size()
    val total = fontObj + 1
    w(s"xref\n0 $total\n")
    w("0000000000 65535 f \n")
    (1 until total).foreach { i => w(f"${offsets(i)}%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** Encrypted build (standard security handler): same page/text
    * semantics as [[build]], classic xref layout, but every content
    * stream and the /Info title string are encrypted under per-object
    * keys, with `/Encrypt` + `/ID` in the trailer. `aes = false` writes
    * V2 R3 RC4-128; `aes = true` writes V4 R4 `/CFM /AESV2`
    * (AES-128-CBC, deterministic per-object IV so fixture bytes are
    * reproducible). A non-empty `userPw` produces a genuinely
    * password-protected file — the parser must REFUSE it, which the
    * spec pins.
    */
  def buildEncrypted(pages: Seq[Seq[String]], compress: Boolean,
                     aes: Boolean = false, userPw: String = "",
                     ownerPw: String = "owner",
                     mediaBox: (Double, Double) = (612.0, 792.0),
                     r6: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "pdf needs at least one page")
    val contents = pages.map(pageContent)
    val boxes = Seq.fill(pages.size)(mediaBox)
    val n = contents.size
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def fmtNum(d: Double): String =
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString

    val fontObj = 3 + 2 * n
    val infoObj = fontObj + 1
    val encObj = fontObj + 2
    val total = encObj + 1
    val offsets = new Array[Long](total)

    // deterministic key material
    val r = if (r6) 6 else if (aes) 4 else 3
    val perm = -3904
    val id0 = PdfCrypt.md5(s"graft-fixture-$n-$aes-$r6".getBytes(ISO_8859_1))
    val pwU = userPw.getBytes(ISO_8859_1)
    val pwO = ownerPw.getBytes(ISO_8859_1)
    // R6 (AES-256): a random-stand-in 32-byte file key wrapped in /UE
    // and /OE per §7.6.4; pre-R6: Algorithm 2/3 derivation
    val (enc, uEntry, oEntry, ueEntry, oeEntry, permsEntry) =
      if (r6) {
        val fileKey = PdfCrypt.sha256(s"graft-r6-filekey-$n".getBytes(ISO_8859_1))
        val vSaltU = PdfCrypt.md5(s"vsu$n".getBytes(ISO_8859_1)).take(8)
        val kSaltU = PdfCrypt.md5(s"ksu$n".getBytes(ISO_8859_1)).take(8)
        val (u, ue) = PdfCrypt.userEntryV5(6, pwU, vSaltU, kSaltU, fileKey)
        val vSaltO = PdfCrypt.md5(s"vso$n".getBytes(ISO_8859_1)).take(8)
        val kSaltO = PdfCrypt.md5(s"kso$n".getBytes(ISO_8859_1)).take(8)
        val o = PdfCrypt.hash2B(pwO, vSaltO, u) ++ vSaltO ++ kSaltO
        val oe = PdfCrypt.aesCbcNoPad(PdfCrypt.hash2B(pwO, kSaltO, u),
          new Array[Byte](16), fileKey, encrypt = true)
        val pm = PdfCrypt.permsV5(fileKey, perm, encryptMetadata = true)
        (PdfCrypt.Encryption(fileKey, aes = true, encObj, v5 = true),
          u, o, ue, oe, pm)
      } else {
        val o = PdfCrypt.ownerEntry(pwO, pwU, r, 128)
        val key = PdfCrypt.fileKey(pwU, o, perm, id0, r, 128)
        (PdfCrypt.Encryption(key, aes, encObj),
          PdfCrypt.userEntry(key, id0, r), o,
          Array.empty[Byte], Array.empty[Byte], Array.empty[Byte])
      }

    w("%PDF-1.4\n%âãÏÓ\n")
    offsets(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size()
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count $n >>\nendobj\n")
    (0 until n).foreach { i =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      val (mw, mh) = boxes(i)
      offsets(pageObj) = out.size()
      w(s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 ${fmtNum(mw)} ${fmtNum(mh)} ] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents $contObj 0 R >>\nendobj\n")
      offsets(contObj) = out.size()
      val filtered = if (compress) deflate(contents(i)) else contents(i)
      val body = PdfCrypt.encryptBytes(enc, contObj, 0, filtered)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"$contObj 0 obj\n<< /Length ${body.length}$filter >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }
    offsets(fontObj) = out.size()
    w(s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    // Info dict: an encrypted STRING outside any stream
    offsets(infoObj) = out.size()
    val title = PdfCrypt.encryptBytes(enc, infoObj, 0,
      s"Fixture Title $n".getBytes(ISO_8859_1))
    w(s"$infoObj 0 obj\n<< /Title ${hexStr(title)} >>\nendobj\n")
    // Encrypt dict: its own strings are NOT encrypted (§7.6.2)
    offsets(encObj) = out.size()
    if (r6)
      w(s"$encObj 0 obj\n<< /Filter /Standard /V 5 /R 6 /Length 256 " +
        s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
        s"/P $perm /O ${hexStr(oEntry)} /U ${hexStr(uEntry)} " +
        s"/OE ${hexStr(oeEntry)} /UE ${hexStr(ueEntry)} " +
        s"/Perms ${hexStr(permsEntry)} >>\nendobj\n")
    else {
      val cf =
        if (aes) " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
        else ""
      val v = if (aes) 4 else 2
      w(s"$encObj 0 obj\n<< /Filter /Standard /V $v /R $r /Length 128 " +
        s"/P $perm /O ${hexStr(oEntry)} /U ${hexStr(uEntry)}$cf >>\nendobj\n")
    }
    val xrefPos = out.size()
    w(s"xref\n0 $total\n")
    w("0000000000 65535 f \n")
    (1 until total).foreach { i => w(f"${offsets(i)}%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R /Info $infoObj 0 R " +
      s"/Encrypt $encObj 0 R /ID [ ${hexStr(id0)} ${hexStr(id0)} ] >>\n" +
      s"startxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** Serialize a ToUnicode map as an Adobe CMap (§9.10.3): sorted
    * bfchar blocks of ≤100 entries, 4-hex-digit codes for 2-byte fonts.
    */
  def cmapBytes(twoByte: Boolean, m: Map[Int, String]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    sb.append("1 begincodespacerange\n")
    sb.append(if (twoByte) "<0000> <FFFF>\n" else "<00> <FF>\n")
    sb.append("endcodespacerange\n")
    m.toSeq.sortBy(_._1).grouped(100).foreach { grp =>
      sb.append(s"${grp.size} beginbfchar\n")
      grp.foreach { case (code, str) =>
        val dst = str.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
          .map(b => f"${b & 0xff}%02X").mkString
        // hex width follows the CODE, not just the font type: a 1-byte
        // font may still map codes > 0xFF (arbitrary-width bfchar src),
        // and an odd-length hex string would parse back as a DIFFERENT
        // code after the lexer pads the trailing nibble
        val w =
          if (code > 0xffff) 6 else if (twoByte || code > 0xff) 4 else 2
        sb.append(s"<${("%0" + w + "X").format(code)}> <$dst>\n")
      }
      sb.append("endbfchar\n")
    }
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
    sb.toString.getBytes(ISO_8859_1)
  }

  /** [[buildRaw]] with per-page font resources: each distinct
    * [[Pdf.FontInfo]] becomes a font object (Type0 for 2-byte fonts)
    * with its /ToUnicode CMap stream, and page dicts reference the SAME
    * names the content streams use — the chunker's re-serialization path
    * for font-mapped documents, keeping every chunk a self-contained
    * extraction unit.
    */
  def buildRawFonts(contents: Seq[Array[Byte]], compress: Boolean,
                    boxes: Seq[(Double, Double)],
                    pageFonts: Seq[Map[String, Pdf.FontInfo]]): Array[Byte] = {
    val n = contents.size
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def fmtNum(d: Double): String =
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString

    val helv = 3 + 2 * n
    // distinct FontInfos in first-appearance order → (fontObj, cmapObj)
    val distinct = scala.collection.mutable.LinkedHashMap.empty[Pdf.FontInfo, (Int, Int)]
    pageFonts.foreach(_.values.foreach { fi =>
      if (!distinct.contains(fi)) {
        val base = helv + 1 + 2 * distinct.size
        distinct(fi) = (base, base + 1)
      }
    })
    val total = helv + 1 + 2 * distinct.size
    val offsets = new Array[Long](total)

    w("%PDF-1.4\n%âãÏÓ\n")
    offsets(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size()
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count $n >>\nendobj\n")
    (0 until n).foreach { i =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      val (mw, mh) = boxes(i)
      val fonts = pageFonts(i)
      val entries = fonts.toSeq.sortBy(_._1)
        .map { case (name, fi) => s"/$name ${distinct(fi)._1} 0 R" } ++
        (if (fonts.contains("F1")) Nil else Seq(s"/F1 $helv 0 R"))
      offsets(pageObj) = out.size()
      w(s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 ${fmtNum(mw)} ${fmtNum(mh)} ] " +
        s"/Resources << /Font << ${entries.mkString(" ")} >> >> /Contents $contObj 0 R >>\nendobj\n")
      offsets(contObj) = out.size()
      val raw = contents(i)
      val body = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"$contObj 0 obj\n<< /Length ${body.length}$filter >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }
    offsets(helv) = out.size()
    w(s"$helv 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    distinct.foreach { case (fi, (fontObj, cmapObj)) =>
      val subtype = if (fi.twoByte) "Type0" else "Type1"
      val tu = fi.toUnicode.map(_ => s" /ToUnicode $cmapObj 0 R").getOrElse("")
      offsets(fontObj) = out.size()
      w(s"$fontObj 0 obj\n<< /Type /Font /Subtype /$subtype /BaseFont /Graft$tu >>\nendobj\n")
      fi.toUnicode.foreach { m =>
        val body = cmapBytes(fi.twoByte, m)
        offsets(cmapObj) = out.size()
        w(s"$cmapObj 0 obj\n<< /Length ${body.length} >>\nstream\n")
        out.write(body)
        w("\nendstream\nendobj\n")
      }
    }
    val xrefPos = out.size()
    w(s"xref\n0 $total\n")
    w("0000000000 65535 f \n")
    (1 until total).foreach { i => w(f"${offsets(i)}%010d 00000 n \n") }
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** Type0/CID fixture: text shown as TWO-BYTE codes through a
    * generated /ToUnicode CMap (codes assigned per distinct char, offset
    * 0x0100 so no code equals its Unicode value) — the embedded-subset
    * shape real crawl PDFs have, where Tj bytes are meaningless without
    * the CMap.
    */
  def buildType0(pages: Seq[Seq[String]], compress: Boolean,
                 mediaBox: (Double, Double) = (612.0, 792.0)): Array[Byte] = {
    require(pages.nonEmpty, "pdf needs at least one page")
    val chars = pages.flatten.flatten.distinct.sorted
    val enc: Map[Char, Int] = chars.zipWithIndex.map { case (c, i) => c -> (0x0100 + i) }.toMap
    val toUni: Map[Int, String] = enc.map { case (c, code) => code -> c.toString }
    val fi = Pdf.FontInfo(twoByte = true, toUnicode = Some(toUni))
    def hexShow(s: String): String =
      "<" + s.map(c => f"${enc(c)}%04X").mkString + ">"
    val contents = pages.map { lines =>
      val sb = new StringBuilder
      sb.append("BT\n/F1 12 Tf\n72 720 Td\n")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) sb.append("0 -14 Td\n")
        sb.append(hexShow(l)).append(" Tj\n")
      }
      sb.append("ET")
      sb.toString.getBytes(ISO_8859_1)
    }
    buildRawFonts(contents, compress, Seq.fill(pages.size)(mediaBox),
      Seq.fill(pages.size)(Map("F1" -> fi)))
  }

  /** PDF 1.5-style build: same page/text semantics as [[build]], but the
    * modern file layout — document dictionaries (catalog, page tree,
    * pages, font) packed into a compressed object stream (`/ObjStm`) and
    * the cross-reference emitted as a `/Type /XRef` stream (`/W [1 4 2]`)
    * behind FlateDecode + PNG Up predictor (`/Predictor 12`), with no
    * `trailer` keyword. This is the shape virtually every post-2005
    * real-crawl PDF has, and it keeps the parser's 1.5 path inside the
    * co-designed fixture domain.
    */
  def build15(pages: Seq[Seq[String]], compress: Boolean,
              mediaBox: (Double, Double) = (612.0, 792.0)): Array[Byte] = {
    require(pages.nonEmpty, "pdf needs at least one page")
    buildRaw15(pages.map(pageContent), compress, Seq.fill(pages.size)(mediaBox))
  }

  /** 1.5 layout from already-rendered content streams. */
  def buildRaw15(contents: Seq[Array[Byte]], compress: Boolean,
                 boxes: Seq[(Double, Double)]): Array[Byte] = {
    val n = contents.size
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def fmtNum(d: Double): String =
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    // numbering: 1..n content streams (streams may not live in an
    // ObjStm), n+1 the ObjStm, n+2 catalog, n+3 pages, n+4..2n+3 page
    // dicts, 2n+4 font (all compressed), 2n+5 the xref stream
    val objStm = n + 1; val catalog = n + 2; val pagesObj = n + 3
    def pageObj(i: Int) = n + 4 + i
    val fontObj = 2 * n + 4; val xrefObj = 2 * n + 5
    val offsets = new Array[Long](xrefObj + 1)

    w("%PDF-1.5\n%âãÏÓ\n")
    (0 until n).foreach { i =>
      offsets(i + 1) = out.size()
      val raw = contents(i)
      val body = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"${i + 1} 0 obj\n<< /Length ${body.length}$filter >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }
    // the compressed object stream: header = N (objnum, offset) pairs,
    // offsets relative to /First
    val inner: Seq[(Int, String)] = Seq(
      catalog -> s"<< /Type /Catalog /Pages $pagesObj 0 R >>",
      pagesObj -> (s"<< /Type /Pages /Kids [ " +
        (0 until n).map(i => s"${pageObj(i)} 0 R").mkString(" ") +
        s" ] /Count $n >>")) ++
      (0 until n).map { i =>
        val (mw, mh) = boxes(i)
        pageObj(i) -> (s"<< /Type /Page /Parent $pagesObj 0 R " +
          s"/MediaBox [ 0 0 ${fmtNum(mw)} ${fmtNum(mh)} ] " +
          s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents ${i + 1} 0 R >>")
      } :+ (fontObj -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val bodySb = new StringBuilder
    val innerOffs = inner.map { case (_, src) =>
      val o = bodySb.length; bodySb.append(src).append('\n'); o
    }
    val hdr = inner.zip(innerOffs)
      .map { case ((num, _), o) => s"$num $o" }.mkString(" ") + "\n"
    val stmBody = deflate((hdr + bodySb).getBytes(ISO_8859_1))
    offsets(objStm) = out.size()
    w(s"$objStm 0 obj\n<< /Type /ObjStm /N ${inner.size} /First ${hdr.length} " +
      s"/Filter /FlateDecode /Length ${stmBody.length} >>\nstream\n")
    out.write(stmBody)
    w("\nendstream\nendobj\n")
    // xref stream: W [1 4 2] rows for objects 0..xrefObj, Up-predicted
    offsets(xrefObj) = out.size()
    val rowLen = 7
    val rows = new Array[Byte]((xrefObj + 1) * rowLen)
    def setRow(i: Int, typ: Int, f2: Long, f3: Int): Unit = {
      val p = i * rowLen
      rows(p) = typ.toByte
      rows(p + 1) = ((f2 >> 24) & 0xff).toByte
      rows(p + 2) = ((f2 >> 16) & 0xff).toByte
      rows(p + 3) = ((f2 >> 8) & 0xff).toByte
      rows(p + 4) = (f2 & 0xff).toByte
      rows(p + 5) = ((f3 >> 8) & 0xff).toByte
      rows(p + 6) = (f3 & 0xff).toByte
    }
    setRow(0, 0, 0, 65535)
    (1 to objStm).foreach(i => setRow(i, 1, offsets(i), 0))
    inner.zipWithIndex.foreach { case ((num, _), k) => setRow(num, 2, objStm, k) }
    setRow(xrefObj, 1, offsets(xrefObj), 0)
    // Predictor 12: every row Up-filtered (type byte 2, delta vs row above)
    val pred = new Array[Byte]((xrefObj + 1) * (rowLen + 1))
    (0 to xrefObj).foreach { r =>
      pred(r * (rowLen + 1)) = 2
      (0 until rowLen).foreach { c =>
        val above = if (r > 0) rows((r - 1) * rowLen + c) else 0: Byte
        pred(r * (rowLen + 1) + 1 + c) = (rows(r * rowLen + c) - above).toByte
      }
    }
    val xBody = deflate(pred)
    w(s"$xrefObj 0 obj\n<< /Type /XRef /Size ${xrefObj + 1} /Root $catalog 0 R " +
      s"/W [ 1 4 2 ] /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $rowLen >> " +
      s"/Length ${xBody.length} >>\nstream\n")
    out.write(xBody)
    w(s"\nendstream\nendobj\nstartxref\n${offsets(xrefObj)}\n%%EOF\n")
    out.toByteArray
  }
}
