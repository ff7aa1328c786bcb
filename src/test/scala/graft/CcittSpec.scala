package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Ccitt

/** CCITT G4 differential suite: the JDK's own TIFF T.6 codec
  * (javax.imageio) validates our tables and mode coding in BOTH
  * directions — not mere self-consistency.
  */
class CcittSpec extends AnyFunSuite {

  // ------------------------------------------------ minimal TIFF plumbing
  /** Wrap one G4 strip in a little-endian TIFF (photometric 0:
    * 0 = white, matching the codec's coding space).
    */
  private def tiffWrap(g4: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    bo.write('I'); bo.write('I'); le16(42); le32(8) // header, IFD at 8
    val nTags = 8
    val stripOff = 8 + 2 + nTags * 12 + 4
    le16(nTags)
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
      le16(id); le16(typ); le32(count); le32(value)
    }
    tag(256, 3, 1, w)          // ImageWidth
    tag(257, 3, 1, h)          // ImageLength
    tag(258, 3, 1, 1)          // BitsPerSample
    tag(259, 3, 1, 4)          // Compression = T.6
    tag(262, 3, 1, 0)          // Photometric = WhiteIsZero
    tag(273, 4, 1, stripOff)   // StripOffsets
    tag(278, 3, 1, h)          // RowsPerStrip
    tag(279, 4, 1, g4.length)  // StripByteCounts
    le32(0)                    // next IFD
    bo.write(g4)
    bo.toByteArray
  }

  /** Extract (width, height, photometric, strip bytes) from a
    * single-strip T.6 TIFF the JDK wrote.
    */
  private def tiffUnwrap(tiff: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val le = tiff(0) == 'I'
    def u16(p: Int): Int =
      if (le) (tiff(p) & 0xff) | ((tiff(p + 1) & 0xff) << 8)
      else ((tiff(p) & 0xff) << 8) | (tiff(p + 1) & 0xff)
    def u32(p: Int): Int =
      if (le) u16(p) | (u16(p + 2) << 16) else (u16(p) << 16) | u16(p + 2)
    val ifd = u32(4)
    val n = u16(ifd)
    var w = 0; var h = 0; var photo = 0; var off = -1; var len = -1; var comp = 0
    (0 until n).foreach { i =>
      val p = ifd + 2 + i * 12
      val id = u16(p)
      val typ = u16(p + 2)
      val value = if (typ == 3) u16(p + 8) else u32(p + 8)
      id match {
        case 256 => w = value
        case 257 => h = value
        case 259 => comp = value
        case 262 => photo = value
        case 273 => off = value
        case 279 => len = value
        case _ =>
      }
    }
    assert(comp === 4, s"expected T.6 compression, got $comp")
    assert(off >= 0 && len > 0)
    (w, h, photo, java.util.Arrays.copyOfRange(tiff, off, off + len))
  }

  private def jdkWriteT6(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (px(y * w + x) == 0) 0xFFFFFF else 0x000000)
        x += 1
      }
      y += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("CCITT T.6")
    val bo = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bo)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bo.toByteArray
  }

  private def jdkReadPixels(tiff: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tiff))
    assert(img != null, "JDK could not read the TIFF")
    assert(img.getWidth === w && img.getHeight === h)
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) = if ((img.getRGB(x, y) & 0xffffff) == 0) 1 else 0
        x += 1
      }
      y += 1
    }
    out
  }

  private def bitmap(w: Int, h: Int, f: (Int, Int) => Boolean): Array[Byte] = {
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) { var x = 0; while (x < w) {
      px(y * w + x) = if (f(x, y)) 1 else 0; x += 1 }; y += 1 }
    px
  }

  test("self round-trip across shapes, odd widths, long runs") {
    val rnd = new scala.util.Random(5)
    val cases = Seq[(Int, Int, (Int, Int) => Boolean)](
      (64, 16, (x, y) => (x / (y + 1)) % 2 == 0),
      (61, 9, (x, y) => rnd.nextBoolean()),
      (1, 40, (_, y) => y % 3 == 0),
      (333, 5, (x, _) => x % 2 == 0), // worst case: alternating columns
      (100, 7, (_, _) => false), // all white
      (100, 7, (_, _) => true), // all black
      (3000, 3, (x, y) => x >= 2700 + y), // runs > 2624
      (257, 11, (x, y) => (x * x + y * 7) % 23 < 11))
    cases.foreach { case (w, h, f) =>
      val px = bitmap(w, h, f)
      val enc = Ccitt.encodeG4(px, w, h)
      val dec = Ccitt.decodeG4(enc, w, h)
      assert(dec.toSeq === px.toSeq, s"self round-trip ${w}x$h")
    }
  }

  test("JDK decodes our G4 bytes (every mode, noisy and structured bitmaps)") {
    val rnd = new scala.util.Random(17)
    val cases = Seq[(Int, Int, (Int, Int) => Boolean)](
      (128, 24, (x, y) => ((x / 3) + (y / 2)) % 2 == 0),
      (97, 13, (_, _) => rnd.nextInt(4) == 0),
      (64, 64, (x, y) => math.hypot(x - 32, y - 32) < 20),
      (200, 10, (x, _) => x % 64 < 32))
    cases.foreach { case (w, h, f) =>
      val px = bitmap(w, h, f)
      val tiff = tiffWrap(Ccitt.encodeG4(px, w, h), w, h)
      assert(jdkReadPixels(tiff, w, h).toSeq === px.toSeq,
        s"JDK disagreed on our ${w}x$h stream")
    }
  }

  test("we decode the JDK's G4 bytes") {
    val rnd = new scala.util.Random(23)
    val cases = Seq[(Int, Int, (Int, Int) => Boolean)](
      (80, 30, (x, y) => (x ^ y) % 5 == 0),
      (55, 17, (_, _) => rnd.nextInt(3) == 0),
      (256, 8, (x, y) => x % (16 + y) < 7))
    cases.foreach { case (w, h, f) =>
      val px = bitmap(w, h, f)
      val (tw, th, photo, strip) = tiffUnwrap(jdkWriteT6(px, w, h))
      assert((tw, th) === ((w, h)))
      val dec = Ccitt.decodeG4(strip, w, h)
      // coding space: 0 = "white runs"; photometric says which visual
      // color that is. Our px uses 1 = black visually.
      val visual =
        if (photo == 0) dec // WhiteIsZero: coding 0 == white == our 0
        else dec.map(b => (1 - b).toByte)
      assert(visual.toSeq === px.toSeq, s"we disagreed on JDK's ${w}x$h stream")
    }
  }

  test("run-length table sweep: every terminating code and make-up boundary vs the JDK") {
    // single row [L white, then black to end]: exercises white code L and
    // a black run; sweep hits every terminating code and the make-up
    // boundaries in both tables
    val lengths = (0 to 70) ++ Seq(127, 128, 129, 191, 192, 320, 1663, 1664,
      1665, 1727, 1728, 1729, 1791, 1792, 2559, 2560, 2561, 2623, 2624, 3000)
    lengths.foreach { l =>
      val w = l + 1800
      val px = bitmap(w, 1, (x, _) => x >= l)
      // ours -> JDK
      val tiff = tiffWrap(Ccitt.encodeG4(px, w, 1), w, 1)
      assert(jdkReadPixels(tiff, w, 1).toSeq === px.toSeq, s"white run $l: JDK rejects ours")
      // JDK -> ours
      val (_, _, photo, strip) = tiffUnwrap(jdkWriteT6(px, w, 1))
      val dec = Ccitt.decodeG4(strip, w, 1)
      val visual = if (photo == 0) dec else dec.map(b => (1 - b).toByte)
      assert(visual.toSeq === px.toSeq, s"white run $l: we reject JDK's")
    }
  }

  test("garbage fails loudly") {
    // all-zero bits: 0000000 is no T.6 mode code
    intercept[Ccitt.CcittError](
      Ccitt.decodeG4(Array.fill(64)(0.toByte), 100, 10))
    // truncated stream exhausts mid-row
    intercept[Ccitt.CcittError](
      Ccitt.decodeG4(Array[Byte](0xff.toByte), 100, 10))
    intercept[IllegalArgumentException](
      Ccitt.decodeG4(Array[Byte](0), 0, 5))
  }
}
