package graft.kernel

/** EXIF metadata reader (CIPA DC-008 / the TIFF IFD inside a JPEG APP1
  * segment) — the crawl-relevant slice: ORIENTATION (without it a
  * phone photo's perceptual hash differs from its upright re-encode,
  * defeating image dedup), camera make/model, and the capture
  * timestamp. Both byte orders; the Exif private sub-IFD (0x8769) is
  * followed for DateTimeOriginal. Absent or malformed EXIF yields the
  * defaults — a metadata reader must never fail a decode.
  */
object Exif {

  /** orientation 0 = absent; 1–8 per the EXIF spec. */
  final case class Meta(orientation: Int, make: String, model: String,
                        dateTime: String)
  val Empty: Meta = Meta(0, "", "", "")

  /** Scan a JPEG's APP1 segments for the Exif payload and parse it.
    * Non-JPEG or EXIF-less input returns [[Empty]].
    */
  def fromJpeg(p: Array[Byte]): Meta = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return Empty
    var off = 2
    while (off + 4 <= p.length && (p(off) & 0xff) == 0xff) {
      val marker = p(off + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) off += 2
      else if (marker == 0xda || marker == 0xd9) return Empty // scan/EOI: no EXIF
      else {
        val len = ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
        if (len < 2 || off + 2 + len > p.length) return Empty
        if (marker == 0xe1 && len >= 8 &&
          p(off + 4) == 'E' && p(off + 5) == 'x' && p(off + 6) == 'i' &&
          p(off + 7) == 'f' && p(off + 8) == 0 && p(off + 9) == 0) {
          return try parseTiff(java.util.Arrays.copyOfRange(p, off + 10, off + 2 + len))
          catch { case _: Exception => Empty }
        }
        off += 2 + len
      }
    }
    Empty
  }

  /** Parse the TIFF structure EXIF embeds (IFD0 + optional Exif
    * sub-IFD). Exposed for tests.
    */
  def parseTiff(t: Array[Byte]): Meta = {
    if (t.length < 8) return Empty
    val le = t(0) == 'I' && t(1) == 'I'
    val be = t(0) == 'M' && t(1) == 'M'
    if (!le && !be) return Empty
    def u16(o: Int): Int =
      if (le) (t(o) & 0xff) | ((t(o + 1) & 0xff) << 8)
      else ((t(o) & 0xff) << 8) | (t(o + 1) & 0xff)
    def u32(o: Int): Int =
      if (le) u16(o) | (u16(o + 2) << 16) else (u16(o) << 16) | u16(o + 2)
    if (u16(2) != 42) return Empty
    var orientation = 0; var make = ""; var model = ""
    var dateTime = ""; var dateTimeOriginal = ""
    var exifIfd = 0

    def ascii(valOff: Int, count: Int): String = {
      // count ≤ 4: value inline; else value is an offset
      val at = if (count <= 4) valOff else u32(valOff)
      if (at < 0 || at + count > t.length) ""
      else {
        var end = at
        val stop = at + count
        while (end < stop && t(end) != 0) end += 1
        new String(t, at, end - at, java.nio.charset.StandardCharsets.US_ASCII).trim
      }
    }
    def walk(ifdOff: Int, isExifIfd: Boolean): Unit = {
      if (ifdOff < 0 || ifdOff + 2 > t.length) return
      val n = u16(ifdOff)
      if (n > 512) return
      var e = 0
      while (e < n) {
        val at = ifdOff + 2 + e * 12
        if (at + 12 <= t.length) {
          val tag = u16(at)
          val typ = u16(at + 2)
          val count = u32(at + 4)
          (tag, isExifIfd) match {
            case (0x0112, false) if typ == 3 => orientation = u16(at + 8)
            case (0x010f, false) if typ == 2 => make = ascii(at + 8, count)
            case (0x0110, false) if typ == 2 => model = ascii(at + 8, count)
            case (0x0132, false) if typ == 2 => dateTime = ascii(at + 8, count)
            case (0x8769, false) if typ == 4 => exifIfd = u32(at + 8)
            case (0x9003, true) if typ == 2 => dateTimeOriginal = ascii(at + 8, count)
            case _ =>
          }
        }
        e += 1
      }
    }
    walk(u32(4), isExifIfd = false)
    if (exifIfd > 0) walk(exifIfd, isExifIfd = true)
    val dt = if (dateTimeOriginal.nonEmpty) dateTimeOriginal else dateTime
    Meta(if (orientation >= 1 && orientation <= 8) orientation else 0,
      make, model, dt)
  }

  /** Re-lay a stored sample grid upright per the orientation tag
    * (returns `(samples, width, height)`): 1 identity, 2 mirror-H,
    * 3 rot180, 4 mirror-V, 5 transpose, 6 rot90CW, 7 transverse,
    * 8 rot270CW — the display transform, so two crawled copies of the
    * same photo hash identically whichever way the camera was held.
    */
  def upright(samples: Array[Int], w: Int, h: Int,
              orientation: Int): (Array[Int], Int, Int) = {
    require(samples.length == w * h, "sample buffer size mismatch")
    if (orientation <= 1 || orientation > 8) return (samples, w, h)
    val swap = orientation >= 5
    val (ow, oh) = if (swap) (h, w) else (w, h)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (nx, ny) = orientation match {
          case 2 => (w - 1 - x, y)
          case 3 => (w - 1 - x, h - 1 - y)
          case 4 => (x, h - 1 - y)
          case 5 => (y, x)
          case 6 => (h - 1 - y, x)
          case 7 => (h - 1 - y, w - 1 - x)
          case _ => (y, w - 1 - x) // 8
        }
        out(ny * ow + nx) = samples(y * w + x)
        x += 1
      }
      y += 1
    }
    (out, ow, oh)
  }
}
