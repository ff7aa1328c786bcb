package graft.kernel

/** From-scratch decoders for the multimodal column (SURVEY.md
  * "multimodal binary columns") covering every standard format this
  * sandbox can decode WITHOUT codec libraries:
  *
  *  - BMP: uncompressed BI_RGB, 8/24/32 bpp (plain header + pixel rows);
  *  - WAV: RIFF/WAVE PCM, 8/16-bit (chunked header + raw samples);
  *  - PNG: 8-bit greyscale/RGB/RGBA, non-interlaced — zlib streams via
  *    JDK `Inflater` (the same primitive the PDF kernel uses for
  *    FlateDecode) and the five per-row filters reconstructed per the
  *    PNG specification (None/Sub/Up/Average/Paeth).
  *
  * Formats that genuinely require codec libraries (JPEG entropy coding,
  * video codecs) stay behind the documented stub container in
  * [[graft.ops.Multimodal]]; everything here is a real decode.
  *
  * All functions throw on malformed input — callers isolate failures
  * per-row (C5), mirroring the reference's chunk-failure tolerance
  * (`/root/reference/app/services/ocr.py:75-77`).
  */
object Media {

  final case class Decoded(codec: String, width: Int, height: Int,
                           sampleRate: Int, frames: Int,
                           samples: Array[Int], sampleMax: Int)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  def isBmp(p: Array[Byte]): Boolean =
    p.length >= 2 && p(0) == 'B' && p(1) == 'M'
  def isWav(p: Array[Byte]): Boolean =
    p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'
  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && java.util.Arrays.equals(java.util.Arrays.copyOf(p, 8), PngSig)

  /** BMP → per-pixel 0–255 luminance (BT.601 integer weights for 24/32
    * bpp; the raw index byte for 8 bpp — palettes carry presentation, not
    * content). Bottom-up and top-down row orders both normalized to
    * top-down.
    */
  def decodeBmp(p: Array[Byte]): Decoded = {
    require(isBmp(p) && p.length >= 54, "not a BMP")
    val dataOff = le32(p, 10)
    val hdrSize = le32(p, 14)
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val w = le32(p, 18)
    val hRaw = le32(p, 22)
    val h = math.abs(hRaw)
    val bpp = le16(p, 28)
    val compression = le32(p, 30)
    require(compression == 0, s"compressed BMP (method $compression) unsupported")
    require(bpp == 8 || bpp == 24 || bpp == 32, s"unsupported bpp $bpp")
    require(w > 0 && h > 0 && w.toLong * h <= (64L << 20), s"implausible dims ${w}x$h")
    val rowBytes = ((bpp * w + 31) / 32) * 4
    require(dataOff.toLong + rowBytes.toLong * h <= p.length, "truncated BMP pixel array")
    val out = new Array[Int](w * h)
    val bytesPerPx = bpp / 8
    var y = 0
    while (y < h) {
      val srcRow = if (hRaw > 0) h - 1 - y else y // bottom-up when positive
      var row = dataOff + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val v =
          if (bpp == 8) p(row) & 0xff
          else {
            val b = p(row) & 0xff; val g = p(row + 1) & 0xff; val r = p(row + 2) & 0xff
            (r * 299 + g * 587 + b * 114) / 1000
          }
        out(y * w + x) = v
        row += bytesPerPx
        x += 1
      }
      y += 1
    }
    Decoded("bmp", w, h, 0, 1, out, 255)
  }

  /** WAV (RIFF PCM) → signed sample amplitudes per frame (multi-channel
    * frames averaged); 8-bit unsigned samples recentred to signed.
    */
  def decodeWav(p: Array[Byte]): Decoded = {
    require(isWav(p), "not a RIFF/WAVE")
    // the walk runs in Long: a crafted len near Int.MaxValue would wrap an
    // Int `off` negative (and `dataOff + dataLen` negative, slipping past
    // an Int bound check into a multi-GB allocation whose OutOfMemoryError
    // is not an Exception and escapes the per-row catch) — C5 again
    var off = 12L
    var rate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= p.length) {
      val o = off.toInt // safe: off + 8 <= p.length <= Int.MaxValue
      val id = new String(p, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      val len = le32(p, o + 4)
      // a crafted negative length would walk `off` backwards forever —
      // garbage must fail the row, never hang the task (C5)
      require(len >= 0, s"negative chunk length in $id")
      if (id == "fmt ") {
        require(le16(p, o + 8) == 1, "non-PCM WAV unsupported")
        channels = le16(p, o + 10)
        rate = le32(p, o + 12)
        bits = le16(p, o + 22)
      } else if (id == "data") { dataOff = o + 8; dataLen = len }
      off += 8L + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0 && channels > 0 && (bits == 8 || bits == 16), "missing/odd fmt chunk")
    require(dataOff >= 0 && dataOff.toLong + dataLen.toLong <= p.length,
      "missing/truncated data chunk")
    val bytesPerSample = bits / 8
    val frame = channels * bytesPerSample
    val n = dataLen / frame
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      var acc = 0
      var c = 0
      while (c < channels) {
        val o = dataOff + i * frame + c * bytesPerSample
        val s =
          if (bits == 16) le16(p, o).toShort.toInt
          else ((p(o) & 0xff) - 128) << 8 // 8-bit unsigned → signed, 16-bit scale
        acc += s
        c += 1
      }
      out(i) = acc / channels
      i += 1
    }
    Decoded("wav", 0, 0, rate, n, out, 32768)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val pp = a + b - c
    val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** PNG (8-bit depth, colour types 0/2/3/6, non-interlaced) → per-pixel
    * 0–255 luminance. IDAT chunks are concatenated, inflated with the JDK
    * `Inflater`, and each row reconstructed from its filter byte exactly
    * per the spec (None/Sub/Up/Average/Paeth); indexed-colour images
    * resolve through their PLTE table. Adam7 interlacing and sub-byte
    * depths are rejected explicitly, not mis-decoded.
    */
  def decodePng(p: Array[Byte]): Decoded = {
    require(isPng(p), "not a PNG")
    var off = 8
    var w = 0; var h = 0; var channels = 0; var colorType = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && off + 8 <= p.length) {
      val len = be32(p, off)
      val typ = new String(p, off + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      require(len >= 0 && off + 12 + len <= p.length, s"truncated chunk $typ")
      typ match {
        case "IHDR" =>
          w = be32(p, off + 8); h = be32(p, off + 12)
          val depth = p(off + 16) & 0xff
          colorType = p(off + 17) & 0xff
          val interlace = p(off + 20) & 0xff
          require(depth == 8, s"bit depth $depth unsupported (8 only)")
          require(interlace == 0, "Adam7 interlacing unsupported")
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case 3 => 1 // indexed: one palette index per pixel
            case 6 => 4
            case t => throw new IllegalArgumentException(s"colour type $t unsupported")
          }
          require(w > 0 && h > 0 && w.toLong * h <= (64L << 20), s"implausible dims ${w}x$h")
        case "PLTE" =>
          require(len > 0 && len % 3 == 0 && len <= 768, s"bad PLTE length $len")
          palette = java.util.Arrays.copyOfRange(p, off + 8, off + 8 + len)
        case "IDAT" => idat.write(p, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    require(colorType != 3 || palette != null, "indexed PNG missing PLTE")
    require(w > 0 && idat.size() > 0, "missing IHDR/IDAT")
    val stride = w * channels
    val raw = new Array[Byte]((1 + stride) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val k = inf.inflate(raw, got, raw.length - got)
      // inflate()==0 with finished()==false covers BOTH truncation
      // (needsInput) and an FDICT preset-dictionary stream
      // (needsDictionary) — either way no progress will ever be made, so
      // fail the row instead of spinning forever (C5: garbage must fail,
      // never hang)
      require(k > 0 || inf.finished(), "truncated or dictionary-requiring IDAT stream")
      got += k
    }
    inf.end()
    require(got == raw.length, s"IDAT inflated to $got, expected ${raw.length}")
    // defilter in place into `img`
    val img = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      val src = y * (1 + stride) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(src + x) & 0xff
        val a = if (x >= channels) img(dst + x - channels) & 0xff else 0
        val b = if (y > 0) img(dst - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= channels) img(dst - stride + x - channels) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 => cur + paeth(a, b, c)
          case other => throw new IllegalArgumentException(s"filter $other invalid")
        }
        img(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](w * h)
    val nPal = if (palette == null) 0 else palette.length / 3
    var i = 0
    while (i < w * h) {
      val o = i * channels
      out(i) =
        if (colorType == 3) {
          val idx = img(o) & 0xff
          require(idx < nPal, s"palette index $idx out of range ($nPal entries)")
          ((palette(idx * 3) & 0xff) * 299 + (palette(idx * 3 + 1) & 0xff) * 587 +
            (palette(idx * 3 + 2) & 0xff) * 114) / 1000
        } else if (channels == 1) img(o) & 0xff
        else ((img(o) & 0xff) * 299 + (img(o + 1) & 0xff) * 587 + (img(o + 2) & 0xff) * 114) / 1000
      i += 1
    }
    Decoded("png", w, h, 0, 1, out, 255)
  }
}
