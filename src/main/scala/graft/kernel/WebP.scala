package graft.kernel

/** From-scratch WebP-lossless (VP8L) decoder — no codec library, same
  * per-spec discipline as [[Jpeg]]/[[Media]]. VP8L is the lossless half
  * of WebP (RIFF container, "VP8L" chunk) and is specified publicly as a
  * standalone bitstream: LSB-first bit packing, canonical prefix codes
  * whose code lengths are themselves prefix-coded (the DEFLATE lineage),
  * LZ77 backward references with a 2D distance neighborhood, an optional
  * color cache, and four invertible pixel transforms (predictor, color,
  * subtract-green, color-indexing with sub-byte pixel bundling).
  *
  * Supported: the full VP8L still-image feature set — all four
  * transforms (all 14 predictor modes), meta-prefix (huffman-image)
  * group selection, color cache, LZ77 including the 120-entry
  * neighborhood map. Lossy WebP ("VP8 " chunk) dispatches to the
  * RFC 6386 keyframe decoder in [[Vp8]].
  *
  * Output is the BT.601 luma plane like every other image decoder here.
  * All loops bound on explicit sizes; malformed input throws (C5).
  */
object WebP {

  def isWebP(p: Array[Byte]): Boolean =
    p.length >= 16 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'E' && p(10) == 'B' && p(11) == 'P'

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** LSB-first bit reader (VP8L packs bits little-endian within bytes). */
  private final class Bits(p: Array[Byte], var pos: Int, val end: Int) {
    private var acc = 0L
    private var n = 0
    def bits(k: Int): Int = {
      require(k <= 24, "bit read too wide")
      while (n < k) {
        require(pos < end, "truncated VP8L stream")
        acc |= (p(pos) & 0xffL) << n
        n += 8; pos += 1
      }
      val v = (acc & ((1L << k) - 1)).toInt
      acc >>>= k; n -= k
      v
    }
    def bit(): Int = bits(1)
  }

  /** Canonical prefix code in DECODE form (codes read MSB-of-code-first
    * from the LSB-first bitstream, per the DEFLATE/VP8L convention).
    */
  private final class Code(lengths: Array[Int]) {
    val maxLen = lengths.max
    require(maxLen > 0, "empty prefix code")
    // single-symbol codes read zero bits
    val single: Int =
      if (lengths.count(_ > 0) == 1) lengths.indexWhere(_ > 0) else -1
    private val counts = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) counts(l) += 1)
    require(single >= 0 || counts.zipWithIndex.map {
      case (c, l) => if (l == 0) 0.0 else c * math.pow(2, -l)
    }.sum == 1.0, "incomplete prefix code")
    private val minCode = new Array[Int](maxLen + 1)
    private val maxCode = Array.fill(maxLen + 1)(-1)
    private val valPtr = new Array[Int](maxLen + 1)
    val sorted: Array[Int] = {
      // symbols ordered by (length, symbol) — canonical
      val out = new Array[Int](lengths.count(_ > 0))
      var k = 0
      var l = 1
      var code = 0
      while (l <= maxLen) {
        valPtr(l) = k
        minCode(l) = code
        var s = 0
        while (s < lengths.length) {
          if (lengths(s) == l) { out(k) = s; k += 1; code += 1 }
          s += 1
        }
        maxCode(l) = code - 1
        code <<= 1
        l += 1
      }
      out
    }
    def decode(r: Bits): Int = {
      if (single >= 0) return single
      var code = r.bit()
      var l = 1
      while (code > maxCode(l) || maxCode(l) < 0) {
        l += 1
        require(l <= maxLen, "invalid prefix code in stream")
        code = (code << 1) | r.bit()
      }
      sorted(valPtr(l) + code - minCode(l))
    }
  }

  /** Order in which code-length-code lengths are stored (spec constant). */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or normal form) for `alphabet` symbols. */
  private def readCode(r: Bits, alphabet: Int): Code = {
    val lengths = new Array[Int](alphabet)
    if (r.bit() == 1) {
      // simple code: 1 or 2 symbols
      val numSym = r.bit() + 1
      val firstLen = if (r.bit() == 1) 8 else 1
      val s0 = r.bits(firstLen)
      require(s0 < alphabet, s"simple-code symbol $s0 out of alphabet")
      lengths(s0) = 1
      if (numSym == 2) {
        val s1 = r.bits(8)
        require(s1 < alphabet && s1 != s0, s"bad second simple symbol $s1")
        lengths(s1) = 1
      }
    } else {
      // normal: code-length code, then run-length-coded symbol lengths
      val numCl = 4 + r.bits(4)
      require(numCl <= 19, "bad code-length count")
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = r.bits(3); i += 1 }
      val clCode = new Code(clLengths)
      val maxSymbol =
        if (r.bit() == 1) {
          val nbits = 2 + 2 * r.bits(3)
          2 + r.bits(nbits)
        } else alphabet
      var sym = 0
      var prevLen = 8
      var budget = maxSymbol
      while (sym < alphabet && budget > 0) {
        budget -= 1
        val cl = clCode.decode(r)
        cl match {
          case l if l < 16 =>
            lengths(sym) = l; sym += 1
            if (l != 0) prevLen = l
          case 16 =>
            var rep = 3 + r.bits(2)
            require(sym + rep <= alphabet, "length repeat past alphabet")
            while (rep > 0) { lengths(sym) = prevLen; sym += 1; rep -= 1 }
          case 17 =>
            val rep = 3 + r.bits(3)
            require(sym + rep <= alphabet, "zero repeat past alphabet")
            sym += rep
          case _ =>
            val rep = 11 + r.bits(7)
            require(sym + rep <= alphabet, "zero repeat past alphabet")
            sym += rep
        }
      }
    }
    new Code(lengths)
  }

  /** One group's five codes. */
  private final case class Group(green: Code, red: Code, blue: Code,
                                 alpha: Code, dist: Code)

  private def readGroup(r: Bits, cacheSize: Int): Group =
    Group(
      readCode(r, 256 + 24 + cacheSize),
      readCode(r, 256), readCode(r, 256), readCode(r, 256),
      readCode(r, 40))

  /** LZ77 prefix value decode (lengths and distances share the scheme). */
  private def prefixValue(r: Bits, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + r.bits(extra) + 1
    }

  /** The 120-entry 2D distance neighborhood, GENERATED by the spec's
    * rule rather than transcribed: candidates are (dx, dy) with
    * dy ∈ 0..7, dx ∈ -7..8, above-or-left of the current pixel
    * (dy > 0, or dy == 0 with dx > 0 — positive dx points LEFT), sorted
    * by squared Euclidean distance, larger dy first on ties, positive dx
    * before negative. That yields exactly 120 entries matching the
    * spec's kCodeToPlane enumeration.
    */
  private val DistMap: Array[(Int, Int)] = {
    val cands = for {
      dy <- 0 to 7
      dx <- -7 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)
    cands.sortBy { case (dx, dy) =>
      (dx * dx + dy * dy, -dy, if (dx >= 0) 0 else 1)
    }.toArray
  }

  private def planeDistance(code: Int, xsize: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistMap(code - 1)
      math.max(1, dy * xsize + dx)
    }

  // ---------------------------------------------------------- transforms
  private sealed trait Transform
  private final case class Predictor(sizeBits: Int, data: Array[Int]) extends Transform
  private final case class ColorTf(sizeBits: Int, data: Array[Int]) extends Transform
  private case object SubtractGreen extends Transform
  private final case class ColorIndex(palette: Array[Int], widthBits: Int) extends Transform

  private def avg2(a: Int, b: Int): Int = (a + b) / 2
  private def addPix(a: Int, b: Int): Int = {
    // per-channel modular add of two ARGB words
    val aa = (((a >>> 24) + (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = (((a & 0xff) + (b & 0xff)) & 0xff)
    aa | rr | gg | bb
  }
  private def avgPix(a: Int, b: Int): Int = {
    val aa = avg2(a >>> 24, b >>> 24) << 24
    val rr = avg2((a >> 16) & 0xff, (b >> 16) & 0xff) << 16
    val gg = avg2((a >> 8) & 0xff, (b >> 8) & 0xff) << 8
    val bb = avg2(a & 0xff, b & 0xff)
    aa | rr | gg | bb
  }
  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(sh: Int): Int =
      clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }
  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    def ch(sh: Int): Int = {
      val ave = avg2((l >>> sh) & 0xff, (t >>> sh) & 0xff)
      clamp255(ave + (ave - ((tl >>> sh) & 0xff)) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }
  private def select(l: Int, t: Int, tl: Int): Int = {
    // Paeth-style: with estimate p = L + T − TL, the distance from p to L
    // is |T−TL| and to T is |L−TL|; choose the closer neighbor — i.e.
    // predict T when Σ|L−TL| <= Σ|T−TL| (libwebp's pa_minus_pb <= 0)
    def d(a: Int, b: Int, sh: Int): Int =
      math.abs(((a >>> sh) & 0xff) - ((b >>> sh) & 0xff))
    val pL = d(l, tl, 24) + d(l, tl, 16) + d(l, tl, 8) + d(l, tl, 0)
    val pT = d(t, tl, 24) + d(t, tl, 16) + d(t, tl, 8) + d(t, tl, 0)
    if (pL <= pT) t else l
  }

  private def inversePredictor(px: Array[Int], w: Int, h: Int,
                               sizeBits: Int, modes: Array[Int]): Unit = {
    val bw = (w + (1 << sizeBits) - 1) >> sizeBits
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val mode =
          if (x == 0 && y == 0) -1 // top-left: black predictor regardless
          else if (y == 0) 101 // top row: L
          else if (x == 0) 102 // left column: T
          else (modes(((y >> sizeBits) * bw) + (x >> sizeBits)) >> 8) & 0xff
        val l = if (x > 0) px(i - 1) else 0
        val t = if (y > 0) px(i - w) else 0
        val tl = if (x > 0 && y > 0) px(i - w - 1) else 0
        // spec defines TR on the LINEAR array: at the last column it is
        // the current row's first (already-decoded) pixel, not clamped
        val tr = if (y > 0) px(i - w + 1) else 0
        val pred = mode match {
          case -1 => 0xff000000
          case 101 => l
          case 102 => t
          case 0 => 0xff000000
          case 1 => l
          case 2 => t
          case 3 => tr
          case 4 => tl
          case 5 => avgPix(avgPix(l, tr), t)
          case 6 => avgPix(l, tl)
          case 7 => avgPix(l, t)
          case 8 => avgPix(tl, t)
          case 9 => avgPix(t, tr)
          case 10 => avgPix(avgPix(l, tl), avgPix(t, tr))
          case 11 => select(l, t, tl)
          case 12 => clampAddSubtractFull(l, t, tl)
          case 13 => clampAddSubtractHalf(l, t, tl)
          case m => throw new IllegalArgumentException(s"predictor mode $m invalid")
        }
        px(i) = addPix(px(i), pred)
        x += 1; i += 1
      }
      y += 1
    }
  }

  private def colorDelta(t: Int, c: Int): Int = ((t.toByte * c.toByte) >> 5)

  private def inverseColor(px: Array[Int], w: Int, h: Int,
                           sizeBits: Int, elems: Array[Int]): Unit = {
    val bw = (w + (1 << sizeBits) - 1) >> sizeBits
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val e = elems(((y >> sizeBits) * bw) + (x >> sizeBits))
        // spec channel mapping: green_to_red rides the BLUE channel,
        // green_to_blue the green channel, red_to_blue the red channel
        val g2r = e & 0xff
        val g2b = (e >> 8) & 0xff
        val r2b = (e >> 16) & 0xff
        val a = px(i)
        val g = (a >> 8) & 0xff
        var r = (a >> 16) & 0xff
        var b = a & 0xff
        r = (r + colorDelta(g2r, g)) & 0xff
        b = (b + colorDelta(g2b, g)) & 0xff
        b = (b + colorDelta(r2b, r)) & 0xff
        px(i) = (a & 0xff00ff00.toInt) | (r << 16) | b
        x += 1; i += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val a = px(i)
      val g = (a >> 8) & 0xff
      val r = (((a >> 16) & 0xff) + g) & 0xff
      val b = ((a & 0xff) + g) & 0xff
      px(i) = (a & 0xff00ff00.toInt) | (r << 16) | b
      i += 1
    }
  }

  private def inverseColorIndex(px: Array[Int], w: Int, h: Int,
                                palette: Array[Int], widthBits: Int): Array[Int] = {
    if (widthBits == 0) {
      var i = 0
      while (i < px.length) {
        val idx = (px(i) >> 8) & 0xff
        require(idx < palette.length, s"palette index $idx out of range")
        px(i) = palette(idx)
        i += 1
      }
      px
    } else {
      // sub-byte bundling: each coded pixel packs 2^widthBits real pixels
      val perPixel = 1 << widthBits
      val ibits = 8 >> widthBits // bits per index
      val packedW = (w + perPixel - 1) / perPixel
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val packed = (px(y * packedW + x / perPixel) >> 8) & 0xff
          val idx = (packed >> (ibits * (x % perPixel))) & ((1 << ibits) - 1)
          require(idx < palette.length, s"palette index $idx out of range")
          out(y * w + x) = palette(idx)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  // ------------------------------------------------------- image streams
  /** Decode an entropy-coded image (the shared machinery for the main
    * image and every transform/meta sub-image). Returns ARGB pixels.
    */
  private def decodeImage(r: Bits, w: Int, h: Int,
                          isMain: Boolean = false): Array[Int] = {
    // color cache
    val cacheBits = if (r.bit() == 1) r.bits(4) else 0
    require(cacheBits <= 11, s"bad cache bits $cacheBits")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](math.max(cacheSize, 1))
    // meta-prefix group image — exists ONLY on the spatially-coded main
    // image; transform/meta sub-images are plain entropy-coded images
    // and reading the bit here would steal one from their prefix codes
    var metaBits = 0
    var meta: Array[Int] = null
    var groups: Array[Group] = null
    if (isMain && r.bit() == 1) {
      metaBits = r.bits(3) + 2
      val mw = (w + (1 << metaBits) - 1) >> metaBits
      val mh = (h + (1 << metaBits) - 1) >> metaBits
      meta = decodeImage(r, mw, mh)
      val n = meta.map(p => ((p >> 8) & 0xffff)).max + 1
      require(n <= 65536, s"implausible group count $n") // 16-bit index space
      groups = Array.fill(n)(null)
    } else groups = Array.fill(1)(null)
    var gi = 0
    while (gi < groups.length) { groups(gi) = readGroup(r, cacheSize); gi += 1 }

    val px = new Array[Int](w * h)
    val mw = if (meta != null) (w + (1 << metaBits) - 1) >> metaBits else 0
    def cacheInsert(argb: Int): Unit =
      if (cacheBits > 0) cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    var pos = 0
    var px_x = 0
    var px_y = 0
    def advance(n: Int): Unit = {
      px_x += n
      while (px_x >= w) { px_x -= w; px_y += 1 }
    }
    while (pos < w * h) {
      // x/y tracked incrementally — two divisions per pixel would tax the
      // hot loop of a media kernel for nothing when no meta image exists
      val g =
        if (meta == null) groups(0)
        else {
          val m = meta(((px_y >> metaBits) * mw) + (px_x >> metaBits))
          groups((m >> 8) & 0xffff)
        }
      val s = g.green.decode(r)
      if (s < 256) {
        val red = g.red.decode(r)
        val blue = g.blue.decode(r)
        val alpha = g.alpha.decode(r)
        val argb = (alpha << 24) | (red << 16) | (s << 8) | blue
        px(pos) = argb
        cacheInsert(argb)
        pos += 1; advance(1)
      } else if (s < 280) {
        val len = prefixValue(r, s - 256)
        val distCode = prefixValue(r, g.dist.decode(r))
        val dist = planeDistance(distCode, w)
        require(dist <= pos, s"backward reference $dist past start")
        require(pos + len <= w * h, "backward reference past image end")
        var k = 0
        while (k < len) {
          px(pos) = px(pos - dist)
          cacheInsert(px(pos))
          pos += 1; k += 1
        }
        advance(len)
      } else {
        val idx = s - 280
        require(idx < cacheSize, s"cache index $idx out of range")
        px(pos) = cache(idx)
        pos += 1; advance(1)
      }
    }
    px
  }

  /** Decode a VP8L payload (after the 0x2f signature byte). */
  private def decodeVp8l(p: Array[Byte], start: Int, end: Int): Media.Decoded = {
    val r = new Bits(p, start, end)
    val w = r.bits(14) + 1
    val h = r.bits(14) + 1
    r.bit() // alpha hint
    require(r.bits(3) == 0, "unknown VP8L version")
    require(w.toLong * h <= (64L << 20), s"implausible dims ${w}x$h")
    // transforms (main level only)
    var transforms = List.empty[Transform]
    var codedW = w
    var seen = Set.empty[Int]
    var more = r.bit() == 1
    while (more) {
      val t = r.bits(2)
      require(!seen(t), s"transform $t repeated")
      seen += t
      t match {
        case 0 =>
          val sb = r.bits(3) + 2
          val bw = (codedW + (1 << sb) - 1) >> sb
          val bh = (h + (1 << sb) - 1) >> sb
          transforms ::= Predictor(sb, decodeImage(r, bw, bh))
        case 1 =>
          val sb = r.bits(3) + 2
          val bw = (codedW + (1 << sb) - 1) >> sb
          val bh = (h + (1 << sb) - 1) >> sb
          transforms ::= ColorTf(sb, decodeImage(r, bw, bh))
        case 2 => transforms ::= SubtractGreen
        case _ =>
          val nColors = r.bits(8) + 1
          val palette = decodeImage(r, nColors, 1)
          // palette entries are delta-coded against the previous entry
          var i = 1
          while (i < palette.length) { palette(i) = addPix(palette(i), palette(i - 1)); i += 1 }
          val widthBits =
            if (nColors <= 2) 3 else if (nColors <= 4) 2 else if (nColors <= 16) 1 else 0
          transforms ::= ColorIndex(palette, widthBits)
          if (widthBits > 0) codedW = (codedW + (1 << widthBits) - 1) >> widthBits
      }
      more = r.bit() == 1
    }
    var px = decodeImage(r, codedW, h, isMain = true)
    // inverse transforms in reverse order of reading (list head = last
    // read). The image width CHANGES mid-chain: before the colour-index
    // inverse runs, the image is still at the bundled width — predictor/
    // colour inverses read after the palette operate at that width (they
    // were also parsed with it), those read before it at the full width
    var curW = codedW
    transforms.foreach {
      case ColorIndex(pal, wb) =>
        px = inverseColorIndex(px, w, h, pal, wb)
        curW = w
      case SubtractGreen => inverseSubtractGreen(px)
      case ColorTf(sb, data) => inverseColor(px, curW, h, sb, data)
      case Predictor(sb, data) => inversePredictor(px, curW, h, sb, data)
    }
    val luma = new Array[Int](w * h)
    var i = 0
    while (i < luma.length) {
      val a = px(i)
      luma(i) = ((((a >> 16) & 0xff) * 299 + (((a >> 8) & 0xff)) * 587 +
        (a & 0xff) * 114) / 1000)
      i += 1
    }
    Media.Decoded("webp", w, h, 0, 1, luma, 255)
  }

  /** Decode a WebP container: lossless "VP8L" payloads through the
    * prefix-code path here, lossy "VP8 " keyframes through the [[Vp8]]
    * decoder (whose luma plane IS the grey output — VP8 codes Y
    * directly, no RGB detour to take luma of).
    */
  def decode(p: Array[Byte]): Media.Decoded = {
    require(isWebP(p), "not a WebP")
    // Long walk: a crafted len near Int.MaxValue would wrap an Int bound
    // check and index negatively (the C5 class fixed for WAV/AVI too)
    var off = 12L
    while (off + 8 <= p.length) {
      val o = off.toInt
      val id = new String(p, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      val len = le32(p, o + 4)
      require(len >= 0 && off + 8 + len <= p.length, s"truncated chunk $id")
      if (id == "VP8L") {
        require(len >= 2 && (p(o + 8) & 0xff) == 0x2f, "bad VP8L signature")
        return decodeVp8l(p, o + 9, o + 8 + len)
      }
      if (id == "VP8 ") {
        val f = Vp8.decodeFrame(java.util.Arrays.copyOfRange(p, o + 8, o + 8 + len))
        return Media.Decoded("webp", f.width, f.height, 0, 1, f.y, 255)
      }
      off += 8L + len + (len & 1)
    }
    throw new IllegalArgumentException("no VP8L/VP8 chunk")
  }
}
