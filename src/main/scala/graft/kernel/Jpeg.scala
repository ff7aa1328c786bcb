package graft.kernel

/** From-scratch baseline JPEG (JFIF/ITU-T T.81) decoder — no codec
  * library, same per-spec discipline as [[Media.decodePng]]. Retires the
  * last real multimodal stub: a web crawl's image column is overwhelmingly
  * JPEG (the reference's raster path rasterizes PDFs to exactly this kind
  * of image before OCR, `/root/reference/app/services/vision.py`).
  *
  * Supported — the baseline web-JPEG envelope:
  *  - SOF0 (baseline sequential DCT, 8-bit), 1 or 3 components,
  *    sampling factors 1–2 in each axis (4:4:4, 4:2:2, 4:2:0);
  *  - DQT 8-bit tables, DHT DC/AC canonical Huffman tables (the spec's
  *    DECODE procedure over BITS/HUFFVAL), DRI restart intervals with
  *    FFD0–FFD7 markers (bit-buffer flush + DC predictor reset);
  *  - entropy-coded data with FF00 byte stuffing.
  *
  * Rejected explicitly (never mis-decoded): progressive (SOF2) and all
  * other SOF types, 16-bit quant tables, arithmetic coding.
  *
  * Output is the LUMINANCE plane only (that is what the feature kernel
  * consumes): Y blocks are dequantized + IDCT'd; chroma blocks are
  * entropy-decoded — the bitstream cannot be advanced otherwise — but
  * their IDCT is skipped. JPEG's Y channel IS BT.601 luma, so this matches
  * the other decoders' grey output exactly.
  *
  * Every malformed input throws (C5: garbage fails the row, never hangs
  * the task — all loops bound on explicit lengths or throw on truncation).
  */
object Jpeg {

  def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
      (p(2) & 0xff) == 0xff

  /** Zig-zag index: zigzag(k) = natural (row*8+col) position of the k-th
    * coefficient in scan order (T.81 Figure A.6).
    */
  private[graft] val ZigZag: Array[Int] = {
    val z = new Array[Int](64)
    var k = 0
    var x = 0; var y = 0; var up = true
    while (k < 64) {
      z(k) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      k += 1
    }
    z
  }

  /** Canonical Huffman table in the spec's DECODE form. */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l) == 0) maxCode(l) = -1
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int = vals(valPtr(l) + code - minCode(l))
  }

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    /** Next entropy-coded bit; throws on truncation or an unexpected
      * marker (restart markers are consumed via [[restart]], not here).
      */
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= p.length) throw new IllegalArgumentException("truncated scan")
        var b = p(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= p.length) throw new IllegalArgumentException("truncated scan")
          val m = p(pos) & 0xff; pos += 1
          if (m != 0x00) throw new IllegalArgumentException(
            f"marker 0xff$m%02x inside entropy data")
          b = 0xff
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (code > h.maxCode(l) || h.maxCode(l) < 0) {
        l += 1
        if (l > 16) throw new IllegalArgumentException("invalid huffman code")
        code = (code << 1) | bit()
      }
      h.value(l, code)
    }
    /** Byte-align and consume one RSTn marker. */
    def restart(expected: Int): Unit = {
      cnt = 0
      if (pos + 2 > p.length) throw new IllegalArgumentException("truncated at restart")
      val a = p(pos) & 0xff; val b = p(pos + 1) & 0xff
      pos += 2
      if (a != 0xff || b != 0xd0 + expected)
        throw new IllegalArgumentException(f"expected RST$expected, got 0x$a%02x$b%02x")
    }
  }

  /** EXTEND (T.81 F.2.2.1): map a t-bit magnitude to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Separable 8×8 inverse DCT in double precision (T.81 A.3.3 as
    * written — correctness over speed; the per-row media decode is not a
    * hot columnar path). Input: dequantized coefficients in natural
    * order. Output: level-shifted 0–255 samples.
    */
  private def idct8x8(coef: Array[Double], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    // rows
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) 0.70710678118654752440 else 1.0
          s += cu * coef(y * 8 + u) * CosTable(x)(u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    // columns
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 0.70710678118654752440 else 1.0
          s += cv * tmp(v * 8 + x) * CosTable(yy)(v)
          v += 1
        }
        val px = math.rint(s / 2.0 + 128.0).toInt
        out(yy * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        yy += 1
      }
      x += 1
    }
  }

  private[graft] val CosTable: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))

  private def be16(p: Array[Byte], o: Int): Int =
    ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int,
                                var dcTab: Int = 0, var acTab: Int = 0,
                                var pred: Int = 0)

  def decode(p: Array[Byte]): Media.Decoded = {
    require(isJpeg(p), "not a JPEG")
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var width = 0; var height = 0
    var comps: Array[Comp] = null
    var restartInterval = 0
    var pos = 2

    def segLen(at: Int): Int = {
      require(at + 2 <= p.length, "truncated segment header")
      val len = be16(p, at)
      require(len >= 2 && at + len <= p.length, "bad segment length")
      len
    }

    var luma: Array[Int] = null
    var done = false
    while (!done) {
      require(pos + 2 <= p.length, "truncated before marker")
      require((p(pos) & 0xff) == 0xff, f"expected marker, got 0x${p(pos) & 0xff}%02x")
      var marker = p(pos + 1) & 0xff
      pos += 2
      while (marker == 0xff) { // fill bytes allowed before a marker
        require(pos < p.length, "truncated marker")
        marker = p(pos) & 0xff; pos += 1
      }
      marker match {
        case 0xd9 => done = true // EOI
        case 0xdb => // DQT
          val len = segLen(pos); var o = pos + 2
          while (o < pos + len) {
            val pq = (p(o) & 0xff) >> 4; val tq = p(o) & 0x0f
            require(pq == 0, "16-bit quant tables unsupported")
            require(tq < 4 && o + 65 <= pos + len, "bad DQT")
            quant(tq) = Array.tabulate(64)(k => p(o + 1 + k) & 0xff)
            o += 65
          }
          pos += len
        case 0xc4 => // DHT
          val len = segLen(pos); var o = pos + 2
          while (o < pos + len) {
            val tc = (p(o) & 0xff) >> 4; val th = p(o) & 0x0f
            require(tc < 2 && th < 4 && o + 17 <= pos + len, "bad DHT")
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = p(o + l) & 0xff; total += bits(l); l += 1 }
            require(total <= 256 && o + 17 + total <= pos + len, "bad DHT counts")
            val vals = Array.tabulate(total)(k => p(o + 17 + k) & 0xff)
            val huff = new Huff(bits, vals)
            if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
            o += 17 + total
          }
          pos += len
        case 0xc0 => // SOF0 baseline
          val len = segLen(pos)
          require((p(pos + 2) & 0xff) == 8, "only 8-bit precision supported")
          height = be16(p, pos + 3); width = be16(p, pos + 5)
          val nc = p(pos + 7) & 0xff
          require(nc == 1 || nc == 3, s"$nc components unsupported (1 or 3)")
          require(width > 0 && height > 0 && width.toLong * height <= (64L << 20),
            s"implausible dims ${width}x$height")
          require(len == 8 + 3 * nc, "bad SOF0 length")
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val c = Comp(p(o) & 0xff, (p(o + 1) & 0xff) >> 4, p(o + 1) & 0x0f, p(o + 2) & 0xff)
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2 && c.tq < 4,
              s"sampling ${c.h}x${c.v} or quant ${c.tq} unsupported")
            c
          }
          pos += len
        case m if m == 0xc1 || m == 0xc2 || m == 0xc3 ||
          (m >= 0xc5 && m <= 0xc7) || (m >= 0xc9 && m <= 0xcf && m != 0xcc) =>
          throw new IllegalArgumentException(
            f"non-baseline SOF 0x$m%02x unsupported (progressive/arithmetic)")
        case 0xdd => // DRI
          val len = segLen(pos)
          require(len == 4, "bad DRI")
          restartInterval = be16(p, pos + 2)
          pos += len
        case 0xda => // SOS — decode the single baseline scan
          require(comps != null, "SOS before SOF0")
          val len = segLen(pos)
          val ns = p(pos + 2) & 0xff
          require(ns == comps.length, "partial scans unsupported (baseline)")
          var i = 0
          while (i < ns) {
            val cs = p(pos + 3 + 2 * i) & 0xff
            val c = comps.find(_.id == cs).getOrElse(
              throw new IllegalArgumentException(s"scan references unknown component $cs"))
            c.dcTab = (p(pos + 4 + 2 * i) & 0xff) >> 4
            c.acTab = p(pos + 4 + 2 * i) & 0x0f
            i += 1
          }
          pos += len
          luma = decodeScan(p, pos, comps, quant, dcTabs, acTabs,
            width, height, restartInterval) match {
            case (plane, endPos) => pos = endPos; plane
          }
        case m if m >= 0xd0 && m <= 0xd7 =>
          throw new IllegalArgumentException("RST marker outside scan")
        case 0x01 => () // TEM, standalone
        case _ => // APPn, COM, everything else with a length
          pos += segLen(pos)
      }
    }
    require(luma != null, "no scan data")
    Media.Decoded("jpeg", width, height, 0, 1, luma, 255)
  }

  /** Decode the entropy-coded scan; returns (luma plane, position after
    * the scan — at the next marker, normally EOI).
    */
  private def decodeScan(p: Array[Byte], start: Int, comps: Array[Comp],
                         quant: Array[Array[Int]], dcTabs: Array[Huff],
                         acTabs: Array[Huff], width: Int, height: Int,
                         restartInterval: Int): (Array[Int], Int) = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val lumaComp = comps(0) // component order in SOF: Y first per JFIF
    // full-res placement below assumes Y carries the max sampling factors
    // (true of every JFIF subsampling scheme: 4:4:4, 4:2:2, 4:2:0)
    require(lumaComp.h == hMax && lumaComp.v == vMax,
      "luma must carry the max sampling factors")
    comps.foreach { c =>
      require(quant(c.tq) != null, s"missing quant table ${c.tq}")
      require(dcTabs(c.dcTab) != null && acTabs(c.acTab) != null,
        s"missing huffman tables ${c.dcTab}/${c.acTab}")
    }
    val luma = new Array[Int](width * height)
    val coef = new Array[Double](64)
    val block = new Array[Int](64)
    val r = new BitReader(p, start)
    var rstCount = 0
    var mcusSinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusSinceRestart == restartInterval) {
          r.restart(rstCount & 7)
          rstCount += 1
          mcusSinceRestart = 0
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = quant(c.tq)
          val dcH = dcTabs(c.dcTab); val acH = acTabs(c.acTab)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // ---- one 8×8 block: DC then 63 AC, zigzag run-length ----
              java.util.Arrays.fill(coef, 0.0)
              val t = r.decode(dcH)
              require(t <= 11, "DC category out of range")
              c.pred += extend(r.bits(t), t)
              coef(0) = c.pred.toDouble * q(0)
              var k = 1
              while (k < 64) {
                val rs = r.decode(acH)
                val run = rs >> 4; val size = rs & 0x0f
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += run
                  require(k < 64, "AC run past block end")
                  coef(ZigZag(k)) = extend(r.bits(size), size).toDouble * q(ZigZag(k))
                  k += 1
                }
              }
              if (c eq lumaComp) {
                idct8x8(coef, block)
                // place into the full-res luma plane (clip at edges)
                val x0 = (mx * c.h + bx) * 8
                val y0 = (my * c.v + by) * 8
                var yy = 0
                while (yy < 8) {
                  val py = y0 + yy
                  if (py < height) {
                    var xx = 0
                    while (xx < 8) {
                      val px = x0 + xx
                      if (px < width) luma(py * width + px) = block(yy * 8 + xx)
                      xx += 1
                    }
                  }
                  yy += 1
                }
              } // chroma: entropy-decoded above (stream position advanced), IDCT skipped
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcusSinceRestart += 1
        mx += 1
      }
      my += 1
    }
    (luma, r.pos)
  }
}
