package graft.kernel

/** From-scratch JPEG (JFIF/ITU-T T.81) decoder — no codec library, same
  * per-spec discipline as [[Media.decodePng]]. Retires the last real
  * multimodal stub: a web crawl's image column is overwhelmingly JPEG
  * (the reference's raster path rasterizes PDFs to exactly this kind of
  * image before OCR, `/root/reference/app/services/vision_service.py`).
  *
  * Supported — the web-JPEG envelope:
  *  - SOF0 (baseline sequential DCT, 8-bit), 1 or 3 components,
  *    sampling factors 1–2 in each axis (4:4:4, 4:2:2, 4:2:0);
  *  - SOF2 (progressive DCT): spectral selection + successive
  *    approximation per T.81 Annex G — DC first/refinement scans
  *    (interleaved or single-component), AC first/refinement band scans
  *    with EOB runs and correction bits;
  *  - DQT 8-bit tables, DHT DC/AC canonical Huffman tables (the spec's
  *    DECODE procedure over BITS/HUFFVAL), DRI restart intervals with
  *    FFD0–FFD7 markers (bit-buffer flush + DC predictor/EOB-run reset);
  *  - entropy-coded data with FF00 byte stuffing.
  *
  * Rejected explicitly (never mis-decoded): lossless/hierarchical SOF
  * types, 16-bit quant tables, arithmetic coding.
  *
  * Output is the LUMINANCE plane only (that is what the feature kernel
  * consumes): Y blocks are dequantized + IDCT'd. In baseline scans chroma
  * blocks are entropy-decoded — the interleaved bitstream cannot be
  * advanced otherwise — but their IDCT is skipped; in progressive mode
  * whole chroma-only scans are skipped outright (each scan's entropy data
  * self-terminates at the next marker). JPEG's Y channel IS BT.601 luma,
  * so this matches the other decoders' grey output exactly.
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
    var progressive = false
    // progressive state: luma coefficients (zigzag order per block) over
    // the MCU-padded block grid, accumulated across scans
    var lumaCoefs: Array[Int] = null
    var lumaBlocksW = 0; var lumaBlocksH = 0
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
        case m if m == 0xc0 || m == 0xc2 => // SOF0 baseline / SOF2 progressive
          progressive = m == 0xc2
          val len = segLen(pos)
          require((p(pos + 2) & 0xff) == 8, "only 8-bit precision supported")
          height = be16(p, pos + 3); width = be16(p, pos + 5)
          val nc = p(pos + 7) & 0xff
          require(nc == 1 || nc == 3, s"$nc components unsupported (1 or 3)")
          // progressive holds the full luma coefficient grid in memory —
          // a tighter dims cap bounds that footprint
          val maxPx = if (progressive) 16L << 20 else 64L << 20
          require(width > 0 && height > 0 && width.toLong * height <= maxPx,
            s"implausible dims ${width}x$height")
          require(len == 8 + 3 * nc, "bad SOF length")
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val c = Comp(p(o) & 0xff, (p(o + 1) & 0xff) >> 4, p(o + 1) & 0x0f, p(o + 2) & 0xff)
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2 && c.tq < 4,
              s"sampling ${c.h}x${c.v} or quant ${c.tq} unsupported")
            c
          }
          require(comps(0).h == comps.map(_.h).max && comps(0).v == comps.map(_.v).max,
            "luma must carry the max sampling factors")
          pos += len
        case m if m == 0xc1 || m == 0xc3 ||
          (m >= 0xc5 && m <= 0xc7) || (m >= 0xc9 && m <= 0xcf && m != 0xcc) =>
          throw new IllegalArgumentException(
            f"non-baseline SOF 0x$m%02x unsupported (lossless/arithmetic)")
        case 0xdd => // DRI
          val len = segLen(pos)
          require(len == 4, "bad DRI")
          restartInterval = be16(p, pos + 2)
          pos += len
        case 0xda => // SOS
          require(comps != null, "SOS before SOF")
          val len = segLen(pos)
          val ns = p(pos + 2) & 0xff
          require(ns >= 1 && ns <= comps.length && len == 6 + 2 * ns, "bad SOS header")
          val scanComps = Array.tabulate(ns) { i =>
            val cs = p(pos + 3 + 2 * i) & 0xff
            val c = comps.find(_.id == cs).getOrElse(
              throw new IllegalArgumentException(s"scan references unknown component $cs"))
            c.dcTab = (p(pos + 4 + 2 * i) & 0xff) >> 4
            c.acTab = p(pos + 4 + 2 * i) & 0x0f
            c
          }
          val ss = p(pos + 3 + 2 * ns) & 0xff
          val se = p(pos + 4 + 2 * ns) & 0xff
          val ah = (p(pos + 5 + 2 * ns) & 0xff) >> 4
          val al = p(pos + 5 + 2 * ns) & 0x0f
          pos += len
          if (!progressive) {
            require(ns == comps.length, "partial scans unsupported (baseline)")
            luma = decodeScan(p, pos, comps, quant, dcTabs, acTabs,
              width, height, restartInterval) match {
              case (plane, endPos) => pos = endPos; plane
            }
          } else {
            if (lumaCoefs == null) {
              val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
              lumaBlocksW = ((width + 8 * hMax - 1) / (8 * hMax)) * comps(0).h
              lumaBlocksH = ((height + 8 * vMax - 1) / (8 * vMax)) * comps(0).v
              lumaCoefs = new Array[Int](lumaBlocksW * lumaBlocksH * 64)
            }
            pos = progressiveScan(p, pos, scanComps, comps, dcTabs, acTabs,
              lumaCoefs, lumaBlocksW, width, height, ss, se, ah, al,
              restartInterval)
          }
        case m if m >= 0xd0 && m <= 0xd7 =>
          throw new IllegalArgumentException("RST marker outside scan")
        case 0x01 => () // TEM, standalone
        case _ => // APPn, COM, everything else with a length
          pos += segLen(pos)
      }
    }
    if (luma == null && lumaCoefs != null) {
      // progressive: all scans accumulated — dequantize + IDCT once
      require(quant(comps(0).tq) != null, "missing luma quant table")
      luma = reconstructLuma(lumaCoefs, lumaBlocksW, width, height, quant(comps(0).tq))
    }
    require(luma != null, "no scan data")
    Media.Decoded("jpeg", width, height, 0, 1, luma, 255)
  }

  // ------------------------------------------------- progressive (SOF2)

  /** Skip a scan whose components carry no luma: entropy data
    * self-terminates at the next non-RST marker (FF00 stuffing and
    * FFD0–D7 restarts belong to the scan).
    */
  private def skipToMarker(p: Array[Byte], start: Int): Int = {
    var i = start
    while (i + 1 < p.length) {
      if ((p(i) & 0xff) == 0xff) {
        val m = p(i + 1) & 0xff
        if (m != 0x00 && !(m >= 0xd0 && m <= 0xd7)) return i
        i += 2
      } else i += 1
    }
    throw new IllegalArgumentException("unterminated scan")
  }

  /** AC first scan (Ah=0) for one block's band; returns the remaining
    * EOB run (T.81 G.1.2.2).
    */
  private def acFirst(r: BitReader, acH: Huff, coefs: Array[Int], base: Int,
                      ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    if (eobrunIn > 0) return eobrunIn - 1 // whole band zero in this block
    var k = ss
    while (k <= se) {
      val rs = r.decode(acH)
      val run = rs >> 4; val s = rs & 0x0f
      if (s == 0) {
        if (run == 15) k += 16 // ZRL
        else return (1 << run) - 1 + (if (run > 0) r.bits(run) else 0)
      } else {
        k += run
        require(k <= se, "AC run past band end")
        coefs(base + k) = extend(r.bits(s), s) << al
        k += 1
      }
    }
    0
  }

  /** AC refinement scan (Ah=Al+1 → Al) for one block's band; returns the
    * remaining EOB run (T.81 G.1.2.3): newly-significant coefficients
    * arrive as ±2^Al with zero-history run lengths; every
    * previously-nonzero coefficient passed on the way contributes one
    * correction bit.
    */
  private def acRefine(r: BitReader, acH: Huff, coefs: Array[Int], base: Int,
                       ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    val p1 = 1 << al
    def correct(idx: Int): Unit =
      if (r.bit() == 1 && (math.abs(coefs(idx)) & p1) == 0)
        coefs(idx) += (if (coefs(idx) >= 0) p1 else -p1)
    var k = ss
    def sweep(): Unit = while (k <= se) { if (coefs(base + k) != 0) correct(base + k); k += 1 }
    if (eobrunIn > 0) { sweep(); return eobrunIn - 1 }
    var eobrun = 0
    while (k <= se && eobrun == 0) {
      val rs = r.decode(acH)
      var run = rs >> 4
      val s = rs & 0x0f
      var newVal = 0
      if (s == 0) {
        if (run < 15) {
          eobrun = (1 << run) - 1 + (if (run > 0) r.bits(run) else 0) + 1
          // +1 marks "EOB read" — the current block's sweep happens below,
          // and eobrun-1 future blocks remain
        }
        // run == 15 (ZRL): skip 15 zero-history coefficients and stop
        // right AFTER the 16th — correction bits past it belong to the
        // NEXT symbol (T.81 G.1.2.3; the libjpeg --r<0 break)
      } else {
        require(s == 1, "refinement scan with size > 1")
        newVal = if (r.bit() == 1) p1 else -p1
      }
      if (eobrun == 0) {
        // advance to the (run+1)-th zero-history coefficient, correcting
        // nonzero-history ones along the way; place newVal there (s==1)
        var stop = false
        while (k <= se && !stop) {
          val idx = base + k
          if (coefs(idx) != 0) { correct(idx); k += 1 }
          else if (run > 0) { run -= 1; k += 1 }
          else stop = true
        }
        if (k <= se) {
          if (newVal != 0) coefs(base + k) = newVal
          k += 1 // move past the target zero-history coefficient
        }
      }
    }
    if (eobrun > 0) { sweep(); eobrun - 1 } else 0
  }

  /** One progressive scan (any of the four kinds). Chroma-only scans are
    * skipped wholesale; scans containing luma are fully entropy-decoded
    * (interleaved DC scans decode chroma DC diffs too — predictors must
    * advance — but only luma coefficients are stored).
    */
  private def progressiveScan(p: Array[Byte], start: Int,
                              scanComps: Array[Comp], comps: Array[Comp],
                              dcTabs: Array[Huff], acTabs: Array[Huff],
                              lumaCoefs: Array[Int], lumaBlocksW: Int,
                              width: Int, height: Int,
                              ss: Int, se: Int, ah: Int, al: Int,
                              restartInterval: Int): Int = {
    require(ss <= se && se <= 63 && al <= 13, "bad spectral/approximation params")
    require(ss > 0 || se == 0, "a DC scan must have Se=0 (progressive)")
    val lumaComp = comps(0)
    if (!scanComps.exists(_ eq lumaComp)) return skipToMarker(p, start)
    // fail descriptively (not NPE) when the scan references undefined DHTs
    scanComps.foreach { c =>
      if (ss == 0 && ah == 0)
        require(dcTabs(c.dcTab) != null, s"missing DC huffman table ${c.dcTab}")
      if (ss > 0)
        require(acTabs(c.acTab) != null, s"missing AC huffman table ${c.acTab}")
    }
    val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
    val r = new BitReader(p, start)
    var eobrun = 0
    var rstCount = 0
    var sinceRst = 0
    def restartCheck(): Unit =
      if (restartInterval > 0 && sinceRst == restartInterval) {
        r.restart(rstCount & 7)
        rstCount += 1; sinceRst = 0; eobrun = 0
        scanComps.foreach(_.pred = 0)
      }
    scanComps.foreach(_.pred = 0)

    if (ss == 0 && scanComps.length > 1) {
      // interleaved DC scan (first or refinement), MCU walk
      require(se == 0, "interleaved AC scan is not allowed (progressive)")
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          restartCheck()
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            val isLuma = c eq lumaComp
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                val base = ((my * c.v + by) * lumaBlocksW + (mx * c.h + bx)) * 64
                if (ah == 0) {
                  val t = r.decode(dcTabs(c.dcTab))
                  require(t <= 11, "DC category out of range")
                  c.pred += extend(r.bits(t), t)
                  if (isLuma) lumaCoefs(base) = c.pred << al
                } else if (r.bit() == 1 && isLuma) lumaCoefs(base) |= 1 << al
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          sinceRst += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // single-component scan over the component's own block grid; only
      // luma reaches here (chroma-only scans were skipped above)
      require(scanComps.length == 1, "AC scans must be single-component")
      val c = scanComps(0)
      val bw = (width * c.h / hMax + 7) / 8
      val bh = (height * c.v / vMax + 7) / 8
      val dcH = if (ss == 0 && ah == 0) dcTabs(c.dcTab) else null
      val acH = if (ss > 0) acTabs(c.acTab) else null
      if (ss > 0) require(acH != null, s"missing AC table ${c.acTab}")
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          restartCheck()
          val base = (by * lumaBlocksW + bx) * 64
          if (ss == 0) {
            if (ah == 0) {
              val t = r.decode(dcH)
              require(t <= 11, "DC category out of range")
              c.pred += extend(r.bits(t), t)
              lumaCoefs(base) = c.pred << al
            } else if (r.bit() == 1) lumaCoefs(base) |= 1 << al
          } else if (ah == 0)
            eobrun = acFirst(r, acH, lumaCoefs, base, ss, se, al, eobrun)
          else
            eobrun = acRefine(r, acH, lumaCoefs, base, ss, se, al, eobrun)
          sinceRst += 1
          bx += 1
        }
        by += 1
      }
    }
    r.pos
  }

  /** Dequantize + IDCT the accumulated luma coefficient grid into the
    * full-resolution plane (edge blocks clipped).
    */
  private def reconstructLuma(lumaCoefs: Array[Int], lumaBlocksW: Int,
                              width: Int, height: Int,
                              q: Array[Int]): Array[Int] = {
    val luma = new Array[Int](width * height)
    val coef = new Array[Double](64)
    val block = new Array[Int](64)
    val bw = (width + 7) / 8; val bh = (height + 7) / 8
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val base = (by * lumaBlocksW + bx) * 64
        var k = 0
        while (k < 64) {
          coef(ZigZag(k)) = lumaCoefs(base + k).toDouble * q(ZigZag(k))
          k += 1
        }
        idct8x8(coef, block)
        val x0 = bx * 8; val y0 = by * 8
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
        bx += 1
      }
      by += 1
    }
    luma
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
