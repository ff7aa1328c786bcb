package graft.kernel

/** From-scratch FLAC decoder — the lossless audio analog of
  * [[WebP]]/[[Jpeg]]: no codec library, built from the public format
  * spec (RFC 9639). FLAC is an MSB-first bitstream of frames, each
  * holding per-channel subframes predicted by constant/verbatim/fixed/
  * LPC models with Rice-coded residuals, optionally stereo-decorrelated
  * (left-side / right-side / mid-side).
  *
  * Supported: 8/16/24-bit samples, 1–2 channels, all subframe types
  * (LPC any order), both Rice methods incl. escaped raw partitions,
  * wasted bits, all four channel assignments, UTF-8-style coded frame
  * numbers. Output is the mono 16-bit-domain amplitude stream like
  * [[Media.decodeWav]] (multi-channel frames averaged, wider samples
  * scaled down).
  *
  * Malformed input throws (C5): every loop is bounded by declared block
  * sizes and the reader fails on exhaustion, never spins.
  */
object Flac {

  def isFlac(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C'

  /** MSB-first bit reader. */
  private final class Bits(p: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var n = 0
    def bits(k: Int): Int = {
      require(k <= 31, "bit read too wide")
      while (n < k) {
        require(pos < p.length, "truncated FLAC stream")
        acc = (acc << 8) | (p(pos) & 0xffL)
        n += 8; pos += 1
      }
      val v = ((acc >>> (n - k)) & ((1L << k) - 1)).toInt
      n -= k
      v
    }
    def bitsLong(k: Int): Long = {
      require(k <= 36, "bit read too wide")
      var v = 0L
      var left = k
      while (left > 0) { val t = math.min(left, 24); v = (v << t) | bits(t); left -= t }
      v
    }
    def bit(): Int = bits(1)
    /** Unary: count zero bits until the terminating 1. */
    def unary(): Int = {
      var q = 0
      while (bit() == 0) { q += 1; require(q < (1 << 24), "runaway unary") }
      q
    }
    def align(): Unit = { n -= n % 8 } // drop partial byte (frame padding)
    def atFrameBoundaryByte(): Int = pos - n / 8
  }

  private def signExtend(v: Int, bits: Int): Int = (v << (32 - bits)) >> (32 - bits)

  /** Rice/unary residual: zigzagged quotient/remainder. */
  private def riceDecode(r: Bits, k: Int): Int = {
    val q = r.unary()
    val u = if (k == 0) q else (q << k) | r.bits(k)
    (u >>> 1) ^ -(u & 1) // unzigzag
  }

  /** Residual section: partitioned Rice coding (both methods). */
  private def readResidual(r: Bits, blockSize: Int, predOrder: Int,
                           out: Array[Int]): Unit = {
    val method = r.bits(2)
    require(method <= 1, s"reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = r.bits(4)
    val parts = 1 << po
    require(blockSize % parts == 0, "partition count does not divide block size")
    val partLen = blockSize / parts
    require(partLen > predOrder || parts == 1, "predictor order exceeds first partition")
    var i = predOrder
    var part = 0
    while (part < parts) {
      val count = if (part == 0) partLen - predOrder else partLen
      val param = r.bits(paramBits)
      if (param == escape) {
        val raw = r.bits(5)
        var c = 0
        while (c < count) {
          out(i) = if (raw == 0) 0 else signExtend(r.bits(raw), raw)
          i += 1; c += 1
        }
      } else {
        var c = 0
        while (c < count) { out(i) = riceDecode(r, param); i += 1; c += 1 }
      }
      part += 1
    }
  }

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  /** One subframe → `blockSize` samples at `bps` bits. */
  private def readSubframe(r: Bits, blockSize: Int, bps: Int): Array[Int] = {
    require(r.bit() == 0, "subframe padding bit set")
    val typ = r.bits(6)
    var wasted = 0
    if (r.bit() == 1) { wasted = 1 + r.unary() }
    val eff = bps - wasted
    require(eff > 0 && eff <= 32, s"effective sample size $eff invalid")
    val out = new Array[Int](blockSize)
    if (typ == 0) { // constant
      val v = signExtend(r.bits(eff), eff)
      java.util.Arrays.fill(out, v)
    } else if (typ == 1) { // verbatim
      var i = 0
      while (i < blockSize) { out(i) = signExtend(r.bits(eff), eff); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // fixed, order 0-4
      val order = typ & 0x07
      require(order <= blockSize, "fixed order exceeds block")
      var i = 0
      while (i < order) { out(i) = signExtend(r.bits(eff), eff); i += 1 }
      readResidual(r, blockSize, order, out)
      val coefs = FixedCoefs(order)
      i = order
      while (i < blockSize) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = (out(i) + pred).toInt
        i += 1
      }
    } else if ((typ & 0x20) != 0) { // LPC, order = (typ & 0x1f) + 1
      val order = (typ & 0x1f) + 1
      require(order <= blockSize, "LPC order exceeds block")
      var i = 0
      while (i < order) { out(i) = signExtend(r.bits(eff), eff); i += 1 }
      val precision = r.bits(4) + 1
      require(precision <= 15, s"invalid LPC precision $precision")
      val shift = signExtend(r.bits(5), 5)
      require(shift >= 0, "negative LPC shift reserved")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = signExtend(r.bits(precision), precision); i += 1 }
      readResidual(r, blockSize, order, out)
      i = order
      while (i < blockSize) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = (out(i) + (pred >> shift)).toInt
        i += 1
      }
    } else throw new IllegalArgumentException(f"reserved subframe type 0x$typ%02x")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  /** UTF-8-style coded number (frame/sample index, up to 36 bits). */
  private def codedNumber(r: Bits): Long = {
    val b0 = r.bits(8)
    if ((b0 & 0x80) == 0) return b0
    var ones = 0
    var m = b0
    while ((m & 0x80) != 0) { ones += 1; m <<= 1 }
    require(ones >= 2 && ones <= 7, "bad coded number lead byte")
    var v = (b0 & (0x7f >> ones)).toLong
    var i = 1
    while (i < ones) {
      val b = r.bits(8)
      require((b & 0xc0) == 0x80, "bad coded number continuation")
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    v
  }

  def decode(p: Array[Byte]): Media.Decoded = {
    require(isFlac(p), "not a FLAC")
    // ---- metadata blocks ----
    var off = 4
    var sampleRate = 0; var channels = 0; var bps = 0
    var totalSamples = 0L
    var sawStreamInfo = false
    var last = false
    while (!last) {
      require(off + 4 <= p.length, "truncated metadata header")
      val hdr = ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
        ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
      last = (hdr & 0x80000000) != 0
      val typ = (hdr >>> 24) & 0x7f
      val len = hdr & 0xffffff
      require(off + 4 + len <= p.length, "truncated metadata block")
      if (typ == 0) { // STREAMINFO
        require(len == 34, "bad STREAMINFO length")
        val r = new Bits(p, off + 4)
        r.bits(16); r.bits(16) // min/max block size
        r.bits(24); r.bits(24) // min/max frame size
        sampleRate = r.bits(20)
        channels = r.bits(3) + 1
        bps = r.bits(5) + 1
        totalSamples = r.bitsLong(36)
        sawStreamInfo = true
      }
      off += 4 + len
    }
    require(sawStreamInfo, "missing STREAMINFO")
    require(sampleRate > 0, "bad sample rate")
    require(channels >= 1 && channels <= 2, s"$channels channels unsupported (1-2)")
    require(bps == 8 || bps == 16 || bps == 24, s"$bps bits/sample unsupported")
    // amplification bound: a KB-sized crafted stream must not allocate
    // GBs inside an executor, but the bound must not reject spec-valid
    // audio. Constant/silent FLAC frames really do compress ~3000:1 (a
    // CONSTANT subframe covers 65535 samples in tens of bytes), so the
    // per-byte multiplier is 4096×, and the absolute cap is 2^28 samples
    // (a 1 GiB Int buffer — the executor allocation ceiling; ~100 min of
    // 44.1 kHz audio, vs the old 2^26 which cut off at ~25 min). The
    // declared-length check here is the fast-fail; the enforcement that
    // matters is the incremental `decoded + take <= maxOut` in the frame
    // loop, which charges actual decoded output against the same budget.
    val maxOut = math.min(1L << 28, math.max(1L << 16, p.length.toLong * 4096))
    require(totalSamples <= maxOut,
      s"sample count $totalSamples implausible for ${p.length}-byte payload")
    val unknownLength = totalSamples == 0 // spec-legal: live/streamed encodes

    // ---- frames ----
    // output buffer grows INCREMENTALLY as frames actually decode — the
    // declared totalSamples never drives an up-front allocation, so a
    // crafted STREAMINFO claiming 2^28 samples costs nothing unless the
    // payload genuinely decodes that much (and the per-frame budget check
    // below charges every decoded sample against maxOut first)
    var outArr = new Array[Int](
      math.min(if (unknownLength) 4096L else totalSamples, 1L << 16).toInt)
    def ensure(n: Long): Unit = if (n > outArr.length) {
      var c = math.max(outArr.length.toLong * 2, n)
      if (!unknownLength) c = math.min(c, totalSamples)
      c = math.min(c, maxOut)
      outArr = java.util.Arrays.copyOf(outArr, c.toInt)
    }
    var decoded = 0L
    var pos = off
    while ((!unknownLength && decoded < totalSamples) ||
      (unknownLength && pos < p.length)) {
      val r = new Bits(p, pos)
      require(r.bits(14) == 0x3ffe, "lost frame sync")
      r.bit() // reserved
      r.bit() // blocking strategy
      val bsCode = r.bits(4)
      val srCode = r.bits(4)
      val chAsgn = r.bits(4)
      val ssCode = r.bits(3)
      r.bit() // reserved
      codedNumber(r)
      val blockSize = bsCode match {
        case 0 => throw new IllegalArgumentException("reserved block size code")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.bits(8) + 1
        case 7 => r.bits(16) + 1
        case c => 256 << (c - 8)
      }
      srCode match {
        case 12 => r.bits(8)
        case 13 | 14 => r.bits(16)
        case 15 => throw new IllegalArgumentException("invalid sample rate code")
        case _ => ()
      }
      // sample size from code (5 = 20-bit unsupported upstream anyway)
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => throw new IllegalArgumentException("reserved sample size code")
      }
      require(frameBps <= 24, s"$frameBps-bit frames unsupported")
      r.bits(8) // CRC-8 (not validated — C5 cares about bounds, not integrity)
      val take =
        if (unknownLength) blockSize
        else math.min(blockSize.toLong, totalSamples - decoded).toInt
      require(decoded + take <= maxOut, "stream exceeds the amplification bound")

      val samples: Array[Int] =
        if (chAsgn <= 7) { // independent channels
          val nCh = chAsgn + 1
          require(nCh == channels, "channel count mismatch")
          val chans = Array.tabulate(nCh)(_ => readSubframe(r, blockSize, frameBps))
          Array.tabulate(blockSize) { i =>
            var acc = 0
            var c = 0
            while (c < nCh) { acc += chans(c)(i); c += 1 }
            acc / nCh
          }
        } else {
          require(channels == 2, "stereo decorrelation in non-stereo stream")
          val (l, rr) = chAsgn match {
            case 8 => // left-side: side has one extra bit
              val left = readSubframe(r, blockSize, frameBps)
              val side = readSubframe(r, blockSize, frameBps + 1)
              (left, Array.tabulate(blockSize)(i => left(i) - side(i)))
            case 9 => // right-side
              val side = readSubframe(r, blockSize, frameBps + 1)
              val right = readSubframe(r, blockSize, frameBps)
              (Array.tabulate(blockSize)(i => right(i) + side(i)), right)
            case 10 => // mid-side
              val mid = readSubframe(r, blockSize, frameBps)
              val side = readSubframe(r, blockSize, frameBps + 1)
              val left = new Array[Int](blockSize)
              val right = new Array[Int](blockSize)
              var i = 0
              while (i < blockSize) {
                var m = mid(i) << 1
                m |= side(i) & 1 // lost LSB of left+right rides the side parity
                left(i) = (m + side(i)) >> 1
                right(i) = (m - side(i)) >> 1
                i += 1
              }
              (left, right)
            case c => throw new IllegalArgumentException(s"reserved channel assignment $c")
          }
          Array.tabulate(blockSize)(i => (l(i) + rr(i)) / 2)
        }
      r.align()
      r.bits(16) // CRC-16 (not validated)
      pos = r.atFrameBoundaryByte()
      // into the 16-bit domain like decodeWav, directly (no byte detour)
      ensure(decoded + take)
      var i = 0
      while (i < take) {
        val v = (frameBps match {
          case 8 => samples(i) << 8
          case 12 => samples(i) << 4
          case 16 => samples(i)
          case 20 => samples(i) >> 4
          case _ => samples(i) >> 8
        }).toShort.toInt
        outArr(decoded.toInt + i) = v
        i += 1
      }
      decoded += take
    }
    val out =
      if (decoded == outArr.length) outArr
      else java.util.Arrays.copyOf(outArr, decoded.toInt)
    require(out.nonEmpty, "FLAC with no audio frames")
    Media.Decoded("flac", 0, 0, sampleRate, out.length, out, 32768)
  }
}
