package graft.kernel

/** CCITT Group 4 (ITU-T T.6, "MMR") two-dimensional fax codec — the
  * compression virtually every scanned-document PDF and TIFF carries
  * (`/Filter /CCITTFaxDecode` with `/K < 0`). Implemented from scratch:
  * the T.4 modified-Huffman run-length tables (terminating + make-up +
  * extended make-up codes) and the T.6 vertical/horizontal/pass coding
  * modes over a reference line, both DECODE and ENCODE directions —
  * the encoder is the fixture writer AND the differential handle
  * (MediaSpec round-trips both directions against the JDK's own TIFF
  * T.6 codec, which validates every table entry for real, not just
  * self-consistency).
  *
  * Pixels are `Array[Byte]` of 0 = white, 1 = black, row-major
  * (`columns * rows`). `blackIs1` mirrors the PDF/TIFF DecodeParms
  * flag (default false: 0 bits are BLACK in the encoded stream's
  * photometric convention — handled by the caller via inversion; this
  * codec works in white=0 space).
  */
object Ccitt {

  final class CcittError(msg: String) extends RuntimeException(msg)

  // ----------------------------------------------- T.4 run-length codes
  // (runLength, bitLength, bits) — bits right-aligned in an Int
  private def parse(spec: String): Vector[(Int, Int, Int)] =
    spec.trim.split("\\s+").grouped(2).map { case Array(n, code) =>
      (n.toInt, code.length, Integer.parseInt(code, 2))
    }.toVector

  private val whiteCodes: Vector[(Int, Int, Int)] = parse("""
    0 00110101  1 000111    2 0111      3 1000      4 1011
    5 1100      6 1110      7 1111      8 10011     9 10100
    10 00111    11 01000    12 001000   13 000011   14 110100
    15 110101   16 101010   17 101011   18 0100111  19 0001100
    20 0001000  21 0010111  22 0000011  23 0000100  24 0101000
    25 0101011  26 0010011  27 0100100  28 0011000  29 00000010
    30 00000011 31 00011010 32 00011011 33 00010010 34 00010011
    35 00010100 36 00010101 37 00010110 38 00010111 39 00101000
    40 00101001 41 00101010 42 00101011 43 00101100 44 00101101
    45 00000100 46 00000101 47 00001010 48 00001011 49 01010010
    50 01010011 51 01010100 52 01010101 53 00100100 54 00100101
    55 01011000 56 01011001 57 01011010 58 01011011 59 01001010
    60 01001011 61 00110010 62 00110011 63 00110100
    64 11011     128 10010     192 010111    256 0110111
    320 00110110 384 00110111  448 01100100  512 01100101
    576 01101000 640 01100111  704 011001100 768 011001101
    832 011010010 896 011010011 960 011010100 1024 011010101
    1088 011010110 1152 011010111 1216 011011000 1280 011011001
    1344 011011010 1408 011011011 1472 010011000 1536 010011001
    1600 010011010 1664 011000   1728 010011011""")

  private val blackCodes: Vector[(Int, Int, Int)] = parse("""
    0 0000110111  1 010         2 11          3 10          4 011
    5 0011        6 0010        7 00011       8 000101      9 000100
    10 0000100    11 0000101    12 0000111    13 00000100   14 00000111
    15 000011000  16 0000010111 17 0000011000 18 0000001000
    19 00001100111 20 00001101000 21 00001101100 22 00000110111
    23 00000101000 24 00000010111 25 00000011000
    26 000011001010 27 000011001011 28 000011001100 29 000011001101
    30 000001101000 31 000001101001 32 000001101010 33 000001101011
    34 000011010010 35 000011010011 36 000011010100 37 000011010101
    38 000011010110 39 000011010111 40 000001101100 41 000001101101
    42 000011011010 43 000011011011 44 000001010100 45 000001010101
    46 000001010110 47 000001010111 48 000001100100 49 000001100101
    50 000001010010 51 000001010011 52 000000100100 53 000000110111
    54 000000111000 55 000000100111 56 000000101000 57 000001011000
    58 000001011001 59 000000101011 60 000000101100 61 000001011010
    62 000001100110 63 000001100111
    64 0000001111   128 000011001000 192 000011001001 256 000001011011
    320 000000110011 384 000000110100 448 000000110101
    512 0000001101100 576 0000001101101 640 0000001001010
    704 0000001001011 768 0000001001100 832 0000001001101
    896 0000001110010 960 0000001110011 1024 0000001110100
    1088 0000001110101 1152 0000001110110 1216 0000001110111
    1280 0000001010010 1344 0000001010011 1408 0000001010100
    1472 0000001010101 1536 0000001011010 1600 0000001011011
    1664 0000001100100 1728 0000001100101""")

  /** T.4 §2 extended make-up codes, shared by both colors. */
  private val extCodes: Vector[(Int, Int, Int)] = parse("""
    1792 00000001000 1856 00000001100 1920 00000001101
    1984 000000010010 2048 000000010011 2112 000000010100
    2176 000000010101 2240 000000010110 2304 000000010111
    2368 000000011100 2432 000000011101 2496 000000011110
    2560 000000011111""")

  // decode maps: (bitLen, bits) -> run
  private def decodeMap(v: Vector[(Int, Int, Int)]): Map[(Int, Int), Int] =
    v.map { case (run, len, bits) => (len, bits) -> run }.toMap
  private val whiteDecode = decodeMap(whiteCodes ++ extCodes)
  private val blackDecode = decodeMap(blackCodes ++ extCodes)
  // encode maps: run -> (bitLen, bits)
  private def encodeMap(v: Vector[(Int, Int, Int)]): Map[Int, (Int, Int)] =
    v.map { case (run, len, bits) => run -> ((len, bits)) }.toMap
  private val whiteEncode = encodeMap(whiteCodes ++ extCodes)
  private val blackEncode = encodeMap(blackCodes ++ extCodes)

  // --------------------------------------------------------- bit streams
  private final class BitReader(data: Array[Byte]) {
    var pos = 0 // bit position
    def atEnd: Boolean = pos >= data.length * 8
    def bit(): Int = {
      if (atEnd) throw new CcittError("bit stream exhausted")
      val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream(1024)
    private var acc = 0
    private var nAcc = 0
    def put(len: Int, bits: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1)
        nAcc += 1
        if (nAcc == 8) { out.write(acc); acc = 0; nAcc = 0 }
        i -= 1
      }
    }
    def bytes: Array[Byte] = {
      if (nAcc > 0) { out.write(acc << (8 - nAcc)); acc = 0; nAcc = 0 }
      out.toByteArray
    }
  }

  /** One complete run length: make-up codes (≥64, repeated for runs
    * over 2560) accumulate until a terminating code (<64) closes the
    * run.
    */
  private def readRun(r: BitReader, white: Boolean): Int = {
    val m = if (white) whiteDecode else blackDecode
    var total = 0
    var terminated = false
    while (!terminated) {
      var len = 0
      var bits = 0
      var run = -1
      while (run < 0) {
        bits = (bits << 1) | r.bit()
        len += 1
        if (len > 13) throw new CcittError("invalid run-length code")
        run = m.getOrElse((len, bits), -1)
      }
      total += run
      // make-up codes are multiples of 64 and ≥ 64; terminating < 64
      terminated = run < 64
    }
    total
  }

  /** T.4 grammar: runs ≥ 2624 lead with repeated 2560 extended
    * make-ups, then ONE make-up (≥64) + ONE terminating code — strict
    * decoders (the JDK's included) reject other make-up chains.
    */
  private def writeRun(w: BitWriter, white: Boolean, run0: Int): Unit = {
    val m = if (white) whiteEncode else blackEncode
    var run = run0
    while (run >= 2624) {
      val (len, bits) = m(2560)
      w.put(len, bits)
      run -= 2560
    }
    if (run >= 64) {
      val (len, bits) = m((run / 64) * 64)
      w.put(len, bits)
      run %= 64
    }
    val (len, bits) = m(run)
    w.put(len, bits)
  }

  /** Changing elements of a row: positions where color differs from the
    * previous pixel (position 0 counts when row(0) is black). Returned
    * ascending, terminated by two `columns` sentinels.
    */
  private def changes(row: Array[Byte], off: Int, columns: Int): Array[Int] = {
    val out = new Array[Int](columns + 2)
    var n = 0
    var prev: Byte = 0 // imaginary white pixel before the row
    var x = 0
    while (x < columns) {
      val c = row(off + x)
      if (c != prev) { out(n) = x; n += 1; prev = c }
      x += 1
    }
    out(n) = columns; out(n + 1) = columns
    java.util.Arrays.copyOf(out, n + 2)
  }

  /** Decode a G4 (T.6) stream into `columns * rows` pixels (0 = white,
    * 1 = black). Strict: malformed codes throw [[CcittError]].
    */
  def decodeG4(data: Array[Byte], columns: Int, rows: Int): Array[Byte] = {
    require(columns > 0 && rows > 0 && columns.toLong * rows < (1L << 28),
      s"implausible dimensions ${columns}x$rows")
    val px = new Array[Byte](columns * rows)
    val r = new BitReader(data)
    var ref = Array(columns, columns) // imaginary all-white reference line
    var y = 0
    while (y < rows) {
      val off = y * columns
      var a0 = -1
      var color: Byte = 0
      while (a0 < columns) {
        // b1: first ref change > a0 with color opposite to `color`
        // (changes alternate black,white,black,... starting black)
        var bi = 0
        while (ref(bi) <= (if (a0 < 0) -1 else a0)) bi += 1
        // ref changes at even indices flip to black, odd to white;
        // we need a change TO !color: to black when color==0
        if ((bi % 2 == 0) != (color == 0)) bi += 1
        val b1 = if (bi < ref.length) ref(bi) else columns
        val b2 = if (bi + 1 < ref.length) ref(bi + 1) else columns
        // mode decode
        if (r.bit() == 1) {
          // V0
          fill(px, off, a0, b1, color)
          a0 = b1; color = (1 - color).toByte
        } else if (r.bit() == 1) {
          // 01x: VL1(010) / VR1(011)
          val a1 = if (r.bit() == 1) b1 + 1 else b1 - 1
          fill(px, off, a0, a1, color)
          a0 = a1; color = (1 - color).toByte
        } else if (r.bit() == 1) {
          // 001: horizontal — two runs from a0 (current color first)
          val start = if (a0 < 0) 0 else a0
          val r1 = readRun(r, color == 0)
          val r2 = readRun(r, color != 0)
          fill(px, off, a0, start + r1, color)
          fill(px, off, start + r1, start + r1 + r2, (1 - color).toByte)
          a0 = start + r1 + r2 // color unchanged
        } else if (r.bit() == 1) {
          // 0001: pass — fill to b2, a0 = b2, color unchanged
          fill(px, off, a0, b2, color)
          a0 = b2
        } else {
          // 00001x / 000001x: VR2/VL2, VR3/VL3 (or EOFB/garbage)
          val a1 =
            if (r.bit() == 1) { if (r.bit() == 1) b1 + 2 else b1 - 2 }
            else if (r.bit() == 1) { if (r.bit() == 1) b1 + 3 else b1 - 3 }
            else throw new CcittError(s"bad mode code at row $y")
          fill(px, off, a0, a1, color)
          a0 = a1; color = (1 - color).toByte
        }
        if (a0 > columns) throw new CcittError(s"row $y overruns width")
      }
      ref = changes(px, off, columns)
      y += 1
    }
    px
  }

  private def fill(px: Array[Byte], off: Int, a0: Int, a1: Int, color: Byte): Unit = {
    if (color != 0) {
      var x = math.max(0, a0)
      while (x < a1) { px(off + x) = 1; x += 1 }
    }
  }

  /** Encode pixels as a G4 (T.6) stream (no EOFB — PDF/TIFF strips can
    * omit it and both our decoder and the JDK's accept that).
    */
  def encodeG4(px: Array[Byte], columns: Int, rows: Int): Array[Byte] = {
    require(px.length == columns * rows, "pixel buffer size mismatch")
    val w = new BitWriter
    var ref = Array(columns, columns)
    var y = 0
    while (y < rows) {
      val off = y * columns
      val cur = changes(px, off, columns)
      var a0 = -1
      var color: Byte = 0
      var ci = 0 // index into cur of the next change > a0
      while (a0 < columns) {
        while (cur(ci) <= (if (a0 < 0) -1 else a0)) ci += 1
        val a1 = cur(ci)
        var bi = 0
        while (ref(bi) <= (if (a0 < 0) -1 else a0)) bi += 1
        if ((bi % 2 == 0) != (color == 0)) bi += 1
        val b1 = if (bi < ref.length) ref(bi) else columns
        val b2 = if (bi + 1 < ref.length) ref(bi + 1) else columns
        if (b2 < a1) {
          w.put(4, 1) // pass: 0001
          a0 = b2
        } else if (math.abs(a1 - b1) <= 3) {
          (a1 - b1) match {
            case 0  => w.put(1, 1)          // V0: 1
            case 1  => w.put(3, 3)          // VR1: 011
            case -1 => w.put(3, 2)          // VL1: 010
            case 2  => w.put(6, 3)          // VR2: 000011
            case -2 => w.put(6, 2)          // VL2: 000010
            case 3  => w.put(7, 3)          // VR3: 0000011
            case _  => w.put(7, 2)          // VL3: 0000010
          }
          a0 = a1; color = (1 - color).toByte
        } else {
          // horizontal: 001 + run(color) + run(!color)
          w.put(3, 1)
          val start = if (a0 < 0) 0 else a0
          val a2 = if (ci + 1 < cur.length) cur(ci + 1) else columns
          writeRun(w, color == 0, a1 - start)
          writeRun(w, color != 0, a2 - a1)
          a0 = a2 // color unchanged
        }
      }
      ref = cur
      y += 1
    }
    w.bytes
  }
}
