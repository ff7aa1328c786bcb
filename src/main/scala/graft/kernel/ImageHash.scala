package graft.kernel

/** Perceptual image hashes over decoded luminance planes — the image
  * analog of SimHash for the multimodal column: a crawl's image set is
  * full of re-encodes (same photo as JPEG q85, JPEG q60, WebP, PNG
  * thumbnail) that exact byte/sha dedup can never connect. A 64-bit
  * perceptual hash maps visually-identical content to nearby hashes, so
  * near-dup image dedup becomes a Hamming join (`Dedup.hammingClusters`)
  * — the LAION/DataComp-style image dedup stage.
  *
  * Two standard constructions (both public-domain folklore, described in
  * e.g. Krawetz's "Kind of Like That" notes and the pHash.org papers):
  *
  *  - dHash (difference hash): box-resample to 9×8, emit one bit per
  *    horizontal neighbor comparison. Invariant to any global monotone
  *    brightness/contrast map (only ORDER of neighbors matters), robust
  *    to re-encode noise, extremely cheap.
  *  - pHash (DCT hash): box-resample to 32×32, 2-D DCT-II, keep the
  *    low-frequency 8×8 block, threshold against the median AC
  *    coefficient. Robust to high-frequency noise and mild rescaling.
  *
  * Determinism contract: resampling is integer box-averaging (exact,
  * order-fixed), the DCT is a fixed-order double-precision loop — the
  * same payload hashes identically on every JVM/partitioning, which the
  * dedup gate requires (hash inequality must mean "different pixels",
  * never "different task order"). All decoders feed the same BT.601
  * integer luma (`Media.luma601`), so the SAME pixels arriving as PNG,
  * BMP or GIF hash identically — cross-format re-encode dedup is exact,
  * not approximate (pinned in ImageHashSpec).
  *
  * Reference scope note: the reference app (aurelienbran/ocr-app-v1)
  * has no image-dedup notion; this is a training-data operator in the
  * SURVEY "beyond the reference" family.
  */
object ImageHash {

  /** Exact integer box-resample of a `w`×`h` luminance plane to
    * `tw`×`th`: each target cell is the rounded mean of its source
    * rectangle `[x*w/tw,(x+1)*w/tw) × [y*h/th,(y+1)*h/th)` (bounds via
    * integer scaling, so cells tile the source exactly; degenerate
    * rectangles — upsampling — fall back to the single nearest row/col).
    */
  def boxResize(samples: Array[Int], w: Int, h: Int,
                tw: Int, th: Int): Array[Int] = {
    require(w > 0 && h > 0 && samples.length >= w * h,
      s"boxResize: bad plane ${samples.length} for ${w}x$h")
    val out = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val y0 = y * h / th
      val y1 = math.max(y0 + 1, (y + 1) * h / th)
      var x = 0
      while (x < tw) {
        val x0 = x * w / tw
        val x1 = math.max(x0 + 1, (x + 1) * w / tw)
        var sum = 0L
        var sy = y0
        while (sy < y1) {
          var sx = x0
          while (sx < x1) { sum += samples(sy * w + sx); sx += 1 }
          sy += 1
        }
        val cnt = (y1 - y0).toLong * (x1 - x0)
        out(y * tw + x) = ((sum + cnt / 2) / cnt).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit difference hash: 9×8 box resample, bit `y*8+x` set when
    * cell (x,y) is strictly brighter than its right neighbor (x+1,y).
    */
  def dHash64(samples: Array[Int], w: Int, h: Int): Long = {
    val g = boxResize(samples, w, h, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) > g(y * 9 + x + 1)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** 64-bit DCT hash: 32×32 box resample → 2-D DCT-II → top-left 8×8
    * coefficient block; bit `v*8+u` set when coefficient (u,v) exceeds
    * the MEDIAN of the block's 63 AC coefficients (DC is excluded from
    * the median and always contributes a 0 bit — its magnitude is just
    * mean brightness, which dHash deliberately ignores too).
    */
  def pHash64(samples: Array[Int], w: Int, h: Int): Long = {
    val n = 32
    val g = boxResize(samples, w, h, n, n)
    // separable DCT-II, fixed evaluation order (rows then columns)
    val cosTab = Array.tabulate(8, n)((k, i) =>
      math.cos((2 * i + 1) * k * math.Pi / (2 * n)))
    // rows: for each of the 32 rows keep only the first 8 frequencies
    val rowF = Array.ofDim[Double](n, 8)
    var y = 0
    while (y < n) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var x = 0
        while (x < n) { acc += g(y * n + x) * cosTab(u)(x); x += 1 }
        rowF(y)(u) = acc
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < n) { acc += rowF(yy)(u) * cosTab(v)(yy); yy += 1 }
        coef(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(ac)
    val median = ac(31) // the median of 63 values is the 32nd in order
    var bits = 0L
    var i = 1
    while (i < 64) {
      if (coef(i) > median) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
