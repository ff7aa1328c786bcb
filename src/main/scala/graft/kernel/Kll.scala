package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** KLL quantile sketch (Karnin, Lang, Liberty, "Optimal Quantile
  * Approximation in Streams", FOCS 2016) over doubles — the MERGEABLE
  * rank/quantile summary a 100 TB corpus keeps at rest: per-batch
  * sketches of (say) document length are a few KB each, merge
  * associatively, and answer any quantile within ~O(1/k) normalized
  * rank error without ever rescanning the corpus. Complements the
  * exact q40 percentiles (one-shot, full scan) and the HLL distinct
  * sketch (pipe21).
  *
  * Structure: a hierarchy of buffers ("compactors"); level i items
  * carry weight 2^i. Inserts land in level 0; when total size exceeds
  * the capacity budget, the lowest over-full level sorts itself and
  * promotes every other item (odd/even chosen by a DETERMINISTIC
  * xorshift bit — same insertion sequence, same sketch bytes, the
  * repo-wide reproducibility rule; the rank-error guarantee needs the
  * choice to be unbiased across compactions, not unpredictable).
  * Level capacities shrink geometrically (`c = 2/3`) from the top, the
  * classic KLL schedule.
  *
  * Serialization is a flat length-prefixed array (version byte, k, n,
  * rng state, per-level counts + values) — stable bytes for an at-rest
  * sketch table.
  */
final class Kll private (val k: Int) extends Serializable {
  import Kll._

  private[kernel] var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  private[kernel] var count: Long = 0L
  private[kernel] var rng: Long = 0x9e3779b97f4a7c15L ^ k.toLong

  private def nextBit(): Boolean = {
    // xorshift64*: deterministic, cheap, unbiased enough for the
    // odd/even compaction choice
    rng ^= rng >>> 12; rng ^= rng << 25; rng ^= rng >>> 27
    (rng * 0x2545f4914f6cdd1dL >>> 63) == 1L
  }

  private def capacity(level: Int, numLevels: Int): Int = {
    // top level gets k, each level below shrinks by c = 2/3, floor 8
    val depth = numLevels - 1 - level
    math.max(MinWidth, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)
  }

  private def totalSize: Int = {
    var s = 0; var i = 0
    while (i < levels.length) { s += levels(i).length; i += 1 }
    s
  }
  private def totalCapacity: Int =
    (0 until levels.length).map(capacity(_, levels.length)).sum

  def update(v: Double): Unit = {
    require(!v.isNaN, "KLL does not accept NaN")
    levels(0) += v
    count += 1
    if (totalSize > totalCapacity) compress()
  }

  private def compress(): Unit = {
    var guard = 0
    while (totalSize > totalCapacity && guard < 64) {
      guard += 1
      // lowest level over its own capacity compacts into the next
      var lv = 0
      while (lv < levels.length &&
        levels(lv).length <= capacity(lv, levels.length)) lv += 1
      if (lv >= levels.length) return
      val sorted = levels(lv).sortInPlace()
      if (lv + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
      // compact an EVEN count: every other item of it promotes at double
      // weight (evenCount·w == evenCount/2·2w — total weight conserved
      // EXACTLY, so rank/quantile denominators always equal n); an odd
      // leftover stays at this level uncompacted
      val m = sorted.length
      val odd = m % 2 == 1
      // unpaired leftover alternates ends (a fixed end would bias the
      // extreme quantiles over many compactions)
      val keepFront = odd && nextBit()
      val start = if (keepFront) 1 else 0
      val endEx = if (odd && !keepFront) m - 1 else m
      val offset = if (nextBit()) 1 else 0
      val up = levels(lv + 1)
      var i = start + offset
      while (i < endEx) { up += sorted(i); i += 2 }
      val kept = ArrayBuffer.empty[Double]
      if (odd) kept += (if (keepFront) sorted(0) else sorted(m - 1))
      levels(lv) = kept
    }
  }

  /** Merge `other` into this sketch (level-wise concat, then compress).
    * Associative up to the deterministic compaction choices; the error
    * guarantee composes per the paper.
    */
  def merge(other: Kll): this.type = {
    require(other.k == k, s"cannot merge KLL(k=${other.k}) into KLL(k=$k)")
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < other.levels.length) { levels(i) ++= other.levels(i); i += 1 }
    count += other.count
    rng ^= java.lang.Long.rotateLeft(other.rng, 17)
    if (totalSize > totalCapacity) compress()
    this
  }

  def n: Long = count
  def isEmpty: Boolean = count == 0L

  /** All (value, weight) pairs, unsorted. */
  private def weighted(): Array[(Double, Long)] = {
    val out = Array.newBuilder[(Double, Long)]
    var lv = 0
    while (lv < levels.length) {
      val w = 1L << lv
      levels(lv).foreach(v => out += ((v, w)))
      lv += 1
    }
    out.result()
  }

  /** Estimated value at normalized rank `q` in [0,1]. */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile rank must be in [0,1], got $q")
    require(count > 0, "empty sketch")
    val items = weighted().sortBy(_._1)
    val totalW = items.map(_._2).sum
    // epsilon guard: 0.14 * 150 is 21.000000000000004 in binary — a bare
    // ceil would skip past the exact order statistic
    val target = math.max(1L, math.ceil(q * totalW - 1e-9).toLong)
    var acc = 0L
    var i = 0
    while (i < items.length) {
      acc += items(i)._2
      if (acc >= target) return items(i)._1
      i += 1
    }
    items.last._1
  }

  /** Estimated normalized rank of `v` (fraction of items <= v). */
  def rank(v: Double): Double = {
    if (count == 0) return 0.0
    val items = weighted()
    var acc = 0L; var tot = 0L
    items.foreach { case (x, w) => tot += w; if (x <= v) acc += w }
    acc.toDouble / tot
  }

  def toBytes: Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bo)
    o.writeByte(1) // version
    o.writeInt(k)
    o.writeLong(count)
    o.writeLong(rng)
    o.writeInt(levels.length)
    levels.foreach { lv =>
      o.writeInt(lv.length)
      lv.foreach(o.writeDouble)
    }
    o.flush()
    bo.toByteArray
  }
}

object Kll {
  private val MinWidth = 8

  def apply(k: Int = 200): Kll = {
    require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")
    new Kll(k)
  }

  def fromBytes(bytes: Array[Byte]): Kll = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val ver = in.readByte()
    require(ver == 1, s"unknown KLL serialization version $ver")
    val s = new Kll(in.readInt())
    s.count = in.readLong()
    s.rng = in.readLong()
    val nLevels = in.readInt()
    require(nLevels >= 1 && nLevels <= 64, s"implausible level count $nLevels")
    s.levels = ArrayBuffer.tabulate(nLevels) { _ =>
      val m = in.readInt()
      require(m >= 0 && m <= (1 << 24), s"implausible level size $m")
      val b = ArrayBuffer.fill(m)(0.0)
      var i = 0
      while (i < m) { b(i) = in.readDouble(); i += 1 }
      b
    }
    s
  }
}
