package graft.kernel

/** Compression-ratio text signal — DEFLATE(text).size / text.size, the
  * corpus-quality heuristic published with Gopher/MassiveText (Rae et
  * al. 2021 §A.1.1 discuss repetition; Dolma and CCNet-descendant
  * pipelines apply the zlib-ratio form): highly repetitive spam (keyword
  * stuffing, boilerplate loops, template farms) compresses far below
  * natural prose, and machine-generated near-random strings compress
  * above it. One number, language-agnostic, O(n).
  *
  * Uses `java.util.zip.Deflater` (raw deflate, no zlib header, level 6)
  * — the JDK's public zlib binding. Deterministic for a given zlib
  * build; across zlib versions the ratio can move in the 3rd decimal,
  * so downstream thresholds (e.g. keep 0.25 < ratio) must not sit on a
  * knife edge — the tests assert band properties, not golden bytes.
  *
  * A per-thread Deflater is reused via reset(): Deflater holds native
  * window memory, and allocating one per row would churn native heap
  * at 10^12 rows (same discipline as the WARC source's stream
  * hygiene, sources/Warc.scala).
  */
object Compress {

  /** Fixed level: 6 is zlib's default speed/ratio balance; the SIGNAL
    * only needs rank stability, which any mid level provides.
    */
  val Level = 6

  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(Level, true))

  /** Size in bytes of the raw-deflate stream of `bytes`. */
  def deflatedSize(bytes: Array[Byte]): Long = {
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** deflate(utf8(text)) / utf8(text).size, rounded to 4 dp; empty text
    * → 1.0 (nothing to compress, nothing saved — neutral). Tiny inputs
    * can exceed 1.0 (deflate block overhead); that is the honest value
    * and itself a signal (no redundancy at all).
    */
  def ratio(text: String): Double = {
    if (text == null || text.isEmpty) return 1.0
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    math.rint(deflatedSize(raw).toDouble / raw.length * 10000.0) / 10000.0
  }
}
