package graft.kernel

/** Pure-Scala text sketching kernels used by the dedup operators
  * (`graft.ops.Dedup`): 64-bit SimHash and a Karp–Rabin rolling hash.
  * Both are published algorithms (Charikar, STOC 2002; Karp & Rabin,
  * IBM JRD 1987) implemented from scratch; deterministic, no wall-clock,
  * no randomness beyond the fixed mixing constants.
  */
object TextStats {

  /** 64-bit avalanche mix (splitmix64 finalizer — public constant set). */
  def mix64(zIn: Long): Long = {
    var z = zIn + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashToken(t: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < t.length) { h = 31 * h + t.charAt(i); i += 1 }
    mix64(h)
  }

  /** Whitespace tokenization, lowercased — the sketching token unit. */
  def tokens(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Charikar SimHash over (hashed) tokens: per bit, sum +1/-1 votes
    * weighted by token frequency 1; sign → bit.
    */
  def simHash64(toks: Iterable[String]): Long = {
    val votes = new Array[Int](64)
    toks.foreach { t =>
      val h = hashToken(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Character spans `(start, end)` of each whitespace-delimited token
    * — the offset-preserving twin of [[tokens]] (which lowercases and
    * drops positions). Needed by span-level dedup, which must CUT the
    * original text, not a normalized copy.
    */
  def tokenSpans(text: String): Array[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    var i = 0
    while (i < text.length) {
      while (i < text.length && Character.isWhitespace(text.charAt(i))) i += 1
      val s = i
      while (i < text.length && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > s) out += ((s, i))
    }
    out.result().toArray
  }

  /** Karp–Rabin hash of every `k`-token window WITH its char span:
    * `(hash, startChar, endChar)` — the same polynomial roll as
    * [[rollingFingerprints]] over [[hashToken]] of the LOWERCASED
    * token, so the two sketches agree on what a window hashes to.
    */
  def windowHashSpans(text: String, k: Int): Array[(Long, Int, Int)] = {
    val spans = tokenSpans(text)
    if (spans.length < k) return Array.empty
    val base = 1000003L
    val hs = spans.map { case (s, e) => hashToken(text.substring(s, e).toLowerCase) }
    var pow = 1L
    var i = 1
    while (i < k) { pow *= base; i += 1 }
    val out = new Array[(Long, Int, Int)](spans.length - k + 1)
    var h = 0L
    i = 0
    while (i < hs.length) {
      if (i < k) h = h * base + hs(i)
      else h = (h - hs(i - k) * pow) * base + hs(i)
      if (i >= k - 1) out(i - k + 1) = (h, spans(i - k + 1)._1, spans(i)._2)
      i += 1
    }
    out
  }

  /** Karp–Rabin rolling-hash fingerprints: polynomial hash of every
    * `window`-token span, rolled in O(1) per step; returns the k smallest
    * distinct fingerprints (a winnowing-style document signature).
    */
  def rollingFingerprints(toks: Array[String], window: Int, k: Int): Array[Long] = {
    if (toks.isEmpty) return Array.empty
    val base = 1000003L
    val hs = toks.map(hashToken)
    val w = math.min(window, hs.length)
    // precompute base^(w-1) for the roll-out term
    var pow = 1L
    var i = 1
    while (i < w) { pow *= base; i += 1 }
    val out = new java.util.TreeSet[java.lang.Long]()
    var h = 0L
    i = 0
    while (i < hs.length) {
      if (i < w) h = h * base + hs(i)
      else h = (h - hs(i - w) * pow) * base + hs(i)
      if (i >= w - 1) {
        out.add(h)
        if (out.size > k) out.remove(out.last())
      }
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    arr
  }
}
