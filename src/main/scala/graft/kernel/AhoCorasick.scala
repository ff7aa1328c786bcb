package graft.kernel

/** Aho–Corasick multi-pattern matcher (Aho & Corasick, CACM 1975) — the
  * badword/phrase gate at corpus scale. A web pipeline screens every
  * document against THOUSANDS of patterns (badword lists, boilerplate
  * phrases, license markers); `contains` per pattern is O(n·p), this
  * automaton is O(n + matches) regardless of pattern count. Built once
  * on the driver, broadcast to executors, scanned per row — no shuffle,
  * no per-row allocation beyond the counts array.
  *
  * Semantics: SUBSTRING matching over the char stream (every
  * occurrence, including overlapping occurrences of different
  * patterns and self-overlapping ones — "aa" occurs twice in "aaa"),
  * optional lowercase folding at build+scan. Word-boundary policy is a
  * caller concern (wrap patterns in separators or post-filter).
  *
  * Construction: classic goto/fail/output trie. Transitions live in
  * per-node sorted char/next parallel arrays (binary search on scan) —
  * compact for the sparse fan-out real pattern lists have, no
  * 64k-wide tables, fully `Serializable` for broadcast.
  */
final class AhoCorasick private (
    private val chars: Array[Array[Char]],   // per-node sorted edge labels
    private val next: Array[Array[Int]],     // per-node edge targets
    private val fail: Array[Int],
    private val out: Array[Array[Int]],      // per-node matched pattern ids
    val numPatterns: Int,
    private val foldCase: Boolean) extends Serializable {

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val cs = chars(s)
      val i = java.util.Arrays.binarySearch(cs, c)
      if (i >= 0) return next(s)(i)
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Per-pattern occurrence counts over `text`. */
  def countMatches(text: String): Array[Int] = {
    val counts = new Array[Int](numPatterns)
    if (text == null) return counts
    var s = 0
    var i = 0
    while (i < text.length) {
      val c0 = text.charAt(i)
      val c = if (foldCase) Character.toLowerCase(c0) else c0
      s = step(s, c)
      val o = out(s)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }

  /** Total occurrences across all patterns. */
  def countTotal(text: String): Long = {
    if (text == null) return 0L
    var total = 0L
    var s = 0
    var i = 0
    while (i < text.length) {
      val c0 = text.charAt(i)
      val c = if (foldCase) Character.toLowerCase(c0) else c0
      s = step(s, c)
      total += out(s).length
      i += 1
    }
    total
  }

  /** True iff any pattern occurs — early-exits at the first hit. */
  def containsAny(text: String): Boolean = {
    if (text == null) return false
    var s = 0
    var i = 0
    while (i < text.length) {
      val c0 = text.charAt(i)
      val c = if (foldCase) Character.toLowerCase(c0) else c0
      s = step(s, c)
      if (out(s).nonEmpty) return true
      i += 1
    }
    false
  }

  /** Count of DISTINCT patterns occurring at least once. */
  def distinctMatches(text: String): Int = countMatches(text).count(_ > 0)
}

object AhoCorasick {

  /** Build the automaton. Duplicate patterns keep their own ids (each
    * occurrence counts once per id). Empty patterns are rejected — they
    * would match at every position.
    */
  def build(patterns: Seq[String], caseInsensitive: Boolean = true): AhoCorasick = {
    require(patterns.nonEmpty, "empty pattern list")
    patterns.zipWithIndex.foreach { case (p, i) =>
      require(p != null && p.nonEmpty, s"pattern $i is null/empty")
    }
    val pats =
      if (caseInsensitive) patterns.map(_.toLowerCase).toArray
      else patterns.toArray

    // trie build with java HashMaps, then frozen to sorted arrays
    val edges = scala.collection.mutable.ArrayBuffer(
      new java.util.TreeMap[Character, Integer]())
    val outBuild = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    pats.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = Character.valueOf(p.charAt(i))
        val nxt = edges(s).get(c)
        if (nxt != null) s = nxt.intValue()
        else {
          edges += new java.util.TreeMap[Character, Integer]()
          outBuild += scala.collection.mutable.ArrayBuffer.empty[Int]
          edges(s).put(c, Integer.valueOf(edges.length - 1))
          s = edges.length - 1
        }
        i += 1
      }
      outBuild(s) += pid
    }

    val n = edges.length
    val fail = new Array[Int](n)
    // BFS: fail links + output inheritance (suffix matches propagate)
    val queue = new java.util.ArrayDeque[Integer]()
    edges(0).forEach { (_, v) => queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      edges(u).forEach { (c, v) =>
        queue.add(v)
        // deepest proper suffix of v's string that is a trie node:
        // walk u's fail chain until a state has an edge on c
        var f = fail(u)
        while (f != 0 && edges(f).get(c) == null) f = fail(f)
        val t = edges(f).get(c)
        val target = if (t == null) 0 else t.intValue()
        fail(v.intValue()) = target
        outBuild(v.intValue()) ++= outBuild(target)
      }
    }

    val chars = new Array[Array[Char]](n)
    val next = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val m = edges(i)
      val cs = new Array[Char](m.size())
      val ns = new Array[Int](m.size())
      var j = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        cs(j) = e.getKey.charValue(); ns(j) = e.getValue.intValue(); j += 1
      }
      chars(i) = cs; next(i) = ns
      i += 1
    }
    new AhoCorasick(chars, next, fail,
      outBuild.map(_.toArray).toArray, pats.length, caseInsensitive)
  }
}
