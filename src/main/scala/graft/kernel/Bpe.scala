package graft.kernel

/** Byte-level BPE (Sennrich et al. 2016; the GPT-2 byte-level variant —
  * public algorithms, built from scratch): the REAL subword tokenizer a
  * training pipeline budgets with. The `bpeTokenCount` pretoken proxy
  * counts exactly 1 per pretoken regardless of vocabulary — it never
  * applies merges, so it cannot distinguish a common word (1 real
  * token) from a rare one (several) and its totals drift from any real
  * budget; this kernel applies an actual merges table.
  *
  *  - Pretokenization: the same RE2-compatible GPT-2-style pattern the
  *    columnar proxy uses ([[PretokenPattern]] — contractions,
  *    space-prefixed letter/digit runs, punctuation runs, whitespace).
  *  - Alphabet: the 256 byte values (UTF-8 of the pretoken), so ANY
  *    input is encodable — no unknown-token path, exactly like GPT-2.
  *  - Merges: trained ONCE, deterministically, over the committed
  *    [[seedCorpus]] (frequency-ranked; ties broken by smallest symbol
  *    pair, so training has no hash-order or wall-clock dependence).
  *    A golden test pins the first merges; any trainer change fails
  *    loudly instead of silently shifting every token count.
  *  - Encoding: repeatedly merge the LOWEST-RANK adjacent pair present
  *    (the standard BPE inference rule — provably equivalent to
  *    replaying merges in training order, differential-tested against
  *    that naive form).
  *
  * Token ids: 0–255 are raw bytes, 256+i is the result of merge i.
  * [[decode]] inverts [[encode]] byte-exactly for any input.
  */
object Bpe {

  /** GPT-2-style pretokenizer pattern (RE2-compatible — no lookahead),
    * shared with the columnar proxy `TextOps.BpePattern`.
    */
  val PretokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  // the committed seed corpus supports ~380 distinct merges before its
  // pretoken vocabulary is fully merged; 320 leaves headroom below that
  // so the table is always full (asserted by the golden test)
  val NumMerges: Int = 320

  /** The committed training corpus: plain English with the function-word
    * skew, digits, contractions and punctuation a web corpus carries.
    * Deterministic by construction (a string literal); the trained
    * merges are pinned by a golden test.
    */
  private[graft] val seedCorpus: String =
    """the quick brown fox jumps over the lazy dog and the dog sleeps in the sun.
      |it was the best of times, it was the worst of times, it was the age of wisdom.
      |in the beginning there was the word, and the word was with the data pipeline.
      |we hold these truths to be self-evident, that all documents are not created equal.
      |the rain in spain stays mainly in the plain, and the train arrives at 10:45 today.
      |a streaming window merges sorted chunks of text into one document for the reader.
      |she sells sea shells by the sea shore; the shells she sells are surely sea shells.
      |to be or not to be, that is the question the filter answers for every page it sees.
      |there are 1024 bytes in a kilobyte and 1048576 bytes in a megabyte of crawl data.
      |don't count what you can't verify; it's the hash that proves the text didn't change.
      |the extraction pipeline reads the pages, strips the boilerplate and keeps the content.
      |all work and no play makes the tokenizer a dull tool for the training of the model.
      |what the crawler finds, the parser cleans, the scorer ranks and the sampler keeps.
      |numbers like 3.14159 and 2.71828 appear in the text with commas, dots and dashes.
      |the international conference on the theory of information was held in the summer.
      |""".stripMargin

  private val pretokenRe = java.util.regex.Pattern.compile(PretokenPattern)

  private def pairKey(a: Int, b: Int): Long = (a.toLong << 20) | b.toLong

  /** Deterministic trainer: returns the merge list in rank order.
    * Classic BPE learn loop — count adjacent symbol pairs over the
    * pretoken vocabulary (weighted by frequency), merge the most
    * frequent (ties: smallest (a, b) pair), repeat.
    */
  private[graft] def train(corpus: String, numMerges: Int): Vector[(Int, Int)] = {
    val freq = scala.collection.mutable.LinkedHashMap.empty[scala.collection.immutable.ArraySeq[Int], Long]
    val m = pretokenRe.matcher(corpus)
    while (m.find()) {
      val bytes = m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val syms = scala.collection.immutable.ArraySeq.unsafeWrapArray(
        Array.tabulate(bytes.length)(i => bytes(i) & 0xff))
      if (syms.nonEmpty) freq.updateWith(syms) { c => Some(c.getOrElse(0L) + 1L) }
    }
    var words: Array[(Array[Int], Long)] =
      freq.iterator.map { case (w, c) => (w.toArray, c) }.toArray
    val merges = Vector.newBuilder[(Int, Int)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val counts = new java.util.HashMap[Long, Long]()
      words.foreach { case (w, c) =>
        var i = 0
        while (i + 1 < w.length) {
          counts.merge(pairKey(w(i), w(i + 1)), c, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count, ties to the smallest packed pair — fully ordered,
        // no hash-iteration dependence
        var bestKey = -1L
        var bestCnt = -1L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > bestCnt ||
            (e.getValue == bestCnt && e.getKey < bestKey)) {
            bestCnt = e.getValue; bestKey = e.getKey
          }
        }
        val a = (bestKey >> 20).toInt
        val b = (bestKey & 0xFFFFF).toInt
        val newId = 256 + rank
        merges += ((a, b))
        words = words.map { case (w, c) => (mergePair(w, a, b, newId), c) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Replace every non-overlapping (a, b) adjacency with `newId`,
    * left to right.
    */
  private def mergePair(w: Array[Int], a: Int, b: Int, newId: Int): Array[Int] = {
    val out = new Array[Int](w.length)
    var i = 0
    var o = 0
    while (i < w.length) {
      if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
        out(o) = newId; i += 2
      } else {
        out(o) = w(i); i += 1
      }
      o += 1
    }
    java.util.Arrays.copyOf(out, o)
  }

  /** The trained merge list, rank order. */
  lazy val merges: Vector[(Int, Int)] = train(seedCorpus, NumMerges)

  /** (a, b) → rank, and rank → merged symbol id = 256 + rank. Boxed
    * value type ON PURPOSE: with a primitive `Int` value, `get` on a
    * missing key returns null and Scala unboxes it to 0 — every unknown
    * pair would alias rank 0 and the inference loop would spin forever.
    */
  private lazy val ranks: java.util.HashMap[java.lang.Long, java.lang.Integer] = {
    val h = new java.util.HashMap[java.lang.Long, java.lang.Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) => h.put(pairKey(a, b), r) }
    h
  }

  /** Symbol id → the bytes it expands to (0–255 = the byte itself). */
  private lazy val vocabBytes: Array[Array[Byte]] = {
    val v = new Array[Array[Byte]](256 + merges.size)
    var i = 0
    while (i < 256) { v(i) = Array(i.toByte); i += 1 }
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      v(256 + r) = v(a) ++ v(b)
    }
    v
  }

  /** Encode one pretoken's bytes: repeatedly merge the lowest-rank
    * adjacent pair (standard BPE inference).
    */
  private[graft] def encodePretoken(bytes: Array[Byte]): Array[Int] = {
    var syms = Array.tabulate(bytes.length)(i => bytes(i) & 0xff)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.get(pairKey(syms(i), syms(i + 1)))
        if (r != null && r.intValue < bestRank) bestRank = r.intValue
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        syms = mergePair(syms, a, b, 256 + bestRank)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Token ids for `text` (pretokenize, encode each pretoken, concat). */
  def encode(text: String): Array[Int] = {
    if (text == null || text.isEmpty) return Array.emptyIntArray
    val out = new scala.collection.mutable.ArrayBuffer[Int](text.length / 3 + 4)
    val m = pretokenRe.matcher(text)
    while (m.find()) {
      out ++= encodePretoken(
        m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    out.toArray
  }

  /** [[encode]] inverted: token ids back to the exact original bytes. */
  def decode(ids: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ids.length * 2)
    var i = 0
    while (i < ids.length) { out.write(vocabBytes(ids(i))); i += 1 }
    out.toByteArray
  }

  /** Subword token count — allocation-light (no id buffer kept). */
  def countTokens(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    var n = 0
    val m = pretokenRe.matcher(text)
    while (m.find()) {
      n += encodePretoken(
        m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8)).length
    }
    n
  }
}
