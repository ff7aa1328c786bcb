package graft.kernel

/** Character n-gram language model for perplexity-based quality
  * filtering — the CCNet idea (Wenzek et al., "CCNet: Extracting high
  * quality monolingual datasets from web crawl data", LREC 2020):
  * score each document by how surprising it is under a model trained on
  * trusted text; high-perplexity documents (gibberish, boilerplate,
  * encoding damage) are filtered out. CCNet uses a word 5-gram KenLM;
  * this is the dependency-free character-level rendition with add-α
  * smoothing — same filtering semantics, trainable on any in-corpus
  * reference slice, fully deterministic.
  *
  * Pure kernel: normalization, hashing, scoring. Distributed training
  * lives in `graft.ops.LangModel` (one pass + one count shuffle); this
  * file has no Spark dependency so the scorer runs identically on the
  * driver (tests) and inside `mapPartitions`.
  */
object CharLm {

  /** LM text normalization (applied identically at train and score
    * time): lowercase, digits folded to '0' (CCNet's number bucketing),
    * whitespace runs collapsed to one space, trimmed. NOT the same as
    * [[graft.ops.TextOps.fingerprint]]'s normalization — that one is a
    * dedup identity, this one is a modeling vocabulary choice.
    */
  def normalize(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var pendingSpace = false
    var i = 0
    while (i < text.length) {
      val c0 = text.charAt(i)
      val c = if (Character.isDigit(c0)) '0' else Character.toLowerCase(c0)
      if (Character.isWhitespace(c)) {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Stable 64-bit hash of `s[from, from+len)`: FNV-1a 64 + a splitmix64
    * finalizer. NOT the polynomial-31 scheme of
    * [[TextStats.hashToken]] — poly-31 is linear in the characters, so
    * short n-grams collide structurally pre-mix ((c₂+1, c₃−31) aliases
    * (c₂, c₃), the "Aa"/"BB" family; 6 real collisions in the first
    * 1000 fixture trigrams) and the bijective finalizer cannot undo a
    * pre-mix merge. FNV-1a multiplies the full state between
    * characters, which breaks the linear aliasing. Full-gram and prefix
    * keys live in separate tables, so cross-length collisions cannot
    * occur.
    */
  def ngramHash(s: CharSequence, from: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + len
    while (i < end) {
      val c = s.charAt(i)
      h = (h ^ (c & 0xff)) * 0x100000001b3L
      h = (h ^ ((c >> 8) & 0xff)) * 0x100000001b3L
      i += 1
    }
    TextStats.mix64(h)
  }

  /** Trained model. Keys are sorted for binary-search lookup; counts are
    * exact integers, so two trainings over the same corpus produce
    * bit-identical models REGARDLESS of partitioning — no FP fold order
    * to leak. `alphabetSize` is the training corpus' distinct normalized
    * character count (the smoothing denominator's support size).
    */
  final case class Model(n: Int, alpha: Double, alphabetSize: Int,
                         gramKeys: Array[Long], gramCounts: Array[Long],
                         prefKeys: Array[Long], prefCounts: Array[Long]) {
    require(n >= 2, s"n must be >= 2, got $n")
    require(alpha > 0, s"alpha must be > 0 for smoothing, got $alpha")

    private def lookup(keys: Array[Long], counts: Array[Long], k: Long): Long = {
      val i = java.util.Arrays.binarySearch(keys, k)
      if (i >= 0) counts(i) else 0L
    }

    /** Cross-entropy in nats per n-gram of the NORMALIZED text under
      * add-α: P(c|prefix) = (count(gram)+α) / (count(prefix)+α·|Σ|).
      * NaN when the document has fewer than `n` normalized characters
      * (no n-gram events — no evidence either way).
      */
    def crossEntropy(text: String): Double = {
      val s = normalize(text)
      val events = s.length - n + 1
      if (events <= 0) return Double.NaN
      val denomAdd = alpha * alphabetSize
      var h = 0.0
      var i = 0
      while (i < events) {
        val g = lookup(gramKeys, gramCounts, ngramHash(s, i, n))
        val p = lookup(prefKeys, prefCounts, ngramHash(s, i, n - 1))
        h -= math.log((g + alpha) / (p + denomAdd))
        i += 1
      }
      h / events
    }

    /** e^crossEntropy — the conventional reporting unit. */
    def perplexity(text: String): Double = math.exp(crossEntropy(text))
  }
}
