package graft.kernel

/** Deterministic n-gram/stopword-profile language identifier.
  *
  * Reference analog: locale detection from the vision response
  * (`/root/reference/app/services/vision_service.py:144-145` reads
  * `text_annotations[0].locale`). Re-expressed as a hand-built stopword
  * heuristic: score = fraction of whitespace tokens that are language
  * stopwords; argmax over a fixed language order (first max wins);
  * zero evidence → "und".
  *
  * Two implementations with identical results (differential-tested):
  * [[detectReference]], the executable spec (lowercase → regex split →
  * set lookups, ~10^3 allocations per call), and the production
  * [[detect]], a zero-allocation scan for Latin-1 inputs — tokens are
  * maximal letter runs packed lowercased into a Long (every stopword is
  * ≤6 Latin-1 chars) and probed in an open-addressed Long→langMask
  * table. Inputs containing any char ≥ U+0100 fall back to the spec
  * path (case mapping beyond Latin-1 is not 1:1, e.g. µ→μ, İ→i̇).
  */
object Lang {
  private def sw(s: String): Set[String] = s.split(' ').toSet

  // Profile order is part of the frozen spec (deterministic tie-break).
  val profiles: Seq[(String, Set[String])] = Seq(
    "en" -> sw("the and of to in is that it for on with as was at by an be this have from or had not are but they you his her its which their"),
    "fr" -> sw("le la les de des du et un une est que qui dans pour sur avec au aux ce cette il elle ne pas son sa ses par plus mais ou donc"),
    "de" -> sw("der die das und ist von zu den dem ein eine mit nicht sich als auch es an werden aus bei nach wie einer einem über für"),
    "es" -> sw("el la los las de del y un una es que en por con para no se su al lo como pero sus le ya este esta"))

  private val langNames = profiles.map(_._1).toArray

  // ---- packed stopword table (open addressing, power-of-two size) ----
  private val TblBits = 10
  private val TblSize = 1 << TblBits
  private val tblKeys = new Array[Long](TblSize)
  private val tblMask = new Array[Int](TblSize) // 0 = empty slot

  /** Pack a ≤7-char Latin-1 token: length byte in the top 8 bits, chars
    * below. Longer tokens cannot be stopwords and are never looked up.
    */
  private def slot(key: Long): Int =
    ((key * 0x9E3779B97F4A7C15L) >>> (64 - TblBits)).toInt

  locally {
    profiles.zipWithIndex.foreach { case ((_, words), li) =>
      words.foreach { w =>
        require(w.length <= 7 && w.forall(_ < 0x100), s"stopword not packable: $w")
        var key = 0L
        var k = 0
        while (k < w.length) { key = (key << 8) | (w.charAt(k) & 0xFFL); k += 1 }
        key |= w.length.toLong << 56
        var idx = slot(key)
        while (tblMask(idx) != 0 && tblKeys(idx) != key) idx = (idx + 1) & (TblSize - 1)
        tblKeys(idx) = key
        tblMask(idx) |= 1 << li
      }
    }
  }

  private def lookupMask(key: Long): Int = {
    var idx = slot(key)
    while (tblMask(idx) != 0) {
      if (tblKeys(idx) == key) return tblMask(idx)
      idx = (idx + 1) & (TblSize - 1)
    }
    0
  }

  /** Detect the language of `text`; "und" when no stopword evidence. */
  def detect(text: String): String = {
    val len = text.length
    if (len == 0) return "und"
    var i = 0
    while (i < len) { if (text.charAt(i) >= 0x100) return detectReference(text); i += 1 }
    // zero-allocation path: maximal letter runs, packed lowercased
    val hits = new Array[Int](langNames.length)
    var any = false
    i = 0
    while (i < len) {
      while (i < len && !Character.isLetter(text.charAt(i))) i += 1
      if (i < len) {
        any = true
        var key = 0L
        var tl = 0
        while (i < len && Character.isLetter(text.charAt(i))) {
          if (tl < 7) key = (key << 8) | (Character.toLowerCase(text.charAt(i)) & 0xFFL)
          tl += 1
          i += 1
        }
        if (tl <= 7) {
          val m = lookupMask(key | (tl.toLong << 56))
          if (m != 0) {
            var l = 0
            while (l < hits.length) {
              if ((m & (1 << l)) != 0) hits(l) += 1
              l += 1
            }
          }
        }
      }
    }
    if (!any) return "und"
    var best = "und"
    var bestScore = 0
    var l = 0
    while (l < hits.length) {
      if (hits(l) > bestScore) { best = langNames(l); bestScore = hits(l) }
      l += 1
    }
    best
  }

  /** The executable spec `detect` is verified against. */
  def detectReference(text: String): String = {
    if (text.isEmpty) return "und"
    val tokens = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (tokens.isEmpty) return "und"
    var best = "und"
    var bestScore = 0
    profiles.foreach { case (lang, words) =>
      var hits = 0
      var i = 0
      while (i < tokens.length) { if (words(tokens(i))) hits += 1; i += 1 }
      if (hits > bestScore) { best = lang; bestScore = hits }
    }
    best
  }
}
