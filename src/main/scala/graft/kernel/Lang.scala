package graft.kernel

/** Deterministic n-gram/stopword-profile language identifier.
  *
  * Reference analog: locale detection from the vision response
  * (`/root/reference/app/services/vision_service.py:144-145` reads
  * `text_annotations[0].locale`). Re-expressed as a hand-built stopword
  * heuristic: score = fraction of whitespace tokens that are language
  * stopwords; argmax over a fixed language order (first max wins);
  * zero evidence → "und".
  */
object Lang {
  private def sw(s: String): Set[String] = s.split(' ').toSet

  // Profile order is part of the frozen spec (deterministic tie-break).
  val profiles: Seq[(String, Set[String])] = Seq(
    "en" -> sw("the and of to in is that it for on with as was at by an be this have from or had not are but they you his her its which their"),
    "fr" -> sw("le la les de des du et un une est que qui dans pour sur avec au aux ce cette il elle ne pas son sa ses par plus mais ou donc"),
    "de" -> sw("der die das und ist von zu den dem ein eine mit nicht sich als auch es an werden aus bei nach wie einer einem über für"),
    "es" -> sw("el la los las de del y un una es que en por con para no se su al lo como pero sus le ya este esta"))

  /** Detect the language of `text`; "und" when no stopword evidence. */
  def detect(text: String): String = {
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
