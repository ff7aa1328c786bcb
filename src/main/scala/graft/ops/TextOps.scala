package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines, expressed as pure
  * Catalyst column expressions (codegen'd, no UDFs): language-ID,
  * quality scoring, token counting, content fingerprinting.
  *
  * The column formulations mirror the pure-Scala kernels
  * ([[graft.kernel.Lang]], [[graft.kernel.TextStats]]) so results can be
  * cross-checked between the columnar and typed paths, and against a
  * DuckDB oracle for the SQL-expressible ones.
  */
object TextOps {

  /** Letter-run tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}]+"), t => t =!= "")

  /** Whitespace token count (matches DuckDB
    * `len(regexp_split_to_array(trim(text),'\s+'))`).
    */
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** GPT-2-style pretokenizer pattern (contractions | space-prefixed
    * letter runs | digit runs | punctuation runs | whitespace),
    * restricted to RE2-compatible syntax — no lookahead — so Java regex
    * (Spark) and RE2 (DuckDB) produce identical matches and the count is
    * oracle-checkable with the SAME pattern string.
    */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish pretoken count — the second token-counting mode a training
    * pipeline budgets with (whitespace tokens underestimate subword
    * cost; pretoken runs are the standard proxy).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Stopword hit count (with multiplicity) for one language profile. */
  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedLit(words), t)))

  /** Columnar stopword-profile language-ID. Same decision rule as
    * [[graft.kernel.Lang.detect]]: argmax of hit counts in the fixed order
    * en, fr, de, es (earlier language wins ties); zero evidence → "und".
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val bySet = graft.kernel.Lang.profiles.map { case (l, ws) => l -> hits(toks, ws.toSeq.sorted) }
    val Seq(en, fr, de, es) = bySet.map(_._2)
    when(en === 0 && fr === 0 && de === 0 && es === 0, "und")
      .when(en >= fr && en >= de && en >= es, "en")
      .when(fr >= de && fr >= es, "fr")
      .when(de >= es, "de")
      .otherwise("es")
  }

  /** Stopword ratio: fraction of letter-run tokens that are stopwords of
    * ANY language profile (the union list — language-agnostic, so the
    * ratio is a pure fluency signal usable before language-ID runs).
    * Rounded to 4 dp for FP-safe oracle compares.
    */
  def stopwordRatio(text: Column): Column = {
    val all = graft.kernel.Lang.profiles.flatMap(_._2.toSeq).distinct.sorted
    val toks = tokens(text)
    round(size(filter(toks, t => array_contains(typedLit(all), t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double"), 4)
  }

  /** Punctuation ratio: non-letter/digit/space chars over all chars. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Heuristic quality score in [0,1] (documented formula, deterministic):
    * word-count saturation × (1 − punct ratio) × mean-word-length band.
    * Rounded to 4 dp so the DuckDB oracle compare is FP-safe.
    */
  def qualityScore(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val lenFactor = least(words / lit(100.0), lit(1.0))
    val punct = punctRatio(text)
    val meanWordLen = length(text).cast("double") / greatest(words, lit(1.0))
    val wordLenBand = when(meanWordLen >= 3 && meanWordLen <= 12, lit(1.0)).otherwise(lit(0.5))
    round(lenFactor * (lit(1.0) - punct) * wordLenBand, 4)
  }

  /** Exact content fingerprint: SHA-256 of the whitespace-normalized,
    * lowercased text (the normalize-then-hash idiom of the reference's
    * content-hash memoization, `cache_manager.py:23-25`, applied to text).
    */
  def fingerprint(text: Column): Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)
}
