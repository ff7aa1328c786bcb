package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction over the text column — the anonymization
  * stage every released web corpus runs (email/IP masking à la FineWeb,
  * phone/card scrubbing à la Dolma). All detection is native
  * `regexp_count`/`regexp_replace` — codegen'd, shuffle-free, stateless
  * maps that stream at scan speed; the only non-regex logic is the Luhn
  * checksum that separates real card numbers from random 16-digit
  * strings, a tiny deterministic kernel applied ONLY to regex
  * candidates.
  *
  * Patterns deliberately use the common RE2/Java subset (no lookaround,
  * no possessives) so the same pattern text is exactly replayable by
  * other engines — the oracle runs them verbatim in DuckDB.
  */
object Pii {

  /** RFC-5322-lite mailbox — the practical crawl-corpus form. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad with 0–255 octet bounds, word-delimited. */
  val Ipv4Re =
    "\\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}" +
      "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\b"

  /** International +CC digits, or NNN-NNN-NNNN / NNN NNN NNNN. */
  val PhoneRe = "\\+[0-9]{9,15}\\b|\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"

  /** 13–19 digit runs with optional single space/dash group separators —
    * CANDIDATES only; [[luhnValid]] decides.
    */
  val CardRe = "\\b[0-9](?:[0-9]|[- ][0-9]){12,18}\\b"

  /** Luhn mod-10 checksum over the digits of `s` (separators ignored) —
    * true for real card-shaped numbers, false for ~90 % of random digit
    * runs. Deterministic, allocation-free.
    */
  def luhnValid(s: String): Boolean = {
    var sum = 0
    var alt = false
    var i = s.length - 1
    var digits = 0
    while (i >= 0) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if (alt) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        alt = !alt
        digits += 1
      }
      i -= 1
    }
    digits >= 13 && sum % 10 == 0
  }

  /** Per-document detection counts: `(idCol, emails, ipv4s, phones,
    * cards)` — `cards` counts only Luhn-valid candidates.
    */
  def detect(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val cardCount = udf { (t: String) =>
      if (t == null) 0
      else CardRe.r.findAllIn(t).count(luhnValid)
    }
    def cnt(re: String) =
      coalesce(regexp_count(col(textCol), lit(re)), lit(0))
    df.select(col(idCol),
      cnt(EmailRe).as("emails"),
      cnt(Ipv4Re).as("ipv4s"),
      cnt(PhoneRe).as("phones"),
      cardCount(col(textCol)).as("cards"))
  }

  /** The redacted text column: every match replaced by its placeholder
    * tag. Card redaction replaces only Luhn-valid candidates (random
    * digit runs — order ids, timestamps — survive untouched).
    */
  def redactText(textCol: Column): Column = {
    val luhnAware = udf { (t: String) =>
      if (t == null) null
      else CardRe.r.replaceAllIn(t,
        m => if (luhnValid(m.matched)) "<CARD>"
        else java.util.regex.Matcher.quoteReplacement(m.matched))
    }
    luhnAware(
      regexp_replace(
        regexp_replace(
          regexp_replace(textCol, lit(EmailRe), lit("<EMAIL>")),
          lit(Ipv4Re), lit("<IP>")),
        lit(PhoneRe), lit("<PHONE>")))
  }

  /** `df` with `textCol` redacted in place plus a `pii_found` flag —
    * the corpus-release form.
    */
  def redact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val red = redactText(col(textCol))
    df.withColumn("pii_found", red =!= col(textCol))
      .withColumn(textCol, red)
  }
}
