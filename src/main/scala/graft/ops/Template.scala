package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level per-host template removal — the boilerplate signal a
  * single-document classifier cannot see. A cookie banner, nav strip or
  * footer renders as the SAME text line on every page of a host; its
  * within-host document frequency is the give-away (CCNet §3.1 dedups
  * repeated paragraphs corpus-wide; trafilatura ships per-site
  * deduplication of repeated elements — this is that operation as a
  * first-class distributed op). The reference's per-document OCR flow
  * (ocr-app `app/services/ocr_service.py`) has no corpus view at all;
  * this operator exists precisely because Spark gives us one.
  *
  * Algorithm (all native Catalyst, no UDFs):
  *   1. explode `textCol` into (host, unit, docId) with ordinal kept;
  *   2. per-(host, unit) DISTINCT-document frequency — one row per
  *      (doc, host, unit) first, so a unit repeated inside one page
  *      counts once;
  *   3. template set = units with docFreq ≥ max(minDocs, minDocFrac ×
  *      hostDocs) — thresholds on the host's own page count;
  *   4. anti-mark via a left join on (host, unit), reassemble each
  *      document in ordinal order with sort_array over collected
  *      structs (map-side combinable aggregate).
  *
  * 100 TB shape: two aggregations and one join, ALL partitioned by
  * (host, unit) or docId — no broadcast of corpus-sized state, no
  * driver collect. The template set is tiny relative to the corpus
  * (only units crossing the per-host frequency bar) but is still
  * joined shuffle-side because ACROSS hosts it can be large; Catalyst/
  * AQE may still broadcast it when stats say it fits. Empty units
  * (blank lines) are never template candidates and pass through
  * verbatim, preserving paragraph structure.
  *
  * The unit separator is a parameter: '\n' gives the production
  * line-shape; any literal separator works (the oracle query runs the
  * same operator word-separated so DuckDB can mirror it).
  */
object Template {

  /** @return (docCol, hostCol, clean_text, n_removed) — one row per
    *         input document, `clean_text` the separator-rejoined
    *         non-template units in original order, `n_removed` the
    *         number of removed unit OCCURRENCES (within-doc repeats
    *         of a template unit each count).
    */
  def removeTemplateLines(df: DataFrame, docCol: String, hostCol: String,
                          textCol: String, separator: String = "\n",
                          minDocFrac: Double = 0.5,
                          minDocs: Int = 2): DataFrame = {
    require(separator.nonEmpty, "separator must be non-empty")
    require(minDocFrac > 0.0 && minDocFrac <= 1.0,
      s"minDocFrac must be in (0,1], got $minDocFrac")
    require(minDocs >= 2,
      s"minDocs < 2 would mark every line of a single page as template")
    val sepLit = java.util.regex.Pattern.quote(separator)

    val units = df
      .select(col(docCol), col(hostCol),
        posexplode(split(col(textCol), sepLit)).as(Seq("_ord", "_unit")))

    // distinct-doc frequency per (host, unit); blank units excluded
    val docFreq = units
      .where(col("_unit") =!= "")
      .select(col(hostCol), col("_unit"), col(docCol)).distinct()
      .groupBy(col(hostCol), col("_unit"))
      .agg(count(lit(1)).as("_df"))

    val hostDocs = df.groupBy(col(hostCol))
      .agg(countDistinct(col(docCol)).as("_hostdocs"))

    val templates = docFreq
      .join(hostDocs, Seq(hostCol))
      .where(col("_df") >= minDocs &&
        col("_df").cast("double") >= lit(minDocFrac) * col("_hostdocs").cast("double"))
      .select(col(hostCol), col("_unit"), lit(true).as("_tmpl"))

    units
      .join(templates, Seq(hostCol, "_unit"), "left")
      .groupBy(col(docCol), col(hostCol))
      .agg(
        array_join(
          transform(
            filter(
              sort_array(collect_list(struct(
                col("_ord"),
                col("_unit"),
                coalesce(col("_tmpl"), lit(false)).as("_t")))),
              x => !x.getField("_t")),
            x => x.getField("_unit")),
          separator).as("clean_text"),
        sum(when(coalesce(col("_tmpl"), lit(false)), 1L).otherwise(0L))
          .as("n_removed"))
  }
}
