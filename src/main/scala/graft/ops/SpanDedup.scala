package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kernel.TextStats

/** Exact duplicated-SUBSTRING removal — the span-level dedup of Lee et
  * al., "Deduplicating Training Data Makes Language Models Better"
  * (ACL 2022): document-level dedup ([[Dedup.nearDupFilter]],
  * [[Cluster.semanticDedup]]) misses the license boilerplate, navboxes
  * and quoted chain-letters that repeat INSIDE otherwise-unique
  * documents; those spans get cut out of the text itself. The paper
  * builds a corpus-wide suffix array; the distributed rendition here
  * marks every `k`-token window whose Karp–Rabin hash occurs >=
  * `minCount` times corpus-wide, keeps the CANONICAL occurrence (the
  * lexicographically least `(doc, offset)` — deterministic at any
  * partitioning), merges each document's other duplicated windows into
  * maximal spans, and cuts them from the original text. Consecutive
  * duplicated k-windows merge into one long span, so a 500-token
  * boilerplate block is removed as one piece, approximating the
  * paper's maximal-match semantics at window granularity.
  *
  * Scale shape: one flatMap pass emits `(hash, doc, span)` windows
  * (~tokens-per-doc rows); ONE shuffle aggregates per-hash counts +
  * canonical occurrence (map-side combine applies — the agg is
  * `count` + `min(struct)`); one join of windows against the
  * duplicated-hash set (hash-partitioned; the duplicated set is
  * usually the small side — AQE broadcasts under the threshold); one
  * `groupBy(doc)` to collect that document's removal spans (bounded by
  * the document's own length); one join back to the corpus to cut.
  * Nothing is ever quadratic and no per-row state exceeds a document.
  */
object SpanDedup {

  /** Returns `df` with `textCol` rewritten: every non-canonical
    * occurrence of a >= minCount-duplicated k-token window removed
    * (merged spans cut from the ORIGINAL text; surrounding whitespace
    * outside the spans is preserved). Documents shorter than `k`
    * tokens pass through untouched. `idCol` must be unique non-null.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 8, minCount: Long = 2L): DataFrame = {
    require(k >= 2, s"window must be >= 2 tokens, got $k")
    require(minCount >= 2, s"minCount < 2 would dedup every window, got $minCount")
    val spark = df.sparkSession
    import spark.implicits._
    val docs = df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
    val windows = docs.flatMap { case (id, text) =>
      if (text == null) Iterator.empty
      else TextStats.windowHashSpans(text, k).iterator
        .map { case (h, s, e) => (h, id, s, e) }
    }.toDF("h", "id", "s", "e")
    // per-hash: total count + canonical (least (id, s)) occurrence
    val dup = windows.groupBy(col("h")).agg(
        count(lit(1)).as("cnt"),
        min(struct(col("id"), col("s"))).as("canon"))
      .where(col("cnt") >= minCount)
      .select(col("h"), col("canon.id").as("cid"), col("canon.s").as("cs"))
    // every duplicated window EXCEPT its canonical occurrence is removed
    val removals = windows.join(dup, Seq("h"))
      .where(!(col("id") === col("cid") && col("s") === col("cs")))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("spans"))
    val cleaned = docs.toDF("id", "_text")
      .join(removals, Seq("id"), "left")
      .as[(Long, String, Seq[(Int, Int)])]
      .map { case (id, text, spans0) =>
        if (spans0 == null || text == null) (id, text)
        else {
          // merge overlapping/adjacent spans, then cut right-to-left
          val merged = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
          spans0.foreach { case (s, e) =>
            if (merged.nonEmpty && s <= merged.last._2)
              merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, e))
            else merged += ((s, e))
          }
          val sb = new java.lang.StringBuilder(text)
          merged.reverseIterator.foreach { case (s, e) => sb.delete(s, e) }
          (id, sb.toString)
        }
      }.toDF("_sd_id", "_cleaned")
    df.join(cleaned, col(idCol).cast("long") === col("_sd_id"))
      .withColumn(textCol, col("_cleaned"))
      .drop("_sd_id", "_cleaned")
  }

  /** Corpus-level duplicated-span census: `(h, cnt, n_docs)` for every
    * k-window duplicated >= minCount times — the decision metric
    * BEFORE committing to removal (Lee et al. report corpora where 1%
    * of substrings cover >10% of tokens).
    */
  def duplicateSpanStats(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, minCount: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty
        else TextStats.windowHashSpans(text, k).iterator.map { case (h, _, _) => (h, id) }
      }.toDF("h", "id")
      .groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("id")).as("n_docs"))
      .where(col("cnt") >= minCount)
  }
}
