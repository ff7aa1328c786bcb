package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The complete training-corpus job as ONE composition — the
  * FineWeb-style funnel every web-scale text pipeline runs, built
  * entirely from this engine's own operators:
  *
  *   crawl pages → main-content extraction ([[Extraction.extractAll]])
  *   → Gopher-rule quality filter ([[graft.ops.TextOps.gopherQuality]])
  *   → corpus near-dedup, one survivor per cluster
  *     ([[graft.ops.Dedup.nearDupFilter]]: MinHash → capped LSH →
  *     exact verify → connected components)
  *   → WET-style conversion-record archives
  *     ([[graft.sources.Warc.writeConversions]])
  *
  * plus a per-stage funnel table (stage → surviving docs) — the
  * numbers a pipeline operator actually watches. Every stage is the
  * already-vetted scale shape; composing them adds NO new shuffle
  * beyond their own (the funnel counts ride on cached frames).
  */
object CorpusJob {

  /** Run the funnel over a page table; write WET archives to
    * `wetDir`; return the funnel `(stage, docs)` in pipeline order
    * (`ord` makes the order part of the data, not the row layout).
    */
  def run(spark: SparkSession, pages: DataFrame, wetDir: String,
          shingleK: Int = 3, numHashes: Int = 32, numBands: Int = 8,
          threshold: Double = 0.8, maxBucket: Int = 4096): DataFrame = {
    import spark.implicits._
    val docs = Extraction.extractAll(pages)
      .join(pages.select(col("url"), col("warc_ts")), Seq("url"))
      .persist()
    val nIn = docs.count()

    val quality = docs.where(col("ok"))
      .withColumn("_keep",
        graft.ops.TextOps.gopherQuality(col("extracted_text")).last)
      .where(col("_keep")).drop("_keep")
      .persist()
    val nQuality = quality.count()

    // standard order: the cheap exact pass first (one window, catches
    // the bulk of duplication), then MinHash near-dedup on the residue
    val exact = graft.ops.Dedup.exactFilter(quality, "url", "extracted_text")
      .persist()
    val nExact = exact.count()

    val deduped = graft.ops.Dedup.nearDupFilter(
        exact, "url", "extracted_text",
        shingleK, numHashes, numBands, threshold, maxBucket)
      .persist()
    val nDeduped = deduped.count()

    val written = graft.sources.Warc.writeConversions(
      deduped.select(col("url"), col("warc_ts"), col("extracted_text")), wetDir)

    docs.unpersist(); quality.unpersist(); exact.unpersist(); deduped.unpersist()
    Seq(
      (0, "extracted", nIn),
      (1, "quality_kept", nQuality),
      (2, "exact_unique", nExact),
      (3, "neardup_survivors", nDeduped),
      (4, "wet_records_written", written))
      .toDF("ord", "stage", "docs")
  }
}
