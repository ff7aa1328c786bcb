package graft.pipeline

import java.sql.Timestamp

/** Typed row models of the extraction pipeline (SURVEY.md §1.1).
  *
  * `Page` is the authoritative input shape from BASELINE.json `input_hint`:
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`.
  * `html` carries the raw payload — HTML bytes, or PDF bytes for rows whose
  * payload sniffs as `%PDF-` (the reference's `.pdf`-only ingestion guard,
  * `/root/reference/app/api/routes.py:25-26`, re-expressed as a payload
  * predicate). `text`/`lang` are fixture ground truth / WET-style metadata,
  * never inputs to extraction.
  */
final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                      text: String, lang: String)

/** The extraction kernels' input projection: url + payload only. The
  * hot path uses this instead of [[Page]] so Catalyst prunes `warc_ts`,
  * `text`, `lang` out of the Parquet scan (`text` alone is ~40 % of the
  * table's bytes; at 100 TB that pruning is the difference between
  * scanning 60 TB and 100 TB).
  */
final case class RawDoc(url: String, html: Array[Byte])

/** One ≤10-page sub-PDF produced by the splitter (reference
  * `pdf_splitter.py:46-129`), ordered by `chunk_idx` (the `enumerate`
  * at `ocr.py:81`).
  */
final case class Chunk(url: String, chunk_idx: Int, total_chunks: Int,
                       payload: Array[Byte])

/** Per-page metadata of a chunk result (reference `ocr.py:56-69`;
  * page_number restarts at 1 per chunk; confidence rounded to 4 dp per
  * `ocr.py:65`).
  */
final case class PageMeta(page_number: Int, width: Double, height: Double,
                          confidence: Double)

/** A classification label (reference VisionResult labels,
  * `vision_service.py:110-146`): here derived from document structure —
  * headings for HTML, leading lines for PDF.
  */
final case class Label(description: String, score: Double, topicality: Double)

/** Result of extracting one unique chunk payload, keyed by its SHA-256
  * (the memoization key, `cache_manager.py:23-25`). `ok=false` rows mirror
  * the reference's dropped failed chunks (`ocr.py:75-77`).
  */
final case class ChunkExtract(content_hash: String, text: String,
                              pages: Seq[PageMeta], labels: Seq[Label],
                              language: String, ok: Boolean, error: String)

/** Merged per-document result of the PDF branch (reference MergedResult,
  * `document_saver.py:69-81`): chunk texts concatenated and page lists
  * extended strictly in chunk order; labels/language from chunk 0 (the
  * first-page-only classification prefix, `vision_service.py:51-52`).
  */
final case class PdfDoc(url: String, extracted_text: String,
                        pages: Seq[PageMeta], labels: Seq[Label],
                        language: String, chunks_processed: Int,
                        total_chunks: Int, ok: Boolean)

/** Unified per-document result row — the schema of
  * [[Extraction.extractAll]] before the `document_type` column, produced
  * row-at-a-time by [[Extraction.extractDoc]] (both branches fused).
  */
final case class DocRow(url: String, extracted_text: String, title: String,
                        labels: Seq[Label], language: String,
                        pages: Seq[PageMeta], chunks_processed: Int,
                        total_chunks: Int, content_blocks: Long,
                        boiler_blocks: Long, source_type: String, ok: Boolean)

/** Result of the HTML branch for one page (reference vision analysis
  * analog, `vision_service.py:84-146`, re-built as tokenizer + DOM +
  * density classifier).
  */
final case class HtmlDoc(url: String, extracted_text: String, title: String,
                         labels: Seq[Label], language: String,
                         content_blocks: Long, boiler_blocks: Long,
                         ok: Boolean, error: String)
