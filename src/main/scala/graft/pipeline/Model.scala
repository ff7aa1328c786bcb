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

/** Result of the HTML branch for one page (reference vision analysis
  * analog, `vision_service.py:84-146`, re-built as tokenizer + DOM +
  * density classifier).
  */
final case class HtmlDoc(url: String, extracted_text: String, title: String,
                         labels: Seq[Label], language: String,
                         content_blocks: Long, boiler_blocks: Long,
                         ok: Boolean, error: String)
