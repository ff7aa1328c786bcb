package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kernel.Html

/** Structured extraction over the HTML column: tables → records and
  * head metadata → curation fields. The boilerplate classifier
  * deliberately down-weights tabular and head content when producing
  * training TEXT; these operators are the complementary readers that
  * turn the same DOM into STRUCTURE (tables as rows, OpenGraph/
  * JSON-LD as metadata) — per-row stateless maps, embarrassingly
  * parallel, failure-isolated per document (C5).
  */
object Structured {

  /** One row per table row: `(id, table_idx, caption, headers,
    * row_idx, cells)` — colspan/rowspan resolved by the kernel's
    * grid fill, nested tables enumerated as their own `table_idx`.
    * Malformed documents contribute zero rows.
    */
  def tables(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, html) =>
        if (html == null) Iterator.empty
        else scala.util.Try(Html.extractTables(html)).toOption.iterator.flatMap {
          ts =>
            ts.iterator.zipWithIndex.flatMap { case (t, ti) =>
              t.rows.iterator.zipWithIndex.map { case (cells, ri) =>
                (id, ti, t.caption, t.headers, ri, cells)
              }
            }
        }
      }.toDF(idCol, "table_idx", "caption", "headers", "row_idx", "cells")
  }

  /** `(id, markdown, md_chars)` per document: the page serialized as
    * CommonMark via [[graft.kernel.Markdown]] — structure-preserving
    * training text (headings/lists/tables/code survive). Stateless
    * per-row map, garbage HTML yields an empty string rather than a
    * task failure (C5).
    */
  def markdown(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, html) =>
        val md =
          if (html == null) ""
          else scala.util.Try(graft.kernel.Markdown.fromHtml(html)).getOrElse("")
        (id, md, md.length)
      }.toDF(idCol, "markdown", "md_chars")
  }

  /** `(id, title, canonical, meta, json_ld)` per document — OpenGraph
    * and friends as a map column, JSON-LD payloads verbatim.
    */
  def headMetadata(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, html) =>
        val m =
          if (html == null) Html.HeadMeta("", "", Map.empty, Vector.empty)
          else scala.util.Try(Html.extractMetadata(html))
            .getOrElse(Html.HeadMeta("", "", Map.empty, Vector.empty))
        (id, m.title, m.canonical, m.meta, m.jsonLd)
      }.toDF(idCol, "title", "canonical", "meta", "json_ld")
  }

  /** Anchor edge list `(src, dst, anchor)` — every `<a href>` with its
    * link text, hrefs resolved against the page url
    * ([[Html.extractAnchors]]). The input to anchor-text aggregation:
    * group by dst and the anchor terms are the web's own description of
    * the target page. Stateless per-row flatMap, C5-isolated.
    */
  def anchors(df: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(urlCol).cast("string"), col(htmlCol).cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, html) =>
        if (html == null) Iterator.empty
        else scala.util.Try(Html.extractAnchors(html, url))
          .getOrElse(Vector.empty).iterator
          .map { case (dst, text) => (url, dst, text) }
      }.toDF("src", "dst", "anchor")
  }

  /** CSS-selector extraction ([[graft.kernel.CssSelect]]): one row per
    * match, in document order — `(id, match_idx, tag, text, attrs)`
    * with `text` the match's collapsed inner text and `attrs` its
    * attribute map (scrape `href`/`src`/`content` from it). The
    * selector is compiled ONCE per partition, matching is a stateless
    * per-row map (no shuffle), and a malformed document contributes
    * zero rows (C5) — but a malformed SELECTOR fails the job loudly at
    * compile time, before any executor work.
    */
  def cssSelect(df: DataFrame, idCol: String, htmlCol: String,
                selector: String): DataFrame = {
    val compiled = graft.kernel.CssSelect.compile(selector) // fail fast, driver-side
    require(compiled != null)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val sel = graft.kernel.CssSelect.compile(selector)
        it.flatMap { case (id, html) =>
          if (html == null) Iterator.empty
          else scala.util.Try {
            val root = Html.parse(graft.kernel.CharsetSniff.decode(html))
            graft.kernel.CssSelect.selectCompiled(root, sel)
          }.getOrElse(Vector.empty).iterator.zipWithIndex.map { case (el, i) =>
            (id, i, el.name, graft.kernel.CssSelect.innerText(el), el.attrs)
          }
        }
      }.toDF(idCol, "match_idx", "tag", "text", "attrs")
  }
}
