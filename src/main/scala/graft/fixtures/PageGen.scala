package graft.fixtures

import graft.kernel.PdfWriter
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import scala.util.Random

/** Deterministic synthetic page-table generator (FIXTURES.md §1).
  *
  * Emits Common-Crawl-style rows `(url, warc_ts, html, text, lang)` per
  * BASELINE.json `input_hint`. No wall-clock, no external data: a seeded
  * RNG (default 42) drives every choice, so the same (n, seed) always
  * yields byte-identical payloads — the property the SHA-256 dedup path
  * (reference `app/services/cache_manager.py:23-25`) and the golden
  * byte-identity tests rely on.
  *
  * Payload mix: ~90 % HTML from a boilerplate grammar (nav/aside/footer
  * link blocks + ≥18-word content paragraphs, entities, comments,
  * script/style raw text, occasional malformed markup), ~10 % PDFs from
  * [[graft.kernel.PdfWriter]] (1–25 pages; >10 pages forces multi-chunk
  * ordered merges mirroring `pdf_splitter.py:72-73`), plus ~3 % rows that
  * duplicate an earlier row's payload byte-for-byte.
  *
  * The `text` column is the grammar's ground-truth main text, built to be
  * exactly what the frozen kernel spec extracts (heading + paragraphs
  * joined '\n' for HTML; page lines each ending '\n' for PDF). The
  * equality `Extraction(html) == text` is asserted over the whole table by
  * the test suite — the byte-identity contract.
  */
object PageGen {

  type Page = graft.pipeline.Page
  private def Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                   text: String, lang: String): Page =
    graft.pipeline.Page(url, warc_ts, html, text, lang)

  // Epoch of the 7-day warc_ts ramp: 2024-01-01T00:00:00Z.
  val EpochMs: Long = 1704067200000L
  val RampMs: Long = 7L * 86400 * 1000

  private val vocab: Map[String, IndexedSeq[String]] = Map(
    "en" -> "the quick brown fox jumps over a lazy dog and every page of this corpus holds words that are plain but useful for testing extraction with care and they keep coming from all sides".split(' ').toIndexedSeq,
    "fr" -> "le chat et le chien sont dans la maison avec un grand jardin qui donne sur la mer et les enfants jouent pendant que la pluie tombe sur les toits de la ville".split(' ').toIndexedSeq,
    "de" -> "der Hund und die Katze laufen durch den großen Garten während die Kinder mit dem Ball spielen und die Sonne über der alten Stadt langsam hinter den Bergen versinkt".split(' ').toIndexedSeq,
    "es" -> "el perro y el gato corren por el jardín mientras los niños juegan con la pelota y el sol se pone despacio detrás de las montañas de la ciudad vieja".split(' ').toIndexedSeq)

  private val langs = IndexedSeq("en", "en", "en", "en", "en", "en", "en", "fr", "de", "es")

  private val headWords = IndexedSeq("scale", "engines", "report", "data", "pipelines",
    "analysis", "systems", "index", "crawl", "signals", "quality", "review")

  private val techLine = "Technical drawing schematic overview diagram of the assembly unit"

  /** Zipfian host pick over 50 hosts: P(k) ∝ 1/(k+1). */
  private def zipfHost(r: Random): Int = {
    val h = harmonic50
    val x = r.nextDouble() * h
    var acc = 0.0
    var k = 0
    while (k < 50) { acc += 1.0 / (k + 1); if (x < acc) return k; k += 1 }
    49
  }
  private val harmonic50 = (1 to 50).map(1.0 / _).sum

  private def para(r: Random, lang: String, words: Int): String = {
    val v = vocab(lang)
    (0 until words).map(_ => v(r.nextInt(v.length))).mkString(" ")
  }

  private def cap(s: String): String =
    if (s.isEmpty) s else s.substring(0, 1).toUpperCase + s.substring(1)

  /** One HTML page + its ground-truth extracted text. `boost` scales the
    * paragraph count (bench realism: real crawl pages are tens of KB, the
    * default grammar emits ~2 KB; boost > 1 is used by `graft.Bench` only,
    * never by tests/goldens).
    */
  private def htmlPage(r: Random, i: Int, lang: String, boost: Int): (Array[Byte], String) = {
    val heading = cap((0 until (3 + r.nextInt(3))).map(_ => headWords(r.nextInt(headWords.length))).mkString(" "))
    val nParas = (2 + r.nextInt(4)) * boost
    val paras = (0 until nParas).map(_ => cap(para(r, lang, 18 + r.nextInt(22))) + ".")
    val navLinks = (0 until 3 + r.nextInt(4))
      .map(k => s"""<a href="/s$k">${para(r, lang, 1 + r.nextInt(2))}</a>""").mkString(" ")
    val sideLinks = (0 until 2 + r.nextInt(3))
      .map(k => s"""<a href="/ad$k">${para(r, lang, 2)}</a>""").mkString(" · ")
    val malformed = r.nextInt(100) < 8
    val entity = r.nextInt(100) < 30
    // entity test: inject "&amp;" into the first paragraph's markup; the
    // ground truth then contains a literal '&'.
    val p0markup = if (entity) paras.head.replaceFirst(" ", " &amp; ") else paras.head
    val p0truth = if (entity) paras.head.replaceFirst(" ", " & ") else paras.head
    val bodyParas = (p0markup +: paras.tail).map { p =>
      val inner = if (malformed && r.nextInt(2) == 0) "<em>" + p else p
      s"<p>$inner</p>"
    }.mkString("\n")
    val html =
      s"""<!DOCTYPE html>
         |<html lang="$lang"><head><title>Doc $i &amp; host</title>
         |<style>.m{margin:0} /* css */</style>
         |<script>var x = 1 < 2; track("$i");</script>
         |<meta charset="utf-8"></head>
         |<body>
         |<!-- generated fixture $i -->
         |<header><nav>$navLinks</nav></header>
         |<h1>$heading</h1>
         |$bodyParas
         |<aside>$sideLinks</aside>
         |<footer>Copyright <a href="/tos">terms</a> 2024</footer>
         |</body></html>""".stripMargin
    val truth = (heading +: (p0truth +: paras.tail)).mkString("\n")
    // charset variation (the real-crawl tail): ~15 % of pages ship as
    // windows-1252 (bare charset or http-equiv/ISO-8859-1-labelled) or
    // UTF-16LE-with-BOM; CharsetSniff must recover the SAME truth bytes,
    // which the 1.5M-doc bench match_rate then proves at scale. Encoding
    // picks that cannot represent the text fall back to UTF-8.
    r.nextInt(20) match {
      case 0 =>
        val h2 = html.replace("<meta charset=\"utf-8\">",
          "<meta charset=\"windows-1252\">")
        val cs = java.nio.charset.Charset.forName("windows-1252")
        if (cs.newEncoder().canEncode(h2)) (h2.getBytes(cs), truth)
        else (html.getBytes(UTF_8), truth)
      case 1 =>
        // BOM outranks the (still utf-8) meta — the sniff order itself
        // is exercised
        val b = new java.io.ByteArrayOutputStream()
        b.write(0xff); b.write(0xfe)
        b.write(html.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
        (b.toByteArray, truth)
      case 2 =>
        val h2 = html.replace("<meta charset=\"utf-8\">",
          "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=ISO-8859-1\">")
        // the iso-8859-1 label decodes as windows-1252 per WHATWG
        val cs = java.nio.charset.Charset.forName("windows-1252")
        if (cs.newEncoder().canEncode(h2)) (h2.getBytes(cs), truth)
        else (html.getBytes(UTF_8), truth)
      case _ => (html.getBytes(UTF_8), truth)
    }
  }

  /** One PDF payload + ground truth (page lines, each page ends '\n'). */
  private def pdfPage(r: Random, i: Int, lang: String, boost: Int): (Array[Byte], String) = {
    val nPages = 1 + r.nextInt(25)
    val technical = r.nextInt(100) < 25
    val pages = (0 until nPages).map { p =>
      val first =
        if (p == 0 && technical) techLine
        else cap(para(r, lang, 6 + r.nextInt(6)))
      val rest = (0 until (2 + r.nextInt(4)) * boost).map(_ => cap(para(r, lang, 5 + r.nextInt(8))))
      first +: rest
    }
    // ~half the PDFs use the 1.5 layout (xref stream + ObjStm + predictor)
    // — the real-crawl majority shape — so the extraction pipes exercise
    // both parser paths end-to-end; truth is layout-independent
    val compress = r.nextBoolean()
    val bytes =
      if (r.nextBoolean()) PdfWriter.build15(pages, compress)
      else PdfWriter.build(pages, compress)
    val truth = pages.map(_.mkString("\n") + "\n").mkString
    (bytes, truth)
  }

  /** Row `i` of the indexed page stream: every row derives from its own
    * RNG seeded by (seed, i), so generation is order- and
    * partitioning-independent — the property that lets
    * [[pagesDistributed]] build the table in parallel on executors with
    * no cross-row state. Duplicates re-derive their source row by index
    * (deterministic recursion, j < i strictly decreasing).
    */
  def pageAt(i: Long, n: Long, seed: Long, boost: Int): Page = {
    val r = new Random(seed ^ (i * 0x9E3779B97F4A7C15L) ^ 0x5DEECE66DL)
    val host = zipfHost(r)
    val lang = langs(r.nextInt(langs.length))
    val ts = new Timestamp(EpochMs + (RampMs * i.toDouble / math.max(n, 1L)).toLong)
    val dup = i > 10 && r.nextInt(100) < 3
    if (dup) {
      // floorMod guards the Long.MinValue.abs == MinValue corner (a
      // negative index would make a stray never-matching "duplicate");
      // for every other draw .abs is non-negative and floorMod == %, so
      // existing fixture bytes are unchanged. The slight modulo bias of
      // .abs is accepted — the goldens freeze these exact bytes.
      val j = math.floorMod(r.nextLong().abs, i)
      val src = pageAt(j, n, seed, boost)
      Page(s"https://host$host.example.com/dup/$i", ts, src.html, src.text, src.lang)
    } else {
      val isPdf = r.nextInt(100) < 10
      val (payload, truth) =
        if (isPdf) pdfPage(r, i.toInt, lang, boost) else htmlPage(r, i.toInt, lang, boost)
      val kind = if (isPdf) "doc" else "page"
      Page(s"https://host$host.example.com/$kind/item-$i", ts, payload, truth, lang)
    }
  }

  /** Executor-parallel page table: `spark.range(n)` → [[pageAt]] per
    * index. Scales fixture generation with the cluster (the driver-side
    * [[pages]] tops out at ~10^5 rows; this is the 10^9-row path).
    */
  def pagesDistributed(spark: org.apache.spark.sql.SparkSession, n: Long,
                       seed: Long = 42L, boost: Int = 1,
                       partitions: Int = 0): org.apache.spark.sql.Dataset[Page] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism * 4
    spark.range(0, n, 1, parts).mapPartitions(_.map(i => pageAt(i, n, seed, boost)))
  }

  /** Generate `n` deterministic pages. ~10 % PDFs, ~3 % exact duplicates
    * of an earlier payload (different url, same bytes and truth).
    */
  def pages(n: Int, seed: Long = 42L, boost: Int = 1): IndexedSeq[Page] = {
    val r = new Random(seed)
    val out = new scala.collection.mutable.ArrayBuffer[Page](n)
    var i = 0
    while (i < n) {
      val host = zipfHost(r)
      val lang = langs(r.nextInt(langs.length))
      val ts = new Timestamp(EpochMs + (RampMs * i.toDouble / math.max(n, 1)).toLong)
      val dup = i > 10 && r.nextInt(100) < 3
      if (dup) {
        val src = out(r.nextInt(out.length))
        out += Page(s"https://host$host.example.com/dup/$i", ts, src.html, src.text, src.lang)
      } else {
        val isPdf = r.nextInt(100) < 10
        val (payload, truth) =
          if (isPdf) pdfPage(r, i, lang, boost) else htmlPage(r, i, lang, boost)
        val kind = if (isPdf) "doc" else "page"
        out += Page(s"https://host$host.example.com/$kind/item-$i", ts, payload, truth, lang)
      }
      i += 1
    }
    out.toIndexedSeq
  }
}
