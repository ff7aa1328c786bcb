package graft.fixtures

import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

/** Deterministic pages rich in STRUCTURE — tables, OpenGraph/meta tags,
  * canonical links, JSON-LD — the complement of [[PageGen]]'s
  * boilerplate/main-text grammar. [[graft.ops.Structured]] reads these
  * back out; the generator returns the expected structure alongside the
  * bytes so specs can assert full round-trips without frozen goldens.
  *
  * Same determinism contract as PageGen: row `i` derives only from
  * `(seed, i)`, so generation is order- and partitioning-independent.
  */
object StructuredGen {

  final case class StructuredPage(doc_id: Long, url: String, html: Array[Byte],
                                  n_tables: Int, n_rows: Int, n_meta: Int,
                                  n_json_ld: Int, og_title: String)

  private val words = IndexedSeq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "metric", "units", "total")

  def pageAt(i: Long, seed: Long): StructuredPage = {
    val r = new Random(seed ^ (i * 0x9E3779B97F4A7C15L) ^ 0x2545F4914F6CDD1DL)
    val nTables = 1 + r.nextInt(3)
    var totalRows = 0
    val tables = (0 until nTables).map { t =>
      val cols = 2 + r.nextInt(3)
      val rows = 2 + r.nextInt(5)
      totalRows += rows
      val caption =
        if (r.nextBoolean()) s"<caption>Table $t &amp; notes</caption>" else ""
      val header = "<tr>" + (0 until cols)
        .map(c => s"<th>${words(r.nextInt(words.length))} $c</th>").mkString + "</tr>"
      val body = (0 until rows).map { ri =>
        "<tr>" + (0 until cols)
          .map(c => s"<td>${words(r.nextInt(words.length))} $ri-$c</td>").mkString + "</tr>"
      }.mkString("\n")
      s"<table>$caption\n$header\n$body</table>"
    }.mkString("\n")
    val ogTitle = s"Structured doc $i"
    val metas = Seq(
      s"""<meta property="og:title" content="$ogTitle">""",
      s"""<meta property="og:type" content="article">""",
      s"""<meta name="description" content="Fixture page $i with tables">""")
    val nLd = r.nextInt(2)
    val ld =
      if (nLd == 1)
        s"""<script type="application/ld+json">{"@type":"Dataset","id":$i}</script>"""
      else ""
    val html =
      s"""<!DOCTYPE html>
         |<html><head><title>Doc $i</title>
         |${metas.mkString("\n")}
         |<link rel="canonical" href="https://structured.example.com/doc/$i">
         |$ld
         |</head><body>
         |<h1>$ogTitle</h1>
         |$tables
         |</body></html>""".stripMargin
    StructuredPage(i, s"https://structured.example.com/doc/$i",
      html.getBytes(UTF_8), nTables, totalRows, metas.length, nLd, ogTitle)
  }

  def pages(n: Int, seed: Long = 42L): IndexedSeq[StructuredPage] =
    (0 until n).map(i => pageAt(i.toLong, seed))
}
