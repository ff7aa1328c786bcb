package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Sitemap
import graft.ops.CrawlPolicy

class SitemapSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://example.com/a?x=1&amp;y=2</loc>
      |    <lastmod>2025-03-04</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc><![CDATA[https://example.com/cdata]]></loc>
      |    <lastmod>2025-03-04T10:15:30+01:00</lastmod></url>
      |  <url><lastmod>2025-01-01</lastmod></url><!-- loc missing: dropped -->
      |</urlset>""".stripMargin

  test("urlset: entities, CDATA, both lastmod forms, defaults; loc-less dropped") {
    val f = Sitemap.parse(urlset.getBytes("UTF-8"))
    assert(!f.isIndex && f.entries.size === 2)
    val e0 = f.entries(0)
    assert(e0.loc === "https://example.com/a?x=1&y=2")
    assert(e0.lastmodMs === java.time.LocalDate.of(2025, 3, 4)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    assert(e0.changefreq === "daily" && e0.priority === 0.8)
    val e1 = f.entries(1)
    assert(e1.loc === "https://example.com/cdata")
    assert(e1.lastmodMs === java.time.OffsetDateTime
      .parse("2025-03-04T10:15:30+01:00").toInstant.toEpochMilli)
    assert(e1.priority === -1.0 && e1.changefreq === "")
    // gzip transparently unwraps
    val g = Sitemap.parse(gzip(urlset.getBytes("UTF-8")))
    assert(g.entries.map(_.loc) === f.entries.map(_.loc))
  }

  test("sitemapindex, namespace prefixes, malformed inputs") {
    val index =
      """<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sm:sitemap><sm:loc>https://example.com/sitemap-1.xml.gz</sm:loc>
        |    <sm:lastmod>2024-12-31</sm:lastmod></sm:sitemap>
        |  <sm:sitemap><sm:loc>https://example.com/sitemap-2.xml</sm:loc></sm:sitemap>
        |</sm:sitemapindex>""".stripMargin
    val f = Sitemap.parse(index.getBytes("UTF-8"))
    assert(f.isIndex && f.entries.size === 2)
    assert(f.entries.map(_.loc) === Vector(
      "https://example.com/sitemap-1.xml.gz", "https://example.com/sitemap-2.xml"))
    // malformed: wrong root, no XML, truncated tag
    intercept[IllegalArgumentException](Sitemap.parse("<rss></rss>".getBytes))
    intercept[IllegalArgumentException](Sitemap.parse("plain text".getBytes))
    intercept[IllegalArgumentException](Sitemap.parse("<urlset><url><loc".getBytes))
    // unparseable lastmod is a 0 sentinel, not a throw
    val weird = "<urlset><url><loc>https://e.com/</loc><lastmod>yesterday</lastmod></url></urlset>"
    assert(Sitemap.parse(weird.getBytes).entries.head.lastmodMs === 0L)
  }

  test("sitemapEntries: per-host expansion over binary payloads, corrupt rows dropped") {
    val rows = Seq(
      ("example.com", urlset.getBytes("UTF-8")),
      ("gz.example.com", gzip(urlset.getBytes("UTF-8"))),
      ("broken.example.com", "not xml at all".getBytes),
      ("null.example.com", null.asInstanceOf[Array[Byte]]))
      .toDF("host", "payload")
    val out = CrawlPolicy.sitemapEntries(rows, "host", "payload")
      .as[(String, String, Long, String, Double, Boolean)].collect()
    assert(out.length === 4) // 2 entries x 2 parseable hosts
    assert(out.forall(!_._6))
    assert(out.map(_._1).toSet === Set("example.com", "gz.example.com"))
  }
}
