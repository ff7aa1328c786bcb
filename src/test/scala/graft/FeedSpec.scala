package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Feed
import graft.fixtures.MediaGen

class FeedSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("rss 2.0: items, entities, CDATA descriptions, RFC 822 dates, gzip") {
    val items = Seq(
      ("Fish & Chips", "https://h.example/a", "guid-a",
        "Mon, 02 Sep 2024 08:30:00 GMT", "desc with </weird> markup"),
      ("Second", "https://h.example/b", "guid-b",
        "Tue, 03 Sep 2024 10:00:00 +0200", "plain"),
      ("NoDate", "https://h.example/c", "guid-c", "", "x"))
    val f = Feed.parse(MediaGen.rssFeed("My <Feed>", "https://h.example/", items))
    assert(f.kind === "rss")
    assert(f.title === "My <Feed>")
    assert(f.link === "https://h.example/")
    assert(f.items.length === 3)
    assert(f.items(0).title === "Fish & Chips")
    assert(f.items(0).link === "https://h.example/a")
    assert(f.items(0).id === "guid-a")
    assert(f.items(0).summary === "desc with </weird> markup",
      "CDATA must protect inner markup")
    assert(f.items(0).publishedMs ===
      java.time.Instant.parse("2024-09-02T08:30:00Z").toEpochMilli)
    assert(f.items(1).publishedMs ===
      java.time.Instant.parse("2024-09-03T08:00:00Z").toEpochMilli,
      "numeric zone offset must apply")
    assert(f.items(2).publishedMs === 0L, "missing date -> sentinel")
    // gzip'd feed parses identically
    val gz = Feed.parse(MediaGen.rssFeed("My <Feed>", "https://h.example/", items,
      gzip = true))
    assert(gz === f)
  }

  test("atom 1.0: rel=alternate wins over enclosure; W3C dates; feed link skips rel=self") {
    val entries = Seq(
      ("Post One", "https://a.example/p1", "tag:a,2024:p1",
        "2024-04-01T12:00:00Z", "sum1"),
      ("Post Two", "https://a.example/p2", "tag:a,2024:p2",
        "2024-04-02T00:30:00+01:00", "sum2"))
    val f = Feed.parse(MediaGen.atomFeed("Atom Blog", "https://a.example", entries))
    assert(f.kind === "atom")
    assert(f.title === "Atom Blog")
    assert(f.link === "https://a.example", "feed link must skip rel=self")
    assert(f.items.map(_.link) === Vector("https://a.example/p1", "https://a.example/p2"),
      "entry link must prefer rel=alternate over the earlier enclosure")
    assert(f.items(0).publishedMs ===
      java.time.Instant.parse("2024-04-01T12:00:00Z").toEpochMilli)
    assert(f.items(1).publishedMs ===
      java.time.Instant.parse("2024-04-01T23:30:00Z").toEpochMilli)
    assert(f.items.map(_.id) === Vector("tag:a,2024:p1", "tag:a,2024:p2"))
  }

  test("rss 1.0 / RDF and junk inputs") {
    val rdf = ("""<?xml version="1.0"?>
      <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
               xmlns="http://purl.org/rss/1.0/" xmlns:dc="http://purl.org/dc/elements/1.1/">
        <channel rdf:about="https://r.example/"><title>R1</title>
          <link>https://r.example/</link></channel>
        <item rdf:about="https://r.example/x"><title>X</title>
          <link>https://r.example/x</link>
          <dc:date>2024-05-05T10:00:00Z</dc:date></item>
      </rdf:RDF>""").getBytes("UTF-8")
    val f = Feed.parse(rdf)
    assert(f.kind === "rdf")
    assert(f.items === Vector(Feed.FeedItem("X", "https://r.example/x", "",
      java.time.Instant.parse("2024-05-05T10:00:00Z").toEpochMilli, "")))
    intercept[Exception](Feed.parse("<html><body>nope</body></html>".getBytes))
    intercept[Exception](Feed.parse("not xml at all".getBytes))
  }

  test("feedEntries operator: per-item rows, malformed feeds isolate (C5)") {
    val rows = Seq(
      ("h1.example", MediaGen.rssFeed("F1", "https://h1.example/", Seq(
        ("t1", "https://h1.example/a", "g1", "Mon, 02 Sep 2024 08:30:00 GMT", "d1")))),
      ("h2.example", MediaGen.atomFeed("F2", "https://h2.example", Seq(
        ("t2", "https://h2.example/p", "id2", "2024-04-01T12:00:00Z", "s2")))),
      ("bad.example", "garbage".getBytes("UTF-8")),
      ("null.example", null.asInstanceOf[Array[Byte]]))
    val got = graft.ops.CrawlPolicy.feedEntries(
      rows.toDF("host", "payload"), "host", "payload")
      .select($"host", $"feed_kind", $"loc", $"published_ms")
      .as[(String, String, String, Long)].collect().sortBy(_._1)
    assert(got.length === 2)
    assert(got(0) === (("h1.example", "rss", "https://h1.example/a",
      java.time.Instant.parse("2024-09-02T08:30:00Z").toEpochMilli)))
    assert(got(1) === (("h2.example", "atom", "https://h2.example/p",
      java.time.Instant.parse("2024-04-01T12:00:00Z").toEpochMilli)))
  }
}
