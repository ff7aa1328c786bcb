package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.{MediaGen, PageGen}
import graft.sources.Warc

class WarcSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def fixture(n: Int, seed: Long = 77L) =
    PageGen.pages(n, seed).map(p => (p.url, p.warc_ts, p.html))

  test("warc: gzip-member archive round-trips records byte-exactly") {
    val pages = fixture(25)
    val archive = MediaGen.warcGz(pages)
    // each record is its own gzip member: the archive must contain
    // multiple gzip magics (crawl-convention random access)
    val magics = archive.sliding(2).count(w => (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b)
    assert(magics >= pages.length, s"expected per-record members, saw $magics")
    val recs = Warc.parse(archive)
    assert(recs.length === pages.length, "warcinfo record must be skipped")
    recs.zip(pages).foreach { case (r, (url, ts, html)) =>
      assert(r.url === url)
      assert(r.warcTsMs === ts.getTime)
      assert(r.httpContentType.startsWith("text/html"))
      assert(r.body.toSeq === html.toSeq, s"body drift for $url")
    }
    // clear (ungzipped) archives parse identically
    val clear = MediaGen.warcGz(pages, gzipMembers = false)
    assert(Warc.parse(clear).map(_.url) === recs.map(_.url))
  }

  test("warc: malformed archives fail loudly, not wrongly") {
    val good = MediaGen.warcGz(fixture(3), gzipMembers = false)
    intercept[Exception](Warc.parseClear("HTTP/1.1 200 OK\r\n\r\n".getBytes))
    // truncation inside a block: Content-Length now overruns
    intercept[Exception](Warc.parseClear(good.take(good.length - 40)))
    // gzip bomb guard: the amplification bound trips, no OOM
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      val zeros = new Array[Byte](1 << 20)
      (0 until 256).foreach(_ => gz.write(zeros))
      gz.finish()
      bos.toByteArray
    }
    intercept[Exception](Warc.parse(bomb))
  }

  test("warc: Spark read path feeds extraction to byte-identical truth") {
    val pages = PageGen.pages(60, seed = 78L)
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toString
    pages.grouped(20).zipWithIndex.foreach { case (grp, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/crawl-$i.warc.gz"),
        MediaGen.warcGz(grp.map(p => (p.url, p.warc_ts, p.html))))
    }
    // a corrupt file must contribute zero rows, not fail the job (C5)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/broken.warc.gz"),
      Array.fill[Byte](500)(0x42))
    val df = Warc.read(spark, s"$dir/*.warc.gz")
    assert(df.count() === pages.length)
    val extracted = graft.pipeline.Extraction.extractAll(df)
      .select($"url", $"extracted_text").as[(String, String)].collect().toMap
    val truth = pages.map(p => p.url -> p.text).toMap
    assert(extracted.keySet === truth.keySet)
    var mismatches = 0
    truth.foreach { case (url, want) =>
      if (extracted(url) != want) mismatches += 1
    }
    assert(mismatches === 0, s"$mismatches of ${truth.size} docs diverged")
  }
}
