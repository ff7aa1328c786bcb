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

  test("wet sink: conversion archives round-trip text byte-exactly, valid grammar, per-record members") {
    val pages = PageGen.pages(50, seed = 79L)
    val dir = java.nio.file.Files.createTempDirectory("graft-wet").toString
    val pagesDf = spark.createDataset(pages).toDF()
    val docs = graft.pipeline.Extraction.extractAll(pagesDf)
      .join(pagesDf.select($"url", $"warc_ts"), Seq("url"))
      .select($"url", $"warc_ts", $"extracted_text").repartition(3)
    val written = Warc.writeConversions(docs, dir)
    assert(written === pages.length)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.length === 3)
    // per-record gzip members (crawl-convention random access)
    val oneFile = java.nio.file.Files.readAllBytes(files.head.toPath)
    val magics = oneFile.sliding(2).count(w => (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b)
    val strictRecs = Warc.parse(oneFile) // STRICT parse: grammar must hold
    assert(magics === strictRecs.length && strictRecs.nonEmpty)
    assert(strictRecs.forall(r => r.warcType == "conversion" &&
      r.httpContentType.startsWith("text/plain")))
    // the byte-identity contract: parse-back == the column that was written
    val back = Warc.readConversions(spark, s"$dir/*.warc.gz")
      .select($"url", $"text").as[(String, String)].collect().toMap
    val want = docs.select($"url", $"extracted_text")
      .as[(String, String)].collect().toMap
    assert(back === want)
    // timestamps survive (no wall clock in the record grammar)
    val ts = Warc.readConversions(spark, s"$dir/*.warc.gz")
      .select($"url", $"warc_ts").as[(String, java.sql.Timestamp)].collect().toMap
    pages.foreach(p => assert(ts(p.url) === p.warc_ts))
    // read() must NOT surface conversion records as crawl pages
    assert(Warc.read(spark, s"$dir/*.warc.gz").count() === 0L)
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
