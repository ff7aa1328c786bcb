package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (ISO 28500) source — the container real Common-Crawl-style
  * corpora actually arrive in, so a user can point the engine at crawl
  * archives directly instead of pre-converted parquet. (The reference
  * app ingests uploads over HTTP, `/root/reference/app/api/routes.py:19`;
  * at the north rule's 10^12-document scale the wire format is WARC.)
  *
  * Format facts this parser implements from the spec:
  *  - a WARC file is a sequence of records: `WARC/1.x` version line,
  *    CRLF-terminated named header fields, an empty line, then exactly
  *    `Content-Length` bytes of block, then CRLFCRLF;
  *  - crawl archives gzip EACH RECORD as its own member and concatenate
  *    the members (the member boundaries are what make per-record random
  *    access possible); `java.util.zip.GZIPInputStream` decodes
  *    concatenated members natively;
  *  - `response` records carry an HTTP response as their block: status
  *    line + headers + CRLFCRLF + payload. The page bytes are the
  *    payload; everything else (`warcinfo`, `request`, `metadata`
  *    records) is skipped.
  *
  * [[read]] exposes the archive as the engine's canonical page shape
  * `(url, warc_ts, html)` via Spark's `binaryFile` source + a
  * `flatMap` — file-level parallelism, no driver-side I/O. One WARC
  * file becomes one task (crawl convention sizes them ~1 GB for
  * exactly this reason); C5 isolation applies per file: a corrupt
  * archive yields its good prefix rather than killing the job.
  */
object Warc {

  final case class WarcRecord(url: String, warcTsMs: Long,
                              httpContentType: String, body: Array[Byte])

  final class WarcError(msg: String) extends RuntimeException(msg)

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Inflate a (possibly multi-member) gzip stream, bounded: refuse
    * payloads amplifying past 1024x or 1 GiB (crafted-archive guard,
    * same class as the FLAC/PNG bounds).
    */
  private[sources] def gunzip(b: Array[Byte]): Array[Byte] = {
    val cap = math.min(1L << 30, math.max(1L << 16, b.length.toLong * 1024))
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b), 64 * 1024)
    val out = new java.io.ByteArrayOutputStream(math.min(cap, b.length.toLong * 8).toInt)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n > 0) {
      out.write(buf, 0, n)
      if (out.size() > cap) throw new WarcError("gzip amplification bound exceeded")
      n = in.read(buf)
    }
    in.close()
    out.toByteArray
  }

  /** Parse one WARC file's bytes (gzip'd or clear) into response
    * records. Malformed data raises [[WarcError]]; the Spark path wraps
    * per-file (C5).
    */
  def parse(bytes: Array[Byte]): Vector[WarcRecord] =
    parseClear(if (isGzip(bytes)) gunzip(bytes) else bytes)

  def parseClear(data: Array[Byte]): Vector[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < data.length && data(i) != '\n') i += 1
      i
    }
    def lineAt(from: Int): (String, Int) = {
      val e = lineEnd(from)
      val trim = if (e > from && data(e - 1) == '\r') e - 1 else e
      (new String(data, from, trim - from, java.nio.charset.StandardCharsets.ISO_8859_1),
        math.min(e + 1, data.length))
    }
    while (pos < data.length) {
      // tolerate inter-record CRLFs
      while (pos < data.length && (data(pos) == '\r' || data(pos) == '\n')) pos += 1
      if (pos >= data.length) return out.result()
      val (version, afterVersion) = lineAt(pos)
      if (!version.startsWith("WARC/"))
        throw new WarcError(s"expected WARC version line at offset $pos")
      pos = afterVersion
      var warcType = ""
      var uri = ""
      var date = ""
      var contentLength = -1L
      var line = ""
      var cont = true
      while (cont) {
        val (l, next) = lineAt(pos)
        line = l
        pos = next
        if (line.isEmpty) cont = false
        else {
          val c = line.indexOf(':')
          if (c > 0) {
            val k = line.substring(0, c).trim.toLowerCase
            val v = line.substring(c + 1).trim
            k match {
              case "warc-type" => warcType = v
              case "warc-target-uri" => uri = v
              case "warc-date" => date = v
              case "content-length" => contentLength = v.toLong
              case _ =>
            }
          }
        }
      }
      if (contentLength < 0 || pos + contentLength > data.length)
        throw new WarcError("bad or truncated Content-Length")
      val blockStart = pos
      val blockEnd = (pos + contentLength).toInt
      pos = blockEnd
      if (warcType == "response" && uri.nonEmpty) {
        // HTTP response block: strip status line + headers
        var hdrEnd = blockStart
        var found = false
        while (!found && hdrEnd + 3 < blockEnd) {
          if (data(hdrEnd) == '\r' && data(hdrEnd + 1) == '\n' &&
            data(hdrEnd + 2) == '\r' && data(hdrEnd + 3) == '\n') found = true
          else hdrEnd += 1
        }
        val (bodyStart, headers) =
          if (found)
            (hdrEnd + 4, new String(data, blockStart, hdrEnd - blockStart,
              java.nio.charset.StandardCharsets.ISO_8859_1))
          else (blockStart, "") // headerless block: treat whole block as body
        val ct = headers.linesIterator
          .find(_.toLowerCase.startsWith("content-type:"))
          .map(_.substring("content-type:".length).trim).getOrElse("")
        val tsMs =
          try java.time.Instant.parse(date).toEpochMilli
          catch { case _: Exception => 0L }
        out += WarcRecord(uri, tsMs,
          ct, java.util.Arrays.copyOfRange(data, bodyStart, blockEnd))
      }
    }
    out.result()
  }

  /** Read WARC archives as the engine's page shape
    * `(url STRING, warc_ts TIMESTAMP, html BINARY)`. Corrupt files
    * contribute zero rows instead of failing the job (C5 at file
    * granularity); feed the result straight to
    * [[graft.pipeline.Extraction.extractAll]].
    */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select($"path", $"content").as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        val recs = try parse(bytes) catch { case _: Exception => Vector.empty }
        recs.iterator.map(r => (r.url, new java.sql.Timestamp(r.warcTsMs), r.body))
      }
      .toDF("url", "warc_ts", "html")
  }
}
