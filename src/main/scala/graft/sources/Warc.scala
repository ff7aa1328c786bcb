package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
  * Parsing is STREAMING: records are produced lazily off a (gunzipping)
  * InputStream, so a ~1 GB crawl archive whose records decompress to
  * several GB never materializes — only one record's block is in memory
  * at a time (bounded by [[MaxRecordBytes]]; a crafted Content-Length
  * fails the record, it cannot balloon the heap).
  *
  * [[read]] exposes the archive as the engine's canonical page shape
  * `(url, warc_ts, html)` via Spark's `binaryFile` source + a lazy
  * `flatMap` — file-level parallelism, no driver-side I/O. One WARC
  * file becomes one task (crawl convention sizes them ~1 GB for
  * exactly this reason); C5 isolation applies per file: a corrupt
  * archive yields its good prefix of records rather than killing the
  * job.
  */
object Warc {

  final case class WarcRecord(url: String, warcTsMs: Long,
                              httpContentType: String, body: Array[Byte],
                              warcType: String = "response")

  final class WarcError(msg: String) extends RuntimeException(msg)

  /** Per-record block ceiling (256 MiB): no real crawl response comes
    * close, and a crafted Content-Length must not allocate the heap.
    */
  val MaxRecordBytes: Long = 1L << 28

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Parse one WARC file's bytes (gzip'd or clear) into response
    * records, strictly: malformed data raises [[WarcError]]. The Spark
    * path ([[read]]) uses the lazy [[parseStream]] with good-prefix
    * semantics instead.
    */
  def parse(bytes: Array[Byte]): Vector[WarcRecord] = {
    val in = open(bytes)
    try parseStream(in).toVector finally in.close()
  }

  def parseClear(data: Array[Byte]): Vector[WarcRecord] = {
    val in = new java.io.ByteArrayInputStream(data)
    try parseStream(in).toVector finally in.close()
  }

  private def open(bytes: Array[Byte]): java.io.InputStream = {
    val base = new java.io.ByteArrayInputStream(bytes)
    if (isGzip(bytes)) new java.util.zip.GZIPInputStream(base, 64 * 1024) else base
  }

  /** Lazy record iterator over a WARC stream. Throws [[WarcError]] from
    * `hasNext` on structural violations (callers wanting good-prefix
    * tolerance wrap with [[goodPrefix]]).
    */
  def parseStream(in0: java.io.InputStream): Iterator[WarcRecord] = {
    val in = new java.io.BufferedInputStream(in0, 64 * 1024)

    // CRLF (or LF) terminated line as ISO-8859-1; None at clean EOF.
    // Bounded: a header line past 64 KiB is not WARC (and an unbounded
    // reader would be the decompression-bomb vector the streaming
    // design otherwise eliminates)
    def readLine(): Option[String] = {
      val sb = new java.lang.StringBuilder(64)
      var b = in.read()
      if (b < 0) return None
      while (b >= 0 && b != '\n') {
        sb.append(b.toChar)
        if (sb.length > 64 * 1024) throw new WarcError("unterminated header line")
        b = in.read()
      }
      var e = sb.length
      if (e > 0 && sb.charAt(e - 1) == '\r') e -= 1
      Some(sb.substring(0, e))
    }
    def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val k = in.read(buf, off, n - off)
        if (k < 0) throw new WarcError("truncated record block")
        off += k
      }
      buf
    }

    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false

      private def advance(): Unit = {
        while (nextRec == null && !done) {
          // tolerate inter-record blank lines
          var line: Option[String] = readLine()
          while (line.contains("")) line = readLine()
          line match {
            case None => done = true
            case Some(version) =>
              if (!version.startsWith("WARC/"))
                throw new WarcError(s"expected WARC version line, got '${version.take(40)}'")
              var warcType = ""
              var uri = ""
              var date = ""
              var recContentType = ""
              var contentLength = -1L
              var hdr = readLine().getOrElse(throw new WarcError("EOF in record headers"))
              while (hdr.nonEmpty) {
                val c = hdr.indexOf(':')
                if (c > 0) {
                  val k = hdr.substring(0, c).trim.toLowerCase
                  val v = hdr.substring(c + 1).trim
                  k match {
                    case "warc-type" => warcType = v
                    case "warc-target-uri" => uri = v
                    case "warc-date" => date = v
                    case "content-type" => recContentType = v
                    case "content-length" => contentLength = v.toLong
                    case _ =>
                  }
                }
                hdr = readLine().getOrElse(throw new WarcError("EOF in record headers"))
              }
              if (contentLength < 0 || contentLength > MaxRecordBytes)
                throw new WarcError(s"bad Content-Length $contentLength")
              val block = readFully(contentLength.toInt)
              if (warcType == "conversion" && uri.nonEmpty) {
                // WET-style conversion record: the block IS the payload
                // (no HTTP message to strip); content type comes from the
                // record's own Content-Type field
                val tsMs =
                  try java.time.Instant.parse(date).toEpochMilli
                  catch { case _: Exception => 0L }
                nextRec = WarcRecord(uri, tsMs, recContentType, block, "conversion")
              } else if (warcType == "response" && uri.nonEmpty) {
                var hdrEnd = 0
                var found = false
                while (!found && hdrEnd + 3 < block.length) {
                  if (block(hdrEnd) == '\r' && block(hdrEnd + 1) == '\n' &&
                    block(hdrEnd + 2) == '\r' && block(hdrEnd + 3) == '\n') found = true
                  else hdrEnd += 1
                }
                val (bodyStart, headers) =
                  if (found)
                    (hdrEnd + 4, new String(block, 0, hdrEnd,
                      java.nio.charset.StandardCharsets.ISO_8859_1))
                  else (0, "") // headerless block: whole block is body
                val ct = headers.linesIterator
                  .find(_.toLowerCase.startsWith("content-type:"))
                  .map(_.substring("content-type:".length).trim).getOrElse("")
                val tsMs =
                  try java.time.Instant.parse(date).toEpochMilli
                  catch { case _: Exception => 0L }
                nextRec = WarcRecord(uri, tsMs, ct,
                  java.util.Arrays.copyOfRange(block, bodyStart, block.length))
              } // non-response records: loop to the next one
          }
        }
      }

      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Good-prefix wrapper: iteration stops at the first structural error
    * (incl. gzip corruption surfacing mid-stream) instead of failing the
    * task — the C5 rule at record granularity. The underlying stream is
    * CLOSED as soon as the iterator is exhausted or dies: a
    * GZIPInputStream holds a native zlib Inflater that is otherwise only
    * released at finalization, and executors churning through many
    * archives (or bailing early on corrupt ones) would accumulate native
    * memory between GCs.
    */
  private def goodPrefix[A](it: => Iterator[A], in: java.io.InputStream): Iterator[A] = {
    val inner = try it catch { case _: Exception => closeQuietly(in); Iterator.empty }
    new Iterator[A] {
      private var dead = false
      private def die(): Unit = { dead = true; closeQuietly(in) }
      override def hasNext: Boolean =
        !dead && (try {
          val h = inner.hasNext
          if (!h) die()
          h
        } catch { case _: Exception => die(); false })
      override def next(): A =
        try inner.next() catch { case e: Exception => die(); throw e }
    }
  }

  private def closeQuietly(in: java.io.InputStream): Unit =
    try in.close() catch { case _: Exception => }

  /** Passes close() through as flush() only — lets a per-member
    * GZIPOutputStream be close()d (releasing its native Deflater)
    * without closing the underlying archive stream.
    */
  private final class CloseShieldOutputStream(out: java.io.OutputStream)
      extends java.io.FilterOutputStream(out) {
    // FilterOutputStream.write(b,off,len) loops single bytes — forward
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      out.write(b, off, len)
    override def close(): Unit = out.flush()
  }

  /** Read WARC archives as the engine's page shape
    * `(url STRING, warc_ts TIMESTAMP, html BINARY)`. Corrupt data
    * contributes its good prefix of records (possibly zero) instead of
    * failing the job; feed the result straight to
    * [[graft.pipeline.Extraction.extractAll]].
    */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select($"path", $"content").as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        val in = open(bytes)
        goodPrefix(parseStream(in), in)
          .filter(_.warcType == "response")
          .map(r => (r.url, new java.sql.Timestamp(r.warcTsMs), r.body))
      }
      .toDF("url", "warc_ts", "html")
  }

  // ------------------------------------------ WET-style conversion sink

  /** One `conversion` record (the WET sidecar grammar: ISO 28500 §6.8 —
    * the re-encoded content of a prior response record): version line,
    * WARC named fields, blank line, UTF-8 text block, record terminator.
    */
  def conversionRecord(url: String, tsMs: Long, text: String): Array[Byte] = {
    val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val date = java.time.Instant.ofEpochMilli(tsMs).toString
    val hdr = Seq(
      "WARC/1.1",
      "WARC-Type: conversion",
      s"WARC-Target-URI: $url",
      s"WARC-Date: $date",
      s"Content-Length: ${body.length}",
      "Content-Type: text/plain; charset=UTF-8",
      "").mkString("", "\r\n", "\r\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    hdr ++ body ++ "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Write extracted documents back out as WET-style `.warc.gz` archives
    * — crawl-in/crawl-out symmetry: the corpus leaves the engine in the
    * same container it arrived in, one gzip member per record (the crawl
    * convention [[read]] relies on), one archive per partition, written
    * through the Hadoop FileSystem API straight from the executors (no
    * driver collect; repartition upstream to size archives ~1 GB at
    * corpus scale). Timestamps come from the rows' `warc_ts` — no wall
    * clock, so output bytes are deterministic. Each attempt writes an
    * attempt-scoped temp file and renames on success, so retries and
    * speculative duplicates never interleave bytes in the committed
    * name. Returns records written.
    *
    * `docs` must carry `url`, `warc_ts`, `extracted_text`.
    */
  def writeConversions(docs: DataFrame, dir: String): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(
        new org.apache.hadoop.fs.Path(dir))
    // the SESSION's Hadoop conf must reach the executors (it carries
    // filesystem credentials/endpoints a default Configuration loses);
    // SerializableConfiguration is Spark's own wrapper for exactly this
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val counts = docs
      .select($"url", $"warc_ts", $"extracted_text")
      .as[(String, java.sql.Timestamp, String)]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val fin = new org.apache.hadoop.fs.Path(dir, f"wet-$pid%05d.warc.gz")
          // attempt-scoped temp + rename-on-success: a speculative or
          // zombie duplicate attempt writes its OWN temp file, so two
          // attempts never interleave bytes in the final name; the
          // committed file is always one attempt's complete output
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f".wet-$pid%05d.attempt-${tc.taskAttemptId()}.tmp")
          val fs = fin.getFileSystem(confBc.value.value)
          val out = fs.create(tmp, true)
          var n = 0L
          try {
            it.foreach { case (url, ts, text) =>
              // close() per member releases the native Deflater (finish()
              // alone leaves it for finalization — one leaked zlib buffer
              // per record); the shield keeps the file stream open
              val gz = new java.util.zip.GZIPOutputStream(
                new CloseShieldOutputStream(out), 64 * 1024)
              gz.write(conversionRecord(url, ts.getTime, text))
              gz.close()
              n += 1
            }
          } finally out.close()
          if (fs.exists(fin)) fs.delete(fin, false)
          require(fs.rename(tmp, fin), s"commit rename failed for $fin")
          Iterator.single(n)
        }
      }
    counts.collect().sum
  }

  // ------------------------------------------ CDX random-access index
  /** Byte spans of the gzip MEMBERS of a multi-member archive:
    * `(offset, length)` per member. Headers parsed per RFC 1952
    * (FEXTRA / FNAME / FCOMMENT / FHCRC all handled); each member's
    * compressed extent is measured by the raw `Inflater`'s
    * bytes-consumed plus the 8-byte CRC/ISIZE trailer — the exact spans
    * a ranged read needs, with no reliance on magic-byte scanning
    * (`1f 8b` can occur INSIDE compressed data).
    */
  def gzipMemberOffsets(bytes: Array[Byte]): Vector[(Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long)]
    var pos = 0
    val buf = new Array[Byte](64 * 1024)
    while (pos < bytes.length) {
      val start = pos
      if (pos + 10 > bytes.length || (bytes(pos) & 0xff) != 0x1f ||
          (bytes(pos + 1) & 0xff) != 0x8b || (bytes(pos + 2) & 0xff) != 8)
        throw new IllegalArgumentException(s"not a gzip member at offset $pos")
      val flg = bytes(pos + 3) & 0xff
      var p = pos + 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, p, bytes.length - p)
        while (!inf.finished()) {
          if (inf.inflate(buf) == 0 && inf.needsInput())
            throw new IllegalArgumentException(s"truncated deflate stream at member $start")
        }
        val end = p + inf.getBytesRead.toInt + 8 // CRC32 + ISIZE
        if (end > bytes.length)
          throw new IllegalArgumentException(s"member at $start overruns the archive")
        out += ((start.toLong, (end - start).toLong))
        pos = end
      } finally inf.end()
    }
    out.result()
  }

  /** Build a CDX-style index over `.warc.gz` archives: ONE row per
    * record — `(surt, url, warc_ts, warc_type, file, offset, length,
    * digest)` — the Common-Crawl-index shape that turns a 100 TB pile
    * of sequential archives into a randomly addressable corpus: look up
    * a url's row (SURT-sorted, zone-map-able), then fetch exactly
    * `[offset, offset+length)` of one file ([[readRecordAt]]) instead of
    * scanning the archive. Digest is sha-256 hex of the record body.
    */
  def buildCdx(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        // C5 isolation, matching read(): a corrupt / non-gzip archive
        // contributes zero rows instead of failing the job, and a
        // corrupt record stops only its own member's tail
        val members =
          try gzipMemberOffsets(bytes)
          catch { case _: Exception => Vector.empty[(Long, Long)] }
        members.iterator.flatMap { case (off, len) =>
          val member = java.util.Arrays.copyOfRange(
            bytes, off.toInt, (off + len).toInt)
          val recs =
            try {
              val in = open(member)
              try parseStream(in).toVector finally in.close()
            } catch { case _: Exception => Vector.empty[WarcRecord] }
          // rec_idx disambiguates MULTI-record members (whole-file-gzip
          // archives): gzip offers no mid-member random access, so the
          // span names the member and rec_idx the record within it
          recs.zipWithIndex.map { case (r, ri) =>
            val digest = java.security.MessageDigest.getInstance("SHA-256")
              .digest(r.body).map(b => f"$b%02x").mkString
            (graft.kernel.UrlNorm.surt(r.url), r.url,
              new java.sql.Timestamp(r.warcTsMs), r.warcType,
              path, off, len, ri, digest)
          }
        }
      }
      .toDF("surt", "url", "warc_ts", "warc_type", "file", "offset", "length",
        "rec_idx", "digest")
  }

  /** Ranged random access: read ONLY `[offset, offset+length)` of one
    * archive (Hadoop `FSDataInputStream.readFully` — a positioned read,
    * not a scan), decompress that member and return its `recIdx`-th
    * record (0 for the crawl convention of one record per member;
    * `buildCdx`'s `rec_idx` column for whole-file-gzip archives, whose
    * single member is the unavoidable decompression unit).
    */
  def readRecordAt(spark: SparkSession, file: String, offset: Long,
                   length: Long, recIdx: Int = 0): WarcRecord = {
    val path = new org.apache.hadoop.fs.Path(
      if (file.startsWith("file:") || file.contains("://")) file else s"file:$file")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buf = new Array[Byte](length.toInt)
    val in = fs.open(path)
    try in.readFully(offset, buf, 0, length.toInt) finally in.close()
    val stream = open(buf)
    val recs = try parseStream(stream).toVector finally stream.close()
    if (recIdx < 0 || recIdx >= recs.length)
      throw new IllegalArgumentException(
        s"no record $recIdx at $file@$offset+$length (${recs.length} present)")
    recs(recIdx)
  }

  /** Read WET-style archives back as `(url, warc_ts, text)` — the
    * parse-back half of the byte-identity check on [[writeConversions]]
    * (WarcSpec asserts read-back text == the column that was written).
    */
  def readConversions(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select($"path", $"content").as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        val in = open(bytes)
        goodPrefix(parseStream(in), in)
          .filter(_.warcType == "conversion")
          .map(r => (r.url, new java.sql.Timestamp(r.warcTsMs),
            new String(r.body, java.nio.charset.StandardCharsets.UTF_8)))
      }
      .toDF("url", "warc_ts", "text")
  }
}
