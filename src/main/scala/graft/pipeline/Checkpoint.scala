package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-emulating layout + checkpoint/lineage/metrics tables
  * (SURVEY.md §2-C7/C8/B6; the Iceberg runtime jar is not available in
  * this sandbox, so the partition spec `days(warc_ts) × bucket(url, N)` is
  * emulated with Hive-style directories and an explicit manifest table).
  *
  * Semantics carried over from the reference:
  *  - content-hash memoization with TTL → the `checkpoint_results` cache
  *    consumed by [[Extraction.extractChunks]] (`cache_manager.py:31-79`);
  *  - idempotent resume: re-runs skip already-committed partitions via a
  *    LEFT ANTI join against the manifest (the cache-hit short-circuit of
  *    `ocr.py:34-37`, lifted to partition granularity per the north rule);
  *  - per-partition lineage + metrics rows (docs, bytes in/out, classifier
  *    block counts, failures) — the Spark analog of the reference's memory
  *    /timing instrumentation (`pdf_splitter.py:31-44`, `ocr.py:218-222`).
  */
object Checkpoint {

  /** Iceberg `bucket(url, N)` emulation width. */
  val NumBuckets = 8

  /** Partition columns: `days(warc_ts)` × `bucket(url, N)`. `hash` is
    * Spark's Murmur3 — stable across runs/sessions, so bucket assignment
    * is deterministic (required for resume correctness).
    */
  def withPartitionCols(pages: DataFrame, buckets: Int = NumBuckets): DataFrame =
    pages
      .withColumn("ts_day", to_date(col("warc_ts")))
      .withColumn("url_bucket", pmod(hash(col("url")), lit(buckets)))

  /** C8: resume anti-join — keep only pages whose partition has no
    * committed manifest row. Partition-pruned at the Parquet scan when
    * `pages` is read from the partitioned layout.
    */
  def resume(pages: DataFrame, manifest: DataFrame): DataFrame =
    withPartitionCols(pages).join(
      manifest.select(col("ts_day"), col("url_bucket")).distinct(),
      Seq("ts_day", "url_bucket"), "left_anti")

  /** Lineage manifest rows for a completed run over `pagesPart`
    * (must carry ts_day/url_bucket). `committed_ts` is injected, never
    * wall-clock — determinism contract (reference timestamps are
    * nondeterministic and excluded from identity, `ocr.py:68`).
    */
  def manifestRows(pagesPart: DataFrame, runId: String, runTs: Timestamp,
                   outRoot: String): DataFrame =
    pagesPart.groupBy(col("ts_day"), col("url_bucket"))
      .agg(count(lit(1)).as("docs"))
      .withColumn("run_id", lit(runId))
      .withColumn("committed_ts", lit(runTs))
      .withColumn("path", concat(lit(outRoot), lit("/ts_day="), col("ts_day"),
        lit("/url_bucket="), col("url_bucket")))

  /** B6: per-partition extraction metrics. `octet_length` gives exact
    * byte counts (UTF-8 for text, raw for binary).
    */
  def metrics(pagesPart: DataFrame, docs: DataFrame, runId: String): DataFrame = {
    val in = pagesPart.select(col("url"), col("ts_day"), col("url_bucket"),
      octet_length(col("html")).cast("long").as("bytes_in"))
    val out = docs.select(col("url"),
      octet_length(col("extracted_text")).cast("long").as("bytes_out"),
      col("content_blocks"), col("boiler_blocks"),
      (!col("ok")).cast("long").as("failed"))
    in.join(out, Seq("url"))
      .groupBy(col("ts_day"), col("url_bucket"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("bytes_in")).as("bytes_in"),
        sum(col("bytes_out")).as("bytes_out"),
        sum(col("content_blocks")).as("content_blocks"),
        sum(col("boiler_blocks")).as("boiler_blocks"),
        sum(col("failed")).as("failed"))
      .withColumn("run_id", lit(runId))
  }

  /** Fused per-row extraction that threads the partition columns through
    * the typed stage (no post-extraction rejoin on url) and measures each
    * document's extraction nanos task-side — the `extract_ns` column feeds
    * the B6 wall-clock/docs-per-sec metrics and is dropped before the
    * document sink (instrumentation, not data; nondeterministic by nature
    * and excluded from the byte-identity contract like all timestamps).
    */
  def extractParted(pagesPart: DataFrame): DataFrame = {
    val spark = pagesPart.sparkSession
    import spark.implicits._
    pagesPart
      .select(col("url"), col("html"), col("ts_day"), col("url_bucket"))
      .as[(String, Array[Byte], java.sql.Date, Int)]
      .mapPartitions(_.map { case (url, html, day, bucket) =>
        val t0 = System.nanoTime()
        val d = Extraction.extractDoc(RawDoc(url, html))
        (d, day, bucket, System.nanoTime() - t0)
      })
      .select(col("_1.*"), col("_2").as("ts_day"), col("_3").as("url_bucket"),
        col("_4").as("extract_ns"))
      .withColumn("document_type", Extraction.documentType(col("labels")))
  }

  /** [[metrics]] for outputs that already carry the partition columns
    * (the [[run]] path): both sides aggregate to per-partition rows FIRST
    * and join those (tens of rows), instead of joining every document on
    * url — at corpus scale that per-url join is a full shuffle of the
    * extracted text. `docsParted` must carry `extract_ns`
    * ([[extractParted]]); `wall_ms` is the partition's summed extraction
    * time and `docs_per_sec = docs / wall_seconds` — the per-partition
    * "docs/sec" the north rule names in its metrics-table wording.
    */
  def metricsParted(pagesPart: DataFrame, docsParted: DataFrame,
                    runId: String): DataFrame = {
    val keys = Seq("ts_day", "url_bucket")
    val inAgg = pagesPart.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("docs"),
        sum(octet_length(col("html")).cast("long")).as("bytes_in"))
    val outAgg = docsParted.groupBy(keys.map(col): _*)
      .agg(sum(octet_length(col("extracted_text")).cast("long")).as("bytes_out"),
        sum(col("content_blocks")).as("content_blocks"),
        sum(col("boiler_blocks")).as("boiler_blocks"),
        sum((!col("ok")).cast("long")).as("failed"),
        sum(col("extract_ns")).as("extract_ns"))
    inAgg.join(outAgg, keys)
      .select(col("ts_day"), col("url_bucket"), col("docs"), col("bytes_in"),
        col("bytes_out"), col("content_blocks"), col("boiler_blocks"), col("failed"),
        round(col("extract_ns") / 1e6, 3).as("wall_ms"),
        round(col("docs") / greatest(col("extract_ns"), lit(1L)).cast("double") * 1e9, 1)
          .as("docs_per_sec"))
      .withColumn("run_id", lit(runId))
  }

  /** A7/F2: the manifest listing — newest commit first (the reference's
    * mtime-desc file listing, `routes.py:44-60`).
    */
  def listing(manifest: DataFrame): DataFrame =
    manifest.orderBy(desc("committed_ts"), asc("path")).select(col("path"), col("committed_ts"))

  /** Write the page table in the Iceberg-emulating Hive layout.
    * Repartitioned so each (ts_day, url_bucket) directory gets at most
    * `filesPerDir` files (hash repartitioning can collide salt values, so
    * it is an upper bound) — without this, every upstream task writes into
    * every directory it touches and the table explodes into
    * tasks × dirs tiny files (a real small-file failure mode at scale:
    * file-open cost then dominates the scan and Hadoop FS locking
    * serializes high-thread readers).
    */
  def writePages(pages: DataFrame, dir: String, buckets: Int = NumBuckets,
                 filesPerDir: Int = 4): Unit =
    withPartitionCols(pages, buckets)
      .repartition(col("ts_day"), col("url_bucket"),
        pmod(hash(col("url"), lit(1)), lit(filesPerDir)))
      .write.mode("overwrite")
      .partitionBy("ts_day", "url_bucket")
      .parquet(dir)

  /** One idempotent, resumable run: read partitioned pages, skip committed
    * partitions, extract, overwrite exactly the touched output partitions
    * (dynamic partition overwrite = Iceberg-style atomic-per-partition
    * commit), then append manifest + metrics. Crash before the manifest
    * append → the partition is re-processed next run and its output
    * partition is overwritten, not duplicated — idempotent.
    */
  def run(spark: SparkSession, pagesDir: String, outDir: String,
          manifestDir: String, metricsDir: String,
          runId: String, runTs: Timestamp): Long = {
    val pages = spark.read.parquet(pagesDir)
    // First-run probe by directory listing, not read-and-catch: the caught
    // AnalysisException used to print a stack trace that polluted stderr
    // right before Bench's JSON line (VERDICT.md "What's wrong" #3b).
    // The listing goes through the Hadoop FileSystem API, NOT java.io.File:
    // on HDFS/S3 a local-File probe sees nothing, resume() would anti-join
    // against an empty manifest, and the run would reprocess everything.
    val manifestPath = new org.apache.hadoop.fs.Path(manifestDir)
    val manifestFs = manifestPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasManifest = manifestFs.exists(manifestPath) &&
      Option(manifestFs.globStatus(new org.apache.hadoop.fs.Path(manifestDir, "*.parquet")))
        .exists(_.nonEmpty)
    val manifest: DataFrame =
      if (hasManifest)
        spark.read.parquet(manifestDir)
      else {
        import spark.implicits._
        Seq.empty[(java.sql.Date, Int)].toDF("ts_day", "url_bucket")
      }
    val todo = resume(pages, manifest).cache()
    val nTodo = todo.count()
    if (nTodo > 0) {
      // thread ts_day/url_bucket THROUGH the fused per-row extraction —
      // re-joining extractAll's output on url would shuffle every
      // extracted document twice (both join sides), the dominant exchange
      // of the write path at corpus scale; this plan has none before the
      // partitioned write
      val docs = extractParted(todo)
        .persist() // consumed twice: partitioned write + metrics rollup
      // dynamic overwrite scoped to THIS writer (a session-wide conf.set
      // would silently change every later overwrite's semantics).
      // Cluster rows by target directory first (the writePages
      // discipline, salt bounds files/dir): without it every scan task
      // writes a fragment into every directory it touches and the table
      // accretes tasks x dirs tiny files run over run (r06: the e2e
      // bench output was 204 files of ~360 KB for a 74 MB table). The
      // shuffle moves the EXTRACTED text (already persisted), not the
      // raw payloads.
      docs.drop("extract_ns")
        .repartition(col("ts_day"), col("url_bucket"),
          pmod(hash(col("url"), lit(1)), lit(4)))
        .write.mode("overwrite").partitionBy("ts_day", "url_bucket")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(outDir)
      metricsParted(todo, docs, runId).write.mode("append").parquet(metricsDir)
      manifestRows(todo, runId, runTs, outDir).write.mode("append").parquet(manifestDir)
      docs.unpersist()
    }
    todo.unpersist()
    nTodo
  }

  /** A3: the reference's full nested JSON results sink
    * (`document_saver.py:84-85` writes the merged result as one JSON
    * document) — each row serialized whole with `to_json(struct(*))`.
    */
  def jsonResults(docs: DataFrame): DataFrame =
    docs.select(col("url"),
      to_json(struct(docs.columns.map(col): _*)).as("json"))

  /** Write [[jsonResults]] through the text sink: one JSON document per
    * line (the distributed analog of the reference's per-document
    * `*_results.json` file).
    */
  def writeJsonResults(docs: DataFrame, dir: String): Unit =
    jsonResults(docs).select(col("json")).write.mode("overwrite").text(dir)

  /** C6 second half: the cache expiry sweep (`cache_manager.py:95-116`
    * actively deletes expired per-hash files; here the memoization table
    * is compacted to live rows so dead entries stop accumulating at
    * scale). Write-temp-then-swap keeps the read and the overwrite off
    * the same files; the swap runs through the Hadoop `FileSystem` API
    * (delete + rename), so the same code works on HDFS and local FS
    * alike — never `java.io.File`, which silently no-ops on a remote
    * filesystem. Returns removed-row count.
    */
  def sweepExpired(spark: SparkSession, cacheDir: String,
                   asOf: Timestamp): Long = {
    val cache = spark.read.parquet(cacheDir)
    val liveCond = col("committed_ts") + expr("INTERVAL 24 HOURS") > lit(asOf)
    val live = cache.where(liveCond)
    // one census scan for both counts (two count() actions scanned the
    // table twice, r06); the rewrite below re-reads only when compacting
    val counts = cache.agg(
      count(lit(1)).as("total"),
      count(when(liveCond, lit(1))).as("keep")).head()
    val (total, keep) = (counts.getLong(0), counts.getLong(1))
    if (keep < total) {
      val tmp = cacheDir + ".compact"
      live.write.mode("overwrite").parquet(tmp)
      val target = new org.apache.hadoop.fs.Path(cacheDir)
      val side = new org.apache.hadoop.fs.Path(tmp)
      val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.delete(target, true), s"could not remove old cache at $cacheDir")
      require(fs.rename(side, target), s"swap failed for $cacheDir")
    }
    total - keep
  }

  /** A10 last gap: single-key cache invalidation — the reference's
    * `CacheManager.invalidate(key)` (`cache_manager.py:81-93` deletes one
    * per-hash file) as an idempotent filtered rewrite of the memoization
    * table. Same temp-write + Hadoop-FS atomic swap as [[sweepExpired]];
    * invalidating a hash that is not present is a no-op (returns 0), so
    * retries are safe. The next `extractChunks(cache)` run recomputes
    * exactly the invalidated hashes and cache-hits everything else.
    * Returns removed-row count.
    */
  // --------------------------------------- snapshots / time travel

  /** Iceberg-style SNAPSHOT semantics over the checkpointed output:
    * [[runVersioned]] writes each run's data under `run_id=<id>/` —
    * append-only, never overwriting a previous run's files — and the
    * manifest rows point at run-scoped partition paths. The table
    * state "as of T" is then pure manifest arithmetic
    * ([[snapshotAsOf]]): per partition, the newest commit with
    * `committed_ts <= T`. [[readAsOf]] materializes that state;
    * [[expireSnapshots]] is the retention vacuum (after expiring to
    * horizon H, time travel before H is gone — exactly Iceberg's
    * `expire_snapshots` contract). The reference has no versioning at
    * all (`document_saver.py` overwrites by timestamped dir); this is
    * the north rule's Iceberg emulation carried to its logical end.
    */
  def runVersioned(spark: SparkSession, pagesDir: String, outDir: String,
                   manifestDir: String, metricsDir: String,
                   runId: String, runTs: Timestamp,
                   force: Boolean = false): Long = {
    val pages = spark.read.parquet(pagesDir)
    val manifestPath = new org.apache.hadoop.fs.Path(manifestDir)
    val manifestFs = manifestPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasManifest = manifestFs.exists(manifestPath) &&
      Option(manifestFs.globStatus(new org.apache.hadoop.fs.Path(manifestDir, "*.parquet")))
        .exists(_.nonEmpty)
    val manifest: DataFrame =
      if (hasManifest) spark.read.parquet(manifestDir)
      else {
        import spark.implicits._
        Seq.empty[(java.sql.Date, Int)].toDF("ts_day", "url_bucket")
      }
    // force = reprocess everything into a NEW snapshot (the "input
    // changed" path); otherwise the usual idempotent resume
    val todo = (if (force) withPartitionCols(pages) else resume(pages, manifest)).cache()
    val nTodo = todo.count()
    if (nTodo > 0) {
      val runOut = s"$outDir/run_id=$runId"
      val docs = extractParted(todo).persist()
      docs.drop("extract_ns")
        .repartition(col("ts_day"), col("url_bucket"),
          pmod(hash(col("url"), lit(1)), lit(4))) // dir-clustered, see run()
        .write.mode("errorifexists").partitionBy("ts_day", "url_bucket")
        .parquet(runOut) // append-only: a reused runId must fail, not clobber
      metricsParted(todo, docs, runId).write.mode("append").parquet(metricsDir)
      manifestRows(todo, runId, runTs, runOut).write.mode("append").parquet(manifestDir)
      docs.unpersist()
    }
    todo.unpersist()
    nTodo
  }

  /** Per partition, the newest commit at or before `asOf`:
    * `(ts_day, url_bucket, path, committed_ts)`. Ties on
    * `committed_ts` break by path (lexicographic max) — deterministic.
    */
  def snapshotAsOf(manifest: DataFrame, asOf: Timestamp): DataFrame =
    manifest.where(col("committed_ts") <= lit(asOf))
      .groupBy(col("ts_day"), col("url_bucket"))
      .agg(max(struct(col("committed_ts"), col("path"))).as("c"))
      .select(col("ts_day"), col("url_bucket"),
        col("c.path").as("path"), col("c.committed_ts").as("committed_ts"))

  /** Materialize the table state as of `asOf`. The path list is driver
    * work bounded by the PARTITION count (the same class as Iceberg's
    * manifest processing), never by row count. `basePath` keeps the
    * run_id/ts_day/url_bucket partition columns readable.
    */
  def readAsOf(spark: SparkSession, outDir: String, manifestDir: String,
               asOf: Timestamp): DataFrame = {
    import spark.implicits._
    val paths = snapshotAsOf(spark.read.parquet(manifestDir), asOf)
      .select(col("path")).as[String].collect().sorted
    require(paths.nonEmpty, s"no snapshot at or before $asOf")
    spark.read.option("basePath", outDir).parquet(paths: _*)
  }

  /** Snapshot CHANGELOG (the CDC shape Iceberg calls
    * `create_changelog_view`): what happened to every url between two
    * table snapshots — `(url, change)` with change ∈ added / removed /
    * changed, unchanged rows dropped. Content identity is
    * `xxhash64(extracted_text)`; ONE full-outer join on url (both
    * sides already partition-bounded by their manifests), so a
    * crawl-over-crawl diff costs one shuffle, never a rescan of
    * history.
    */
  def diffSnapshots(spark: SparkSession, outDir: String, manifestDir: String,
                    t1: Timestamp, t2: Timestamp): DataFrame = {
    val a = readAsOf(spark, outDir, manifestDir, t1)
      .select(col("url"), xxhash64(col("extracted_text")).as("_h1"))
    val b = readAsOf(spark, outDir, manifestDir, t2)
      .select(col("url"), xxhash64(col("extracted_text")).as("_h2"))
    a.join(b, Seq("url"), "full_outer")
      .withColumn("change",
        when(col("_h1").isNull, "added")
          .when(col("_h2").isNull, "removed")
          .when(col("_h1") =!= col("_h2"), "changed"))
      .where(col("change").isNotNull)
      .select(col("url"), col("change"))
  }

  /** Iceberg `expire_snapshots`: keep every partition version still
    * reachable from a time travel AT OR AFTER `olderThan` (the newest
    * commit <= olderThan, plus everything after it); delete the rest's
    * data directories and drop their manifest rows (temp-write + swap,
    * like [[sweepExpired]]). Returns the number of expired partition
    * versions. Idempotent.
    */
  def expireSnapshots(spark: SparkSession, manifestDir: String,
                      olderThan: Timestamp): Long = {
    import spark.implicits._
    val manifest = spark.read.parquet(manifestDir)
    val horizon = snapshotAsOf(manifest, olderThan).select(col("path"))
    val after = manifest.where(col("committed_ts") > lit(olderThan)).select(col("path"))
    val live = horizon.union(after).distinct()
    val dead = manifest.select(col("path")).distinct()
      .join(live, Seq("path"), "left_anti")
      .as[String].collect().sorted
    if (dead.nonEmpty) {
      val conf = spark.sparkContext.hadoopConfiguration
      dead.foreach { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(conf)
        if (fs.exists(path))
          require(fs.delete(path, true), s"could not expire $p")
      }
      val keepRows = manifest.where(!col("path").isInCollection(dead))
      val tmp = manifestDir + ".expire"
      keepRows.write.mode("overwrite").parquet(tmp)
      val target = new org.apache.hadoop.fs.Path(manifestDir)
      val side = new org.apache.hadoop.fs.Path(tmp)
      val fs = target.getFileSystem(conf)
      require(fs.delete(target, true), s"could not remove old manifest at $manifestDir")
      require(fs.rename(side, target), s"swap failed for $manifestDir")
    }
    dead.length.toLong
  }

  /** Small-file compaction — the Iceberg `rewrite_data_files` analog
    * and THE operational failure mode of long-lived partitioned
    * tables: every incremental run appends a few files per partition
    * until scans drown in open-file overhead. Rewrites each partition
    * whose file count exceeds `maxFilesPerPartition` into
    * `ceil(bytes / targetBytes)` files (coalesce inside the partition
    * — no shuffle of other partitions' data), via the temp-write +
    * FS-swap idiom of [[sweepExpired]]. Content-preserving by
    * construction and asserted in PipelineSpec (byte-identical rows
    * before/after). Returns the number of partitions rewritten.
    *
    * Scale shape: the partition census is a driver listing bounded by
    * partition count (Iceberg-manifest-class work); each rewrite reads
    * and writes ONLY that partition's bytes. Run it from the same
    * scheduled maintenance slot as [[expireSnapshots]].
    */
  def compactPartitions(spark: SparkSession, outDir: String,
                        targetBytes: Long = 128L << 20,
                        maxFilesPerPartition: Int = 4): Long = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no table at $outDir")
    // leaf partition dirs: ts_day=*/url_bucket=*
    val parts = fs.globStatus(new org.apache.hadoop.fs.Path(outDir, "ts_day=*/url_bucket=*"))
    // Each rewrite is an independent tiny job (read one partition's
    // files, write them back coalesced); run a few IN FLIGHT from a
    // driver thread pool (guide §2.6: overlap independent jobs so the
    // next rewrite's tasks back-fill the tail of the current one —
    // serially, every rewrite left the cluster idle during its commit).
    // 4 in flight is plenty; partition swaps touch disjoint dirs so the
    // temp+rename protocol is unchanged. Rewrites are per-partition
    // atomic exactly as before — a crash mid-sweep leaves every
    // partition either old or fully swapped.
    val parallelism = math.min(4, math.max(1, parts.length))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val rewritten = new java.util.concurrent.atomic.AtomicLong(0L)
    val futures = parts.toSeq.map { st =>
      scala.concurrent.Future {
        val dir = st.getPath
        val files = fs.listStatus(dir).filter(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
        if (files.length > maxFilesPerPartition) {
          val bytes = files.map(_.getLen).sum
          val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
          spark.sparkContext.setJobDescription(s"compact $dir")
          val df = spark.read.parquet(dir.toString)
          val tmp = new org.apache.hadoop.fs.Path(dir.getParent, dir.getName + ".compact")
          df.coalesce(nOut).write.mode("overwrite").parquet(tmp.toString)
          require(fs.delete(dir, true), s"could not remove $dir")
          require(fs.rename(tmp, dir), s"swap failed for $dir")
          rewritten.incrementAndGet()
          ()
        }
      }
    }
    try
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf)
    finally pool.shutdown()
    rewritten.get()
  }

  def invalidate(spark: SparkSession, cacheDir: String,
                 hashes: Seq[String]): Long = {
    require(hashes.nonEmpty, "no hashes to invalidate")
    val cache = spark.read.parquet(cacheDir)
    // NULL-hash rows (however they got there) are NOT targeted by any
    // invalidation: a bare !isin() evaluates to NULL for them and would
    // silently delete them with every call (three-valued logic)
    val keepCond =
      col("content_hash").isNull || !col("content_hash").isin(hashes: _*)
    val keepRows = cache.where(keepCond)
    // one census scan for both counts (see sweepExpired)
    val counts = cache.agg(
      count(lit(1)).as("total"),
      count(when(keepCond, lit(1))).as("keep")).head()
    val (total, keep) = (counts.getLong(0), counts.getLong(1))
    if (keep < total) {
      val tmp = cacheDir + ".invalidate"
      keepRows.write.mode("overwrite").parquet(tmp)
      val target = new org.apache.hadoop.fs.Path(cacheDir)
      val side = new org.apache.hadoop.fs.Path(tmp)
      val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.delete(target, true), s"could not remove old cache at $cacheDir")
      require(fs.rename(side, target), s"swap failed for $cacheDir")
    }
    total - keep
  }
}
