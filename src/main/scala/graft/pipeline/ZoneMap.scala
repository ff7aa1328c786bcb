package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Zone maps — file-level min/max data skipping, the Iceberg/Delta
  * manifest-stats mechanism rebuilt on plain Parquet: a table written in
  * key order carries a tiny `_zonemap` sidecar of per-file key ranges,
  * and a range probe reads ONLY the files whose range intersects the
  * predicate. At 100 TB the difference is a metadata decision over
  * O(files) rows versus a scan of O(data) bytes — partition pruning's
  * little sibling, one level finer (partition dirs → files inside them).
  *
  * The stats are harvested from PARQUET FOOTERS, not by re-scanning
  * data: the writer's one extra pass is O(files) footer reads. Spark
  * ignores the `_`-prefixed sidecar directory, so `spark.read.parquet`
  * over the table keeps working unchanged for readers that don't know
  * about the map.
  *
  * Key scope: integral keys (the engine's doc_id / xxhash64 identities).
  * A non-integral key fails loudly at write.
  */
object ZoneMap {

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Per-file (file, min_key, max_key, rows) from parquet FOOTERS. */
  private def footerStats(spark: SparkSession, dir: String,
                          keyCol: String): Seq[(String, Long, Long, Long)] = {
    val (fs, root) = fsOf(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(st.getPath, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks.asScala
          var lo = Long.MaxValue; var hi = Long.MinValue; var rows = 0L
          blocks.foreach { b =>
            rows += b.getRowCount
            val col = b.getColumns.asScala
              .find(_.getPath.toDotString == keyCol)
              .getOrElse(throw new IllegalArgumentException(
                s"column $keyCol not in ${st.getPath}"))
            val stats = col.getStatistics
            require(stats != null && !stats.isEmpty,
              s"no footer statistics for $keyCol in ${st.getPath}")
            (stats.genericGetMin, stats.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) =>
                lo = math.min(lo, mn); hi = math.max(hi, mx)
              case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                lo = math.min(lo, mn.longValue); hi = math.max(hi, mx.longValue)
              case (mn, _) => throw new IllegalArgumentException(
                s"zone map needs an integral key; $keyCol stats are ${mn.getClass.getSimpleName}")
            }
          }
          (st.getPath.toString, lo, hi, rows)
        } finally reader.close()
      }
  }

  /** Write `df` key-clustered (range partition + in-file sort, so file
    * ranges are narrow and disjoint-ish) and harvest the `_zonemap`
    * sidecar from the written footers.
    */
  def write(df: DataFrame, dir: String, keyCol: String,
            files: Int = 8): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    df.repartitionByRange(files, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(dir)
    footerStats(spark, dir, keyCol)
      .toDF("file", "min_key", "max_key", "rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_zonemap")
  }

  /** The sidecar as a DataFrame (one row per data file). */
  def stats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/_zonemap")

  /** Range probe `[lo, hi]` with file skipping: the zone map (tiny,
    * driver-side) names the files whose range intersects the predicate;
    * only those reach the reader, plus the exact residual filter.
    * `df.inputFiles.length` exposes the pruning for tests/monitoring.
    */
  def readRange(spark: SparkSession, dir: String, keyCol: String,
                lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"empty range [$lo,$hi]")
    val hit = stats(spark, dir)
      .where(col("min_key") <= hi && col("max_key") >= lo)
      .select(col("file"))
      .collect().map(_.getString(0))
    if (hit.isEmpty)
      spark.read.parquet(dir).where(lit(false))
    else
      spark.read.parquet(hit.toIndexedSeq: _*)
        .where(col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /** Point probe — a 1-file read on a clustered table. */
  def readPoint(spark: SparkSession, dir: String, keyCol: String,
                key: Long): DataFrame = readRange(spark, dir, keyCol, key, key)
}
