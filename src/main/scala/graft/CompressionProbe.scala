package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Checkpoint, Extraction}

/** Dev diagnostic: measures the checkpointed write path (read → extract →
  * partitioned Parquet write + manifest + metrics) under each Parquet
  * compression codec, on the same deterministic page table — the
  * evidence behind the codec default in [[Extraction.configure]].
  * At corpus scale the extracted-text table is the dominant storage
  * artifact, so bytes-on-disk matters as much as write seconds.
  */
object CompressionProbe {
  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_PROBE_DOCS", "100000").toLong
    val s = Extraction.configureLocal(SparkSession.builder().master("local[32]"), 32)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val root = "/tmp/graft_comp_probe"
    val pages = s"$root/pages_$docs"
    if (!new java.io.File(s"$pages/_SUCCESS").exists())
      Checkpoint.writePages(
        fixtures.PageGen.pagesDistributed(s, docs, seed = 3L, boost = 4).toDF(), pages)
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete(); ()
    }
    def du(p: java.io.File): Long =
      if (p.isDirectory) p.listFiles().map(du).sum else p.length()
    // warm-up (JIT + page cache) then one timed run per codec, interleaved
    // twice so ambient drift hits codecs evenly
    val codecs = Seq("snappy", "zstd", "lz4", "gzip")
    val results = scala.collection.mutable.Map.empty[String, (Double, Long)]
    for (rep <- 0 until 2; codec <- codecs) {
      s.conf.set("spark.sql.parquet.compression.codec", codec)
      Seq("docs", "manifest", "metrics").foreach(d => rmrf(new java.io.File(s"$root/$d")))
      val t0 = System.nanoTime()
      Checkpoint.run(s, pages, s"$root/docs", s"$root/manifest", s"$root/metrics",
        s"probe-$codec-$rep", java.sql.Timestamp.valueOf("2024-01-08 00:00:00"))
      val secs = (System.nanoTime() - t0) / 1e9
      val bytes = du(new java.io.File(s"$root/docs"))
      if (rep > 0) results(codec) = (secs, bytes) // keep the warmed rep
      println(f"[comp] rep=$rep codec=$codec%-6s ${docs / secs}%9.0f docs/sec  ${bytes / 1e6}%8.1f MB")
    }
    val base = results("snappy")
    results.toSeq.sortBy(_._2._1).foreach { case (c, (secs, bytes)) =>
      println(f"[comp] FINAL $c%-6s ${docs / secs}%9.0f docs/sec  ${bytes / 1e6}%8.1f MB  (size vs snappy: ${bytes.toDouble / base._2}%.2fx)")
    }
    s.stop()
  }
}
