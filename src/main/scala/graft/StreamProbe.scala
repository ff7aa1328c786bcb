package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Checkpoint, Extraction}

/** Dev diagnostic: phase/batch breakdown of the streaming dedup drains
  * (pipe16/18/25 shape). Prints wall time per phase and the streaming
  * progress durationMs maps per micro-batch. Not part of the driver
  * contract.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = Extraction.configureLocal(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"PROBE qstart ${System.nanoTime() / 1000000}")
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        println(s"PROBE batch=${e.progress.batchId} " +
          s"rows=${e.progress.numInputRows} durationMs=${e.progress.durationMs}")
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"PROBE qterm ${System.nanoTime() / 1000000}")
    })
    def phase[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    // two reps: rep 1 includes JIT
    (1 to 2).foreach { rep =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-sprobe$rep").toString
      val pages = s"$tmp/pages"
      phase(s"rep$rep writePages") {
        Checkpoint.writePages(
          s.createDataset(graft.fixtures.PageGen.pages(400))(
            org.apache.spark.sql.Encoders.product).toDF(), pages)
      }
      phase(s"rep$rep drain1") {
        graft.streaming.StreamingRun.dedupStreamTtl(
          s, pages, s"$tmp/novel", s"$tmp/ckpt", 3600L * 1000)
      }
      phase(s"rep$rep append-dup") {
        s.read.parquet(pages)
          .withColumn("url", concat(col("url"), lit("#dup")))
          .write.mode("append").partitionBy("ts_day", "url_bucket").parquet(pages)
      }
      phase(s"rep$rep drain2") {
        graft.streaming.StreamingRun.dedupStreamTtl(
          s, pages, s"$tmp/novel", s"$tmp/ckpt", 3600L * 1000)
      }
      phase(s"rep$rep readback") {
        s.read.parquet(s"$tmp/novel").count()
      }
    }
    s.stop()
  }
}
