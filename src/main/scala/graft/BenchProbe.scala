package graft

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Extraction

/** Dev diagnostic: per-stage scaling probe for the extraction pipeline.
  * Times the HTML kernel, the PDF branch, and the full pipeline at two
  * core counts and prints task-metric totals (run/CPU/GC time) so a
  * scaling bottleneck can be attributed: CPU≪run ⇒ blocked threads
  * (GC/lock/IO); equal CPU but flat wall ⇒ stragglers. Not part of the
  * driver contract.
  */
object BenchProbe {

  private class MetricsListener extends SparkListener {
    val run = new LongAdder; val cpu = new LongAdder
    val gc = new LongAdder; val tasks = new LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        run.add(m.executorRunTime); cpu.add(m.executorCpuTime / 1000000)
        gc.add(m.jvmGCTime); tasks.add(1)
      }
    }
    def reset(): Unit = { run.reset(); cpu.reset(); gc.reset(); tasks.reset() }
  }

  private def time(label: String, reps: Int, l: MetricsListener)(f: => Unit): Unit = {
    val runs = (1 to reps).map { i =>
      if (i == reps) l.reset() // metrics from the last (reported) run only
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE $label best=${runs.min}%.2fs runs=${runs.map(r => f"$r%.2f").mkString(",")} " +
      f"tasks=${l.tasks.sum} runMs=${l.run.sum} cpuMs=${l.cpu.sum} gcMs=${l.gc.sum}")
  }

  def main(args: Array[String]): Unit = {
    val pagesDir = args.headOption.getOrElse("/tmp/graft_bench_pages_200000_b4")
    val reps = sys.env.getOrElse("PROBE_REPS", "2").toInt
    val coreLevels = sys.env.getOrElse("PROBE_CORES", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    coreLevels.foreach { cores =>
      val s = Extraction.configureLocal(
        SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val listener = new MetricsListener
      s.sparkContext.addSparkListener(listener)
      import s.implicits._
      val pages = s.read.parquet(pagesDir)
        .select($"url", $"warc_ts", $"html", $"text", $"lang")
        .repartition(cores * 4).persist()
      val n = pages.count()
      println(s"PROBE cores=$cores docs=$n")
      val typed = pages.as[graft.pipeline.Page]

      time(s"scan_only c=$cores", reps, listener) {
        s.read.parquet(pagesDir)
          .agg(sum(octet_length($"html")), count(lit(1))).collect()
      }
      time(s"html_kernel c=$cores", reps, listener) {
        Extraction.htmlDocs(typed.where(!Extraction.isPdf($"html")))
          .toDF().agg(sum(length($"extracted_text"))).collect()
      }
      time(s"pdf_dataflow c=$cores", reps, listener) {
        Extraction.mergePdfDocs(Extraction.extractChunks(
          Extraction.pdfChunks(typed.where(Extraction.isPdf($"html")))))
          .agg(sum(length($"extracted_text"))).collect()
      }
      time(s"pdf_fused c=$cores", reps, listener) {
        Extraction.pdfDocsFused(typed.where(Extraction.isPdf($"html")))
          .toDF().agg(sum(length($"extracted_text"))).collect()
      }
      time(s"full c=$cores", reps, listener) {
        Extraction.extractAll(pages)
          .agg(sum(length($"extracted_text")), count(lit(1))).collect()
      }
      pages.unpersist()
      s.stop()
    }
  }
}
