package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Checkpoint, Extraction}

/** Dev diagnostic: times the extraction pipeline on `local-cluster`
  * masters — real multi-JVM executors (the faithful "N vs 4N executors"
  * shape: one driver + separate worker processes, each with its own heap
  * and GC), unlike `local[K]` where all K task threads share one JVM.
  * Requires the app jar (sbt package) on spark.jars. Not part of the
  * driver contract.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val pagesDir = args.headOption.getOrElse("/tmp/graft_bench_pages_200000_b4")
    val jar = sys.env.getOrElse("PROBE_JAR",
      "target/scala-2.13/ocrappv1spark_2.13-0.1.0.jar")
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    val execMem = sys.env.getOrElse("PROBE_EXEC_MEM_MB", "4096")
    val workers = sys.env.getOrElse("PROBE_WORKERS", "2,8")
      .split(",").map(_.trim.toInt).toSeq
    val coresPer = sys.env.getOrElse("PROBE_CORES_PER", "4").toInt
    // extract = read→extract→aggregate (no sink IO, the scaling contract's
    // job); run = the FULL production path (read→extract→partitioned
    // parquet write + manifest + metrics via Checkpoint.run, fresh output
    // dirs per rep so resume never short-circuits the work)
    val mode = sys.env.getOrElse("PROBE_MODE", "extract")

    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete(); ()
    }

    workers.foreach { w =>
      val cores = w * coresPer
      val s = Extraction.configureLocal(
        SparkSession.builder()
          .master(s"local-cluster[$w,$coresPer,$execMem]")
          .config("spark.jars", jar)
          .config("spark.executor.memory", s"${execMem}m"),
        cores).getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val runs = (1 to reps).map { rep =>
        if (mode == "run") {
          val root = s"/tmp/graft_cprobe_run_${w}_$rep"
          rmrf(new java.io.File(root))
          val t0 = System.nanoTime()
          Checkpoint.run(s, pagesDir, s"$root/docs", s"$root/manifest",
            s"$root/metrics", s"probe-$w-$rep",
            java.sql.Timestamp.valueOf("2024-01-08 00:00:00"))
          val secs = (System.nanoTime() - t0) / 1e9
          rmrf(new java.io.File(root))
          secs
        } else {
          val job = Extraction.extractAll(s.read.parquet(pagesDir))
            .agg(sum(length(col("extracted_text"))), count(lit(1)))
          val t0 = System.nanoTime()
          job.collect()
          (System.nanoTime() - t0) / 1e9
        }
      }
      println(f"CPROBE mode=$mode%s workers=$w cores=$cores best=${runs.min}%.2fs " +
        s"runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      s.stop()
    }
  }
}
