package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.Extraction

/** Extra benchmark runner (guide §1.4): isolates individual
  * `SparkEntry.queries` entries so an optimization can be measured
  * without the 17-minute full sweep. NOT part of the driver contract —
  * `graft.Bench` stays the authoritative harness; numbers from here are
  * cited in OPTIMIZATION_r06.md as isolation evidence only.
  *
  * Usage: `sbt "runMain graft.BenchExtra <name> [<name>...]"`
  *   - env `PROBE_REPS` (default 3): reps per query; prints every rep and
  *     the best (first rep includes JIT/warm-up, so best ≈ warm cost).
  *   - env `PROBE_EXPLAIN=1`: additionally writes
  *     `plans/r06/<name>_{before,after}.txt` — `.explain("formatted")`
  *     of the query's DataFrame (suffix from `PROBE_EXPLAIN_TAG`).
  *   - same timed action as Bench (`.count()` on the returned frame),
  *     same session config, same `SPARK_GRAFT_SF_DIR`/`SPARK_GRAFT_CPUS`.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    val explain = sys.env.get("PROBE_EXPLAIN").contains("1")
    val tag = sys.env.getOrElse("PROBE_EXPLAIN_TAG", "before")
    val s = Extraction.configureLocal(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val times = (1 to reps).map { i =>
        s.sparkContext.setJobDescription(s"$name rep $i")
        val t0 = System.nanoTime()
        // same swallow-and-time as the frozen Bench harness (a query whose
        // in-query gate throws is still timed there)
        try fn(s, sfDir).count()
        catch { case e: Throwable => println(s"EXTRA-ERR $name: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      if (explain) {
        val dir = java.nio.file.Paths.get("/root/repo/plans/r06")
        java.nio.file.Files.createDirectories(dir)
        val plan = fn(s, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(s"${name}_$tag.txt"), plan)
      }
      println(f"EXTRA $name best=${times.min}%.3fs " +
        f"reps=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    s.stop()
  }
}
