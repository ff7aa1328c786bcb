package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev diagnostic (not part of the driver contract): measures
  * [[ops.Graph.pageRank]] jobs-per-iteration and wall-per-iteration on a
  * seeded ring+chords graph — the evidence behind BENCH.md's PageRank
  * single-pass numbers (round 5: contribs + dangling fused into one
  * edge-join pass; ~16 % wall/iter under the round-4 two-scan shape at
  * 3M nodes, identical AQE job count).
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val s = pipeline.Extraction.configureLocal(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val n = args.headOption.map(_.toLong).getOrElse(3000000L)
    val edges = s.range(n).select(($"id").as("src"), (($"id" * 7 + 1) % n).as("dst"))
      .union(s.range(n / 10).select(($"id" * 10).as("src"), (($"id" * 3) % n).as("dst")))
    val cnt = new java.util.concurrent.atomic.AtomicInteger
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { cnt.incrementAndGet(); () }
    })
    def run(iters: Int): (Int, Double) = {
      Thread.sleep(1500); val j0 = cnt.get(); val t0 = System.nanoTime()
      ops.Graph.pageRank(edges, iters = iters).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      (cnt.get() - j0, secs)
    }
    run(2) // warm-up
    val (j2, t2) = run(2)
    val (j8, t8) = run(8)
    println(f"PRPROBE nodes=$n jobsPerIter=${(j8 - j2) / 6.0}%.2f " +
      f"wallPerIter=${(t8 - t2) / 6.0}%.2f s (local[8])")
    s.stop()
  }
}
