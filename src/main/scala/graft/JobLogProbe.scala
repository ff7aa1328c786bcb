package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.pipeline.Extraction

/** Dev diagnostic: runs one named SparkEntry query and prints every
  * Spark job's wall duration + call site, so a multi-stage pipe's time
  * can be attributed job by job. Not part of the driver contract.
  */
object JobLogProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("PROBE_REPS", "2").toInt
    val s = Extraction.configureLocal(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var log = List.empty[(Int, Double, Int, String)]
    @volatile var record = false
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = starts.remove(j.jobId)
        if (record && st != null)
          log ::= ((j.jobId, (System.nanoTime() - st._1) / 1e9, 0, st._2))
        ()
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      if (i == reps) { record = true; log = Nil }
      val t0 = System.nanoTime()
      try fn(s, sfDir).count()
      catch { case e: Throwable => println(s"PROBE-ERR $name: ${e.getMessage}") }
      println(f"PROBE $name rep$i total=${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    // give the async listener bus a moment to drain
    Thread.sleep(2000)
    log.reverse.foreach { case (id, secs, _, site) =>
      println(f"PROBE job=$id%4d ${secs}%7.3fs  $site")
    }
    val total = log.map(_._2).sum
    println(f"PROBE jobs=${log.size} sum=${total}%.3fs")
    s.stop()
  }
}
