package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Extraction

/** Dev diagnostic: connected-components at adversarial component shapes
  * far beyond sf-scale — the BENCH.md evidence that the q50 iteration
  * strategy (pointer-doubled min-label propagation, localCheckpoint per
  * round) holds when components are large or deep, not just on toy
  * triangles. Not part of the driver contract.
  *
  * Three shapes, run separately and together:
  *  - mirror farm: one 100k-member star (the capped-LSH hot-bucket
  *    output shape) — diameter 2;
  *  - deep chain: a 100k-node path — diameter 10^5, the shape that
  *    silently broke the pre-round-4 one-hop propagation at maxIter=25;
  *  - background: 100k independent 2-node components.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val s = Extraction.configureLocal(
      SparkSession.builder().master("local[16]"), 16).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    val farmN = sys.env.getOrElse("CC_FARM", "100000").toInt
    val chainN = sys.env.getOrElse("CC_CHAIN", "100000").toInt
    val bgN = sys.env.getOrElse("CC_BG", "100000").toInt

    val farm = s.range(1, farmN).select(lit(0L).as("a_id"), $"id".as("b_id"))
    val chainBase = 10000000L
    val chain = s.range(0, chainN - 1)
      .select(($"id" + chainBase).as("a_id"), ($"id" + chainBase + 1).as("b_id"))
    val bgBase = 20000000L
    val bg = s.range(0, bgN)
      .select(($"id" * 2 + bgBase).as("a_id"), ($"id" * 2 + bgBase + 1).as("b_id"))

    def run(name: String, pairs: org.apache.spark.sql.DataFrame,
            wantClusters: Long): Unit = {
      val t0 = System.nanoTime()
      val (cc, rounds) = graft.ops.Dedup.connectedComponentsWithStats(
        pairs, maxIter = 40)
      val clusters = cc.select(countDistinct($"cluster")).as[Long].head()
      val nodes = cc.count()
      val secs = (System.nanoTime() - t0) / 1e9
      require(clusters == wantClusters,
        s"$name: got $clusters clusters, want $wantClusters")
      println(f"CC_PROBE $name%-12s nodes=$nodes%8d rounds=$rounds%2d " +
        f"clusters=$clusters%7d wall=$secs%6.2fs")
    }

    run("farm", farm, 1)
    run("chain", chain, 1)
    run("background", bg, bgN)
    run("combined", farm.union(chain).union(bg), 2L + bgN)
    s.stop()
  }
}
