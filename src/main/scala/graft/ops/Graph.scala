package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the crawl's link structure — host authority is
  * the classic link-based quality weight a corpus pipeline mixes into
  * document scoring (the Common Crawl project itself publishes exactly
  * this: host-level rank tables computed from the WARC link graph).
  *
  * [[pageRank]] is the standard damped power iteration expressed on
  * Catalyst primitives: per round one join (ranks → edges on src), one
  * aggregation (contributions by dst) and one small aggregate for the
  * dangling mass — all hash-partitioned on the node id, the same
  * iterative shape as [[Dedup.connectedComponentsWithStats]], with the
  * same per-round `localCheckpoint` lineage truncation and explicit
  * release of superseded rounds (a real cluster swaps in reliable
  * `checkpoint()`).
  */
object Graph {

  /** Damped PageRank over a directed edge list. `edges` columns
    * `srcCol`/`dstCol` (any equatable type); self-loops allowed;
    * duplicate edges count as parallel edges (weight by multiplicity —
    * pre-`distinct` the input for simple-graph semantics). Dangling
    * nodes (no out-edges) redistribute their mass uniformly, so ranks
    * sum to 1 every round (asserted by OpsSpec against a local
    * reference implementation).
    *
    * Returns `(node, rank)` for every node appearing as src or dst.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
               iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    def ckptRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    outDeg.count()
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    var ranksRdd = ckptRdd(ranks)
    var it = 0
    while (it < iters) {
      // mass of dangling nodes (rank with no out-edges) — tiny aggregate
      val dangling = ranks.join(outDeg, ranks("node") === outDeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = ranks.join(e, ranks("node") === e("src"))
        .join(outDeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      val base = (1.0 - damping) / n + damping * dangling / n
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
      ranksRdd.foreach(_.unpersist(false))
      ranks = next
      ranksRdd = ckptRdd(next)
      it += 1
    }
    e.unpersist(); nodes.unpersist(); outDeg.unpersist()
    ranks
  }
}
