package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the crawl's link structure — host authority is
  * the classic link-based quality weight a corpus pipeline mixes into
  * document scoring (the Common Crawl project itself publishes exactly
  * this: host-level rank tables computed from the WARC link graph).
  *
  * [[pageRank]] is the standard damped power iteration expressed on
  * Catalyst primitives. Each round is ONE pass over the edge join: the
  * left joins `ranks → outDeg → edges` route a dangling node's whole
  * rank into a null-keyed bucket of the SAME aggregation that sums the
  * per-target contributions, so the dangling-mass term costs no second
  * scan (it used to be a separate anti-join + driver `.head()` per
  * round). The null bucket is then broadcast back onto every node as a
  * one-row frame — no driver round-trip, no global window. Rounds are
  * hash-partitioned on the node id and use the same per-round
  * `localCheckpoint` lineage truncation + explicit release of superseded
  * rounds as [[Dedup.connectedComponentsWithStats]] (a real cluster
  * swaps in reliable `checkpoint()`).
  */
object Graph {

  /** Damped PageRank over a directed edge list. `edges` columns
    * `srcCol`/`dstCol` (any equatable non-null type); self-loops allowed;
    * duplicate edges count as parallel edges (weight by multiplicity —
    * pre-`distinct` the input for simple-graph semantics). Dangling
    * nodes (no out-edges) redistribute their mass uniformly, so ranks
    * sum to 1 every round (asserted by OpsSpec against a local
    * reference implementation).
    *
    * `tol > 0` adds an early exit: iteration stops once the L1 delta
    * Σ|rank − prev_rank| falls below `tol` (one extra tiny aggregate
    * per round over the two checkpointed rank tables); `tol = 0`
    * (default) runs exactly `iters` rounds — the deterministic shape
    * the differential tests pin.
    *
    * Returns `(node, rank)` for every node appearing as src or dst.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
               iters: Int = 10, damping: Double = 0.85,
               tol: Double = 0.0): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    def ckptRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    // persisted lazily: round 1's flow join materializes the cache (an
    // explicit count() here was one more driver barrier per call)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    var ranksRdd = ckptRdd(ranks)
    var it = 0
    var done = false
    while (!done && it < iters) {
      // one pass: rank flow along edges AND the dangling mass, in the
      // same join + aggregation. A node with out-edges fans its rank/deg
      // to each dst; a dangling node (no outDeg row, no edge rows) keeps
      // one left-join row with null dst and banks its whole rank in the
      // null-keyed bucket.
      //
      // flow is PERSISTED (lazy), not localCheckpoint'd: it is consumed
      // twice inside `next` (per-node in_mass + the dangling broadcast),
      // the cache makes that one physical computation, and the round's
      // single eager materialization below truncates lineage — one
      // action barrier per round instead of two. (r06: the second
      // barrier was pure scheduling overhead at every scale; plan depth
      // stays bounded because `ranks` is a flat checkpointed scan.)
      val flow = ranks.as("r")
        .join(outDeg.as("o"), col("r.node") === col("o.src"), "left")
        .join(e.as("e"), col("r.node") === col("e.src"), "left")
        .select(col("e.dst").as("node"),
          when(col("e.dst").isNull, col("r.rank"))
            .otherwise(col("r.rank") / col("o.deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
        .persist()
      // the dangling bucket as a 0-or-1-row broadcast frame (left join on
      // a constant key — empty when every node has out-edges), so the
      // redistribution term reaches every node without a driver action
      val dang = flow.where(col("node").isNull)
        .select(lit(1).as("_j"), col("in_mass").as("_dangling"))
      val next = nodes.withColumn("_j", lit(1))
        .join(flow.where(col("node").isNotNull), Seq("node"), "left")
        .join(broadcast(dang), Seq("_j"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("_dangling"), lit(0.0)) / n +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
      if (tol > 0) {
        val delta = next.as("n").join(ranks.as("o"), Seq("node"))
          .agg(coalesce(sum(abs(col("n.rank") - col("o.rank"))), lit(0.0)))
          .head().getDouble(0)
        if (delta < tol) done = true
      }
      flow.unpersist()
      ranksRdd.foreach(_.unpersist(false))
      ranks = next
      ranksRdd = ckptRdd(next)
      it += 1
    }
    e.unpersist(); nodes.unpersist(); outDeg.unpersist()
    ranks
  }

  /** HITS (Kleinberg, JACM 1999) — hubs and authorities over the link
    * graph, the directory/resource-page signal PageRank's single score
    * conflates: a link farm's hub pages score high as HUBS without
    * inflating their own AUTHORITY. Standard simple-graph semantics
    * (duplicate edges collapse), synchronous updates, L2 normalization
    * each half-step.
    *
    * Shape per round: auth = one edge join + per-dst sum; hub = one
    * edge join + per-src sum; each L2 norm is a one-row aggregate
    * broadcast back (no driver round-trip, no global window). Same
    * per-round `localCheckpoint` + release discipline as [[pageRank]].
    * Returns `(node, hub, auth)` for every node.
    */
  def hits(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
           iters: Int = 20): DataFrame = {
    require(iters >= 1)
    def ckptRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    // (no forcing count: the scores init below materializes the cache)
    // normalize a raw score column to unit L2 via a broadcast 1-row frame
    def l2normalize(df: DataFrame, valueCol: String): DataFrame = {
      val norm = df.agg(sqrt(sum(col(valueCol) * col(valueCol))).as("_n"))
        .select(lit(1).as("_j"), col("_n"))
      df.withColumn("_j", lit(1))
        .join(broadcast(norm), Seq("_j"))
        .select(col("node"),
          when(col("_n") > 0, col(valueCol) / col("_n"))
            .otherwise(lit(0.0)).as(valueCol))
    }
    var scores = nodes
      .withColumn("hub", lit(1.0)).withColumn("auth", lit(1.0))
      .localCheckpoint(true)
    var scoresRdd = ckptRdd(scores)
    var it = 0
    while (it < iters) {
      // One eager materialization per round (r06): the four intra-round
      // frames are PERSISTED lazily — each is consumed twice (its own L2
      // norm aggregate + the downstream join), so the cache keeps every
      // frame at one physical computation — and only `next` is
      // localCheckpoint'd, which truncates the round's lineage exactly as
      // before. Plan depth stays bounded (scores is a flat scan); the two
      // dropped checkpoints were pure per-round action barriers.
      // auth(v) = Σ hub(u) over edges u→v, then unit-L2
      val authRaw = nodes.as("n")
        .join(e.join(scores.select(col("node"), col("hub")),
          e("src") === col("node")).groupBy(col("dst")).agg(sum(col("hub")).as("_a")),
          col("n.node") === col("dst"), "left")
        .select(col("n.node").as("node"), coalesce(col("_a"), lit(0.0)).as("auth"))
        .persist()
      val auth = l2normalize(authRaw, "auth").persist()
      // hub(u) = Σ auth(v) over edges u→v, then unit-L2
      val hubRaw = nodes.as("n")
        .join(e.join(auth.select(col("node"), col("auth")),
          e("dst") === col("node")).groupBy(col("src")).agg(sum(col("auth")).as("_h")),
          col("n.node") === col("src"), "left")
        .select(col("n.node").as("node"), coalesce(col("_h"), lit(0.0)).as("hub"))
        .persist()
      val hub = l2normalize(hubRaw, "hub")
      val next = hub.join(auth, Seq("node"))
        .select(col("node"), col("hub"), col("auth"))
        .localCheckpoint(true)
      authRaw.unpersist(); auth.unpersist(); hubRaw.unpersist()
      scoresRdd.foreach(_.unpersist(false))
      scores = next
      scoresRdd = ckptRdd(next)
      it += 1
    }
    e.unpersist(); nodes.unpersist()
    scores
  }
}
