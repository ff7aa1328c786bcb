package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus composition controls — the sampling operators that shape WHAT
  * a trained model sees, beyond per-document quality: domain
  * diversification (no single host may dominate), deterministic and
  * re-run-stable like the hash split (q46) and stratified mixture
  * (q61) entries.
  */
object Sampling {

  /** Keep at most `cap` rows per key — the per-domain contribution cap
    * that stops template farms and mega-hosts from dominating a corpus
    * (C4 and descendants cap pages per host). Selection is
    * DETERMINISTIC: rows are ranked inside each key by xxhash64 of the
    * id (a stable shuffle, not arrival order, so re-runs and
    * repartitionings keep the identical subset), ties broken by id.
    *
    * Shape: one hash-partitioned window over keyCol — the same single
    * shuffle a groupBy would pay; no driver state, no collect.
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String,
                cap: Int,
                orderCol: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val ord = orderCol.getOrElse(xxhash64(col(idCol)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(ord, col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= cap)
      .drop("_rn")
  }

  /** Deterministic corpus shuffle + sharding — the "global shuffle"
    * every training run wants before sequence packing: each row gets a
    * `(shard, pos)` from a seeded cryptographic hash of its id, so the
    * permutation is re-run-stable (same corpus + seed → identical
    * shards, like q46's hash split), independent of arrival order and
    * partitioning, and WITHOUT a global total order: `pos` ranks
    * within each shard (one hash-partitioned window — parallel), never
    * a corpus-wide `row_number()` whose empty `partitionBy` would
    * funnel 10^12 rows through one task. Downstream writers emit shard
    * k's rows ordered by pos and training reads shards round-robin —
    * the standard sharded-shuffle contract.
    */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int,
                  seed: Long = 42L): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    // first 8 hex chars of sha-256(id-seed): 32 uniform bits, and (unlike
    // xxhash64) reproducible in any engine for oracle checks
    val h = conv(substring(sha2(concat(col(idCol).cast("string"),
      lit(s"-$seed")), 256), 1, 8), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(numShards)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("_h")
  }
}
