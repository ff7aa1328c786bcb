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

  /** Weighted sample WITHOUT replacement (Efraimidis & Spirakis, IPL
    * 2006): each row draws `key = -ln(u)/w` with `u ~ U(0,1)`; the k
    * SMALLEST keys are exactly a weight-proportional sample. `u` comes
    * from a seeded sha-256 of the id (48 uniform bits — small enough
    * that `u` is bit-identical in any IEEE engine, so the draw is
    * re-run-stable AND replayable by the DuckDB oracle), which makes
    * this the weighted companion of the q46 hash split and q61
    * stratified mixture.
    *
    * Shape: one stateless key column + `orderBy().limit(k)` — Spark
    * executes take-ordered-per-partition + driver merge of k-row heaps,
    * never a global sort; 10^12 rows cost one scan.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // 12 hex chars = 48 bits: v + 0.5 is exactly representable, so u (and
    // hence the order) is engine-independent
    val v = conv(substring(sha2(concat(col(idCol).cast("string"),
      lit(s"~$seed")), 256), 1, 12), 16, 10).cast("double")
    val u = (v + lit(0.5)) / lit(math.pow(16.0, 12))
    val key = -log(u) / col(weightCol).cast("double")
    df.where(col(weightCol) > 0)
      .withColumn("_skey", key)
      .orderBy(asc("_skey"))
      .limit(k)
      .drop("_skey")
  }
}
