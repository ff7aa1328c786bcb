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
}
