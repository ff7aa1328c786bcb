package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for heavy-hitter keys (SURVEY.md §4 "Skew"; north rule:
  * "salted repartitioning for skewed hosts").
  *
  * Zipfian keys (web hosts, event types) make a plain `groupBy(key)` put
  * an entire heavy key's rows into one reducer task: the job then runs at
  * the speed of its hottest key. The fix is the classic two-phase salted
  * aggregate — `groupBy(key, salt)` spreads each key over `salts`
  * reducers (phase 1, does ~all the work), then the tiny per-salt partial
  * rows re-aggregate by key alone (phase 2). Algebraic aggregates
  * (count/sum/min/max) compose exactly, so the result is identical to the
  * unsalted plan — asserted against the DuckDB oracle. AQE's skew-join
  * splitting (enabled in `Extraction.configure`) covers the join-side
  * analog at runtime.
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of a high-cardinality column
    * (NOT the group key — salting by the key would keep the key's rows
    * together and change nothing).
    */
  def salt(highCardCol: Column, salts: Int): Column =
    pmod(xxhash64(highCardCol), lit(salts)).cast("int")

  /** Two-phase salted count+sum per key. Output identical to
    * `df.groupBy(key).agg(count(*), sum(valueCol))` with balanced tasks.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, saltSrcCol: String,
                     valueCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(col(saltSrcCol), salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("pc"), sum(col(valueCol)).as("ps"))
      .groupBy(col(keyCol))
      .agg(sum(col("pc")).as("cnt"), sum(col("ps")).as("total"))
}
