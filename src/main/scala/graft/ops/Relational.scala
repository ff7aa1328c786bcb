package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks natively, built scale-first on
  * Catalyst primitives (no custom physical plan needed — both reduce to
  * one hash-partitioned shuffle):
  *
  *  - AS-OF JOIN (each left row matched to the latest right row with
  *    `ts_r <= ts_l` for the same key): the union + keyed-window
  *    `last(ignoreNulls)` rendition. A sort-merge self-band-join would
  *    shuffle both sides too; this shape shuffles each row exactly once
  *    and never materializes candidate pairs.
  *  - POINT-IN-INTERVAL RANGE JOIN: intervals are exploded onto a fixed
  *    bin grid and the join becomes an EQUI join on the bin id with a
  *    residual containment filter — the textbook binned range join. At
  *    100 TB the bin equi-join hash-partitions like any other join (AQE
  *    skew-splits hot bins); a naive `BETWEEN` theta-join would be a
  *    broadcast nested loop over every pair.
  */
object Relational {

  /** As-of join: for every left row, the latest right row of the same
    * `keyCol` with `right.tsCol <= left.tsCol` (inclusive). Right value
    * columns arrive as `_r_<name>`; the matched right timestamp as
    * `_asof_ts` (null when no right row precedes — left-join semantics).
    *
    * `right` must be unique per (key, ts) — pre-aggregate otherwise
    * (ties among right rows would make "the" latest row ambiguous in any
    * engine). Exactly ONE shuffle: the union is partitioned by `keyCol`
    * for the window; ties at equal ts order right-before-left, so a
    * same-instant right row is visible to the left row (>= semantics,
    * matching SQL ASOF JOIN).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the operator owns the '_side'/'_asof'/'_r_*' namespace internally;
    // an input column in that namespace would silently collide with (or
    // be dropped by) the projections below — fail loudly instead
    val reserved = (left.columns ++ right.columns).filter(c =>
      c == "_side" || c == "_asof" || c == "_asof_ts" || c.startsWith("_r_"))
    require(reserved.isEmpty,
      s"asofJoin reserves column names '_side', '_asof', '_asof_ts' and " +
        s"the '_r_' prefix; rename input column(s) ${reserved.mkString(", ")}")
    val rightVals = right.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    val l2 = left.withColumn("_side", lit(1))
    val r2 = right.select(
        col(keyCol) +: col(tsCol) +: rightVals.map(c => col(c).as(s"_r_$c")): _*)
      .withColumn("_side", lit(0))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE window column carrying the whole right row as a struct: filling
    // value columns independently would let a legitimately-NULL value in
    // the true as-of row fall through to an OLDER row's value (a
    // frankenrow mixing fields across right rows). The struct is non-null
    // exactly on right rows, so last(ignoreNulls) picks one entire row —
    // and a single window column is also a single Window pass.
    val rowStruct = when(col("_side") === 0,
      struct(col(tsCol).as("ts") +: rightVals.map(c => col(s"_r_$c").as(c)): _*))
    val keep = u.columns.filterNot(_.startsWith("_r_")).map(col)
    u.select(keep :+ last(rowStruct, ignoreNulls = true).over(w).as("_asof"): _*)
      .where(col("_side") === 1)
      .select((left.columns.map(col) :+ col("_asof.ts").as("_asof_ts")) ++
        rightVals.map(c => col(s"_asof.$c").as(s"_r_$c")): _*)
  }

  /** Binned point-in-interval join: rows of `points` paired with every
    * interval `[loCol, hiCol)` containing `ptCol`. Both sides land on a
    * `binWidth`-wide grid; the grid id is the equi-join key and the
    * half-open containment predicate is re-checked as a residual filter,
    * so bin width affects only performance, never the result. Intervals
    * with `lo >= hi` are empty and dropped. The interval side's bound
    * columns are aliased internally (and not echoed in the output), so
    * the points side may carry columns of the same names without
    * ambiguity; the output is points columns + the interval's OTHER
    * columns (its identity).
    */
  def pointsInIntervals(points: DataFrame, ptCol: String,
                        intervals: DataFrame, binWidth: Double,
                        loCol: String = "lo", hiCol: String = "hi"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pB = points.withColumn("_bin", floor(col(ptCol) / binWidth).cast("long"))
    val others = intervals.columns.filterNot(c => c == loCol || c == hiCol)
    val iB = intervals
      .select(others.map(col) :+ col(loCol).as("_lo") :+ col(hiCol).as("_hi"): _*)
      .where(col("_lo") < col("_hi"))
      .withColumn("_bin", explode(sequence(
        floor(col("_lo") / binWidth).cast("long"),
        ceil(col("_hi") / binWidth).cast("long") - 1)))
    pB.join(iB, "_bin")
      .where(col(ptCol) >= col("_lo") && col(ptCol) < col("_hi"))
      .drop("_bin", "_lo", "_hi")
  }
}
