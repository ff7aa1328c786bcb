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

  /** Skew-safe as-of join: identical semantics and output columns to
    * [[asofJoin]], but each key's timeline is RANGE-SPLIT into
    * `splitSeconds`-wide slices and the window partitions by
    * `(key, slice)` — so one hot key (a single user with 10^9 events)
    * spreads across many tasks instead of serializing into one, the
    * as-of analog of the two-phase salted aggregate in [[Skew]].
    *
    * Correctness across slice boundaries is restored by a CARRY pass:
    * the latest right row of each `(key, slice)` is aggregated (tiny:
    * keys × slices), a per-key running `last` over slice order yields
    * each slice's carry-in (the newest right row strictly before it,
    * skipping over empty slices), and the carry-in is injected into the
    * slice as one synthetic right row — its original timestamp is older
    * than every row of the slice, so the in-slice window sees it first
    * and `_asof_ts` still reports the true matched timestamp.
    *
    * Cost shape: the bulk data (left + right) is shuffled FULL-WIDTH
    * exactly once, on `(key, slice)` — the analog of [[asofJoin]]'s one
    * shuffle on `key`. The carry machinery adds (a) two extra
    * column-pruned scans (right's `(key, ts, values)` for the per-slice
    * maxima; both sides' `(key, ts)` for the needed-slice set — cheap
    * under parquet column pruning, and the price of not materializing
    * the bulk) and (b) a handful of exchanges over the tiny keys×slices
    * summary. Slice width trades skew spread against carry-table size
    * and does not affect results (OpsSpec asserts equality with
    * [[asofJoin]] at several widths).
    */
  def asofJoinSalted(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, splitSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(splitSeconds > 0, "splitSeconds must be positive")
    val reserved = (left.columns ++ right.columns).filter(c =>
      c == "_side" || c == "_asof" || c == "_asof_ts" || c == "_split" ||
        c.startsWith("_r_"))
    require(reserved.isEmpty,
      s"asofJoinSalted reserves column names '_side', '_asof', '_asof_ts', " +
        s"'_split' and the '_r_' prefix; rename ${reserved.mkString(", ")}")
    val rightVals = right.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    // numeric timeline for slicing; timestamps go through timestamp_ltz
    // (UTC session → same instant; NTZ refuses a direct double cast)
    def sliceOf(df: DataFrame): Column = {
      val num = df.schema(tsCol).dataType match {
        case _: org.apache.spark.sql.types.NumericType => col(tsCol).cast("double")
        case _ => col(tsCol).cast("timestamp_ltz").cast("double")
      }
      floor(num / splitSeconds).cast("long")
    }
    val l2 = left.withColumn("_split", sliceOf(left)).withColumn("_side", lit(1))
    val rCore = right.select(
      col(keyCol) +: col(tsCol) +: rightVals.map(c => col(c).as(s"_r_$c")): _*)
    val r2 = rCore.withColumn("_split", sliceOf(right)).withColumn("_side", lit(0))
    val rowStructR = struct(
      col(tsCol).as("ts") +: rightVals.map(c => col(s"_r_$c").as(c)): _*)
    // newest right row per (key, slice) — the carry source
    val lastIn = r2.groupBy(col(keyCol), col("_split"))
      .agg(max_by(rowStructR, col(tsCol)).as("_last"))
    // every (key, slice) either side touches needs a carry-in
    val needed = l2.select(col(keyCol), col("_split"))
      .union(r2.select(col(keyCol), col("_split"))).distinct()
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("_split"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryRights = needed.join(lastIn, Seq(keyCol, "_split"), "left")
      .select(col(keyCol), col("_split"),
        last(col("_last"), ignoreNulls = true).over(wCarry).as("_carry"))
      .where(col("_carry").isNotNull)
      .select(
        (col(keyCol) +: col("_carry.ts").as(tsCol) +: col("_split") +:
          rightVals.map(c => col(s"_carry.$c").as(s"_r_$c"))): _*)
      .withColumn("_side", lit(0))
    val u = l2.unionByName(r2, allowMissingColumns = true)
      .unionByName(carryRights, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol), col("_split"))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rowStruct = when(col("_side") === 0,
      struct(col(tsCol).as("ts") +: rightVals.map(c => col(s"_r_$c").as(c)): _*))
    val keep = u.columns.filterNot(_.startsWith("_r_")).map(col)
    u.select(keep :+ last(rowStruct, ignoreNulls = true).over(w).as("_asof"): _*)
      .where(col("_side") === 1)
      .select((left.columns.map(col) :+ col("_asof.ts").as("_asof_ts")) ++
        rightVals.map(c => col(s"_asof.$c").as(s"_r_$c")): _*)
  }

  /** Bloom-pre-filtered anti-join — the classic 10^12-row resume/dedup
    * optimization: when the EXCLUSION side (committed keys, seen hashes)
    * is orders of magnitude smaller than the probe side, build a Bloom
    * filter over it (`df.stat.bloomFilter`, driver-built and broadcast),
    * split probes into DEFINITELY-NEW (filter says absent — no shuffle at
    * all, the overwhelming majority on an incremental run) and
    * MAYBE-SEEN (filter says present), and run the exact anti-join only
    * over the maybe-seen sliver (true positives + `fpp` false
    * positives). Result is EXACTLY `left.join(right, key, "left_anti")`
    * — Bloom filters have no false negatives, and the false positives
    * are re-checked by the real join (q56 shares q06's oracle) — but the
    * shuffle carries ~`fpp` of the probe table instead of all of it.
    *
    * `expectedItems` sizes the filter (bits ≈ 1.44·n·log2(1/fpp); 10^9
    * keys at 1 % fpp ≈ 1.7 GB — size fpp to the broadcast budget, or
    * pre-partition the exclusion side and bloom per partition).
    */
  def antiJoinBloom(left: DataFrame, right: DataFrame, keyCol: String,
                    expectedItems: Long = 1000000L,
                    fpp: Double = 0.01): DataFrame = {
    // TYPE-GENERIC key handling: both sides are hashed through xxhash64
    // into the long domain the filter lives in, so string/binary keys
    // (content hashes — the advertised use case) work exactly like
    // numeric ones. Hashing the key before insertion and before probing
    // with the SAME function preserves the no-false-negative guarantee;
    // xxhash64 collisions only add false positives, which the exact
    // anti-join re-checks like the filter's own.
    // xxhash64 hashes by PHYSICAL type: INT 7 and BIGINT 7 hash to
    // different longs, so mismatched key types would make every seen row
    // miss the filter and silently survive the anti-join (the plain join
    // below would coerce and still match). Fail loudly instead.
    require(left.schema(keyCol).dataType == right.schema(keyCol).dataType,
      s"antiJoinBloom key '$keyCol' types differ: left " +
        s"${left.schema(keyCol).dataType.catalogString} vs right " +
        s"${right.schema(keyCol).dataType.catalogString} - cast one side first")
    val keyed = col(keyCol)
    val bf = right.where(keyed.isNotNull)
      .select(xxhash64(keyed).as("_h"))
      .stat.bloomFilter("_h", expectedItems, fpp)
    val spark = left.sparkSession
    val bc = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    // null keys never equal anything, so a true left_anti KEEPS them —
    // route them straight to the output instead of through the filter
    // (xxhash64 of null is the seed, which would misbucket them)
    val nullKeys = left.where(keyed.isNull)
    val nonNull = left.where(keyed.isNotNull)
    val definitelyNew = nonNull.where(!mightContain(xxhash64(keyed)))
    val maybeSeen = nonNull.where(mightContain(xxhash64(keyed)))
      .join(right.select(keyed).where(keyed.isNotNull).distinct(),
        Seq(keyCol), "left_anti")
    definitelyNew.unionByName(maybeSeen).unionByName(nullKeys)
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
