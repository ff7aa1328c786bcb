package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kernel.Kll

/** Mergeable statistics sketches at rest — the summaries a 100 TB
  * corpus keeps NEXT TO the data so monitoring queries (length
  * distributions, quality-score drift across crawls) never rescan it.
  * [[graft.kernel.Kll]] sketches are a few KB, merge associatively,
  * and answer any quantile within ~O(1/k) normalized rank error; the
  * at-rest shape mirrors the HLL (pipe21) and MinHash-index (pipe50)
  * entries: build per batch, merge forever.
  */
object Stats {

  /** One corpus-wide sketch: per-partition fold + tree reduce — the
    * shuffle carries only few-KB sketches, never values.
    */
  def kllSketch(df: DataFrame, valueCol: String, k: Int = 200): Kll = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(valueCol).cast("double")).as[Double]
      .filter(v => !v.isNaN)
      .rdd
      .treeAggregate(Kll(k))(
        (s, v) => { s.update(v); s },
        (a, b) => a.merge(b))
  }

  /** Per-key sketch table `(key, n, sketch BINARY)` — the at-rest
    * layout: one row per key, ready to store, merge with the next
    * batch's table ([[mergeSketchTables]]), or query
    * ([[quantilesFromSketches]]). One hash shuffle on the key; values
    * stream through `mapGroups` without materializing a group in
    * memory beyond the sketch itself.
    */
  def kllByKey(df: DataFrame, keyCol: String, valueCol: String,
               k: Int = 200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val s = Kll(k)
        it.foreach(x => if (!x._2.isNaN) s.update(x._2))
        (key, s.n, s.toBytes)
      }
      .toDF(keyCol, "n", "sketch")
  }

  /** Merge two per-key sketch tables (yesterday's at-rest table + this
    * batch's) into one — the incremental-crawl statistics path: union,
    * group, sketch-merge; cost scales with DISTINCT KEYS, not corpus
    * size.
    */
  def mergeSketchTables(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    a.select(col(keyCol).cast("string"), col("sketch"))
      .unionByName(b.select(col(keyCol).cast("string"), col("sketch")))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val merged = it.map(x => Kll.fromBytes(x._2))
          .reduceLeft((x, y) => x.merge(y))
        (key, merged.n, merged.toBytes)
      }
      .toDF(keyCol, "n", "sketch")
  }

  /** Expand a sketch table into quantile rows:
    * `(key, n, q, value)` for each requested rank.
    */
  def quantilesFromSketches(sketches: DataFrame, keyCol: String,
                            qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
    val qsLocal = qs.toArray
    val expand = udf { (bytes: Array[Byte]) =>
      val s = Kll.fromBytes(bytes)
      qsLocal.map(q => (q, if (s.isEmpty) Double.NaN else s.quantile(q)))
    }
    sketches
      .select(col(keyCol), col("n"), explode(expand(col("sketch"))).as("_q"))
      .select(col(keyCol), col("n"), col("_q._1").as("q"), col("_q._2").as("value"))
  }
}
