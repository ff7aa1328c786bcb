package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Checkpoint, Extraction}

/** Dev diagnostic: prints the formatted physical plans of the flagship
  * pipeline over the partitioned Parquet page table — used to verify
  * column pruning (ReadSchema), filter pushdown (PushedFilters),
  * partition pruning, and WholeStageCodegen coverage. Not part of the
  * driver contract.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val pagesDir = args.headOption.getOrElse("/tmp/graft_bench_pages_1000000_b4")
    val s = Extraction.configureLocal(SparkSession.builder().master("local[4]"), 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    println("==== extractAll over parquet ====")
    Extraction.extractAll(s.read.parquet(pagesDir))
      .agg(sum(length(col("extracted_text")))).explain("formatted")

    println("==== resume anti-join (partition-pruned) ====")
    import s.implicits._
    val manifest = Seq((java.sql.Date.valueOf("2024-01-02"), 3))
      .toDF("ts_day", "url_bucket")
    Checkpoint.resume(s.read.parquet(pagesDir), manifest).explain("formatted")

    println("==== single-partition scan (pruning check) ====")
    s.read.parquet(pagesDir)
      .where(col("ts_day") === "2024-01-02" && col("url_bucket") === 3)
      .select(col("url")).explain("formatted")

    s.stop()
  }
}
