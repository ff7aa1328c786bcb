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

    // round-2 operators: the plan properties each one must keep at scale
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")

    println("==== q28 cosine-LSH (want: bucket-equi joins, no cartesian) ====")
    graft.ops.Dedup.cosineNearDupLshMulti(emb, "vec_id", "embedding",
      threshold = 0.4, tables = 2, planesPerTable = 4).explain("formatted")

    println("==== pipe17 IVF (want: cell IN-filter before the broadcast query join) ====")
    graft.ops.Similarity.ivfTopK(emb, "vec_id", "embedding",
      queryId = 7L, k = 10, nlist = 16, nprobe = 4).explain("formatted")

    println("==== pipe19 IVF at-rest probe (want: PartitionFilters on cell, nprobe dirs scanned) ====")
    locally {
      val idxDir = java.nio.file.Files.createTempDirectory("graft-explain-ivf").toString
      graft.ops.Similarity.ivfBuildIndex(emb, "vec_id", "embedding", idxDir, nlist = 16)
      val qv = emb.where(col("vec_id") === 7)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .as[Array[Double]].head()
      val probe = graft.ops.Similarity.ivfProbeIndex(s, idxDir, qv, k = 10, nprobe = 4)
      probe.explain("formatted")
      probe.collect()
      val scan = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      println(s"files read: ${scan.metrics("numFiles").value} of " +
        s"${s.read.parquet(s"$idxDir/corpus").inputFiles.length} (nprobe=4, nlist=16)")
    }

    println("==== q30 to_json projection (want: 2-column ReadSchema + limit pushdown) ====")
    s.read.parquet(s"$sfDir/documents.parquet").orderBy(asc("doc_id")).limit(100)
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("js"))
      .explain("formatted")

    s.stop()
  }
}
