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

    println("==== q38 as-of join (want: ONE hashpartitioning exchange, no join operator) ====")
    locally {
      val ev = s.read.parquet(s"$sfDir/events.parquet")
      val right = ev.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("state_v"))
      val left = ev.where(col("event_type") =!= "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val plan = graft.ops.Relational.asofJoin(left, right, "user_id", "ts")
      plan.explain("formatted")
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(plan.queryExecution.executedPlan.toString).size
      println(s"hash exchanges in as-of join plan: $exchanges")
    }

    println("==== q39 binned range join (want: equi-join on _bin, residual filter, no BNLJ) ====")
    locally {
      import s.implicits._
      val intervals = Seq((1, 0.0, 7.0), (2, 5.0, 23.0), (3, 20.0, 31.0),
        (4, 30.0, 55.0)).toDF("interval_id", "lo", "hi")
      graft.ops.Relational.pointsInIntervals(
          s.read.parquet(s"$sfDir/lineitem.parquet").select(col("l_quantity")),
          "l_quantity", intervals, binWidth = 8.0)
        .groupBy(col("interval_id")).agg(count(lit(1)).as("cnt"))
        .explain("formatted")
    }

    println("==== pipe29 BATCH IVF probe (want: cell equi-join + WindowGroupLimit " +
      "partial top-k BEFORE the qid exchange, no cartesian) ====")
    locally {
      val q = emb.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.ops.Similarity.ivfTopKBatch(emb, q, "vec_id", "embedding",
        "qid", "qv", k = 5, nlist = 16, nprobe = 4).explain("formatted")
    }

    println("==== q57 Bloom anti-join, string keys (want: union of definitely-new " +
      "filter scan + anti join on the maybe-seen sliver + null-key branch) ====")
    locally {
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
      val h = docs.select(col("doc_id"), col("lang"), sha2(col("text"), 256).as("content_hash"))
      val seen = h.where(col("doc_id") % 7 === 0).select(col("content_hash"))
      graft.ops.Relational.antiJoinBloom(h, seen, "content_hash",
        expectedItems = 100000L, fpp = 0.01).explain("formatted")
    }

    println("==== q30 to_json projection (want: 2-column ReadSchema + limit pushdown) ====")
    s.read.parquet(s"$sfDir/documents.parquet").orderBy(asc("doc_id")).limit(100)
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("js"))
      .explain("formatted")

    s.stop()
  }
}
