package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 full-text search over an AT-REST inverted index — the retrieval
  * primitive a curated corpus serves next (query-time doc lookup for
  * RAG, eval-set retrieval, contamination forensics). The reference app
  * has no search surface; this follows the published BM25 (Robertson &
  * Zaragoza 2009) with the Lucene-standard idf:
  *
  *   idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))
  *   score(d, q) = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))
  *
  * Index layout under `dir` (plain parquet, same at-rest discipline as
  * the IVF and PQ indexes):
  *
  *   postings/  one row per (token, doc) — (token, doc_id, tf, dl) —
  *              PARTITIONED BY bucket = pmod(xxhash64(token), buckets)
  *   stats/     one row: (n_docs, avgdl)
  *
  * The probe reads ONLY the buckets of the query's tokens — a partition
  * filter, the IVF-probe discipline applied to text — so one query over
  * a 10^12-doc index touches ≤ |query tokens|/buckets of the postings,
  * never the corpus text. Document frequencies are computed FROM the
  * probed postings (each posting row is a distinct (token, doc) pair,
  * so `count(*)` per token over the probe IS df) — nothing outside the
  * probed buckets is needed for exact scoring.
  *
  * Tokenization is [[TextOps.tokens]] (lowercased letter runs) on both
  * the build and probe sides — and the oracle side: the census is
  * reproducible in DuckDB with the SAME regex, so the whole path is
  * SQL-oracle-checkable (q83).
  */
object Search {

  /** Build the inverted index from `docs(idCol, textCol)`. `buckets`
    * bounds probe fan-in: more buckets → finer pruning, more (small)
    * partition dirs; 64 suits tests, thousands suit a 10^12-doc corpus.
    */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
                 dir: String, buckets: Int = 64): Unit = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // dl rides every posting row so scoring never rejoins the corpus;
    // the join shuffles by doc_id once, at build time (the cheap side)
    tf.join(dl, "doc_id")
      .withColumn("bucket", pmod(xxhash64(col("token")), lit(buckets)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Query-side tokenization — the same letter-run rule as
    * [[TextOps.tokens]], applied on the driver to the (tiny) query.
    */
  private[graft] def queryTokens(query: String): Seq[String] =
    query.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty).distinct.toSeq

  /** Top-k BM25 over the index at `dir`. Scores are rounded to
    * `roundTo` dp BEFORE the (score desc, doc_id asc) cut so the result
    * set is deterministic across engines and reduction orders. The
    * postings scan carries `bucket IN (query buckets)` — a partition
    * filter (asserted on the physical scan in SearchSpec).
    */
  def bm25TopK(spark: SparkSession, dir: String, query: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75, buckets: Int = 64,
               roundTo: Int = 4): DataFrame = {
    val qTokens = queryTokens(query)
    require(qTokens.nonEmpty, "query has no tokens")
    val st = spark.read.parquet(s"$dir/stats").head()
    val nDocs = st.getLong(st.fieldIndex("n_docs"))
    val avgdl = st.getDouble(st.fieldIndex("avgdl"))
    // bucket ids via the SAME hash Spark used at build time (xxhash64 as
    // a Catalyst expression — computed in one tiny local-relation job,
    // never reimplemented driver-side where it could drift)
    import spark.implicits._
    val qBuckets = qTokens.toDF("token")
      .select(pmod(xxhash64(col("token")), lit(buckets)).cast("int").as("bucket"))
      .as[Int].collect().distinct.toSeq
    val probed = spark.read.parquet(s"$dir/postings")
      .where(col("bucket").isin(qBuckets.map(Integer.valueOf): _*))
      .where(col("token").isin(qTokens: _*))
    // df folded into the same pass as the scoring (r06, VERDICT #3): each
    // posting row is a distinct (token, doc), so a per-token window count
    // IS df — ONE scan of the probed buckets instead of a second scan
    // feeding a broadcast df join (SearchSpec asserts the single scan)
    val withDf = probed.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("token"))))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    withDf
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * tfNorm), roundTo).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }
}
