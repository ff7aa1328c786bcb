package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination — remove training documents that share any
  * token n-gram with a benchmark/eval corpus (the GPT-3 appendix-C /
  * Dolma decontamination rule; 13-grams are the published default, the
  * `n` here is a parameter because the right value depends on the
  * tokenizer and domain). The reference app (ocr-app
  * `app/services/ocr_service.py`) has no corpus-level notion at all;
  * this is a pure training-pipeline operator.
  *
  * Shape at 100 TB: the EVAL side is always tiny (benchmarks are at
  * most millions of grams) while the train side is the corpus — so the
  * eval gram set is distinct-ed, hashed to longs, and BROADCAST
  * (`broadcastEval = true`, the default): the train side is then a
  * map-side semi-join — ZERO shuffle of corpus data, the scan streams
  * straight through a hash probe. With `broadcastEval = false` the same
  * plan runs as a shuffle join for the degenerate case of a huge eval
  * side. Gram identity is `xxhash64` of the space-joined normalized
  * token window: 64-bit collisions at benchmark-gram cardinality are
  * ~1e-9 — and a collision only OVER-removes (safe direction for
  * decontamination).
  *
  * Normalization (both sides, identical): lowercase, whitespace
  * collapsed to single spaces, whitespace-token n-grams.
  */
object Decontaminate {

  /** Distinct `(id, gram_hash)` pairs: xxhash64 of each space-joined
    * n-token window over the normalized token stream. Documents shorter
    * than `n` tokens contribute nothing.
    */
  def gramHashes(df: DataFrame, idCol: String, textCol: String,
                 n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val toks = split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " ")
    df.select(col(idCol).as("id"), toks.as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("id"), explode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> xxhash64(array_join(slice(toks, i, $n), ' ')))")).as("gram_hash"))
      .distinct()
  }

  /** Per-train-document contamination report: `(id, eval_docs_hit,
    * grams_hit)` for every train document sharing at least one n-gram
    * with `eval` — the audit artifact (what got hit, by which fraction
    * of the benchmark) that precedes the destructive filter.
    */
  def overlapReport(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int,
                    broadcastEval: Boolean = true): DataFrame = {
    val tg = gramHashes(train, idCol, textCol, n)
    val eg0 = gramHashes(eval, idCol, textCol, n)
      .withColumnRenamed("id", "eval_id")
    val eg = if (broadcastEval) broadcast(eg0) else eg0
    tg.join(eg, Seq("gram_hash"))
      .groupBy(col("id"))
      .agg(countDistinct(col("eval_id")).as("eval_docs_hit"),
        countDistinct(col("gram_hash")).as("grams_hit"))
  }

  /** The surviving train corpus: drop every document whose distinct
    * contaminated-gram count reaches `minHits` (1 = the published
    * any-overlap rule; higher values tolerate incidental collisions on
    * very common phrases). Full input schema preserved.
    */
  def removeContaminated(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int, minHits: Long = 1L,
                         broadcastEval: Boolean = true): DataFrame = {
    val bad = overlapReport(train, eval, idCol, textCol, n, broadcastEval)
      .where(col("grams_hit") >= minHits)
      .select(col("id").as(idCol))
    train.join(bad, Seq(idCol), "left_anti")
  }
}
