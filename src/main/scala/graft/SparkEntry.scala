package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.PageGen
import graft.pipeline.{Checkpoint, Extraction}

/** Driver contract — one `queries` entry per operator family from
  * SURVEY.md §2, plus the extraction pipeline itself over the
  * deterministic synthetic page table (FIXTURES.md).
  *
  * Oracle-checked entries (`oracleSql`) run over the driver's
  * `/root/testdata/<sf>/` Parquet tables and are cross-checked against
  * DuckDB; every aggregate/computed column is aliased identically on both
  * sides. Sums over doubles are expressed as exact BIGINT sums
  * (quantities are integral; prices are summed in cents) so the compare
  * is FP-noise-free. Pipeline entries (`pipe*`) exercise the extraction
  * kernels over [[PageGen]] fixtures — not SQL-expressible, so they get
  * the driver's rows-only check and are byte-verified by `sbt test`
  * goldens instead.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Fixture scale used by Verify-time pipeline queries (deterministic). */
  private val FixtureN = 400

  private def fixturePages(s: SparkSession): DataFrame = {
    import s.implicits._
    s.createDataset(PageGen.pages(FixtureN)).toDF()
  }

  /** Flagship: full extraction pipeline on the synthetic page table.
    * Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Extraction.extractAll(fixturePages(spark))
      .select(col("url"), col("source_type"), col("document_type"),
        col("language"), length(col("extracted_text")).as("text_len"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ B. aggregations
    "q01_agg_partial_final" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100, 0).cast("bigint")).as("sum_price_cents"),
          count(lit(1)).as("cnt"))
    }),
    "q02_count_distinct" -> ((s, dir) => {
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("cnt"))
    }),
    "q16_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem").rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    }),
    // ------------------------------------- F. sorts / limits / top-k
    "q03_topk" -> ((s, dir) => {
      t(s, dir, "documents").orderBy(desc("n_chars"), asc("doc_id"))
        .limit(10).select(col("doc_id"), col("n_chars"))
    }),
    "q17_point_lookup" -> ((s, dir) => {
      t(s, dir, "events").where(col("event_id") === 42)
        .select(col("event_id"), col("user_id"), col("event_type"))
    }),
    // ------------------------------------------------ G. windows
    "q04_window_first" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
    }),
    // ------------------------------------------------ E. joins
    "q05_join_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = broadcast(t(s, dir, "customer"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("orders_cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("bigint")).as("total_cents"))
    }),
    "q06_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").where(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("lonely"))
    }),
    // identical answer to q06 — the point of q56 is the SCALE SHAPE: a
    // Bloom filter over the exclusion keys splits probes into
    // definitely-new (no shuffle) and a maybe-seen sliver that alone
    // pays the exact anti-join; false positives are re-checked, so the
    // result is exact and shares q06's oracle
    "q56_anti_join_bloom" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").where(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey"))
      graft.ops.Relational.antiJoinBloom(c, big, "c_custkey",
          expectedItems = 100000L, fpp = 0.01)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("lonely"))
    }),
    // the Bloom anti-join over STRING content-hash keys — the exact
    // resume shape the memoization cache runs (`cache_manager.py:23-25`
    // keys by sha256 hex): keep only documents whose content hash is not
    // in the seen set; definitely-new rows skip the shuffle entirely
    "q57_bloom_resume_hash" -> ((s, dir) => {
      val h = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), sha2(col("text"), 256).as("content_hash"))
      val seen = h.where(col("doc_id") % 7 === 0).select(col("content_hash"))
      graft.ops.Relational.antiJoinBloom(h, seen, "content_hash",
          expectedItems = 100000L, fpp = 0.01)
        .groupBy(col("lang")).agg(count(lit(1)).as("survivors"))
    }),
    "q07_semi_join" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
        .groupBy(col("p_brand")).agg(count(lit(1)).as("used_parts"))
    }),
    // ------------------------------------ B1/F1: ordered merge analog
    "q08_ordered_merge" -> ((s, dir) => {
      t(s, dir, "events").groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type")))).as("sorted"),
          count(lit(1)).as("cnt"))
        .select(col("user_id"),
          array_join(expr("transform(sorted, c -> c.event_type)"), ",").as("event_seq"),
          col("cnt"))
    }),
    // ---------------------------------------- B5/C11: dedup + hashing
    "q09_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(sha2(col("text"), 256)).as("n_unique"))
    }),
    "q11_content_hash" -> ((s, dir) => {
      t(s, dir, "documents").orderBy(asc("doc_id")).limit(50)
        .select(col("doc_id"), sha2(col("text"), 256).as("content_hash"))
    }),
    // exact dedup as a corpus FILTER (one doc per content hash, full
    // schema survives — the cheap first pass of the dedup funnel)
    "q63_exact_dedup_filter" -> ((s, dir) => {
      graft.ops.Dedup.exactFilter(t(s, dir, "documents"), "doc_id", "text")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("survivors"), sum(col("n_chars")).as("chars"))
    }),
    // per-host template removal, word-separated so DuckDB can mirror
    // the full semantics (documents.text has no newlines); the
    // production '\n' shape is pipe45 + TemplateSpec
    "q65_template_removal" -> ((s, dir) => {
      graft.ops.Template.removeTemplateLines(
        t(s, dir, "documents"), "doc_id", "source", "text",
        separator = " ", minDocFrac = 0.6, minDocs = 2)
    }),
    // eval-set decontamination (GPT-3 appendix-C shape): docs whose
    // doc_id % 37 == 0 pose as the benchmark; report per-train-doc
    // overlap at n=4 (13 is the published default — the synthetic
    // corpus needs a smaller window to overlap at all). The broadcast
    // eval-gram probe means the train side never shuffles.
    "q66_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val eval = docs.where(col("doc_id") % 37 === 0)
      val train = docs.where(col("doc_id") % 37 =!= 0)
      graft.ops.Decontaminate.overlapReport(train, eval, "doc_id", "text", n = 4)
        .select(col("id").as("doc_id"), col("eval_docs_hit"), col("grams_hit"))
    }),
    // PII census over deterministically planted addresses/IPs/phones
    // (the corpus itself is synthetic word salad): detect is a pure
    // regexp_count map, exactly replayable in DuckDB. The Luhn-gated
    // card detector is spec-covered (PiiSpec) — not SQL-expressible.
    "q67_pii_detect" -> ((s, dir) => {
      val wire = concat(col("text"),
        when(col("doc_id") % 5 === 0, lit(" contact user@example.com now")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" from 203.0.113.7 gateway")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(" call 415-555-0123 today")).otherwise(lit("")))
      graft.ops.Pii.detect(
          t(s, dir, "documents").withColumn("text", wire), "doc_id", "text")
        .where(col("emails") + col("ipv4s") + col("phones") > 0)
        .select(col("doc_id"), col("emails"), col("ipv4s"), col("phones"))
    }),
    // domain-suffix blocklist gate over synthesized hosts (every 3rd
    // user's traffic is served from an ads. subdomain): one entry per
    // registrable suffix blocks all subdomains; survivors per host.
    "q68_domain_blocklist" -> ((s, dir) => {
      import s.implicits._
      val bl = Seq("ads.example.com", "host7.example.com", "blocked.net")
        .toDF("blocked")
      val ev = t(s, dir, "events").select(col("event_id"),
        concat(
          when(col("user_id") % 3 === 0, lit("ads.")).otherwise(lit("")),
          lit("host"), (col("user_id") % 50).cast("string"),
          lit(".example.com")).as("host"))
      graft.ops.CrawlPolicy.blockByDomainSuffix(ev, "host", bl)
        .groupBy(col("host")).agg(count(lit(1)).as("kept_events"))
    }),
    // Aho-Corasick phrase gate: one automaton pass per doc for the
    // whole pattern list. Patterns are border-free (cannot overlap
    // themselves), so AC's every-occurrence count equals the oracle's
    // non-overlapping regexp count.
    "q69_phrase_scan" -> ((s, dir) => {
      graft.ops.TextOps.phraseScan(t(s, dir, "documents"), "doc_id", "text",
          Seq("stream join", "window merge", "fast key"))
        .where(col("flagged"))
        .select(col("doc_id"), col("total_hits"), col("patterns_hit"))
    }),
    // sliding-window chunker: 500-char windows advancing 400 (100-char
    // overlap) — pure arithmetic, exactly replayable in SQL
    "q70_chunk_windows" -> ((s, dir) => {
      graft.ops.TextOps.chunkWindows(
          t(s, dir, "documents"), "doc_id", "text", window = 500, overlap = 100)
        .select(col("doc_id"), col("chunk_idx"),
          length(col("chunk")).as("chunk_len"), sha2(col("chunk"), 256).as("chunk_hash"))
    }),
    // per-domain contribution cap (C4-style host diversification):
    // deterministic 30-doc cap per lang, ordered by a hash both engines
    // can compute (sha256 of the id)
    "q71_domain_cap" -> ((s, dir) => {
      graft.ops.Sampling.capPerKey(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "lang", "doc_id", cap = 30,
          orderCol = Some(sha2(col("doc_id").cast("string"), 256)))
    }),
    // invisible/bidi-control strip as a native codegen expression, over
    // deterministically planted zero-widths and overrides
    "q72_strip_invisible" -> ((s, dir) => {
      val wire = concat(
        when(col("doc_id") % 3 === 0, lit("x\u200By\u202Ez ")).otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 4 === 0, lit(" tail\u00ADsoft\uFEFF")).otherwise(lit("")))
      t(s, dir, "documents").withColumn("wire", wire)
        .selectExpr("doc_id", "sha2(strip_invisible(wire), 256) AS clean_hash",
          "length(wire) - length(strip_invisible(wire)) AS removed_chars")
    }),
    // explicit GROUPING SETS with grouping_id — the reporting shape
    // between q16's rollup and q37's cube: exactly the named subtotal
    // combinations, nothing else
    "q73_grouping_sets" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_type"), (col("user_id") % 4).as("bucket"), col("value"))
      e.groupingSets(
          Seq(Seq(col("event_type"), col("bucket")), Seq(col("event_type")), Seq()),
          col("event_type"), col("bucket"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("cnt"),
          round(sum(col("value")), 2).as("value_sum"))
    }),
    // frame-bounded window aggregation: per-user trailing-4-row moving
    // sum/avg in event order — the sessionless activity-smoothing shape
    "q74_moving_agg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 2).as("mov_sum"),
          round(avg(col("value")).over(w), 4).as("mov_avg"))
    }),
    // ordered string aggregation: deterministic comma-joined distinct
    // event types per user (listagg/string_agg semantics)
    "q75_string_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
          countDistinct(col("event_type")).as("n_types"))
    }),
    // regexp_extract_all census: every long alphabetic token in the
    // corpus, exploded and counted — the regex-sweep shape PII/keyword
    // audits run
    "q76_regex_census" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(expr("regexp_extract_all(text, '[A-Za-z]{4,}', 0)")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .where(col("n") >= 10)
    }),
    // conditional aggregation (the SQL FILTER clause shape): per-type
    // counts and averages over predicated slices in one pass
    "q77_conditional_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(when(col("value") > 0.5, 1)).as("n_hi"),
          round(sum(when(col("user_id") % 2 === 0, col("value"))), 2).as("even_sum"),
          round(avg(when(col("value") <= 0.5, col("value"))), 4).as("lo_avg"))
    }),
    // correlated scalar subquery (Catalyst decorrelates it into a join):
    // customers above their own nation's average balance — the classic
    // per-group-threshold SQL shape, exercised through the SQL surface
    "q78_correlated_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g78_customer")
      // sum, not avg: acctbal is a 2-dp decimal, so round(sum, 2) lands ON
      // the value grid (tie-free); round(avg, 2) can sit exactly on .xx5
      // where Spark (decimal-repr HALF_UP) and DuckDB (numeric) disagree
      s.sql("""SELECT c_nationkey, count(*) AS n_above,
                 round(sum(c_acctbal), 2) AS sum_above
               FROM g78_customer c
               WHERE c_acctbal > (SELECT avg(c_acctbal) FROM g78_customer c2
                                  WHERE c2.c_nationkey = c.c_nationkey)
               GROUP BY c_nationkey""")
    }),
    // generator over a computed range: each order explodes into its
    // 4-day fulfilment window (sequence + explode — the row-multiplying
    // UDTF shape), then a busy-day census
    "q79_sequence_days" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(explode(sequence(to_date(col("o_orderdate")),
          date_add(to_date(col("o_orderdate")), 3))).as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("n"))
        .where(col("n") >= 30)
    }),
    // bivariate statistical aggregates: correlation / covariance /
    // dispersion per flag in one pass (all codegen'd built-ins)
    "q80_stats_suite" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("qty_disc_covar"),
          round(stddev_samp(col("l_extendedprice")), 2).as("price_sd"),
          round(var_pop(col("l_quantity")), 4).as("qty_var"))
    }),
    // calendar bucketing: ISO weekday census over order dates (weekday()
    // = 0..6 Monday-based; the oracle maps DuckDB's isodow to the same)
    "q81_weekday_census" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(expr("weekday(o_orderdate)").as("wd"), col("o_totalprice"))
        .groupBy(col("wd"))
        .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))
    }),
    // edit-distance census: levenshtein against a probe key (the fuzzy
    // string-match primitive; both engines implement the classic DP)
    "q82_edit_distance" -> ((s, dir) => {
      t(s, dir, "part")
        .select(levenshtein(col("p_brand"), lit("Brand#33")).as("dist"))
        .groupBy(col("dist")).agg(count(lit(1)).as("n"))
    }),
    // BM25 retrieval over the at-rest inverted index (ops/Search): build
    // bucket-partitioned postings from the documents table, then a
    // partition-pruned top-k probe — the oracle recomputes the same
    // Lucene-idf BM25 from scratch in SQL, so index construction AND
    // scoring are both hash-checked
    "q83_bm25_search" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q83").toString
      graft.ops.Search.buildIndex(t(s, dir, "documents"), "doc_id", "text",
        tmp, buckets = 32)
      graft.ops.Search.bm25TopK(s, tmp, "stream window hash", k = 20, buckets = 32)
    }),
    // sequential conversion funnel: how far each user progressed through
    // view → click → purchase IN EVENT-TIME ORDER (first occurrences must
    // ascend) — the MATCH_RECOGNIZE-ish pattern shape expressed as one
    // conditional-min aggregation, no window, no self-join
    "q88_funnel" -> ((s, dir) => {
      val m = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("tv"),
          min(when(col("event_type") === "click", col("ts"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
      m.select(col("user_id"),
        when(col("tv").isNull, 0)
          .when(col("tc").isNull || col("tc") <= col("tv"), 1)
          .when(col("tp").isNull || col("tp") <= col("tc"), 2)
          .otherwise(3).as("stage"))
        .groupBy(col("stage")).agg(count(lit(1)).as("users"))
        .orderBy(asc("stage"))
    }),
    // crawl-trap census: per (host, first-path-segment) distinct-URL
    // explosion — the calendar/session-id trap detector every frontier
    // runs before burning fetch budget (synthetic URLs from events, as
    // q55; 'click' prefixes explode per event, others stay bounded)
    "q87_trap_census" -> ((s, dir) => {
      val url = concat(lit("https://h"), (col("user_id") % 20).cast("string"),
        lit(".example.com/"), col("event_type"), lit("/"),
        when(col("event_type") === "click", col("event_id"))
          .otherwise(col("event_id") % 5).cast("string"))
      t(s, dir, "events")
        .select(parse_url(url, lit("HOST")).as("host"),
          split(parse_url(url, lit("PATH")), "/").getItem(1).as("seg"),
          parse_url(url, lit("PATH")).as("path"))
        .groupBy(col("host"), col("seg"))
        .agg(countDistinct(col("path")).as("distinct_paths"),
          count(lit(1)).as("hits"))
        .withColumn("is_trap", col("distinct_paths") > 40)
        .orderBy(asc("host"), asc("seg"))
    }),
    // weighted sample without replacement (Sampling.weightedSample,
    // Efraimidis-Spirakis): k smallest -ln(u)/w keys with u from a
    // seeded sha-256 — weight-proportional, re-run-stable, and
    // replayable by the oracle's identical arithmetic; executes as
    // take-ordered, never a global sort
    "q86_weighted_sample" -> ((s, dir) => {
      graft.ops.Sampling.weightedSample(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 50, seed = 42L)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(asc("doc_id"))
    }),
    // mergeable KLL quantile sketches at rest (kernel/Kll via
    // ops/Stats): per-lang sketch tables built from two disjoint
    // half-batches, MERGED at rest (the incremental-crawl statistics
    // path — cost scales with keys, not corpus), then expanded to
    // quantile rows; in-query requires: exact n conservation and the
    // merged median within rank-error bound of the true median
    "pipe69_kll_quantiles" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars").cast("double").as("v"))
        .cache()
      val t1 = graft.ops.Stats.kllByKey(
        base.where(col("doc_id") % 2 === 0), "lang", "v", 200)
      val t2 = graft.ops.Stats.kllByKey(
        base.where(col("doc_id") % 2 === 1), "lang", "v", 200)
      val merged = graft.ops.Stats.mergeSketchTables(t1, t2, "lang").cache()
      val nTotal = merged.agg(sum(col("n"))).head().getLong(0)
      require(nTotal == base.count(), "merged sketch tables must conserve n")
      val qrows = graft.ops.Stats.quantilesFromSketches(
        merged, "lang", Seq(0.25, 0.5, 0.9)).cache()
      qrows.where(col("q") === 0.5)
        .select(col("lang"), col("value")).as[(String, Double)].collect()
        .foreach { case (lang, v) =>
          val grp = base.where(col("lang") === lang)
          val frac = grp.where(col("v") <= v).count().toDouble / grp.count()
          require(math.abs(frac - 0.5) <= 0.05,
            f"sketch median rank drift $frac%.3f for $lang")
        }
      base.unpersist()
      qrows.select(col("lang"), col("n"), col("q"), col("value"))
        .orderBy(asc("lang"), asc("q"))
    }),
    // deterministic corpus shuffle + sharding (Sampling.shardAssign):
    // seeded sha-256 permutation into shards with within-shard
    // positions — re-run-stable, no corpus-wide single-task window;
    // the oracle replays the identical hash arithmetic in DuckDB
    "q85_shard_shuffle" -> ((s, dir) => {
      graft.ops.Sampling.shardAssign(
        t(s, dir, "documents").select(col("doc_id")), "doc_id",
        numShards = 8, seed = 42L)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(asc("shard"), asc("pos"))
    }),
    // redirect-chain resolution (CrawlPolicy.resolveRedirects): pointer
    // doubling over a synthetic orderkey redirect graph (src → src-3
    // while src % 90 >= 3; chains end at the first key with no outgoing
    // edge). The DuckDB oracle walks the same edges with a recursive
    // CTE — final target AND exact hop count are hash-checked, and
    // `resolved` doubles as an in-query proof no chain looped
    "q84_redirect_chains" -> ((s, dir) => {
      val e = t(s, dir, "orders")
        .where(col("o_orderkey") % 90 >= 3)
        .select(col("o_orderkey").as("src"), (col("o_orderkey") - 3).as("dst"))
      // chains here are <= 29 hops (src % 90 descends by 3): a 32-hop
      // budget is one fewer doubling round than the default 64
      graft.ops.CrawlPolicy.resolveRedirects(e, "src", "dst", maxHops = 32)
        .select(col("src"), col("final_url").as("final"), col("hops"),
          col("resolved"))
        .orderBy(asc("src"))
    }),
    // ------------------------------------------- C6: TTL predicate
    "q10_ttl_filter" -> ((s, dir) => {
      t(s, dir, "events")
        .where(col("ts") + expr("INTERVAL 24 HOURS") >
          lit(java.sql.Timestamp.valueOf("2024-01-30 00:00:00")))
        .groupBy(col("event_type")).agg(count(lit(1)).as("live_cnt"))
    }),
    // -------------------------------------- C3: keyword classification
    "q12_label_classifier" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("document_type",
          when(lower(col("text")).rlike("window|stream"), "matched").otherwise("unknown"))
        .groupBy(col("document_type")).agg(count(lit(1)).as("cnt"))
    }),
    // ---------------------------------------- text analysis operators
    "q13_token_count" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), size(split(trim(col("text")), "\\s+")).as("toks"))
        .groupBy(col("lang"))
        .agg(sum(col("toks")).as("total_tokens"), count(lit(1)).as("cnt"))
    }),
    "q32_bpe_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), graft.ops.TextOps.bpeTokenCount(col("text")).as("toks"))
        .groupBy(col("lang"))
        .agg(sum(col("toks")).as("bpe_tokens"), count(lit(1)).as("cnt"))
    }),
    // REAL byte-level BPE subword counts (kernel/Bpe: merges table
    // applied, golden-pinned deterministic trainer) as the native
    // codegen bpe_count expression — next to the q32 pretoken proxy;
    // not SQL-expressible (the merge loop), so rows-only + BpeSpec
    // differential/golden coverage
    "pipe30_bpe_subwords" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s) // idempotent belt-and-braces
      t(s, dir, "documents")
        .selectExpr("lang", "bpe_count(text) AS toks",
          "length(text) AS chars")
        .groupBy(col("lang"))
        .agg(sum(col("toks")).as("bpe_subwords"),
          sum(col("chars")).as("chars"), count(lit(1)).as("cnt"))
    }),
    "q14_quality_stats" -> ((s, dir) => {
      t(s, dir, "documents").groupBy(col("source"))
        .agg(sum(length(col("text"))).as("chars"),
          sum(length(col("text")) - length(expr("replace(text, ' ', '')"))).as("spaces"),
          max(col("n_chars")).as("max_chars"))
    }),
    // ------------------------------------------------ H. set ops
    "q15_set_union" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .distinct().agg(count(lit(1)).as("n"))
    }),
    // ------------------------------------- similarity / embeddings
    "q18_embedding_norm" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          round(sqrt(expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")), 4).as("norm"))
        .orderBy(asc("vec_id")).limit(100)
    }),
    "q19_knn_bruteforce" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 7).select(col("embedding").as("qv"))
      val dot = expr("aggregate(zip_with(embedding, qv, (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
      val nE = expr("sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))")
      val nQ = expr("sqrt(aggregate(transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))")
      e.crossJoin(broadcast(q))
        .select(col("vec_id"), round(dot / (nE * nQ), 6).as("sim"))
        .orderBy(desc("sim"), asc("vec_id")).limit(10)
    }),
    // --------------------------- E: multi-way broadcast-dim join chain
    "q26_join3_dims" -> ((s, dir) => {
      val r = broadcast(t(s, dir, "region"))
      val n = broadcast(t(s, dir, "nation"))
      val c = t(s, dir, "customer")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("customers"),
          sum(round(col("c_acctbal") * 100, 0).cast("bigint")).as("acctbal_cents"))
    }),
    // --------------------------------------- H: intersect / except
    "q27_intersect" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .agg(count(lit(1)).as("n_common"))
    }),
    // ------------------------------ §4 skew: two-phase salted aggregate
    "q25_salted_agg" -> ((s, dir) => {
      graft.ops.Skew.saltedCountSum(t(s, dir, "events"),
          keyCol = "event_type", saltSrcCol = "event_id",
          valueCol = "value", salts = 16)
        .select(col("event_type"), col("cnt"),
          round(col("total"), 2).as("total"))
    }),
    // ------------------------------- dedup / similarity / text ops
    // bounded to 1000 docs: the synthetic corpus is near-dup-saturated, so
    // exact all-pairs output is Ω(n²) — the LSH entries are the scale path
    "q20_jaccard_pairs" -> ((s, dir) => {
      graft.ops.Dedup.wordJaccardPairs(
        t(s, dir, "documents").where(col("doc_id") < 1000), "doc_id", "text", 0.9)
    }),
    "q21_cosine_neardup" -> ((s, dir) => {
      graft.ops.Dedup.cosinePairsExact(t(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
    }),
    // the native codegen lang_id expression (zero-alloc Lang.detect
    // kernel inside WholeStageCodegen): the columnar TextOps.langId twin
    // — differential-tested equal in OpsSpec/FunctionsSpec and the source
    // of the DuckDB oracle — runs through interpreted HOFs
    // (CodegenFallback) and was the sweep's #3 cost at sf0.1
    "q22_lang_id" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s) // idempotent belt-and-braces
      t(s, dir, "documents").selectExpr("lang_id(text) AS lang_id")
        .groupBy(col("lang_id")).agg(count(lit(1)).as("cnt"))
    }),
    "q23_quality_score" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), graft.ops.TextOps.qualityScore(col("text")).as("q"))
    }),
    "q33_stopword_ratio" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), graft.ops.TextOps.stopwordRatio(col("text")).as("sw_ratio"))
        .orderBy(asc("doc_id")).limit(200)
    }),
    "q24_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").orderBy(asc("doc_id")).limit(100)
        .select(col("doc_id"), graft.ops.TextOps.fingerprint(col("text")).as("fp"))
    }),
    // the cosine scale path (VERDICT r1 #5): multi-table hyperplane LSH
    // buckets + exact verify, oracle-checked against a DuckDB rendition
    // generated from the SAME plane literals (opsOracleSql)
    "q28_cosine_lsh" -> ((s, dir) => {
      graft.ops.Dedup.cosineNearDupLshMulti(t(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.4, tables = 2, planesPerTable = 4)
    }),
    // A5 summary sink formatting (document_saver.py:92-102) against
    // DuckDB printf — the format_string semantics hash-checked
    "q29_summary_format" -> ((s, dir) => {
      t(s, dir, "documents").orderBy(asc("doc_id")).limit(100)
        .select(col("doc_id"), format_string(
          "Document Analysis Summary\n-------------------------\nFilename: %s\nTotal pages: %d\nChunks processed: %d\nText length: %d characters\n",
          concat(lit("doc_"), col("doc_id")), pmod(col("n_chars"), lit(10)),
          pmod(col("n_chars"), lit(3)), length(col("text"))).as("summary"))
    }),
    // A3 JSON results sink projection (document_saver.py:84-85):
    // to_json(struct(...)) — byte-compared against DuckDB's to_json
    "q30_to_json" -> ((s, dir) => {
      t(s, dir, "documents").orderBy(asc("doc_id")).limit(100)
        .select(col("doc_id"),
          to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("js"))
    }),
    // A7/F2 listing order (routes.py:44-60, mtime desc): the rank column
    // makes the ordering itself part of the hashed result (the driver
    // sorts rows before hashing, so bare ORDER BY would not be checked)
    "q31_listing_order" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val manifest = t(s, dir, "events").groupBy(col("event_type"))
        .agg(max(col("ts")).as("committed_ts"))
        .withColumn("path", concat(lit("/out/"), col("event_type")))
      Checkpoint.listing(manifest)
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("committed_ts"), asc("path"))))
    }),
    // sessionization — the classic event-stream prep op: a new session
    // starts after a 30,000 s gap; per-user session counts. Gap math runs
    // on fractional epoch seconds (timestamp cast to double), identical
    // in both engines; (ts, event_id) ordering makes window frames total
    "q34_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      // ts is TIMESTAMP_NTZ; route through LTZ (session tz is UTC, so the
      // instant is unchanged) to get fractional epoch seconds like epoch()
      def epochS(c: org.apache.spark.sql.Column) =
        c.cast("timestamp_ltz").cast("double")
      val gap = epochS(col("ts")) - epochS(lag(col("ts"), 1).over(w))
      t(s, dir, "events")
        .withColumn("new_sess", when(gap.isNull || gap > 30000d, 1L).otherwise(0L))
        .withColumn("sess", sum(col("new_sess")).over(w))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("session_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("session_events")).as("max_session_events"))
    }),
    // C4-style line dedup (Raffel et al. 2020: drop any "line" occurring
    // more than once in the corpus): 3-token lines, global count, keep
    // unique lines, reassemble per-doc text in original order. The only
    // shuffles are the line-count aggregate and the rejoin — the same
    // hash-partitioned shape at 100 TB
    "q35_line_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      val lines = docs.select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), ceil(size(col("toks")) / lit(3.0)).cast("int") - 1),
            i => array_join(slice(col("toks"), i * 3 + 1, lit(3)), " "))))
        .withColumnRenamed("pos", "i").withColumnRenamed("col", "line")
      val counts = lines.groupBy(col("line")).agg(count(lit(1)).as("c"))
      lines.join(counts, Seq("line")).where(col("c") === 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("kept_lines"),
          sha2(array_join(expr("transform(array_sort(collect_list(struct(i, line))), x -> x.line)"), " "), 256)
            .as("new_text_hash"))
    }),
    // PII-style redaction: digit runs masked, content hash proves byte
    // identity of the rewritten column ([0-9]+ is Java-regex/RE2 common)
    "q36_redact" -> ((s, dir) => {
      t(s, dir, "events").orderBy(asc("event_id")).limit(200)
        .select(col("event_id"),
          sha2(regexp_replace(col("props"), "[0-9]+", "<NUM>"), 256).as("redacted_hash"))
    }),
    // CUBE over two dims (all four grouping sets)
    "q37_cube" -> ((s, dir) => {
      t(s, dir, "lineitem").cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    }),
    // AS-OF join (the time-series operator Spark lacks natively): every
    // non-click event matched to the user's latest click state at-or-
    // before its timestamp; one keyed shuffle (see ops/Relational).
    // Oracle = DuckDB's native ASOF LEFT JOIN
    "q38_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val right = e.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("state_v"))
      val left = e.where(col("event_type") =!= "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.ops.Relational.asofJoin(left, right, "user_id", "ts")
        .select(col("event_id"), col("user_id"),
          col("_asof_ts").as("state_ts"), round(col("_r_state_v"), 2).as("state_v"))
    }),
    // identical answer to q38 — the point of q51 is the SKEW-SAFE plan:
    // the window partitions by (user_id, day-slice) with carry-in rows,
    // so one hot user no longer serializes into a single task (OpsSpec
    // proves equality with the unsalted operator at several widths)
    "q51_asof_salted" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val right = e.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("state_v"))
      val left = e.where(col("event_type") =!= "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.ops.Relational.asofJoinSalted(left, right, "user_id", "ts",
          splitSeconds = 86400L)
        .select(col("event_id"), col("user_id"),
          col("_asof_ts").as("state_ts"), round(col("_r_state_v"), 2).as("state_v"))
    }),
    // per-host crawl statistics — the skew census that sizes the salting
    // ops (one hot host dominating a crawl is THE practical skew case);
    // host via Spark's parse_url built-in, oracle re-derives with regex
    "q55_host_stats" -> ((s, dir) => {
      val url = concat(lit("https://host"), (col("user_id") % 50).cast("string"),
        lit(".example.com/t/"), col("event_type"),
        lit("?k="), (col("event_id") % 7).cast("string"))
      t(s, dir, "events")
        .groupBy(parse_url(url, lit("HOST")).as("host"),
          parse_url(url, lit("PATH")).as("path"))
        .agg(count(lit(1)).as("hits"),
          countDistinct(col("user_id")).as("users"),
          round(sum(col("value")), 2).as("value_sum"),
          max(parse_url(url, lit("QUERY"), lit("k")).cast("int")).as("max_k"))
    }),
    // politeness fetch scheduling: per-host crawl-delay (deterministic
    // function of the host id, the CrawlPolicy.crawlDelays shape) ×
    // row_number over the host's frontier order → fetch offset. The
    // per-host window is hash-partitioned (no global sort) — the shape
    // a 10^12-URL frontier scheduler actually runs
    "q64_fetch_schedule" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hostId = col("user_id") % 50
      t(s, dir, "events")
        .select(col("event_id"),
          concat(lit("host"), hostId.cast("string"), lit(".example.com")).as("host"),
          (hostId % 5 + 1).cast("bigint").as("delay_s"))
        .withColumn("rn",
          row_number().over(Window.partitionBy(col("host")).orderBy(col("event_id"))))
        .select(col("host"), col("event_id"), col("delay_s"),
          ((col("rn") - 1).cast("bigint") * col("delay_s")).as("fetch_offset_s"))
    }),
    // Unicode NFC normalization as a NATIVE codegen expression (Spark
    // has no built-in; a UDF would break WholeStageCodegen). The suffix
    // appends a decomposed e + COMBINING ACUTE so normalization has real
    // work to do; DuckDB's identically-named nfc_normalize is the oracle
    "q54_nfc_normalize" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s) // idempotent belt-and-braces
      t(s, dir, "documents").selectExpr("doc_id",
        "nfc_normalize(concat(substring(text, 1, 64), ' café suffix')) AS norm_text")
    }),
    // Gopher-rule quality filter (Rae et al. table A1) — the standard
    // pre-training document filter as pure column expressions; every
    // metric AND the keep flag hash-match the DuckDB re-derivation
    "q53_gopher_quality" -> ((s, dir) =>
      t(s, dir, "documents").select(
        (col("doc_id") +: graft.ops.TextOps.gopherQuality(col("text"))): _*)),
    // certified-exact distributed top-k heavy hitters (Misra-Gries scan
    // + exact verify of the candidate union) — the corpus-stats operator
    // behind "top tokens across the whole crawl"; the DuckDB oracle is
    // the brute-force exact top-k with the same deterministic tie-break
    "q52_top_tokens" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      graft.ops.TextOps.topKExact(toks, "token", k = 25, capacity = 4096)
    }),
    // point-in-interval range join via the binned equi-join rewrite
    // (overlapping, non-grid-aligned intervals; bin width deliberately
    // misaligned with the interval bounds — the residual filter decides)
    "q39_range_join" -> ((s, dir) => {
      import s.implicits._
      val intervals = Seq(
        (1, 0.0, 7.0), (2, 5.0, 23.0), (3, 20.0, 31.0), (4, 30.0, 55.0), (5, 2.0, 3.0))
        .toDF("interval_id", "lo", "hi")
      graft.ops.Relational.pointsInIntervals(
          t(s, dir, "lineitem").select(col("l_quantity")), "l_quantity",
          intervals, binWidth = 8.0)
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    }),
    // exact interpolated percentiles per group (Spark `percentile` ==
    // DuckDB `quantile_cont`, both type R-7 linear interpolation)
    "q40_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("q50"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("q90"),
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25_price"))
    }),
    // pivot: event_type columns per user bucket (fixed value list keeps
    // the schema static — the scale-correct form; dynamic pivot needs a
    // driver-side distinct pass)
    "q41_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("user_bucket", pmod(col("user_id"), lit(10)))
        .groupBy(col("user_bucket"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0) // absent combos: null under pivot, 0 under CASE-sums
    }),
    // EXCEPT (set difference with distinct semantics)
    "q42_except" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(asc("k"))
    }),
    // the ranking-window family in one query: rank / dense_rank / ntile /
    // lead / cume_dist over a per-flag price ordering (event_id-free
    // total order via (l_orderkey, l_linenumber) tie-breaks)
    "q43_window_suite" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          lead(col("l_orderkey"), 1).over(w).as("next_order"),
          round(cume_dist().over(w), 6).as("cd"))
        .where(col("rnk") <= 50)
    }),
    // pair → cluster resolution: connected components over exact-dup
    // pairs (iterative min-label propagation; the step every dedup
    // pipeline needs between pair finding and canonical-doc selection).
    // Oracle: DuckDB recursive-CTE label closure
    "q50_dedup_clusters" -> ((s, dir) => {
      // two similarity signals (shared 40-char prefix / suffix) unioned:
      // components chain ACROSS signals, so transitive resolution is
      // genuinely exercised (prefix-only would give cliques)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), expr("left(trim(text), 40)").as("p"),
          expr("right(trim(text), 40)").as("sfx"))
      def pairsOn(c: String) = docs.as("a").join(docs.as("b"),
          col(s"a.$c") === col(s"b.$c") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      graft.ops.Dedup.connectedComponents(pairsOn("p").union(pairsOn("sfx")).distinct())
    }),
    // deterministic train/val/test split — the reproducible sampler a
    // training pipeline needs (NOT rand(): assignment must survive
    // re-runs, repartitioning and engine changes). Split by the first
    // hex byte of sha256(doc_id): 'cc'=204/256≈80 %, 'e6'=230/256≈10 %,
    // rest test; lexicographic compare on lowercase hex is engine-stable
    "q46_hash_split" -> ((s, dir) => {
      val h = substring(sha2(col("doc_id").cast("string"), 256), 1, 2)
      t(s, dir, "documents")
        .withColumn("split",
          when(h < "cc", "train").when(h < "e6", "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
    }),
    // per-document n-gram REPETITION signals (the FineWeb/Gopher-family
    // "fraction of duplicated n-grams" quality metric): top-bigram share
    // and duplicate-bigram fraction. Deliberately the SHUFFLE shape
    // (explode → per-(doc,bigram) count → per-doc rollup), not a per-row
    // O(n²) array expression — a 100 KB document must not cost 10^10
    // comparisons inside a single task at corpus scale
    "q58_repetition" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      val bigrams = toks.where(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> concat(toks[i - 1], ' ', toks[i]))"))
          .as("bigram"))
      bigrams.groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("total"),
          max(col("c")).as("max_c"),
          count(lit(1)).as("distinct_bigrams"))
        .select(col("doc_id"),
          round(col("max_c") / col("total"), 4).as("top_bigram_frac"),
          round(lit(1.0) - col("distinct_bigrams") / col("total"), 4).as("dup_bigram_frac"))
    }),
    // corpus-duplicated n-gram fraction (Lee et al. 2022 "Deduplicating
    // Training Data" substring-dedup signal): per document, the share of
    // its 8-token-grams that occur more than once ANYWHERE in the corpus
    // — the metric that decides whether span-level dedup is worth
    // running. Same shuffle shape as q58 (explode → global gram counts →
    // rejoin → per-doc rollup); grams are exact token strings so the
    // DuckDB oracle is byte-equivalent
    "q60_dup_ngram_frac" -> ((s, dir) => {
      val n = 8
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      val grams = toks.where(size(col("toks")) >= n)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, size(toks) - ${n - 1}), i -> array_join(slice(toks, i, $n), ' '))"))
          .as("gram"))
      val counts = grams.groupBy(col("gram")).agg(count(lit(1)).as("c"))
      grams.join(counts, Seq("gram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("total"),
          sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup"))
        .select(col("doc_id"), round(col("dup") / col("total"), 4).as("dup_gram_frac"))
    }),
    // SURT-style host key reversal (org.example.www) — the canonical
    // crawl SORT KEY (Common Crawl index files are SURT-ordered so one
    // domain's pages cluster in adjacent rows/partitions); census per
    // reversed key proves the expression against a DuckDB string mirror
    "q59_surt_keys" -> ((s, dir) => {
      val url = concat(lit("https://sub"), (col("event_id") % 3).cast("string"),
        lit(".host"), (col("user_id") % 50).cast("string"),
        lit(".example.com/p/"), col("event_type"))
      t(s, dir, "events")
        .select(array_join(reverse(split(parse_url(url, lit("HOST")), "\\.")), ".")
          .as("surt_host"))
        .groupBy(col("surt_host")).agg(count(lit(1)).as("pages"))
    }),
    // deterministic STRATIFIED mixture sampling — the domain/language
    // re-weighting step every pre-training corpus runs (e.g. upsample
    // quality domains, downsample boilerplate-heavy ones). NOT rand():
    // the keep decision is a pure function of (doc_id), so it survives
    // re-runs, repartitioning and engine changes exactly like q46's
    // split. u = first 8 sha256 hex chars as a uniform in [0, 1)
    "q61_stratified_sample" -> ((s, dir) => {
      // per-stratum keep fraction as a HEX-STRING cutoff on the first 8
      // sha256 chars (0.9 → e6666666, 0.5 → 80000000, 0.25 → 40000000):
      // lexicographic compare on lowercase hex is engine-stable and
      // FP-free, the same device as q46's split
      val h8 = substring(sha2(concat(lit("mix:"), col("doc_id").cast("string")), 256), 1, 8)
      val keep = when(col("lang") === "en", h8 < "e6666666")
        .when(col("lang") === "zh", h8 < "80000000")
        .otherwise(h8 < "40000000")
      t(s, dir, "documents")
        .where(keep)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("sampled"), sum(col("n_chars")).as("chars"))
    }),
    // sequence PACKING: documents greedily packed in deterministic
    // doc_id order into fixed token-budget bins (the step that turns a
    // filtered corpus into fixed-length training sequences). bin =
    // floor(exclusive-prefix-sum(tokens) / budget) — a single window
    // cumsum, no driver loop; per-bin stats are the oracle surface.
    // The global ORDER BY window is the correctness spec; at corpus
    // scale the same expression runs per shard (partitionBy a
    // hash-split column) since bins never straddle training shards
    "q62_sequence_packing" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 2048L
      val w = Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "documents")
        .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
        .withColumn("prev", coalesce(sum(col("toks")).over(w), lit(0L)))
        .withColumn("bin", floor(col("prev") / budget))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("docs"), sum(col("toks")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
    }),
    // corpus bigram counts (contamination/dedup diagnostics): top-20 by
    // count with a lexicographic tie-break so the cut is total
    "q47_bigram_counts" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(split(trim(col("text")), "\\s+").as("toks"))
        // guard: Spark's sequence(1, 0) DESCENDS, so 1-token docs need an
        // explicit empty array, not an empty-looking sequence
        .select(explode(expr(
          "CASE WHEN size(toks) < 2 THEN array() ELSE " +
            "transform(sequence(1, size(toks) - 1), i -> concat(toks[i - 1], ' ', toks[i])) END"))
          .as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("bigram")).limit(20)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(desc("cnt"), asc("bigram"))))
    }),
    // eval-contamination screen: how many documents contain each probe
    // phrase (exact substring; the broadcast-probes shape at corpus scale)
    "q48_contamination" -> ((s, dir) => {
      import s.implicits._
      val probes = Seq("stream join", "window merge", "quantum blockchain synergy")
        .toDF("probe")
      t(s, dir, "documents").crossJoin(broadcast(probes))
        .groupBy(col("probe"))
        .agg(sum(when(col("text").contains(col("probe")), 1L).otherwise(0L)).as("hits"))
    }),
    // time-series rollup: date_trunc day buckets (NTZ-safe)
    "q44_time_rollup" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("value_sum"))
    }),
    // JSON metadata extraction (crawl sidecar columns are JSON blobs):
    // get_json_object path lookup, numeric cast, aggregate
    "q45_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("k_sum"), max(col("k")).as("k_max"))
    }),
    // HLL++ sketch next to the exact answer (rows-only: approximate by
    // design; OpsSpec asserts the relative-error bound)
    "pipe21_approx_distinct" -> ((s, dir) => {
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
    }),
    "pipe08_minhash_lsh" -> ((s, _) => {
      graft.ops.Dedup.minhashNearDupPairs(
        fixturePages(s).select(col("url"), col("text")), "url", "text",
        shingleK = 3, numHashes = 32, numBands = 8, threshold = 0.8)
    }),
    "pipe09_simhash_pairs" -> ((s, _) => {
      val withId = fixturePages(s)
        .select(xxhash64(col("url")).as("id"), col("text"), col("url"))
      graft.ops.Dedup.simHashPairs(withId.select(col("id"), col("text")), "id", "text", 3)
    }),
    "pipe10_ann_lsh" -> ((s, dir) => {
      graft.ops.Similarity.annLshTopK(t(s, dir, "embeddings"),
        "vec_id", "embedding", queryId = 7L, k = 10, tables = 10, planesPerTable = 5)
    }),
    // IVF coarse-quantizer ANN (the second scale path next to LSH):
    // deterministic driver-trained centroids, distributed assignment
    "pipe17_ann_ivf" -> ((s, dir) => {
      graft.ops.Similarity.ivfTopK(t(s, dir, "embeddings"),
        "vec_id", "embedding", queryId = 7L, k = 10, nlist = 16, nprobe = 4)
    }),
    // the IVF index AT REST: corpus written partitionBy(cell) so the
    // probe's cell filter prunes partitions — OpsSpec asserts the scan
    // touches exactly nprobe of nlist files; equals the in-memory twin
    "pipe54_pq_ann" -> ((s, dir) => {
      import s.implicits._
      // product quantization (Jégou TPAMI'11): the corpus compresses to
      // 8 code bytes per 64-float vector; ADC scans the codes and an
      // exact refine pass re-ranks the survivors. Recall vs brute force
      // is asserted in-query so the entry fails loudly on drift.
      val emb = t(s, dir, "embeddings")
      val k = 10
      val got = graft.ops.Similarity.pqTopK(emb, "vec_id", "embedding",
        queryId = 7L, k = k).cache()
      val exact = graft.ops.Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queryId = 7L, k = k)
      val hits = got.select(col("id")).join(
        exact.select(col("vec_id").as("id")), Seq("id"), "left_semi").count()
      require(hits >= (k * 7) / 10, s"PQ recall@$k = $hits/$k below 0.7")
      got
    }),
    "pipe19_ivf_index" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe19").toString
      val emb = t(s, dir, "embeddings")
      graft.ops.Similarity.ivfBuildIndex(emb, "vec_id", "embedding", tmp, nlist = 16)
      val qv = emb.where(col("vec_id") === 7)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .as[Array[Double]].head()
      graft.ops.Similarity.ivfProbeIndex(s, tmp, qv, k = 10, nprobe = 4)
    }),
    // BATCH ANN probe over the at-rest IVF index — the 100 TB dedup
    // shape: a queries DATAFRAME (no driver round-trip per query) joins
    // the cell-partitioned corpus on cell; union of probed cells is the
    // partition filter, per-query window cuts to k (OpsSpec proves
    // equality with the in-memory twin + the pruned scan)
    "pipe29_ann_batch" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe29").toString
      val emb = t(s, dir, "embeddings")
      graft.ops.Similarity.ivfBuildIndex(emb, "vec_id", "embedding", tmp, nlist = 16)
      val queries = emb.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.ops.Similarity.ivfProbeIndexBatch(s, tmp, queries,
        "qid", "qv", k = 5, nprobe = 4)
    }),
    // hot-bucket-capped LSH over the near-dup-saturated synthetic corpus
    // (band buckets over 16 members collapse to star edges — the Ω(m²)
    // mirror-farm defense); candidates still exact-verified
    "pipe20_lsh_capped" -> ((s, dir) => {
      graft.ops.Dedup.minhashNearDupPairs(
        t(s, dir, "documents").where(col("doc_id") < 2000), "doc_id", "text",
        shingleK = 3, numHashes = 32, numBands = 8, threshold = 0.8,
        maxBucket = 16)
    }),
    // the END-TO-END near-dedup job (FineWeb-style) as one call:
    // MinHash → capped LSH → exact verify → connected components → keep
    // min-id per cluster; output = the surviving corpus (OpsSpec proves
    // equality with the exact-Jaccard union-find oracle)
    "pipe31_neardup_filter" -> ((s, dir) => {
      graft.ops.Dedup.nearDupFilter(
          t(s, dir, "documents").where(col("doc_id") < 2000), "doc_id", "text",
          shingleK = 3, numHashes = 32, numBands = 8, threshold = 0.8,
          maxBucket = 16)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),
    // SemDeDup (arXiv:2303.09540): distributed k-means bounds the pairwise
    // cosine search to within-cluster; survivors = min-id per duplicate
    // group. Exact quantized-integer accumulation makes the fitted
    // centroids bit-identical at any parallelism (ClusterSpec pins 1 == 7
    // partitions; k=1 == the exact all-pairs oracle)
    "pipe34_semantic_dedup" -> ((s, dir) => {
      // maxIter 4: near-random fixture embeddings never meet tol, so the
      // default 10 rounds just buy per-job overhead at this SF — the
      // quantizer is equally valid at any cut (ClusterSpec pins the
      // convergence-sensitive claims on separable data)
      graft.ops.Cluster.semanticDedup(t(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4, k = 16, maxCluster = 4096,
          maxIter = 4)
        .select(col("vec_id"), col("label"))
    }),
    // CCNet-style perplexity quality scoring (LREC 2020): char-trigram LM
    // trained on a 30% reference slice of the corpus (one pass + one
    // count shuffle, exact integer counts = bit-identical model at any
    // parallelism), then every document scored. LangModelSpec proves the
    // model equals a naive string-keyed reference and that gibberish
    // scores strictly above in-domain text
    "pipe35_charlm_perplexity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.ops.LangModel.trainCharLm(
        docs.where(col("doc_id") % 10 < 3), "text", n = 3)
      graft.ops.LangModel.scorePerplexity(docs, "doc_id", "text", model)
    }),
    // RFC 9309 robots.txt gate over the page corpus: per-host policies
    // (deterministic fixture table), longest-match/allow-wins semantics,
    // parse-once-per-host-per-partition memo (RobotsSpec carries the
    // RFC example suite)
    "pipe36_robots_filter" -> ((s, _) => {
      import s.implicits._
      val pages = fixturePages(s).select(col("url"))
      val robots = (0 until 20).map { h =>
        val txt =
          if (h == 0) "User-agent: *\nDisallow: /"
          else if (h % 2 == 0)
            "User-agent: *\nDisallow: /pdf/\nAllow: /pdf/item-1*\nCrawl-delay: 2"
          else "User-agent: *\nDisallow: /*.gif$"
        (s"host$h.example.com", txt)
      }.toDF("host", "robots_txt")
      graft.ops.CrawlPolicy.robotsFilter(pages, "url", "url",
        robots, "host", "robots_txt", agent = "graftbot")
    }),
    // RFC 3986 URL canonicalization (frontier identity): fixture URLs
    // deliberately re-spelled (case, default port, dot segments,
    // %-escapes, fragments) must normalize back to one key per page —
    // asserted here by distinct-count equality, which the rows-only
    // check freezes (UrlNormSpec carries the RFC example suite +
    // idempotence fuzz)
    // small-file compaction (Iceberg rewrite_data_files analog): six
    // fragmenting appends, then partitions over the file-count threshold
    // rewrite to ceil(bytes/target) files — output is the per-partition
    // before/after census; content identity is PipelineSpec-pinned
    "pipe41_compaction" -> ((s, _) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe41").toString
      val out = s"$tmp/docs"
      // one ts_day's partitions: the rewrite is a Spark job per
      // partition (inherent to the per-partition temp+swap), so the
      // sweep entry covers the mechanism on 8 partitions, not 56
      val parted0 = graft.pipeline.Checkpoint.withPartitionCols(fixturePages(s))
      val day = parted0.agg(min(col("ts_day"))).head().getDate(0)
      val parted = parted0.where(col("ts_day") === lit(day))
      (0 until 6).foreach { i =>
        parted.sample(withReplacement = false, 0.5, seed = i)
          .write.mode("append").partitionBy("ts_day", "url_bucket").parquet(out)
      }
      val fsRoot = new org.apache.hadoop.fs.Path(out)
      val fs = fsRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
      def census(): Map[String, Int] =
        fs.globStatus(new org.apache.hadoop.fs.Path(out, "ts_day=*/url_bucket=*"))
          .map(p => p.getPath.toString.stripPrefix(out) ->
            fs.listStatus(p.getPath).count(_.getPath.getName.endsWith(".parquet")))
          .toMap
      val before = census()
      val rewritten = graft.pipeline.Checkpoint.compactPartitions(s, out,
        maxFilesPerPartition = 2)
      val after = census()
      require(rewritten > 0, "compaction found nothing to rewrite")
      before.toSeq.map { case (p, nb) => (p, nb, after.getOrElse(p, -1)) }
        .toDF("partition", "files_before", "files_after")
        .where(col("files_after") < col("files_before"))
    }),
    // the URL-DISCOVERY funnel end-to-end: per-host sitemaps (incl.
    // gzipped) expand to frontier rows, locs canonicalize (RFC 3986),
    // and the robots gate cuts disallowed paths — sitemap → UrlNorm →
    // robots in one composed call chain (each stage spec-tested alone)
    "pipe40_discovery_funnel" -> ((s, _) => {
      import s.implicits._
      def urlset(h: Int): Array[Byte] = {
        val urls = (0 until 10).map { i =>
          val path = if (i % 3 == 0) s"/private/p$i" else s"/Page/./$i/../item-$i"
          s"<url><loc>HTTPS://Host$h.Example.com:443$path</loc><priority>0.$i</priority></url>"
        }.mkString
        val xml = s"<urlset>$urls</urlset>".getBytes("UTF-8")
        if (h % 2 == 0) xml
        else { // half the hosts serve sitemap.xml.gz
          val bos = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(bos)
          g.write(xml); g.close(); bos.toByteArray
        }
      }
      val sitemaps = (0 until 20).map(h => (s"host$h.example.com", urlset(h)))
        .toDF("host", "payload")
      val entries = graft.ops.CrawlPolicy.sitemapEntries(sitemaps, "host", "payload")
      val canon = entries.select(col("host"), col("loc"), col("priority"))
        .as[(String, String, Double)]
        .map { case (h, l, p) => (h, graft.kernel.UrlNorm.normalize(l), p) }
        .toDF("host", "url", "priority")
      val robots = (0 until 20).map(h =>
        (s"host$h.example.com", "User-agent: *\nDisallow: /private/"))
        .toDF("rhost", "robots_txt")
      graft.ops.CrawlPolicy.robotsFilter(canon, "url", "url",
        robots, "rhost", "robots_txt", agent = "graftbot")
    }),
    // feed-based discovery (kernel/Feed via CrawlPolicy.feedEntries):
    // per-host RSS 2.0 (half gzip'd) and Atom 1.0 feeds expand to
    // frontier rows with published timestamps — the FRESH-url channel
    // next to pipe40's sitemaps — then canonicalize and dedup against
    // the sitemap frontier shape; FeedSpec pins grammar + date parsing
    "pipe67_feed_discovery" -> ((s, _) => {
      import s.implicits._
      val feeds = (0 until 12).map { h =>
        val host = s"host$h.example.com"
        val payload =
          if (h % 2 == 0)
            graft.fixtures.MediaGen.rssFeed(s"Feed $h", s"https://$host/",
              (0 until 6).map(i => (s"Post $h-$i",
                s"HTTPS://$host:443/Posts/./$i/../item-$i", s"guid-$h-$i",
                f"Mon, ${(i % 28) + 1}%02d Oct 2024 0$h:0$i:00 GMT", s"sum $i")),
              gzip = h % 4 == 0)
          else
            graft.fixtures.MediaGen.atomFeed(s"Feed $h", s"https://$host",
              (0 until 6).map(i => (s"Entry $h-$i", s"https://$host/e/$i",
                s"tag:$host,2024:$i", f"2024-10-${(i % 28) + 1}%02dT0$h:00:00Z",
                s"sum $i")))
        (host, payload)
      }.toDF("host", "payload")
      val entries = graft.ops.CrawlPolicy.feedEntries(feeds, "host", "payload")
      entries.select(col("host"), col("feed_kind"), col("loc"), col("published_ms"))
        .as[(String, String, String, Long)]
        .map { case (h, k, l, p) => (h, k, graft.kernel.UrlNorm.normalize(l), p) }
        .toDF("host", "feed_kind", "url", "published_ms")
        .distinct()
        .orderBy(asc("host"), asc("url"))
    }),
    // Iceberg-style snapshots: two versioned runs (t2 republishes with
    // changed content under the same partitions), then readAsOf at each
    // timestamp — output is the per-url content diff between snapshots
    // (PipelineSpec proves byte identity per snapshot + expiry semantics)
    // MIME sniffing census (kernel/Sniff): route-by-magic over a mixed
    // payload column — every fixture family must land on its exact MIME
    // (required in-query); Content-Type headers lie, the bytes don't
    "pipe77_mime_census" -> ((s, _) => {
      import s.implicits._
      val media = graft.fixtures.MediaGen.media(200).map(m => (m.doc_url, m.payload))
      val pages = graft.fixtures.PageGen.pages(100).map(p => (p.url, p.html))
      val pdfs = (0 until 10).map(i => (s"https://x.example/d$i.pdf",
        graft.kernel.PdfWriter.build(Seq(Seq(s"doc $i")), compress = true)))
      val warc = Seq(("file://crawl-0.warc.gz",
        graft.fixtures.MediaGen.warcGz(pages.take(5).map(p =>
          (p._1, new java.sql.Timestamp(0L), p._2)))))
      val rows = (media ++ pages ++ pdfs ++ warc).toDF("url", "payload")
        .as[(String, Array[Byte])]
        .map { case (url, p) => (url, graft.kernel.Sniff.mime(p)) }
        .toDF("url", "mime").cache()
      require(rows.where(col("url").endsWith(".pdf") &&
        col("mime") =!= "application/pdf").count() == 0, "pdf sniff drift")
      require(rows.where(col("url").contains(".warc.gz") &&
        col("mime") =!= "application/gzip").count() == 0, "warc.gz sniff drift")
      // the fixture's deliberate stub containers (AUD1/IMG1/VID1 — the
      // codec-library boundary) are the ONLY payloads allowed to fall
      // through to octet-stream, and all of them must
      val stubCount = media.count { case (_, p) =>
        p.length >= 4 && (new String(p.take(4), "ISO-8859-1") match {
          case "AUD1" | "IMG1" | "VID1" => true
          case _ => false
        })
      }
      require(rows.where(col("mime") === "application/octet-stream")
        .count() == stubCount,
        "octet-stream fallthrough must be exactly the stub containers")
      rows.groupBy(col("mime")).agg(count(lit(1)).as("n")).orderBy(asc("mime"))
    }),
    // snapshot CHANGELOG (Checkpoint.diffSnapshots — the CDC view over
    // the versioned table): crawl v2 drops some urls, adds new ones and
    // republishes others with changed content; the diff must name each
    // exactly (required in-query), unchanged urls silent
    "pipe76_snapshot_diff" -> ((s, _) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe76").toString
      val base = graft.fixtures.PageGen.pages(120)
      val v1 = base.take(100) // urls 0..99
      // v2: drop the first 10, keep 10..99 (30..99 unchanged), change
      // 10..29's content, add 100..119
      val changed = v1.slice(10, 30).zip(base.slice(100, 120)).map {
        case (keep, donor) => keep.copy(html = donor.html, text = donor.text)
      }
      val v2 = changed ++ v1.drop(30) ++ base.drop(100)
      val t1 = new java.sql.Timestamp(graft.fixtures.PageGen.EpochMs)
      val t2 = new java.sql.Timestamp(graft.fixtures.PageGen.EpochMs + 3600000L)
      Checkpoint.writePages(s.createDataset(v1).toDF(), s"$tmp/p1")
      Checkpoint.writePages(s.createDataset(v2).toDF(), s"$tmp/p2")
      Checkpoint.runVersioned(s, s"$tmp/p1", s"$tmp/docs", s"$tmp/mani",
        s"$tmp/met", "v1", t1)
      Checkpoint.runVersioned(s, s"$tmp/p2", s"$tmp/docs", s"$tmp/mani",
        s"$tmp/met", "v2", t2, force = true)
      val diff = Checkpoint.diffSnapshots(s, s"$tmp/docs", s"$tmp/mani", t1, t2)
        .cache()
      // differential: driver-side set algebra over the ACTUAL snapshot
      // states (snapshots replace PARTITIONS, not the table — a dropped
      // url whose partition v2 never rewrote legitimately survives into
      // the t2 state, exactly as in Iceberg dynamic overwrite)
      def state(t: java.sql.Timestamp) =
        Checkpoint.readAsOf(s, s"$tmp/docs", s"$tmp/mani", t)
          .select(col("url"), xxhash64(col("extracted_text")).as("h"))
          .as[(String, Long)].collect().toMap
      val (m1, m2) = (state(t1), state(t2))
      val want = (m2.keySet.diff(m1.keySet).map(_ -> "added") ++
        m1.keySet.diff(m2.keySet).map(_ -> "removed") ++
        m1.keySet.intersect(m2.keySet).filter(u => m1(u) != m2(u))
          .map(_ -> "changed")).toMap
      val got = diff.as[(String, String)].collect().toMap
      require(got == want,
        s"changelog drift: got ${got.size} rows vs expected ${want.size}")
      require(got.values.count(_ == "changed") == 20 &&
        got.values.count(_ == "added") == 20,
        "fixture must exercise adds and changes")
      require(got.values.exists(_ == "removed"), "fixture must exercise removal")
      diff.orderBy(asc("change"), asc("url"))
    }),
    "pipe39_time_travel" -> ((s, _) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe39").toString
      val v1 = graft.fixtures.PageGen.pages(100)
      val v2 = v1.zip(v1.reverse).map { case (a, b) =>
        a.copy(html = b.html, text = b.text, lang = b.lang)
      }
      val t1 = new java.sql.Timestamp(graft.fixtures.PageGen.EpochMs)
      val t2 = new java.sql.Timestamp(graft.fixtures.PageGen.EpochMs + 3600000L)
      Checkpoint.writePages(s.createDataset(v1).toDF(), s"$tmp/p1")
      Checkpoint.writePages(s.createDataset(v2).toDF(), s"$tmp/p2")
      Checkpoint.runVersioned(s, s"$tmp/p1", s"$tmp/docs", s"$tmp/mani", s"$tmp/met", "v1", t1)
      Checkpoint.runVersioned(s, s"$tmp/p2", s"$tmp/docs", s"$tmp/mani", s"$tmp/met", "v2", t2,
        force = true)
      val a = Checkpoint.readAsOf(s, s"$tmp/docs", s"$tmp/mani", t1)
        .select(col("url"), length(col("extracted_text")).as("len_t1"))
      val b = Checkpoint.readAsOf(s, s"$tmp/docs", s"$tmp/mani", t2)
        .select(col("url"), length(col("extracted_text")).as("len_t2"))
      a.join(b, Seq("url"))
        .withColumn("changed", (col("len_t1") =!= col("len_t2")).cast("int"))
    }),
    // Lee-et-al (ACL 2022) duplicated-SUBSTRING removal: every 8-token
    // window repeated corpus-wide keeps its canonical (least (doc,
    // offset)) occurrence; other occurrences merge into maximal spans
    // and are cut from the text itself. Output: per-doc before/after
    // lengths (SpanDedupSpec proves equality with a naive reference at
    // two partitionings; q60 is the decision-metric twin)
    "pipe38_span_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 2000)
      graft.ops.SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", k = 8)
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("clean_chars"), col("n_chars"))
    }),
    // Structured extraction, the complement of boilerplate stripping:
    // tables → records via the kernel's grid-fill (colspan/rowspan
    // resolved, nested tables separate). Cells joined with '' so
    // the rows-only checker sees scalar columns (pipe12 lesson). The
    // fixture returns expected counts, so the entry self-verifies
    // totals before returning — StructuredSpec covers cell-level truth.
    "pipe42_html_tables" -> ((s, _) => {
      import s.implicits._
      val fixture = graft.fixtures.StructuredGen.pages(400)
      val docs = s.createDataset(fixture.map(p => (p.doc_id, p.html)))
        .toDF("doc_id", "html")
      val out = graft.ops.Structured.tables(docs, "doc_id", "html")
        .select(col("doc_id"), col("table_idx"), col("caption"),
          concat_ws("", col("headers")).as("header_line"),
          col("row_idx"), concat_ws("", col("cells")).as("cell_line"))
      val got = out.groupBy(col("doc_id")).agg(
        (max(col("table_idx")) + 1).as("nt"), count(lit(1)).as("nr"))
        .as[(Long, Int, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      fixture.foreach { p =>
        val (nt, nr) = got(p.doc_id)
        require(nt == p.n_tables && nr == p.n_rows.toLong,
          s"doc ${p.doc_id}: got ($nt tables, $nr rows), " +
            s"expected (${p.n_tables}, ${p.n_rows})")
      }
      out
    }),
    // Head metadata → curation fields: OG/meta map, canonical, title,
    // JSON-LD payload count. Map column flattened to scalars for the
    // checker; MapType plumbing itself is asserted in StructuredSpec.
    "pipe43_head_metadata" -> ((s, _) => {
      import s.implicits._
      val fixture = graft.fixtures.StructuredGen.pages(400)
      val docs = s.createDataset(fixture.map(p => (p.doc_id, p.html)))
        .toDF("doc_id", "html")
      val out = graft.ops.Structured.headMetadata(docs, "doc_id", "html")
        .select(col("doc_id"), col("title"), col("canonical"),
          size(col("meta")).as("n_meta"),
          col("meta").getItem("og:title").as("og_title"),
          size(col("json_ld")).as("n_json_ld"))
      val got = out.select(col("doc_id"), col("og_title"), col("n_meta"),
        col("n_json_ld"), col("canonical"))
        .as[(Long, String, Int, Int, String)].collect()
        .map(r => r._1 -> r).toMap
      fixture.foreach { p =>
        val (_, og, nm, nld, canon) = got(p.doc_id)
        require(og == p.og_title && nm == p.n_meta && nld == p.n_json_ld &&
          canon == p.url,
          s"doc ${p.doc_id}: metadata mismatch ($og, $nm, $nld, $canon)")
      }
      out
    }),
    // HTML → Markdown serialization: structure-preserving training
    // text. Self-verifies against the fixture's known shape: the h1
    // leads as an ATX heading, each of the n_tables tables emits
    // exactly one `| --- …` separator line, total pipe-table lines =
    // 2·n_tables + n_rows (header+separator+bodies), and head-only
    // content (meta description) never leaks into the body markdown.
    "pipe44_markdown" -> ((s, _) => {
      import s.implicits._
      val fixture = graft.fixtures.StructuredGen.pages(400)
      val docs = s.createDataset(fixture.map(p => (p.doc_id, p.html)))
        .toDF("doc_id", "html")
      val out = graft.ops.Structured.markdown(docs, "doc_id", "html")
      val got = out.select(col("doc_id"), col("markdown"))
        .as[(Long, String)].collect().toMap
      fixture.foreach { p =>
        val md = got(p.doc_id)
        require(md.startsWith(s"# ${p.og_title}"),
          s"doc ${p.doc_id}: markdown must open with the h1 heading")
        val lines = md.linesIterator.toVector
        val seps = lines.count(_.startsWith("| --- |"))
        val pipes = lines.count(_.startsWith("| "))
        require(seps == p.n_tables && pipes == 2 * p.n_tables + p.n_rows,
          s"doc ${p.doc_id}: got ($seps seps, $pipes pipe lines), " +
            s"expected (${p.n_tables}, ${2 * p.n_tables + p.n_rows})")
        require(!md.contains("Fixture page"),
          s"doc ${p.doc_id}: head metadata leaked into body markdown")
      }
      out
    }),
    // per-host template-LINE removal in its production '\n' shape:
    // same-host header/nav/footer lines (df = all docs) vanish, unique
    // body lines and sub-minDocs rare lines survive verbatim, order
    // preserved. Fixture is deterministic with known expected output,
    // so the entry self-verifies byte-exactly per document.
    "pipe45_template_lines" -> ((s, _) => {
      import s.implicits._
      val docs = (0 until 5).flatMap { h =>
        (0 until 40).map { i =>
          val id = (h * 40 + i).toLong
          val body = (0 until 3).map(k => s"body paragraph $h-$i-$k with unique words")
          val rare = if (i == 7) Vector(s"rare once-only line of host $h") else Vector.empty
          val lines = Vector(s"HOST $h NAVIGATION MENU home about contact") ++
            body ++ rare ++ Vector("", s"Copyright host $h - all rights reserved")
          (id, s"host$h.example.com", lines.mkString("\n"),
            (body ++ rare).mkString("\n") + "\n") // expected: body+rare, blank kept
        }
      }
      val df = s.createDataset(docs).toDF("doc_id", "host", "text", "expected")
      val out = graft.ops.Template.removeTemplateLines(
        df.select(col("doc_id"), col("host"), col("text")),
        "doc_id", "host", "text", separator = "\n",
        minDocFrac = 0.5, minDocs = 2)
      val got = out.select(col("doc_id"), col("clean_text"), col("n_removed"))
        .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
      docs.foreach { case (id, _, _, expected) =>
        val (_, clean, removed) = got(id)
        require(clean == expected,
          s"doc $id: template removal mismatch:\n[$clean]\nvs\n[$expected]")
        require(removed == 2L, s"doc $id: expected 2 removed lines, got $removed")
      }
      out
    }),
    // mojibake repair over a deterministically corrupted slice of the
    // documents table: every doc whose id % 3 == 0 is run through a
    // WHATWG windows-1252 mis-decode of its UTF-8 bytes (the browser-
    // shaped corruption), then fix_mojibake must restore the original
    // byte-exactly and leave the clean docs untouched. Self-verifying.
    "pipe46_mojibake" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val high = "\u20ac\u0081\u201a\u0192\u201e\u2026\u2020\u2021" +
        "\u02c6\u2030\u0160\u2039\u0152\u008d\u017d\u008f" +
        "\u0090\u2018\u2019\u201c\u201d\u2022\u2013\u2014" +
        "\u02dc\u2122\u0161\u203a\u0153\u009d\u017e\u0178"
      val mojify = udf { (t: String) =>
        val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val sb = new java.lang.StringBuilder(b.length)
        b.foreach { x =>
          val u = x & 0xff
          sb.append(if (u >= 0x80 && u <= 0x9f) high.charAt(u - 0x80) else u.toChar)
        }
        sb.toString
      }
      val docs = t(s, dir, "documents")
        // seed accents deterministically so a third of docs carry
        // multibyte UTF-8 worth corrupting (fixture text is ASCII-heavy)
        .withColumn("orig", concat(col("text"), lit(" — café №"),
          (col("doc_id") % 7).cast("string")))
        .withColumn("wire",
          when(col("doc_id") % 3 === 0, mojify(col("orig"))).otherwise(col("orig")))
      val out = docs.select(col("doc_id"), col("wire"),
          expr("fix_mojibake(wire)").as("fixed"),
          col("orig"))
        .withColumn("was_broken", col("wire") =!= col("orig"))
        .withColumn("restored", col("fixed") === col("orig"))
      val bad = out.where(!col("restored")).count()
      require(bad == 0, s"$bad documents not restored byte-exactly")
      val broken = out.where(col("was_broken")).count()
      require(broken > 0, "fixture produced no corrupted docs")
      out.select(col("doc_id"), col("was_broken"), col("restored"))
    }),
    // deflate compression-ratio repetition signal over documents plus a
    // planted spam slice (every doc_id % 5 == 0 gets its text replaced
    // by one phrase repeated): the planted docs must land in a strictly
    // lower ratio band than every untouched doc's prose. Self-verifying.
    "pipe47_compression_ratio" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
        .withColumn("wire", when(col("doc_id") % 5 === 0,
          concat_ws(" ", array_repeat(lit("free crypto signup bonus now"), 120)))
          .otherwise(concat_ws(" ", array_repeat(col("text"), 3))))
        .withColumn("planted", col("doc_id") % 5 === 0)
      val out = docs.select(col("doc_id"), col("planted"),
        expr("compression_ratio(wire)").as("ratio"))
      val bands = out.groupBy(col("planted"))
        .agg(min(col("ratio")).as("lo"), max(col("ratio")).as("hi"))
        .as[(Boolean, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      require(bands(true)._2 < bands(false)._1,
        s"spam band ${bands(true)} overlaps prose band ${bands(false)}")
      out
    }),
    // hashed linear classifier (fastText shape): plant a deterministic
    // spam vocabulary into half the documents, train logistic weights by
    // distributed full-batch GD on the EVEN doc_ids, score the held-out
    // ODD ids; holdout accuracy must be >= 0.97 (observed 0.984-1.0;
    // the slack absorbs float-reduction-order decision flips). Output =
    // per-doc score.
    "pipe48_hashed_classifier" -> ((s, dir) => {
      import s.implicits._
      val spamWords = "free crypto bonus winner click casino jackpot"
      val docs = t(s, dir, "documents")
        .withColumn("label", (col("doc_id") % 2 === 0).cast("int"))
        .withColumn("wire", when(col("label") === 1,
          concat(col("text"), lit(" "), lit(spamWords))).otherwise(col("text")))
      val train = docs.where(col("doc_id") % 4 < 2)
      val hold = docs.where(col("doc_id") % 4 >= 2)
      val model = graft.ops.Classifier.trainLogistic(
        train, "wire", "label", dim = 1 << 16, iters = 60)
      val out = graft.ops.Classifier.scored(hold, model, "wire")
        .select(col("doc_id"), col("label"), col("score"))
      val acc = out.select(avg(when((col("score") > 0.5) === (col("label") === 1),
        1.0).otherwise(0.0))).as[Double].head()
      require(acc >= 0.97, s"holdout accuracy $acc")
      out
    }),
    // DSIR importance resampling (Xie et al. NeurIPS 2023): plant a
    // target vocabulary into every 3rd document, hold out every 9th as
    // the TARGET corpus, model both corpora as hashed-bigram
    // multinomials (one treeAggregate pass each), weight every raw doc
    // by the broadcast log-ratio, Gumbel-top-k the best quarter. The
    // selected set must be >= 75% target-flavored (the unflavored
    // baseline rate is 33%).
    "pipe49_dsir_resample" -> ((s, dir) => {
      import s.implicits._
      val tv = "quantum tensor gradient lattice spinor eigenvalue"
      val docs = t(s, dir, "documents")
        .withColumn("flavored", col("doc_id") % 3 === 0)
        .withColumn("wire", when(col("flavored"),
          concat(col("text"), lit(" "), lit(tv))).otherwise(col("text")))
        .cache()
      val target = docs.where(col("doc_id") % 9 === 0).select(col("wire").as("text"))
      // alpha·dim must stay well under the (small) target corpus's token
      // mass or the log-ratio degenerates — see featureLogProbs scaladoc
      val dim = 1 << 16
      val logT = graft.ops.Dsir.featureLogProbs(target, "text", dim, alpha = 0.01)
      val logR = graft.ops.Dsir.featureLogProbs(docs, "wire", dim, alpha = 0.01)
      val w = graft.ops.Dsir.importanceWeights(docs, "doc_id", "wire", logT, logR)
      val k = (docs.count() / 4).toInt.max(1)
      // rank on the length-invariant per-token ratio: doc lengths vary
      // here, so the raw sum confounds length with target-likeness; low
      // temperature keeps selection sharp against unit-scale Gumbel noise
      val picked = graft.ops.Dsir.resampleTopK(w, "doc_id", k,
        temperature = 0.01, weightCol = "avg_weight")
        .join(docs.select(col("doc_id"), col("flavored")), Seq("doc_id"))
      val out = picked.select(col("doc_id"), col("weight"), col("flavored")).cache()
      val frac = out.select(avg(col("flavored").cast("double"))).as[Double].head()
      docs.unpersist()
      require(frac >= 0.75, s"DSIR enrichment too weak: $frac flavored among top quarter")
      out
    }),
    // incremental cross-corpus dedup: signature the corpus ONCE at rest
    // (writeMinhashIndex), then dedup a synthetic "next crawl" batch
    // against it — near-dup mutations (one token dropped) must drop,
    // token-reversed docs (3-shingle sets disjoint from the original)
    // must survive. The decisive counts are require-checked in-query.
    "pipe50_index_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val idx = java.nio.file.Files.createTempDirectory("graft-pipe50").toString
      graft.ops.Dedup.writeMinhashIndex(docs, "doc_id", "text", idx)
      val muts = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          array_join(slice(split(col("text"), " "), 2, 100000), " ").as("text"))
      val fresh = docs.where(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 200000L).as("doc_id"),
          array_join(reverse(split(col("text"), " ")), " ").as("text"))
      val batch = muts.unionByName(fresh)
      val out = graft.ops.Dedup.dedupAgainstIndex(batch, "doc_id", "text", idx,
          threshold = 0.5)
        .select(col("doc_id"), length(col("text")).as("n_chars")).cache()
      val survivedMuts = out.where(col("doc_id") < 200000L).count()
      val survivedFresh = out.where(col("doc_id") >= 200000L).count()
      require(survivedMuts == 0, s"$survivedMuts near-dup mutations evaded the index")
      require(survivedFresh == fresh.count(),
        s"fresh docs wrongly dropped: $survivedFresh of ${fresh.count()}")
      out
    }),
    "pipe37_url_normalize" -> ((s, _) => {
      import s.implicits._
      val urls = fixturePages(s).select(col("url")).as[String]
      val messy = urls.flatMap { u =>
        val rest = u.stripPrefix("https://")
        Iterator(u,
          s"HTTPS://${rest.toUpperCase.takeWhile(_ != '/')}${rest.dropWhile(_ != '/')}#frag",
          s"https://${rest.takeWhile(_ != '/')}:443/./${rest.dropWhile(_ != '/').stripPrefix("/")}")
      }
      val normed = messy.map(graft.kernel.UrlNorm.normalize(_)).toDF("url_norm")
      val n = normed.distinct().count()
      val base = urls.distinct().count()
      // 3 spellings per url must collapse to exactly the base key set
      require(n == base, s"canonicalization left $n keys for $base urls")
      normed.groupBy(col("url_norm")).agg(count(lit(1)).as("spellings"))
    }),
    "pipe11_media_features" -> ((s, _) => {
      import s.implicits._
      val media = s.createDataset(graft.fixtures.MediaGen.media(300))
      graft.ops.Multimodal.featureStats(
        graft.ops.Multimodal.extractFeatures(media).toDF())
    }),
    "pipe58_video_decode" -> ((s, _) => {
      import s.implicits._
      // full VP8 video decode (keyframe + P-frame tail): every frame of
      // every fixture WebM decodes to real pixels; gate checks frame
      // counts, keyframe placement, and ZERO-MV copy semantics
      val vids = (0 until 6).map { i =>
        val w = 48 + (i % 3) * 16; val h = 32 + (i % 2) * 16
        val r = new scala.util.Random(900 + i)
        val tw = (w + 7) / 8
        val tiles = Array.fill(tw * ((h + 7) / 8))(40 + r.nextInt(160))
        val lum = Array.tabulate(w * h) { p =>
          val x = p % w; val y = p / w
          math.min(255, math.max(0, tiles((y / 8) * tw + x / 8) + r.nextInt(9) - 4))
        }
        val moves = Seq(
          graft.fixtures.MediaGen.Vp8Move(16, 0),
          graft.fixtures.MediaGen.Vp8Move(0, 0),
          graft.fixtures.MediaGen.Vp8Move(-8, 8),
          graft.fixtures.MediaGen.Vp8Move(4, 12))
        val frames = graft.fixtures.MediaGen.vp8Sequence(lum, w, h, moves)
        graft.ops.Multimodal.Media(i.toLong, s"vid$i", "video",
          graft.fixtures.MediaGen.webm(frames, w, h, fps = 10))
      }
      val rows = graft.ops.Multimodal.videoFrames(s.createDataset(vids)).cache()
      require(rows.where(!col("ok")).count() == 0, "video decode failures")
      require(rows.count() == 6L * 5, s"expected 30 frame rows, got ${rows.count()}")
      val kf = rows.where(col("key_frame")).select(col("frame_idx")).distinct().collect()
      require(kf.length == 1 && kf(0).getInt(0) == 0, "keyframes must be exactly frame 0")
      // frame 2 is ZERO-MV: identical pixels → identical mean
      val zeroCopyBad = rows.as("a").where(col("a.frame_idx") === 2)
        .join(rows.as("b").where(col("b.frame_idx") === 1),
          col("a.media_id") === col("b.media_id"))
        .where(col("a.mean_luma") =!= col("b.mean_luma")).count()
      require(zeroCopyBad == 0, s"$zeroCopyBad ZERO-MV frames diverged from their reference")
      rows.orderBy(col("media_id"), col("frame_idx"))
    }),
    "pipe57_warc_cdx" -> ((s, _) => {
      import s.implicits._
      // CDX random-access index over WET archives: one row per record
      // with (surt, file, offset, length); a ranged read of exactly that
      // span must return the byte-identical record — the lookup path
      // that makes a 100 TB archive pile randomly addressable
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe57").toString
      val pagesDf = fixturePages(s)
      val docs = Extraction.extractAll(pagesDf)
        .join(pagesDf.select(col("url"), col("warc_ts")), Seq("url"))
        .select(col("url"), col("warc_ts"), col("extracted_text")).repartition(3)
      val nDocs = docs.count()
      graft.sources.Warc.writeConversions(docs, tmp)
      val cdx = graft.sources.Warc.buildCdx(s, s"$tmp/*.warc.gz").cache()
      require(cdx.count() == nDocs, s"cdx rows ${cdx.count()} != $nDocs docs")
      // spot-check ranged reads on a deterministic sample
      val sample = cdx.orderBy(col("surt")).limit(7).collect()
      val wantText = docs.select(col("url"), col("extracted_text"))
        .as[(String, String)].collect().toMap
      sample.foreach { r =>
        val rec = graft.sources.Warc.readRecordAt(s, r.getAs[String]("file"),
          r.getAs[Long]("offset"), r.getAs[Long]("length"))
        require(new String(rec.body, "UTF-8") == wantText(rec.url),
          s"ranged read of ${rec.url} diverged from the written text")
      }
      cdx.select(col("surt"), col("url"), col("warc_type"),
        col("length"), col("digest")).orderBy(col("surt"))
    }),
    "pipe56_zone_map" -> ((s, dir) => {
      import s.implicits._
      // file-level min/max data skipping (the Iceberg manifest-stats
      // mechanism on plain parquet): clustered write + footer-harvested
      // sidecar; a range probe must touch only intersecting files and
      // return exactly the filter's rows
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe56").toString
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
      graft.pipeline.ZoneMap.write(docs, s"$tmp/tbl", "doc_id", files = 16)
      val ids = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (lo0, hi0) = (ids.getLong(0), ids.getLong(1))
      val lo = lo0 + (hi0 - lo0) / 4
      val hi = lo0 + (hi0 - lo0) / 2
      val probe = graft.pipeline.ZoneMap.readRange(s, s"$tmp/tbl", "doc_id", lo, hi)
      val total = s.read.parquet(s"$tmp/tbl").inputFiles.length
      require(probe.inputFiles.length < total,
        s"zone map skipped nothing: ${probe.inputFiles.length}/$total files")
      val want = docs.where(col("doc_id") >= lo && col("doc_id") <= hi).count()
      val gotN = probe.count()
      require(gotN == want, s"pruned read returned $gotN rows, filter says $want")
      probe.groupBy(col("source")).agg(count(lit(1)).as("docs"),
        sum(length(col("text"))).as("chars"))
    }),
    "pipe59_pdf_filters" -> ((s, _) => {
      import s.implicits._
      // the non-Flate stream-filter family old crawl PDFs use (LZW, RLE,
      // ASCIIHex, ASCII85, chained) through the full split → extract →
      // merge branch: text must be identical to the plain twin
      val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val chains = Seq(
        Seq("LZWDecode"), Seq("RunLengthDecode"), Seq("ASCIIHexDecode"),
        Seq("ASCII85Decode"), Seq("ASCII85Decode", "FlateDecode"),
        Seq("ASCIIHexDecode", "LZWDecode"))
      val docs = chains.zipWithIndex.map { case (fs, i) =>
        val nPages = 3 + (i * 7) % 13
        val pages = (1 to nPages).map(p => Seq(s"filter doc $i page $p", s"via ${fs.mkString("+")}"))
        (s"https://filt.example/doc$i.pdf", pages, fs)
      }
      val filtered = docs.map { case (url, pages, fs) =>
        graft.pipeline.Page(url, ts,
          graft.kernel.PdfWriter.buildWithFilters(pages, fs), "", "en")
      }
      val plain = docs.map { case (url, pages, _) =>
        graft.pipeline.Page(url, ts,
          graft.kernel.PdfWriter.build(pages, compress = true), "", "en")
      }
      def branch(rows: Seq[graft.pipeline.Page]) =
        Extraction.mergePdfDocs(Extraction.extractChunks(
            Extraction.pdfChunks(s.createDataset(rows))))
          .select(col("url"), col("extracted_text"), col("total_chunks"), col("ok"))
      val f = branch(filtered).cache()
      val diff = f.as("a").join(branch(plain).as("b"), Seq("url"))
        .where(col("a.extracted_text") =!= col("b.extracted_text") ||
          !col("a.ok") || !col("b.ok")).count()
      require(diff == 0, s"$diff filtered docs extracted differently from plain twins")
      f.select(col("url"), length(col("extracted_text")).as("text_len"),
        col("total_chunks"), col("ok"))
    }),
    "pipe53_cid_font_pdf" -> ((s, _) => {
      import s.implicits._
      // Type0/CID-font PDFs (embedded-subset fonts): Tj bytes are 2-byte
      // codes that only the /ToUnicode CMap can turn into text — the
      // dominant shape for PDFs produced by modern typesetters. The full
      // split → extract → merge branch must recover the exact text, with
      // chunking (which re-serializes sub-PDFs) preserving the font map.
      val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val docs = (0 until 10).map { i =>
        val nPages = 1 + (i * 5) % 17
        val pages = (1 to nPages).map(p =>
          Seq(s"cid doc $i page $p", s"umlaut öäü €$p"))
        (s"https://cid.example/doc$i.pdf", pages)
      }
      val rows = docs.map { case (url, pages) =>
        graft.pipeline.Page(url, ts,
          graft.kernel.PdfWriter.buildType0(pages, compress = true), "", "en")
      }
      val out = Extraction.mergePdfDocs(Extraction.extractChunks(
          Extraction.pdfChunks(s.createDataset(rows))))
        .select(col("url"), col("extracted_text"), col("total_chunks"), col("ok"))
        .cache()
      val expected = docs.map { case (url, pages) =>
        (url, pages.map(_.mkString("", "\n", "\n")).mkString)
      }.toDF("url", "want")
      val bad = out.join(expected, Seq("url"))
        .where(col("extracted_text") =!= col("want") || !col("ok")).count()
      require(bad == 0, s"$bad CID-font docs extracted wrong text")
      out.select(col("url"), length(col("extracted_text")).as("text_len"),
        col("total_chunks"), col("ok"))
    }),
    // PDF OUTLINES: the /Outlines bookmark tree flattened to
    // (depth, title) rows (Pdf.outlines) — the document's own table of
    // contents, a structure signal for curation; UTF-16BE titles decode,
    // cycles terminate; in-query requires pin the exact TOC per doc
    "pipe78_pdf_outlines" -> ((s, _) => {
      import s.implicits._
      val docs = (0 until 12).map { i =>
        val toc = (0 until 2 + i % 3).flatMap(c =>
          Seq((0, s"Chapter $c of doc $i")) ++
            (0 until i % 4).map(x => (1, s"Section $c.$x — détail $i")))
        (s"doc$i", toc,
          graft.kernel.PdfWriter.buildWithOutlines(
            Seq(Seq(s"body $i")), toc, compress = true))
      }
      val rows = docs.map(d => (d._1, d._3)).toDF("doc_id", "pdf")
        .as[(String, Array[Byte])]
        .flatMap { case (id, pdf) =>
          scala.util.Try(graft.kernel.Pdf.outlines(graft.kernel.Pdf.parseDoc(pdf)))
            .getOrElse(Vector.empty)
            .zipWithIndex.map { case ((d, t), ord) => (id, ord, d, t) }
        }.toDF("doc_id", "ord", "depth", "title").cache()
      val want = docs.flatMap { case (id, toc, _) =>
        toc.zipWithIndex.map { case ((d, t), ord) => (id, ord, d, t) }
      }.toSet
      val got = rows.as[(String, Int, Int, String)].collect().toSet
      require(got == want, s"TOC drift: got ${got.size} rows, want ${want.size}")
      rows.orderBy(asc("doc_id"), asc("ord"))
    }),
    // PDF OUTLINKS: /Annots URI link actions per page (Pdf.pageLinks) —
    // PDFs cite the web exactly like HTML pages, so the crawl edge list
    // reads both; links canonicalize through UrlNorm like pipe27's
    "pipe75_pdf_links" -> ((s, _) => {
      import s.implicits._
      val docs = (0 until 20).map { i =>
        val links = (0 until 1 + i % 4).map(k =>
          s"HTTPS://Host${(i + k) % 7}.Example.com:443/cited/./$k/../doc-$k")
        (s"https://src.example/d$i.pdf",
          graft.kernel.PdfWriter.buildWithLinks(
            Seq(Seq(s"citing doc $i")), Seq(links), compress = true))
      }
      docs.toDF("src", "pdf").as[(String, Array[Byte])]
        .flatMap { case (src, pdf) =>
          scala.util.Try(graft.kernel.Pdf.pageLinks(graft.kernel.Pdf.parseDoc(pdf)))
            .getOrElse(Vector.empty)
            .map { case (pg, uri) => (src, pg, graft.kernel.UrlNorm.normalize(uri)) }
        }
        .toDF("src", "page_idx", "dst")
        .groupBy(col("dst")).agg(count(lit(1)).as("n_citing"))
        .orderBy(asc("dst"))
    }),
    // scanned-document PDFs: embedded image XObjects extracted per page
    // (Multimodal.pdfImages) — CCITT G4 fax scans decoded from scratch
    // (kernel/Ccitt, tables JDK-differential-validated), DCT photos
    // through the JPEG kernel, raw gray bitmaps inline; in-query
    // requires pin the G4 black-pixel count against the fixture truth
    "pipe74_pdf_images" -> ((s, _) => {
      import s.implicits._
      val docs = (0 until 10).map { i =>
        val gw = 64 + 8 * i; val gh = 24 + 2 * i
        val g4 = Array.tabulate(gw * gh) { p =>
          val (x, y) = (p % gw, p / gw)
          if ((x / (2 + i % 3) + y / 3) % 2 == 0) 1.toByte else 0.toByte
        }
        val jw = 16 + 8 * (i % 3); val jh = 16
        val jpeg = graft.fixtures.MediaGen.jpeg(
          Array.tabulate(jw * jh)(p => 30 + (p * 7) % 200), jw, jh)
        val pdf = graft.kernel.PdfWriter.buildWithImages(
          pages = Seq(Seq(s"scanned doc $i")),
          images = Seq(Seq(
            graft.kernel.PdfWriter.ImageSpec("Scan", gw, gh, "g4", g4),
            graft.kernel.PdfWriter.ImageSpec("Photo", jw, jh, "jpeg", jpeg))),
          compress = true)
        (s"doc$i", pdf, g4.count(_ == 1).toLong)
      }
      val df = graft.ops.Multimodal.pdfImages(
        docs.map(d => (d._1, d._2)).toDF("doc_id", "pdf"), "doc_id", "pdf").cache()
      val wantBlack = docs.map(d => d._1 -> d._3).toMap
      val gotBlack = df.where(col("name") === "Scan")
        .select(col("doc_id"), col("n_black")).as[(String, Long)].collect().toMap
      require(gotBlack == wantBlack, "G4 black-pixel census drift")
      require(df.where(col("name") === "Photo" && col("n_pixels") > 0)
        .count() == docs.length, "JPEG images must decode")
      df.select(col("doc_id"), col("page_idx"), col("name"), col("width"),
        col("height"), col("codec"), col("mean_luma"))
        .orderBy(asc("doc_id"), asc("name"))
    }),
    "pipe52_encrypted_pdf" -> ((s, _) => {
      import s.implicits._
      // encrypted crawl PDFs (standard security handler, empty user
      // password — the universal "permissions-only" shape): the full
      // split → extract → merge branch must produce byte-identical text
      // to the same documents unencrypted. Mix RC4-128, AESV2 and
      // AES-256/R6, with multi-chunk page counts so decryption composes
      // with chunking.
      val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val specs = (0 until 12).map { i =>
        val nPages = 1 + (i * 7) % 23
        val pages = (1 to nPages).map(p => Seq(s"doc $i page $p", s"body line $p"))
        (s"https://enc.example/doc$i.pdf", pages, i % 3)
      }
      val encPages = specs.map { case (url, pages, cipher) =>
        graft.pipeline.Page(url, ts,
          graft.kernel.PdfWriter.buildEncrypted(pages, compress = true,
            aes = cipher == 1, r6 = cipher == 2),
          "", "en")
      }
      val plainPages = specs.map { case (url, pages, _) =>
        graft.pipeline.Page(url, ts,
          graft.kernel.PdfWriter.build(pages, compress = true), "", "en")
      }
      def runBranch(rows: Seq[graft.pipeline.Page]) =
        Extraction.mergePdfDocs(Extraction.extractChunks(
            Extraction.pdfChunks(s.createDataset(rows))))
          .select(col("url"), col("extracted_text"), col("total_chunks"), col("ok"))
      val enc = runBranch(encPages).cache()
      val plain = runBranch(plainPages)
      val diff = enc.as("e").join(plain.as("p"), Seq("url"))
        .where(col("e.extracted_text") =!= col("p.extracted_text") ||
          !col("e.ok") || !col("p.ok")).count()
      require(diff == 0, s"$diff encrypted docs extracted differently from plaintext twins")
      enc.select(col("url"), length(col("extracted_text")).as("text_len"),
        col("total_chunks"), col("ok"))
    }),
    "pipe51_image_dedup" -> ((s, _) => {
      import s.implicits._
      // 40 distinct photos, each re-posted as PNG + BMP + JPEG + a noisy
      // PNG — the crawl's re-encode shape. Perceptual dedup must put the
      // 4 spellings of each photo in one cluster and keep photos apart.
      val w = 48; val h = 36
      val media = (0 until 40).flatMap { g =>
        // per-photo seeded 8x8 tiles: textured content so dHash separates
        // photos (smooth gradients would all hash to zero and merge)
        val rnd = new scala.util.Random(4242 + g)
        val tw = (w + 7) / 8
        val tiles = Array.fill(tw * ((h + 7) / 8))(30 + rnd.nextInt(170))
        val lum = Array.tabulate(w * h) { i =>
          val x = i % w; val y = i / w
          math.min(215, math.max(0, tiles((y / 8) * tw + x / 8) + rnd.nextInt(7) - 3))
        }
        val noisy = lum.map(v => math.min(255, math.max(0, v + rnd.nextInt(5) - 2)))
        val gray3 = lum.flatMap(v => Array(v.toByte, v.toByte, v.toByte))
        Seq(
          graft.ops.Multimodal.Media(g * 10L, s"img$g", "image",
            graft.fixtures.MediaGen.png(lum.map(_.toByte), w, h, 1)),
          graft.ops.Multimodal.Media(g * 10L + 1, s"img$g", "image",
            graft.fixtures.MediaGen.bmp(gray3, w, h)),
          graft.ops.Multimodal.Media(g * 10L + 2, s"img$g", "image",
            graft.fixtures.MediaGen.jpeg(lum, w, h)),
          graft.ops.Multimodal.Media(g * 10L + 3, s"img$g", "image",
            graft.fixtures.MediaGen.png(noisy.map(_.toByte), w, h, 1)),
          // the same photo shot sideways: stored rotated 90° CCW with
          // EXIF orientation 6 — normalization must land it in the
          // SAME cluster as the upright spellings
          graft.ops.Multimodal.Media(g * 10L + 4, s"img$g", "image", {
            // stored(x, y) = upright(x * w + (sh - 1 - y)): the inverse of
            // orientation 6's display transform (ExifSpec pins this)
            val sw = h; val sh = w
            val st = new Array[Int](sw * sh)
            var yy = 0
            while (yy < sh) {
              var xx = 0
              while (xx < sw) {
                st(yy * sw + xx) = lum(xx * w + (sh - 1 - yy))
                xx += 1
              }
              yy += 1
            }
            graft.fixtures.MediaGen.jpeg(st, sw, sh, exifOrientation = 6)
          }))
      }
      val clusters = graft.ops.Multimodal.imageDedup(
        s.createDataset(media), maxHamming = 8).cache()
      val n = clusters.count()
      require(n == media.size, s"clustered $n of ${media.size} images")
      val groups = clusters
        .groupBy((col("media_id") / 10).cast("long").as("photo"))
        .agg(countDistinct(col("cluster")).as("k"))
      val split = groups.where(col("k") =!= 1).count()
      require(split == 0, s"$split photos split across clusters")
      val distinctClusters = clusters.select(col("cluster")).distinct().count()
      require(distinctClusters == 40,
        s"$distinctClusters clusters for 40 distinct photos (merge or split)")
      clusters.orderBy(col("media_id"))
    }),
    "pipe12_rolling_fingerprints" -> ((s, _) => {
      import s.implicits._
      // exploded to one (url, fp_idx, fp) row per fingerprint: the driver's
      // rows-only checker sorts columns with pandas, which cannot order an
      // array<long> column (round-1 crash, VERDICT.md "What's wrong" #2) —
      // scalar rows keep the same information and stay sortable
      fixturePages(s).select(col("url"), col("text")).as[(String, String)]
        .flatMap { case (url, text) =>
          graft.kernel.TextStats.rollingFingerprints(
            graft.kernel.TextStats.tokens(text), window = 5, k = 8)
            .iterator.zipWithIndex.map { case (fp, i) => (url, i, fp) }
        }.toDF("url", "fp_idx", "fp")
    }),
    // -------------------------- the extraction pipeline (rows-only)
    "pipe01_extract_all" -> ((s, _) => {
      Extraction.extractAll(fixturePages(s))
        .select(col("url"), col("source_type"), col("extracted_text"),
          col("document_type"), col("language"), col("chunks_processed"),
          col("total_chunks"), col("content_blocks"), col("boiler_blocks"), col("ok"))
    }),
    "pipe02_html_branch" -> ((s, _) => {
      import s.implicits._
      val pages = fixturePages(s).as[graft.pipeline.Page]
      Extraction.htmlDocs(pages.where(!Extraction.isPdf(col("html")))).toDF()
        .select(col("url"), col("title"), col("extracted_text"), col("language"),
          col("content_blocks"), col("boiler_blocks"), col("ok"))
    }),
    "pipe03_pdf_chunks" -> ((s, _) => {
      import s.implicits._
      val pages = fixturePages(s).as[graft.pipeline.Page]
      Extraction.pdfChunks(pages.where(Extraction.isPdf(col("html"))))
        .withColumn("content_hash", sha2(col("payload"), 256))
        .select(col("url"), col("chunk_idx"), col("total_chunks"), col("content_hash"))
    }),
    "pipe04_pdf_merge" -> ((s, _) => {
      import s.implicits._
      val pages = fixturePages(s).as[graft.pipeline.Page]
      Extraction.mergePdfDocs(Extraction.extractChunks(
          Extraction.pdfChunks(pages.where(Extraction.isPdf(col("html"))))))
        .select(col("url"), col("extracted_text"), col("chunks_processed"),
          col("total_chunks"), col("ok"))
    }),
    "pipe05_resume_antijoin" -> ((s, _) => {
      import s.implicits._
      val pages = Checkpoint.withPartitionCols(fixturePages(s))
      // seed manifest = the even buckets; the anti-join must return the odd ones
      val manifest = pages.select(col("ts_day"), col("url_bucket")).distinct()
        .where(pmod(col("url_bucket"), lit(2)) === 0)
      Checkpoint.resume(fixturePages(s), manifest)
        .select(col("url"), col("ts_day"), col("url_bucket"))
    }),
    // the production metrics path: timed fused extraction → per-partition
    // rollup with wall_ms/docs_per_sec (B6 north-rule wording). Timing
    // columns are nondeterministic — dropped for the driver's hash-stable
    // rows-only dump, but asserted > 0 in PipelineSpec.
    "pipe06_metrics" -> ((s, _) => {
      val pages = Checkpoint.withPartitionCols(fixturePages(s))
      Checkpoint.metricsParted(pages, Checkpoint.extractParted(pages), "verify-run")
        .drop("wall_ms", "docs_per_sec")
    }),
    "pipe07_summary" -> ((s, _) => {
      Extraction.summary(Extraction.extractAll(fixturePages(s)))
    }),
    // the OCRResponse{success, data, error} envelope + MapType metadata
    // (responses.py:4-8, ocr.py:199-207); data serialized to JSON so the
    // driver's pandas comparator sees only sortable scalars
    "pipe15_envelope" -> ((s, _) => {
      Extraction.envelope(Extraction.extractAll(fixturePages(s)))
        .select(col("url"), col("success"),
          to_json(col("data")).as("data_json"), col("error"))
    }),
    // J2 as a native SQL scalar: the extract_main_text Catalyst
    // expression (codegen'd, registered via GraftExtensions)
    "pipe14_sql_extract" -> ((s, _) => {
      graft.functions.GraftFunctions.register(s) // idempotent belt-and-braces
      fixturePages(s).where(!Extraction.isPdf(col("html")))
        .selectExpr("url", "extract_main_text(html) AS extracted_text",
          "length(extract_main_text(html)) AS text_len")
    }),
    // §2-I: Structured-Streaming ingestion twin — file-source stream over
    // the partitioned page layout, fused extraction, exactly-once commit
    // (AvailableNow drain; fresh checkpoint/output dirs per invocation)
    "pipe16_streaming" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe16").toString
      val pagesDir = s"$tmp/pages"
      Checkpoint.writePages(fixturePages(s), pagesDir)
      graft.streaming.StreamingRun.runAvailableNow(
        s, pagesDir, s"$tmp/docs", s"$tmp/metrics", s"$tmp/ckpt", "verify-stream")
      s.read.parquet(s"$tmp/docs")
        .select(col("url"), col("source_type"),
          length(col("extracted_text")).as("text_len"), col("ok"))
    }),
    // §2-I + B5: streaming exact dedup with keyed custom state
    // (flatMapGroupsWithState) — the memoization cache as a continuous
    // operator; fresh dirs per invocation, deterministic survivors
    // §2-I: streaming NEAR-dup dedup — two AvailableNow drains; the
    // second wave's near-dups of wave-1 documents are dropped via the
    // at-rest signature index the first drain grew (no state-store key
    // can express a MinHash bucket join; foreachBatch + index is the
    // idiomatic shape). Counts are gate-checked in-query.
    "pipe55_streaming_neardup" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe55").toString
      val pagesDir = s"$tmp/pages"
      val ts = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
      def doc(url: String, words: Seq[String]) =
        graft.pipeline.Page(url, ts, Array[Byte](1), words.mkString(" "), "en")
      def vocab(tag: String) = (0 until 24).map(w => s"w${tag}_$w")
      import s.implicits._
      val wave1 = (0 until 30).map(i => doc(s"https://sn.example/d$i", vocab(s"d$i"))) ++
        (0 until 6).map(i => doc(s"https://sn.example/d$i-copy", vocab(s"d$i").dropRight(1)))
      Checkpoint.writePages(s.createDataset(wave1).toDF(), pagesDir)
      val n1 = graft.streaming.StreamingRun.nearDupStreamAvailableNow(
        s, pagesDir, s"$tmp/kept", s"$tmp/ckpt", s"$tmp/idx",
        threshold = 0.7, maxFilesPerBatch = 32)
      require(n1 == 30, s"wave 1 kept $n1 of 30 expected")
      val wave2 = (0 until 8).map(i => doc(s"https://sn.example/d$i-late", vocab(s"d$i").drop(1))) ++
        (0 until 5).map(i => doc(s"https://sn.example/e$i", vocab(s"e$i")))
      Checkpoint.withPartitionCols(s.createDataset(wave2).toDF())
        .repartition(2)
        .write.mode("append").partitionBy("ts_day", "url_bucket").parquet(pagesDir)
      val n2 = graft.streaming.StreamingRun.nearDupStreamAvailableNow(
        s, pagesDir, s"$tmp/kept", s"$tmp/ckpt", s"$tmp/idx",
        threshold = 0.7, maxFilesPerBatch = 32)
      require(n2 == 5, s"wave 2 kept $n2: index must drop all 8 cross-drain near-dups")
      s.read.parquet(s"$tmp/kept").select(col("url"), col("doc_key"), col("batch_id"))
    }),
    "pipe18_streaming_dedup" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe18").toString
      val pagesDir = s"$tmp/pages"
      Checkpoint.writePages(fixturePages(s), pagesDir)
      graft.streaming.StreamingRun.dedupStreamAvailableNow(
        s, pagesDir, s"$tmp/novel", s"$tmp/ckpt", maxFilesPerBatch = 32)
      s.read.parquet(s"$tmp/novel")
    }),
    // §2-I: event-time sessionization over the file stream —
    // session_window + watermark, append-mode finalization; a fencepost
    // event flushes the bounded backfill (StreamingSpec proves equality
    // with the batch operator)
    "pipe22_streaming_sessions" -> ((s, _) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe22").toString
      val base = java.sql.Timestamp.valueOf("2024-01-05 00:00:00").getTime
      val wave = for {
        u <- 0L until 10L
        burst <- 0 until 3
        k <- 0 until 4
      } yield (u * 1000 + burst * 10 + k,
        new java.sql.Timestamp(base + u * 9000 + burst * 180000L + k * 7000L),
        u, (k + 1).toDouble)
      s.createDataset(wave.toIndexedSeq).toDF("event_id", "ts", "user_id", "value")
        .repartition(2).write.parquet(s"$tmp/events")
      graft.streaming.StreamingRun.sessionizeAvailableNow(
        s, s"$tmp/events", s"$tmp/sessions", s"$tmp/ckpt",
        gapSeconds = 30, watermarkDelaySeconds = 10)
      s.createDataset(Seq((99999L, new java.sql.Timestamp(base + 100000000L), 999L, 0.0)))
        .toDF("event_id", "ts", "user_id", "value")
        .write.mode("append").parquet(s"$tmp/events")
      graft.streaming.StreamingRun.sessionizeAvailableNow(
        s, s"$tmp/events", s"$tmp/sessions", s"$tmp/ckpt",
        gapSeconds = 30, watermarkDelaySeconds = 10)
      s.read.parquet(s"$tmp/sessions").where(col("user_id") =!= 999L)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("events"), col("value_sum"))
    }),
    // §2-I: stream-stream event-time INTERVAL join — two independent
    // file streams (fetch + render events) correlated on key within a
    // bounded window; both watermarked so the join state is bounded and
    // the query can run forever at crawl scale. StreamingSpec proves
    // batch-join equality and that later drains emit only new matches.
    "pipe62_stream_join" -> ((s, _) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe62").toString
      val base = java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime
      def ev(id: Long, offMs: Long, user: Long) =
        (id, new java.sql.Timestamp(base + offMs), user, 1.0)
      val lefts = for (u <- 0L until 8L; i <- 0 until 5)
        yield ev(u * 100 + i, u * 7000 + i * 60000L, u)
      val rights = for (u <- 0L until 8L; i <- 0 until 5; if (u + i) % 3 != 0)
        yield ev(9000 + u * 100 + i, u * 7000 + i * 60000L + 5000L + (u % 4) * 11000L, u)
      s.createDataset(lefts.toIndexedSeq).toDF("event_id", "ts", "user_id", "value")
        .repartition(2).write.parquet(s"$tmp/left")
      s.createDataset(rights.toIndexedSeq).toDF("event_id", "ts", "user_id", "value")
        .repartition(2).write.parquet(s"$tmp/right")
      graft.streaming.StreamingRun.intervalJoinAvailableNow(s, s"$tmp/left",
        s"$tmp/right", s"$tmp/joined", s"$tmp/ckpt",
        joinWindowSeconds = 40, watermarkDelaySeconds = 10)
      s.read.parquet(s"$tmp/joined")
        .select(col("user_id"), col("l_event"), col("r_event"),
          col("l_ts"), col("r_ts"))
    }),
    // §2-I: stream-STATIC dimension enrichment — events stream joined to
    // a broadcast dim table re-read per micro-batch (slowly-changing
    // dimension semantics, zero state store); exactly-once commit
    "pipe72_stream_enrich" -> ((s, _) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe72").toString
      val base = java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime
      s.createDataset((0L until 200L).map(i =>
        (i, new java.sql.Timestamp(base + i * 1000), i % 8, (i % 13).toDouble)))
        .toDF("event_id", "ts", "user_id", "value")
        .repartition(3).write.parquet(s"$tmp/events")
      s.createDataset((0L until 6L).map(u => (u, s"segment_$u")))
        .toDF("user_id", "segment").write.parquet(s"$tmp/dim")
      graft.streaming.StreamingRun.enrichStreamAvailableNow(s, s"$tmp/events",
        s"$tmp/dim", "user_id", s"$tmp/out", s"$tmp/ckpt")
      s.read.parquet(s"$tmp/out")
        .groupBy(col("segment")).agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("value_sum"))
        .orderBy(asc("segment"))
    }),
    // §2-I: the engine-NATIVE streaming dedup —
    // dropDuplicatesWithinWatermark bounds keyed state by the event-time
    // watermark window instead of the key universe (Spark's built-in
    // rendition of the C6 24 h cache, next to the custom fMGWS twins)
    "pipe73_stream_wm_dedup" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe73").toString
      val pages = graft.fixtures.PageGen.pages(FixtureN)
      graft.pipeline.Checkpoint.writePages(
        s.createDataset(pages)(org.apache.spark.sql.Encoders.product).toDF(),
        s"$tmp/pages")
      graft.streaming.StreamingRun.dedupWithinWatermarkAvailableNow(
        s, s"$tmp/pages", s"$tmp/out", s"$tmp/ckpt", delaySeconds = 3600)
      s.read.parquet(s"$tmp/out")
        .select(col("url"), col("content_hash"))
        .orderBy(asc("url"))
    }),
    // Dolma-style incremental PARAGRAPH dedup against an at-rest Bloom
    // filter (ops/Dedup.paragraphBloomDedup): run 1 seeds the filter
    // with the even-id documents' paragraphs; run 2 presents ALL
    // documents — fully-seen docs drop out entirely, new docs lose any
    // paragraph already seen (cross-run via the filter, within-batch via
    // first-occurrence). Sentences become paragraphs so the unit is
    // sub-document. BloomParagraphSpec pins exact semantics +
    // parallelism-invariance; decisions here are deterministic.
    "pipe63_paragraph_bloom" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe63").toString
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          regexp_replace(col("text"), "((\\S+ ){8})", "$1\n").as("text"))
      graft.ops.Dedup.paragraphBloomDedup(
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text",
        s"$tmp/bloom").collect()
      graft.ops.Dedup.paragraphBloomDedup(docs, "doc_id", "text",
        s"$tmp/bloom")
        .select(col("doc_id"), length(col("clean_text")).as("clean_len"),
          col("n_kept"), col("n_dropped"))
        .orderBy(asc("doc_id"))
    }),
    // §A-source: WARC ingestion — the container Common-Crawl-style
    // corpora actually arrive in. Fixture pages are packed into
    // per-record-gzip-member archives (the crawl convention), read back
    // via binaryFile + flatMap parse, and run through the SAME fused
    // extraction as the parquet path; WarcSpec proves byte-identical
    // truth and per-file corrupt-archive isolation.
    "pipe26_warc_ingest" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe26").toString
      val pages = graft.fixtures.PageGen.pages(FixtureN)
      pages.grouped(100).zipWithIndex.foreach { case (grp, i) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$tmp/crawl-$i.warc.gz"),
          graft.fixtures.MediaGen.warcGz(grp.map(p => (p.url, p.warc_ts, p.html))))
      }
      val df = graft.sources.Warc.read(s, s"$tmp/*.warc.gz")
      Extraction.extractAll(df)
        .select(col("url"), col("source_type"),
          length(col("extracted_text")).as("text_len"), col("ok"))
    }),
    // .warc.zst ingest (the IIPC zstd crawl shape): per-record zstd
    // frames behind a shared dictionary in the head skippable frame —
    // read → extract must produce the same rows as pipe26's gzip twin
    // over the same fixture pages
    "pipe61_warc_zst" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe61").toString
      val pages = graft.fixtures.PageGen.pages(FixtureN)
      val dict = ("WARC/1.1\r\nWARC-Type: response\r\nHTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; charset=UTF-8\r\n").getBytes("ISO-8859-1")
      pages.grouped(100).zipWithIndex.foreach { case (grp, i) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$tmp/crawl-$i.warc.zst"),
          graft.fixtures.MediaGen.warcZst(grp.map(p => (p.url, p.warc_ts, p.html)),
            dict = Some(dict), compressDict = true))
      }
      val df = graft.sources.Warc.read(s, s"$tmp/*.warc.zst")
      Extraction.extractAll(df)
        .select(col("url"), col("source_type"),
          length(col("extracted_text")).as("text_len"), col("ok"))
    }),
    // HTTP wire-form decoding on ingest: response bodies arrive
    // Transfer-Encoding: chunked and/or Content-Encoding:
    // gzip/deflate/zstd in real crawl archives — Warc.read undoes both
    // layers, so the same pages packed with mixed encodings must extract
    // IDENTICALLY to the plain archive (required in-query); WarcSpec
    // pins per-encoding byte equality and raw-fallback on undecodables
    "pipe64_warc_http" -> ((s, _) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe64").toString
      val pages = graft.fixtures.PageGen.pages(FixtureN)
        .map(p => (p.url, p.warc_ts, p.html))
      val encs = Seq("identity", "chunked", "gzip", "deflate",
        "deflate-raw", "zstd", "chunked+gzip")
      val encFor = pages.indices.map(i => encs(i % encs.length))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/enc.warc.gz"),
        graft.fixtures.MediaGen.warcGzHttp(pages, encFor))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/plain.warc.gz"),
        graft.fixtures.MediaGen.warcGz(pages))
      def extracted(f: String) =
        Extraction.extractAll(graft.sources.Warc.read(s, s"$tmp/$f"))
          .select(col("url"), col("source_type"),
            length(col("extracted_text")).as("text_len"),
            xxhash64(col("extracted_text")).as("text_hash"), col("ok"))
      val enc = extracted("enc.warc.gz").cache()
      val diff = enc.unionAll(extracted("plain.warc.gz"))
        .groupBy(col("url"), col("text_hash")).count()
        .where(col("count") =!= 2).count()
      require(diff == 0, s"encoded vs plain extraction drift on $diff urls")
      enc
    }),
    // CSS-selector structured extraction (kernel/CssSelect via
    // Structured.cssSelect): a level-3 selector list with attribute,
    // combinator and pseudo-class terms runs over the fixture corpus —
    // one stateless per-row map, selector compiled once, no shuffle
    // before the census; CssSelectSpec pins the grammar semantics
    "pipe65_css_select" -> ((s, _) => {
      val pages = fixturePages(s).withColumn("doc_id", xxhash64(col("url")))
      graft.ops.Structured.cssSelect(pages, "doc_id", "html",
        "h1, nav a[href^='/s'], aside a + a, footer > a[href$='tos']")
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
        .orderBy(asc("tag"))
    }),
    // the COMPLETE corpus funnel as one call (pipeline/CorpusJob):
    // extract → Gopher quality → near-dedup → WET archives, returning
    // the per-stage survivor counts a pipeline operator watches
    "pipe33_corpus_job" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe33").toString
      graft.pipeline.CorpusJob.run(s, fixturePages(s), s"$tmp/wet",
        maxBucket = 64)
    }),
    // the FULL curation funnel: pipe33's pipeline extended with the
    // blocklist gate, eval-set decontamination, PII redaction and the
    // per-domain cap — one call, per-stage survivor counts gate-checked
    "pipe60_full_funnel" -> ((s, _) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe60").toString
      val pages = fixturePages(s)
      // eval set: two fixture ground-truth texts → decontamination must bite
      val evalDf = pages.limit(2).select(col("url").as("id"), col("text"))
      val bl = Seq.empty[String].toDF("blocked")
      val funnel = graft.pipeline.CorpusJob.runFull(s, pages, s"$tmp/wet",
        evalDf, bl, domainCap = 50, maxBucket = 64).cache()
      val m = funnel.collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      require(m("unblocked") == m("extracted"), "empty blocklist must block nothing")
      require(m("decontaminated") < m("quality_kept"),
        "planted eval twins must be decontaminated away")
      require(m("wet_records_written") == m("domain_capped"),
        "every capped survivor must reach the WET sink")
      require(m("domain_capped") > 0, "funnel collapsed to zero")
      funnel
    }),
    // WARC revisit records (crawl-time dedup pointers): parse the
    // identical-payload-digest profile, resolve each revisit to its
    // original capture via one digest equi-join against the CDX index,
    // ranged-read the original and require byte identity in-query —
    // a 100 TB archive pile answers "what did this revisit see" with
    // one positioned read per row, never a scan
    "pipe68_warc_revisit" -> ((s, _) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe68").toString
      val pages = graft.fixtures.PageGen.pages(FixtureN)
        .map(p => (p.url, p.warc_ts, p.html))
      val ts2 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
      val revisits = pages.zipWithIndex.collect {
        case ((url, _, _), i) if i % 5 == 0 => (s"$url?recrawl", ts2, url)
      }
      pages.grouped(100).zipWithIndex.foreach { case (grp, i) =>
        val rv = revisits.filter(r => grp.exists(_._1 == r._3))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$tmp/c-$i.warc.gz"),
          graft.fixtures.MediaGen.warcGzWithRevisits(grp, rv))
      }
      val cdx = graft.sources.Warc.buildCdx(s, s"$tmp/*.warc.gz")
      val resolved = graft.sources.Warc.resolveRevisits(
        graft.sources.Warc.readRevisits(s, s"$tmp/*.warc.gz"), cdx).cache()
      require(resolved.count() == revisits.length, "revisit resolution dropped rows")
      // ranged reads are driver-side point lookups (readRecordAt takes
      // the session); the revisit set is bounded here so the loop is too
      val rows = resolved
        .select(col("url"), col("refers_to_url"), col("payload_digest"),
          col("file"), col("offset"), col("length"), col("rec_idx"))
        .as[(String, String, String, String, Long, Long, Int)].collect()
      val verified = rows.map { case (u, ref, dig, f, off, len, ri) =>
        val rec = graft.sources.Warc.readRecordAt(s, f, off, len, ri)
        val gotDig = java.security.MessageDigest.getInstance("SHA-256")
          .digest(rec.body).map(b => f"$b%02x").mkString
        // byte identity is the contract; the resolved URL may differ from
        // refers_to when several captures share the payload (that IS the
        // identical-payload-digest profile)
        (u, ref, gotDig == dig)
      }
      require(verified.forall(_._3), "revisit fetch byte drift")
      verified.toSeq.toDF("url", "refers_to_url", "ok")
        .select(col("url"), col("refers_to_url")).orderBy(asc("url"))
    }),
    // WET sink with a TRAINED shared zstd dictionary: deterministic
    // sample → ZDICT training → archives lead with the dictionary
    // skippable frame, every record frame compressed against it (the
    // full IIPC shape the reader already handles); in-query requires:
    // byte-identical read-back AND the dict archives are smaller than
    // dict-less ones on the same corpus
    "pipe66_wet_zst_dict" -> ((s, _) => {
      import s.implicits._
      val tmpD = java.nio.file.Files.createTempDirectory("graft-p66d").toString
      val tmpP = java.nio.file.Files.createTempDirectory("graft-p66p").toString
      val pages = fixturePages(s)
      val docs = Extraction.extractAll(pages)
        .join(pages.select(col("url"), col("warc_ts")), Seq("url"))
        .select(col("url"), col("warc_ts"), col("extracted_text"))
        .repartition(4).cache()
      val dict = graft.sources.Warc.trainZstdDict(docs, 16 * 1024, 256)
      val n = graft.sources.Warc.writeConversions(
        docs, tmpD, codec = "zstd", dict = Some(dict))
      graft.sources.Warc.writeConversions(docs, tmpP, codec = "zstd")
      def sz(d: String) = new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".warc.zst")).map(_.length).sum
      require(sz(tmpD) - 4L * dict.length < sz(tmpP),
        "shared dictionary failed to shrink the archives")
      val back = graft.sources.Warc.readConversions(s, s"$tmpD/*.warc.zst")
      val drift = back.select(col("url"), xxhash64(col("text")).as("h"))
        .unionAll(docs.select(col("url"), xxhash64(col("extracted_text")).as("h")))
        .groupBy(col("url"), col("h")).count().where(col("count") =!= 2).count()
      require(drift == 0 && back.count() == n, s"dict WET round-trip drift on $drift urls")
      docs.unpersist()
      back.select(col("url"), length(col("text")).as("text_len"))
    }),
    // WET-style sidecar sink: extracted text written back out as WARC
    // conversion-record archives (per-record gzip members) and parsed
    // back — crawl-in/crawl-out symmetry; WarcSpec proves byte identity
    // and strict grammar
    "pipe32_wet_sink" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe32").toString
      val pages = fixturePages(s)
      val docs = Extraction.extractAll(pages)
        .join(pages.select(col("url"), col("warc_ts")), Seq("url"))
        .select(col("url"), col("warc_ts"), col("extracted_text"))
        .repartition(4)
      graft.sources.Warc.writeConversions(docs, tmp)
      graft.sources.Warc.readConversions(s, s"$tmp/*.warc.gz")
        .select(col("url"), length(col("text")).as("text_len"))
    }),
    // host/page authority over the link graph — damped PageRank power
    // iteration (the link-based quality weight; Common Crawl publishes
    // exactly this table for its own corpus), over pipe27's edge list
    "pipe28_pagerank" -> ((s, _) => {
      import s.implicits._
      val pages = fixturePages(s).where(!Extraction.isPdf(col("html")))
        .select(col("url"), col("html")).as[(String, Array[Byte])]
      val edges = pages.flatMap { case (url, html) =>
          graft.kernel.Html.extractLinks(html, url).map(l => (url, l))
        }.toDF("src", "dst").distinct()
      graft.ops.Graph.pageRank(edges, iters = 8)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("node"))
        .limit(50)
    }),
    // anchor-text aggregation: the web's own description of each target
    // page — anchor edges (Structured.anchors) explode to terms, then a
    // per-target census keeps the top-3 terms by (count, term) via one
    // ranked window; the shape is one flatMap + one shuffle on (dst,
    // term) + one on dst — WindowGroupLimit prunes the rank at source
    "pipe71_anchor_text" -> ((s, _) => {
      import s.implicits._
      val pages = fixturePages(s).where(!Extraction.isPdf(col("html")))
      val edges = graft.ops.Structured.anchors(pages, "url", "html")
      val terms = edges
        .select(col("dst"), explode(split(lower(col("anchor")), "[^\\p{L}]+")).as("term"))
        .where(length(col("term")) >= 2)
        .groupBy(col("dst"), col("term")).agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dst")).orderBy(col("n").desc, col("term"))
      terms.withColumn("_rk", row_number().over(w))
        .where(col("_rk") <= 3)
        .select(col("dst"), col("term"), col("n"), col("_rk").as("rk"))
        .orderBy(asc("dst"), asc("rk"))
    }),
    // hubs and authorities (Kleinberg HITS) over the same link graph —
    // the two-score decomposition PageRank's single score conflates
    // (directory pages score as hubs without inflating their own
    // authority); OpsSpec pins 1e-12 equality vs a plain-Scala
    // reference and parallelism invariance
    "pipe70_hits" -> ((s, _) => {
      import s.implicits._
      val pages = fixturePages(s).where(!Extraction.isPdf(col("html")))
        .select(col("url"), col("html")).as[(String, Array[Byte])]
      val edges = pages.flatMap { case (url, html) =>
          graft.kernel.Html.extractLinks(html, url).map(l => (url, l))
        }.toDF("src", "dst").distinct()
      graft.ops.Graph.hits(edges, iters = 4)
        .select(col("node"), round(col("hub"), 6).as("hub"),
          round(col("auth"), 6).as("auth"))
        .orderBy(col("auth").desc, col("hub").desc, col("node"))
        .limit(50)
    }),
    // outlink graph — the crawl's edge list (link-based quality and
    // frontier statistics start here): per HTML page, every <a href>
    // resolved against the page url by the tokenizer-backed kernel,
    // aggregated into per-target reference counts
    "pipe27_link_graph" -> ((s, _) => {
      import s.implicits._
      val pages = fixturePages(s).where(!Extraction.isPdf(col("html")))
        .select(col("url"), col("html")).as[(String, Array[Byte])]
      pages.flatMap { case (url, html) =>
          graft.kernel.Html.extractLinks(html, url).map(l => (url, l))
        }.toDF("src_url", "dst_url")
        .withColumn("dst_path", parse_url(col("dst_url"), lit("PATH")))
        .groupBy(col("dst_path"))
        .agg(count(lit(1)).as("refs"), countDistinct(col("src_url")).as("pages"))
    }),
    // §2-I + C6: TTL'd streaming dedup — the memoization cache WITH the
    // reference's 24 h expiry as a continuous operator. Two phases, each
    // two AvailableNow drains over the same stream with byte-identical
    // payloads re-appended under '#dup' urls between drains:
    //  - suppress (1 h TTL): the second drain emits nothing — every hash
    //    is still inside its TTL window;
    //  - readmit (0 ms TTL): every hash is expired on re-arrival, so the
    //    second drain re-emits one '#dup' url per hash.
    // Deterministic across reruns: fresh dirs per invocation and both
    // TTL extremes are wall-clock-independent at drain timescales.
    "pipe25_streaming_dedup_ttl" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe25").toString
      def phase(name: String, ttlMs: Long): org.apache.spark.sql.DataFrame = {
        val pages = s"$tmp/$name/pages"
        Checkpoint.writePages(fixturePages(s), pages)
        graft.streaming.StreamingRun.dedupStreamTtl(
          s, pages, s"$tmp/$name/novel", s"$tmp/$name/ckpt", ttlMs)
        s.read.parquet(pages)
          .withColumn("url", concat(col("url"), lit("#dup")))
          .write.mode("append").partitionBy("ts_day", "url_bucket").parquet(pages)
        graft.streaming.StreamingRun.dedupStreamTtl(
          s, pages, s"$tmp/$name/novel", s"$tmp/$name/ckpt", ttlMs)
        s.read.parquet(s"$tmp/$name/novel").withColumn("phase", lit(name))
      }
      phase("suppress", 3600L * 1000).unionByName(phase("readmit", 0L))
        .select(col("phase"), col("content_hash"), col("url"))
    }),
    // co-located join via BUCKETED tables (the 100 TB join strategy the
    // round brief names): both sides bucketed+sorted on the join key →
    // SortMergeJoin with ZERO exchanges and zero sorts (OpsSpec asserts
    // the plan); at corpus scale this is the difference between a join
    // that reshuffles 100 TB and one that streams co-located buckets
    "q49_bucketed_join" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe23").toString
      val db = "graft_bk"
      s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      s.sql(s"CREATE DATABASE $db LOCATION '$tmp'")
      t(s, dir, "orders")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable(s"$db.orders_bk")
      t(s, dir, "customer")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable(s"$db.customer_bk")
      val o = s.table(s"$db.orders_bk")
      val c = s.table(s"$db.customer_bk")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("orders_cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("bigint")).as("total_cents"))
    }),
    // office-document branch of the extraction surface: DOCX payloads
    // (ZIP + WordprocessingML, both walked from scratch) → visible text
    "pipe24_docx_extract" -> ((s, _) => {
      import s.implicits._
      val docs = (0 until 40).map { i =>
        val paras = Seq(
          s"Document $i heading",
          s"Body with <markup> & entities #$i",
          s"tab\there and break\nline $i")
        (i.toLong, graft.fixtures.MediaGen.docx(paras))
      }
      s.createDataset(docs).toDF("doc_idx", "payload")
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (idx, p) =>
          (idx, graft.kernel.Docx.extractText(p))
        })
        .toDF("doc_idx", "text")
        .withColumn("n_chars", length(col("text")))
    }),
    // A7/F2: newest-first manifest listing (the reference's mtime-desc
    // file listing, routes.py:44-60)
    "pipe13_manifest_listing" -> ((s, _) => {
      val pages = Checkpoint.withPartitionCols(fixturePages(s))
      Checkpoint.listing(Checkpoint.manifestRows(pages, "verify-run",
        java.sql.Timestamp.valueOf("2024-01-08 00:00:00"), "/out"))
    }),
  )

  /** DuckDB rendition of the columnar lang-id / quality / dedup operators,
    * generated from the same stopword profiles so the two sides can never
    * drift.
    */
  private def opsOracleSql: Map[String, String] = {
    def arr(ws: Iterable[String]) = ws.toSeq.sorted.map(w => s"'$w'").mkString("[", ", ", "]")
    val hits = graft.kernel.Lang.profiles.map { case (l, ws) =>
      l -> (s"len(list_filter(list_filter(regexp_split_to_array(lower(text), '[^\\pL]+'), " +
        s"t -> t <> ''), t -> list_contains(${arr(ws)}, t)))")
    }.toMap
    val toks = "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)"
    // q28: the hyperplane buckets re-derived in SQL from the SAME plane
    // literals the Spark side uses — the dot is the same left-to-right
    // double chain (Spark's aggregate fold starts at 0.0; x+0.0 == x), so
    // the sign test is bit-identical and bucket assignment cannot drift
    val cosineLshSql: String = {
      def planeDot(p: Seq[Double]): String =
        p.zipWithIndex.map { case (w, i) =>
          s"CAST(embedding[${i + 1}] AS DOUBLE)*($w)" }.mkString(" + ")
      def bucketExpr(planes: Seq[Seq[Double]]): String =
        planes.zipWithIndex.map { case (p, b) =>
          s"(CASE WHEN ${planeDot(p)} > 0 THEN ${1L << b} ELSE 0 END)" }.mkString(" + ")
      val tableCtes = (0 until 2).map { t =>
        val planes = graft.ops.Similarity.randomPlanes(4, 64, 42L + t)
        s"b$t AS (SELECT vec_id, ${bucketExpr(planes)} AS bucket FROM embeddings)"
      }.mkString(", ")
      val candUnion = (0 until 2).map { t =>
        s"SELECT a.vec_id AS a_id, b.vec_id AS b_id FROM b$t a JOIN b$t b ON a.bucket = b.bucket AND a.vec_id < b.vec_id"
      }.mkString(" UNION ")
      s"WITH $tableCtes, cand AS ($candUnion), " +
        "ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings), " +
        "norms AS (SELECT vec_id, sqrt(sum(v * v)) AS n FROM ex GROUP BY vec_id), " +
        "dots AS (SELECT c.a_id, c.b_id, sum(ea.v * eb.v) AS dot FROM cand c " +
        "JOIN ex ea ON ea.vec_id = c.a_id JOIN ex eb ON eb.vec_id = c.b_id AND eb.i = ea.i GROUP BY c.a_id, c.b_id) " +
        "SELECT a_id, b_id, round(dot / (na.n * nb.n), 4) AS cos FROM dots " +
        "JOIN norms na ON na.vec_id = a_id JOIN norms nb ON nb.vec_id = b_id " +
        "WHERE round(dot / (na.n * nb.n), 4) >= 0.4"
    }
    val allStops = graft.kernel.Lang.profiles.flatMap(_._2.toSeq).distinct.sorted
    Map(
      "q28_cosine_lsh" -> cosineLshSql,
      "q33_stopword_ratio" ->
        ("WITH tok AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\\pL]+'), t -> t <> '') AS toks FROM documents) " +
          s"SELECT doc_id, round(CAST(len(list_filter(toks, t -> list_contains(${arr(allStops)}, t))) AS DOUBLE) / greatest(len(toks), 1), 4) AS sw_ratio " +
          "FROM tok ORDER BY doc_id LIMIT 200"),
      "q20_jaccard_pairs" ->
        ("WITH docs AS (SELECT * FROM documents WHERE doc_id < 1000), " +
          "tok AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS w, " +
          "len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS nw FROM docs), " +
          "inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_both, max(a.nw) AS na, max(b.nw) AS nb " +
          "FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id) " +
          "SELECT a_id, b_id, round(CAST(n_both AS DOUBLE) / (na + nb - n_both), 4) AS jac " +
          "FROM inter WHERE CAST(n_both AS DOUBLE) / (na + nb - n_both) >= 0.9"),
      "q21_cosine_neardup" ->
        ("WITH ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings), " +
          "dots AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, sum(a.v * b.v) AS dot FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY a.vec_id, b.vec_id), " +
          "norms AS (SELECT vec_id, sqrt(sum(v * v)) AS n FROM ex GROUP BY vec_id) " +
          "SELECT a_id, b_id, round(dot / (na.n * nb.n), 4) AS cos FROM dots " +
          "JOIN norms na ON na.vec_id = a_id JOIN norms nb ON nb.vec_id = b_id " +
          "WHERE round(dot / (na.n * nb.n), 4) >= 0.4"),
      "q22_lang_id" ->
        (s"WITH scored AS (SELECT ${hits("en")} AS en_h, ${hits("fr")} AS fr_h, ${hits("de")} AS de_h, ${hits("es")} AS es_h FROM documents) " +
          "SELECT CASE WHEN en_h = 0 AND fr_h = 0 AND de_h = 0 AND es_h = 0 THEN 'und' " +
          "WHEN en_h >= fr_h AND en_h >= de_h AND en_h >= es_h THEN 'en' " +
          "WHEN fr_h >= de_h AND fr_h >= es_h THEN 'fr' " +
          "WHEN de_h >= es_h THEN 'de' ELSE 'es' END AS lang_id, count(*) AS cnt " +
          "FROM scored GROUP BY 1"),
      "q23_quality_score" ->
        (s"SELECT doc_id, round(least($toks / 100.0, 1.0) * " +
          "(1.0 - CAST(length(regexp_replace(text, '[\\pL\\pN\\s]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE)) * " +
          s"(CASE WHEN CAST(length(text) AS DOUBLE) / greatest($toks, 1.0) BETWEEN 3 AND 12 THEN 1.0 ELSE 0.5 END), 4) AS q " +
          "FROM documents"),
      "q24_fingerprint" ->
        ("SELECT doc_id, sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp " +
          "FROM documents ORDER BY doc_id LIMIT 100"),
    )
  }

  def oracleSql: Map[String, String] = opsOracleSql ++ Map(
    "q01_agg_partial_final" -> "SELECT l_returnflag, l_linestatus, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents, count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "q02_count_distinct" -> "SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS cnt FROM events GROUP BY event_type",
    "q03_topk" -> "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10",
    "q04_window_first" -> "SELECT user_id, event_id, event_type FROM (SELECT user_id, event_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events) t WHERE rn = 1",
    "q05_join_agg" -> "SELECT c.c_mktsegment, count(*) AS orders_cnt, CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY c.c_mktsegment",
    "q06_anti_join" -> "SELECT c.c_nationkey, count(*) AS lonely FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) GROUP BY c.c_nationkey",
    "q56_anti_join_bloom" -> "SELECT c.c_nationkey, count(*) AS lonely FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) GROUP BY c.c_nationkey",
    "q57_bloom_resume_hash" -> ("WITH h AS (SELECT doc_id, lang, sha256(text) AS content_hash FROM documents) " +
      "SELECT lang, count(*) AS survivors FROM h WHERE NOT EXISTS " +
      "(SELECT 1 FROM h s WHERE s.doc_id % 7 = 0 AND s.content_hash = h.content_hash) GROUP BY lang"),
    "q07_semi_join" -> "SELECT p.p_brand, count(*) AS used_parts FROM part p WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey) GROUP BY p.p_brand",
    "q08_ordered_merge" -> "SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq, count(*) AS cnt FROM events GROUP BY user_id",
    "q09_dedup_exact" -> "SELECT lang, count(*) AS n_docs, count(DISTINCT sha256(text)) AS n_unique FROM documents GROUP BY lang",
    "q10_ttl_filter" -> "SELECT event_type, count(*) AS live_cnt FROM events WHERE ts + INTERVAL 24 HOUR > TIMESTAMP '2024-01-30 00:00:00' GROUP BY event_type",
    "q63_exact_dedup_filter" -> ("WITH r AS (SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn FROM documents) " +
      "SELECT lang, count(*) AS survivors, CAST(sum(n_chars) AS BIGINT) AS chars FROM r WHERE rn = 1 GROUP BY lang"),
    "q11_content_hash" -> "SELECT doc_id, sha256(text) AS content_hash FROM documents ORDER BY doc_id LIMIT 50",
    "q12_label_classifier" -> "SELECT CASE WHEN regexp_matches(lower(text), 'window|stream') THEN 'matched' ELSE 'unknown' END AS document_type, count(*) AS cnt FROM documents GROUP BY 1",
    "q13_token_count" -> "SELECT lang, CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens, count(*) AS cnt FROM documents GROUP BY lang",
    // the SAME RE2-compatible pattern string as TextOps.BpePattern ('' = escaped quote)
    "q32_bpe_tokens" -> ("SELECT lang, CAST(sum(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))) AS BIGINT) AS bpe_tokens, count(*) AS cnt FROM documents GROUP BY lang"),
    "q14_quality_stats" -> "SELECT source, CAST(sum(length(text)) AS BIGINT) AS chars, CAST(sum(length(text) - length(replace(text, ' ', ''))) AS BIGINT) AS spaces, max(n_chars) AS max_chars FROM documents GROUP BY source",
    "q15_set_union" -> "SELECT count(*) AS n FROM (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier) t",
    "q16_rollup" -> "SELECT l_returnflag, l_linestatus, count(*) AS cnt, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
    "q17_point_lookup" -> "SELECT event_id, user_id, event_type FROM events WHERE event_id = 42",
    "q25_salted_agg" -> "SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS total FROM events GROUP BY event_type",
    "q26_join3_dims" -> "SELECT r.r_name, count(*) AS customers, CAST(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS acctbal_cents FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name",
    "q27_intersect" -> "SELECT count(*) AS n_common FROM (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) t",
    // real newline chars inside the literals (not backslash-n): DuckDB
    // single-quoted strings keep raw newlines, matching format_string
    "q29_summary_format" -> "SELECT doc_id, printf('Document Analysis Summary\n-------------------------\nFilename: %s\nTotal pages: %d\nChunks processed: %d\nText length: %d characters\n', 'doc_' || doc_id, n_chars % 10, n_chars % 3, length(text)) AS summary FROM documents ORDER BY doc_id LIMIT 100",
    "q30_to_json" -> "SELECT doc_id, CAST(to_json(struct_pack(doc_id := doc_id, lang := lang, n_chars := n_chars)) AS VARCHAR) AS js FROM documents ORDER BY doc_id LIMIT 100",
    "q31_listing_order" -> "SELECT '/out/' || event_type AS path, max(ts) AS committed_ts, CAST(row_number() OVER (ORDER BY max(ts) DESC, '/out/' || event_type) AS INT) AS rank FROM events GROUP BY event_type",
    "q18_embedding_norm" -> "SELECT vec_id, round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm FROM embeddings ORDER BY vec_id LIMIT 100",
    "q34_sessionize" -> ("WITH g AS (SELECT user_id, ts, event_id, epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap FROM events), " +
      "s AS (SELECT user_id, sum(CASE WHEN gap IS NULL OR gap > 30000 THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess FROM g), " +
      "per AS (SELECT user_id, sess, count(*) AS session_events FROM s GROUP BY user_id, sess) " +
      "SELECT user_id, count(*) AS n_sessions, max(session_events) AS max_session_events FROM per GROUP BY user_id"),
    "q35_line_dedup" -> ("WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents), " +
      "idx AS (SELECT doc_id, toks, unnest(range(0, CAST(ceil(len(toks)/3.0) AS BIGINT))) AS i FROM tok), " +
      "lines AS (SELECT doc_id, i, array_to_string(toks[i*3+1 : i*3+3], ' ') AS line FROM idx), " +
      "cnt AS (SELECT line, count(*) AS c FROM lines GROUP BY line) " +
      "SELECT doc_id, count(*) AS kept_lines, sha256(string_agg(line, ' ' ORDER BY i)) AS new_text_hash " +
      "FROM lines JOIN cnt USING (line) WHERE c = 1 GROUP BY doc_id"),
    "q36_redact" -> "SELECT event_id, sha256(regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS redacted_hash FROM events ORDER BY event_id LIMIT 200",
    "q38_asof_join" -> ("WITH r AS (SELECT user_id, ts, max(value) AS state_v FROM events WHERE event_type = 'click' GROUP BY user_id, ts), " +
      "l AS (SELECT event_id, user_id, ts FROM events WHERE event_type <> 'click') " +
      "SELECT l.event_id, l.user_id, r.ts AS state_ts, round(r.state_v, 2) AS state_v " +
      "FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts"),
    "q55_host_stats" -> ("""WITH u AS (SELECT *, 'https://host' || CAST(user_id % 50 AS VARCHAR) || '.example.com/t/' || event_type || '?k=' || CAST(event_id % 7 AS VARCHAR) AS url FROM events)
      SELECT regexp_extract(url, '^https://([^/]+)', 1) AS host,
             regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
             count(*) AS hits, count(DISTINCT user_id) AS users,
             round(sum(value), 2) AS value_sum,
             max(CAST(regexp_extract(url, 'k=([0-9]+)', 1) AS INT)) AS max_k
      FROM u GROUP BY 1, 2"""),
    "q65_template_removal" -> ("""WITH docs AS (SELECT doc_id, source, text FROM documents),
      freq AS (
        SELECT source, w, count(*) AS df FROM (
          SELECT DISTINCT dd.doc_id, dd.source, u.w
          FROM docs dd, UNNEST(string_split(dd.text, ' ')) AS u(w)
        ) WHERE w <> '' GROUP BY source, w
      ),
      hd AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM docs GROUP BY source),
      tmpl AS (
        SELECT f.source, list(f.w) AS ws
        FROM freq f JOIN hd USING (source)
        WHERE f.df >= 2 AND CAST(f.df AS DOUBLE) >= CAST(0.6 AS DOUBLE) * CAST(hd.n_docs AS DOUBLE)
        GROUP BY f.source
      )
      SELECT d.doc_id, d.source,
        coalesce(array_to_string(list_filter(string_split(d.text, ' '), x -> x = '' OR NOT list_contains(coalesce(t.ws, []), x)), ' '), '') AS clean_text,
        CAST(len(string_split(d.text, ' ')) - len(list_filter(string_split(d.text, ' '), x -> x = '' OR NOT list_contains(coalesce(t.ws, []), x))) AS BIGINT) AS n_removed
      FROM docs d LEFT JOIN tmpl t USING (source)"""),
    "q70_chunk_windows" -> ("""WITH n AS (SELECT doc_id, text,
        CASE WHEN len(text) <= 500 THEN 1 ELSE 1 + CAST(ceil((len(text) - 500) / 400.0) AS INT) END AS k
      FROM documents)
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        CAST(len(substr(text, CAST(i AS INT) * 400 + 1, 500)) AS INT) AS chunk_len,
        sha256(substr(text, CAST(i AS INT) * 400 + 1, 500)) AS chunk_hash
      FROM (SELECT doc_id, text, unnest(range(0, k)) AS i FROM n)"""),
    "q71_domain_cap" -> ("""SELECT doc_id, lang FROM (
        SELECT doc_id, lang, row_number() OVER (
          PARTITION BY lang ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents) WHERE rn <= 30"""),
    "q76_regex_census" -> ("SELECT token, count(*) AS n FROM (" +
      "SELECT unnest(regexp_extract_all(text, '[A-Za-z]{4,}')) AS token FROM documents" +
      ") GROUP BY token HAVING count(*) >= 10"),
    "q77_conditional_agg" -> ("SELECT event_type, count(*) AS n, " +
      "count(*) FILTER (WHERE value > 0.5) AS n_hi, " +
      "round(sum(value) FILTER (WHERE user_id % 2 = 0), 2) AS even_sum, " +
      "round(avg(value) FILTER (WHERE value <= 0.5), 4) AS lo_avg " +
      "FROM events GROUP BY event_type"),
    "q78_correlated_subquery" -> ("SELECT c_nationkey, count(*) AS n_above, " +
      "round(sum(c_acctbal), 2) AS sum_above FROM customer c " +
      "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2 " +
      "WHERE c2.c_nationkey = c.c_nationkey) GROUP BY c_nationkey"),
    "q79_sequence_days" -> ("SELECT CAST(u AS DATE) AS d, count(*) AS n FROM (" +
      "SELECT unnest(generate_series(CAST(o_orderdate AS DATE), " +
      "CAST(o_orderdate AS DATE) + INTERVAL 3 DAY, INTERVAL 1 DAY)) AS u " +
      "FROM orders) GROUP BY 1 HAVING count(*) >= 30"),
    "q80_stats_suite" -> ("SELECT l_returnflag, " +
      "round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr, " +
      "round(covar_samp(l_quantity, l_discount), 4) AS qty_disc_covar, " +
      "round(stddev_samp(l_extendedprice), 2) AS price_sd, " +
      "round(var_pop(l_quantity), 4) AS qty_var " +
      "FROM lineitem GROUP BY l_returnflag"),
    "q81_weekday_census" -> ("SELECT CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS INT) AS wd, " +
      "count(*) AS n, round(avg(o_totalprice), 2) AS avg_price " +
      "FROM orders GROUP BY 1"),
    "q82_edit_distance" -> ("SELECT CAST(levenshtein(p_brand, 'Brand#33') AS INT) AS dist, " +
      "count(*) AS n FROM part GROUP BY 1"),
    "q83_bm25_search" -> ("""WITH tok AS (SELECT doc_id,
        unnest(list_filter(string_split_regex(lower(text), '[^\p{L}]+'), x -> x <> '')) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
      q(token) AS (VALUES ('stream'), ('window'), ('hash')),
      dft AS (SELECT token, count(*) AS df FROM tf JOIN q USING (token) GROUP BY 1)
      SELECT doc_id, round(sum(ln(1 + (n - df + 0.5)/(df + 0.5)) *
        tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS score
      FROM tf JOIN q USING (token) JOIN dft USING (token)
        JOIN dl USING (doc_id) CROSS JOIN st
      GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20"""),
    "q88_funnel" -> ("""WITH m AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
               min(CASE WHEN event_type = 'click' THEN ts END) AS tc,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
        FROM events GROUP BY user_id)
      SELECT CASE WHEN tv IS NULL THEN 0
                  WHEN tc IS NULL OR tc <= tv THEN 1
                  WHEN tp IS NULL OR tp <= tc THEN 2
                  ELSE 3 END AS stage,
             count(*) AS users
      FROM m GROUP BY 1 ORDER BY 1"""),
    "q87_trap_census" -> ("""WITH u AS (
        SELECT 'h' || CAST(user_id % 20 AS VARCHAR) || '.example.com' AS host,
               event_type AS seg,
               '/' || event_type || '/' ||
                 CAST(CASE WHEN event_type = 'click' THEN event_id
                           ELSE event_id % 5 END AS VARCHAR) AS path
        FROM events)
      SELECT host, seg, count(DISTINCT path) AS distinct_paths,
             count(*) AS hits, count(DISTINCT path) > 40 AS is_trap
      FROM u GROUP BY host, seg ORDER BY host, seg"""),
    "q86_weighted_sample" -> ("""WITH keyed AS (
        SELECT doc_id, n_chars,
               -ln((('0x' || substr(sha256(doc_id::VARCHAR || '~42'), 1, 12))::BIGINT + 0.5)
                   / power(16, 12)) / n_chars AS skey
        FROM documents WHERE n_chars > 0)
      SELECT doc_id, n_chars FROM keyed ORDER BY skey LIMIT 50"""),
    "q85_shard_shuffle" -> ("""WITH h AS (
        SELECT doc_id,
               ('0x' || substr(sha256(doc_id::VARCHAR || '-42'), 1, 8))::BIGINT AS hv
        FROM documents)
      SELECT doc_id, CAST(hv % 8 AS INT) AS shard,
             CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1
                  AS BIGINT) AS pos
      FROM h ORDER BY shard, pos"""),
    "q84_redirect_chains" -> ("""WITH RECURSIVE
      e AS (SELECT o_orderkey AS src, o_orderkey - 3 AS dst
            FROM orders WHERE o_orderkey % 90 >= 3),
      walk(src, cur, hops) AS (
        SELECT src, dst, 1 FROM e
        UNION ALL
        SELECT w.src, e2.dst, w.hops + 1 FROM walk w JOIN e e2 ON w.cur = e2.src)
      SELECT w.src, w.cur AS final, CAST(w.hops AS BIGINT) AS hops,
             TRUE AS resolved
      FROM walk w
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = w.cur)
      ORDER BY src"""),
    "q73_grouping_sets" -> ("SELECT event_type, user_id % 4 AS bucket, " +
      "GROUPING(event_type, user_id % 4) AS gid, count(*) AS cnt, " +
      "round(sum(value), 2) AS value_sum FROM events " +
      "GROUP BY GROUPING SETS ((event_type, user_id % 4), (event_type), ())"),
    "q74_moving_agg" -> ("SELECT user_id, event_id, " +
      "round(sum(value) OVER w, 2) AS mov_sum, " +
      "round(avg(value) OVER w, 4) AS mov_avg FROM events " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"),
    "q75_string_agg" -> ("SELECT user_id, " +
      "string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types, " +
      "count(DISTINCT event_type) AS n_types FROM events GROUP BY user_id"),
    "q72_strip_invisible" -> ("""WITH w AS (SELECT doc_id,
        (CASE WHEN doc_id % 3 = 0 THEN 'x' || chr(8203) || 'y' || chr(8238) || 'z ' ELSE '' END)
        || text
        || (CASE WHEN doc_id % 4 = 0 THEN ' tail' || chr(173) || 'soft' || chr(65279) ELSE '' END) AS wire
      FROM documents)
      SELECT doc_id,
        sha256(regexp_replace(wire, '[\x{00AD}\x{200B}-\x{200D}\x{2060}\x{202A}-\x{202E}\x{2066}-\x{2069}\x{FEFF}]', '', 'g')) AS clean_hash,
        CAST(len(wire) - len(regexp_replace(wire, '[\x{00AD}\x{200B}-\x{200D}\x{2060}\x{202A}-\x{202E}\x{2066}-\x{2069}\x{FEFF}]', '', 'g')) AS INT) AS removed_chars
      FROM w"""),
    "q69_phrase_scan" -> ("""WITH c AS (SELECT doc_id,
        len(regexp_extract_all(text, 'stream join')) AS h1,
        len(regexp_extract_all(text, 'window merge')) AS h2,
        len(regexp_extract_all(text, 'fast key')) AS h3
      FROM documents)
      SELECT doc_id, CAST(h1 + h2 + h3 AS BIGINT) AS total_hits,
        CAST((CASE WHEN h1 > 0 THEN 1 ELSE 0 END) + (CASE WHEN h2 > 0 THEN 1 ELSE 0 END) + (CASE WHEN h3 > 0 THEN 1 ELSE 0 END) AS INT) AS patterns_hit
      FROM c WHERE h1 + h2 + h3 > 0"""),
    "q68_domain_blocklist" -> ("""WITH bl(blocked) AS (VALUES ('ads.example.com'), ('host7.example.com'), ('blocked.net')),
      ev AS (SELECT event_id,
        CASE WHEN user_id % 3 = 0 THEN 'ads.' ELSE '' END || 'host' || CAST(user_id % 50 AS VARCHAR) || '.example.com' AS host
        FROM events),
      hosts AS (SELECT DISTINCT host FROM ev),
      sfx AS (SELECT host, array_to_string(parts[i:], '.') AS s
              FROM (SELECT host, string_split(host, '.') AS parts, unnest(range(1, len(string_split(host, '.')) + 1)) AS i FROM hosts)),
      blocked_hosts AS (SELECT DISTINCT sfx.host FROM sfx JOIN bl ON sfx.s = bl.blocked)
      SELECT host, count(*) AS kept_events FROM ev
      WHERE host NOT IN (SELECT host FROM blocked_hosts) GROUP BY host"""),
    "q67_pii_detect" -> ("""WITH w AS (SELECT doc_id, text
        || CASE WHEN doc_id % 5 = 0 THEN ' contact user@example.com now' ELSE '' END
        || CASE WHEN doc_id % 7 = 0 THEN ' from 203.0.113.7 gateway' ELSE '' END
        || CASE WHEN doc_id % 11 = 0 THEN ' call 415-555-0123 today' ELSE '' END AS text FROM documents),
      c AS (SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS emails,
        CAST(len(regexp_extract_all(text, '\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b')) AS INT) AS ipv4s,
        CAST(len(regexp_extract_all(text, '\+[0-9]{9,15}\b|\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b')) AS INT) AS phones
      FROM w)
      SELECT doc_id, emails, ipv4s, phones FROM c WHERE emails + ipv4s + phones > 0"""),
    "q66_decontaminate" -> ("""WITH tok AS (SELECT doc_id, regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks FROM documents),
      g AS (SELECT doc_id, array_to_string(toks[i : i + 3], ' ') AS gram FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 2)) AS i FROM tok WHERE len(toks) >= 4)),
      gd AS (SELECT DISTINCT doc_id, gram FROM g),
      ev AS (SELECT doc_id AS eval_id, gram FROM gd WHERE doc_id % 37 = 0),
      tr AS (SELECT doc_id, gram FROM gd WHERE doc_id % 37 <> 0)
      SELECT tr.doc_id, CAST(count(DISTINCT ev.eval_id) AS BIGINT) AS eval_docs_hit, CAST(count(DISTINCT tr.gram) AS BIGINT) AS grams_hit
      FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id"""),
    "q64_fetch_schedule" -> ("""SELECT 'host' || CAST(user_id % 50 AS VARCHAR) || '.example.com' AS host,
             event_id,
             CAST((user_id % 50) % 5 + 1 AS BIGINT) AS delay_s,
             CAST((row_number() OVER (PARTITION BY user_id % 50 ORDER BY event_id) - 1) * ((user_id % 50) % 5 + 1) AS BIGINT) AS fetch_offset_s
      FROM events"""),
    "q54_nfc_normalize" -> ("SELECT doc_id, nfc_normalize(substring(text, 1, 64) || ' cafe' || chr(769) || ' suffix') AS norm_text FROM documents"),
    "q53_gopher_quality" -> ("""WITH m AS (SELECT doc_id,
        len(regexp_split_to_array(trim(text), '\s+')) AS word_cnt,
        round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+')), 4) AS mean_word_len,
        round(CAST((length(text) - length(replace(text, '#', ''))) + (length(text) - length(replace(text, '...', ''))) / 3 AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+')), 4) AS symbol_ratio,
        round(CAST(len(list_filter(string_split(text, chr(10)), l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE chr(8226) || '%')) AS DOUBLE) / len(string_split(text, chr(10))), 4) AS bullet_ratio,
        round(CAST(len(list_filter(string_split(text, chr(10)), l -> l LIKE '%...' OR l LIKE '%' || chr(8230))) AS DOUBLE) / len(string_split(text, chr(10))), 4) AS ellipsis_ratio,
        round(CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+')), 4) AS alpha_ratio,
        round(1.0 - CAST(len(list_distinct(string_split(text, chr(10)))) AS DOUBLE) / len(string_split(text, chr(10))), 4) AS dup_line_frac
      FROM documents)
      SELECT *, (word_cnt >= 50 AND word_cnt <= 100000 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio < 0.1 AND bullet_ratio < 0.9 AND ellipsis_ratio < 0.3
        AND alpha_ratio > 0.8 AND dup_line_frac < 0.3) AS keep FROM m"""),
    "q52_top_tokens" -> ("SELECT token, cnt FROM (" +
      "SELECT token, count(*) AS cnt FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token FROM documents) t " +
      "GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 25)"),
    "q51_asof_salted" -> ("WITH r AS (SELECT user_id, ts, max(value) AS state_v FROM events WHERE event_type = 'click' GROUP BY user_id, ts), " +
      "l AS (SELECT event_id, user_id, ts FROM events WHERE event_type <> 'click') " +
      "SELECT l.event_id, l.user_id, r.ts AS state_ts, round(r.state_v, 2) AS state_v " +
      "FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts"),
    "q39_range_join" -> ("WITH iv(interval_id, lo, hi) AS (VALUES (1, 0.0, 7.0), (2, 5.0, 23.0), (3, 20.0, 31.0), (4, 30.0, 55.0), (5, 2.0, 3.0)) " +
      "SELECT iv.interval_id, count(*) AS cnt, CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
      "FROM lineitem l JOIN iv ON l.l_quantity >= iv.lo AND l.l_quantity < iv.hi GROUP BY iv.interval_id"),
    "q40_percentiles" -> ("SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS q50, " +
      "round(quantile_cont(l_quantity, 0.9), 4) AS q90, round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price " +
      "FROM lineitem GROUP BY l_returnflag"),
    "q41_pivot" -> ("SELECT user_id % 10 AS user_bucket, " +
      "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, " +
      "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view, " +
      "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, " +
      "CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, " +
      "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error " +
      "FROM events GROUP BY 1"),
    "q42_except" -> "SELECT k FROM (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier) t ORDER BY k",
    "q44_time_rollup" -> "SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS cnt, round(sum(value), 2) AS value_sum FROM events GROUP BY 1, 2",
    // identical answer to q05 — the point of q49 is the PLAN (bucketed
    // co-located join, no exchange), asserted in OpsSpec
    "q49_bucketed_join" -> "SELECT c.c_mktsegment, count(*) AS orders_cnt, CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY c.c_mktsegment",
    "q58_repetition" -> ("WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents), " +
      "b AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tok WHERE len(toks) >= 2)), " +
      "pc AS (SELECT doc_id, bigram, count(*) AS c FROM b GROUP BY doc_id, bigram), " +
      "agg AS (SELECT doc_id, sum(c) AS total, max(c) AS max_c, count(*) AS distinct_bigrams FROM pc GROUP BY doc_id) " +
      "SELECT doc_id, round(max_c / total, 4) AS top_bigram_frac, round(1.0 - distinct_bigrams / total, 4) AS dup_bigram_frac FROM agg"),
    "q59_surt_keys" -> ("WITH u AS (SELECT 'sub' || CAST(event_id % 3 AS VARCHAR) || '.host' || CAST(user_id % 50 AS VARCHAR) || '.example.com' AS host FROM events) " +
      "SELECT array_to_string(list_reverse(string_split(host, '.')), '.') AS surt_host, count(*) AS pages FROM u GROUP BY 1"),
    "q61_stratified_sample" -> ("WITH h AS (SELECT *, substr(sha256('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h8 FROM documents) " +
      "SELECT lang, count(*) AS sampled, CAST(sum(n_chars) AS BIGINT) AS chars FROM h " +
      "WHERE CASE WHEN lang = 'en' THEN h8 < 'e6666666' WHEN lang = 'zh' THEN h8 < '80000000' ELSE h8 < '40000000' END " +
      "GROUP BY lang"),
    "q62_sequence_packing" -> ("WITH t AS (SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS toks FROM documents), " +
      "p AS (SELECT doc_id, toks, coalesce(sum(toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev FROM t) " +
      "SELECT CAST(floor(prev / 2048) AS BIGINT) AS bin, count(*) AS docs, CAST(sum(toks) AS BIGINT) AS bin_tokens, " +
      "min(doc_id) AS first_doc, max(doc_id) AS last_doc FROM p GROUP BY 1"),
    "q60_dup_ngram_frac" -> ("WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents), " +
      "g AS (SELECT doc_id, array_to_string(toks[i : i + 7], ' ') AS gram FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i FROM tok WHERE len(toks) >= 8)), " +
      "c AS (SELECT gram, count(*) AS c FROM g GROUP BY gram) " +
      "SELECT doc_id, round(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) / count(*), 4) AS dup_gram_frac " +
      "FROM g JOIN c USING (gram) GROUP BY doc_id"),
    "q47_bigram_counts" -> ("WITH tok AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents), " +
      "b AS (SELECT toks[i] || ' ' || toks[i + 1] AS bigram FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tok)), " +
      "c AS (SELECT bigram, count(*) AS cnt FROM b GROUP BY bigram) " +
      "SELECT bigram, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, bigram) AS INT) AS rank " +
      "FROM c ORDER BY cnt DESC, bigram LIMIT 20"),
    "q48_contamination" -> ("WITH probes(probe) AS (VALUES ('stream join'), ('window merge'), ('quantum blockchain synergy')) " +
      "SELECT probe, CAST(sum(CASE WHEN contains(text, probe) THEN 1 ELSE 0 END) AS BIGINT) AS hits " +
      "FROM documents CROSS JOIN probes GROUP BY probe"),
    "q50_dedup_clusters" -> ("WITH RECURSIVE d AS (SELECT doc_id, left(trim(text), 40) AS p, right(trim(text), 40) AS sfx FROM documents), " +
      "pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id FROM d a JOIN d b ON a.p = b.p AND a.doc_id < b.doc_id " +
      "UNION SELECT a.doc_id, b.doc_id FROM d a JOIN d b ON a.sfx = b.sfx AND a.doc_id < b.doc_id), " +
      "edges AS (SELECT a_id AS s, b_id AS d FROM pairs UNION SELECT b_id, a_id FROM pairs), " +
      "r(id, lab) AS (SELECT s, s FROM edges UNION SELECT e.s, r.lab FROM edges e JOIN r ON r.id = e.d) " +
      "SELECT id, min(lab) AS cluster FROM r GROUP BY id"),
    "q46_hash_split" -> ("SELECT CASE WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train' " +
      "WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val' ELSE 'test' END AS split, " +
      "lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars FROM documents GROUP BY 1, 2"),
    "q45_json_extract" -> ("SELECT event_type, count(*) AS cnt, " +
      "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum, " +
      "CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max " +
      "FROM events GROUP BY event_type"),
    "q43_window_suite" -> ("SELECT l_returnflag, l_orderkey, l_linenumber, rnk, drnk, quartile, next_order, cd FROM (" +
      "SELECT l_returnflag, l_orderkey, l_linenumber, " +
      "rank() OVER w AS rnk, dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile, " +
      "lead(l_orderkey, 1) OVER w AS next_order, round(cume_dist() OVER w, 6) AS cd " +
      "FROM lineitem WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)) t " +
      "WHERE rnk <= 50"),
    "q37_cube" -> "SELECT l_returnflag, l_linestatus, count(*) AS cnt, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)",
    "q19_knn_bruteforce" -> ("SELECT e.vec_id, round(" +
      "(SELECT sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) FROM (SELECT unnest(e.embedding) AS v, generate_subscripts(e.embedding, 1) AS i) a JOIN (SELECT unnest(q.embedding) AS v, generate_subscripts(q.embedding, 1) AS i FROM embeddings q WHERE q.vec_id = 7) b ON a.i = b.i) " +
      "/ (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * (SELECT sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) FROM embeddings q WHERE q.vec_id = 7)), 6) AS sim " +
      "FROM embeddings e ORDER BY sim DESC, vec_id LIMIT 10"),
  )
}
