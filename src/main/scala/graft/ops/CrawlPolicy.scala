package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kernel.Robots

/** Crawl-policy operators around the [[Robots]] kernel: apply a
  * per-host robots.txt table to a URL corpus before extraction — the
  * fetch-side gate of a web-scale pipeline (the reference has no fetch
  * stage; this is engine-side crawl reality like the WARC source).
  *
  * Scale shape: ONE equi-join of the corpus against the robots table
  * on host (robots tables are small relative to the corpus — a few
  * million hosts vs 10^12 URLs — so AQE broadcasts it below the
  * threshold; above, it is an ordinary hash join with the corpus
  * already shuffling on host for politeness grouping anyway), then a
  * per-partition streaming filter. robots.txt bodies are parsed ONCE
  * PER HOST PER PARTITION through a bounded memo (hosts arrive
  * clustered when the corpus is host-partitioned, which is the
  * politeness layout a crawler wants regardless); the memo clears
  * loudly-boundedly rather than growing without limit.
  */
object CrawlPolicy {

  /** Keep the corpus rows whose URL the per-host robots.txt allows for
    * `agent`. Hosts absent from `robots` (or with null text) allow
    * everything — the RFC's missing-file semantics. Returns `urls`'
    * full schema; `idCol` must be unique per row (the survivor
    * semi-join key, same contract as the dedup filters).
    */
  def robotsFilter(urls: DataFrame, idCol: String, urlCol: String,
                   robots: DataFrame, hostCol: String, txtCol: String,
                   agent: String, memoCap: Int = 1 << 16): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    // path-with-query is what RFC 9309 rules match against
    val pathq = concat(
      coalesce(expr(s"parse_url($urlCol, 'PATH')"), lit("/")),
      when(expr(s"parse_url($urlCol, 'QUERY')").isNotNull,
        concat(lit("?"), expr(s"parse_url($urlCol, 'QUERY')"))).otherwise(lit("")))
    val keyed = urls.select(
      col(idCol).as("_id"),
      expr(s"parse_url($urlCol, 'HOST')").as("_host"),
      pathq.as("_path"))
    val rob = robots.select(col(hostCol).as("_host"), col(txtCol).as("_robots"))
    val keep = keyed.join(rob, Seq("_host"), "left")
      .select(col("_id").cast("string"), col("_host"), col("_path"), col("_robots"))
      .as[(String, String, String, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Robots.RobotsFile]()
        it.flatMap { case (id, host, path, txt) =>
          val allowed =
            if (txt == null) true
            else {
              var rf = memo.get(host)
              if (rf == null) {
                if (memo.size >= memoCap) memo.clear() // bounded, never OOM
                rf = Robots.parse(txt)
                memo.put(host, rf)
              }
              Robots.isAllowed(rf, agent, path)
            }
          if (allowed) Iterator.single(id) else Iterator.empty
        }
      }.toDF("_keep_id")
    urls.join(keep, urls(idCol).cast("string") === col("_keep_id"), "left_semi")
  }

  /** Expand a per-host sitemap table `(host, payload)` (raw or
    * gzipped XML — [[graft.kernel.Sitemap]]) into discovered frontier
    * rows `(host, loc, lastmod_ms, changefreq, priority, from_index)`.
    * `from_index = true` rows are CHILD SITEMAP locations still to
    * fetch, not page URLs — the recursion is the caller's fetch loop
    * (this operator is one expansion level, the batch-join shape).
    * Malformed payloads contribute zero rows (a frontier seed is
    * best-effort; diff the input host set against the output's to
    * count drops).
    */
  def sitemapEntries(df: DataFrame, hostCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(hostCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .flatMap { case (host, payload) =>
        if (payload == null) Iterator.empty
        else scala.util.Try(graft.kernel.Sitemap.parse(payload)).toOption
          .iterator.flatMap { f =>
            f.entries.iterator.map(e =>
              (host, e.loc, e.lastmodMs, e.changefreq, e.priority, f.isIndex))
          }
      }.toDF("host", "loc", "lastmod_ms", "changefreq", "priority", "from_index")
  }

  /** One row per feed item across a `(host, payload)` table of
    * RSS/Atom/RDF documents ([[graft.kernel.Feed]]) —
    * `(host, feed_kind, feed_title, loc, item_title, item_id,
    * published_ms, summary)`, the fresh-URL discovery channel next to
    * [[sitemapEntries]]. Malformed payloads contribute zero rows.
    */
  def feedEntries(df: DataFrame, hostCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(hostCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .flatMap { case (host, payload) =>
        if (payload == null) Iterator.empty
        else scala.util.Try(graft.kernel.Feed.parse(payload)).toOption
          .iterator.flatMap { f =>
            f.items.iterator.map(it =>
              (host, f.kind, f.title, it.link, it.title, it.id,
                it.publishedMs, it.summary))
          }
      }.toDF("host", "feed_kind", "feed_title", "loc", "item_title",
        "item_id", "published_ms", "summary")
  }

  /** Per-host crawl-delay table for `agent`: `(host, crawl_delay)` for
    * every host whose robots.txt sets one — the politeness-scheduling
    * input (join against the frontier, convert to per-host token
    * rates).
    */
  def crawlDelays(robots: DataFrame, hostCol: String, txtCol: String,
                  agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (host, txt) =>
        if (txt == null) Iterator.empty
        else Robots.crawlDelay(Robots.parse(txt), agent)
          .map(d => (host, d)).iterator
      }).toDF("host", "crawl_delay")
  }

  /** Per-host `Sitemap:` URLs declared in robots.txt (RFC 9309 §2.3 —
    * file-level, not group-scoped): `(host, sitemap_url)`, one row per
    * declaration. The discovery-funnel seed that precedes fetching the
    * sitemaps themselves ([[sitemapEntries]] expands their payloads).
    */
  def sitemapUrlsFromRobots(robots: DataFrame, hostCol: String,
                            txtCol: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (host, txt) =>
        if (txt == null) Iterator.empty
        else Robots.parse(txt).sitemaps.iterator.map(u => (host, u))
      }).toDF("host", "sitemap_url")
  }

  /** Domain-suffix blocklist gate — the UT1/adult-ads-malware domain
    * filter every web corpus applies before extraction: a host is
    * blocked when ANY of its dot-suffixes ("a.ads.example.com" →
    * {"a.ads.example.com", "ads.example.com", "example.com", "com"})
    * appears in the blocklist, so one `example.com` entry covers every
    * subdomain.
    *
    * Scale shape: the blocked-HOST set is computed first — distinct
    * hosts (tiny vs the row count: a 10^12-row corpus has maybe 10^8
    * hosts) exploded into ≤ label-count suffixes, equi-joined against
    * the BROADCAST blocklist — and the corpus pays one host equi-join
    * (anti) against that small set. The corpus rows themselves are
    * never exploded.
    */
  def blockByDomainSuffix(df: DataFrame, hostCol: String,
                          blocklist: DataFrame): DataFrame = {
    val blockedCol = blocklist.columns.head
    val suffixes = expr(
      s"transform(sequence(1, size(split($hostCol, '\\\\.'))), " +
        s"i -> array_join(slice(split($hostCol, '\\\\.'), i, " +
        s"size(split($hostCol, '\\\\.'))), '.'))")
    val blockedHosts = df.select(col(hostCol)).distinct()
      .select(col(hostCol), explode(suffixes).as("_sfx"))
      .join(broadcast(blocklist.select(col(blockedCol).as("_sfx"))), Seq("_sfx"))
      .select(col(hostCol)).distinct()
    df.join(blockedHosts, Seq(hostCol), "left_anti")
  }

  // ------------------------------------------- redirect-chain resolution

  /** Resolve HTTP redirect chains to their final destination: `edges`
    * holds one `src → dst` row per 3xx response (the `url → Location`
    * pairs of [[graft.sources.Warc.readResponses]]'s redirect rows).
    * Returns `(srcCol, final_url, hops, resolved)` for every src —
    * `final_url` is the first node in src's chain with no outgoing
    * redirect, `hops` the chain length, and `resolved = false` marks
    * chains that loop or exceed `maxHops` (their `final_url` is
    * wherever the walk stood when the budget ran out — report, don't
    * guess).
    *
    * Scale shape: POINTER DOUBLING, the [[graft.ops.Dedup.connectedComponents]]
    * discipline — after round k every pointer is min(2^k, chain) hops
    * ahead, so a maxHops=64 resolution is 7 hash-partitioned self-joins
    * regardless of corpus size, never a per-hop driver loop. Each round
    * `localCheckpoint`s and releases the superseded round's blocks.
    * Duplicate src rows are refused loudly (a url has ONE Location;
    * duplicates would make resolution order-dependent).
    */
  def resolveRedirects(edges0: DataFrame, srcCol: String, dstCol: String,
                       maxHops: Int = 64): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val edges = edges0
      .select(col(srcCol).as("_u"), col(dstCol).as("_v"))
      .where(col("_v").isNotNull && col("_v") =!= col("_u"))
      .persist()
    val dup = edges.groupBy(col("_u")).count()
      .where(col("count") > 1).limit(1).count()
    require(dup == 0,
      "duplicate redirect sources: a url must have exactly one Location")

    def ckptRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    var p = edges
      .select(col("_u"), col("_v"), lit(1L).as("_n"), lit(false).as("_done"))
      .localCheckpoint(true)
    var pRdd = ckptRdd(p)
    // ceil(log2(maxHops)) + 1: enough rounds to cover the hop budget AND
    // observe the terminal node's missing outgoing edge
    val rounds = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1, maxHops - 1).toLong).toInt + 1
    var r = 0
    var allDone = false
    while (r < rounds && !allDone) {
      val q = p.select(col("_u").as("_qu"), col("_v").as("_qv"),
        col("_n").as("_qn"), col("_done").as("_qdone"))
      val stay = col("_done") || col("_qu").isNull
      val next = p.join(q, p("_v") === q("_qu"), "left")
        .select(p("_u").as("_u"),
          when(stay, p("_v")).otherwise(col("_qv")).as("_v"),
          when(stay, col("_n")).otherwise(col("_n") + col("_qn")).as("_n"),
          (stay || col("_qdone")).as("_done"))
        .localCheckpoint(true)
      allDone = next.where(!col("_done")).limit(1).count() == 0
      pRdd.foreach(_.unpersist(false))
      p = next
      pRdd = ckptRdd(next)
      r += 1
    }
    edges.unpersist()
    p.select(col("_u").as(srcCol), col("_v").as("final_url"),
      col("_n").as("hops"),
      (col("_done") && col("_n") <= maxHops).as("resolved"))
  }
}
