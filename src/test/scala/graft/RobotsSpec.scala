package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Robots
import graft.ops.CrawlPolicy

class RobotsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("rfc 9309: longest-match wins, allow wins ties, unmatched allowed") {
    // the RFC's own §2.2.2 / §5.2 example shapes
    val rf = Robots.parse(
      """User-Agent: *
        |Allow: /publications/
        |Disallow: /
        |""".stripMargin)
    assert(Robots.isAllowed(rf, "anybot", "/publications/paper.pdf"))
    assert(!Robots.isAllowed(rf, "anybot", "/private/x"))
    assert(!Robots.isAllowed(rf, "anybot", "/"))
    // allow wins an exact length tie
    val tie = Robots.parse("User-agent: *\nAllow: /page\nDisallow: /page")
    assert(Robots.isAllowed(tie, "b", "/page"))
    // more specific disallow beats shorter allow
    val spec = Robots.parse("User-agent: *\nAllow: /a\nDisallow: /a/b")
    assert(Robots.isAllowed(spec, "b", "/a/c"))
    assert(!Robots.isAllowed(spec, "b", "/a/b/c"))
    // no matching rule and empty file → allowed
    assert(Robots.isAllowed(Robots.parse(""), "b", "/anything"))
    // empty path normalizes to "/" (which THIS file disallows)
    assert(!Robots.isAllowed(rf, "anybot", ""))
    assert(Robots.isAllowed(Robots.parse("User-agent: *\nDisallow: /x"), "b", ""))
  }

  test("rfc 9309: wildcards, end anchors, comments, empty disallow") {
    val rf = Robots.parse(
      """# global group
        |User-agent: *
        |Disallow: /*.gif$
        |Disallow: /tmp/*
        |Allow: /tmp/ok.html  # trailing comment
        |Disallow:
        |""".stripMargin)
    assert(!Robots.isAllowed(rf, "b", "/pics/cat.gif"))
    assert(Robots.isAllowed(rf, "b", "/pics/cat.gif?v=2")) // $ anchors the END
    assert(!Robots.isAllowed(rf, "b", "/tmp/x"))
    assert(Robots.isAllowed(rf, "b", "/tmp/ok.html"))
    assert(Robots.isAllowed(rf, "b", "/other")) // empty Disallow ignored
    // multi-wildcard backtracking
    val w = Robots.parse("User-agent: *\nDisallow: /a*b*c")
    assert(!Robots.isAllowed(w, "b", "/a-x-b-y-c"))
    assert(Robots.isAllowed(w, "b", "/a-x-y"))
  }

  test("rfc 9309: group selection by longest agent token; crawl-delay per group") {
    val rf = Robots.parse(
      """User-agent: googlebot-news
        |Disallow: /news-archive/
        |Crawl-delay: 2.5
        |
        |User-agent: googlebot
        |Disallow: /archive/
        |
        |User-agent: *
        |Disallow: /
        |Crawl-delay: 10
        |""".stripMargin)
    // most specific token wins; its group's rules apply EXCLUSIVELY
    assert(!Robots.isAllowed(rf, "Googlebot-News", "/news-archive/x"))
    assert(Robots.isAllowed(rf, "Googlebot-News", "/archive/x"))
    assert(!Robots.isAllowed(rf, "googlebot", "/archive/x"))
    assert(Robots.isAllowed(rf, "googlebot", "/anything-else"))
    assert(!Robots.isAllowed(rf, "otherbot", "/anything-else"))
    assert(Robots.crawlDelay(rf, "googlebot-news") === Some(2.5))
    assert(Robots.crawlDelay(rf, "googlebot") === None)
    assert(Robots.crawlDelay(rf, "otherbot") === Some(10.0))
    // successive user-agent lines share a group
    val shared = Robots.parse(
      "User-agent: a\nUser-agent: b\nDisallow: /x")
    assert(!Robots.isAllowed(shared, "a", "/x/1"))
    assert(!Robots.isAllowed(shared, "b", "/x/1"))
  }

  test("robotsFilter: per-host gate over a URL corpus; absent hosts allow all") {
    val urls = Seq(
      (1L, "https://host1.example.com/doc/ok"),
      (2L, "https://host1.example.com/private/secret"),
      (3L, "https://host1.example.com/private/pub/x"),
      (4L, "https://host2.example.com/anything"),   // disallow-all host
      (5L, "https://host3.example.com/no-robots"),  // host absent from table
      (6L, "https://host1.example.com/search?q=ads") // query matching
    ).toDF("id", "url")
    val robots = Seq(
      ("host1.example.com",
        "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\nDisallow: /search?q=*"),
      ("host2.example.com", "User-agent: *\nDisallow: /"),
      ("host4.example.com", null.asInstanceOf[String])
    ).toDF("host", "robots_txt")
    val kept = CrawlPolicy.robotsFilter(urls, "id", "url",
        robots, "host", "robots_txt", agent = "graftbot")
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 5L))
    val delays = CrawlPolicy.crawlDelays(
      Seq(("h1", "User-agent: *\nCrawl-delay: 3"), ("h2", "User-agent: *\nDisallow: /"))
        .toDF("host", "robots_txt"), "host", "robots_txt", "graftbot")
      .as[(String, Double)].collect().toMap
    assert(delays === Map("h1" -> 3.0))
  }

  test("domain blocklist: suffix match blocks all subdomains, exact host blocks one") {
    val rows = Seq(
      (1L, "a.ads.example.com"),    // blocked via suffix ads.example.com
      (2L, "ads.example.com"),      // blocked exactly
      (3L, "host7.example.com"),    // blocked exactly
      (4L, "ahost7.example.com"),   // NOT blocked: label boundary respected
      (5L, "sub.blocked.net"),      // blocked via registrable suffix
      (6L, "clean.example.org"))    // kept
    val bl = Seq("ads.example.com", "host7.example.com", "blocked.net").toDF("blocked")
    val kept = CrawlPolicy.blockByDomainSuffix(rows.toDF("id", "host"), "host", bl)
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(4L, 6L))
  }

  test("robots Sitemap: lines are file-level, captured anywhere, fed to the op") {
    val txt =
      """Sitemap: https://h1.example/sitemap.xml
        |User-agent: *
        |Disallow: /private
        |Sitemap: https://h1.example/sitemap-news.xml.gz
        |User-agent: graftbot
        |Allow: /
        |""".stripMargin
    val rf = graft.kernel.Robots.parse(txt)
    assert(rf.sitemaps === Vector("https://h1.example/sitemap.xml",
      "https://h1.example/sitemap-news.xml.gz"))
    // the mid-group Sitemap line must not have split the '*' group
    assert(graft.kernel.Robots.isAllowed(rf, "other", "/private") === false)
    val df = Seq(("h1.example", txt), ("h2.example", "User-agent: *\nAllow: /"),
      ("h3.example", null.asInstanceOf[String])).toDF("host", "robots_txt")
    val got = CrawlPolicy.sitemapUrlsFromRobots(df, "host", "robots_txt")
      .as[(String, String)].collect().toSet
    assert(got === Set(("h1.example", "https://h1.example/sitemap.xml"),
      ("h1.example", "https://h1.example/sitemap-news.xml.gz")))
  }

  test("domain blocklist: empty blocklist keeps everything; blocklist side is broadcast") {
    val rows = Seq((1L, "x.com"), (2L, "y.org")).toDF("id", "host")
    val none = CrawlPolicy.blockByDomainSuffix(rows,
      "host", Seq.empty[String].toDF("blocked"))
    assert(none.count() === 2)
    val plan = CrawlPolicy.blockByDomainSuffix(rows,
        "host", Seq("x.com").toDF("blocked"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"blocklist not broadcast:\n$plan")
  }
}
