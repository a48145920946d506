package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** RFC 9309 semantics pinned on the RFC's own examples: group selection
  * by most-specific agent token, longest-match rule precedence with
  * Allow winning ties, wildcard/anchor patterns, permissive degrades,
  * and the frontier filter's join + memo shape. */
class RobotsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("matches: REP wildcards and anchors") {
    assert(Robots.matches("/", "/anything"))
    assert(Robots.matches("/fish", "/fish.html"))       // prefix
    assert(Robots.matches("/fish", "/fishheads/x"))     // octet prefix, not segment
    assert(!Robots.matches("/fish", "/Fish"))           // case-sensitive paths
    assert(Robots.matches("/*.gif$", "/a/b/pic.gif"))   // star + anchor
    assert(!Robots.matches("/*.gif$", "/pic.gifx"))
    assert(Robots.matches("/p*q", "/pXXXq/more"))       // star mid-pattern, prefix tail
    assert(Robots.matches("/fish*.php", "/fishheads/catfish.php?x=1"))
    assert(!Robots.matches("/fish$", "/fish.html"))
    assert(Robots.matches("/fish$", "/fish"))
    assert(!Robots.matches("$", "/"))                   // bare anchor matches nothing real
  }

  test("parse + allowed: groups, precedence, ties, degrades") {
    val txt =
      """# politeness file
        |User-agent: googlebot-news
        |Disallow: /news-archive
        |
        |User-agent: googlebot
        |Disallow: /archive
        |
        |User-agent: *
        |Allow: /public
        |Disallow: /
        |Crawl-delay: 10
        |Sitemap: https://x.org/sitemap.xml""".stripMargin
    // Most specific group wins — and ONLY that group's rules apply.
    assert(!Robots.allowed(txt, "googlebot-news", "/news-archive/a"))
    assert(Robots.allowed(txt, "googlebot-news", "/archive/a"),
      "the less specific googlebot group must NOT leak into the news group")
    assert(!Robots.allowed(txt, "googlebot", "/archive/a"))
    // The * group: longest match wins — /public beats /.
    assert(Robots.allowed(txt, "randombot", "/public/page"))
    assert(!Robots.allowed(txt, "randombot", "/private"))
    // Equal-length tie goes to Allow (RFC precedence).
    val tie = "User-agent: *\nAllow: /page\nDisallow: /*.ph"
    assert(Robots.allowed(tie, "*", "/page.php5"))
    // Consecutive UA lines share one group.
    val shared = "User-agent: a\nUser-agent: b\nDisallow: /x"
    assert(!Robots.allowed(shared, "a", "/x/1") && !Robots.allowed(shared, "b", "/x/1"))
    // Empty Disallow = allow-all idiom; no rules / null text = allowed.
    assert(Robots.allowed("User-agent: *\nDisallow:", "*", "/anything"))
    assert(Robots.allowed(null: String, "*", "/anything"))
    assert(Robots.allowed("totally { malformed", "*", "/x"))
    // Recognized non-rule directives CLOSE a group: agent a's group ends
    // at the crawl-delay, so b's Disallow must not bind a — and parse /
    // crawlDelay agree on the group boundaries of the same file.
    val delayed = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /"
    assert(Robots.allowed(delayed, "a", "/x"),
      "a crawl-delay-only group must not merge into the next group")
    assert(!Robots.allowed(delayed, "b", "/x"))
    assert(Robots.crawlDelay(delayed, "a").contains(1.0))
    assert(Robots.crawlDelay(delayed, "b").isEmpty)
    val mapped = "User-agent: a\nSitemap: https://a.org/s.xml\nUser-agent: b\nDisallow: /"
    assert(Robots.allowed(mapped, "a", "/x") && !Robots.allowed(mapped, "b", "/x"))
    // UNKNOWN directives are group separators too (the google/robotstxt
    // separator class): agent a's group ends at the Host line, so b's
    // Disallow must not bind a.
    val hosted = "User-agent: a\nHost: example.com\nUser-agent: b\nDisallow: /"
    assert(Robots.allowed(hosted, "a", "/x"),
      "an unknown-directive-only group must not merge into the next group")
    assert(!Robots.allowed(hosted, "b", "/x"))
    // crawlDelay uses the SAME separator class: an unknown directive
    // between groups closes agent a's group, so b's Crawl-delay must not
    // apply to a (parse and crawlDelay see identical groups).
    val hostedDelay =
      "User-agent: a\nHost: example.com\nUser-agent: b\nCrawl-delay: 5"
    assert(Robots.crawlDelay(hostedDelay, "a").isEmpty,
      "an unknown directive must close the group for crawlDelay too")
    assert(Robots.crawlDelay(hostedDelay, "b").contains(5.0))
  }

  test("sitemaps + crawlDelay: seeding and politeness-rate extraction") {
    val txt =
      """User-agent: fastbot
        |Crawl-delay: 0.5
        |Disallow: /x
        |Sitemap: https://a.org/sitemap.xml
        |User-agent: *
        |Crawl-delay: 10
        |Sitemap: https://a.org/news/sitemap.xml""".stripMargin
    assert(Robots.sitemaps(txt) ==
      Seq("https://a.org/sitemap.xml", "https://a.org/news/sitemap.xml"),
      "sitemaps are file-scoped, in order, regardless of groups")
    assert(Robots.crawlDelay(txt, "fastbot-v2").contains(0.5))
    assert(Robots.crawlDelay(txt, "otherbot").contains(10.0))
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: soon", "x").isEmpty)
    assert(Robots.crawlDelay(null, "x").isEmpty && Robots.sitemaps(null).isEmpty)
  }

  test("frontierFilter: equi join on host, opt-out default, per-partition memo") {
    val spark2 = spark
    import spark2.implicits._
    val urls = Seq(
      (1L, "https://A.org/public/x"),
      (2L, "https://a.org/private/secret"),
      (3L, "https://a.org/"),
      (4L, "https://norobots.org/anything"),
      (5L, "https://blocked.org/y"),
      (6L, "not a url")).toDF("id", "url")
    val robots = Seq(
      ("a.org", "User-agent: *\nDisallow: /private"),
      ("blocked.org", "User-agent: *\nDisallow: /"),
      ("unused.org", "User-agent: *\nDisallow: /")).toDF("host", "txt")
    val kept = Robots.frontierFilter(urls, col("url"), robots, col("host"), col("txt"))
    assert(kept.columns.toSeq == Seq("id", "url"), "helper columns must not leak")
    assert(kept.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L, 6L))
    // Agent-specific filtering rides through.
    val agented = Seq(("a.org",
      "User-agent: newsbot\nDisallow: /\n\nUser-agent: *\nDisallow: /private"))
      .toDF("host", "txt")
    val forNews = Robots.frontierFilter(urls.where(col("id") < 4L), col("url"),
      agented, col("host"), col("txt"), agent = "newsbot")
    assert(forNews.count() == 0, "newsbot is banned from a.org entirely")
  }

  test("frontierFilter: ports key separately, duplicate cache rows collapse") {
    val spark2 = spark
    import spark2.implicits._
    val urls = Seq(
      (1L, "https://a.org/private/x"),        // default port: gated by a.org
      (2L, "https://a.org:8080/private/x"),   // :8080 robots allows /private
      (3L, "https://a.org:8080/secret/x"),    // :8080 robots blocks /secret
      (4L, "https://a.org:9999/private/x"),   // no robots row for :9999
      (5L, "https://user@b.org/x")            // userinfo stripped from the key
    ).toDF("id", "url")
    val robots = Seq(
      ("a.org", "User-agent: *\nDisallow: /private"),
      ("A.ORG:8080", "User-agent: *\nDisallow: /secret"),
      ("b.org", "User-agent: *\nDisallow: /x")).toDF("host", "txt")
    val kept = Robots.frontierFilter(urls, col("url"), robots, col("host"), col("txt"))
    assert(kept.select("id").collect().map(_.getLong(0)).toSet == Set(2L, 4L),
      "the authority (host:port) is the robots key; default-port rules " +
        "must not gate a non-default port")
    // Duplicate rows for one host (messy fetch logs) collapse to the
    // longest txt — the frontier must not duplicate through the join.
    val dup = Seq(
      ("c.org", "User-agent: *\nDisallow:"),
      ("c.org", "User-agent: *\nDisallow: /blocked")).toDF("host", "txt")
    val frontier = Seq((1L, "https://c.org/ok"), (2L, "https://c.org/blocked"))
      .toDF("id", "url")
    val out = Robots.frontierFilter(frontier, col("url"), dup, col("host"), col("txt"))
    assert(out.count() == 1 &&
      out.select("id").head().getLong(0) == 1L,
      "duplicate cache rows must neither duplicate frontier rows nor " +
        "flip the verdict nondeterministically")
  }
}
