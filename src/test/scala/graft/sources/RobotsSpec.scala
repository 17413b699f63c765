package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val robotsBody =
    """# crawl policy
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /bots
      |Allow: /bots/welcome
      |""".stripMargin

  private def rules = Robots.parseRobots(
    Seq(("d.com", robotsBody)).toDF("dom", "body"), col("dom"), col("body"))

  test("parseRobots: UA grouping, shared rule blocks, comments, new group after rules") {
    val got = rules.as[(String, String, Boolean, String)].collect()
      .map(r => (r._2, r._3, r._4)).toSet
    assert(got === Set(
      ("*", false, "/private"), ("*", true, "/private/ok"),
      ("graftbot", false, "/bots"), ("graftbot", true, "/bots/welcome"),
      ("otherbot", false, "/bots"), ("otherbot", true, "/bots/welcome")))
  }

  test("filterAllowed: longest match wins, allow wins ties, no-match allowed") {
    val urls = Seq(
      "https://d.com/public/page",      // no rule matches → allowed
      "https://d.com/private/x",        // * disallow → blocked
      "https://d.com/private/ok/page",  // longer allow overrides → allowed
      "https://other.org/anything"      // domain without rules → allowed
    ).toDF("url")
    val got = Robots.filterAllowed(urls, col("url"), rules, agent = "randombot")
      .as[String].collect().toSet
    assert(got === Set("https://d.com/public/page",
      "https://d.com/private/ok/page", "https://other.org/anything"))
    // exact-length tie: Allow beats Disallow
    val tie = Robots.parseRobots(Seq(("t.com",
      "User-agent: *\nAllow: /p\nDisallow: /p")).toDF("d", "b"), col("d"), col("b"))
    val kept = Robots.filterAllowed(Seq("https://t.com/p/x").toDF("url"),
      col("url"), tie, "any").count()
    assert(kept === 1L)
  }

  test("filterAllowed: a specific-agent group suppresses * entirely") {
    val urls = Seq(
      "https://d.com/private/x", // * blocks it, but graftbot has its OWN group → allowed
      "https://d.com/bots/secret", // graftbot's own disallow → blocked
      "https://d.com/bots/welcome/hi" // graftbot's own allow → allowed
    ).toDF("url")
    val got = Robots.filterAllowed(urls, col("url"), rules, agent = "GraftBot")
      .as[String].collect().toSet
    assert(got === Set("https://d.com/private/x", "https://d.com/bots/welcome/hi"))
  }

  test("filterAllowed: 'Disallow: /' blocks the path-less site root URL") {
    val root = Robots.parseRobots(Seq(("r.com",
      "User-agent: *\nDisallow: /")).toDF("d", "b"), col("d"), col("b"))
    // try_parse_url yields '' (not null) for https://r.com — the
    // normalized-to-'/' path must still match the Disallow prefix
    val blocked = Robots.filterAllowed(
      Seq("https://r.com", "https://r.com/").toDF("url"),
      col("url"), root, agent = "any").count()
    assert(blocked === 0L)
  }

  test("filterAllowed: preserves input multiplicity (identical rows survive)") {
    val got = Robots.filterAllowed(
        Seq("https://d.com/public/page", "https://d.com/public/page",
          "https://d.com/public/page").toDF("url"),
        col("url"), rules, agent = "randombot")
      .count()
    assert(got === 3L)
  }

  test("parseCrawlDelays: UA grouping, numeric guard, delay closes the group") {
    val body =
      """User-agent: *
        |Crawl-delay: 2
        |
        |User-agent: graftbot
        |User-agent: otherbot
        |Crawl-delay: 0.5
        |Crawl-delay: junk
        |
        |User-agent: badbot
        |Crawl-delay: 10
        |""".stripMargin
    val got = Robots.parseCrawlDelays(
        Seq(("d.com", body)).toDF("dom", "body"), col("dom"), col("body"))
      .as[(String, String, Double)].collect().map(r => (r._2, r._3)).toSet
    assert(got === Set(("*", 2.0), ("graftbot", 0.5), ("otherbot", 0.5),
      ("badbot", 10.0)))
  }

  test("parseCrawlDelays: a path rule closes the group — no backward delay leak") {
    // googlebot's group is closed by its Disallow; the later '*' group's
    // delay must NOT attach to googlebot (mixed-directive bodies are
    // the norm on the real web)
    val body = "User-agent: googlebot\nDisallow: /private\n\nUser-agent: *\nCrawl-delay: 5"
    val got = Robots.parseCrawlDelays(
        Seq(("d.com", body)).toDF("dom", "body"), col("dom"), col("body"))
      .as[(String, String, Double)].collect().map(r => (r._2, r._3)).toSet
    assert(got === Set(("*", 5.0)))
  }

  test("Frontier.schedule: per-host FIFO slots spaced by the winning delay") {
    val delays = Robots.parseCrawlDelays(Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 2\nUser-agent: graftbot\nCrawl-delay: 5"),
      ("b.com", "User-agent: somebot\nCrawl-delay: 9")).toDF("d", "b"),
      col("d"), col("b"))
    val urls = Seq(
      "https://a.com/p1", "https://a.com/p2", "https://a.com/p3",
      "https://b.com/x", "https://b.com/y",   // foreign-agent delay → default
      "https://c.com/z"                        // no robots → default
    ).toDF("url")
    val got = Frontier.schedule(urls, col("url"), delays, agent = "GraftBot",
        defaultDelaySeconds = 1.0)
      .select("url", "host", "seq", "dispatch_offset_s")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === Set(
      ("https://a.com/p1", "a.com", 0L, 0.0),   // specific group wins: 5s
      ("https://a.com/p2", "a.com", 1L, 5.0),
      ("https://a.com/p3", "a.com", 2L, 10.0),
      ("https://b.com/x", "b.com", 0L, 0.0),    // somebot's 9s not ours
      ("https://b.com/y", "b.com", 1L, 1.0),
      ("https://c.com/z", "c.com", 0L, 0.0)))
  }

  test("Frontier.schedule: a host past maxPerHost fails loud with the A20 advice") {
    val delays = Robots.parseCrawlDelays(
      Seq(("a.com", "User-agent: *\nCrawl-delay: 1")).toDF("d", "b"),
      col("d"), col("b"))
    val urls = (1 to 5).map(i => s"https://mega.com/p$i").toDF("url")
    val ex = intercept[Exception] {
      Frontier.schedule(urls, col("url"), delays, agent = "GraftBot",
        maxPerHost = 3L).collect()
    }
    assert(ex.getMessage.contains("maxPerHost"), ex.getMessage)
    assert(ex.getMessage.contains("capPerDomainExpected"), ex.getMessage)
    // at the bound it schedules fine
    val ok = Frontier.schedule(urls, col("url"), delays, agent = "GraftBot",
      maxPerHost = 5L).count()
    assert(ok === 5L)
  }

  test("filterAllowed: a domain with only foreign-agent rules never loses URLs") {
    val foreign = Robots.parseRobots(Seq(("f.com",
      "User-agent: somebot\nDisallow: /")).toDF("d", "b"), col("d"), col("b"))
    val got = Robots.filterAllowed(
        Seq("https://f.com/x", "https://f.com/y").toDF("url"),
        col("url"), foreign, agent = "graftbot")
      .as[String].collect().toSet
    assert(got === Set("https://f.com/x", "https://f.com/y"))
    // and somebot itself is blocked everywhere on f.com
    val blocked = Robots.filterAllowed(Seq("https://f.com/x").toDF("url"),
      col("url"), foreign, agent = "somebot").count()
    assert(blocked === 0L)
  }
}
