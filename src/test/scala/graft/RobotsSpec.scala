package graft

import org.apache.spark.sql.functions._
import graft.ext.Robots

/** robots.txt parser/apply specs: section selection, stacked
  * User-agent groups, comments, allow-all markers, CRLF bodies, and
  * the broadcast prefix apply with its deterministic rule choice. */
class RobotsSpec extends SparkSpec {

  import spark.implicits._

  private def rulesOf(content: String, agent: String = "*"): Set[String] =
    Robots.parseRules(Seq(("d.com", content)).toDF("domain", "content"), agent)
      .where(!col("allow")).select("pattern").as[String].collect().toSet

  private def allRulesOf(content: String, agent: String = "*"): Set[(String, Boolean)] =
    Robots.parseRules(Seq(("d.com", content)).toDF("domain", "content"), agent)
      .select("pattern", "allow").as[(String, Boolean)].collect().toSet

  test("sections: only the selected agent's (or *) groups contribute") {
    val body =
      "User-agent: badbot\nDisallow: /\n\n" +
        "User-agent: *\nDisallow: /private\n# note\nDisallow: /tmp\n"
    rulesOf(body) shouldBe Set("/private", "/tmp")
    rulesOf(body, agent = "badbot") shouldBe Set("/", "/private", "/tmp")
  }

  test("stacked User-agent lines form one shared group (RFC 9309)") {
    val body =
      "User-agent: *\nUser-agent: badbot\nDisallow: /a\n\n" +
        "User-agent: badbot\nUser-agent: elsebot\nDisallow: /b\n"
    // group 1 names * (so everyone); group 2 names neither * nor us.
    rulesOf(body) shouldBe Set("/a")
    rulesOf(body, agent = "elsebot") shouldBe Set("/a", "/b")
  }

  test("comments, blank Disallow, CRLF endings, and case-insensitive keys") {
    rulesOf("USER-AGENT: *\r\nDISALLOW: /x # inline comment\r\nDisallow:\r\n") shouldBe
      Set("/x")
    // a rule before any section binds to nothing
    rulesOf("Disallow: /orphan\nUser-agent: *\nDisallow: /y\n") shouldBe Set("/y")
  }

  test("parseCrawlDelay: governing sections only, max wins, malformed -> null") {
    def delayOf(content: String, agent: String = "*"): Option[Long] =
      Robots.parseCrawlDelay(
        Seq(("d.com", content)).toDF("domain", "content"), agent)
        .select("crawl_delay_s").as[Long].collect().headOption
    delayOf("User-agent: *\nCrawl-delay: 5\nDisallow: /x\n") shouldBe Some(5L)
    // a decoy section's delay does not leak
    delayOf("User-agent: badbot\nCrawl-delay: 60\n\nUser-agent: *\nDisallow: /x\n") shouldBe None
    // MAX of governing values — a later section can only raise the
    // politeness floor, never relax it
    delayOf("User-agent: *\nCrawl-delay: 2\n\nUser-agent: *\nCrawl-delay: 9\n") shouldBe Some(9L)
    delayOf("User-agent: *\nCrawl-delay: 9\n\nUser-agent: *\nCrawl-delay: 2\n") shouldBe Some(9L)
    delayOf("User-agent: *\nDisallow: /x\n") shouldBe None
    // fractional / malformed values parse to null (never an ANSI cast
    // crash on untrusted input), not a partial-digit prefix
    delayOf("User-agent: *\nCrawl-delay: 0.5\n") shouldBe None
    delayOf("User-agent: *\nCrawl-delay: fast\n") shouldBe None
    delayOf("User-agent: *\nCrawl-delay: 0.5\nCrawl-delay: 3\n") shouldBe Some(3L)
  }

  test("schedule: per-host slots times the host delay, default for undeclared hosts") {
    val frontier = Seq(
      ("a.com", "a.com/1"), ("a.com", "a.com/2"), ("a.com", "a.com/3"),
      ("b.org", "b.org/1"), ("b.org", "b.org/2"))
      .toDF("domain", "url_norm")
    val delays = Seq(("a.com", 5L)).toDF("domain", "crawl_delay_s")
    val out = Robots.schedule(frontier, delays).orderBy("url_norm")
      .select("url_norm", "fetch_at_s").as[(String, Long)].collect().toSeq
    out shouldBe Seq(("a.com/1", 0L), ("a.com/2", 5L), ("a.com/3", 10L),
      ("b.org/1", 0L), ("b.org/2", 1L))
    // the slot window is host-partitioned — no single-partition sort
    val plan = Robots.schedule(frontier, delays)
      .queryExecution.executedPlan.toString
    plan should include("hashpartitioning(domain")
    plan should not include "SinglePartition"
  }

  test("degenerate robots bodies: empty, comment-only, and rule-less parse to nothing") {
    rulesOf("") shouldBe Set.empty
    rulesOf("# only a comment\n\n") shouldBe Set.empty
    rulesOf("User-agent: *\n# no rules follow\n") shouldBe Set.empty
    Robots.parseCrawlDelay(Seq(("d", "")).toDF("domain", "content"))
      .count() shouldBe 0L
  }

  test("applyRules: broadcast prefix match, longest-match rule pick, no-rule domains pass") {
    val pages = Seq(
      (1L, "a.com", "/p/3"), (2L, "a.com", "/p/33"), (3L, "a.com", "/q"),
      (4L, "b.org", "/p/3")).toDF("doc_id", "domain", "path")
    val rules = Seq(("a.com", "/p/3", false), ("a.com", "/p/33", false))
      .toDF("domain", "pattern", "allow")
    val out = Robots.applyRules(pages, rules).orderBy("doc_id")
      .select("doc_id", "blocked", "rule")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    // /p/33 matches BOTH prefixes; the most specific (longest) wins.
    out shouldBe Seq((1L, true, "/p/3"), (2L, true, "/p/33"),
      (3L, false, null), (4L, false, null))
    val plan = Robots.applyRules(pages, rules).queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    // the only row shuffle is the bounded rules-per-domain aggregate —
    // the page side is a stateless projection off the broadcast join
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
  }

  test("RFC 9309 precedence: Allow beats Disallow on ties, longest match wins") {
    val body =
      "User-agent: *\nDisallow: /\nAllow: /public\nDisallow: /public/private\n"
    allRulesOf(body) shouldBe
      Set(("/", false), ("/public", true), ("/public/private", false))
    val pages = Seq(
      (1L, "d.com", "/secret"), (2L, "d.com", "/public"),
      (3L, "d.com", "/public/x"), (4L, "d.com", "/public/private/y"))
      .toDF("doc_id", "domain", "path")
    val rules = Robots.parseRules(
      Seq(("d.com", body)).toDF("domain", "content"))
    val out = Robots.applyRules(pages, rules).orderBy("doc_id")
      .select("doc_id", "blocked", "rule")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    // Disallow: / + Allow: /public is THE canonical real-robots shape:
    // the host stays crawlable under /public, blocked elsewhere
    out shouldBe Seq(
      (1L, true, "/"), (2L, false, "/public"), (3L, false, "/public"),
      (4L, true, "/public/private"))
  }

  test("wildcard * and $ anchor patterns, with specificity by pattern length") {
    val body =
      "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*junk\n" +
        "Allow: /ok*.pdf$\n"
    val pages = Seq(
      (1L, "d.com", "/a/report.pdf"), (2L, "d.com", "/a/report.pdf.html"),
      (3L, "d.com", "/tmp/deep/junk"), (4L, "d.com", "/tmpjunk"),
      (5L, "d.com", "/ok/x.pdf"), (6L, "d.com", "/plain"))
      .toDF("doc_id", "domain", "path")
    val rules = Robots.parseRules(
      Seq(("d.com", body)).toDF("domain", "content"))
    val out = Robots.applyRules(pages, rules).orderBy("doc_id")
      .select("doc_id", "blocked", "rule")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    out shouldBe Seq(
      // $ anchor: .pdf blocked, .pdf.html not
      (1L, true, "/*.pdf$"), (2L, false, null),
      // * spans path segments; also matches the empty string
      (3L, true, "/tmp*junk"), (4L, true, "/tmp*junk"),
      // /ok*.pdf$ (9) out-specifies /*.pdf$ (7)
      (5L, false, "/ok*.pdf$"), (6L, false, null))
  }

  test("agent tokens match case-insensitively; rule paths lowercase at parse") {
    val body = "User-agent: BadBot\nDisallow: /Articles/\n"
    allRulesOf(body, agent = "badbot") shouldBe Set(("/articles/", false))
    allRulesOf(body, agent = "BADBOT") shouldBe Set(("/articles/", false))
    // the lowercased rule path matches the lowercased canonical path
    val pages = Seq((1L, "d.com", "/articles/x")).toDF("doc_id", "domain", "path")
    val rules = Robots.parseRules(
      Seq(("d.com", body)).toDF("domain", "content"), agent = "badbot")
    Robots.applyRules(pages, rules)
      .select("blocked").as[Boolean].collect().toSeq shouldBe Seq(true)
  }

  test("availability: 4xx lifts all rules, 5xx blocks everything, 2xx/absent applies them") {
    val body = "User-agent: *\nDisallow: /p\n"
    val robots = Seq(("a.com", body), ("b.com", body), ("c.com", body),
      ("d.com", body)).toDF("domain", "content")
    val pages = Seq(("a.com", "/p/1"), ("b.com", "/p/1"), ("c.com", "/p/1"),
      ("d.com", "/p/1"), ("c.com", "/ok"))
      .toDF("domain", "path")
    val status = Seq(("a.com", 404), ("b.com", 503), ("c.com", 200))
      .toDF("domain", "robots_status") // d.com absent ≡ normal
    val got = Robots.applyWithAvailability(pages,
        Robots.parseRules(robots), status)
      .select("domain", "path", "blocked", "rule")
      .as[(String, String, Boolean, Option[String])].collect().toSet
    got shouldBe Set(
      ("a.com", "/p/1", false, None),               // 404: no robots
      ("b.com", "/p/1", true, Some("unreachable")), // 503: full disallow
      ("c.com", "/p/1", true, Some("/p")),          // 200: rules apply
      ("c.com", "/ok", false, None),
      ("d.com", "/p/1", true, Some("/p")))          // absent ≡ 2xx
  }

  test("Sitemap: directives parse section-independently; comments and case handled") {
    val body =
      "User-agent: badbot\nDisallow: /\n" +
        "Sitemap: https://d.com/inside-badbot.xml\n" + // NOT scoped to badbot
        "# Sitemap: https://d.com/commented.xml\n" +
        "  sitemap: https://d.com/indented.xml\n" +
        "User-agent: *\nDisallow: /tmp\n" +
        "SITEMAP: https://d.com/upper.xml\n" +
        "Sitemap:\n" // empty value drops
    val got = Robots.sitemapDirectives(
        Seq(("d.com", body)).toDF("domain", "content"))
      .select("sitemap_url").as[String].collect().toSet
    got shouldBe Set("https://d.com/inside-badbot.xml",
      "https://d.com/indented.xml", "https://d.com/upper.xml")
    // a body with no directives yields no rows
    Robots.sitemapDirectives(
      Seq(("e.com", "User-agent: *\nDisallow: /x\n"))
        .toDF("domain", "content")).count() shouldBe 0L
  }
}
