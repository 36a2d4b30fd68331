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
      .select("prefix").as[String].collect().toSet

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

  test("parseCrawlDelay: governing sections only, first wins, absent filtered") {
    def delayOf(content: String, agent: String = "*"): Option[Long] =
      Robots.parseCrawlDelay(
        Seq(("d.com", content)).toDF("domain", "content"), agent)
        .select("crawl_delay_s").as[Long].collect().headOption
    delayOf("User-agent: *\nCrawl-delay: 5\nDisallow: /x\n") shouldBe Some(5L)
    // a decoy section's delay does not leak
    delayOf("User-agent: badbot\nCrawl-delay: 60\n\nUser-agent: *\nDisallow: /x\n") shouldBe None
    // first governing value wins; later sections cannot relax it
    delayOf("User-agent: *\nCrawl-delay: 2\n\nUser-agent: *\nCrawl-delay: 9\n") shouldBe Some(2L)
    delayOf("User-agent: *\nDisallow: /x\n") shouldBe None
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

  test("applyRules: broadcast prefix match, deterministic rule pick, no-rule domains pass") {
    val pages = Seq(
      (1L, "a.com", "/p/3"), (2L, "a.com", "/p/33"), (3L, "a.com", "/q"),
      (4L, "b.org", "/p/3")).toDF("doc_id", "domain", "path")
    val rules = Seq(("a.com", "/p/3"), ("a.com", "/p/33")).toDF("domain", "prefix")
    val out = Robots.applyRules(pages, rules).orderBy("doc_id")
      .select("doc_id", "blocked", "rule")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    // /p/33 matches BOTH prefixes; the shortest wins deterministically.
    out shouldBe Seq((1L, true, "/p/3"), (2L, true, "/p/3"),
      (3L, false, null), (4L, false, null))
    val plan = Robots.applyRules(pages, rules).queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    // the only row shuffle is the bounded rules-per-domain aggregate —
    // the page side is a stateless projection off the broadcast join
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
  }
}
