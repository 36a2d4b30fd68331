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
