package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.ext.Sitemap

/** Sitemap codec specs: typed roundtrip, optional fields, in-file
  * ordering, and the zero-shuffle parse plan. */
class SitemapSpec extends SparkSpec {

  import spark.implicits._

  test("render∘parse roundtrips typed entries per site") {
    val entries = Seq(
      (2L, "a", "https://a.com/2", "2026-01-05", "0.8"),
      (0L, "a", "https://a.com/0", "2026-02-28", "0.5"),
      (1L, "b", "https://b.org/1", "2025-12-31", "1.0"))
      .toDF("doc_id", "site", "loc", "lastmod", "priority")
    val out = Sitemap.parseSitemaps(Sitemap.renderSitemaps(entries))
      .orderBy("loc").collect()
    out.map(_.getAs[String]("loc")).toSeq shouldBe
      Seq("https://a.com/0", "https://a.com/2", "https://b.org/1")
    out.head.getAs[Date]("lastmod") shouldBe Date.valueOf("2026-02-28")
    out.head.getAs[Double]("priority") shouldBe 0.5
    // entries are id-sorted inside each site file
    val content = Sitemap.renderSitemaps(entries)
      .where($"site" === "a").select("content").as[String].head()
    content should startWith("<urlset><url><loc>https://a.com/0")
    content should endWith("</url></urlset>")
  }

  test("degenerate sitemaps: empty urlset and non-sitemap content yield no entries") {
    val raw = Seq(("a", "<urlset></urlset>"), ("b", ""), ("c", "plain text"))
      .toDF("site", "content")
    Sitemap.parseSitemaps(raw).count() shouldBe 0L
  }

  test("optional lastmod/priority parse as nulls; parse plans no shuffle") {
    val raw = Seq(("s",
      "<urlset><url><loc>u1</loc></url>" +
        "<url><loc>u2</loc><lastmod>2026-01-01</lastmod></url></urlset>"))
      .toDF("site", "content")
    val out = Sitemap.parseSitemaps(raw).orderBy("loc").collect()
    out(0).isNullAt(out(0).fieldIndex("lastmod")) shouldBe true
    out(0).isNullAt(out(0).fieldIndex("priority")) shouldBe true
    out(1).getAs[Date]("lastmod") shouldBe Date.valueOf("2026-01-01")
    val plan = Sitemap.parseSitemaps(raw).queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should include("Generate explode")
  }
}
