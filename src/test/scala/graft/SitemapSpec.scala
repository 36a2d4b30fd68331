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

  test("malformed lastmod/priority in untrusted feeds parse to null, never throw") {
    val raw = Seq(("s",
      "<urlset><url><loc>u1</loc><lastmod>yesterday</lastmod>" +
        "<priority>high</priority></url>" +
        "<url><loc>u2</loc><lastmod>2026-13-40</lastmod>" +
        "<priority>0.7</priority></url></urlset>"))
      .toDF("site", "content")
    val out = Sitemap.parseSitemaps(raw).orderBy("loc").collect()
    out(0).isNullAt(out(0).fieldIndex("lastmod")) shouldBe true
    out(0).isNullAt(out(0).fieldIndex("priority")) shouldBe true
    // an impossible calendar date is malformed too, not just non-dates
    out(1).isNullAt(out(1).fieldIndex("lastmod")) shouldBe true
    out(1).getAs[Double]("priority") shouldBe 0.7
  }

  test("sitemapindex nesting: index -> child locs -> entries, levels stay disjoint") {
    val entries = Seq(
      (0L, "a", "https://a.com/0", "2026-01-01", "0.5"),
      (1L, "b", "https://b.org/1", "2026-01-02", "0.8"))
      .toDF("doc_id", "site", "loc", "lastmod", "priority")
    val children = Sitemap.renderSitemaps(entries)
      .withColumn("loc", concat(lit("https://"), $"site", lit(".example.com/sitemap.xml")))
    val index = Sitemap.renderSitemapIndex(
      children.withColumn("index_key", lit("root")))
    index.select("content").as[String].head() shouldBe
      "<sitemapindex><sitemap><loc>https://a.example.com/sitemap.xml</loc></sitemap>" +
        "<sitemap><loc>https://b.example.com/sitemap.xml</loc></sitemap></sitemapindex>"
    // resolve the nesting: parse the index, join child contents, parse them
    val resolved = Sitemap.parseSitemapIndex(index)
      .join(children.select("loc", "site", "content"), "loc")
    Sitemap.parseSitemaps(resolved).orderBy("loc")
      .select("loc").as[String].collect().toSeq shouldBe
      Seq("https://a.com/0", "https://b.org/1")
    // levels are disjoint: an index doc has no <url> blocks, a urlset
    // no <sitemap> blocks — neither parser sees the other's level
    Sitemap.parseSitemaps(index.withColumnRenamed("index_key", "site"))
      .count() shouldBe 0L
    Sitemap.parseSitemapIndex(
      children.withColumnRenamed("site", "index_key")).count() shouldBe 0L
  }
}
