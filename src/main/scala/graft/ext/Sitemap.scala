package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sitemap codec + recrawl planning — the third leg of the crawl
 * compliance trio (robots.txt tells a crawler what it may fetch,
 * sitemaps tell it what exists and when it changed). Renders per-site
 * sitemap XML from an entry frame and parses it back into typed rows
 * (`loc`, `lastmod` DATE, `priority` DOUBLE) with pure Column
 * functions — `regexp_extract_all` over `<url>` blocks, no XML
 * library, no UDF — the deterministic subset of the sitemaps.org
 * protocol both engines replay.
 *
 * Scale posture mirrors [[Warc]]: the SITE FILE is the unit of
 * parallelism (render is one bounded collect_list per site — the
 * 50k-URL limit of the protocol is the real-world cap), parse is a
 * stateless projection + explode with zero shuffle. That 50k cap is
 * also why large sites ship `<sitemapindex>` files naming child
 * sitemaps — [[renderSitemapIndex]]/[[parseSitemapIndex]] cover the
 * nesting level (index → child locs → entries, two stateless
 * explodes; the child-content join keys on the bounded loc list).
 *
 * The reference has no crawl handling (src/main.py:959-975) —
 * training-data-pipeline extension surface.
 */
object Sitemap {

  /** One `<url>` element per entry row. */
  private def urlElem(loc: org.apache.spark.sql.Column,
      lastmod: org.apache.spark.sql.Column,
      priority: org.apache.spark.sql.Column) =
    concat(lit("<url><loc>"), loc, lit("</loc><lastmod>"), lastmod,
      lit("</lastmod><priority>"), priority, lit("</priority></url>"))

  /**
   * Assemble `(site, content)` sitemap documents — entries id-sorted
   * inside each site file so the bytes are partitioning-stable.
   */
  def renderSitemaps(entries: DataFrame, siteCol: String = "site",
      idCol: String = "doc_id", locCol: String = "loc",
      lastmodCol: String = "lastmod", priorityCol: String = "priority"): DataFrame =
    entries
      .select(col(siteCol).as("site"),
        struct(col(idCol).as("k"),
          urlElem(col(locCol), col(lastmodCol), col(priorityCol)).as("e"))
          .as("u"))
      .groupBy("site")
      .agg(concat(lit("<urlset>"),
        array_join(transform(array_sort(collect_list(col("u"))),
          u => u("e")), ""),
        lit("</urlset>")).as("content"))

  /**
   * Parse sitemap documents back into typed entry rows:
   * `(site, loc, lastmod DATE, priority DOUBLE)`. Entries missing a
   * field carry null there — the protocol makes lastmod/priority
   * optional — and MALFORMED values (`<lastmod>soon</lastmod>`,
   * `<priority>high</priority>` in an untrusted feed) also parse to
   * null via `try_cast`, never an ANSI cast crash.
   */
  def parseSitemaps(sitemaps: DataFrame, siteCol: String = "site",
      contentCol: String = "content"): DataFrame = {
    val e = col("entry")
    sitemaps
      .select(col(siteCol).as("site"),
        explode(regexp_extract_all(col(contentCol),
          lit("(?s)<url>.*?</url>"), lit(0))).as("entry"))
      .select(
        col("site"),
        regexp_extract(e, "<loc>(.*?)</loc>", 1).as("loc"),
        nullif(regexp_extract(e, "<lastmod>(.*?)</lastmod>", 1), lit(""))
          .try_cast("date").as("lastmod"),
        nullif(regexp_extract(e, "<priority>(.*?)</priority>", 1), lit(""))
          .try_cast("double").as("priority"))
  }

  /**
   * Assemble `(index_key, content)` sitemap-index documents — one
   * `<sitemap><loc>…</loc></sitemap>` entry per child sitemap file,
   * loc-sorted so the bytes are grouping-stable. The protocol's
   * answer to the 50k-URL urlset cap: big sites publish an index of
   * child sitemaps, and a crawler resolves the nesting first.
   */
  def renderSitemapIndex(children: DataFrame, indexCol: String = "index_key",
      locCol: String = "loc"): DataFrame =
    children
      .select(col(indexCol).as("index_key"), col(locCol).as("loc"))
      .groupBy("index_key")
      .agg(concat(lit("<sitemapindex>"),
        array_join(transform(array_sort(collect_list(col("loc"))),
          l => concat(lit("<sitemap><loc>"), l, lit("</loc></sitemap>"))), ""),
        lit("</sitemapindex>")).as("content"))

  /**
   * Parse sitemap-index documents into `(index_key, loc)` child
   * references — the frame a crawler joins against its fetched child
   * sitemaps (or feeds back into the fetch frontier). A flat urlset
   * run through this parser yields no rows, and vice versa: the
   * `<sitemap>` / `<url>` block tags keep the two levels disjoint.
   */
  def parseSitemapIndex(indexes: DataFrame, indexCol: String = "index_key",
      contentCol: String = "content"): DataFrame =
    indexes
      .select(col(indexCol).as("index_key"),
        explode(regexp_extract_all(col(contentCol),
          lit("(?s)<sitemap>.*?</sitemap>"), lit(0))).as("entry"))
      .select(col("index_key"),
        regexp_extract(col("entry"), "<loc>(.*?)</loc>", 1).as("loc"))
}
