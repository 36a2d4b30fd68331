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
 * stateless projection + explode with zero shuffle.
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
   * field carry null there (nullif-guarded ANSI casts) — the
   * protocol makes lastmod/priority optional.
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
          .cast("date").as("lastmod"),
        nullif(regexp_extract(e, "<priority>(.*?)</priority>", 1), lit(""))
          .cast("double").as("priority"))
  }
}
