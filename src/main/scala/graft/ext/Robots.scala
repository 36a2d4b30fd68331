package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * robots.txt compliance filtering — the crawl-politeness gate every
 * production web pipeline runs before fetch/keep decisions. Parses
 * per-domain robots.txt bodies (User-agent sections, Disallow rules,
 * `#` comments, CRLF or LF endings) and applies the selected agent's
 * prefix rules to a page frame.
 *
 * Scale posture: the rules table is bounded by |domains| × rules-per-
 * domain (robots bodies are KB-scale by convention), so the apply is
 * a broadcast equi-join on domain with a per-pair prefix test — the
 * page side never shuffles. The parse is one fold over each body's
 * line array (a codegen'd `aggregate` HOF — no UDF), section state
 * carried through the fold exactly as a sequential robots parser
 * would: a `User-agent:` line opens a section, rules bind to the
 * most recent section, and only the requested agent's (or `*`)
 * sections contribute. Deliberately simplified vs RFC 9309: no
 * Allow-precedence or wildcard-in-path matching — Disallow prefixes
 * only, the subset both engines can replay as a pure projection.
 *
 * The reference has no crawl handling (it posts generated series,
 * src/main.py:959-975) — training-data-pipeline extension surface.
 */
object Robots {

  /**
   * Parse robots bodies into `(domain, prefix)` Disallow rules for the
   * given agent (plus `*` sections). One row per rule; empty
   * `Disallow:` lines (allow-all markers) and comments drop out.
   */
  def parseRules(robots: DataFrame, agent: String = "*",
      domainCol: String = "domain", contentCol: String = "content"): DataFrame = {
    val lines = split(col(contentCol), "\r?\n")
    // Fold state: act = does the current section govern our agent,
    // ua = was the previous line a User-agent line (RFC 9309 groups:
    // consecutive User-agent lines share one rule group, so a stacked
    // line ORs into the group's membership instead of replacing it).
    val folded = aggregate(
      lines,
      struct(lit(false).as("act"), lit(false).as("ua"),
        array().cast("array<string>").as("acc")),
      (st, raw) => {
        val ln = trim(regexp_replace(raw, "#.*", ""))
        val isUa = lower(ln).startsWith("user-agent:")
        val uaVal = trim(ln.substr(lit("user-agent:".length + 1), length(ln)))
        val uaMatch = uaVal === agent || uaVal === "*"
        val isDis = lower(ln).startsWith("disallow:")
        val disVal = trim(ln.substr(lit("disallow:".length + 1), length(ln)))
        when(isUa,
          struct((st("ua") && st("act") || uaMatch).as("act"),
            lit(true).as("ua"), st("acc").as("acc")))
          .when(isDis && st("act") && disVal =!= "",
            struct(st("act").as("act"), lit(false).as("ua"),
              array_append(st("acc"), disVal).as("acc")))
          .otherwise(struct(st("act").as("act"), lit(false).as("ua"),
            st("acc").as("acc")))
      },
      st => st("acc"))
    robots
      .select(col(domainCol).as("domain"), explode(folded).as("prefix"))
  }

  /**
   * Per-domain `Crawl-delay` (seconds) for the given agent — the same
   * section fold as [[parseRules]], capturing the FIRST delay seen in
   * a governing section (conservative: later sections cannot relax
   * it). Domains whose body names no delay are absent; callers
   * coalesce to their default politeness.
   */
  def parseCrawlDelay(robots: DataFrame, agent: String = "*",
      domainCol: String = "domain", contentCol: String = "content"): DataFrame = {
    val lines = split(col(contentCol), "\r?\n")
    val folded = aggregate(
      lines,
      struct(lit(false).as("act"), lit(false).as("ua"),
        lit(null).cast("long").as("delay")),
      (st, raw) => {
        val ln = trim(regexp_replace(raw, "#.*", ""))
        val isUa = lower(ln).startsWith("user-agent:")
        val uaVal = trim(ln.substr(lit("user-agent:".length + 1), length(ln)))
        val uaMatch = uaVal === agent || uaVal === "*"
        val isDelay = lower(ln).startsWith("crawl-delay:")
        val delayVal = nullif(trim(
          ln.substr(lit("crawl-delay:".length + 1), length(ln))), lit(""))
          .cast("long")
        when(isUa,
          struct((st("ua") && st("act") || uaMatch).as("act"),
            lit(true).as("ua"), st("delay").as("delay")))
          .when(isDelay && st("act") && st("delay").isNull,
            struct(st("act").as("act"), lit(false).as("ua"),
              delayVal.as("delay")))
          .otherwise(struct(st("act").as("act"), lit(false).as("ua"),
            st("delay").as("delay")))
      },
      st => st("delay"))
    robots
      .select(col(domainCol).as("domain"), folded.as("crawl_delay_s"))
      .where(col("crawl_delay_s").isNotNull)
  }

  /**
   * Politeness scheduler: assign each frontier URL a fetch offset on
   * its host's timeline — `fetch_at_s = slot * crawl_delay_s` where
   * the slot is the URL's rank within its host (deterministic order
   * by the canonical URL). Host-PARTITIONED window (never a global
   * sort) + a broadcast join against the bounded delay table;
   * `defaultDelayS` covers hosts with no declared delay.
   */
  def schedule(frontier: DataFrame, delays: DataFrame,
      defaultDelayS: Long = 1L, domainCol: String = "domain",
      urlCol: String = "url_norm"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val slot = row_number()
      .over(Window.partitionBy(col(domainCol)).orderBy(col(urlCol))) - 1
    frontier
      .join(broadcast(delays.withColumnRenamed("domain", "__dd")),
        col(domainCol) === col("__dd"), "left")
      .withColumn("fetch_at_s",
        slot.cast("long") *
          coalesce(col("crawl_delay_s"), lit(defaultDelayS)))
      .drop("__dd", "crawl_delay_s")
  }

  /** [[parseRules]] output folded to ONE row per domain with its
    * prefix array — the bounded shape the apply broadcasts (and the
    * static side of a streaming page gate). */
  def rulesByDomain(rules: DataFrame): DataFrame =
    rules.groupBy("domain")
      .agg(array_sort(collect_list("prefix")).as("__prefixes"))

  /**
   * Apply parsed rules to a page frame carrying `(domain, path)`:
   * adds `blocked` and the first (shortest, then lexical) matching
   * prefix as `rule` — deterministic even when several rules match.
   * One broadcast equi-join on domain against the ≤1-row-per-domain
   * array table, then a stateless `exists`/`array_min` projection —
   * the page side never shuffles, so the same graph gates a
   * `readStream` of arriving pages unchanged (stream-static join,
   * zero state).
   */
  def applyRules(pages: DataFrame, rules: DataFrame,
      domainCol: String = "domain", pathCol: String = "path"): DataFrame = {
    val byDomain = rulesByDomain(rules)
      .withColumnRenamed("domain", "__rd")
    val hits = filter(col("__prefixes"),
      p => col(pathCol).startsWith(p))
    pages
      .join(broadcast(byDomain), col(domainCol) === col("__rd"), "left")
      .withColumn("blocked", coalesce(exists(col("__prefixes"),
        p => col(pathCol).startsWith(p)), lit(false)))
      .withColumn("rule", array_min(transform(hits,
        p => struct(length(p).as("l"), p.as("p"))))("p"))
      .drop("__rd", "__prefixes")
  }
}
