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
 * a broadcast equi-join on domain with a per-pair pattern test — the
 * page side never shuffles. The parse is one fold over each body's
 * line array (a codegen'd `aggregate` HOF — no UDF), section state
 * carried through the fold exactly as a sequential robots parser
 * would: a `User-agent:` line opens a section (product tokens are
 * case-insensitive per RFC 9309 §2.2.1), rules bind to the most
 * recent section, and only the requested agent's (or `*`) sections
 * contribute. Both `Allow` and `Disallow` rules are kept, with the
 * RFC's most-specific-match precedence applied at gate time:
 * longest pattern wins, `Allow` beats `Disallow` on ties, and rule
 * paths support `*` wildcards plus the `$` end anchor. Rule paths
 * are lowercased at parse time — a DELIBERATE deviation from RFC
 * 9309's case-sensitive path comparison: the apply contract is the
 * lowercased canonical path `Dedup.normalizeUrl` produces (the only
 * path shape this engine gates), so both sides of the match are
 * lowercase by construction. A caller passing RAW paths (`/Articles/x`)
 * would silently never match a body's `/Articles/` rule — normalize
 * first; the contract is stated on [[applyRules]] too.
 *
 * The reference has no crawl handling (it posts generated series,
 * src/main.py:959-975) — training-data-pipeline extension surface.
 */
object Robots {

  /**
   * Parse robots bodies into `(domain, pattern, allow)` rules for the
   * given agent (plus `*` sections) — `allow = false` for Disallow
   * lines, `true` for Allow. One row per rule; empty `Disallow:` /
   * `Allow:` lines (no-op markers per RFC 9309 §2.2.2) and comments
   * drop out. Patterns are lowercased (see the object contract).
   */
  def parseRules(robots: DataFrame, agent: String = "*",
      domainCol: String = "domain", contentCol: String = "content"): DataFrame = {
    val agentLc = agent.toLowerCase
    val lines = split(col(contentCol), "\r?\n")
    // Fold state: act = does the current section govern our agent,
    // ua = was the previous line a User-agent line (RFC 9309 groups:
    // consecutive User-agent lines share one rule group, so a stacked
    // line ORs into the group's membership instead of replacing it).
    val folded = aggregate(
      lines,
      struct(lit(false).as("act"), lit(false).as("ua"),
        array().cast("array<struct<p:string,a:boolean>>").as("acc")),
      (st, raw) => {
        val ln = trim(regexp_replace(raw, "#.*", ""))
        val low = lower(ln)
        val isUa = low.startsWith("user-agent:")
        val uaVal = lower(trim(ln.substr(lit("user-agent:".length + 1), length(ln))))
        val uaMatch = uaVal === agentLc || uaVal === "*"
        val isDis = low.startsWith("disallow:")
        val disVal = lower(trim(ln.substr(lit("disallow:".length + 1), length(ln))))
        val isAllow = low.startsWith("allow:")
        val allowVal = lower(trim(ln.substr(lit("allow:".length + 1), length(ln))))
        def keep(acc: Column) =
          struct(st("act").as("act"), lit(false).as("ua"), acc.as("acc"))
        when(isUa,
          struct((st("ua") && st("act") || uaMatch).as("act"),
            lit(true).as("ua"), st("acc").as("acc")))
          .when(isDis && st("act") && disVal =!= "",
            keep(array_append(st("acc"),
              struct(disVal.as("p"), lit(false).as("a")))))
          .when(isAllow && st("act") && allowVal =!= "",
            keep(array_append(st("acc"),
              struct(allowVal.as("p"), lit(true).as("a")))))
          .otherwise(keep(st("acc")))
      },
      st => st("acc"))
    robots
      .select(col(domainCol).as("domain"), explode(folded).as("r"))
      .select(col("domain"), col("r")("p").as("pattern"),
        col("r")("a").as("allow"))
  }

  /**
   * Per-domain `Crawl-delay` (seconds) for the given agent — the same
   * section fold as [[parseRules]], taking the MAX across governing
   * sections (genuinely conservative: a later section can only raise
   * the politeness floor, never relax it). The value is matched with
   * a digits-only full-line regexp, so a fractional or malformed
   * delay (`Crawl-delay: 0.5`, `Crawl-delay: fast`) parses to null —
   * never an ANSI CAST_INVALID_INPUT crash on untrusted input — and
   * the host falls back to the caller's default politeness. Domains
   * whose body names no (valid) delay are absent from the output.
   */
  def parseCrawlDelay(robots: DataFrame, agent: String = "*",
      domainCol: String = "domain", contentCol: String = "content"): DataFrame = {
    val agentLc = agent.toLowerCase
    val lines = split(col(contentCol), "\r?\n")
    val folded = aggregate(
      lines,
      struct(lit(false).as("act"), lit(false).as("ua"),
        lit(null).cast("long").as("delay")),
      (st, raw) => {
        val ln = trim(regexp_replace(raw, "#.*", ""))
        val low = lower(ln)
        val isUa = low.startsWith("user-agent:")
        val uaVal = lower(trim(ln.substr(lit("user-agent:".length + 1), length(ln))))
        val uaMatch = uaVal === agentLc || uaVal === "*"
        // digits-only FULL value match: '0.5' or 'fast' yields null,
        // not a partial '0' and never an ANSI cast error
        val delayVal = nullif(
          regexp_extract(low, "^crawl-delay:\\s*([0-9]+)\\s*$", 1), lit(""))
          .cast("long")
        when(isUa,
          struct((st("ua") && st("act") || uaMatch).as("act"),
            lit(true).as("ua"), st("delay").as("delay")))
          .when(low.startsWith("crawl-delay:") && st("act") &&
              delayVal.isNotNull,
            struct(st("act").as("act"), lit(false).as("ua"),
              greatest(st("delay"), delayVal).as("delay")))
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

  /**
   * Availability semantics (RFC 9309 §2.3.1) over [[applyRules]]: the
   * gate's verdict also depends on how the robots.txt FETCH itself
   * went — a 4xx ("unavailable") means the site has no robots file
   * and crawling is unrestricted (rules ignored, allow all); a 5xx /
   * network failure ("unreachable") means the crawler MUST assume
   * complete disallow. `status` carries one `(domain,
   * robots_status)` row per fetched host (bounded — broadcast like
   * the rules); hosts absent from it apply their parsed rules
   * normally (≡ 2xx). Blocked-by-unreachability rows carry the
   * sentinel rule `"unreachable"`; 4xx hosts carry a null rule.
   * ONLY 400–499 and 500–599 branch: any other status value (a 3xx
   * the caller didn't follow, a 1xx/2xx, or an out-of-range sentinel
   * like 0 or -1) falls through to apply-parsed-rules exactly like a
   * 2xx — a caller encoding network failure as a sentinel must map it
   * into 500–599 first (RFC 9309 gives non-2xx-non-4xx-non-5xx no
   * defined semantics; redirects are resolved at fetch time).
   */
  def applyWithAvailability(pages: DataFrame, rules: DataFrame,
      status: DataFrame, domainCol: String = "domain",
      pathCol: String = "path"): DataFrame = {
    val st = broadcast(status.select(col(domainCol).as("__sd"),
      col("robots_status").as("__st")))
    applyRules(pages, rules, domainCol, pathCol)
      .join(st, col(domainCol) === col("__sd"), "left")
      .withColumn("rule",
        when(col("__st").between(500, 599), lit("unreachable"))
          .when(col("__st").between(400, 499), lit(null).cast("string"))
          .otherwise(col("rule")))
      .withColumn("blocked",
        when(col("__st").between(500, 599), lit(true))
          .when(col("__st").between(400, 499), lit(false))
          .otherwise(col("blocked")))
      .drop("__sd", "__st")
  }

  /**
   * `Sitemap:` directives — the discovery channel robots.txt actually
   * provides (sitemaps.org protocol: a crawler learns a site's
   * sitemap URLs from its robots.txt). Unlike rules, Sitemap lines
   * are SECTION-INDEPENDENT (they apply regardless of the surrounding
   * User-agent group), so this is a plain line filter, no fold:
   * `(domain, sitemap_url)`, one row per directive in body order,
   * comments stripped, case-insensitive field name, value kept
   * verbatim (sitemap URLs are absolute per the protocol — the caller
   * canonicalizes). Domains announcing none are absent.
   */
  def sitemapDirectives(robots: DataFrame,
      domainCol: String = "domain", contentCol: String = "content"): DataFrame =
    robots
      .select(col(domainCol).as("domain"),
        explode(split(col(contentCol), "\r?\n")).as("ln"))
      .select(col("domain"),
        trim(regexp_extract(regexp_replace(col("ln"), "#.*", ""),
          "(?i)^\\s*sitemap:(.*)$", 1)).as("sitemap_url"))
      .where(col("sitemap_url") =!= "")

  /** [[parseRules]] output folded to ONE row per domain with its
    * rule array — the bounded shape the apply broadcasts (and the
    * static side of a streaming page gate). Each rule carries its
    * match machinery precompiled ON THE BOUNDED RULES SIDE: `w` says
    * whether the pattern needs regex matching (`*` wildcard or `$`
    * anchor) and `rx` is the RE2-safe anchored regex for it —
    * wildcard-free rules keep the cheap `startsWith` fast path. */
  def rulesByDomain(rules: DataFrame): DataFrame = {
    val p = col("pattern")
    val endsDollar = p.endsWith("$")
    val core = when(endsDollar, p.substr(lit(1), length(p) - 1)).otherwise(p)
    // escape every regex metacharacter except '*' (the robots
    // wildcard), then widen '*' to '.*' and re-anchor
    val esc = regexp_replace(core, "([.^$+?(){}\\[\\]|\\\\])", "\\\\$1")
    val rx = concat(lit("^"), regexp_replace(esc, "\\*", ".*"),
      when(endsDollar, lit("$")).otherwise(lit("")))
    rules
      .select(col("domain"),
        struct(p.as("p"), col("allow").as("a"),
          (p.contains("*") || endsDollar).as("w"), rx.as("rx")).as("r"))
      .groupBy("domain")
      .agg(array_sort(collect_list(col("r"))).as("__rules"))
  }

  /**
   * Apply parsed rules to a page frame carrying `(domain, path)` with
   * RFC 9309 §2.2.2 precedence: among matching rules the LONGEST
   * pattern wins, `Allow` beats `Disallow` on length ties (then
   * lexically-greatest pattern, for determinism). Adds `blocked` and
   * the winning pattern as `rule` (null when nothing matches — the
   * default is allow). Paths are REQUIRED lowercased (the
   * `normalizeUrl` canonical form; rule paths were lowercased at
   * parse — see the object contract: a raw mixed-case path silently
   * never matches). Wildcard/anchored rules match via `regexp_like`
   * with a per-rule non-foldable pattern: Spark's RLike caches only
   * the last compiled pattern, so a page iterating several wildcard
   * rules recompiles java.util.regex per element — acceptable while
   * wildcard rules stay rare (bench is flat; the startsWith fast
   * path covers the common case); if corpus-scale profiles ever show
   * it, the mitigation is a case-class broadcast of pre-compiled
   * Patterns in a mapPartitions gate. One broadcast equi-join on
   * domain against the
   * ≤1-row-per-domain array table, then a single stateless
   * filter/array_max projection pass — the page side never shuffles,
   * so the same graph gates a `readStream` of arriving pages
   * unchanged (stream-static join, zero state).
   */
  def applyRules(pages: DataFrame, rules: DataFrame,
      domainCol: String = "domain", pathCol: String = "path"): DataFrame = {
    val path = col(pathCol)
    val matched = filter(col("__rules"), r =>
      when(r("w"), regexp_like(path, r("rx")))
        .otherwise(path.startsWith(r("p"))))
    // most-specific-match: max of (pattern length, allow, pattern)
    val best = array_max(transform(matched,
      r => struct(length(r("p")).as("l"), r("a").cast("int").as("ai"),
        r("p").as("p"), r("a").as("a"))))
    pages
      .join(broadcast(rulesByDomain(rules).withColumnRenamed("domain", "__rd")),
        col(domainCol) === col("__rd"), "left")
      .withColumn("__best", best)
      .withColumn("blocked",
        coalesce(when(col("__best").isNotNull, !col("__best")("a")), lit(false)))
      .withColumn("rule", col("__best")("p"))
      .drop("__rd", "__rules", "__best")
  }
}
