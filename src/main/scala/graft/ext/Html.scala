package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * HTML content extraction — the conversion step between a raw crawl
 * response and WET-style plain text (what trafilatura/jusText do in
 * production pipelines, reduced to the deterministic core both
 * engines replay): drop script/style blocks and comments, strip
 * tags, decode the five predefined character entities, collapse
 * whitespace. Plus `href` link extraction — the op that turns a
 * fetched page into crawl-frontier candidates.
 *
 * Tag stripping is nested `regexp_replace` Column functions —
 * codegen'd, no UDF, and every pattern is RE2-compatible (lazy
 * quantifiers and `(?is)` flags only; NO backreferences — script and
 * style blocks get separate patterns for exactly this reason), so a
 * DuckDB oracle can state the same pipeline (numeric-entity rows use
 * the construct-the-expected-output oracle style, since no SQL
 * regexp can map codepoints). Entity decode runs as ONE native
 * codegen'd kernel call ([[decodeEntities]]) with the pure-Column
 * formulation retained and equality-pinned
 * ([[decodeEntitiesColumn]]). Deliberately NOT attempted:
 * malformed-markup recovery, CDATA, or block-level layout (newline
 * placement) — scope is the deterministic text-recovery subset.
 *
 * The reference has no HTML handling (src/main.py generates plain
 * wordlist text) — training-data-pipeline extension surface.
 */
object Html {

  /** Entity decode order — one decode level per pass: the non-amp
    * named entities FIRST (phase A, on raw input), numeric references
    * next (phase B), `&amp;` LAST (phase C). A-before-B protects
    * `&#38;lt;` (numeric decode yields `&lt;`, which phase A has
    * already passed over → stays literal); C-last protects
    * `&amp;lt;` and `&amp;#60;` (the decoded `&` lands next to text
    * neither earlier phase rescans). The ONE residual two-level case
    * is `&#38;amp;`: phase B's decoded `&` merges with the trailing
    * literal `amp;` into `&amp;`, which phase C then decodes —
    * an input only an adversarial double-escaper produces; documented
    * (and spec-pinned) rather than special-cased so the Column and
    * native formulations stay in lockstep. */
  private[graft] val NonAmpEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"")

  /** One character (or surrogate pair) for a Unicode codepoint, as
    * pure Column math: codepoint → UTF-16BE code units → hex →
    * `unhex`/`decode`. BMP codepoints are two bytes; astral ones
    * assemble the high/low surrogate pair. Caller guarantees
    * 1..0x10FFFF excluding the surrogate block. */
  private def cpToChar(cp: Column): Column = {
    val bmp = decode(unhex(lpad(hex(cp), 4, "0")), "UTF-16BE")
    val off = cp - lit(0x10000L)
    val hi = lit(0xD800L) + floor(off / 1024)
    val lo = lit(0xDC00L) + pmod(off, lit(1024L))
    val astral = decode(unhex(concat(
      lpad(hex(hi), 4, "0"), lpad(hex(lo), 4, "0"))), "UTF-16BE")
    when(cp < 0x10000L, bmp).otherwise(astral)
  }

  /** Numeric character reference (`&#8217;` decimal / `&#x2019;`
    * hex), capped at 7 decimal / 6 hex digits so the codepoint math
    * never overflows. */
  private[graft] val NumRef = "&#([0-9]{1,7}|[xX][0-9a-fA-F]{1,6});"

  /**
   * Decode HTML numeric character references — the single most common
   * real-web entity class (`&#8217;` curly quotes etc. pollute tokens
   * downstream if left literal). Split on the reference pattern, map
   * each captured codepoint through [[cpToChar]], and interleave the
   * segments back. Out-of-range or forbidden codepoints (0, beyond
   * U+10FFFF, the surrogate block) stay literal text, per the
   * bounded-range contract. The `transform`/`zip_with` HOFs here are
   * INTERPRETED per element — this is the spec/oracle-replay
   * formulation; the hot path is the fused native kernel
   * ([[decodeEntities]]).
   */
  def decodeNumericRefs(s: Column): Column = {
    val refs = regexp_extract_all(s, lit(NumRef), lit(1))
    val segs = split(s, NumRef)
    val decoded = transform(refs, r => {
      val isHex = lower(r.substr(lit(1), lit(1))) === "x"
      val cp = when(isHex, conv(r.substr(lit(2), length(r)), 16, 10)
          .cast("long"))
        .otherwise(r.cast("long"))
      val valid = cp > 0L && cp <= 0x10FFFFL &&
        !(cp >= 0xD800L && cp <= 0xDFFFL)
      when(valid, cpToChar(cp)).otherwise(concat(lit("&#"), r, lit(";")))
    })
    concat(element_at(segs, 1),
      array_join(zip_with(decoded,
        slice(segs, lit(2), greatest(size(segs) - 1, lit(0))),
        (d, seg) => concat(d, seg)), ""))
  }

  /**
   * Full entity decode as pure Column functions — phases A/B/C in the
   * [[NonAmpEntities]] order. RETAINED next to the native kernel (the
   * hot path, [[decodeEntities]]) for two reasons: the DuckDB oracle
   * replays THIS formulation, and HtmlSpec pins the two bit-identical
   * on the edge corpus (astral pairs, forbidden ranges, every
   * double-escape direction).
   */
  def decodeEntitiesColumn(s: Column): Column = {
    val named = NonAmpEntities.foldLeft(s) { case (c, (e, ch)) =>
      regexp_replace(c, e, ch)
    }
    regexp_replace(decodeNumericRefs(named), "&amp;", "&")
  }

  /** Full entity decode — the native single-call kernel
    * ([[graft.plans.Native.decodeEntities]]): same A/B/C semantics as
    * [[decodeEntitiesColumn]], one codegen'd projection instead of an
    * interpreted per-reference `transform`/`zip_with` chain. */
  def decodeEntities(s: Column): Column =
    graft.plans.NativeFunctions.decodeEntities(s)

  /** Plain text of an HTML fragment, per the pipeline above. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** All `href="…"` targets of a fragment, in document order. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href=\"([^\"]*)\""), lit(1))

  /**
   * Each href-bearing `<a …>` / `<link …>` tag of a fragment as
   * `struct(href, nofollow)` in document order — the frontier's
   * compliance-aware link extraction: `rel="nofollow"` is the in-page
   * half of the politeness contract (the page asks crawlers not to
   * follow that edge), honored next to the robots.txt gate. Per-tag
   * `transform` over the bounded tag list of one page (real pages
   * carry tens of links, not thousands — not a corpus-scaled inner
   * loop).
   */
  def extractLinksDetailed(html: Column): Column = {
    val tags = filter(
      regexp_extract_all(html, lit("(?i)<(?:a|link)\\b[^>]*>"), lit(0)),
      t => regexp_like(t, lit("(?i)href=\"")))
    transform(tags, t => struct(
      regexp_extract(t, "(?i)href=\"([^\"]*)\"", 1).as("href"),
      regexp_like(t, lit("(?i)rel=\"[^\"]*nofollow[^\"]*\"")).as("nofollow")))
  }

  /**
   * Each `<a …>inner</a>` element as `struct(href, anchor, nofollow)`
   * in document order — [[extractLinksDetailed]] plus the ANCHOR
   * TEXT, the standard training-data/retrieval signal the detailed
   * extraction drops (aggregated anchor text per target is how a
   * corpus describes pages it links to). `anchor` is the element's
   * inner markup reduced by the deterministic text-recovery subset:
   * tags stripped, entities decoded (one native kernel call),
   * whitespace collapsed — an image-only or empty element yields
   * `""` (callers drop empties). Elements without an `href` are
   * skipped. Per-element `transform` over the bounded tag list of
   * one page, the [[extractLinksDetailed]] posture.
   */
  def extractAnchors(html: Column): Column = {
    val els = filter(
      regexp_extract_all(html, lit("(?is)<a\\b[^>]*>.*?</a>"), lit(0)),
      e => regexp_like(e, lit("(?i)href=\"")))
    transform(els, e => struct(
      regexp_extract(e, "(?i)href=\"([^\"]*)\"", 1).as("href"),
      trim(regexp_replace(decodeEntities(regexp_replace(
        regexp_extract(e, "(?is)<a\\b[^>]*>(.*?)</a>", 1),
        "(?s)<[^>]*>", " ")), "\\s+", " ")).as("anchor"),
      regexp_like(e, lit("(?i)rel=\"[^\"]*nofollow[^\"]*\"")).as("nofollow")))
  }

  /**
   * Page-level robots directives from `<meta name="robots"
   * content="…">`: `struct(noindex, nofollow)` — `noindex` means the
   * page must not enter the kept corpus, `nofollow` means none of its
   * links enter the frontier; the `none` token implies both. Multiple
   * meta tags OR together (the conservative reading). Attribute order
   * is the canonical name-then-content form — the deterministic
   * subset both engines replay, same scope contract as the rest of
   * the module (no malformed-markup recovery).
   */
  def metaRobots(html: Column): Column = {
    val contents = regexp_extract_all(html,
      lit("(?i)<meta\\s+name=\"robots\"\\s+content=\"([^\"]*)\""), lit(1))
    def has(tok: String): Column = exists(contents, c =>
      regexp_like(lower(c), lit("(^|[ ,])(" + tok + "|none)([ ,]|$)")))
    struct(has("noindex").as("noindex"), has("nofollow").as("nofollow"))
  }

  /** First `<base href="…">` of the page — the HTML-spec document
    * base that overrides the page URL for relative-link resolution
    * (first one wins per WHATWG HTML §4.2.3); null when absent. May
    * itself be relative: resolve it against the page URL first —
    * `resolveHref(pageUrl, coalesce(baseHref(h), lit("")))` yields
    * the effective base either way, since an empty ref resolves to
    * the base itself. Canonical attr order, the [[metaRobots]]
    * deterministic-subset contract. */
  def baseHref(html: Column): Column =
    nullif(regexp_extract(html, "(?i)<base\\s+href=\"([^\"]*)\"", 1), lit(""))

  /** `<link rel="canonical" href="…">` target — the page's own
    * declaration of its canonical URL (the strongest in-page dedup
    * signal a crawl corpus carries: URL variants of one document all
    * point at the same canonical); null when absent, first wins. May
    * be relative — resolve against the page base before use.
    * Canonical attr order, the [[metaRobots]] contract. */
  def canonicalUrl(html: Column): Column =
    nullif(regexp_extract(html,
      "(?i)<link\\s+rel=\"canonical\"\\s+href=\"([^\"]*)\"", 1), lit(""))

  /** RFC 3986 §5.2.4 remove_dot_segments as a pure Column fold —
    * RETAINED next to the native kernel (the hot path inside
    * [[resolveHref]]) for the HtmlSpec equality pin, the
    * [[decodeEntitiesColumn]] pattern. Rooted paths only (the shape
    * [[resolveHref]] feeds it): `.` drops, `..` pops but never past
    * the root marker, a trailing `.`/`..` keeps the directory form. */
  private[graft] def removeDotSegmentsColumn(path: Column): Column = {
    val segs = split(path, "/")
    val folded = aggregate(segs,
      array().cast("array<string>"),
      (st, seg) =>
        when(seg === ".", st)
          .when(seg === "..",
            when(size(st) > 1, slice(st, lit(1), size(st) - 1)).otherwise(st))
          .otherwise(array_append(st, seg)),
      st => array_join(st, "/"))
    val lastSeg = element_at(segs, -1)
    when(lastSeg === "." || lastSeg === "..", concat(folded, lit("/")))
      .otherwise(folded)
  }

  /**
   * Resolve an `href` against its page's base URL — RFC 3986 §5.2
   * reduced to the hierarchical-http subset a frontier needs (real
   * pages are overwhelmingly RELATIVE links; a frontier that only
   * accepts absolute hrefs silently drops most of the web):
   *
   *  - a ref with a scheme (`https://…`, `mailto:…`) passes through;
   *  - `//authority/path` (protocol-relative) adopts the base scheme;
   *  - `/rooted` adopts the base scheme+authority;
   *  - `?query` replaces the base's query AND fragment; `#frag`
   *    replaces only the fragment (the base query survives); an
   *    empty ref is the base minus its fragment — all three exactly
   *    RFC 3986 §5.3 (pinned against `java.net.URI.resolve` in
   *    HtmlSpec);
   *  - anything else merges onto the base path's directory
   *    (`§5.2.3`: everything up to the last `/`; `/` when the base
   *    path is empty).
   *
   * Dot segments (`.`/`..`) are then removed from the resolved path
   * (`§5.2.4`); non-hierarchical results (no `scheme://authority`)
   * skip that step unchanged. Pure per-row projection — run BEFORE
   * `Dedup.normalizeUrl` (this resolves, that canonicalizes). ONE
   * native codegen'd call ([[graft.plans.Native.resolveHref]]) — the
   * frontier's per-link inner loop, where the Column formulation
   * re-evaluates its regexp subtrees per branch.
   */
  def resolveHref(base: Column, href: Column): Column =
    graft.plans.NativeFunctions.resolveHref(base, href)

  /** Pure-Column formulation of [[resolveHref]] — RETAINED for the
    * HtmlSpec equality pin over the base×ref matrix, the
    * [[decodeEntitiesColumn]] pattern. Null-propagating like the
    * native kernel (a null base or href yields null — without the
    * explicit guard a scheme'd href would pass through a null base,
    * silently breaking the pinned equivalence on nulls; null rows sit
    * in the HtmlSpec matrix). */
  private[graft] def resolveHrefColumn(base: Column, href: Column): Column =
    when(base.isNull || href.isNull, lit(null).cast("string"))
      .otherwise(resolveHrefColumnNotNull(base, href))

  private def resolveHrefColumnNotNull(base: Column, href: Column): Column = {
    val schemePat = "^[A-Za-z][A-Za-z0-9+.-]*:"
    val prefixPat = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
    val pathPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
    val baseScheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val basePrefix = regexp_extract(base, prefixPat, 1)
    val basePath = regexp_extract(base, pathPat, 1)
    val baseDir = when(basePath === "", lit("/"))
      .otherwise(regexp_replace(basePath, "[^/]*$", ""))
    // RFC 3986 §5.3: an empty ref keeps the base query but drops its
    // fragment; a `#` ref replaces only the fragment; a `?` ref
    // replaces both
    val baseNoFrag = regexp_replace(base, "#.*$", "")
    val baseNoQf = regexp_replace(base, "[?#].*$", "")
    val abs =
      when(regexp_like(href, lit(schemePat)), href)
        .when(href.startsWith("//"), concat(baseScheme, lit(":"), href))
        .when(href.startsWith("/"), concat(basePrefix, href))
        .when(href === "", baseNoFrag)
        .when(href.startsWith("?"), concat(baseNoQf, href))
        .when(href.startsWith("#"), concat(baseNoFrag, href))
        .otherwise(concat(basePrefix, baseDir, href))
    val absPrefix = regexp_extract(abs, prefixPat, 1)
    val absPath = regexp_extract(abs, pathPat, 1)
    val absQf = regexp_extract(abs, "([?#].*)$", 1)
    when(absPrefix === "" || absPath === "", abs)
      .otherwise(concat(absPrefix, removeDotSegmentsColumn(absPath), absQf))
  }
}
