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
 * Pure nested `regexp_replace`/`regexp_extract_all` Column functions
 * — codegen'd, no UDF, and every pattern is RE2-compatible (lazy
 * quantifiers and `(?is)` flags only; NO backreferences — script and
 * style blocks get separate patterns for exactly this reason), so a
 * DuckDB oracle can state the same pipeline. Deliberately NOT
 * attempted: malformed-markup recovery, CDATA, numeric entity ranges,
 * or block-level layout (newline placement) — scope is the
 * deterministic text-recovery subset.
 *
 * The reference has no HTML handling (src/main.py generates plain
 * wordlist text) — training-data-pipeline extension surface.
 */
object Html {

  /** Entity decode order: named entities first, `&amp;` LAST so
    * double-escaped input (`&amp;lt;`) decodes one level per pass,
    * never two. */
  private[graft] val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&amp;" -> "&")

  /** Plain text of an HTML fragment, per the pipeline above. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (e, ch)) =>
      regexp_replace(c, e, ch)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** All `href="…"` targets of a fragment, in document order. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href=\"([^\"]*)\""), lit(1))
}
