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
 * DuckDB oracle can state the same pipeline (numeric-entity rows use
 * the construct-the-expected-output oracle style, since no SQL
 * regexp can map codepoints). Deliberately NOT attempted:
 * malformed-markup recovery, CDATA, or block-level layout (newline
 * placement) — scope is the deterministic text-recovery subset.
 *
 * The reference has no HTML handling (src/main.py generates plain
 * wordlist text) — training-data-pipeline extension surface.
 */
object Html {

  /** Entity decode order: named entities first, `&amp;` LAST so
    * double-escaped input (`&amp;lt;`) decodes one level per pass,
    * never two. (`&#39;` and every other numeric reference is
    * handled by [[decodeNumericRefs]], which runs before this fold —
    * so a fold-produced `&#NN;` from a double escape stays literal,
    * single-decode semantics.) */
  private[graft] val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&amp;" -> "&")

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
   * segments back (`zip_with` keeps it one codegen'd projection).
   * Out-of-range or forbidden codepoints (0, beyond U+10FFFF, the
   * surrogate block) stay literal text, per the bounded-range
   * contract.
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

  /** Plain text of an HTML fragment, per the pipeline above. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    // numeric refs first: a `&#NN;` the named fold later produces
    // (from `&amp;#NN;`) must stay literal — one decode level per pass
    val numDecoded = decodeNumericRefs(noTags)
    val decoded = Entities.foldLeft(numDecoded) { case (c, (e, ch)) =>
      regexp_replace(c, e, ch)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** All `href="…"` targets of a fragment, in document order. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href=\"([^\"]*)\""), lit(1))
}
