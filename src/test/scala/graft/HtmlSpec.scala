package graft

import org.apache.spark.sql.functions._
import graft.ext.Html

/** HTML extraction specs: each removal rule against its decoy, entity
  * decode order, whitespace collapse, and href extraction order. */
class HtmlSpec extends SparkSpec {

  import spark.implicits._

  private def textOf(html: String): String =
    Seq(html).toDF("h").select(Html.htmlToText(col("h"))).as[String].head()

  private def linksOf(html: String): Seq[String] =
    Seq(html).toDF("h").select(Html.extractLinks(col("h"))).as[Seq[String]].head()

  test("script and style bodies vanish, even with tags inside script strings") {
    textOf("""a<script>var s = "<p>fake</p>";</script>b""") shouldBe "a b"
    textOf("""a<SCRIPT type="x">x</SCRIPT>b<style>p{}</style>c""") shouldBe "a b c"
    // multi-line blocks ((?s) flag)
    textOf("a<script>\nline1\nline2\n</script>b") shouldBe "a b"
  }

  test("comments and tags strip; entities decode with &amp; last") {
    textOf("a<!-- <p>ghost</p> -->b") shouldBe "a b"
    textOf("<h1 class=\"x\">t</h1>") shouldBe "t"
    textOf("x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; y") shouldBe
      """x <tag> "q" 's' & y"""
    // double-escaped input decodes exactly ONE level — every direction:
    // amp-escaped named, amp-escaped numeric, NUMERIC-escaped named
    // (the phase-order case: &#38; decodes to '&' only after the named
    // pass has gone by, so the assembled &lt; stays literal)
    textOf("&amp;lt;") shouldBe "&lt;"
    textOf("&amp;#60;") shouldBe "&#60;"
    textOf("&#38;lt;") shouldBe "&lt;"
    textOf("&#38;gt; &#38;quot;") shouldBe "&gt; &quot;"
    // the ONE documented residual two-level case: &#38;amp; — phase
    // B's decoded '&' merges with the literal 'amp;' into '&amp;',
    // which the final amp pass then decodes (see Html.NonAmpEntities)
    textOf("&#38;amp;") shouldBe "&"
  }

  test("native decodeEntities ≡ the retained Column formulation on the edge corpus") {
    val edges = Seq(
      "", "plain text", "&", "&&", "&amp;", "&amp;amp;", "&amp;lt;",
      "&#38;lt;", "&#38;amp;", "&amp;#60;", "&lt;&gt;&quot;",
      "x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; y",
      "a&#8212;b &#x2019; &#X2019; &#65;&#x42;",
      "hi &#x1F600;! &#128512;",                       // astral pairs
      "&#0; &#55296; &#57343; &#1114111; &#1114112;",  // range edges
      "&#xD800; &#x10FFFF; &#x110000;",
      "&#65 &#; &#x; &# &#x",                          // malformed
      "&#12345678; &#x1234567;",                       // over the digit caps
      "&#0065; &#x0041;",                              // leading zeros
      "&#65;mid&#66;", "tail&#65;", "&#65;head",
      "&quot;&#34;&amp;#34;", "café 😀 already-decoded")
    val df = edges.toDF("s")
    val got = df.select(
      graft.ext.Html.decodeEntities(col("s")).as("native"),
      graft.ext.Html.decodeEntitiesColumn(col("s")).as("column"))
      .collect()
    got.foreach { r =>
      withClue(s"input row: $r") { r.getString(0) shouldBe r.getString(1) }
    }
  }

  test("numeric character references decode; out-of-range stays literal") {
    // decimal, hex (either case), BMP
    textOf("a&#8212;b") shouldBe "a—b"
    textOf("it&#8217;s &#x2019; &#X2019;") shouldBe
      "it’s ’ ’"
    textOf("&#65;&#x42;") shouldBe "AB"
    // astral codepoint assembles a surrogate pair
    textOf("hi &#x1F600;!") shouldBe "hi 😀!"
    textOf("&#128512;") shouldBe "😀"
    // a decoded '<' is TEXT, not a tag (tags strip before decode)
    textOf("&#60;script&#62;x&#60;/script&#62;") shouldBe "<script>x</script>"
    // forbidden ranges stay literal: NUL, surrogates, beyond U+10FFFF
    textOf("&#0; &#55296; &#1114112; &#xD800;") shouldBe
      "&#0; &#55296; &#1114112; &#xD800;"
    // not numeric refs at all: missing ';', empty, malformed
    textOf("&#65 &#; &#x;") shouldBe "&#65 &#; &#x;"
    // a ref at each boundary of the string
    textOf("&#65;mid&#66;") shouldBe "AmidB"
  }

  test("whitespace collapses and trims") {
    textOf("  a \n\n b\t c  ") shouldBe "a b c"
    textOf("<p></p>") shouldBe ""
  }

  test("extractLinks returns href targets in document order, case-insensitive attr") {
    linksOf("""<a HREF="u1">x</a><link href="u2"><a href="">e</a>""") shouldBe
      Seq("u1", "u2", "")
    linksOf("no links here") shouldBe Seq.empty
  }

  private def resolve(base: String, href: String): String =
    Seq((base, href)).toDF("b", "h")
      .select(Html.resolveHref(col("b"), col("h"))).as[String].head()

  test("resolveHref: RFC 3986 merge — all reference forms") {
    val base = "https://www.ex.com:443/a/b/c?q=1#f"
    // absolute and non-hierarchical pass through
    resolve(base, "HTTP://other.org/x") shouldBe "HTTP://other.org/x"
    resolve(base, "mailto:e@x.com") shouldBe "mailto:e@x.com"
    // protocol-relative adopts the base scheme (case preserved)
    resolve(base, "//cdn.ex.com/i.js") shouldBe "https://cdn.ex.com/i.js"
    resolve("HTTP://h/p", "//x/y") shouldBe "HTTP://x/y"
    // rooted adopts scheme+authority (port intact — normalize later);
    // dot segments in a ROOTED ref resolve too (§5.2.2 — the JDK
    // skips this, see the URI-pin test's exclusions)
    resolve(base, "/rooted/x") shouldBe "https://www.ex.com:443/rooted/x"
    resolve(base, "/r/./s/../t") shouldBe "https://www.ex.com:443/r/t"
    // RFC 3986 §5.3: '?' replaces query+fragment, '#' replaces only
    // the fragment (base query survives), '' drops only the fragment
    resolve(base, "?page=2") shouldBe "https://www.ex.com:443/a/b/c?page=2"
    resolve(base, "#top") shouldBe "https://www.ex.com:443/a/b/c?q=1#top"
    resolve(base, "") shouldBe "https://www.ex.com:443/a/b/c?q=1"
    // relative merges onto the base DIRECTORY (up to the last /)
    resolve(base, "d") shouldBe "https://www.ex.com:443/a/b/d"
    resolve("https://h/a/b/", "d") shouldBe "https://h/a/b/d"
    resolve("https://h", "d") shouldBe "https://h/d" // empty base path
    // dot segments resolve; .. never climbs past the root
    resolve(base, "../x") shouldBe "https://www.ex.com:443/a/x"
    resolve(base, "./x/./y") shouldBe "https://www.ex.com:443/a/b/x/y"
    resolve(base, "../../../../x") shouldBe "https://www.ex.com:443/x"
    resolve(base, "..") shouldBe "https://www.ex.com:443/a/"
    // a ref's own query survives resolution
    resolve(base, "../x?v=2") shouldBe "https://www.ex.com:443/a/x?v=2"
    // dot segments in an ABSOLUTE ref resolve too
    resolve(base, "https://h/a/../b") shouldBe "https://h/b"
  }

  test("resolveHref: native kernel ≡ the retained Column formulation on a base×ref matrix") {
    val bases = Seq(
      "https://www.ex.com:443/a/b/c?q=1#f", "HTTP://h/p", "https://h",
      "https://h/", "https://h/a/b/", "ex.com/no-scheme", "",
      "mailto:e@x.com", "a:///x")
    val hrefs = Seq(
      "", "d", "./x", "../x", "../../../../x", "..", ".", "/rooted",
      "//cdn.ex.com/i.js", "HTTP://other.org/x", "mailto:e@x.com",
      "?page=2", "#top", "../x?v=2&w=3#f", "a:b", "a/b/../c/./d",
      "//x", "/", "x//y")
    // null rows: both formulations null-propagate (a null base with a
    // scheme'd href is the case a non-guarded Column version would
    // pass through)
    val nullRows = Seq(
      (null: String, "HTTP://other.org/x"), (null: String, "d"),
      ("https://h/a", null: String), (null: String, null: String))
    val df = ((for (b <- bases; h <- hrefs) yield (b, h)) ++ nullRows)
      .toDF("b", "h")
    val got = df.select(
      Html.resolveHref(col("b"), col("h")).as("native"),
      Html.resolveHrefColumn(col("b"), col("h")).as("column"),
      col("b"), col("h")).collect()
    got.foreach { r =>
      withClue(s"base=${r.getString(2)} href=${r.getString(3)}: ") {
        r.getString(0) shouldBe r.getString(1)
        if (r.isNullAt(2) || r.isNullAt(3)) r.isNullAt(0) shouldBe true
      }
    }
  }

  test("resolveHref ≡ java.net.URI.resolve (the JDK's RFC 3986 §5.2) on hierarchical http refs") {
    // Independent reference model: the JDK implements the same RFC.
    // Exclusions, all DOCUMENTED JDK deviations from the RFC (where
    // this engine follows the RFC): the empty ref (URI.resolve("")
    // returns the base WITH its fragment; §5.3 drops it),
    // over-popping ../ chains (URI.normalize leaves leading "../"
    // where §5.2.4 removes them — so refs here pop at most the
    // base's depth), dot segments inside ROOTED refs (JDK skips
    // remove_dot_segments for absolute-path refs; §5.2.2 applies it —
    // the engine's "/r/./s/../t" → "/r/t" is pinned in the RFC-merge
    // test above instead), and query-only refs (JDK resolves "?q=2"
    // per the superseded RFC 2396 — merges onto the base DIRECTORY,
    // dropping the last segment — where §5.3 keeps the base path
    // whole; the engine's behavior is pinned above).
    val bases = Seq(
      "https://h/a/b/c", "https://h/a/b/", "https://h/", "https://h/a",
      "https://www.ex.com:8080/x/y?q=1", "https://h/a/b/c?q=1#f",
      "http://h/a%20b/c")
    val refs = Seq(
      "d", "./d", "../d", "d/e", "./d/../e", "/rooted", "/r/s/t",
      "//h2/p", "https://abs.org/p?x=1#y", "#frag", "a:b",
      "d?x=1#y", ".", "..")
    val rows = for {
      b <- bases; r <- refs
      // skip pops past the root for the URI comparison (JDK deviation)
      depth = b.drop("https://".length).count(_ == '/')
      if r.split("/").count(_ == "..") < depth
    } yield (b, r, new java.net.URI(b).resolve(r).toString)
    val got = rows.toDF("b", "h", "jdk")
      .select(Html.resolveHref(col("b"), col("h")).as("ours"),
        col("jdk"), col("b"), col("h")).collect()
    got.foreach { r =>
      withClue(s"base=${r.getString(2)} ref=${r.getString(3)}: ") {
        r.getString(0) shouldBe r.getString(1)
      }
    }
    rows.size should be > 80 // the matrix actually covered something
  }

  test("removeDotSegments: native kernel ≡ the retained Column fold") {
    val paths = Seq("/", "/a", "/a/", "/a/./b", "/a/../b", "/a/b/..",
      "/a/b/.", "/..", "/.", "/../../a", "/a//b/../c", "/a/b/c/../../d",
      "/.hidden/..a/a..", "/a/.../b")
    val df = paths.toDF("p")
    val got = df.select(
      graft.plans.NativeFunctions.removeDotSegments(col("p")).as("native"),
      Html.removeDotSegmentsColumn(col("p")).as("column")).collect()
    got.foreach { r =>
      withClue(s"row: $r") { r.getString(0) shouldBe r.getString(1) }
    }
    // spot-pin the RFC examples
    resolve("https://h/a/b/c", "../../../x") shouldBe "https://h/x"
  }

  test("metaRobots parses directives; extractLinksDetailed carries nofollow") {
    def mr(html: String): (Boolean, Boolean) = {
      val r = Seq(html).toDF("h")
        .select(Html.metaRobots(col("h")).as("m"))
        .select(col("m")("noindex"), col("m")("nofollow"))
        .as[(Boolean, Boolean)].head()
      r
    }
    mr("""<meta name="robots" content="noindex, nofollow">""") shouldBe
      (true, true)
    mr("""<META name="robots" content="NOINDEX">""") shouldBe (true, false)
    mr("""<meta name="robots" content="none">""") shouldBe (true, true)
    mr("""<meta name="robots" content="index, follow">""") shouldBe
      (false, false)
    // token match, not substring: 'nofollowing' is not a directive
    mr("""<meta name="robots" content="nofollowing">""") shouldBe
      (false, false)
    mr("no meta at all") shouldBe (false, false)
    // two tags OR together
    mr("""<meta name="robots" content="noindex"><meta name="robots" content="nofollow">""") shouldBe
      (true, true)

    val links = Seq(
      """<a href="u1">x</a><a href="u2" rel="nofollow">y</a>""" +
        """<link rel="nofollow" href="u3"><a rel="x">no href</a>""")
      .toDF("h")
      .select(explode(Html.extractLinksDetailed(col("h"))).as("l"))
      .select(col("l")("href"), col("l")("nofollow"))
      .as[(String, Boolean)].collect().toSeq
    links shouldBe Seq(("u1", false), ("u2", true), ("u3", true))
  }

  test("extractAnchors: inner text cleans (tags, entities, whitespace); empties and no-href skip") {
    val html = "<a href=\"/a\"><b>Bold</b>  link &amp; more</a>" +
      "<a href=\"/b\" rel=\"nofollow\">no follow</a>" +
      "<a href=\"/c\"><img src=\"x.png\"/></a>" + // image-only → empty anchor
      "<a name=\"no-href\">skipped entirely</a>" +
      "<A HREF=\"/d\">caps &#8217; quote</A>"
    val got = Seq(Tuple1(html)).toDF("h")
      .select(explode(Html.extractAnchors(col("h"))).as("a"))
      .select("a.href", "a.anchor", "a.nofollow")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    got.toSeq shouldBe Seq(
      ("/a", "Bold link & more", false),
      ("/b", "no follow", true),
      ("/c", "", false),
      ("/d", "caps ’ quote", false))
  }

  test("baseHref and canonicalUrl extract (first wins), null when absent") {
    def one(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        html: String): Option[String] =
      Seq(html).toDF("h").select(c(col("h"))).as[Option[String]].head()
    one(Html.baseHref, """<head><BASE href="/v2/"><base href="/v3/"></head>""") shouldBe
      Some("/v2/")
    one(Html.baseHref, "<p>no base</p>") shouldBe None
    one(Html.canonicalUrl,
      """<link rel="canonical" href="https://ex.com/a"><link rel="canonical" href="/b">""") shouldBe
      Some("https://ex.com/a")
    one(Html.canonicalUrl, """<link rel="stylesheet" href="s.css">""") shouldBe
      None
    // the <base> tag's href must NOT appear in the link list
    Seq("""<base href="/v2/"><a href="x">l</a>""").toDF("h")
      .select(explode(Html.extractLinksDetailed(col("h"))).as("l"))
      .select(col("l")("href")).as[String].collect().toSeq shouldBe Seq("x")
  }
}
