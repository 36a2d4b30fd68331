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
    // double-escaped input decodes exactly ONE level
    textOf("&amp;lt;") shouldBe "&lt;"
    textOf("&amp;#60;") shouldBe "&#60;"
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
}
