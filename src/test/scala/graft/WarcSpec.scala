package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{length => slen}
import graft.ext.Warc

/**
 * WET-style record codec specs: render∘parse identity on adversarial
 * payloads, the Content-Length framing, multi-record file ordering,
 * and the documented resync behaviour when a payload contains the
 * version marker (truncated slice surfaces as intact = false — the
 * record is flagged, never silently corrupted).
 */
class WarcSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("url", concat(lit("https://ex.com/"), col("doc_id")))
      .withColumn("shard", pmod(col("doc_id"), lit(2)))

  test("render∘parse is an identity on tricky payloads") {
    val texts = Seq(
      0L -> "",                               // empty payload
      1L -> "plain words here",
      2L -> "embedded\r\nnewlines\r\n\r\nand a blank line", // HeaderSep inside payload
      3L -> "Content-Length: 9999 spoofed header text",     // header-lookalike payload
      4L -> "trailing spaces   ",
      5L -> "unicode — naïve café ☕")
    val parsed = Warc.parseRecords(Warc.renderFiles(corpus(texts: _*)))
      .orderBy("rec_id").collect()
    parsed.map(_.getAs[Long]("rec_id")).toSeq shouldBe texts.map(_._1)
    for ((r, (id, txt)) <- parsed.zip(texts)) {
      withClue(s"doc $id: ") {
        r.getAs[String]("payload") shouldBe txt
        r.getAs[String]("uri") shouldBe s"https://ex.com/$id"
        r.getAs[Long]("content_length") shouldBe txt.length.toLong
        r.getAs[Boolean]("intact") shouldBe true
      }
    }
  }

  test("files concatenate records in id order with stable framing") {
    val files = Warc.renderFiles(corpus(
      4L -> "dd", 0L -> "aa", 2L -> "cc", 1L -> "bb", 3L -> "x"))
      .orderBy("shard").collect()
    files.map(_.getAs[Long]("shard")).toSeq shouldBe Seq(0L, 1L)
    val even = files(0).getAs[String]("content")
    // Records appear sorted by id (0, 2, 4) regardless of input order.
    even.indexOf("urn:graft:0") should be < even.indexOf("urn:graft:2")
    even.indexOf("urn:graft:2") should be < even.indexOf("urn:graft:4")
    even should startWith(Warc.VersionLine)
    even should endWith("\r\n\r\n")
    // rec_pos reflects the in-file ordinal after the parse.
    val pos = Warc.parseRecords(Warc.renderFiles(corpus(
      4L -> "dd", 0L -> "aa", 2L -> "cc")))
      .where($"shard" === 0).orderBy("rec_pos")
      .select("rec_pos", "rec_id").as[(Int, Long)].collect().toSeq
    pos shouldBe Seq((0, 0L), (1, 2L), (2, 4L))
  }

  test("a version marker inside a payload resyncs and flags, never corrupts neighbours") {
    val poison = "evil " + Warc.VersionLine + "ghost payload"
    val parsed = Warc.parseRecords(Warc.renderFiles(corpus(
      0L -> "before", 2L -> poison, 4L -> "after")))
      .orderBy("rec_pos").collect()
    // The poisoned record splits early: its slice is shorter than the
    // declared Content-Length and is flagged non-intact.
    val bad = parsed.filter(_.getAs[Long]("rec_id") == 2L).head
    bad.getAs[Boolean]("intact") shouldBe false
    bad.getAs[String]("payload").length.toLong should be <
      bad.getAs[Long]("content_length")
    // Neighbouring records still parse exactly.
    val good = parsed.filter(r => Set(0L, 4L)(r.getAs[Long]("rec_id")))
    good.map(_.getAs[String]("payload")).toSet shouldBe Set("before", "after")
    good.foreach(_.getAs[Boolean]("intact") shouldBe true)
    // The ghost fragment (no parsable headers) carries a null rec_id —
    // an auditable orphan row, not a silent drop.
    parsed.count(_.isNullAt(parsed.head.fieldIndex("rec_id"))) shouldBe 1
  }

  test("http response layer: status/mime/body parse and the WET keep decision") {
    val docs = Seq(
      (0L, "kept body", "200 OK", "text/html; charset=UTF-8", true),
      (1L, "wrong mime", "200 OK", "application/pdf", false),
      (2L, "not found", "404 Not Found", "text/html", false),
      (3L, "", "200 OK", "text/plain", true)) // empty body still kept
    val framed = docs.map { case (id, body, st, ct, _) => (id, body, st, ct) }
      .toDF("doc_id", "text", "st", "ct")
      .withColumn("url", concat(lit("https://ex.com/"), col("doc_id")))
      .withColumn("shard", lit(0L))
      .withColumn("http", Warc.httpPayload(col("st"), col("ct"), col("text")))
    val out = Warc.parseHttp(Warc.parseRecords(
        Warc.renderFiles(framed, textCol = "http", warcType = "response")))
      .orderBy("rec_id").collect()
    out.map(_.getAs[String]("warc_type")).toSet shouldBe Set("response")
    for ((r, (id, body, st, ct, keep)) <- out.zip(docs)) {
      withClue(s"doc $id: ") {
        r.getAs[Int]("status_code") shouldBe st.take(3).toInt
        r.getAs[String]("mime") shouldBe ct.takeWhile(_ != ';')
        r.getAs[String]("body") shouldBe body
        r.getAs[Boolean]("kept") shouldBe keep
        r.getAs[Boolean]("intact") shouldBe true
      }
    }
    // A conversion record's payload is not an HTTP message: nulls + not kept.
    val conv = Warc.parseHttp(Warc.parseRecords(Warc.renderFiles(corpus(
      9L -> "plain wet payload")))).collect().head
    conv.getAs[String]("warc_type") shouldBe "conversion"
    conv.isNullAt(conv.fieldIndex("status_code")) shouldBe true
    conv.isNullAt(conv.fieldIndex("body")) shouldBe true
    conv.getAs[Boolean]("kept") shouldBe false
  }

  test("http status line: 1.0 / 1.1 / 2 / 2.0 all parse; 0.9-style and junk stay null") {
    // real crawls carry all three wire generations; a parse pinned to
    // 1.1 alone silently drops every HTTP/1.0 origin as "not HTTP"
    val cases = Seq(
      (0L, "HTTP/1.0 200 OK", true),
      (1L, "HTTP/1.1 200 OK", true),
      (2L, "HTTP/2 200", true),
      (3L, "HTTP/2.0 200", true), // some proxies still write 2.0
      (4L, "HTTP/9.9 200 OK", false), // unknown version
      (5L, "NOT-HTTP 200", false)) // 0.9-style: no status line
    val framed = cases.map { case (id, line, _) =>
      (id, line + "\r\nContent-Type: text/plain\r\n\r\nbody " + id)
    }.toDF("doc_id", "text")
      .withColumn("url", concat(lit("https://v.ex.com/"), col("doc_id")))
      .withColumn("shard", lit(0L))
    val got = Warc.parseHttp(Warc.parseRecords(
        Warc.renderFiles(framed, warcType = "response")))
      .orderBy("rec_id").select("rec_id", "status_code", "body", "kept")
      .collect()
    for ((r, (id, _, ok)) <- got.zip(cases)) {
      withClue(s"case $id: ") {
        if (ok) {
          r.getInt(1) shouldBe 200
          r.getString(2) shouldBe s"body $id"
          r.getBoolean(3) shouldBe true
        } else {
          r.isNullAt(1) shouldBe true
          r.getBoolean(3) shouldBe false
        }
      }
    }
  }

  test("http headers: any case, optional OWS after the colon; X-prefixed lookalikes never match") {
    // real servers emit content-type:/CONTENT-TYPE:/no-space-after-
    // colon in volume; a canonical-case single-space pin nulls them
    val cases = Seq(
      (0L, "HTTP/1.1 200 OK\r\ncontent-type:text/plain\r\n\r\nb0",
        "text/plain", null, true),
      (1L, "HTTP/1.1 200 OK\r\nCONTENT-TYPE:  TEXT/HTML; x=1\r\n\r\nb1",
        "TEXT/HTML", null, false), // mime keeps its case; kept wants text/
      (2L, "HTTP/1.0 301 Moved\r\nContent-Type: text/html\r\nlocation:\thttps://t.example.com/\r\n\r\nb2",
        "text/html", "https://t.example.com/", false),
      // a lookalike header must NOT satisfy the real lookups
      (3L, "HTTP/1.1 200 OK\r\nX-Content-Type: text/evil\r\nX-Location: https://evil.example.com/\r\n\r\nb3",
        null, null, false))
    val framed = cases.map { case (id, payload, _, _, _) => (id, payload) }
      .toDF("doc_id", "text")
      .withColumn("url", concat(lit("https://h.ex.com/"), col("doc_id")))
      .withColumn("shard", lit(0L))
    val got = Warc.parseHttp(Warc.parseRecords(
        Warc.renderFiles(framed, warcType = "response")))
      .orderBy("rec_id").select("rec_id", "mime", "location", "kept")
      .collect()
    for ((r, (id, _, mime, loc, keep)) <- got.zip(cases)) {
      withClue(s"case $id: ") {
        Option(r.getString(1)).orNull shouldBe mime
        Option(r.getString(2)).orNull shouldBe loc
        r.getBoolean(3) shouldBe keep
      }
    }
    // the coding headers share the helper: lowercase, no space
    val enc = Seq((9L,
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        "transfer-encoding:chunked\r\n\r\n2\r\nok\r\n0\r\n\r\n"))
      .toDF("doc_id", "text")
      .withColumn("url", lit("https://h.ex.com/9"))
      .withColumn("shard", lit(0L))
    val er = Warc.parseHttpEncoded(Warc.parseRecords(
        Warc.renderFiles(enc, warcType = "response"))).collect().head
    er.getAs[String]("transfer_encoding") shouldBe "chunked"
    er.getAs[Boolean]("body_ok") shouldBe true
    er.getAs[String]("body") shouldBe "ok"
  }

  test("charset-aware http layer: declared charsets decode, fallback is utf-8") {
    // bodies as BYTES in four encodings, framed through the latin-1
    // byte view (chars ≡ bytes, so character-mode framing is byte
    // framing)
    val accented = "naïve café résumé"      // latin-1-encodable
    val emoji = "dash — emoji 😀"           // multi-byte utf-8
    val gremlins = "“smart” — €99 café" // cp1252
    val docs = Seq(
      (0L, accented, "ISO-8859-1", "text/html; charset=ISO-8859-1"),
      (1L, emoji, "UTF-8", "text/html; charset=utf-8"),
      (2L, gremlins, "windows-1252", "text/html; charset=Windows-1252"),
      (3L, emoji, "UTF-8", "text/plain"), // no charset → utf-8 fallback
      (4L, accented, "ISO-8859-1", "text/html; charset=\"latin-1\""))
    // build each body's byte VIEW on the driver (Column encode takes
    // only a constant charset, and the dressing mixes three)
    val byRow = docs.map { case (id, text, enc, ct) =>
      val bytes = text.getBytes(java.nio.charset.Charset.forName(enc))
      val view = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      (id, view, ct)
    }.toDF("doc_id", "text", "ct")
      .withColumn("url", concat(lit("https://ex.com/"), col("doc_id")))
      .withColumn("shard", lit(0L))
      .withColumn("http", Warc.httpPayload(lit("200 OK"), col("ct"), col("text")))
    val out = Warc.parseHttpCharset(Warc.parseRecords(
        Warc.renderFiles(byRow, textCol = "http", warcType = "response")))
      .orderBy("rec_id")
      .select("rec_id", "charset", "body", "kept").collect()
    val expected = Seq(
      (0L, "iso-8859-1", accented), (1L, "utf-8", emoji),
      (2L, "windows-1252", gremlins), (3L, null, emoji),
      (4L, "latin-1", accented))
    for ((r, (id, cs, body)) <- out.zip(expected)) {
      withClue(s"doc $id: ") {
        r.getAs[String]("charset") shouldBe cs
        r.getAs[String]("body") shouldBe body
        r.getAs[Boolean]("kept") shouldBe true
      }
    }
  }

  test("windows-1252 translate table ≡ Java's own cp1252 decoder on every byte") {
    // every single byte 0x00..0xFF decoded by the engine's
    // view+translate path must equal Java's windows-1252 decoder —
    // EXCEPT the five undefined cp1252 bytes (0x81 0x8D 0x8F 0x90
    // 0x9D), where Java emits U+FFFD but the engine follows the
    // WHATWG encoding standard (what browsers do on real web bytes):
    // pass through as the same-value control codepoint
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val undefinedPassthrough = Set(0x81, 0x8D, 0x8F, 0x90, 0x9D)
    val rows = (0 until 256).map { b =>
      val view = new String(Array(b.toByte), java.nio.charset.StandardCharsets.ISO_8859_1)
      val expected =
        if (undefinedPassthrough(b)) view
        else new String(Array(b.toByte), cp1252)
      (b.toLong, view, expected)
    }
    val framed = rows.map { case (id, view, _) => (id, view) }
      .toDF("doc_id", "text")
      .withColumn("url", concat(lit("https://ex.com/"), col("doc_id")))
      .withColumn("shard", lit(0L))
      .withColumn("http", Warc.httpPayload(lit("200 OK"),
        lit("text/html; charset=windows-1252"), col("text")))
    val got = Warc.parseHttpCharset(Warc.parseRecords(
        Warc.renderFiles(framed, textCol = "http", warcType = "response")))
      .orderBy("rec_id").select("rec_id", "body").as[(Long, String)]
      .collect()
    for (((id, body), (_, _, expected)) <- got.zip(rows)) {
      withClue(s"byte $id: ") { body shouldBe expected }
    }
  }

  test("gzip files: one member per record, inflate∘render is an identity, corruption degrades") {
    val texts = Seq(
      0L -> "plain words",
      1L -> "unicode — naïve café ☕ 😀",
      2L -> "embedded\r\nnewlines\r\n\r\nblank",
      3L -> "")
    val gz = Warc.renderGzipFiles(corpus(texts: _*)).orderBy("shard").collect()
    gz.length shouldBe 2
    // member-wise framing: each file is EXACTLY the concatenation of
    // per-record gzip members (id order), so a reader can seek and
    // inflate any single record — pin by re-gzipping independently
    def gzipOne(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    def record(id: Long, txt: String): String = {
      val bytes = txt.getBytes("UTF-8").length
      s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Target-URI: https://ex.com/$id\r\n" +
        s"WARC-Record-ID: <urn:graft:$id>\r\n" +
        s"Content-Length: $bytes\r\n\r\n$txt\r\n\r\n"
    }
    val evenFile = gz.find(_.getAs[Long]("shard") == 0L).get
      .getAs[Array[Byte]]("content")
    val expected = Seq(0L, 2L)
      .map(id => gzipOne(record(id, texts.find(_._1 == id).get._2)))
      .reduce(_ ++ _)
    evenFile.toSeq shouldBe expected.toSeq
    // the whole gz path roundtrips through the unchanged Column parse
    val parsed = Warc.parseRecords(
        Warc.inflateGzipFiles(Warc.renderGzipFiles(corpus(texts: _*))),
        byteOriented = true)
      .orderBy("rec_id").select("rec_id", "payload", "intact")
      .as[(Long, String, Boolean)].collect().toSeq
    parsed shouldBe texts.map { case (id, t) => (id, t, true) }
    // a corrupt file degrades to (null, gz_ok=false), never throws
    val corrupt = Seq((9L, Array[Byte](0x1f, 0x8b.toByte, 8, 0, 1, 2, 3)))
      .toDF("shard", "content")
    val bad = Warc.inflateGzipFiles(corrupt).collect().head
    bad.getAs[Boolean]("gz_ok") shouldBe false
    bad.isNullAt(bad.fieldIndex("content")) shouldBe true
  }

  test("gzip files: a corrupt SECOND member fails the whole file, not a silent truncation") {
    def gzipOne(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    val m1 = gzipOne("first record, fully valid")
    val m2 = gzipOne("second record that must not be silently dropped")
    // three corruption shapes, all AFTER a valid first member — Java's
    // GZIPInputStream treats each as a clean EOF and returns only the
    // first member's content with no error
    val badMagic = m2.clone(); badMagic(0) = 0x00 // unparseable header
    val badCrc = m2.clone(); badCrc(badCrc.length - 5) =
      (badCrc(badCrc.length - 5) ^ 0xff).toByte // trailer CRC flip
    val truncated = m2.take(m2.length - 12) // deflate stream cut short
    val files = Seq(
      (0L, m1 ++ badMagic), (1L, m1 ++ badCrc), (2L, m1 ++ truncated),
      (3L, m1 ++ m2)) // control: the intact concatenation stays ok
      .toDF("shard", "content")
    val got = Warc.inflateGzipFiles(files).orderBy("shard").collect()
    for (i <- 0 to 2) withClue(s"shard $i: ") {
      got(i).getAs[Boolean]("gz_ok") shouldBe false
      got(i).isNullAt(got(i).fieldIndex("content")) shouldBe true
    }
    got(3).getAs[Boolean]("gz_ok") shouldBe true
    got(3).getAs[String]("content") should include("second record")
  }

  test("markRevisits: first capture in file order is the original, later ones refer to it") {
    // ids 0..5 in two shards (even/odd); payload repeats across the
    // id%3 classes, so originals and revisits interleave shards
    val texts = (0L to 5L).map(id => id -> s"pay${id % 3}")
    val out = Warc.markRevisits(Warc.parseRecords(
        Warc.renderFiles(corpus(texts: _*))))
      .orderBy("rec_id")
      .select("rec_id", "is_revisit", "refers_to")
      .as[(Long, Boolean, Option[Long])].collect().toSeq
    // shard 0 holds ids 0,2,4; shard 1 holds 1,3,5 — file order makes
    // 0,2,4 (shard 0) the originals of pay0/pay2/pay1... payload of
    // id: pay(id%3): 0→pay0 1→pay1 2→pay2 3→pay0 4→pay1 5→pay2.
    // min(shard,rec_pos) per payload: pay0 → id0 (s0,p0); pay2 → id2
    // (s0,p1); pay1 → id4 (s0,p2) — shard order beats id order for
    // pay1 (id1 sits in shard 1): the struct-min is genuinely
    // (shard, pos), not min id.
    out shouldBe Seq(
      (0L, false, None), (1L, true, Some(4L)), (2L, false, None),
      (3L, true, Some(0L)), (4L, false, None), (5L, true, Some(2L)))
  }

  test("degenerate files: empty and marker-less content yield no records") {
    val junk = Seq((0L, ""), (1L, "no markers at all"), (2L, "WARC/2.0\r\nfuture"))
      .toDF("shard", "content")
    // nothing parses as a record (the 2.0 version line is not a 1.0
    // marker, so the whole file is one orphan-free non-match)
    Warc.parseRecords(junk).where($"rec_id".isNotNull).count() shouldBe 0L
  }

  test("fileStats aggregates the parse (counts, volume, intact)") {
    val stats = Warc.fileStats(Warc.parseRecords(Warc.renderFiles(corpus(
      0L -> "aaaa", 2L -> "bb", 1L -> "ccc"))))
      .orderBy("shard").collect()
    stats.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_records"),
      r.getAs[Long]("payload_chars"), r.getAs[Long]("n_intact"))).toSeq shouldBe
      Seq((0L, 2L, 6L, 2L), (1L, 1L, 3L, 1L))
  }

  test("byte-oriented mode: Content-Length is UTF-8 octets, multi-byte payloads roundtrip") {
    val docs = Seq(
      (1L, "https://a.com/é", "café — 😀"), // 2-, 3-, 4-byte chars
      (2L, "https://a.com/p", "plain ascii"))
      .toDF("doc_id", "url", "text")
      .withColumn("shard", lit(0L))
    val out = Warc.parseRecords(
        Warc.renderFiles(docs, byteOriented = true), byteOriented = true)
      .orderBy("rec_id").collect()
    // café(4c/5B) + ' '(1) + —(1c/3B) + ' '(1) + 😀(1c/4B) = 8 chars, 14 bytes
    out(0).getAs[Long]("content_length") shouldBe 14L
    out(0).getAs[String]("payload") shouldBe "café — 😀"
    out(0).getAs[String]("uri") shouldBe "https://a.com/é"
    out(0).getAs[Boolean]("intact") shouldBe true
    out(1).getAs[Long]("content_length") shouldBe 11L
    out(1).getAs[String]("payload") shouldBe "plain ascii"
    // char mode would declare 8 for the same first payload — the two
    // orientations genuinely diverge on multi-byte text
    Warc.parseRecords(Warc.renderFiles(docs))
      .orderBy("rec_id").collect()(0)
      .getAs[Long]("content_length") shouldBe 8L
  }

  test("byte-oriented truncation yields null payload, never a partial-character decode") {
    // a record whose payload embeds the version marker: resync splits
    // it early, so fewer octets than declared are available
    val tricky = Seq((0L, "https://a.com/t",
      "héad " + Warc.VersionLine + "tail"))
      .toDF("doc_id", "url", "text").withColumn("shard", lit(0L))
    val rows = Warc.parseRecords(
        Warc.renderFiles(tricky, byteOriented = true), byteOriented = true)
      .where($"rec_id".isNotNull).collect()
    rows.head.getAs[Boolean]("intact") shouldBe false
    rows.head.isNullAt(rows.head.fieldIndex("payload")) shouldBe true
  }

  test("Location header renders and parses through the http layer") {
    val docs = Seq((1L, "https://a.com/old", "moved"))
      .toDF("doc_id", "url", "text")
      .withColumn("shard", lit(0L))
      .withColumn("http", Warc.httpPayload(
        lit("301 Moved Permanently"), lit("text/html"), $"text",
        location = lit("https://a.com/new")))
    val row = Warc.parseHttp(Warc.parseRecords(Warc.renderFiles(
      docs, textCol = "http", warcType = "response"))).collect().head
    row.getAs[Int]("status_code") shouldBe 301
    row.getAs[String]("location") shouldBe "https://a.com/new"
    row.getAs[String]("body") shouldBe "moved"
    row.getAs[Boolean]("kept") shouldBe false
    // a null location renders NO header and parses back as null
    val plain = Warc.parseHttp(Warc.parseRecords(Warc.renderFiles(
      Seq((2L, "https://a.com/x", "ok")).toDF("doc_id", "url", "text")
        .withColumn("shard", lit(0L))
        .withColumn("http", Warc.httpPayload(
          lit("200 OK"), lit("text/html"), $"text")),
      textCol = "http", warcType = "response"))).collect().head
    plain.isNullAt(plain.fieldIndex("location")) shouldBe true
    plain.getAs[Boolean]("kept") shouldBe true
  }

  test("resolveRedirects: chains collapse, cycles and chains into cycles flag looped") {
    val edges = Seq(
      // 3-hop chain a -> b -> c -> d (d terminal)
      ("a", "b"), ("b", "c"), ("c", "d"),
      // 2-cycle
      ("p", "q"), ("q", "p"),
      // chain feeding the cycle inherits its loop
      ("r", "p"),
      // self-loop
      ("s", "s"),
      // single hop to a terminal
      ("x", "y")).toDF("src", "dst")
    val out = Warc.resolveRedirects(edges).orderBy("src").collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("final_url"),
        Option(r.getAs[Any]("hops")), r.getAs[Boolean]("looped"))).toSeq
    out shouldBe Seq(
      ("a", "d", Some(3L), false), ("b", "d", Some(2L), false),
      ("c", "d", Some(1L), false),
      ("p", null, None, true), ("q", null, None, true),
      ("r", null, None, true), ("s", null, None, true),
      ("x", "y", Some(1L), false))
  }

  test("resolveRedirects: a legit chain longer than 2^maxRounds hits the redirect budget") {
    // chain of length 9: maxRounds=3 covers 2^3=8 composed hops —
    // the head is flagged as over-budget (exactly how a fetcher
    // treats a redirect-limit hit), deeper entries resolve
    val edges = (0 until 9).map(i => (s"n$i", s"n${i + 1}")).toDF("src", "dst")
    val out = Warc.resolveRedirects(edges, maxRounds = 3)
    out.where($"looped").select("src").as[String].collect().toSeq shouldBe Seq("n0")
    Warc.resolveRedirects(edges, maxRounds = 4)
      .where($"looped").count() shouldBe 0L
  }

  test("CJK charsets decode per-row: shift_jis/euc-jp/gb18030/big5/euc-kr roundtrip; malformed → U+FFFD") {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    def viewOf(text: String, jdkName: String): String =
      new String(text.getBytes(java.nio.charset.Charset.forName(jdkName)), iso)
    val cases = Seq(
      (0L, "shift_jis", viewOf("日本語のテキストです", "Shift_JIS"),
        "日本語のテキストです"),
      (1L, "euc-jp", viewOf("漢字とかなのまぜがき", "EUC-JP"),
        "漢字とかなのまぜがき"),
      (2L, "gb18030", viewOf("简体中文文本内容", "GB18030"), "简体中文文本内容"),
      (3L, "big5", viewOf("繁體中文文字", "Big5"), "繁體中文文字"),
      (4L, "euc-kr", viewOf("한국어 텍스트", "EUC-KR"), "한국어 텍스트"),
      // a dangling shift_jis lead byte decodes to U+FFFD, never throws
      (5L, "shift_jis", "ok" + 0x82.toChar, "ok�"))
    val framed = cases.map { case (id, cs, view, _) => (id, cs, view) }
      .toDF("doc_id", "cs", "text")
      .withColumn("url", concat(lit("https://cjk.ex.com/"), col("doc_id")))
      .withColumn("shard", lit(0L))
      .withColumn("http", Warc.httpPayload(lit("200 OK"),
        concat(lit("text/html; charset="), col("cs")), col("text")))
    val got = Warc.parseHttpCharset(Warc.parseRecords(
        Warc.renderFiles(framed, textCol = "http", warcType = "response")))
      .orderBy("rec_id").select("rec_id", "charset", "body")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    got.toSeq shouldBe cases.map { case (id, cs, _, exp) => (id, cs, exp) }
  }

  test("dechunkTry: RFC 9112 chunked framing — extensions, trailers, and every malformed shape") {
    def dechunk(s: String): Option[String] = {
      val r = Seq(Tuple1(s)).toDF("v")
        .select(graft.plans.NativeFunctions.dechunkTry(col("v")).as("r"))
        .select("r.ok", "r.text").collect().head
      if (r.getBoolean(0)) Some(r.getString(1)) else { r.isNullAt(1) shouldBe true; None }
    }
    dechunk("b\r\nhello world\r\n0\r\n\r\n") shouldBe Some("hello world")
    dechunk("B\r\nhello world\r\n0\r\n\r\n") shouldBe Some("hello world")
    dechunk("3;ext=1\r\nabc\r\n2\r\nde\r\n0\r\n\r\n") shouldBe Some("abcde")
    dechunk("3\r\nabc\r\n0\r\nExpires: never\r\n\r\n") shouldBe Some("abc")
    dechunk("0\r\n\r\n") shouldBe Some("") // empty body, just the terminator
    // chunk data may contain CRLF and hex-lookalike text
    dechunk("9\r\nab\r\n3\r\ncd\r\n0\r\n\r\n") shouldBe Some("ab\r\n3\r\ncd")
    dechunk("3\r\nab\r\n0\r\n\r\n") shouldBe None // short data
    dechunk("z\r\nabc\r\n0\r\n\r\n") shouldBe None // no hex size
    // chunk-ext MUST begin with ';' (RFC 9112 §7.1.1) — junk between
    // the size digits and CR is malformed, not an ignorable extension
    dechunk("3XYZ\r\nabc\r\n0\r\n\r\n") shouldBe None
    dechunk("3 ;ext=1\r\nabc\r\n0\r\n\r\n") shouldBe None // BWS not accepted
    dechunk("3\r\nabc\r\n0\r\n\r\nX") shouldBe None // garbage past terminator
    dechunk("3\r\nabc\r\n") shouldBe None // missing last chunk
    dechunk("3\nabc\n0\n\n") shouldBe None // LF-only framing
    dechunk("") shouldBe None
  }

  test("gzip/gunzipTry expressions: roundtrip, member concatenation, corruption degrades") {
    val gz = graft.plans.NativeFunctions.gzip(encode(col("t"), "UTF-8"))
    val got = Seq(Tuple1("packet of text — naïve ☕")).toDF("t")
      .select(graft.plans.NativeFunctions.gunzipTry(gz).as("r"))
      .select("r.ok", "r.data").collect().head
    got.getBoolean(0) shouldBe true
    new String(got.getAs[Array[Byte]](1), "UTF-8") shouldBe "packet of text — naïve ☕"
    // two members inflate to the concatenation; a flipped byte fails
    val two = Seq(("ab", "cd")).toDF("a", "b")
      .select(graft.plans.NativeFunctions.gunzipTry(concat(
        graft.plans.NativeFunctions.gzip(encode(col("a"), "UTF-8")),
        graft.plans.NativeFunctions.gzip(encode(col("b"), "UTF-8")))).as("r"))
      .select("r.ok", "r.data").collect().head
    new String(two.getAs[Array[Byte]](1), "UTF-8") shouldBe "abcd"
    val badRow = Seq(Tuple1("x")).toDF("t")
      .select(graft.plans.NativeFunctions.gzip(encode(col("t"), "UTF-8")).as("g"))
      .select(graft.plans.NativeFunctions.gunzipTry(
        expr("substring(g, 1, length(g) - 4)")).as("r"))
      .select("r.ok").collect().head
    badRow.getBoolean(0) shouldBe false
  }

  test("decode_http_body fused kernel ≡ the composed dechunk_try/gunzip_try chain") {
    import graft.plans.NativeFunctions
    def gzipOne(s: String): String = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close()
      new String(bos.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    def chunk1(s: String): String =
      if (s.isEmpty) "0\r\n\r\n"
      else s.length.toHexString + "\r\n" + s + "\r\n0\r\n\r\n"
    val rows = Seq(
      ("plain body", "", ""),
      ("plain body", "identity", "identity"),
      (chunk1("hello there"), "chunked", ""),
      (gzipOne("zzz compressed"), "", "gzip"),
      (gzipOne("stacked"), "", "x-gzip"),
      (chunk1(gzipOne("both layers")), "chunked", "gzip"),
      ("junk framing", "chunked", ""), // malformed chunk framing
      ("not gzip bytes", "", "gzip"), // corrupt member
      (chunk1("ok"), "chunked", "br"), // unsupported content coding
      // deflate: the composed chain predates it and always fails the
      // row; 'x' is not a deflate stream so the fused kernel fails it
      // too — parity holds on this matrix (fused-only deflate
      // coverage lives in its own spec below)
      ("x", "deflate", ""),
      ("", "", "")) // empty identity body
    val df = rows.toDF("v", "te", "ce")
    // the composed two-kernel chain, exactly as parseHttpEncoded was
    // first written
    val teI = col("te") === "" || col("te") === "identity"
    val ch = NativeFunctions.dechunkTry(col("v"))
    val teOk = when(teI, lit(true))
      .when(col("te") === "chunked", coalesce(ch("ok"), lit(false)))
      .otherwise(lit(false))
    val v1 = when(teI, col("v")).when(col("te") === "chunked", ch("text"))
    val gz = NativeFunctions.gunzipTry(encode(v1, "ISO-8859-1"))
    val ceI = col("ce") === "" || col("ce") === "identity"
    val isG = col("ce").isin("gzip", "x-gzip")
    val ceOk = when(v1.isNull || ceI, lit(true))
      .when(isG, coalesce(gz("ok"), lit(false)))
      .otherwise(lit(false))
    val v2 = when(ceI, v1).when(isG, decode(gz("data"), "ISO-8859-1"))
    val composedOk = teOk && ceOk
    val fused = NativeFunctions.decodeHttpBody(col("v"), col("te"), col("ce"))
    val got = df.select(col("v"), col("te"), col("ce"),
        fused("ok").as("fok"), fused("body").as("fbody"),
        composedOk.as("cok"), when(composedOk, v2).as("cbody"))
      .collect()
    got.foreach { r =>
      withClue(s"te=${r.getString(1)} ce=${r.getString(2)}: ") {
        r.getBoolean(3) shouldBe r.getBoolean(5)
        r.getString(4) shouldBe r.getString(6)
      }
    }
  }

  test("parseHttpEncoded: chunked/gzip/combined bodies decode; corrupt and unsupported codings flag") {
    val texts = Seq(
      0L -> "identity body — naïve café ☕",
      1L -> "chunked body with\r\nline breaks",
      2L -> "gzip body compresses fine",
      3L -> "chunked OVER gzip, the full stack",
      4L -> "this gzip body will be truncated",
      5L -> "x", // 1-char chunked body (single-chunk framing path)
      6L -> "brotli declared but unsupported",
      7L -> "zlib-wrapped deflate body — the spec meaning",
      8L -> "raw deflate body — the classic misconfiguration",
      9L -> "TE list: gzipped then chunked, removed right-to-left")
    val id = col("doc_id")
    val plainView = decode(encode(col("text"), "UTF-8"), "ISO-8859-1")
    val gzView = decode(
      graft.plans.NativeFunctions.gzip(encode(col("text"), "UTF-8")),
      "ISO-8859-1")
    val zlView = decode(
      graft.plans.NativeFunctions.zlib(encode(col("text"), "UTF-8")),
      "ISO-8859-1")
    val rawView = zlView.substr(lit(3), (slen(zlView) - 6).cast("int"))
    def chunked(v: Column): Column = {
      val l = slen(v)
      val len1 = floor(l / 2).cast("int")
      val len2 = (l - len1).cast("int")
      when(l >= 2, concat(
          lower(hex(len1)), lit("\r\n"), v.substr(lit(1), len1), lit("\r\n"),
          lower(hex(len2)), lit("\r\n"), v.substr(len1 + 1, len2),
          lit("\r\n0\r\n\r\n")))
        .when(l === 1, concat(lit("1\r\n"), v, lit("\r\n0\r\n\r\n")))
        .otherwise(lit("0\r\n\r\n"))
    }
    val body = when(id === 0, plainView)
      .when(id === 1 || id === 5, chunked(plainView))
      .when(id === 2, gzView)
      .when(id === 3 || id === 9, chunked(gzView))
      .when(id === 4, gzView.substr(lit(1), (slen(gzView) - 6).cast("int")))
      .when(id === 7, zlView)
      .when(id === 8, rawView)
      .otherwise(plainView)
    val extra = when(id === 1 || id === 5, lit("\r\nTransfer-Encoding: chunked"))
      .when(id === 2 || id === 4, lit("\r\nContent-Encoding: gzip"))
      .when(id === 3,
        lit("\r\nTransfer-Encoding: chunked\r\nContent-Encoding: gzip"))
      .when(id === 6, lit("\r\nContent-Encoding: br"))
      .when(id === 7 || id === 8, lit("\r\nContent-Encoding: deflate"))
      .when(id === 9, lit("\r\nTransfer-Encoding: gzip, chunked"))
      .otherwise(lit(""))
    val files = Warc.renderFiles(
      texts.toDF("doc_id", "text")
        .withColumn("url", concat(lit("https://enc.ex.com/"), id))
        .withColumn("shard", lit(0L))
        .withColumn("http", Warc.httpPayload(lit("200 OK"),
          lit("text/plain; charset=utf-8"), body, extraHeaders = extra)),
      textCol = "http", warcType = "response")
    val got = Warc.parseHttpEncoded(Warc.parseRecords(files))
      .orderBy("rec_id")
      .select("rec_id", "transfer_encoding", "content_encoding",
        "body_ok", "body", "kept")
      .collect()
    val expected = Seq(
      (0L, null, null, true, texts(0)._2, true),
      (1L, "chunked", null, true, texts(1)._2, true),
      (2L, null, "gzip", true, texts(2)._2, true),
      (3L, "chunked", "gzip", true, texts(3)._2, true),
      (4L, null, "gzip", false, null, false),
      (5L, "chunked", null, true, texts(5)._2, true),
      (6L, null, "br", false, null, false),
      (7L, null, "deflate", true, texts(7)._2, true),
      (8L, null, "deflate", true, texts(8)._2, true),
      (9L, "gzip, chunked", null, true, texts(9)._2, true))
    got.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getBoolean(3), r.getString(4), r.getBoolean(5))).toSeq shouldBe expected
  }

  test("decode_http_body: deflate (zlib + raw), coding lists right-to-left, corruption degrades") {
    import graft.plans.NativeFunctions
    def decodeBody(v: String, te: String, ce: String): (Boolean, String) = {
      val fused = NativeFunctions.decodeHttpBody(col("v"), col("te"), col("ce"))
      val r = Seq((v, te, ce)).toDF("v", "te", "ce")
        .select(fused("ok").as("ok"), fused("body").as("b")).collect().head
      (r.getBoolean(0), if (r.isNullAt(1)) null else r.getString(1))
    }
    def viewOf(bytes: Array[Byte]): String =
      new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    def gzipOne(s: String): String =
      viewOf(graft.plans.Native.gzipMember(s.getBytes("UTF-8")))
    def zlibOne(s: String): String =
      viewOf(graft.plans.Native.zlibMember(s.getBytes("UTF-8")))
    def rawOne(s: String): String = {
      val z = zlibOne(s); z.substring(2, z.length - 4)
    }
    // compress a VIEW string's own bytes (latin-1, char ≡ byte) —
    // for stacking codings over already-coded layers
    def gzipView(v: String): String =
      viewOf(graft.plans.Native.gzipMember(
        v.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
    def chunk1(s: String): String =
      if (s.isEmpty) "0\r\n\r\n"
      else s.length.toHexString + "\r\n" + s + "\r\n0\r\n\r\n"
    val msg = "deflate payload — naïve ☕"
    // the kernel returns the latin-1 BYTE VIEW (char ≡ byte) of the
    // decoded UTF-8 bytes — the charset layer above decodes it
    val msgView = viewOf(msg.getBytes("UTF-8"))
    // zlib-wrapped and raw deflate both decode; Adler-32 is honored
    decodeBody(zlibOne(msg), "", "deflate") shouldBe ((true, msgView))
    decodeBody(rawOne(msg), "", "deflate") shouldBe ((true, msgView))
    decodeBody(zlibOne(""), "", "deflate") shouldBe ((true, ""))
    // truncated zlib (trailer gone), flipped byte, garbage, trailing
    // junk after a complete stream: all quarantine
    val z = zlibOne(msg)
    decodeBody(z.substring(0, z.length - 4), "", "deflate")._1 shouldBe false
    decodeBody(z.substring(0, 2) + "ÿ" + z.substring(3), "",
      "deflate")._1 shouldBe false
    decodeBody("not deflate at all", "", "deflate")._1 shouldBe false
    decodeBody(z + "X", "", "deflate")._1 shouldBe false
    decodeBody("", "", "deflate")._1 shouldBe false
    // coding LISTS remove right-to-left (RFC 7230 §3.3.1): the sender
    // gzipped THEN chunked, so the receiver dechunks THEN inflates
    decodeBody(chunk1(gzipOne(msg)), "gzip, chunked", "") shouldBe ((true, msgView))
    // ...and the other sender order works symmetrically
    decodeBody(gzipView(chunk1(msgView)), "chunked, gzip", "") shouldBe ((true, msgView))
    // content-coding list: deflate applied first, gzip second
    decodeBody(gzipView(zlibOne(msg)), "", "deflate, gzip") shouldBe ((true, msgView))
    // whitespace-tolerant tokens; identity no-ops inside a list
    decodeBody(chunk1(gzipOne(msg)), " gzip ,  chunked ", "") shouldBe ((true, msgView))
    decodeBody(gzipOne(msg), "", "identity, gzip, identity") shouldBe ((true, msgView))
    // an unknown token anywhere in a list quarantines the row
    decodeBody(chunk1(msg), "br, chunked", "")._1 shouldBe false
    decodeBody(gzipOne(msg), "", "gzip, zstd")._1 shouldBe false
    // wrong list order = wrong layer order = corrupt at some layer
    decodeBody(chunk1(gzipOne(msg)), "chunked, gzip", "")._1 shouldBe false
  }
}
