package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.PacedRunner

/** Streaming delivery shell (SURVEY §2.9): tick→slot resolution, cycle
  * repeat, and a real micro-batch run against the memory sink. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val slots = Seq((0L, 10L), (1L, 11L), (2L, 12L))
    .toDF("t", "value")

  test("tick → slot resolution wraps at the cycle length (14-day repeat, README.md:41)") {
    val got = PacedRunner.resolveSlots(Seq(0L, 1L, 2L, 3L, 4L, 7L).toDF("value"), slots, 3L)
      .select(col("tick"), col("t"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    got shouldBe Seq((0L, 0L, 10L), (1L, 1L, 11L), (2L, 2L, 12L),
      (3L, 0L, 10L), (4L, 1L, 11L), (7L, 1L, 11L))
  }

  test("watermarked window agg drops late events and finalizes windows") {
    import graft.streaming.EventTimeOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp, Double)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // batch 1: events in the 10:00 window; batch 2 advances the
    // watermark far past it; batch 3 is a too-late straggler
    mem.addData((1L, "click", ts(5), 1.0), (2L, "click", ts(20), 2.0))
    val df = mem.toDF().toDF("user_id", "event_type", "ts", "value")
    val q = EventTimeOps.windowedCounts(df, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("win_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    mem.addData((3L, "click", java.sql.Timestamp.valueOf("2026-01-01 13:00:00"), 4.0))
    q.processAllAvailable()
    mem.addData((4L, "click", ts(1), 8.0)) // late beyond watermark → dropped
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_test").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("w_start").toString,
        r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
    // the 10:00 window finalized with ONLY the two on-time events
    rows should contain(("2026-01-01 10:00:00.0", 2L, 3.0))
    rows.map(_._2).sum shouldBe 2L // 13:00 window still open; straggler dropped
  }

  test("streaming dedup within watermark drops redelivered keys, keeps distinct ones") {
    import graft.streaming.EventTimeOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // batch 1 contains an intra-batch duplicate of event 1
    mem.addData((1L, ts(0), 1.0), (1L, ts(0), 1.0), (2L, ts(1), 2.0))
    val df = mem.toDF().toDF("event_id", "ts", "value")
    val q = EventTimeOps.dedupWithinWatermark(df, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    // batch 2 redelivers event 2 (within the watermark horizon) and
    // adds a fresh event 3
    mem.addData((2L, ts(1), 2.0), (3L, ts(2), 3.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_test").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq
    rows shouldBe Seq((1L, 1.0), (2L, 2.0), (3L, 3.0))
  }

  test("stream-static join enriches streaming events with a static dim") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Double)]
    mem.addData((1L, 10.0), (2L, 20.0), (3L, 30.0)) // 3 has no dim row
    val joined = mem.toDF().toDF("user_id", "value")
      .join(dim, Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)))).sorted.toSeq
    rows shouldBe Seq((1L, Some("gold")), (2L, Some("silver")), (3L, None))
  }

  test("stream-stream interval join pairs events within the time bound only") {
    import graft.streaming.EventTimeOps
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val lmem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val rmem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    // user 1: right events at +5min (in bound) and +25min (out of the
    // 10-minute bound); user 2: match on the other key — must not pair
    lmem.addData((1L, ts(0), 1.0), (2L, ts(0), 2.0))
    rmem.addData((1L, ts(5), 10.0), (1L, ts(25), 20.0), (2L, ts(8), 30.0))
    val joined = EventTimeOps.intervalJoin(
      lmem.toDF().toDF("user_id", "ts", "value"),
      rmem.toDF().toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", within = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ij_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ij_test").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("l_value"),
        r.getAs[Double]("r_value"))).sorted.toSeq
    rows shouldBe Seq((1L, 1.0, 10.0), (2L, 2.0, 30.0))
  }

  test("left-outer interval join emits unmatched rows once the watermark passes") {
    import graft.streaming.EventTimeOps
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val lmem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val rmem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    // user 1 matches at +5min; user 3 has NO right event ever
    lmem.addData((1L, ts(10, 0), 1.0), (3L, ts(10, 0), 3.0))
    rmem.addData((1L, ts(10, 5), 10.0))
    val joined = EventTimeOps.intervalJoin(
      lmem.toDF().toDF("user_id", "ts", "value"),
      rmem.toDF().toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", within = "10 minutes",
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ij_outer")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    // flush rows on DISTINCT keys advance both watermarks past
    // 10:10 + 30min lateness; user 3's "no match ever" verdict becomes
    // final and the outer row must flush (the flush rows' own outer
    // verdicts are still pending, so they stay buffered)
    lmem.addData((98L, ts(14, 0), 0.0))
    rmem.addData((99L, ts(14, 0), 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ij_outer").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("l_value"),
        Option(r.getAs[java.lang.Double]("r_value")).map(_.toDouble))).sorted.toSeq
    rows shouldBe Seq((1L, 1.0, Some(10.0)), (3L, 3.0, None))
  }

  test("stateful sessionization closes sessions on gap and emits summaries") {
    import graft.streaming.EventTimeOps
    import graft.streaming.EventTimeOps.{SessionEvent, SessionOut}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionEvent]
    val us = 1000000L
    // user 7: two bursts separated by > gap (30 min) within one batch.
    // Timestamps start at 10 s, not 0: rows at ts <= watermark are late,
    // and the initial watermark is 0 — a t=0 event would be dropped.
    mem.addData(
      SessionEvent(7L, 10 * us, 1.0), SessionEvent(7L, 70 * us, 2.0),
      SessionEvent(7L, 4010 * us, 10.0), SessionEvent(7L, 4060 * us, 20.0),
      SessionEvent(9L, 10 * us, 5.0))
    val q = EventTimeOps.sessionize(mem.toDS(), gapUs = 1800L * us)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    // event-time timeouts self-terminate under AvailableNow (a
    // processing-time timeout kept the query alive forever here)
    q.awaitTermination(120000) shouldBe true
    val closed = spark.table("sess_test").as[SessionOut].collect().sortBy(_.user_id)
    closed.toSeq shouldBe Seq(
      // user 7's first burst closed when the second began (gap exceeded)
      SessionOut(7L, 10 * us, 70 * us, 2L, 3.0),
      // user 9 closed by the event-time timeout: the watermark (4060 s)
      // passed its last event + gap (1800 s)
      SessionOut(9L, 10 * us, 10 * us, 1L, 5.0))
    // user 7's open session [4010 s, 4060 s] is beyond the final
    // watermark + gap — correctly NOT emitted
  }

  test("sessionization handles out-of-order events: span extends, never inverts") {
    import graft.streaming.EventTimeOps
    import graft.streaming.EventTimeOps.{SessionEvent, SessionOut}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val us = 1000000L
    val mem = MemoryStream[SessionEvent]
    // out-of-order within the gap: 1000s, then 500s (earlier!), then a
    // distant burst at 5000s; and one hopelessly late event at 100s
    // after the watermark of activity has moved on
    mem.addData(
      SessionEvent(1L, 1000 * us, 1.0), SessionEvent(1L, 500 * us, 2.0),
      SessionEvent(1L, 5000 * us, 4.0), SessionEvent(1L, 100 * us, 8.0))
    val q = EventTimeOps.sessionize(mem.toDS(), gapUs = 1800L * us)
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true
    val out = spark.table("sess_ooo").as[SessionOut].collect().sortBy(_.s_start)
    // events sort to 100,500,1000,5000: 100 opens; 500 within gap merges
    // (extends); 1000 merges; 5000 closes the [100,1000] session
    out.toSeq shouldBe Seq(SessionOut(1L, 100 * us, 1000 * us, 3L, 11.0))
    out.foreach(s => s.s_end should be >= s.s_start)
  }

  test("streaming DSIR: batch-trained ratio scores a stream statelessly, equal to batch weights") {
    import graft.ext.Corpus
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val raw = docs.where($"lang" =!= "en")
    val target = docs.where($"lang" === "en")
    // train in batch: the dense table is plan-time data, so scoring a
    // stream is ONE stateless projection — append mode with no
    // watermark proves no stateful operator is involved
    val lr9 = Corpus.dsirRatioTable(raw, target).toSeq
    val batch = Corpus.dsirScoreWith(raw, lr9).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mem = MemoryStream[(Long, String)]
    val q = Corpus.dsirScoreWith(mem.toDF().toDF("doc_id", "text"), lr9)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val pool = raw.select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    mem.addData(pool.take(50): _*)
    q.processAllAvailable()
    mem.addData(pool.slice(50, 100): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsir_stream").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    streamed.size shouldBe 100
    streamed.foreach { case (id, v) => v shouldBe batch(id) }
  }

  test("streaming CMS: the batch grid kernel runs unchanged on a stream, state bounded by the cell space") {
    import graft.ext.Sketches
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    // cmsGrid is a projection + groupBy over a CONSTANT key space, so
    // it is a legal streaming aggregation whose state is ≤ depth·width
    // rows forever — the same code path as batch, no streaming twin
    val q = Sketches.cmsGrid(mem.toDF().toDF("token"), "token", seed = 7L)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
    val b1 = Seq.fill(30)("alpha") ++ Seq.fill(10)("beta") ++ Seq("gamma")
    val b2 = Seq.fill(20)("alpha") ++ Seq.fill(5)("delta")
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_stream").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exact agreement with the batch grid over the union of batches —
    // same kernel, same hashes, same cells
    val batch = Sketches.cmsGrid((b1 ++ b2).toDF("token"), "token", seed = 7L)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    streamed shouldBe batch
    streamed.size should be <= 4 * 256
  }

  test("streaming minhash dedup: late near-dup flagged; bucket state reclaimed at horizon") {
    import graft.streaming.NearDupStream
    import graft.streaming.NearDupStream.DupFlag
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val us = 1000000L
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val nearDup = base.replace("today", "tonight") // shares most shingles
    val unrelated = "completely different content about quarterly financial reporting standards and audit compliance procedures"
    val mem = MemoryStream[(Long, String, Long)]
    // batch 1: doc 1 (canonical) then doc 2, a near-dup 60 s later
    mem.addData((1L, base, 10 * us), (2L, nearDup, 70 * us))
    val q = NearDupStream.flagNearDups(
        mem.toDF().toDF("doc_id", "text", "ts_us"),
        horizonUs = 1800L * us, lateness = "10 minutes")
      .writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    // batch 2: doc 3 arrives LATE (event time 40 s, before doc 2) but
    // within the 10-minute lateness — must still find the bucket state
    mem.addData((3L, base, 40 * us))
    q.processAllAvailable()
    val flags = spark.table("neardup_test").as[DupFlag].collect()
      .map(f => (f.doc_id, f.dup_of)).distinct.sorted
    flags shouldBe Seq((2L, 1L), (3L, 1L))
    // batches 3+4: unrelated docs two hours on; batch 3 advances the
    // watermark, batch 4's trigger fires the event-time timeouts that
    // reclaim every bucket of docs 1-3 (last activity + 30 min horizon
    // is far behind the watermark by then)
    // the fox corpus holds two distinct texts sharing most (not all)
    // buckets: strictly more than one doc's 8, so there is real state
    // for the timeout pass to reclaim
    val peak = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    peak should be > 8L
    mem.addData((50L, unrelated, 7200 * us))
    q.processAllAvailable()
    mem.addData((51L, unrelated + " appendix section", 7300 * us))
    q.processAllAvailable()
    val fin = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    // docs 1-3's `peak` buckets are gone: were they retained, total state
    // would exceed peak + the fresh docs' buckets; the two live docs can
    // hold at most 2 × 8 bands on their own
    fin should be <= 16L
    // the unrelated docs were never flagged against the fox corpus
    spark.table("neardup_test").as[DupFlag].collect()
      .map(_.doc_id).toSet should not contain 50L
  }

  test("streaming near-dup flags reconcile with batch LSH pairs (same kernel)") {
    import graft.streaming.NearDupStream
    import graft.streaming.NearDupStream.DupFlag
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val us = 1000000L
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val corpus = Seq(
      (1L, base, 10L * us),
      (2L, base.replace("today", "tonight"), 70L * us),   // near-dup of 1
      (3L, base, 130L * us),                              // exact dup of 1
      (4L, "completely different content about quarterly financial reporting standards", 190L * us),
      (5L, "unrelated short text with no overlap whatsoever in any shingle", 250L * us))
    val mem = MemoryStream[(Long, String, Long)]
    mem.addData(corpus: _*)
    val q = NearDupStream.flagNearDups(
        mem.toDF().toDF("doc_id", "text", "ts_us"), horizonUs = 3600L * us)
      .writeStream.format("memory").queryName("neardup_agree")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    q.stop()
    val flags = spark.table("neardup_agree").as[DupFlag].collect()
      .map(f => (math.min(f.doc_id, f.dup_of), math.max(f.doc_id, f.dup_of)))
      .distinct.sorted
    // batch candidate pairs over the SAME corpus, default 32/8 family —
    // identical signatures, so every streaming flag is a batch pair
    val batch = graft.ext.Dedup.minhashLshPairs(
        corpus.toDF("doc_id", "text", "ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    flags.foreach(p => batch should contain(p))
    // the planted exact dup shares every band bucket with its canonical
    flags should contain((1L, 3L))
    flags should contain((1L, 2L))
  }

  test("stream-static near-dup flags incoming docs against a historical corpus") {
    import graft.streaming.NearDupStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val hist = Seq((100L, base),
      (101L, "archived report on quarterly financial compliance and audit procedures"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, base.replace("today", "tonight")), // near-dup of 100
      (2L, "entirely novel content with no shingles in common whatsoever"))
    val q = NearDupStream.flagAgainstCorpus(
        mem.toDF().toDF("doc_id", "text"), hist)
      .writeStream.format("memory").queryName("hist_flags")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val flags = spark.table("hist_flags").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("hist_id"))).distinct
    flags should contain((1L, 100L))
    flags.map(_._1) should not contain 2L
    // the flag agrees with what the batch pass pairs on the union
    val batch = graft.ext.Dedup.minhashLshPairs(
        hist.union(Seq((1L, base.replace("today", "tonight"))).toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    flags.foreach { case (d, h) => batch should contain((math.min(d, h), math.max(d, h))) }
  }

  test("streaming verbatim decontamination flags a planted leak at ingest; clean docs pass") {
    import graft.streaming.NearDupStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val benchText = "which of the following best describes the time complexity of a hash join over two sorted inputs"
    val bench = Seq((900L, benchText),
      (901L, "compute the shortest path between the two marked nodes in the weighted graph below"))
      .toDF("doc_id", "text")
    // doc 1 quotes an exact 9-token run from the benchmark mid-text;
    // doc 2 is clean prose; doc 3 shares topic words but no 8-token run;
    // doc 4 is shorter than 8 tokens (cannot leak a qualifying run)
    val leaky = "as seen in many exams which of the following best describes the time complexity of quicksort"
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (1L, leaky),
      (2L, "completely unrelated prose about gardening and the weather in spring"),
      (3L, "hash join time complexity depends on the smaller input size"),
      (4L, "too short to ever match"))
    val q = NearDupStream.flagVerbatim(mem.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("verbatim_flags")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val flagged = spark.table("verbatim_flags").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    flagged shouldBe Set(1L)
    // the streaming verdict IS the batch decontamination verdict: the
    // same docs flag under Corpus.decontaminateSubstring (same kernel)
    val batchFlagged = graft.ext.Corpus.decontaminateSubstring(
        Seq((1L, leaky),
          (2L, "completely unrelated prose about gardening and the weather in spring"),
          (3L, "hash join time complexity depends on the smaller input size"),
          (4L, "too short to ever match")).toDF("doc_id", "text"),
        bench)
      .collect().map(_.getLong(0)).toSet
    flagged shouldBe batchFlagged
  }

  test("streaming ingest gate: quality filter → verbatim drop → redact → archive flags, one graph") {
    // the ingest half of the batch recipe composed on a readStream
    // frame: every stage is stateless (projection or stream-static
    // join), so the whole gate runs in append mode with no state store
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.{PiiScan, TextStats}
    import graft.streaming.NearDupStream
    val histText = "the archive already holds this exact document about query " +
      "planning and join ordering in distributed engines today"
    val corpus = Seq((800L, histText)).toDF("doc_id", "text")
    val benchText = "which of the following best describes the time complexity " +
      "of a hash join over two sorted inputs"
    val bench = Seq((900L, benchText)).toDF("doc_id", "text")

    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (1L, "a perfectly ordinary document with ssn 123-45-6789 inside " +
        "it and plenty of other words to pass the quality gate"),
      (2L, "too short"),                                  // poor → dropped
      (3L, "students often ask which of the following best describes " +
        "the time complexity of merge sort"),             // verbatim leak → dropped
      (4L, histText))                                     // admitted, flagged vs archive
    val admitted = NearDupStream.admitVerbatim(
      TextStats.qualityFacets(mem.toDF().toDF("doc_id", "text"))
        .where($"quality_bucket" =!= "poor")
        .select("doc_id", "text"),
      bench)
    val gated = PiiScan.redact(admitted)
    val q1 = gated.writeStream.format("memory").queryName("ingest_admitted")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(60000) shouldBe true
    // archive near-dup flags computed downstream of the same gate
    val q2 = NearDupStream.flagAgainstCorpus(gated.select("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("ingest_flags")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000) shouldBe true

    val rows = spark.table("ingest_admitted").collect()
    rows.map(_.getAs[Long]("doc_id")).toSet shouldBe Set(1L, 4L)
    val doc1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
    doc1.getAs[String]("redacted") should include("[REDACTED:ssn]")
    doc1.getAs[String]("redacted") should not include "123-45-6789"
    val flags = spark.table("ingest_flags").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hist_id")).distinct
    flags shouldBe Array(4L -> 800L)
  }

  test("full ingest graph: the stateless gate feeds the stateful new-vs-new flagger") {
    // the complete ingest story in ONE streaming query: quality filter
    // and verbatim drop (stateless projections) upstream of the
    // STATEFUL intra-stream near-dup flagger — a doc dropped by the
    // gate must never reach the bucket state
    import graft.streaming.NearDupStream
    import graft.streaming.NearDupStream.DupFlag
    implicit val sqlCtx = spark.sqlContext
    val us = 1000000L
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val leakRun = "which of the following best describes the time complexity"
    val bench = Seq((900L, leakRun)).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String, Long)]
    mem.addData(
      (1L, base, 10 * us),
      // near-dup of 1 AND verbatim leak: the gate drops it, so no
      // (2, 1) flag may appear even though it would band-collide
      (2L, base + " " + leakRun, 40 * us),
      // clean near-dup of 1: passes the gate, flags against 1's state
      (3L, base.replace("today", "tonight"), 70 * us),
      (4L, "tiny", 80 * us)) // poor quality → dropped pre-state
    val gated = NearDupStream.admitVerbatim(
      graft.ext.TextStats.qualityFacets(
          mem.toDF().toDF("doc_id", "text", "ts_us"))
        .where($"quality_bucket" =!= "poor")
        .select("doc_id", "text", "ts_us"),
      bench)
    val q = NearDupStream.flagNearDups(gated,
        horizonUs = 1800L * us, lateness = "10 minutes")
      .writeStream.format("memory").queryName("ingest_full")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val flags = spark.table("ingest_full").as[DupFlag].collect()
      .map(f => (f.doc_id, f.dup_of)).distinct
    flags shouldBe Array((3L, 1L))
  }

  test("stateless text operators run unchanged on streaming frames") {
    // redaction / quality counts / langid are pure projections — the
    // SAME Column expressions apply to a readStream frame with no
    // rewrite, which is the point of keeping them shuffle-free
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.{PiiScan, TextStats}
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "ssn 123-45-6789 the end"), (2L, "der hund ist nicht da"))
    val q = PiiScan.redact(mem.toDF().toDF("doc_id", "text"))
      .withColumn("lang_pred", TextStats.langId($"text"))
      .withColumn("n_tokens", TextStats.tokenCount($"text"))
      .writeStream.format("memory").queryName("stateless_text")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val rows = spark.table("stateless_text").orderBy("doc_id").collect()
    rows(0).getAs[String]("redacted") should include("[REDACTED:ssn]")
    rows(0).getAs[String]("redacted") should not include "123-45-6789"
    rows(1).getAs[String]("lang_pred") shouldBe "de"
    rows(1).getAs[Int]("n_tokens") shouldBe 5
  }

  test("host-rank prior gates a stream of arriving pages statelessly, equal to batch") {
    // the power iteration is batch work; its (host, rank) product
    // broadcasts into a stream-static join — arriving pages adopt
    // their host's prior, unseen hosts get the default
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.LinkGraph
    val ranks = LinkGraph.hostRank(Seq(
      ("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "a.com"))
      .toDF("src_host", "dst_host"))
    val pages = Seq(
      (1L, "HTTPS://WWW.A.com:443/page?x=1"), // canonicalizes to a.com
      (2L, "http://b.com/other"),
      (3L, "https://never-seen.org/x")) // not in the graph → default
    val gate = (df: org.apache.spark.sql.DataFrame) =>
      LinkGraph.gateHostPrior(df, ranks).select("doc_id", "host", "host_rank")
    val mem = MemoryStream[(Long, String)]
    mem.addData(pages: _*)
    val q = gate(mem.toDF().toDF("doc_id", "url"))
      .writeStream.format("memory").queryName("prior_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val streamRows = spark.table("prior_gate").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val batchRows = gate(pages.toDF("doc_id", "url")).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    streamRows shouldBe batchRows
    val byId = batchRows.map(r => r.head -> (r(1), r(2))).toMap
    byId(1L)._1 shouldBe "a.com"
    byId(3L) shouldBe ("never-seen.org", 0L)
    // seen hosts carry their exact batch rank
    val rankOf = ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byId(1L)._2 shouldBe rankOf("a.com")
    byId(2L)._2 shouldBe rankOf("b.com")
  }

  test("mirror-family gate: arriving pages adopt their host's component statelessly, equal to batch") {
    // contraction is batch work; its (host, component, comp_size)
    // product broadcasts into a stream-static join — arriving pages
    // adopt their host's family, unseen hosts become singleton
    // families of themselves
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.LinkGraph
    val comps = LinkGraph.hostComponents(Seq(
      ("a.com", "b.com"), ("b.com", "c.com"), ("x.org", "y.org"))
      .toDF("src_host", "dst_host"))
    val pages = Seq(
      (1L, "HTTPS://WWW.B.com:443/page?x=1"), // canonicalizes to b.com
      (2L, "http://y.org/other"),
      (3L, "https://never-seen.net/x")) // not in the graph → singleton
    val gate = (df: org.apache.spark.sql.DataFrame) =>
      LinkGraph.gateMirrorFamily(df, comps)
        .select("doc_id", "host", "family", "family_size")
    val mem = MemoryStream[(Long, String)]
    mem.addData(pages: _*)
    val q = gate(mem.toDF().toDF("doc_id", "url"))
      .writeStream.format("memory").queryName("family_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val streamRows = spark.table("family_gate").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val batchRows = gate(pages.toDF("doc_id", "url")).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    streamRows shouldBe batchRows
    val byId = batchRows.map(r => r.head -> ((r(1), r(2), r(3)))).toMap
    byId(1L) shouldBe (("b.com", "a.com", 3L))
    byId(2L) shouldBe (("y.org", "x.org", 2L))
    byId(3L) shouldBe (("never-seen.net", "never-seen.net", 1L))
  }

  test("parseHttpEncoded gates a stream of raw WARC files statelessly, equal to batch") {
    // rendering is a batch aggregate, but PARSE + wire-coding decode
    // is the stateless ingest gate a readStream of arriving crawl
    // files runs first — identical plan on stream and batch frames
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Warc
    import org.apache.spark.sql.functions.{encode => senc, decode => sdec}
    val texts = Seq(
      0L -> "identity body", 1L -> "chunked body here",
      2L -> "gzip body compresses", 3L -> "chunked over gzip stack",
      4L -> "truncated gzip flags")
    val id = $"doc_id"
    val plainView = sdec(senc($"text", "UTF-8"), "ISO-8859-1")
    val gzView = sdec(
      graft.plans.NativeFunctions.gzip(senc($"text", "UTF-8")), "ISO-8859-1")
    def chunked(v: org.apache.spark.sql.Column) = {
      val l = org.apache.spark.sql.functions.length(v)
      val len1 = org.apache.spark.sql.functions.floor(l / 2).cast("int")
      concat(lower(hex(len1)), lit("\r\n"), v.substr(lit(1), len1),
        lit("\r\n"), lower(hex((l - len1).cast("int"))), lit("\r\n"),
        v.substr(len1 + 1, (l - len1).cast("int")), lit("\r\n0\r\n\r\n"))
    }
    val body = when(id === 0, plainView)
      .when(id === 1, chunked(plainView))
      .when(id === 2, gzView)
      .when(id === 3, chunked(gzView))
      .otherwise(gzView.substr(lit(1),
        (org.apache.spark.sql.functions.length(gzView) - 6).cast("int")))
    val extra = when(id === 1, lit("\r\nTransfer-Encoding: chunked"))
      .when(id === 2 || id === 4, lit("\r\nContent-Encoding: gzip"))
      .when(id === 3,
        lit("\r\nTransfer-Encoding: chunked\r\nContent-Encoding: gzip"))
      .otherwise(lit(""))
    val files = Warc.renderFiles(
      texts.toDF("doc_id", "text")
        .withColumn("url", concat(lit("https://enc.ex.com/"), id))
        .withColumn("shard", pmod(id, lit(2)))
        .withColumn("http", Warc.httpPayload(lit("200 OK"),
          lit("text/plain; charset=utf-8"), body, extraHeaders = extra)),
      textCol = "http", warcType = "response")
    val gate = (df: org.apache.spark.sql.DataFrame) =>
      Warc.parseHttpEncoded(Warc.parseRecords(df))
        .select("rec_id", "transfer_encoding", "content_encoding",
          "body_ok", "body", "kept")
    val mem = MemoryStream[(Long, String)]
    mem.addData(files.as[(Long, String)].collect().toIndexedSeq: _*)
    val q = gate(mem.toDF().toDF("shard", "content"))
      .writeStream.format("memory").queryName("enc_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val streamRows = spark.table("enc_gate").orderBy("rec_id")
      .collect().map(_.toSeq).toSeq
    val batchRows = gate(files).orderBy("rec_id")
      .collect().map(_.toSeq).toSeq
    streamRows shouldBe batchRows
    batchRows.map(r => (r(0), r(3))) shouldBe
      texts.map { case (i, _) => (i, i != 4L) }
  }

  test("round-12 kernels score a stream statelessly, equal to batch") {
    // cdc chunking, hashing-trick stats, and the batch-trained NB
    // lookup scorer are stateless projections — identical Column
    // expressions on a readStream, no rewrite, matching batch rows
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.{Dedup, TextStats}
    val docs = Seq(
      (0L, "apple banana cherry apple banana cherry date egg fig grape", "a"),
      (1L, "dog cat wolf dog cat wolf bear lynx otter seal", "b"),
      (2L, "apple banana cherry apple banana cherry date egg fig grape", "a")
    )
    val batchDf = docs.toDF("doc_id", "text", "source")
    val train = batchDf.where($"doc_id" % 2 === 0)
    val kernels = (df: org.apache.spark.sql.DataFrame) => df.select(
      $"doc_id",
      graft.plans.NativeFunctions.cdcChunks($"text", 8).as("chunks"),
      graft.plans.NativeFunctions.hashFeatureStats($"text", 16).as("hf"))
    val batch = kernels(batchDf).collect().map(_.toString).sorted
    val mem = MemoryStream[(Long, String, String)]
    mem.addData(docs: _*)
    val q = kernels(mem.toDF().toDF("doc_id", "text", "source"))
      .writeStream.format("memory").queryName("r12_kernels")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    spark.table("r12_kernels").collect()
      .map(_.toString).sorted shouldBe batch
    // the fused NB scorer (trained on a BATCH frame) applies to the
    // stream as-is — the serving shape for ingest-time routing
    val nbBatch = TextStats.naiveBayesFused(batchDf, train)
      .collect().map(_.toString).sorted
    val mem2 = MemoryStream[(Long, String, String)]
    mem2.addData(docs: _*)
    val q2 = TextStats.naiveBayesFused(
        mem2.toDF().toDF("doc_id", "text", "source"), train)
      .writeStream.format("memory").queryName("r12_nb")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000) shouldBe true
    spark.table("r12_nb").collect().map(_.toString).sorted shouldBe nbBatch
    // winnow fingerprints flow too (kernel + explode — still stateless)
    val wBatch = Dedup.winnowFingerprints(batchDf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val mem3 = MemoryStream[(Long, String, String)]
    mem3.addData(docs: _*)
    val q3 = Dedup.winnowFingerprints(mem3.toDF().toDF("doc_id", "text", "source"))
      .writeStream.format("memory").queryName("r12_winnow")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination(60000) shouldBe true
    spark.table("r12_winnow").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted shouldBe wBatch
  }

  test("stream-static CDC contamination gate flags incoming docs against a historical corpus") {
    // ingest-time chunk-level decontamination: the static side reduces
    // to its DISTINCT ≥4-token CDC chunk set once; each micro-batch
    // explodes its chunks (stateless kernel), inner-joins the static
    // set, and aggregates per doc in update mode — no stream-stream
    // state, bounded by the batch
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Dedup
    val historical = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val histChunks = Dedup.cdcChunks(historical)
      .where($"n_chunk_tokens" >= 4)
      .select($"chunk_text").distinct()
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "red blue green yellow purple orange silver golden"))
    val flagged = mem.toDF().toDF("doc_id", "text")
      .select($"doc_id", explode(
        graft.plans.NativeFunctions.cdcChunks($"text", 8)).as("chunk_text"))
      .join(histChunks, "chunk_text")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
    val q = flagged.writeStream.format("memory").queryName("cdc_gate")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val rows = spark.table("cdc_gate").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows(100L) should be >= 1L   // the verbatim copy is flagged at ingest
    rows.contains(101L) shouldBe false // clean doc passes silently
  }

  test("stream-side Bloom decontamination gate: literal filter + static verify join, equal to batch") {
    // the Bloom array is built ONCE from the static benchmark at plan
    // time and rides into every micro-batch as a literal — the
    // candidate prefilter is stateless, the verify join is
    // stream-static, so the whole gate needs no streaming state
    // beyond the per-doc aggregate
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "red blue green yellow purple orange silver golden bronze"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(incoming: _*)
    val gated = graft.ext.Corpus.decontaminateBloom(
      mem.toDF().toDF("doc_id", "text"), bench)
    val q = gated.writeStream.format("memory").queryName("bloom_gate")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val streamRows = spark.table("bloom_gate").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchRows = graft.ext.Corpus.decontaminateBloom(
        incoming.toDF("doc_id", "text"), bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    streamRows shouldBe batchRows
    streamRows(100L) should be >= 1L    // the verbatim leak is flagged
    streamRows.contains(101L) shouldBe false // clean doc passes silently
  }

  test("batch-trained anomaly moments flag a streaming hour feed statelessly") {
    // the alerting shape: per-type moments (N, S, Q) come from the
    // historical grid ONCE; each incoming (type, hour, count) row is
    // flagged by the same integer 3σ inequality — a broadcast join +
    // filter, no streaming state at all
    implicit val sqlCtx = spark.sqlContext
    val hist = (0L until 100L).map(h => ("click", h, 10L)) :+ ("click", 100L, 11L)
    val moments = hist.toDF("event_type", "hr", "n")
      .groupBy("event_type")
      .agg(count(lit(1)).as("nHours"), sum("n").as("sTot"),
        sum($"n" * $"n").as("qTot"))
    val mem = MemoryStream[(String, Long, Long)]
    mem.addData(("click", 200L, 10L), ("click", 201L, 500L))
    val flagged = mem.toDF().toDF("event_type", "hr", "n")
      .join(broadcast(moments), "event_type")
      .where(($"n" * $"nHours" - $"sTot") * ($"n" * $"nHours" - $"sTot") >
        lit(9L) * ($"qTot" * $"nHours" - $"sTot" * $"sTot"))
      .select("event_type", "hr", "n")
    val q = flagged.writeStream.format("memory").queryName("anomaly_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val rows = spark.table("anomaly_gate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.toSeq shouldBe Seq(("click", 201L, 500L)) // only the spike flags
  }

  test("streaming micro-batches deliver slots in tick order to the memory sink") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    mem.addData(0L, 1L, 2L, 3L) // before start: AvailableNow snapshots at start
    val q = PacedRunner.resolveSlots(mem.toDF(), slots, 3L)
      .writeStream.format("memory").queryName("paced_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("paced_test").orderBy("tick")
      .collect().map(r => (r.getAs[Long]("tick"), r.getAs[Long]("t"), r.getAs[Long]("value")))
    rows.toSeq shouldBe Seq((0L, 0L, 10L), (1L, 1L, 11L), (2L, 2L, 12L), (3L, 0L, 10L))
  }

  test("streaming segment gate matches batch segmentDedup when arrival follows doc order") {
    import graft.streaming.NearDupStream
    import graft.streaming.NearDupStream.SegDupFlag
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val us = 1000000L
    val docs = Seq(
      (0L, "a b c d e f"), // canonical
      (1L, "a b c d e f"), // exact dup → every segment flagged
      (2L, "a b x y"),     // shares only the leading [a b]
      (3L, "p q p q"),     // WITHIN-doc repeat of [p q]
      (4L, "z"))           // short unique segment
    val mem = MemoryStream[(Long, String, Long)]
    mem.addData(docs.map { case (id, t) => (id, t, (10 + id) * us) }: _*)
    val q = NearDupStream.flagDupSegments(
        mem.toDF().toDF("doc_id", "text", "ts_us"),
        horizonUs = 3600L * us, segTokens = 2)
      .writeStream.format("memory").queryName("seg_gate")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("seg_gate").as[SegDupFlag].collect()
      .map(f => (f.doc_id, f.seg_idx)).toSet
    // batch truth over the same corpus: arrival order here equals the
    // batch (doc, seg_idx) order, so the survivor sets must coincide
    val batchDf = docs.toDF("doc_id", "text")
    val batch = graft.ext.Corpus.segmentDedup(batchDf, segTokens = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segs") - r.getAs[Long]("n_kept")),
          r.getAs[String]("dedup_text"))).toMap
    val perDoc = flagged.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    docs.foreach { case (id, _) =>
      perDoc.getOrElse(id, 0L) shouldBe batch(id)._1
    }
    // rebuilding each doc from the stream's UNflagged instances gives
    // exactly the batch dedup_text
    val segRows = graft.ext.Corpus.segmentRows(batchDf, 2, "text")
      .select($"doc_id", $"__seg_idx".cast("long"), $"__seg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    docs.foreach { case (id, _) =>
      val kept = segRows.filter(s => s._1 == id && !flagged((id, s._2)))
        .sortBy(_._2).map(_._3).mkString(" ")
      kept shouldBe batch(id)._2
    }
  }

  test("streaming weighted reservoir: admission-log top-k equals the batch reservoir, state bounded at k") {
    import graft.streaming.SampleStream
    import graft.streaming.SampleStream.Admission
    implicit val sqlCtx = spark.sqlContext
    // 300 docs in three arrival batches, weights by id class — same
    // weight rule on the batch side
    val all = (0L until 300L).map(i => (i, if (i % 3 == 0) 1.0 else 0.1))
    val w = when(col("doc_id") % 3 === 0, lit(1.0)).otherwise(lit(0.1))
    val mem = MemoryStream[(Long, Double)]
    val q = SampleStream.admitReservoir(
        mem.toDF().toDF("doc_id", "w"), w, k = 20, seed = 11L)
      .writeStream.format("memory").queryName("wres_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    all.grouped(100).foreach { batch =>
      mem.addData(batch: _*); q.processAllAvailable()
    }
    // per-stratum state never exceeds k (one stratum here)
    q.lastProgress.stateOperators.map(_.numRowsTotal).sum should be <= 1L
    q.stop()
    val log = spark.table("wres_test").as[Admission].collect()
    // the admission log is a small superset of the final reservoir
    // (expected k·(1+ln(n/k)) ≈ 74 here), never the whole stream
    log.length should be >= 20
    log.length should be < 150
    // final membership: top-k of the log under (key9 desc, id) —
    // exactly the batch reservoir over the same data + weight rule
    val streamed = log.sortBy(a => (-a.key9, a.doc_id)).take(20)
      .map(_.doc_id).toSet
    val batchRes = graft.ext.Corpus.weightedReservoir(
        all.toDF("doc_id", "w"), w, k = 20, seed = 11L)
      .collect().map(_.getLong(0)).toSet
    streamed shouldBe batchRes
    // redelivery + single-batch determinism: a fresh stream carrying
    // the whole corpus PLUS a replayed prefix in one batch admits
    // exactly the reservoir (best-first processing, duplicates are
    // state no-ops) — k rows, no churn
    val mem2 = MemoryStream[(Long, Double)]
    mem2.addData((all ++ all.take(100)): _*)
    val q2 = SampleStream.admitReservoir(
        mem2.toDF().toDF("doc_id", "w"), w, k = 20, seed = 11L)
      .writeStream.format("memory").queryName("wres_test2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q2.processAllAvailable()
    q2.stop()
    val log2 = spark.table("wres_test2").as[Admission].collect()
    log2.length shouldBe 20
    log2.map(_.doc_id).toSet shouldBe batchRes
    // per-stratum reservoirs: k best PER GROUP, state = |strata| rows,
    // each stratum's admission-log top-k equal to its own batch run
    val mem3 = MemoryStream[(Long, String)]
    val q3 = SampleStream.admitReservoir(
        mem3.toDF().toDF("doc_id", "lang"), lit(1.0), k = 5, seed = 3L,
        stratumCol = Some("lang"))
      .writeStream.format("memory").queryName("wres_test3")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val strat = (0L until 90L).map(i => (i, s"L${i % 3}"))
    strat.grouped(30).foreach { b => mem3.addData(b: _*); q3.processAllAvailable() }
    q3.lastProgress.stateOperators.map(_.numRowsTotal).sum shouldBe 3L
    q3.stop()
    val log3 = spark.table("wres_test3").as[Admission].collect()
    (0 until 3).foreach { s =>
      val lang = s"L$s"
      val streamedS = log3.filter(_.stratum == lang)
        .sortBy(a => (-a.key9, a.doc_id)).take(5).map(_.doc_id).toSet
      val batchS = graft.ext.Corpus.weightedReservoir(
          strat.filter(_._2 == lang).toDF("doc_id", "lang"), lit(1.0),
          k = 5, seed = 3L)
        .collect().map(_.getLong(0)).toSet
      streamedS shouldBe batchS
    }
  }

  test("stateless stream scrub ≡ batch boilerplateScrub under the same flag table") {
    import graft.ext.Corpus
    implicit val sqlCtx = spark.sqlContext
    val banner = "site nav menu here"
    val docs = Seq(
      (0L, s"$banner alpha beta gamma delta", "A"),
      (1L, s"$banner epsilon zeta eta theta", "A"),
      (2L, s"$banner iota kappa lambda mu", "A"),
      (3L, "totally organic content right here", "A"),
      (4L, s"$banner from B untouched words", "B"))
    val batchDf = docs.toDF("doc_id", "text", "source")
    // flags trained batch-side once; B is minDocs-exempt
    val keys = Corpus.boilerplateFlagKeys(batchDf, segTokens = 4, minFrac = 0.5)
    keys.length shouldBe 1
    val batch = Corpus.boilerplateScrub(batchDf, segTokens = 4, minFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the same flag keys gate a readStream with NO state store
    val mem = MemoryStream[(Long, String, String)]
    mem.addData(docs: _*)
    val q = Corpus.scrubRowStateless(
        mem.toDF().toDF("doc_id", "text", "source"), keys, segTokens = 4)
      .select("doc_id", "n_segs", "n_dropped", "clean_text")
      .writeStream.format("memory").queryName("scrub_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    q.lastProgress.stateOperators.length shouldBe 0 // truly stateless
    q.stop()
    val streamed = spark.table("scrub_stream").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    streamed shouldBe batch
  }

  test("stateless span scrub ≡ batch verbatimSpanScrub under the same flag table") {
    import graft.ext.Dedup
    implicit val sqlCtx = spark.sqlContext
    val quote12 = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (0L, s"alpha beta $quote12 gamma delta"),
      (1L, s"zeta $quote12 omega"), // later doc: loses the 12-token run
      (2L, "untouched words that appear exactly nowhere else at all today"),
      (3L, "tiny"),
      (4L, "   ")) // tokenless: streams through, no batch row
    val batchDf = docs.toDF("doc_id", "text")
    // span flags trained batch-side once; both halves consume the SAME table
    val flags = Dedup.verbatimSpanFlags(batchDf, windowTokens = 8,
      minRunTokens = 8)
    val batch = Dedup.verbatimSpanScrub(batchDf, windowTokens = 8,
        minRunTokens = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val q = Dedup.scrubSpansStateless(
        mem.toDF().toDF("doc_id", "text"), flags)
      .select("doc_id", "n_tokens", "n_flagged", "clean_text")
      .writeStream.format("memory").queryName("span_scrub_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    q.lastProgress.stateOperators.length shouldBe 0 // stream side stateless
    q.stop()
    val streamed = spark.table("span_scrub_stream").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // token-bearing docs agree exactly with the batch rebuild
    streamed.view.filterKeys(_ != 4L).toMap shouldBe batch
    // the tokenless straggler passes through the gate, absent batch-side
    streamed(4L) shouldBe ((0L, 0L, ""))
    batch.contains(4L) shouldBe false
  }

  test("streaming URL gate: flags reconcile exactly with batch urlDedup groups") {
    import graft.streaming.NearDupStream
    import graft.streaming.NearDupStream.UrlDupFlag
    implicit val sqlCtx = spark.sqlContext
    val us = 1000000L
    // crawl-dressing variants: docs 0-2 and 5-6 are re-crawls of two
    // canonical pages; 3,4,7 are singleton pages (4 = m. host, a
    // genuinely distinct page; 7 = non-default port, also distinct)
    val docs = Seq(
      (0L, "https://www.example.com/a?utm=1", 1L * us),
      (1L, "HTTP://example.com/a/", 2L * us),
      (2L, "https://example.com:443/a#top", 3L * us),
      (3L, "https://example.com/b", 4L * us),
      (4L, "https://m.example.com/a", 5L * us),
      (5L, "http://docs.example.org/guide/", 6L * us),
      (6L, "https://docs.example.org/guide", 7L * us),
      (7L, "https://example.com:8080/a", 8L * us))
    val mem = MemoryStream[(Long, String, Long)]
    mem.addData(docs: _*)
    val q = NearDupStream.flagDupUrls(
        mem.toDF().toDF("doc_id", "url", "ts_us"), horizonUs = 3600L * us)
      .writeStream.format("memory").queryName("url_gate")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    q.stop()
    val flags = spark.table("url_gate").as[UrlDupFlag].collect()
    // batch truth over the same corpus; arrival order == id order, so
    // each group's canonical is its keep_id
    val batch = graft.ext.Dedup.urlDedup(docs.toDF("doc_id", "url", "ts_us"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    batch("example.com/a") shouldBe ((0L, 3L))
    batch("docs.example.org/guide") shouldBe ((5L, 2L))
    flags.length shouldBe batch.values.map(_._2 - 1L).sum
    flags.map(_.doc_id).toSet shouldBe Set(1L, 2L, 6L)
    flags.filter(_.dup_of == 0L).map(_.doc_id).toSet shouldBe Set(1L, 2L)
    flags.filter(_.dup_of == 5L).map(_.doc_id).toSet shouldBe Set(6L)
  }

  test("robots gate runs stream-static over arriving pages, equal to batch") {
    // applyRules is a broadcast equi-join + stateless projection, so
    // the SAME graph gates a readStream of pages against the static
    // parsed-rules table — no state operator, append mode.
    import graft.ext.Robots
    implicit val sqlCtx = spark.sqlContext
    val rules = Robots.parseRules(Seq(
      ("a.com", "User-agent: *\nDisallow: /p/3\nDisallow: /secret\n"),
      ("b.org", "User-agent: badbot\nDisallow: /\n"))
      .toDF("domain", "content"))
    val pages = Seq(
      (1L, "a.com", "/p/3"), (2L, "a.com", "/open"),
      (3L, "b.org", "/p/3"), (4L, "c.net", "/anything"))
    val mem = MemoryStream[(Long, String, String)]
    mem.addData(pages: _*)
    val q = Robots.applyRules(
        mem.toDF().toDF("doc_id", "domain", "path"), rules)
      .writeStream.format("memory").queryName("robots_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val streamed = spark.table("robots_gate").collect().map(_.toSeq).toSet
    val batch = Robots.applyRules(
      pages.toDF("doc_id", "domain", "path"), rules).collect().map(_.toSeq).toSet
    streamed shouldBe batch
    streamed.map(r => (r(0), r(3))) shouldBe
      Set((1L, true), (2L, false), (3L, false), (4L, false))
  }

  test("sitemap parse gates a stream of arriving site files, equal to batch") {
    // Same posture as the WET gate: parseSitemaps is a stateless
    // projection + generate, so the graph runs unchanged on a
    // readStream of (site, content) sitemap documents.
    import graft.ext.Sitemap
    implicit val sqlCtx = spark.sqlContext
    val entries = Seq(
      (1L, "a", "https://a.com/1", "2026-01-03", "0.8"),
      (2L, "a", "https://a.com/2", "2026-01-04", "0.5"),
      (3L, "b", "https://b.org/3", "2026-01-05", "1.0"))
      .toDF("doc_id", "site", "loc", "lastmod", "priority")
    val files = Sitemap.renderSitemaps(entries).as[(String, String)].collect().toSeq
    val mem = MemoryStream[(String, String)]
    mem.addData(files: _*)
    val q = Sitemap.parseSitemaps(mem.toDF().toDF("site", "content"))
      .writeStream.format("memory").queryName("sitemap_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val streamed = spark.table("sitemap_gate").collect().map(_.toSeq).toSet
    val batch = Sitemap.parseSitemaps(files.toDF("site", "content"))
      .collect().map(_.toSeq).toSet
    streamed shouldBe batch
    streamed.size shouldBe 3
  }

  test("wet parse gates a stream of arriving crawl files, equal to batch") {
    // The ingest front door: WET files land continuously; parseRecords
    // is a stateless projection + generate, so the SAME Column graph
    // runs on a readStream of (shard, content) with no rewrite and no
    // state — records flow out per micro-batch.
    import graft.ext.Warc
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (0L, "first doc words"), (1L, "second"), (2L, ""), (3L, "third one"))
      .toDF("doc_id", "text")
      .withColumn("url", concat(lit("https://ex.com/"), col("doc_id")))
      .withColumn("shard", pmod(col("doc_id"), lit(2)))
    val files = Warc.renderFiles(docs)
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    mem.addData(files: _*)
    val q = Warc.parseRecords(mem.toDF().toDF("shard", "content"))
      .writeStream.format("memory").queryName("wet_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val streamed = spark.table("wet_gate")
      .select("rec_id", "uri", "content_length", "payload", "intact")
      .collect().map(_.toSeq).toSet
    val batch = Warc.parseRecords(files.toDF("shard", "content"))
      .select("rec_id", "uri", "content_length", "payload", "intact")
      .collect().map(_.toSeq).toSet
    streamed shouldBe batch
    streamed.size shouldBe 4
  }

  test("redirect gate rewrites a stream of pages to final targets, equal to batch") {
    // The streaming twin of resolveRedirects: pointer doubling runs in
    // batch; the resolved (src -> final) map broadcasts into a
    // stream-static join that rewrites arriving pages to their crawl
    // identity — zero state, so stream ≡ batch exactly.
    import graft.ext.{Dedup, Warc}
    implicit val sqlCtx = spark.sqlContext
    // chain a -> b -> c, 2-cycle d <-> e, plain page f
    val edges = Seq(
      ("https://ex.com/a", "https://ex.com/b"),
      ("https://ex.com/b", "https://ex.com/c"),
      ("https://ex.com/d", "https://ex.com/e"),
      ("https://ex.com/e", "https://ex.com/d"))
      .toDF("src", "dst")
      .select(Dedup.normalizeUrl(col("src")).as("src"),
        Dedup.normalizeUrl(col("dst")).as("dst"))
    val resolved = Warc.resolveRedirects(edges).localCheckpoint()
    // arriving pages dressed with case/scheme noise the gate must shed
    val pages = Seq(
      (0L, "HTTPS://ex.com/a"), (1L, "http://EX.com/b"),
      (2L, "https://ex.com/c"), (3L, "https://ex.com/d"),
      (4L, "https://ex.com/f"))
    val cols = Seq("doc_id", "url_norm", "final_norm", "redirected", "looped")
    val mem = MemoryStream[(Long, String)]
    mem.addData(pages: _*)
    val q = Warc.gateRedirects(mem.toDF().toDF("doc_id", "url"), resolved)
      .writeStream.format("memory").queryName("redirect_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val streamed = spark.table("redirect_gate")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val batch = Warc.gateRedirects(pages.toDF("doc_id", "url"), resolved)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    streamed shouldBe batch
    // and the semantics themselves: a/b rewrite to c, d flags looped,
    // c and f pass through
    val byId = spark.table("redirect_gate").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("final_norm"), r.getAs[Boolean]("redirected"),
          r.getAs[Boolean]("looped")))).toMap
    byId(0L) shouldBe (("ex.com/c", true, false))
    byId(1L) shouldBe (("ex.com/c", true, false))
    byId(2L) shouldBe (("ex.com/c", false, false))
    byId(3L) shouldBe (("ex.com/d", false, true))
    byId(4L) shouldBe (("ex.com/f", false, false))
  }

  test("url trap gate filters a stream of discovered URLs, equal to batch") {
    // The frontier's admission point: discovered URLs arrive
    // continuously; urlTrapFlags is a stateless per-row projection,
    // so the SAME graph gates a readStream with no rewrite.
    import graft.ext.Dedup
    implicit val sqlCtx = spark.sqlContext
    val urls = Seq(
      (0L, "h.com/a/b"), (1L, "h.com/p/q/p/q/p"),
      (2L, "h.com/" + Seq.tabulate(9)(i => s"s$i").mkString("/")),
      (3L, "h.com/" + "z" * 130))
    val mem = MemoryStream[(Long, String)]
    mem.addData(urls: _*)
    val q = Dedup.urlTrapFlags(mem.toDF().toDF("doc_id", "url_norm"))
      .writeStream.format("memory").queryName("trap_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true
    val cols = Seq("doc_id", "depth", "too_deep", "too_long", "looping",
      "trapped")
    val streamed = spark.table("trap_gate")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val batch = Dedup.urlTrapFlags(urls.toDF("doc_id", "url_norm"))
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    streamed shouldBe batch
    spark.table("trap_gate").where(col("trapped"))
      .select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 2L, 3L)
  }
}
