package graft

import org.apache.spark.sql.functions._
import graft.operators.Dispatch

/** Dispatch / exchange layer D1-D7 (SURVEY §2.3), including the
  * slice_num property suite (SURVEY §5.2). */
class DispatchSpec extends SparkSpec {
  import spark.implicits._

  private def slices(v: Long, s: Long): Seq[Long] = {
    val df = Seq(("g", 0L, v)).toDF("generator_id", "t", "value")
    Dispatch.sliceDatapoints(df, s).select("value").collect().map(_.getLong(0)).toSeq
  }

  test("slice_num reference vectors (src/main.py:95-113)") {
    slices(7, 3) shouldBe Seq(3, 3, 1)
    slices(6, 3) shouldBe Seq(3, 3)
    slices(2, 3) shouldBe Seq(2)
    slices(0, 3) shouldBe Seq(0)    // slice_num(0, s) = [0]
    slices(7, 0) shouldBe Seq(7)    // slice_size <= 0 → no slicing
    slices(350, 100) shouldBe Seq(100, 100, 100, 50) // README.md:225 example
  }

  test("slice_num properties: sum preserved, each slice ≤ size, count = ceil(v/s)") {
    // Batch the property sweep into ONE Spark job (a row per case) rather
    // than one job per case — keeps the suite fast.
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(60)((rnd.nextLong(501L), 1L + rnd.nextLong(60L)))
    val grouped = cases.groupBy(_._2)
    for ((s, cs) <- grouped) {
      val df = cs.zipWithIndex.map { case ((v, _), i) => (s"g$i", i.toLong, v) }
        .toDF("generator_id", "t", "value")
      val byT = Dispatch.sliceDatapoints(df, s)
        .groupBy("t").agg(sum("value").as("sum"), count(lit(1)).as("n"), max("value").as("mx"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      cs.zipWithIndex.foreach { case ((v, _), i) =>
        val (sm, n, mx) = byT(i.toLong)
        sm shouldBe v
        mx should be <= v.min(s).max(0L)
        if (v > 0) n shouldBe ((v + s - 1) / s) else n shouldBe 1L
      }
    }
  }

  test("slot records: one map per slot, zero-filled ids present (src/main.py:686-707)") {
    val df = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("b", 0L, 9L), ("b", 1L, 0L))
      .toDF("generator_id", "t", "value")
    val recs = Dispatch.slotRecords(df).orderBy("t").collect()
    recs.length shouldBe 2
    val m0 = recs(0).getMap[String, Long](1)
    m0("a") shouldBe 1L
    m0("b") shouldBe 9L
  }

  test("slot messages: FIFO group id + dedup id (src/main.py:697-707)") {
    val df = Seq(("a", 0L, 1L)).toDF("generator_id", "t", "value")
    val msg = Dispatch.slotMessages(Dispatch.slotRecords(df), "1700000000000").head()
    msg.getAs[String]("message_group_id") shouldBe "timeseries"
    msg.getAs[String]("message_deduplication_id") shouldBe "1700000000000:0"
    msg.getAs[String]("message_body") shouldBe """{"a":1}"""
  }

  test("routing filters to the target's generators (src/main.py:766,795)") {
    val df = Seq(("a", 0L, 1L), ("b", 0L, 2L), ("c", 0L, 3L))
      .toDF("generator_id", "t", "value")
    val target = graft.blueprint.TargetSpec("s3", groupDatapoints = false,
      Seq("a", "c"), graft.blueprint.Config.empty)
    Dispatch.routeToTarget(df, target).select("generator_id")
      .collect().map(_.getString(0)).sorted.toSeq shouldBe Seq("a", "c")
  }

  test("envelopes: grouped mode packs a slot into one payload (src/main.py:784-802)") {
    val df = Seq(("a", 0L, 1L), ("b", 0L, 2L), ("a", 1L, 3L))
      .toDF("generator_id", "t", "value")
    val env = Dispatch.envelopes(df, to_timestamp(lit("2026-01-02 03:04:05")),
      """{"type":"lambda"}""", grouped = true).orderBy("t").collect()
    env.length shouldBe 2
    env(0).getAs[String]("source") shouldBe "amazon-macie-activity-generator"
    env(0).getAs[String]("action") shouldBe "execute-datapoints"
    env(0).getAs[String]("timestamp") shouldBe "2026-01-02T03:04:05Z"
    env(0).getSeq[org.apache.spark.sql.Row](4).length shouldBe 2
    env(1).getSeq[org.apache.spark.sql.Row](4).length shouldBe 1
  }

  test("envelopes: single mode emits one payload per datapoint") {
    val df = Seq(("a", 0L, 1L), ("b", 0L, 2L)).toDF("generator_id", "t", "value")
    val env = Dispatch.envelopes(df, current_timestamp(), "{}", grouped = false)
    env.count() shouldBe 2
  }
}
