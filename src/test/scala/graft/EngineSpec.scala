package graft

import org.apache.spark.sql.functions._
import graft.blueprint.BlueprintParser
import graft.operators.{Dispatch, Engine}
import graft.sources.Sinks

/** End-to-end materialization (EP2, SURVEY §3) + sinks + the driver
  * contract surface. */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("flagship blueprint materializes every generator, long-typed, deterministic") {
    val bp = BlueprintParser.parse(SparkEntry.FlagshipBlueprintJson)
    val series = Engine.materialize(spark, bp, 42L).cache()
    val counts = series.groupBy("generator_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts shouldBe Map("ts1" -> 2000L, "ts2" -> 50L, "ts3" -> 2000L,
      "ts4" -> 2000L, "ts5" -> 2000L)
    series.schema("value").dataType.typeName shouldBe "long"
    // deterministic re-materialization
    val again = Engine.materialize(spark, bp, 42L)
    series.unionByName(again).distinct().count() shouldBe series.distinct().count()
    series.unpersist()
  }

  test("slot view zero-fills short generators to the longest cycle") {
    val bp = BlueprintParser.parse(SparkEntry.FlagshipBlueprintJson)
    val series = Engine.materialize(spark, bp, 42L)
    val slots = Engine.slotView(spark, bp, series)
    slots.count() shouldBe 5 * 2000L
    // ts2 has 50 points; slots 50.. must be zero-filled
    slots.where($"generator_id" === "ts2" && $"t" >= 50)
      .agg(sum("value")).head().getLong(0) shouldBe 0L
  }

  test("slot records: one row per slot with all generators present") {
    val recs = SparkEntry.entry(spark)
    recs.count() shouldBe 2000L
    val m = recs.orderBy("t").head().getMap[String, Long](1)
    m.keys.toSeq.sorted shouldBe Seq("ts1", "ts2", "ts3", "ts4", "ts5")
  }

  test("fake-object corpus: rows = sum of values, deterministic, well-formed keys") {
    val bp = BlueprintParser.parse(
      """{"generators":[{"id":"g1","shape":"constant","config":{"num_points":10,"constant":3}}],
        | "targets":[{"type":"s3","action":"put","prefix":"p/","generators":["g1"],
        |             "fake_types":["sentence","email"],"fake_counts":2}]}""".stripMargin)
    val series = Engine.materialize(spark, bp, 42L)
    val objs = Sinks.fakeObjects(Dispatch.routeToTarget(series, bp.targets.head),
      bp.targets.head, 42L).cache()
    objs.count() shouldBe 30L // 10 slots × value 3
    val keys = objs.select("key").collect().map(_.getString(0))
    all(keys.toSeq) should fullyMatch regex """p/(sentence|email|mixed)/[0-9a-f-]{36}\.fake"""
    val bodies = objs.select("body").collect().map(_.getString(0))
    all(bodies.toSeq) should startWith("Sample Report")
    // disclaimer + fake_counts lines
    all(bodies.map(_.linesIterator.size).toSeq) shouldBe 4
    // deterministic
    val again = Sinks.fakeObjects(Dispatch.routeToTarget(series, bp.targets.head),
      bp.targets.head, 42L)
    again.exceptAll(objs).count() shouldBe 0L
    objs.unpersist()
  }

  test("metric frame carries shape dimension from the blueprint (src/main.py:1059-1069)") {
    val bp = BlueprintParser.parse(
      """{"generators":[{"id":"g1","shape":"constant","config":{"num_points":5,"constant":2}}],
        | "targets":[{"type":"cloudwatch","generators":["g1"]}]}""".stripMargin)
    val series = Engine.materialize(spark, bp, 42L)
    val metrics = Sinks.metricData(series, bp, lit(0L)).collect()
    metrics.length shouldBe 5
    all(metrics.map(_.getAs[String]("shape")).toSeq) shouldBe "constant"
    all(metrics.map(_.getAs[String]("metric_name")).toSeq) shouldBe "Timeseries"
  }

  test("driver contract: every oracle has a query; queries all named sanely") {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    o.keySet.diff(q.keySet) shouldBe empty
    q.keySet.foreach(k => k should fullyMatch regex """[a-z0-9_]+""")
  }
}
