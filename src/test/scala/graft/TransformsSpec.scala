package graft

import org.apache.spark.sql.functions._
import graft.blueprint.{AnomalySpec, Config}
import graft.operators.Transforms

/** Transforms T1-T5 (SURVEY §2.2). */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def frame(vals: Seq[Double], id: String = "g") =
    vals.zipWithIndex.map { case (v, t) => (id, t.toLong, v) }
      .toDF("generator_id", "t", "value")

  test("scale_range: ceil((x-mn)/(mx-mn)*(hi-lo)+lo) (src/main.py:340-357)") {
    val df = Transforms.scaleRange(frame(Seq(0.0, 5.0, 10.0)), 1, 21)
    seriesOf(df).map(_._2) shouldBe Seq(1.0, 11.0, 21.0)
    // non-integral points get ceil'd
    val df2 = Transforms.scaleRange(frame(Seq(0.0, 1.0, 3.0)), 0, 2)
    seriesOf(df2).map(_._2) shouldBe Seq(0.0, 1.0, 2.0)
  }

  test("scale_range is per-generator, not global") {
    val df = frame(Seq(0.0, 10.0), "a") union frame(Seq(100.0, 200.0), "b")
    val out = Transforms.scaleRange(df, 0, 1)
    out.where($"generator_id" === "a").select("value").collect().map(_.getDouble(0)).sorted shouldBe Array(0.0, 1.0)
    out.where($"generator_id" === "b").select("value").collect().map(_.getDouble(0)).sorted shouldBe Array(0.0, 1.0)
  }

  test("noise: rescaled realized sample added, clamped at 0, bounds hold (src/main.py:588-604)") {
    val cfg = Config.of("""{"noise_min":1,"noise_max":5}""")
    val base = frame(Seq.fill(300)(10.0))
    val out = seriesOf(Transforms.applyNoise(base, cfg, 42L)).map(_._2)
    // realized noise is min-max rescaled to exactly [1,5] then ceil'd → ints 1..5
    all(out) should (be >= 11.0 and be <= 15.0)
    out.min shouldBe 11.0 // min-max scaling guarantees the extremes are hit
    out.max shouldBe 15.0
    // negative base + noise clamps at 0
    val neg = frame(Seq.fill(50)(-20.0))
    val outNeg = seriesOf(Transforms.applyNoise(neg, cfg, 42L)).map(_._2)
    all(outNeg) shouldBe 0.0
  }

  test("noise disabled when either bound is 0 (truthiness gate, src/main.py:599)") {
    val base = frame(Seq(1.0, 2.0, 3.0))
    val out = Transforms.applyNoise(base, Config.of("""{"noise_min":0,"noise_max":5}"""), 42L)
    seriesOf(out).map(_._2) shouldBe Seq(1.0, 2.0, 3.0)
  }

  test("anomalies: counts slots in [start,end] overwritten by formula; others untouched (src/main.py:606-641)") {
    val base = frame(Seq.tabulate(100)(_.toDouble))
    val spec = AnomalySpec(Some(10L), Some(20L), 5L, Some("1000 + t"))
    val out = seriesOf(Transforms.applyAnomalies(base, Seq(spec), 100L, 42L, "g"))
    val changed = out.filter { case (t, v) => v != t.toDouble }
    changed.size should be <= 5
    changed.size should be >= 1
    all(changed.map(_._1)) should (be >= 10L and be <= 20L)
    changed.foreach { case (t, v) => v shouldBe 1000.0 + t }
  }

  test("anomaly default formula = (int(max)+1)^2, max computed pre-injection (src/main.py:628,639)") {
    val base = frame(Seq(1.0, 2.0, 7.9))
    val spec = AnomalySpec(Some(0L), Some(2L), 10L, None)
    val out = seriesOf(Transforms.applyAnomalies(base, Seq(spec), 3L, 1L, "g"))
    // int(7.9)=7 → (7+1)^2 = 64; with counts=10 over 3 slots every slot is hit w.h.p.
    out.map(_._2).foreach(v => Seq(1.0, 2.0, 7.9, 64.0) should contain(v))
    out.map(_._2) should contain(64.0)
  }

  test("anomalies: start/end clamped to series length (src/main.py:622-623)") {
    val base = frame(Seq(1.0, 2.0, 3.0))
    val spec = AnomalySpec(Some(100L), Some(200L), 5L, Some("99"))
    // start clamps to n-1=2, end to 2 → only slot 2 eligible
    val out = seriesOf(Transforms.applyAnomalies(base, Seq(spec), 3L, 1L, "g"))
    out.take(2).map(_._2) shouldBe Seq(1.0, 2.0)
    out(2)._2 shouldBe 99.0
  }

  test("int cast truncates toward zero like numpy astype(int) (src/main.py:663)") {
    val df = Transforms.intCast(frame(Seq(1.9, -1.9, 0.5)))
    longSeriesOf(df).map(_._2) shouldBe Seq(1L, -1L, 0L)
  }

  test("zero-fill aligns to max length with zeros (src/main.py:684-693, fix 7)") {
    val df = Transforms.intCast(frame(Seq(5.0, 5.0), "a") union frame(Seq(7.0, 7.0, 7.0, 7.0), "b"))
    val out = Transforms.zeroFillAlign(df, Seq("a", "b"), 4L)
    out.count() shouldBe 8
    out.where($"generator_id" === "a" && $"t" >= 2).select("value")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(0L, 0L)
  }
}
