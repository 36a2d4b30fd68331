package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.blueprint.{AnomalySpec, Config}
import graft.dsl.Formula
import graft.functions.Rng

/**
 * Per-series transforms over the canonical long IR frame
 * `(generator_id STRING, t LONG, value DOUBLE)` — SURVEY §2.2.
 *
 * All operators are `DataFrame => DataFrame`, shuffle-light by design:
 * the only aggregations are per-generator scalar min/max (tiny results,
 * broadcast back), never `Window.partitionBy()` over the whole frame and
 * never `collect()` — so plans scale with data volume, not series count.
 */
object Transforms {

  val Gid = "generator_id"

  /**
   * Min-max rescale each generator's series to [lo, hi], then ceil —
   * reference `scale_range` (src/main.py:340-357):
   * `ceil((x - min(x)) / (max(x) - min(x)) * (hi - lo) + lo)`.
   *
   * Two deliberate, documented deviations (SURVEY §2.8):
   *  - constant series (max==min, NaN in the reference) map to `lo`;
   *  - the pre-ceil value is quantized to 1e-9 (`round(_, 9)`) so the
   *    FP edge at exact integers is deterministic across engines (Java
   *    and C libm `sin` may differ in the last ulp; without quantization
   *    a 1-ulp difference at the series argmin flips `ceil` by 1).
   */
  def scaleRange(df: DataFrame, lo: Double, hi: Double): DataFrame = {
    val stats = df.groupBy(Gid)
      .agg(min("value").as("__mn"), max("value").as("__mx"))
    df.join(broadcast(stats), Gid)
      .withColumn("value", scaledExpr(col("value"), col("__mn"), col("__mx"), lo, hi))
      .drop("__mn", "__mx")
  }

  /** The scale expression itself, reusable on any column. */
  def scaledExpr(v: Column, mn: Column, mx: Column, lo: Double, hi: Double): Column = {
    val std = (v - mn) / (mx - mn)
    val scaled = std * lit(hi - lo) + lit(lo)
    when(mx === mn, lit(lo).cast("double"))
      .otherwise(ceil(round(scaled, 9)).cast("double"))
  }

  /**
   * Additive Gaussian noise — reference `apply_noise` (src/main.py:588-604):
   * draw N(0,1) per slot, min-max-rescale the *realized sample* to
   * [noise_min, noise_max] (NOT an analytic scaling — reference semantics),
   * add, clamp at 0. Disabled unless both bounds are nonzero (the
   * truthiness gate at src/main.py:599).
   */
  def applyNoise(df: DataFrame, cfg: Config, seed: Long): DataFrame = {
    if (!cfg.noiseEnabled) df
    else {
      val noisy = df.withColumn("__noise",
        Rng.gaussian(seed, "noise", col(Gid), col("t")))
      val stats = noisy.groupBy(Gid)
        .agg(min("__noise").as("__nmn"), max("__noise").as("__nmx"))
      noisy.join(broadcast(stats), Gid)
        .withColumn("__noise",
          scaledExpr(col("__noise"), col("__nmn"), col("__nmx"),
            cfg.noiseMin, cfg.noiseMax))
        .withColumn("value", greatest(lit(0.0), col("value") + col("__noise")))
        .drop("__noise", "__nmn", "__nmx")
    }
  }

  /**
   * Anomaly injection — reference `apply_anomalies` (src/main.py:606-641).
   * Per spec: clamp start/end to n-1, draw `counts` slots uniformly in
   * [start, end] **with replacement** (duplicates collide, last write
   * wins — but our formulas depend only on (t, series aggregates), so
   * collisions are idempotent), overwrite with the compiled formula or
   * the default `(int(max(series)) + 1) ** 2` (src/main.py:628, 639).
   *
   * `datapoint_max`/`max(datapoints)` are evaluated on the series as it
   * stands *before this spec's* injection (matching `datapoint_max`'s
   * scope; specs apply sequentially like the reference's loop).
   *
   * Slot sampling happens driver-side from the deterministic seed — the
   * sampled-slot table is `counts` rows, broadcast into the join.
   */
  def applyAnomalies(df: DataFrame, specs: Seq[AnomalySpec], numPoints: Long,
      seed: Long, generatorId: String): DataFrame = {
    specs.zipWithIndex.foldLeft(df) { case (cur, (spec, i)) =>
      applyOneAnomaly(cur, spec, numPoints, seed, generatorId, i)
    }
  }

  /**
   * The deterministic anomaly slot draws (uniform inclusive, with
   * replacement, deduplicated) for one spec. Public so the DuckDB
   * oracle builder can inject the SAME slots as plan-time literals —
   * the sampling is pure driver-side Scala, which makes an exact
   * cross-engine oracle possible for anomaly injection.
   */
  def anomalySlots(spec: AnomalySpec, n: Long, seed: Long,
      generatorId: String, specIdx: Int): Seq[Long] = {
    val start = math.min(spec.start.getOrElse(0L), n - 1)
    val end = math.min(spec.end.getOrElse(n - 1), n - 1)
    if (spec.counts <= 0 || end < start) return Nil
    val rng = new java.util.Random(seed ^
      scala.util.hashing.MurmurHash3.stringHash(s"$generatorId/anomaly/$specIdx").toLong)
    // floorMod, not abs%: abs(Long.MinValue) is negative (would land
    // below `start`), and floorMod's residual bias over a 64-bit draw
    // is a vanishing 2^-64 per slot.
    (0L until spec.counts)
      .map(_ => start + math.floorMod(rng.nextLong(), end - start + 1))
      .distinct
  }

  private def applyOneAnomaly(df: DataFrame, spec: AnomalySpec, n: Long,
      seed: Long, generatorId: String, specIdx: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val start = math.min(spec.start.getOrElse(0L), n - 1)
    val end = math.min(spec.end.getOrElse(n - 1), n - 1)
    if (spec.counts <= 0 || end < start) return df

    val slots = anomalySlots(spec, n, seed, generatorId, specIdx)
    val slotDf = slots.toDF("t").withColumn("__anom", lit(true))

    // Pre-injection aggregates feed datapoint_max / max(datapoints) refs.
    val stats = df.groupBy(Gid).agg(
      floor(max("value")).cast("double").as(Formula.DpMaxCol), // int(np.max(..))
      min("value").as(Formula.DpMinCol),
      count("*").cast("double").as(Formula.DpLenCol))

    val formulaCol: Column = spec.formula match {
      case Some(src) => Formula.compile(src)
      case None      => pow(col(Formula.DpMaxCol) + lit(1.0), 2.0)
    }

    df.join(broadcast(stats), Gid)
      .join(broadcast(slotDf), Seq("t"), "left")
      .withColumn("value",
        when(col("__anom").isNotNull, formulaCol.cast("double"))
          .otherwise(col("value")))
      .drop("__anom", Formula.DpMaxCol, Formula.DpMinCol, Formula.DpLenCol)
  }

  /**
   * Final int cast — reference `np.array(v).astype(int)` truncation toward
   * zero (src/main.py:663); Spark double→long casts truncate identically.
   */
  def intCast(df: DataFrame): DataFrame =
    df.withColumn("value", col("value").cast("long"))

  /**
   * Zero-fill alignment (src/main.py:684-693, with the lexicographic-max
   * bug fixed to max-by-length per SURVEY §2.8 fix 7): every generator is
   * extended to the longest series' length with zeros. Implemented as a
   * grid (range × generator ids) left-joined against the union frame —
   * no driver-side loops, scales with rows.
   */
  def zeroFillAlign(df: DataFrame, generatorIds: Seq[String], maxN: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val grid = spark.range(0, maxN).toDF("t")
      .crossJoin(broadcast(generatorIds.toDF(Gid)))
    grid.join(df, Seq(Gid, "t"), "left")
      .withColumn("value", coalesce(col("value"), lit(0L)))
  }
}
