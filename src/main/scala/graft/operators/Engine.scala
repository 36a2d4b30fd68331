package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.blueprint.Blueprint

/**
 * End-to-end materialization — the Spark analog of the reference's
 * `generate_datapoints` (src/main.py:643-665): per generator
 * generate → noise → anomalies → int-cast, union'd into ONE long frame
 * `(generator_id, t, value LONG)` so Catalyst sees a single fused plan
 * per blueprint.
 */
object Engine {

  def materialize(spark: SparkSession, bp: Blueprint, seed: Long): DataFrame = {
    require(bp.generators.nonEmpty, "blueprint has no generators")
    // Plan-size control at high generator counts: a blueprint is one
    // frame per generator union'd together, which is fine at 6
    // generators but makes Catalyst chew a 10,000-branch union at
    // fleet scale. Square/constant generators without noise/anomalies
    // are pure functions of (t, params), so they collapse into ONE
    // range scan × broadcast parameter table ([[Generators.squareBulk]]).
    val (bulkable, individual) = bp.generators.partition { g =>
      (g.shape == "square" || g.shape == "constant") &&
        !g.config.noiseEnabled && g.config.anomalies.isEmpty
    }
    val bulkFrame =
      if (bulkable.isEmpty) Nil
      else Seq(Transforms.intCast(Generators.squareBulk(spark, bulkable))
        .select(col(Transforms.Gid), col("t"), col("value")))
    val perGen = individual.map { gen =>
      val raw = Generators.forSpec(spark, gen, seed)
      val noised = Transforms.applyNoise(raw, gen.config, seed)
      val withAnomalies = Transforms.applyAnomalies(
        noised, gen.config.anomalies, gen.config.numPoints, seed, gen.id)
      Transforms.intCast(withAnomalies)
        .select(col(Transforms.Gid), col("t"), col("value"))
    }
    (bulkFrame ++ perGen).reduce(_ unionByName _)
  }

  /**
   * Materialized series → zero-filled slot view, the transport unit of the
   * reference (one record per time slot, src/main.py:686-707). Length of
   * the cycle = max series length (lexicographic-max bug fixed, §2.8).
   */
  def slotView(spark: SparkSession, bp: Blueprint, series: DataFrame): DataFrame = {
    val maxN = bp.generators.map(_.config.numPoints).max
    Transforms.zeroFillAlign(series, bp.generators.map(_.id), maxN)
  }

  /**
   * Full blueprint execution (EP2 + EP3, SURVEY §3): materialize, route
   * each target's view, apply its delivery mode, and produce the
   * per-target activity frame a cluster job would write/deliver:
   *
   *  - s3/put   → fake-object corpus frame (key, body, content_type, acl)
   *  - s3/get   → GetObject request frame
   *  - cloudwatch → metric-data frame
   *  - lambda / anything else → delivery-envelope frame (slicing per
   *    `slice_size`, grouped mode per `group_datapoints`)
   *
   * Returned keyed by target index (targets have no ids in the
   * reference). One materialized series frame feeds every target —
   * Catalyst reuses the plan; at scale, persist `series` first.
   */
  def execute(spark: SparkSession, bp: Blueprint, seed: Long,
      timestamp: Column = date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss").cast("timestamp"))
      : Seq[(Int, String, DataFrame)] = {
    import graft.sources.Sinks
    val series = Engine.materialize(spark, bp, seed)
    bp.targets.zipWithIndex.map { case (target, i) =>
      val routed = Dispatch.routeToTarget(series, target)
      val sliceSize = target.raw.long("slice_size", 0L)
      val sliced =
        if (sliceSize > 0 && !target.groupDatapoints)
          Dispatch.sliceDatapoints(routed, sliceSize)
        else routed
      val frame = (target.tpe, target.raw.string("action", "get")) match {
        case ("s3", "put")  => Sinks.fakeObjects(sliced, target, seed)
        case ("s3", _)      => Sinks.getRequests(sliced, target, seed)
        case ("cloudwatch", _) => Sinks.metricData(sliced, bp, timestamp)
        case _ =>
          Dispatch.envelopes(sliced, timestamp,
            targetJson(target), target.groupDatapoints)
      }
      (i, target.tpe, frame)
    }
  }

  /** Target spec minus `generators`/`client`, as the envelope's `target`
    * field (src/main.py:813-817). */
  private def targetJson(target: graft.blueprint.TargetSpec): String = {
    val keep = target.raw.entries -- Seq("generators", "client")
    keep.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v.toString }
      .mkString("{", ",", "}")
  }
}
