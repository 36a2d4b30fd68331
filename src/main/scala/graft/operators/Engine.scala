package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    bp.generators.map { gen =>
      val raw = Generators.forSpec(spark, gen, seed)
      val noised = Transforms.applyNoise(raw, gen.config, seed)
      val withAnomalies = Transforms.applyAnomalies(
        noised, gen.config.anomalies, gen.config.numPoints, seed, gen.id)
      Transforms.intCast(withAnomalies)
        .select(col(Transforms.Gid), col("t"), col("value"))
    }.reduce(_ unionByName _)
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
}
