package graft

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import graft.blueprint.Blueprint
import graft.operators.Engine

/** Typed API edge (SURVEY §1.2): the canonical long IR frame as a
  * `Dataset[DataPoint]` for callers who want compile-time row types;
  * internally everything stays DataFrame (dynamic schema, full
  * codegen). */
final case class DataPoint(generatorId: String, t: Long, value: Long)

object TypedApi {
  implicit val dataPointEncoder: Encoder[DataPoint] = Encoders.product[DataPoint]

  /** Materialize a blueprint as a typed Dataset. */
  def materialize(spark: SparkSession, bp: Blueprint, seed: Long): Dataset[DataPoint] =
    Engine.materialize(spark, bp, seed)
      .withColumnRenamed("generator_id", "generatorId")
      .as[DataPoint]
}
