package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.blueprint.TargetSpec

/**
 * Reshaping / dispatch operators — the reference's "exchange" layer
 * (SURVEY §2.3). The reference fans out via SQS messages and async Lambda
 * self-invocations; here every fan-out is a frame transformation and
 * parallelism is Spark task parallelism.
 */
object Dispatch {

  import Transforms.Gid

  /**
   * D1 — transpose to time-slot records (src/main.py:667-709): one row per
   * slot carrying `{generator_id: value}`. Map-shaped (schema stays fixed
   * as generators are added — the scale-friendly form). Entries are sorted
   * by generator id so the JSON body is deterministic.
   */
  def slotRecords(zeroFilled: DataFrame): DataFrame =
    zeroFilled.groupBy("t")
      .agg(map_from_entries(
        array_sort(collect_list(struct(col(Gid), col("value")))))
        .as("datapoints"))

  /** Slot record → SQS-style message body JSON `{"ts1":12,...}` with the
    * reference's dedup id `<batch_id>:<slot>` (src/main.py:697-707). */
  def slotMessages(slotRecords: DataFrame, batchId: String): DataFrame =
    slotRecords.select(
      col("t"),
      to_json(col("datapoints")).as("message_body"),
      lit("timeseries").as("message_group_id"),
      concat(lit(batchId), lit(":"), col("t")).as("message_deduplication_id"))

  /**
   * D4 — route a slot's datapoints to a target: the per-target view is a
   * simple membership filter (src/main.py:766, 795).
   */
  def routeToTarget(series: DataFrame, target: TargetSpec): DataFrame =
    series.where(col(Gid).isin(target.generators: _*))

  /**
   * D5 — slice a datapoint value into work units (`slice_num`,
   * src/main.py:95-113): value v, slice s → ⌊v/s⌋ copies of s plus the
   * remainder; v=0 or s≤0 pass through unsliced. The reference runs one
   * async Lambda per slice; here each slice is a row (explode) and Spark
   * tasks provide the parallelism.
   */
  def sliceExpr(v: Column, sliceSize: Long): Column = {
    if (sliceSize <= 0) array(v)
    else {
      val s = lit(sliceSize)
      when(v === 0, array(v)).otherwise(
        concat(
          array_repeat(s, (v / s).cast("int")),
          // remainder, dropped when it is 0 (filter keeps the array typed)
          filter(array(pmod(v, s)), x => x > 0)))
    }
  }

  def sliceDatapoints(routed: DataFrame, sliceSize: Long): DataFrame =
    routed
      .withColumn("slice", explode(sliceExpr(col("value").cast("long"), sliceSize)))
      .drop("value").withColumnRenamed("slice", "value")

  /**
   * D6/D7 — delivery envelope (src/main.py:804-828; wire format at
   * README.md:292-313, FIXTURES A4). Grouped mode packs all of a slot's
   * routed datapoints into one payload; single mode one (sliced) datapoint
   * per payload. `targetJson` is the blueprint target minus
   * `generators`/`client`, rendered once at plan time.
   */
  def envelopes(routed: DataFrame, timestamp: Column, targetJson: String,
      grouped: Boolean): DataFrame = {
    val dp = struct(col(Gid).as("generator_id"), col("value"))
    val dps =
      if (grouped)
        routed.groupBy("t")
          .agg(array_sort(collect_list(dp)).as("datapoints"))
      else
        routed.select(col("t"), array(dp).as("datapoints"))
    dps.select(
      col("t"),
      lit("amazon-macie-activity-generator").as("source"),
      lit("execute-datapoints").as("action"),
      date_format(timestamp, "yyyy-MM-dd'T'HH:mm:ss'Z'").as("timestamp"),
      col("datapoints"),
      lit(targetJson).as("target"))
  }
}
