package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/**
 * Streaming delivery shell (SURVEY §2.9) — the Spark analog of the
 * reference's CloudWatch-Events-drives-SQS-pop loop: a 1-minute
 * processing-time tick consumes exactly one time slot per tick and
 * fans it out to targets.
 *
 * Mapping of the reference's semantics:
 *  - tick source = `rate` stream (value = monotonically increasing tick
 *    counter), Trigger.ProcessingTime — processing-time only, no
 *    watermarks, matching "no time machine" (README.md:282);
 *  - slot index = tick % cycleLength — when the queue drains the series
 *    repeats, matching the 14-day SQS retention cycle (README.md:41);
 *  - at-most-once = the checkpointed rate offset advances whether or not
 *    the tick's side effect succeeded (delete-before-process,
 *    src/main.py:726-731); a failed tick's slot is skipped, never
 *    re-delivered.
 *
 * The slot lookup joins each (tiny) tick micro-batch against the
 * materialized slot frame — a broadcast of ticks into the slots table,
 * not a scan per tick.
 */
object PacedRunner {

  /** Attach tick→slot resolution to a tick frame (batch or streaming).
    * The tick counter column is renamed `tick` so it can't collide with
    * the slot frame's own columns (e.g. `value`). */
  def resolveSlots(ticks: DataFrame, slots: DataFrame, cycleLength: Long): DataFrame = {
    val withSlot = ticks.withColumnRenamed("value", "tick")
      .withColumn("t", pmod(col("tick"), lit(cycleLength)))
    withSlot.join(slots, "t")
  }

  /**
   * Start the paced delivery query: one slot per trigger into `sink`
   * (e.g. "memory"/"parquet"/foreachBatch caller-side). Caller owns
   * lifecycle (awaitTermination / stop).
   */
  def start(spark: SparkSession, slots: DataFrame, cycleLength: Long,
      trigger: Trigger = Trigger.ProcessingTime("1 minute"),
      ticksPerSecond: Double = 1.0 / 60.0): DataStreamWriter[org.apache.spark.sql.Row] = {
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", ticksPerSecond.toString)
      .load()
      .select(col("value"), col("timestamp"))
    resolveSlots(ticks, slots, cycleLength)
      .writeStream
      .outputMode("append")
      .trigger(trigger)
  }
}
