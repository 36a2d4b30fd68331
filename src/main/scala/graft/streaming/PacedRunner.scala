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

  /**
   * At-most-once paced delivery (the reference's delete-before-process,
   * src/main.py:726-731). Structured Streaming's foreachBatch is
   * at-least-once under retry (offsets commit after the batch), so
   * at-most-once is layered on with a claim ledger: each tick is
   * appended to `ledgerPath` BEFORE its side effect runs; on a retried
   * batch, already-claimed ticks are dropped. A tick whose delivery
   * crashed after the claim is therefore skipped forever — exactly the
   * reference's "no time machine" semantics (README.md:282).
   *
   * `deliver` receives (tick, slot frame for that tick).
   */
  def startAtMostOnce(spark: SparkSession, slots: DataFrame, cycleLength: Long,
      ledgerPath: String, deliver: (Long, DataFrame) => Unit,
      ticks: DataFrame, trigger: Trigger): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.SaveMode
    resolveSlots(ticks, slots, cycleLength)
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sess = batch.sparkSession
        // Missing ledger (first run) reads as empty; any OTHER read
        // failure must propagate — treating a transient read error as
        // "nothing claimed" would re-deliver and break at-most-once.
        val fs = org.apache.hadoop.fs.FileSystem.get(
          java.net.URI.create(ledgerPath), sess.sparkContext.hadoopConfiguration)
        val ledgerExists = fs.exists(new org.apache.hadoop.fs.Path(ledgerPath))
        val claimed =
          if (ledgerExists) sess.read.parquet(ledgerPath).select("tick")
          else sess.range(0).select(col("id").as("tick"))
        val fresh = batch.select("tick").distinct()
          .join(claimed, Seq("tick"), "left_anti")
          .collect().map(_.getLong(0)).sorted
        import sess.implicits._
        // Claim granularity is ONE tick, immediately before its own
        // delivery (the reference deletes exactly one message before
        // processing it, src/main.py:726-731): a crash mid-batch drops
        // only the tick whose delivery was attempted, not every
        // unattempted tick behind it.
        fresh.foreach { t =>
          Seq(t).toDF("tick").write.mode(SaveMode.Append).parquet(ledgerPath)
          deliver(t, batch.where(col("tick") === t).drop("tick"))
        }
      }
      .start()
  }
}
