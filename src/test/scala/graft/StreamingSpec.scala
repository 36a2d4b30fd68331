package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.PacedRunner

/** Streaming delivery shell (SURVEY §2.9): tick→slot resolution, cycle
  * repeat, and a real micro-batch run against the memory sink. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val slots = Seq((0L, 10L), (1L, 11L), (2L, 12L))
    .toDF("t", "value")

  test("tick → slot resolution wraps at the cycle length (14-day repeat, README.md:41)") {
    val got = PacedRunner.resolveSlots(Seq(0L, 1L, 2L, 3L, 4L, 7L).toDF("value"), slots, 3L)
      .select(col("tick"), col("t"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    got shouldBe Seq((0L, 0L, 10L), (1L, 1L, 11L), (2L, 2L, 12L),
      (3L, 0L, 10L), (4L, 1L, 11L), (7L, 1L, 11L))
  }

  test("streaming micro-batches deliver slots in tick order to the memory sink") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    mem.addData(0L, 1L, 2L, 3L) // before start: AvailableNow snapshots at start
    val q = PacedRunner.resolveSlots(mem.toDF(), slots, 3L)
      .writeStream.format("memory").queryName("paced_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("paced_test").orderBy("tick")
      .collect().map(r => (r.getAs[Long]("tick"), r.getAs[Long]("t"), r.getAs[Long]("value")))
    rows.toSeq shouldBe Seq((0L, 0L, 10L), (1L, 1L, 11L), (2L, 2L, 12L), (3L, 0L, 10L))
  }
}
