package graft.examples

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Scheduling-overhead probe for loop-shaped queries (whose
 * localCheckpoint segments never appear in a final `explain`): runs
 * each named `SparkEntry.queries` entry under a listener and prints
 * the JOB / STAGE / TASK counts plus summed task time — the numbers
 * that expose per-round exchange and job overhead that plan dumps
 * can't show. Diagnostic only; `graft.Bench` stays the measured
 * surface.
 *
 * usage: runMain graft.examples.JobStats <sfDir> <query> [query ...]
 */
object JobStats {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobStats <sfDir> <query> [query ...]")
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    args.drop(1).foreach { n =>
      (1 to 2).foreach { run =>
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; wait for the bus to
        // empty (deterministic attribution — a fixed sleep only bounds
        // it) with a hard timeout as a hang guard
        org.apache.spark.graft.ListenerBridge
          .waitUntilListenerBusEmpty(spark.sparkContext, 10000)
        println(f"STATS $n run$run wall=$wall%.2f s jobs=${jobs.get}%d " +
          f"stages=${stages.get}%d tasks=${tasks.get}%d " +
          f"taskTime=${taskMs.get / 1000.0}%.1f s")
      }
    }
    spark.stop()
  }
}
