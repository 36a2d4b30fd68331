package graft.examples

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-JOB attribution for multi-action queries ([[JobStats]] prints
  * one aggregate): runs each named `SparkEntry.queries` entry and
  * prints every job's id, call site (the action that launched it),
  * task count and summed task time — the instrument that says WHICH
  * checkpoint/collect inside a composed pipeline owns the task time.
  * Diagnostic only; `graft.Bench` stays the measured surface.
  *
  * usage: runMain graft.examples.JobTrace <sfDir> <query> [query ...]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobTrace <sfDir> <query> [query ...]")
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    val callSites = new TrieMap[Int, String]
    val stageToJob = new TrieMap[Int, Int]
    val taskMs = new TrieMap[Int, Long]
    val taskN = new TrieMap[Int, Int]
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        order.add(j.jobId)
        // the result stage's name IS the action call site
        // ("count at Recipe.scala:66")
        callSites.put(j.jobId,
          j.stageInfos.lastOption.map(_.name).getOrElse("?"))
        j.stageIds.foreach(sid => stageToJob.put(sid, j.jobId))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        stageToJob.get(t.stageId).foreach { jid =>
          taskN.put(jid, taskN.getOrElse(jid, 0) + 1)
          if (t.taskInfo != null)
            taskMs.put(jid, taskMs.getOrElse(jid, 0L) + t.taskInfo.duration)
        }
    })
    args.drop(1).foreach { n =>
      callSites.clear(); stageToJob.clear(); taskMs.clear(); taskN.clear()
      order.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBridge
        .waitUntilListenerBusEmpty(spark.sparkContext, 10000)
      println(f"TRACE $n wall=$wall%.2f s jobs=${callSites.size}%d")
      val it = order.iterator()
      while (it.hasNext) {
        val jid = it.next()
        println(f"  JOB $jid%3d tasks=${taskN.getOrElse(jid, 0)}%4d " +
          f"taskTime=${taskMs.getOrElse(jid, 0L) / 1000.0}%7.2f s  " +
          callSites.getOrElse(jid, "?"))
      }
    }
    spark.stop()
  }
}
