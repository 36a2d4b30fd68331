package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan inspector: prints the post-execution adaptive plan of a
  * SparkEntry query (args: name [sfDir]). Diagnostic only. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(name)(spark, dir)
    q.collect()
    println("=== FINAL PLAN " + name + " ===")
    println(q.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
