package graft.examples

import org.apache.spark.sql.SparkSession

/**
 * Plan-audit utility: executes the named `SparkEntry.queries` on a
 * small sf dir and prints each query's Exchange lines — the quick
 * "does this shuffle where I think it does" check behind the
 * ScaleSpec plan pins. Usage:
 *
 *   sbt "runMain graft.examples.PlanAudit <sfDir> <query> [query ...]"
 *
 * (No queries → audits every cataloged query; expect a long run.)
 */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanAudit <sfDir> [query ...]")
    val dir = args.head
    val names =
      if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val q = graft.SparkEntry.queries(n)(spark, dir)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      val ex = plan.linesIterator
        .filter(_.contains("Exchange")).map(_.trim.take(110)).toSeq
      println(s"=== $n exchanges=${ex.size}")
      ex.foreach(l => println("    " + l))
    }
    spark.stop()
  }
}
