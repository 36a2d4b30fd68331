package graft.examples

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named SparkEntry queries —
  * the plan-hygiene review loop (SURVEY §8 "Plan hygiene").
  *
  * usage: runMain graft.examples.ExplainQ <sfDir> <query> [query ...]
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
