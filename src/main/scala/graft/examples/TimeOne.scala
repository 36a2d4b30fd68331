package graft.examples

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: args = queryName [sfDir] [runs] — the
  * Bench estimator (min-of-N, noop sink) for one query, used while
  * iterating on a plan without paying for the full suite. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"probe":"time_one","query":"$name%s","sec_min":${times.min}%.3f,"runs":$runs%d}""")
    spark.stop()
  }
}
