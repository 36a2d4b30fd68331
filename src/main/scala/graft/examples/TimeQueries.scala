package graft.examples

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer for local perf iteration: times the named
  * `SparkEntry.queries` entries (all if none given) against a sf dir,
  * running each twice so warm-cache effects are visible. Not part of
  * the driver contract — `graft.Bench` is the measured surface.
  *
  * usage: runMain graft.examples.TimeQueries <sfDir> [query ...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).collect()
    val runs = scala.util.Try(sys.env("SPARK_GRAFT_TIME_RUNS").trim.toInt)
      .getOrElse(2).max(1)
    names.foreach { n =>
      val ts = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"TIME $n run$i $t%.2f s")
        t
      }
      println(f"TIME_MIN $n ${ts.min}%.3f s")
    }
    spark.stop()
  }
}
