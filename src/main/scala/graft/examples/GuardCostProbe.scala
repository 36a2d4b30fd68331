package graft.examples

import org.apache.spark.sql.SparkSession

/** One-session A/B of the round-13 hot-bucket guards: times each dedup
  * pair finder with its default guard vs guard disabled
  * (maxBucketSize = Int.MaxValue / prune off) in the SAME warmed JVM,
  * so the delta is the guard's cost, not JIT noise. */
object GuardCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import graft.ext.Dedup
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"probe":"guard_cost","case":"$label%s","sec_min":${ts.min}%.3f}""")
    }
    time("containment_capped")(Dedup.containmentPairs(docs))
    time("containment_uncapped")(Dedup.containmentPairs(docs, maxBucketSize = Int.MaxValue))
    time("substring_pruned")(Dedup.exactSubstringPairs(docs))
    time("substring_unpruned")(Dedup.exactSubstringPairs(docs,
      pruneRareWindows = false, maxBucketSize = Int.MaxValue))
    time("source_overlap_capped")(Dedup.sourceOverlap(docs))
    time("source_overlap_uncapped")(Dedup.sourceOverlap(docs,
      maxGroupsPerShingle = Int.MaxValue))
    spark.stop()
  }
}
