package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch profiler for PQ stage costs (delete or keep; not driver-facing). */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $n ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cb = t("pqTrain") { graft.ext.Similarity.pqTrain(emb, 4, 16, 3, 42L) }
    t("pqEncode") { graft.ext.Similarity.pqEncode(emb, cb)
      .write.format("noop").mode("overwrite").save() }
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    t("pqTopK") { graft.ext.Similarity.pqTopK(emb, queries, cb, 5)
      .write.format("noop").mode("overwrite").save() }
    t("bruteForce") { graft.ext.Similarity.bruteForceTopK(emb, queries, 5)
      .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
