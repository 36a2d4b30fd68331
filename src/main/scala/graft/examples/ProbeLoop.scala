package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Html, LinkGraph}

/** Scratch probe: materialize hostRank's per-round plan by running the
  * loop with NO mid-loop checkpoints (checkpointEvery > iterations),
  * so the final explain holds every round — the view the per-query
  * ExplainQ can't give (checkpoints execute during construction).
  * Diagnostic only. usage: runMain graft.examples.ProbeLoop <sfDir>
  */
object ProbeLoop {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val id = col("doc_id")
    def host(k: org.apache.spark.sql.Column) =
      concat(lit("h"), k.cast("string"), lit(".example.com"))
    val pageUrl = concat(lit("https://"), host(id % 53),
      lit("/p/"), id.cast("string"))
    val pageHtml = concat(
      lit("<a href=\"HTTPS://"), host((id * 2 + 1) % 53),
      lit("/x/"), (id % 10).cast("string"), lit("\">a</a>"),
      lit("<a href=\"//"), host((id * 3 + 7) % 53), lit("/y\">b</a>"))
    val links = d
      .select(pageUrl.as("url"),
        explode(Html.extractLinksDetailed(pageHtml)).as("l"))
      .select(col("url"),
        Html.resolveHref(col("url"), col("l")("href")).as("link"))
    val out = LinkGraph.hostRank(LinkGraph.hostEdges(links),
      iterations = 3, checkpointEvery = 99)
    out.explain("formatted")
    spark.stop()
  }
}
