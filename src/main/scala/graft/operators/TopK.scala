package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Grouped top-k via a typed [[Aggregator]] with a BOUNDED buffer — the
 * scale-friendly alternative to `row_number().over(partitionBy(...))
 * <= k`: the window form shuffles and sorts EVERY row of every group,
 * while an aggregator participates in partial (map-side) aggregation,
 * so each partition forwards at most k rows per group into the
 * shuffle. At 100 TB with small k this is the difference between
 * shuffling the table and shuffling ~k rows per (group, partition).
 *
 * Entries are (score, id); ordering is score DESC then id ASC, applied
 * identically while pruning and at finish, so results are deterministic
 * under any partitioning.
 */
object TopK {

  /** Buffer kept sorted (score desc, id asc), length <= k. Encoders are
    * supplied by the caller's session implicits. */
  final class TopKAggregator(k: Int)(
      implicit seqEnc: Encoder[Seq[(Double, Long)]])
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k > 0, "k must be positive")

    // Matches Spark's `ORDER BY score DESC` total order, where NaN is
    // GREATER than any double (NaN ranks first, then +Inf, ...): the
    // leading flag puts NaN entries ahead instead of Scala's default
    // (-NaN = NaN sorts last and would silently drop NaN rows).
    // `s + 0.0` collapses -0.0 to +0.0 first (Spark normalizes ±0.0 as
    // equal; Scala's total order would rank them) so ±0.0 ties break by
    // id like Spark's ORDER BY.
    private val ord: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Int, Double, Long)] { case (s, id) =>
        (if (s.isNaN) 0 else 1, -(s + 0.0), id)
      }

    override def zero: Seq[(Double, Long)] = Nil

    private def insert(buf: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] = {
      val (before, after) = buf.span(ord.lt(_, e))
      val merged = (before :+ e) ++ after
      if (merged.length > k) merged.take(k) else merged
    }

    override def reduce(buf: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] =
      insert(buf, e)

    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.foldLeft(a)(insert)

    override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

    override def bufferEncoder: Encoder[Seq[(Double, Long)]] = seqEnc
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = seqEnc
  }

  /** Shared tail: explode the aggregated k-entry buffers into ranked
    * rows, restoring the group key's original type. */
  private def explodeRanked(aggd: DataFrame, groupCol: String,
      scoreCol: String, idCol: String,
      gType: org.apache.spark.sql.types.DataType): DataFrame =
    aggd
      .select(col(groupCol), posexplode(col("topk")).as(Seq("pos", "e")))
      .select(col(groupCol).cast(gType).as(groupCol),
        (col("pos") + 1).cast("int").as("rank"),
        col("e._1").as(scoreCol), col("e._2").as(idCol))

  /**
   * Top-k rows per group: `df` must expose `groupCol` (any atomic
   * type — grouped via its string form internally, restored to the
   * original type in the output), `scoreCol` (double) and `idCol`
   * (long). Output: one row per kept entry with a 1-based `rank`.
   * For integral group keys prefer [[perGroupLong]], which keeps the
   * shuffle key an 8-byte long instead of its string rendering.
   */
  def perGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gType = df.schema(groupCol).dataType
    val ds = df.select(col(groupCol).cast("string"),
        col(scoreCol).cast("double"), col(idCol).cast("long"))
      .as[(String, Double, Long)]
    val agg = new TopKAggregator(k).toColumn.name("topk")
    explodeRanked(
      ds.groupByKey(_._1)
        .mapValues { case (_, s, id) => (s, id) }
        .agg(agg)
        .toDF(groupCol, "topk"),
      groupCol, scoreCol, idCol, gType)
  }

  /**
   * Typed-key variant of [[perGroup]] for integral group keys: the
   * key transits the shuffle as a LONG — `perGroup`'s `cast(string)`
   * round-trips atomic keys correctly but widens the shuffle key for
   * no semantic gain. Same aggregator, same ordering, same output
   * shape (key restored to its input type). Rejects non-integral
   * group columns up front; a silent cast of a string key would
   * null-and-drop rows under non-ANSI semantics. NULL keys group as
   * one NULL group, exactly like the string path: the key is encoded
   * boxed (`java.lang.Long`), not as a non-nullable primitive that
   * would throw on the first null.
   */
  def perGroupLong(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Encoders
    val spark = df.sparkSession
    import spark.implicits._
    val gType = df.schema(groupCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(gType),
      s"perGroupLong requires an integral group key, not $gType (use perGroup)")
    val tupleEnc: Encoder[(java.lang.Long, Double, Long)] =
      Encoders.tuple(Encoders.LONG, Encoders.scalaDouble, Encoders.scalaLong)
    val ds = df.select(col(groupCol).cast("long"),
        col(scoreCol).cast("double"), col(idCol).cast("long"))
      .as[(java.lang.Long, Double, Long)](tupleEnc)
    val agg = new TopKAggregator(k).toColumn.name("topk")
    explodeRanked(
      ds.groupByKey(_._1)(Encoders.LONG)
        .mapValues { case (_, s, id) => (s, id) }
        .agg(agg)
        .toDF(groupCol, "topk"),
      groupCol, scoreCol, idCol, gType)
  }
}
