package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.Rng

/**
 * Mergeable sketches for corpus-scale statistics. First citizen: KMV
 * (k-minimum-values) distinct counting — estimate the number of
 * distinct values per group from only the k smallest distinct hash
 * values: `est = (k-1) / u_(k)` once k values are held, exact count
 * below that. Standard error ≈ 1/√(k-2).
 *
 * Why an [[Aggregator]] and not `count(DISTINCT x)` or a window: the
 * sketch state is BOUNDED (k doubles per group) and mergeable, so it
 * participates in partial (map-side) aggregation — each partition
 * forwards at most k values per group into the shuffle, where exact
 * distinct counting shuffles every distinct value. At 100 TB per-group
 * distinct counts become a k-row-per-partition shuffle. (Same scale
 * rationale as [[graft.operators.TopK]]; Spark's own
 * `approx_count_distinct` is the HLL++ equivalent, but its binary
 * registers can't be replayed in the DuckDB oracle — KMV over the md5
 * uniform CAN, exactly.)
 *
 * Not in the reference (no sketches there); part of the
 * training-pipeline extension surface.
 */
object Sketches {

  /** Buffer: the k smallest DISTINCT hash values seen, sorted
    * ascending. Insert and merge dedupe on exact equality — the same
    * semantics as `SELECT DISTINCT u` oracle-side. */
  final class KmvAggregator(k: Int)(implicit bufEnc: Encoder[Seq[Double]])
      extends Aggregator[Double, Seq[Double], Double] {
    require(k > 1, "k must be > 1")

    override def zero: Seq[Double] = Nil

    private def insert(buf: Seq[Double], u: Double): Seq[Double] = {
      val (before, after) = buf.span(_ < u)
      if (after.headOption.contains(u)) buf // already held
      else if (before.length >= k) buf      // larger than the k-th min
      else {
        val merged = (before :+ u) ++ after
        if (merged.length > k) merged.take(k) else merged
      }
    }

    override def reduce(buf: Seq[Double], u: Double): Seq[Double] = insert(buf, u)
    override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
      b.foldLeft(a)(insert)

    /** Below k distinct values the sketch IS the distinct set — exact.
      * At capacity, the classic KMV estimator over the k-th minimum. */
    override def finish(buf: Seq[Double]): Double =
      if (buf.length < k) buf.length.toDouble
      else (k - 1).toDouble / buf(k - 1)

    override def bufferEncoder: Encoder[Seq[Double]] = bufEnc
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /**
   * Per-group distinct-count estimate of `valueCol` via a KMV sketch
   * over the md5 uniform of the value — partition-independent and
   * exactly replayable in the oracle (`(k-1) / k-th smallest distinct
   * u` per group). `groupCol` may be any atomic type (grouped via its
   * string form, restored in the output, as in [[TopK.perGroup]]).
   */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int, seed: Long, stream: String = "kmv"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gType = df.schema(groupCol).dataType
    val ds = df.select(col(groupCol).cast("string"),
        Rng.uniform(seed, stream, col(valueCol)))
      .as[(String, Double)]
    val agg = new KmvAggregator(k).toColumn.name("est_distinct")
    ds.groupByKey(_._1).mapValues(_._2).agg(agg)
      .toDF(groupCol, "est_distinct")
      .select(col(groupCol).cast(gType).as(groupCol), col("est_distinct"))
  }
}
