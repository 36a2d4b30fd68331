package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (nearest-prior) join — the temporal-alignment operator every
 * activity/replay pipeline eventually needs (the reference aligns series
 * only on exact slot index `t`; this generalizes alignment to
 * irregular timestamps).
 *
 * Scale posture: implemented as union + per-key ordered window, NOT as a
 * non-equi range join. The range-join formulation (`l.t >= r.t` then
 * keep the max) explodes to O(|L|·|R|) per key before pruning; the
 * union-window form costs ONE shuffle on the join key and a per-key
 * sort — linear in |L|+|R|, skew-bounded by the largest single key, and
 * it survives a 100 TB scale-up as long as single keys fit a partition
 * (the same contract as any keyed window).
 */
object AsOfJoin {

  /**
   * For each left row, attach the payload of the right row with the
   * greatest `rTime <= lTime` (inclusive) sharing the same `keys` —
   * or nulls if no prior right row exists (left-join semantics).
   *
   * Payload columns arrive prefixed with `prefix`. The right payload is
   * carried through the window as ONE struct, so all payload columns are
   * guaranteed to come from the same matched right row even when
   * payload values are themselves null.
   *
   * NULL join keys follow SQL join equality: a left row with any NULL
   * key matches nothing (null payload), and NULL-keyed right rows match
   * no one — same as DuckDB's ASOF JOIN. (A bare `Window.partitionBy`
   * would group NULLs together and wrongly match them.)
   *
   * Timestamp columns are compared at microsecond precision
   * (`unix_micros`); other time columns must already be integral and
   * are compared via a plain long cast.
   */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      lTime: String, rTime: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    require(keys.nonEmpty, "asOf needs at least one join key " +
      "(a key-less global as-of would silently match across all rows)")
    val keyCols = keys.map(col)
    // Microsecond-exact ordering key for timestamps; a plain long cast
    // would truncate TimestampType to whole seconds.
    def timeKey(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType | TimestampNTZType => unix_micros(col(c))
      case _ => col(c).cast("long")
    }
    val anyKeyNull = keys.map(col(_).isNull).reduce(_ or _)
    val leftNullKeyed = left.where(anyKeyNull)
    val leftKeyed = left.where(!anyKeyNull)
    val r = right.where(!anyKeyNull).select(
      keyCols :+ timeKey(right, rTime).as("__t") :+ lit(0).as("__is_l")
        :+ struct(payload.map(col): _*).as("__r"): _*)
    // unionByName(allowMissing) nulls the left-only columns on right
    // rows; the left side carries a correctly-typed null struct so the
    // union schemas line up.
    val l = leftKeyed
      .withColumn("__t", timeKey(left, lTime))
      .withColumn("__is_l", lit(1))
      .withColumn("__r", lit(null).cast(r.schema("__r").dataType))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at equal timestamps (__is_l asc)
    // so `rTime == lTime` matches — inclusive as-of, same as DuckDB's
    // ASOF JOIN `l.t >= r.t`. The payload struct is the final ordering
    // key: among right rows sharing (keys, rTime) the greatest payload
    // wins deterministically instead of depending on shuffle order.
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__is_l"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__is_l") === 1)
    val out = payload.foldLeft(matched) { (df, c) =>
      df.withColumn(prefix + c, col("__m." + c))
    }.drop("__t", "__is_l", "__r", "__m")
    // NULL-keyed left rows skip the window entirely and go straight to
    // the null-payload output (SQL join semantics; also avoids piling
    // every NULL key into one window partition at scale).
    val payloadType = r.schema("__r").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val nullOut = payload.foldLeft(leftNullKeyed) { (df, c) =>
      df.withColumn(prefix + c, lit(null).cast(payloadType(c).dataType))
    }
    out.unionByName(nullOut)
  }
}
