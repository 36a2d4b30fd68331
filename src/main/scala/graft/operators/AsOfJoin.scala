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
   */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      lTime: String, rTime: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val keyCols = keys.map(col)
    val r = right.select(
      keyCols :+ col(rTime).cast("long").as("__t") :+ lit(0).as("__is_l")
        :+ struct(payload.map(col): _*).as("__r"): _*)
    // unionByName(allowMissing) nulls the left-only columns on right
    // rows; the left side carries a correctly-typed null struct so the
    // union schemas line up.
    val l = left
      .withColumn("__t", col(lTime).cast("long"))
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
    }
    out.drop("__t", "__is_l", "__r", "__m")
  }
}
