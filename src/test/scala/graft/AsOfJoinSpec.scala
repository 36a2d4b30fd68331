package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** AsOfJoin semantics: inclusive at-or-before match, per-key isolation,
  * left rows with no prior right row get nulls, and all payload columns
  * come from the same matched row. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "k1", 100L), // after r@50 -> matches 50
    (2L, "k1", 50L),  // equal ts  -> inclusive match r@50
    (3L, "k1", 10L),  // before any right row -> nulls
    (4L, "k2", 100L), // k2 isolated from k1's rows -> matches k2's r@90
    (5L, "k3", 100L)  // key with no right rows at all -> nulls
  ).toDF("id", "k", "t")

  private val right = Seq(
    ("k1", 50L, 500L, "a"),
    ("k1", 70L, 700L, "b"),
    ("k2", 90L, 900L, "c")
  ).toDF("k", "t", "rid", "tag")

  private def run() =
    AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("rid", "tag"))
      .select("id", "asof_rid", "asof_tag").collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[String])))
      .sortBy(_._1).toSeq

  test("as-of picks greatest right time <= left time, inclusive, per key") {
    run() shouldBe Seq(
      (1L, Some(700L), Some("b")), // 70 is the greatest <= 100
      (2L, Some(500L), Some("a")), // equal timestamp matches
      (3L, None, None),            // nothing at or before 10
      (4L, Some(900L), Some("c")), // k2 sees only k2 rows
      (5L, None, None))            // key absent from right side
  }

  test("left row count and columns are preserved") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("rid"))
    out.count() shouldBe left.count()
    out.columns.toSet shouldBe Set("id", "k", "t", "asof_rid")
  }

  test("payload struct keeps columns from the same right row under null payload values") {
    val r2 = Seq(("k1", 50L, Option.empty[java.lang.Long], "only-tag"),
                 ("k1", 70L, Option(java.lang.Long.valueOf(700L)), "b"))
      .toDF("k", "t", "rid", "tag")
    val out = AsOfJoin.asOf(left.where($"id" === 2L), r2, Seq("k"), "t", "t",
        Seq("rid", "tag")).select("asof_rid", "asof_tag").head()
    // match is r@50 whose rid is null — a per-column ignoreNulls window
    // would have leaked nothing (no earlier row), struct carry keeps the
    // null rid together with its own tag
    assert(out.isNullAt(0))
    out.getString(1) shouldBe "only-tag"
  }

  test("NULL join keys never match (SQL join equality, like DuckDB ASOF)") {
    val l = Seq((1L, Option("k1"), 100L), (2L, Option.empty[String], 100L))
      .toDF("id", "k", "t")
    val r = Seq((Option("k1"), 50L, 500L), (Option.empty[String], 10L, 999L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("rid"))
      .select("id", "asof_rid").collect()
      .map(row => (row.getLong(0), Option(row.get(1)))).sortBy(_._1).toSeq
    out shouldBe Seq(
      (1L, Some(500L)), // normal keyed match unaffected
      (2L, None))       // NULL key matches nothing, not the NULL right row
  }

  test("timestamp columns align at microsecond precision, not whole seconds") {
    val l = Seq((1L, "k", java.sql.Timestamp.valueOf("2026-01-01 00:00:01.000500")))
      .toDF("id", "k", "ts")
    val r = Seq(
      ("k", java.sql.Timestamp.valueOf("2026-01-01 00:00:01.000400"), 1L),
      ("k", java.sql.Timestamp.valueOf("2026-01-01 00:00:01.000600"), 2L))
      .toDF("k", "ts", "rid")
    // a whole-second cast would see all three at t=1 and pick rid=2
    // (greatest payload tie-break); microsecond keys pick rid=1
    val out = AsOfJoin.asOf(l, r, Seq("k"), "ts", "ts", Seq("rid"))
    out.select("asof_rid").head().getLong(0) shouldBe 1L
  }
}
