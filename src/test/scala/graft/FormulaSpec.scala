package graft

import org.apache.spark.sql.functions._
import graft.dsl.Formula

/** Formula DSL (the closed replacement for the reference's eval,
  * src/main.py:475, 637). Compiled columns are evaluated over a small
  * `t` range and checked against Python-semantics expectations. */
class FormulaSpec extends SparkSpec {

  /** Evaluate formula over t = 0..n-1 (optionally binding the datapoint
    * aggregate scalars the anomaly scope provides). */
  private def eval(formula: String, n: Int = 5,
      dpMax: Double = 0.0, dpMin: Double = 0.0, dpLen: Double = 0.0): Seq[Double] = {
    val df = spark.range(n).toDF("t")
      .withColumn(Formula.DpMaxCol, lit(dpMax))
      .withColumn(Formula.DpMinCol, lit(dpMin))
      .withColumn(Formula.DpLenCol, lit(dpLen))
      .withColumn("v", Formula.compile(formula).cast("double"))
    df.orderBy("t").select("v").collect().map(_.getDouble(0)).toSeq
  }

  test("arithmetic precedence matches Python") {
    eval("2 + 3 * 4", 1) shouldBe Seq(14.0)
    eval("(2 + 3) * 4", 1) shouldBe Seq(20.0)
    eval("2 * 3 ** 2", 1) shouldBe Seq(18.0)   // ** binds tighter than *
    eval("-2 ** 2", 1) shouldBe Seq(-4.0)      // Python: -(2**2)
    eval("2 ** 3 ** 2", 1) shouldBe Seq(512.0) // right-assoc
    eval("7 / 2", 1) shouldBe Seq(3.5)         // true division
    eval("7 % 3", 1) shouldBe Seq(1.0)
  }

  test("t is in scope per slot") {
    eval("t * 2 + 1", 4) shouldBe Seq(1.0, 3.0, 5.0, 7.0)
    eval("t % 3", 6) shouldBe Seq(0.0, 1.0, 2.0, 0.0, 1.0, 2.0)
  }

  test("reference anomaly formula shapes (README.md:73, SampleBlueprint)") {
    // "max(datapoints) + t * 10"
    eval("max(datapoints) + t * 10", 3, dpMax = 7.0) shouldBe Seq(7.0, 17.0, 27.0)
    // default anomaly uses datapoint_max: "(datapoint_max + 1) ** 2"
    eval("(datapoint_max + 1) ** 2", 1, dpMax = 7.0) shouldBe Seq(64.0)
    eval("len(datapoints)", 1, dpLen = 42.0) shouldBe Seq(42.0)
    eval("min(datapoints)", 1, dpMin = -3.0) shouldBe Seq(-3.0)
  }

  test("math functions") {
    eval("abs(-5) + max(2, 3) + min(2, 3)", 1) shouldBe Seq(10.0)
    eval("floor(2.7) + ceil(2.2)", 1) shouldBe Seq(5.0)
    eval("sqrt(16) + pow(2, 3)", 1) shouldBe Seq(12.0)
    eval("sin(0) + cos(0)", 1) shouldBe Seq(1.0)
  }

  test("unknown identifiers and functions are rejected (no eval escape)") {
    an[IllegalArgumentException] should be thrownBy Formula.parse("import os")
    an[IllegalArgumentException] should be thrownBy Formula.compile("x + 1")
    an[IllegalArgumentException] should be thrownBy Formula.compile("open(1)")
    an[IllegalArgumentException] should be thrownBy Formula.parse("1 +")
  }
}
