package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`) — SURVEY
 * §2.7. Two paths:
 *
 *  - [[bruteForceTopK]]: exact cosine top-k, query side broadcast. The
 *    correctness baseline; scales linearly in corpus size with zero
 *    shuffle on the corpus (scan + per-partition top-k via window over
 *    the small query dimension).
 *  - [[lshTopK]]: random-hyperplane LSH bucketing; only colliding buckets
 *    are scored. The 100 TB path — candidate set shrinks ~2^planes-fold.
 *
 * All vector math is codegen'd Column expressions (`zip_with` +
 * `aggregate`), computed in double; no UDFs in the hot path.
 */
object Similarity {

  /** Sequential-fold dot product in double — a native codegen'd
    * expression ([[graft.plans.DotProductExpr]]); bit-identical to the
    * `aggregate(zip_with(...))` formulation it replaces but stays
    * inside whole-stage codegen (HOFs are interpreted per element). */
  def dot(a: Column, b: Column): Column =
    graft.plans.NativeFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Exact top-k neighbors for each query vector. `queries` must be small
   * (it is broadcast); `corpus` is unbounded. Corpus norms are computed
   * once before the join; ranking is per-query via window (partition
   * count = number of queries — fine, queries are few by contract).
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol), col(vecCol).as("__cv"))
      .withColumn("__cnorm", norm(col("__cv")))
    val q = queries.select(col(queryIdCol), col(vecCol).as("__qv"))
      .withColumn("__qnorm", norm(col("__qv")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("score", dot(col("__cv"), col("__qv")) / (col("__cnorm") * col("__qnorm")))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"), col("score"), col("rank"))
  }

  /**
   * Deterministic pseudo-random hyperplanes: plane p, dim i ~ N(0,1)
   * derived from `java.util.Random(seed*31 + p)` at plan time — literal
   * arrays, broadcast implicitly with the plan, identical on every
   * executor.
   */
  def planeLiterals(dims: Int, planes: Int, seed: Long): Seq[Seq[Double]] =
    (0 until planes).map { p =>
      val r = new java.util.Random(seed * 31 + p)
      Seq.fill(dims)(r.nextGaussian())
    }

  /** Sign-pattern bucket id from `planes` hyperplanes (a bit per plane). */
  def hyperplaneBuckets(df: DataFrame, vecCol: String, planes: Int,
      seed: Long, dims: Int = 64): DataFrame = {
    val ps = planeLiterals(dims, planes, seed)
    val bucketBits: Seq[Column] = ps.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(col(vecCol), planeCol) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    df.withColumn("bucket", bucketBits.reduce((a: Column, b: Column) => a.bitwiseOR(b)))
  }

  /**
   * ANN top-k: score only corpus vectors whose bucket matches the query's
   * bucket under any of `tables` independent hash tables (multi-probe via
   * multiple tables, the standard recall knob).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, tables: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id", dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def bucketed(df: DataFrame, idc: String, out: String): DataFrame = {
      val tcols = (0 until tables).map { t =>
        val ps = planeLiterals(dims, planes, seed + 1000L * t)
        val bits: Seq[Column] = ps.zipWithIndex.map { case (plane, p) =>
          when(dot(col(vecCol), array(plane.map(lit): _*)) >= 0, lit(1L << p))
            .otherwise(lit(0L))
        }
        struct(lit(t).as("table"),
          bits.reduce((a: Column, b: Column) => a.bitwiseOR(b)).as("bucket"))
      }
      df.select(col(idc), col(vecCol).as(out),
        explode(array(tcols: _*)).as("tb"))
        .select(col(idc), col(out), col("tb.table"), col("tb.bucket"))
    }
    val c = bucketed(corpus, idCol, "__cv")
    val q = bucketed(queries, queryIdCol, "__qv")
    val cand = c.join(broadcast(q), Seq("table", "bucket"))
      .select(col(queryIdCol), col(idCol), col("__cv"), col("__qv"))
      .dropDuplicates(queryIdCol, idCol)
      .withColumn("score", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"), col("score"), col("rank"))
  }
}
