package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for large joins (SURVEY §8 scale posture; the 100 TB
 * design lever the reference never needed at 10⁵ rows).
 *
 * Spark's AQE skew-join handles sort-merge skew automatically; explicit
 * salting remains necessary when (a) AQE is disabled, (b) the skewed
 * side feeds a shuffled hash join, or (c) a single hot key exceeds what
 * one task can hold even after AQE splitting. The salted join here is
 * semantically identical to the plain equi-join — verified by the
 * `q_salted_join` oracle, which hash-compares it against DuckDB's plain
 * join.
 */
object SkewUtils {

  /**
   * Equi-join `big ⋈ small` on `keys`, salting the big side into
   * `buckets` sub-keys and replicating the small side once per bucket.
   * Use when `small` is too large to broadcast but `big`'s key
   * distribution is skewed. Salt is derived deterministically from the
   * big side's whole row hash, so results are stable across retries.
   */
  /** Join types whose semantics survive replicating the small side
    * once per salt bucket: anything that never emits unmatched
    * SMALL-side rows. A right / full outer join would emit each
    * unmatched small row `buckets` times — rejected up front by both
    * salted entry points, naming the entry point the caller used. */
  private def requireSaltableJoinType(joinType: String, entryPoint: String): Unit = {
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(normalized),
      s"$entryPoint supports inner/left_outer/left_semi/left_anti, not '$joinType' " +
        "(the replicated small side would duplicate unmatched rows)")
  }

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    requireSaltableJoinType(joinType, "saltedJoin")
    val saltCol = "__salt"
    val bigSalted = big.withColumn(saltCol,
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(buckets)).cast("int"))
    val smallReplicated = small
      .withColumn(saltCol, explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn(saltCol, col(saltCol).cast("int"))
    bigSalted.join(smallReplicated, keys :+ saltCol, joinType).drop(saltCol)
  }

  /**
   * Hot/cold split salted join — the production form of [[saltedJoin]]:
   * only rows whose key is in `hotKeys` (a small frame of the skewed
   * key values, typically from heavy-hitter stats or a sample) pay the
   * salting machinery; the cold majority takes the plain equi-join.
   * This bounds the small-side replication at `|hot small| × buckets`
   * instead of `|small| × buckets` — at 100 TB, salting the whole
   * small side for the 0.1% of keys that skew is almost all waste.
   *
   * `hotKeys` is broadcast for the semi/anti split (it must be small —
   * that is what makes a key list "hot"). Semantically identical to
   * the plain join for the same `joinType`s [[saltedJoin]] accepts:
   * the salted branch only ever sees big rows whose keys are hot, so
   * pre-filtering the small side to hot keys removes nothing those
   * rows could match.
   */
  def saltedJoinHotCold(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, hotKeys: DataFrame,
      joinType: String = "inner"): DataFrame = {
    // fail fast, before the semi/anti splits plan anything
    requireSaltableJoinType(joinType, "saltedJoinHotCold")
    val hotBig = big.join(broadcast(hotKeys), keys, "left_semi")
    val coldBig = big.join(broadcast(hotKeys), keys, "left_anti")
    val hotSmall = small.join(broadcast(hotKeys), keys, "left_semi")
    saltedJoin(hotBig, hotSmall, keys, buckets, joinType)
      .unionByName(coldBig.join(small, keys, joinType))
  }

  /**
   * Heavy-hitter detection — the planning half of the hot/cold salted
   * join: keys whose row count exceeds `minShare` of the table (or
   * `minCount` rows, whichever bound is stricter at the caller's
   * choice of parameters). The output frame is exactly what
   * [[saltedJoinHotCold]] takes as `hotKeys`: detect → split → salt.
   *
   * One map-side-combinable count aggregation + a scalar total; at
   * 100 TB run it on a sample or reuse a prior stats pass — the
   * contract (a small frame of skewed key values) is the same either
   * way.
   */
  def hotKeys(df: DataFrame, keys: Seq[String], minShare: Double,
      minCount: Long = 1L): DataFrame = {
    require(minShare > 0 && minShare <= 1, "minShare must be in (0, 1]")
    require(minCount >= 1, "minCount must be at least 1")
    val keyCols = keys.map(col)
    val counts = df.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
    val total = df.agg(count(lit(1)).as("__total"))
    counts.crossJoin(broadcast(total))
      .where(col("__n") >= minCount &&
        col("__n").cast("double") / col("__total") >= minShare)
      .select(keyCols: _*)
  }

  /**
   * Two-phase skew-safe `collect_list`-style aggregation: partial
   * collect per (key, salt) shard, then merge shards. Hash aggregation
   * already does map-side partial aggregation for algebraic functions
   * (sum/count/min/max) — this helper exists for holistic aggregates
   * whose per-key state (the list itself) is what skews.
   */
  def saltedCollectList(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(buckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(collect_list(col(valueCol)).as("__shard"))
    partial.groupBy(keyCols: _*)
      .agg(flatten(collect_list(col("__shard"))).as(s"${valueCol}_list"))
  }

  /**
   * Semi-join reduction via Bloom filter: build a Bloom filter over the
   * (selective) dim side's join keys, broadcast it, and pre-filter the
   * fact side BEFORE its shuffle — the classic trick when the dim side
   * is too large to broadcast as a hash table but its key set still
   * fits a few MB of bits. False positives just flow into the real join
   * and drop there, so the result is semantically identical to the
   * plain equi-join (hash-verified by the `q_bloom_join` oracle).
   *
   * At 100 TB this is the difference between shuffling the whole fact
   * table and shuffling only the ~matching fraction; Spark's own
   * runtime bloom-filter rewrite does the same under AQE — this
   * operator makes the reduction explicit and tunable (expectedKeys /
   * fpp trade filter size vs pruning power).
   */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    // The filter is built and probed over xxhash64 of the key — the
    // same reduction Spark's own AQE runtime-filter rewrite uses — so
    // the probe is the codegen'd BloomFilterMightContain expression
    // (zero boxing, stays in whole-stage codegen) instead of a per-row
    // Scala UDF. Integral keys are normalized to BIGINT on BOTH sides
    // before hashing (xxhash64 of int 5 ≠ xxhash64 of long 5);
    // validate up front so unsupported types fail with this contract
    // message rather than deep inside stat.bloomFilter.
    val factType = fact.schema(factKey).dataType
    val dimType = dim.schema(dimKey).dataType
    def category(dt: DataType): String = dt match {
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case StringType => "string"
      case other => throw new IllegalArgumentException(
        s"bloomPrunedJoin supports integral or string join keys, not $other")
    }
    require(category(factType) == category(dimType),
      s"fact key type $factType and dim key type $dimType must be in the " +
        "same Bloom-insertion category (both integral or both string)")
    def hashed(c: org.apache.spark.sql.Column, cat: String) =
      xxhash64(if (cat == "integral") c.cast("long") else c)
    val bf = dim.select(hashed(col(dimKey), category(dimType)).as("__h"))
      .stat.bloomFilter("__h", expectedKeys, fpp)
    val bytes = new java.io.ByteArrayOutputStream()
    bf.writeTo(bytes)
    // the serialized filter rides the plan as a foldable binary literal
    // — exactly how a broadcast runtime filter reaches executors
    val pred = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes.toByteArray, BinaryType),
      ColumnBridge.expression(hashed(col(factKey), category(factType)))))
    fact.where(pred)
      .join(dim, col(factKey) === col(dimKey))
  }
}
