package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
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

    override def zero: Seq[Double] = Vector.empty

    private def insert(buf: Seq[Double], u: Double): Seq[Double] = {
      if (buf.length >= k && u >= buf.last) buf // O(1) hot-path reject
      else {
        val (before, after) = buf.span(_ < u)
        if (after.headOption.contains(u)) buf // already held
        else {
          val merged = (before :+ u) ++ after
          if (merged.length > k) merged.take(k) else merged
        }
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

  /** [[KmvAggregator]]'s signature-emitting sibling over integer
    * hashes: the k smallest DISTINCT longs seen, sorted ascending —
    * the buffer IS the output (a bottom-k minwise signature, e.g.
    * [[graft.ext.Dedup.sourceOverlapSketch]]'s per-group sketch).
    * Mergeable bounded state, so partial aggregation runs map-side. */
  final class BottomKAggregator(k: Int)(implicit bufEnc: Encoder[Seq[Long]])
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0, "k must be positive")

    // Vector, not List: the hot path is the O(1) reject below — once
    // the buffer is full, a random stream accepts only ~k·ln(n/k)
    // values total, so everything else must bail on one comparison
    // against the CURRENT k-th minimum (List.last would walk k cells
    // per reject and dominate the whole aggregation — measured 5 s on
    // the sf0.1 source-overlap sketch before this shape).
    override def zero: Seq[Long] = Vector.empty

    private def insert(buf: Seq[Long], v: Long): Seq[Long] = {
      if (buf.length >= k && v >= buf.last) buf // O(1) hot-path reject
      else {
        val (before, after) = buf.span(_ < v)
        if (after.headOption.contains(v)) buf
        else {
          val merged = (before :+ v) ++ after
          if (merged.length > k) merged.take(k) else merged
        }
      }
    }

    override def reduce(buf: Seq[Long], v: Long): Seq[Long] = insert(buf, v)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(insert)
    override def finish(buf: Seq[Long]): Seq[Long] = buf
    override def bufferEncoder: Encoder[Seq[Long]] = bufEnc
    override def outputEncoder: Encoder[Seq[Long]] = bufEnc
  }

  /**
   * Fixed-grid histogram sketch: per-group bin counts over the grid
   * `bin = clamp(floor(x / width), 0, maxBins-1)` — grid geometry is a
   * plan-time constant, so the buffer is a bounded mergeable map
   * (≤ `maxBins` entries per group) that participates in map-side
   * partial aggregation exactly like [[KmvAggregator]]. Values left of
   * the grid clamp into bin 0, values right of it into the last bin —
   * standard fixed-grid overflow semantics, and the part that keeps
   * state bounded no matter the data.
   *
   * `finish` reads off quantiles: `q(p)` = lower edge (`bin * width`)
   * of the first bin whose cumulative count reaches
   * `max(1, ceil(p * n))`. Unlike KLL/t-digest the whole construction
   * is exactly replayable in a SQL oracle: `floor(x/width)` group-by,
   * cumulative window, first-bin pick.
   */
  final class HistAggregator(width: Double, maxBins: Int, probs: Seq[Double])(
      implicit bufEnc: Encoder[Map[Long, Long]], outEnc: Encoder[Seq[Double]])
      extends Aggregator[Double, Map[Long, Long], Seq[Double]] {
    require(width > 0, "width must be positive")
    require(maxBins > 0, "maxBins must be positive")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be non-empty and within [0, 1]")

    private def bin(x: Double): Long =
      math.min(math.max(math.floor(x / width).toLong, 0L), maxBins - 1L)

    override def zero: Map[Long, Long] = Map.empty

    override def reduce(b: Map[Long, Long], x: Double): Map[Long, Long] = {
      val k = bin(x)
      b.updated(k, b.getOrElse(k, 0L) + 1L)
    }

    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

    override def finish(b: Map[Long, Long]): Seq[Double] = {
      val n = b.values.sum // ≥ 1: groupByKey only materializes seen keys
      val sorted = b.toSeq.sortBy(_._1)
      var acc = 0L
      val cumulative = sorted.map { case (k, c) => acc += c; (k, acc) }
      probs.map { p =>
        val target = math.max(1L, math.ceil(p * n).toLong)
        cumulative.find(_._2 >= target).get._1 * width
      }
    }

    override def bufferEncoder: Encoder[Map[Long, Long]] = bufEnc
    override def outputEncoder: Encoder[Seq[Double]] = outEnc
  }

  /**
   * Per-group quantile estimates of `valueCol` from a fixed-grid
   * histogram sketch — one output column `q_<p*1000>` (per-mille
   * label, e.g. `q_500` = median) per requested probability, each the
   * lower edge of the bin where that quantile falls (grid resolution
   * `width`). Same group-key handling as [[kmvDistinct]].
   *
   * Shape at 100 TB: per-group quantiles become a ≤`maxBins`-entry
   * map per (group, partition) crossing the shuffle — where an exact
   * `percentile` shuffles every value and a global-sort approach dies
   * outright. Error is bounded by the grid: a quantile is off by at
   * most `width`.
   *
   * NULL and NaN values are EXCLUDED before sketching (they carry no
   * grid position; unfiltered, floor(NaN/width).toLong would silently
   * count NaN as bin 0 and skew low quantiles, and a null fails the
   * non-nullable encoder with an opaque runtime error). A group whose
   * values are all null/NaN yields no output row, like a group absent
   * from the input.
   */
  /** Integral-key guard shared by the `...Long` variants: a silent
    * cast of a string key would null-and-drop rows under non-ANSI
    * semantics, so non-integral keys are rejected up front. NULL keys
    * group as one NULL group, exactly like the string-path variants:
    * the key is encoded boxed (`java.lang.Long`), not as a
    * non-nullable primitive that would throw on the first null. */
  private def requireIntegralKey(df: DataFrame, groupCol: String,
      entryPoint: String): Unit = {
    import org.apache.spark.sql.types._
    val gType = df.schema(groupCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(gType),
      s"$entryPoint requires an integral group key, not $gType")
  }

  def histQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      width: Double, maxBins: Int, probs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gType = df.schema(groupCol).dataType
    val ds = df.select(col(groupCol).cast("string"),
        col(valueCol).cast("double"))
      .where(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .as[(String, Double)]
    val agg = new HistAggregator(width, maxBins, probs).toColumn.name("__qs")
    val labeled = probs.zipWithIndex.map { case (p, i) =>
      element_at(col("__qs"), i + 1).as(s"q_${math.round(p * 1000)}")
    }
    ds.groupByKey(_._1).mapValues(_._2).agg(agg)
      .toDF(groupCol, "__qs")
      .select(col(groupCol).cast(gType).as(groupCol) +: labeled: _*)
  }

  /** Typed-key variant of [[histQuantiles]] for integral group keys —
    * the key crosses the shuffle as a LONG instead of its string form
    * (same rationale as [[graft.operators.TopK.perGroupLong]]). */
  def histQuantilesLong(df: DataFrame, groupCol: String, valueCol: String,
      width: Double, maxBins: Int, probs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    requireIntegralKey(df, groupCol, "histQuantilesLong")
    val gType = df.schema(groupCol).dataType
    val tupleEnc: Encoder[(java.lang.Long, Double)] =
      Encoders.tuple(Encoders.LONG, Encoders.scalaDouble)
    val ds = df.select(col(groupCol).cast("long"),
        col(valueCol).cast("double"))
      .where(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .as[(java.lang.Long, Double)](tupleEnc)
    val agg = new HistAggregator(width, maxBins, probs).toColumn.name("__qs")
    val labeled = probs.zipWithIndex.map { case (p, i) =>
      element_at(col("__qs"), i + 1).as(s"q_${math.round(p * 1000)}")
    }
    ds.groupByKey(_._1)(Encoders.LONG).mapValues(_._2).agg(agg)
      .toDF(groupCol, "__qs")
      .select(col(groupCol).cast(gType).as(groupCol) +: labeled: _*)
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

  /** Typed-key variant of [[kmvDistinct]] for integral group keys —
    * the key crosses the shuffle as a LONG instead of its string form
    * (same rationale as [[graft.operators.TopK.perGroupLong]]). */
  def kmvDistinctLong(df: DataFrame, groupCol: String, valueCol: String,
      k: Int, seed: Long, stream: String = "kmv"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    requireIntegralKey(df, groupCol, "kmvDistinctLong")
    val gType = df.schema(groupCol).dataType
    val tupleEnc: Encoder[(java.lang.Long, Double)] =
      Encoders.tuple(Encoders.LONG, Encoders.scalaDouble)
    val ds = df.select(col(groupCol).cast("long"),
        Rng.uniform(seed, stream, col(valueCol)))
      .as[(java.lang.Long, Double)](tupleEnc)
    val agg = new KmvAggregator(k).toColumn.name("est_distinct")
    ds.groupByKey(_._1)(Encoders.LONG).mapValues(_._2).agg(agg)
      .toDF(groupCol, "est_distinct")
      .select(col(groupCol).cast(gType).as(groupCol), col("est_distinct"))
  }

  // === Count-min sketch (frequency estimation) ==========================

  /** Row-`i` bucket of a value: 60-bit md5 prefix of the
    * `(seed, "cms<i>", v)` payload mod `width` — the same digest
    * convention as every oracle-replayable hash in the engine. */
  private def cmsBucket(seed: Long, i: Int, v: Column, width: Int): Column =
    conv(substring(Rng.digest(seed, s"cms$i", v), 1, 15), 16, 10)
      .cast("long") % width

  /**
   * Count-min sketch build: collapse a value-occurrence stream into a
   * `depth × width` count grid — the third sketch family next to KMV
   * (distinct) and the histogram (quantiles), covering FREQUENCY.
   * Each occurrence increments one bucket per row (`depth`
   * md5-salted hashes); a point estimate is the MIN over its `depth`
   * buckets, always ≥ the true count, and ≤ true + ε·N with
   * ε = e/width at probability 1 − e^-depth — the classic CM bound.
   *
   * Why this shape at 100 TB: the grid is the ONLY aggregate, its key
   * space is bounded (`depth·width` cells) regardless of corpus size,
   * so the shuffle carries at most `depth·width` partial counts per
   * partition (map-side combine over a constant key space) and the
   * result broadcasts anywhere — where an exact `groupBy(value)`
   * shuffles every distinct value. Grids built on disjoint corpus
   * slices merge by cell-wise addition (same keys), which is what
   * makes the sketch incremental across snapshots.
   *
   * Returns `(__i, __b, __c)` — one row per non-empty cell.
   */
  def cmsGrid(df: DataFrame, valueCol: String, seed: Long,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth > 0, "depth must be positive")
    require(width > 0, "width must be positive")
    val buckets = array((0 until depth)
      .map(i => cmsBucket(seed, i, col(valueCol), width)): _*)
    df.select(posexplode(buckets).as(Seq("__i", "__b")))
      .groupBy("__i", "__b").agg(count(lit(1)).as("__c"))
  }

  /** Point estimates for `probes` (any frame carrying `valueCol`,
    * other columns pass through): min over the `depth` grid cells the
    * value hashes to. The grid is bounded by `depth·width` cells, so
    * the probe join is a broadcast — never a shuffle of the probe
    * frame. Hash parameters must match the [[cmsGrid]] call. */
  def cmsEstimate(grid: DataFrame, probes: DataFrame, valueCol: String,
      seed: Long, depth: Int = 4, width: Int = 256): DataFrame = {
    val reserved = Set("__i", "__b", "pos", "col")
    require(!probes.columns.exists(reserved),
      s"probe columns may not use reserved names $reserved")
    val passThrough = probes.columns.filter(_ != valueCol).map(col).toSeq
    val buckets = array((0 until depth)
      .map(i => cmsBucket(seed, i, col(valueCol), width)): _*)
    probes
      .select(col(valueCol) +: passThrough :+ posexplode(buckets): _*)
      .withColumnRenamed("pos", "__i").withColumnRenamed("col", "__b")
      // LEFT join + zero-coalesce: the grid stores only NON-EMPTY
      // cells, and an empty cell means an exact count of zero — an
      // inner join would instead inflate (or entirely drop) the
      // estimate for a probe value never seen by the build stream,
      // breaking the CMS one-sided-error guarantee for arbitrary
      // probe frames.
      .join(broadcast(grid), Seq("__i", "__b"), "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
      .groupBy(col(valueCol) +: passThrough: _*)
      .agg(min("__c").as("cms_est"))
  }

  /**
   * Validation composition: the `k` most frequent values (exact, with
   * deterministic ties) next to their CM estimates — the query that
   * PROVES the estimate's one-sided error on real data. A production
   * caller uses [[cmsGrid]]/[[cmsEstimate]] alone (bounded state);
   * the exact side exists here because the point of the query is the
   * comparison.
   */
  def cmsHeavyHitters(df: DataFrame, valueCol: String, k: Int, seed: Long,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(k > 0, "k must be positive")
    val exactTop = df.groupBy(valueCol).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col(valueCol)).limit(k)
    cmsEstimate(cmsGrid(df, valueCol, seed, depth, width),
        exactTop, valueCol, seed, depth, width)
      .select(col(valueCol), col("n_exact"), col("cms_est"))
  }

  // === HyperLogLog (distinct counting, register-bounded) ================

  /**
   * Per-(group, register) max rank — the HLL sketch STATE, exposed so
   * mergeability is a provable property: registers of a corpus union
   * are the cell-wise MAX of the parts' registers (same keys), exactly
   * like [[cmsGrid]] merges by cell-wise addition. Register index and
   * rank come from two independent md5 streams (the engine's
   * oracle-replayable hash convention): `reg = 60-bit digest mod m`,
   * `rho = leading zeros of the 60-bit rank digest + 1` — computed
   * integer-exactly as `61 - length(bin(h))` (`bin` drops leading
   * zeros in both engines; h = 0 ⇒ all 60 bits zero ⇒ 61), never via
   * float log2.
   *
   * The fourth sketch family next to KMV (distinct, k-values state),
   * the histogram (quantiles) and CMS (frequency): where KMV keeps k
   * hash VALUES per group, HLL keeps `m = 2^p` six-bit-ish register
   * maxima — at p=8 a 256-entry map per (group, partition) crossing
   * the shuffle with map-side combine, the classic
   * Flajolet–Fusy–Gandouet–Meunier construction.
   */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
      p: Int, seed: Long, stream: String = "hll"): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val m = 1 << p
    val reg = conv(substring(Rng.digest(seed, s"$stream/reg", col(valueCol)), 1, 15), 16, 10)
      .cast("long") % m
    val h = conv(substring(Rng.digest(seed, s"$stream/rho", col(valueCol)), 1, 15), 16, 10)
      .cast("long")
    val rho = when(h === 0L, lit(61L))
      .otherwise(lit(61L) - length(bin(h)).cast("long"))
    df.select(col(groupCol), reg.as("reg"), rho.as("rho"))
      .groupBy(groupCol, "reg").agg(max("rho").as("m_reg"))
  }

  /** `alpha_m * m² * 1e9` for `m = 2^p` — the raw-estimate numerator,
    * exposed so the DuckDB oracle injects the identical double. */
  def hllAlphaM2E9(p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m * 1e9
  }

  /**
   * Per-group HLL distinct-count estimate: raw estimate
   * `alpha_m · m² / Σ 2^(-M_j)` (empty registers contribute 2^0),
   * with the standard linear-counting correction
   * `m · ln(m / V)` when the raw estimate ≤ 2.5m and V (empty
   * registers) > 0. Cross-engine determinism: the harmonic sum runs on
   * the 1e-9 integer grid (`floor(1e9 · 2^-M)` — exact products, since
   * 1e9 = 5⁹·2⁹ and 2^-M is dyadic — summed as longs,
   * order-independent), and the estimate is rounded to 4 decimals (the
   * `ln` follows the Box–Muller oracle precedent: both engines agree
   * far beyond 4 decimals).
   *
   * Why HLL next to [[kmvDistinct]]: same answer, different state
   * bound — KMV's k doubles beat HLL on small-k accuracy per byte, HLL
   * registers win once groups number in the millions (fixed 2^p bytes
   * per group, union-mergeable by MAX — snapshot-incremental the way
   * [[cmsGrid]] is by addition).
   */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
      p: Int = 8, seed: Long = 42L, stream: String = "hll"): DataFrame = {
    val m = 1 << p
    val agg = hllRegisters(df, groupCol, valueCol, p, seed, stream)
      .groupBy(groupCol).agg(
        count(lit(1)).as("__nr"),
        sum(floor(lit(1e9) * pow(lit(2.0), -col("m_reg"))).cast("long")).as("__sp"))
    agg.select(col(groupCol),
        (lit(m.toLong) - col("__nr")).as("n_zero_regs"),
        (col("__sp") + (lit(m.toLong) - col("__nr")) * lit(1000000000L)).as("__sq"))
      .withColumn("__raw", lit(hllAlphaM2E9(p)) / col("__sq"))
      .withColumn("hll_est", round(
        when(col("__raw") <= lit(2.5 * m) && col("n_zero_regs") > lit(0L),
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero_regs")))
          .otherwise(col("__raw")), 4))
      .select(groupCol, "n_zero_regs", "hll_est")
  }
}
