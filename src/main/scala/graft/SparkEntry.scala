package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.blueprint.{BlueprintParser, Config}
import graft.functions.Rng
import graft.operators.{AsOfJoin, Dispatch, Engine, Generators, Replay, Transforms}
import graft.ext.{Corpus, Dedup, Html, LinkGraph, Multimodal, PiiScan, Similarity, Sitemap, Sketches, TextStats, Warc}
import graft.sources.Sinks

/**
 * Driver contract (see SURVEY.md §7): one `queries` entry per implemented
 * operator from SURVEY.md §2, with a DuckDB-equivalent `oracleSql` for
 * every operator whose semantics are SQL-expressible. The engine's
 * hash-RNG is md5-based precisely so RNG-derived queries replay in
 * DuckDB (see Rng scaladoc); the few remaining rows-only queries are
 * those whose content passes through engine-side-only constructs
 * (wordlist fake data, stub media codecs), pinned by seeded goldens in
 * the ScalaTest suite instead.
 *
 * Determinism rules for oracle-checked queries (hash compare is exact):
 *  - integer/string outputs preferred; doubles only as exact passthrough
 *    or single-rounding results of exact decimal arithmetic;
 *  - money math in DECIMAL(18,2)-based exact arithmetic, cast to double
 *    once at the end (both engines correctly round, unscaled < 2^53);
 *  - timestamps exported as epoch integers (`unix_micros`/`epoch_us`),
 *    never raw timestamp columns;
 *  - every query is fully ordered by a unique key in BOTH engines.
 */
object SparkEntry {

  val Seed = 42L

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Scan-parallelism floor for kernel-CPU-bound queries — guide §2.5's
    * input-skew move ("one huge unsplittable file … repartition
    * immediately after the read"): the sf fixtures are single-row-group
    * parquet files, so a heavy per-row kernel chain (WARC render +
    * inflate + charset decode, PII scans, BPE encodes, window hashing)
    * otherwise executes as ONE task regardless of session cores
    * (measured: x_warc_encoding 2.6 s wall ≈ 1.9 s in a single task at
    * local[32]). Round-robin to the session's default parallelism,
    * applied ONLY when the planned scan actually under-parallelizes:
    * the condition reads the planned split count, so at production
    * scale — where a corpus arrives in thousands of splits — this
    * wrapper is a no-op, never an added shuffle. Deliberately applied
    * per query and only where kernel work dominates; cheap projections
    * would pay the narrow exchange for nothing. */
  private def parallel(df: DataFrame): DataFrame = {
    val floor = df.sparkSession.sparkContext.defaultParallelism
    // RAW-SCAN-ONLY contract, enforced: reading the planned split count
    // goes through toRdd, which is free on a scan-only plan (the RDD is
    // built lazily, no job) but on an exchange-bearing plan under AQE
    // would MATERIALIZE the shuffle stages at query-construction time.
    // AQE only wraps plans that carry exchanges/subqueries, so an
    // AdaptiveSparkPlanExec here means someone passed a derived frame.
    require(!df.queryExecution.executedPlan
        .isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec],
      "parallel() wraps raw scans only; wrapping a derived frame would " +
        "execute its shuffle stages during query construction")
    if (df.queryExecution.toRdd.getNumPartitions < floor)
      df.repartition(floor)
    else df
  }

  /** Warehouse-table name fingerprinting for the build-once serving
    * paths (q_bucketed_join convention): sf dir + every build
    * parameter, so a parameter change builds fresh instead of
    * attaching stale files. */
  private def whName(prefix: String, params: String): String =
    prefix + "_" + (scala.util.hashing.MurmurHash3.stringHash(params) & 0x7fffffff)

  /** Persisted cluster table of the jaccard-0.05 pair graph over
    * `documents` (x_dedup_clusters' pipeline; probed by x_dedup_sizes). */
  private def jaccardClustersTableName(dir: String): String =
    whName("dedup_jac", s"$dir|jaccard|0.05|3")

  /** Persisted cluster table of the 0.3-threshold near-dup pipeline
    * over `documents` (x_neardup_text's pipeline; probed by
    * x_dedup_apply). */
  private def neardupClustersTableName(dir: String): String =
    whName("dedup_nd", s"$dir|neardup|0.3|32|8|3")

  /** events.parquet has stored `ts` as TIMESTAMP(NANOS) (testdata
    * generations ≤ round 10) and as TIMESTAMP(MICROS) (current) —
    * normalize to LongType epoch NANOS either way, so every downstream
    * integer `div` (exact, no doubles) is physical-type-independent.
    * NANOS only reads via the nanosAsLong legacy conf (already epoch
    * nanos); MICROS arrives as TIMESTAMP_NTZ, which the UTC session
    * cast turns into the same epoch the oracle's `epoch_us` sees. */
  private def eventsTbl(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }

  // ---------------------------------------------------------------------
  // Flagship: a full blueprint (5 generator shapes, noise, anomalies)
  // materialized end-to-end and pivoted to slot records.
  // ---------------------------------------------------------------------

  /** Sample-blueprint-style flagship (shapes: sinusoidal, constant,
    * random, square, custom — SampleBlueprint.json:17-77 minus the `real`
    * S3 fetch, which needs a file and is exercised by g_replay). */
  val FlagshipBlueprintJson: String =
    """{
      |  "commons": {"num_points": 2000, "signal_min": 1, "signal_max": 10,
      |              "noise_min": 1, "noise_max": 5,
      |              "anomalies": {"start": 10, "end": 20, "counts": 2}},
      |  "generators": [
      |    {"id": "ts1", "shape": "sinusoidal", "config": {"frequency": 0.25}},
      |    {"id": "ts2", "shape": "constant",   "config": {"num_points": 50, "constant": 20}},
      |    {"id": "ts3", "shape": "random",     "config": {"type": "uniform"}},
      |    {"id": "ts4", "shape": "square",     "config": {"high_value": 40, "low_value": 10, "high_width": 5, "low_width": 10}},
      |    {"id": "ts5", "shape": "custom",     "config": {"formula": "(t % 50) + 3 * (t % 7)"}}
      |  ],
      |  "targets": [{"type": "cloudwatch", "generators": ["ts1","ts2","ts3","ts4","ts5"]}]
      |}""".stripMargin

  def entry(spark: SparkSession): DataFrame = {
    val bp = BlueprintParser.parse(FlagshipBlueprintJson)
    val series = Engine.materialize(spark, bp, Seed)
    Dispatch.slotRecords(Engine.slotView(spark, bp, series))
  }

  // ---------------------------------------------------------------------
  // Shared scale-range SQL fragment (reference scale_range semantics:
  // ceil(round((v-mn)/(mx-mn)*(hi-lo)+lo, 9)), SURVEY §2.2 T1).
  // ---------------------------------------------------------------------
  private def scaleSql(lo: Double, hi: Double): String =
    s"CAST(ceil(round((v - mn) / (mx - mn) * ${hi - lo} + $lo, 9)) AS BIGINT)"

  // ---------------------------------------------------------------------
  // Cross-engine RNG replay (Rng.uniform/gaussian are md5-based so the
  // SAME draws can be computed in DuckDB SQL — see Rng scaladoc).
  // `tExpr` is the slot column expression; gid/stream/seed are the
  // plan-time constants of the draw.
  // ---------------------------------------------------------------------
  private def uniformSql(stream: String, gid: String, tExpr: String = "t"): String =
    s"(('0x' || substr(${digestSql(stream, gid, tExpr)}, 1, 13))::BIGINT * ${Rng.Inv2p52})"

  /** The raw md5 hex digest behind a draw (Rng.digest replay); extra
    * keys ride along in tExpr as `k1::VARCHAR || chr(1) || k2`. */
  private def digestSql(stream: String, gid: String, tExpr: String = "t"): String =
    s"md5('$Seed' || chr(1) || '$stream' || chr(1) || " +
      s"'$gid' || chr(1) || $tExpr::VARCHAR)"

  /** uuid4-shaped 8-4-4-4-12 rendering of a 32-hex-char digest column. */
  private def uuidSql(d: String): String =
    s"substr($d,1,8) || '-' || substr($d,9,4) || '-' || substr($d,13,4) || " +
      s"'-' || substr($d,17,4) || '-' || substr($d,21,12)"

  /** Box-Muller standard normal, quantized to 9 digits like Rng.gaussian. */
  private def gaussSql(stream: String, gid: String, tExpr: String = "t"): String =
    s"round(sqrt(-2.0 * ln(1.0 - ${uniformSql(stream + "/bm1", gid, tExpr)})) * " +
      s"cos(2.0 * pi() * ${uniformSql(stream + "/bm2", gid, tExpr)}), 9)"

  /** One config shared by the g_anomalies query AND its oracle (the
    * oracle injects the driver-side slot draws as literals). */
  private val AnomaliesCfgJson: String =
    """{"num_points":200,"low_value":1,"low_width":3,"high_value":7,"high_width":2,
      | "anomalies":{"start":10,"end":50,"counts":5}}""".stripMargin

  // === Engine suite: generators / transforms / dispatch =================

  private val engineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_sinusoidal" -> ((s, _) =>
      Transforms.intCast(Generators.sinusoidal(s, "ts1",
        Config.of("""{"num_points":600,"frequency":0.25,"signal_min":1,"signal_max":20}""")))
        .orderBy("t")),

    "g_constant" -> ((s, _) =>
      Transforms.intCast(Generators.constant(s, "ts2",
        Config.of("""{"num_points":500,"constant":20}""")))
        .orderBy("t")),

    "g_square" -> ((s, _) =>
      Transforms.intCast(Generators.square(s, "ts4",
        Config.of("""{"num_points":500,"low_value":10,"low_width":10,"high_value":40,"high_width":5}""")))
        .orderBy("t")),

    "g_custom" -> ((s, _) =>
      Transforms.intCast(Generators.custom(s, "ts5",
        Config.of("""{"num_points":400,"formula":"(t % 50) + 3 * (t % 7)","signal_min":1,"signal_max":20}""")))
        .orderBy("t")),

    // Custom-shape formula referencing the ACCUMULATING series — the
    // reference's growing-datapoints eval scope (main.py:464-477), the
    // last custom-formula semantic: each point reads max/min/len of
    // the points generated before it (guarded at t=0 exactly as a
    // Python formula must guard max([])). A true recurrence, so the
    // oracle replays it with a DuckDB RECURSIVE CTE carrying the
    // running extremes — exact, since every value is integer-valued
    // double arithmetic.
    "g_custom_prefix" -> ((s, _) =>
      Transforms.intCast(Generators.custom(s, "ts5p",
        Config.of("""{"num_points":300,"formula":"1 if t == 0 else (max(datapoints) % 17) + (min(datapoints) % 5) + (len(datapoints) % 3) + (t % 7)","signal_min":1,"signal_max":20}""")))
        .orderBy("t")),

    // Bounded-lag custom formula — the reference's lagged-feedback
    // eval shape (main.py:473-475, `datapoints[-1]`): each point reads
    // the previous point (negative-index form) AND the one before it
    // (t-k form; both spellings exercise the same ring). Guards at
    // t<2 exactly as a Python formula must guard IndexError. Oracle:
    // RECURSIVE CTE threading (v, prev) through each step — exact,
    // integer-valued double arithmetic throughout.
    "g_custom_lag" -> ((s, _) =>
      Transforms.intCast(Generators.custom(s, "ts5l",
        Config.of("""{"num_points":300,"formula":"1 if t == 0 else (2 if t == 1 else (datapoints[-1] % 13) + (datapoints[t-2] % 5) + (t % 7))","signal_min":1,"signal_max":20}""")))
        .orderBy("t")),

    // Absolute-anchor custom formula — Python's non-negative list
    // indexing (datapoints[j], constant j): each point reads the
    // FIRST TWO points ever generated (the normalize-by-initial-value
    // shape) next to the previous point, guarded at t<2 exactly as a
    // Python formula must guard IndexError. Closes the last
    // reference-surface indexing form short of arbitrary expressions.
    // Oracle: RECURSIVE CTE threading (v, anchor0, anchor1).
    "g_custom_index" -> ((s, _) =>
      Transforms.intCast(Generators.custom(s, "ts5i",
        Config.of("""{"num_points":300,"formula":"1 if t == 0 else (2 if t == 1 else (datapoints[0] % 9) + (datapoints[1] % 4) + (datapoints[-1] % 6) + (t % 7))","signal_min":1,"signal_max":20}""")))
        .orderBy("t")),

    // Replay (S3 "real" shape) driven from the events table: line N ≡
    // event_id N. Zero-pad/truncate to 2000 slots, scale to [1,100].
    "g_replay" -> ((s, dir) => {
      val src = eventsTbl(s, dir).select(col("event_id").as("t"), col("value"))
      Transforms.intCast(Replay.fromFrame(s, "replay1", src,
        Config.of("""{"num_points":2000,"signal_min":1,"signal_max":100}""")))
        .orderBy("t")
    }),

    // Zero-fill alignment of a 300-pt and a 500-pt series (T5).
    "g_zerofill" -> ((s, _) => {
      val a = Generators.constant(s, "tsa", Config.of("""{"num_points":300,"constant":7}"""))
      val b = Generators.square(s, "tsb",
        Config.of("""{"num_points":500,"low_value":10,"low_width":10,"high_value":40,"high_width":5}"""))
      Transforms.zeroFillAlign(Transforms.intCast(a unionByName b), Seq("tsa", "tsb"), 500L)
        .select("generator_id", "t", "value").orderBy("generator_id", "t")
    }),

    // D1 slot transpose, wide form (pivot) for oracle comparability.
    "d_slots" -> ((s, _) => slotsWideTsab(s).orderBy("t")),

    // D5 slicing: square wave of 0s and 7s, slice_size 3 → 0→[0], 7→[3,3,1].
    "d_slice" -> ((s, _) => {
      val sq = Transforms.intCast(Generators.square(s, "tsq",
        Config.of("""{"num_points":200,"low_value":0,"low_width":3,"high_value":7,"high_width":2}""")))
      Dispatch.sliceDatapoints(sq, 3L).orderBy("t", "value")
    }),

    // K2 CloudWatch metric frame over two deterministic series.
    "k_metrics" -> ((s, _) => {
      val bp = BlueprintParser.parse(
        """{"generators":[
          |  {"id":"tsa","shape":"constant","config":{"num_points":300,"constant":5}},
          |  {"id":"tsb","shape":"square","config":{"num_points":500,"low_value":10,"low_width":10,"high_value":40,"high_width":5}}],
          | "targets":[{"type":"cloudwatch","generators":["tsa","tsb"]}]}""".stripMargin)
      val series = Engine.materialize(s, bp, Seed)
      val routed = Dispatch.routeToTarget(series, bp.targets.head)
      Sinks.metricData(routed, bp, lit(1767225600L))
        .orderBy("id", "value")
    }),

    // Max-envelope stress: 100 generators × 20,160 slots (the
    // reference's documented 14-day ceiling, README.md:41) = 2M points
    // materialized through the real Engine path, exact oracle.
    "g_stress_envelope" -> ((s, _) => {
      val gens = (0 until 100).map { i =>
        val lw = i % 5 + 1; val hw = i % 3 + 1
        s"""{"id":"g${"%03d".format(i)}","shape":"square",
           | "config":{"low_value":$i,"low_width":$lw,"high_value":${2 * i + 1},"high_width":$hw}}""".stripMargin
      }.mkString(",")
      val bp = BlueprintParser.parse(
        s"""{"commons":{"num_points":20160},"generators":[$gens],"targets":[]}""")
      Engine.materialize(s, bp, Seed).orderBy("generator_id", "t")
    }),

    // ---- RNG-dependent (rows-only check; semantics pinned by goldens) ----
    "g_random_uniform" -> ((s, _) =>
      Transforms.intCast(Generators.random(s, "tsr",
        Config.of("""{"num_points":1000,"type":"uniform","signal_min":1,"signal_max":20}"""), Seed))
        .orderBy("t")),

    "g_random_gauss" -> ((s, _) =>
      Transforms.intCast(Generators.random(s, "tsg",
        Config.of("""{"num_points":1000,"type":"gauss","mu":10,"sigma":3,"signal_min":1,"signal_max":20}"""), Seed))
        .orderBy("t")),

    "g_noise" -> ((s, _) => {
      val cfg = Config.of("""{"num_points":500,"constant":10,"noise_min":1,"noise_max":5}""")
      Transforms.intCast(Transforms.applyNoise(
        Generators.constant(s, "tsn", cfg), cfg, Seed)).orderBy("t")
    }),

    "g_anomalies" -> ((s, _) => {
      val cfg = Config.of(AnomaliesCfgJson)
      Transforms.intCast(Transforms.applyAnomalies(
        Generators.square(s, "tsq", cfg), cfg.anomalies, cfg.numPoints, Seed, "tsq"))
        .orderBy("t")
    }),

    // D1 inverse: unpivot (melt) the wide slot frame back to the long
    // IR — proves the transpose is lossless in both directions. Uses
    // the SAME wide frame as d_slots (one shared helper), so the two
    // queries cannot drift apart.
    "d_unpivot" -> ((s, _) =>
      slotsWideTsab(s)
        .unpivot(Array(col("t")), Array(col("tsa"), col("tsb")),
          "generator_id", "value")
        .select("generator_id", "t", "value")
        .orderBy("generator_id", "t")),

    // D6/D7 grouped envelopes as JSON-ready frames.
    "d_envelopes" -> ((s, _) => {
      val bp = BlueprintParser.parse(
        """{"generators":[
          |  {"id":"tsa","shape":"constant","config":{"num_points":100,"constant":5}},
          |  {"id":"tsb","shape":"square","config":{"num_points":100,"low_value":2,"low_width":1,"high_value":9,"high_width":1}}],
          | "targets":[{"type":"lambda","function_name":"fn1","group_datapoints":true,"generators":["tsa","tsb"]}]}""".stripMargin)
      val series = Engine.materialize(s, bp, Seed)
      val routed = Dispatch.routeToTarget(series, bp.targets.head)
      Dispatch.envelopes(routed, to_timestamp(lit("2026-01-01 00:00:00")),
        """{"type":"lambda","function_name":"fn1"}""", grouped = true)
        .withColumn("datapoints", to_json(col("datapoints")))
        .orderBy("t")
    }),

    // Roundtrip: the activity generator's fake-object corpus summarized
    // as a training-data corpus profile — blueprint → fake documents →
    // per-provider structural summary. Same split as k_fake_objects/
    // k_object_meta: every output column is either an md5-column
    // derivation (provider dir, object keys) or a body-structure
    // invariant pinned by construction (CRLF line count = 2 disclaimer
    // CRLFs + fake_counts provider lines; the disclaimer prefix), so the
    // whole frame replays exactly in DuckDB. The wordlist body TEXT
    // itself stays rows-only (k_fake_objects; content pinned in
    // EngineSpec). The n_lines/disclaimed columns are computed from the
    // REAL bodies Spark-side and pinned to constants oracle-side — a
    // genuine structural assertion, not a tautology.
    "x_synthetic_corpus" -> ((s, _) => {
      val bp = BlueprintParser.parse(
        """{"generators":[{"id":"tsa","shape":"constant","config":{"num_points":200,"constant":2}}],
          | "targets":[{"type":"s3","action":"put","generators":["tsa"],
          |             "fake_types":["sentence","email","address","profile"],"fake_counts":3}]}""".stripMargin)
      val series = Engine.materialize(s, bp, Seed)
      val disclaimer = Sinks.Disclaimer
      Sinks.fakeObjects(Dispatch.routeToTarget(series, bp.targets.head),
        bp.targets.head, Seed)
        .select(
          split(col("key"), "/").getItem(0).as("provider_dir"),
          col("key").as("doc_id"),
          col("content_type"), col("acl"),
          ((length(col("body")) -
            length(regexp_replace(col("body"), "\r\n", ""))) / 2)
            .cast("long").as("n_lines"),
          col("body").startsWith(disclaimer).as("disclaimed"))
        .groupBy("provider_dir", "content_type", "acl")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("doc_id")).as("n_keys"),
          sum(col("n_lines")).cast("long").as("total_lines"),
          bool_and(col("disclaimed")).as("all_disclaimed"),
          min(col("doc_id")).as("first_key"),
          max(col("doc_id")).as("last_key"))
        .orderBy("provider_dir")
    }),

    // K1a fake S3 object corpus (seeded body text; rows-only — the
    // structural columns are exact-oracled separately by k_object_meta).
    "k_fake_objects" -> ((s, _) => {
      val series = Engine.materialize(s, FakeObjectsBp, Seed)
      Sinks.fakeObjects(Dispatch.routeToTarget(series, FakeObjectsBp.targets.head),
        FakeObjectsBp.targets.head, Seed).orderBy("t", "key")
    }),

    // K1a structural projection — everything fakeObjects derives from the
    // md5 column RNG (key dir/uuid, content_type, acl) plus the body's
    // CRLF line count, exact-oracled in DuckDB. The body TEXT itself is
    // wordlist-driven (rows-only above; content pinned in EngineSpec).
    "k_object_meta" -> ((s, _) => {
      val series = Engine.materialize(s, FakeObjectsBp, Seed)
      Sinks.fakeObjects(Dispatch.routeToTarget(series, FakeObjectsBp.targets.head),
        FakeObjectsBp.targets.head, Seed)
        .select(col("generator_id"), col("t"), col("key"), col("content_type"),
          col("acl"),
          ((length(col("body")) -
            length(regexp_replace(col("body"), "\r\n", ""))) / 2)
            .cast("long").as("n_lines"))
        .orderBy("t", "key")
    }),

    // K1/get read-amplification request frame. The GetObject pool is the
    // keys a put target wrote (ListObjectsV2 stand-in) padded with fake
    // keys — the reference's list-then-draw composition (src/main.py:
    // 931-975). The get volume (50/tick) deliberately exceeds the listed
    // pool (20 keys) so BOTH branches — real-key draws and the padded
    // fake tail — appear in the dump; every draw is md5-derived, so the
    // whole frame replays exactly in DuckDB (exact oracle).
    "k_get_requests" -> ((s, _) => {
      val bp = BlueprintParser.parse(
        """{"generators":[
          |  {"id":"tsa","shape":"constant","config":{"num_points":20,"constant":1}},
          |  {"id":"tsb","shape":"constant","config":{"num_points":50,"constant":50}}],
          | "targets":[
          |  {"type":"s3","action":"put","generators":["tsa"],"prefix":"data/","fake_types":["sentence"]},
          |  {"type":"s3","action":"get","generators":["tsb"],"prefix":"data/"}]}""".stripMargin)
      val series = Engine.materialize(s, bp, Seed)
      // orderBy before limit: an unordered limit takes whichever rows
      // scan first, which would make the dump partition-count-dependent
      val putKeys = Sinks.fakeObjects(
        Dispatch.routeToTarget(series, bp.targets.head), bp.targets.head, Seed)
        .select("key").orderBy("key").limit(100)
      Sinks.getRequests(Dispatch.routeToTarget(series, bp.targets(1)),
        bp.targets(1), Seed, Some(putKeys)).orderBy("t", "key")
    })
  )

  /** Shared by k_fake_objects (full dump, rows-only body) and
    * k_object_meta (exact-oracled structural projection) so the two
    * views can never drift apart. */
  private val FakeObjectsBp = BlueprintParser.parse(
    """{"generators":[{"id":"tsa","shape":"constant","config":{"num_points":50,"constant":3}}],
      | "targets":[{"type":"s3","action":"put","generators":["tsa"],
      |             "fake_types":["sentence","email","itin"],"fake_counts":2,
      |             "content_types":["text/plain","application/json"],
      |             "acls":["private","public-read"]}]}""".stripMargin)

  /** The d_slots wide frame (constant tsa=5×300 + square tsb, aligned
    * to 500 slots, pivoted) — shared by d_slots and its d_unpivot
    * inverse so the roundtrip proof can't drift. */
  private def slotsWideTsab(s: SparkSession): DataFrame = {
    val a = Generators.constant(s, "tsa", Config.of("""{"num_points":300,"constant":5}"""))
    val b = Generators.square(s, "tsb",
      Config.of("""{"num_points":500,"low_value":10,"low_width":10,"high_value":40,"high_width":5}"""))
    Transforms.zeroFillAlign(Transforms.intCast(a unionByName b), Seq("tsa", "tsb"), 500L)
      .groupBy("t").pivot("generator_id", Seq("tsa", "tsb")).agg(first("value"))
  }

  private val engineOracles: Map[String, String] = Map(
    "g_sinusoidal" ->
      s"""WITH base AS (SELECT t, sin((2*pi()*0.25) * (t * (600.0/599.0))) AS v
         |              FROM generate_series(0, 599) AS g(t)),
         |stats AS (SELECT min(v) AS mn, max(v) AS mx FROM base)
         |SELECT 'ts1' AS generator_id, t, ${scaleSql(1.0, 20.0)} AS value
         |FROM base, stats ORDER BY t""".stripMargin,

    "g_constant" ->
      """SELECT 'ts2' AS generator_id, t, CAST(20 AS BIGINT) AS value
        |FROM generate_series(0, 499) AS g(t) ORDER BY t""".stripMargin,

    "g_square" ->
      """SELECT 'ts4' AS generator_id, t,
        |       CAST(CASE WHEN t % 15 < 10 THEN 10 ELSE 40 END AS BIGINT) AS value
        |FROM generate_series(0, 499) AS g(t) ORDER BY t""".stripMargin,

    "g_custom" ->
      s"""WITH base AS (SELECT t, CAST(t % 50 + 3 * (t % 7) AS DOUBLE) AS v
         |              FROM generate_series(0, 399) AS g(t)),
         |stats AS (SELECT min(v) AS mn, max(v) AS mx FROM base)
         |SELECT 'ts5' AS generator_id, t, ${scaleSql(1.0, 20.0)} AS value
         |FROM base, stats ORDER BY t""".stripMargin,

    // the accumulating-series recurrence replayed step-by-step: rec
    // carries (slot, value, running max, running min); the recursive
    // arm computes slot t+1 FROM the extremes of slots 0..t (lateral
    // alias nv), exactly the reference's growing-datapoints eval
    "g_custom_prefix" ->
      s"""WITH RECURSIVE rec(t, v, mx, mn) AS (
         |  SELECT 0, CAST(1 AS DOUBLE), CAST(1 AS DOUBLE), CAST(1 AS DOUBLE)
         |  UNION ALL
         |  SELECT t + 1,
         |         (mx % 17) + (mn % 5) + CAST((t + 1) % 3 AS DOUBLE)
         |           + CAST((t + 1) % 7 AS DOUBLE) AS nv,
         |         greatest(mx, nv), least(mn, nv)
         |  FROM rec WHERE t < 299),
         |base AS (SELECT t, v FROM rec),
         |stats AS (SELECT min(v) AS mn, max(v) AS mx FROM base)
         |SELECT 'ts5p' AS generator_id, t, ${scaleSql(1.0, 20.0)} AS value
         |FROM base, stats ORDER BY t""".stripMargin,

    // the lag recurrence replayed step-by-step: rec carries
    // (slot, value, previous value), so at slot t+1 `v` is lag 1
    // (datapoints[-1]) and `p1` is lag 2 (datapoints[t-2]); the t=1
    // literal branch never touches the NULL p1 seed
    "g_custom_lag" ->
      s"""WITH RECURSIVE rec(t, v, p1) AS (
         |  SELECT 0, CAST(1 AS DOUBLE), CAST(NULL AS DOUBLE)
         |  UNION ALL
         |  SELECT t + 1,
         |         CASE WHEN t + 1 = 1 THEN CAST(2 AS DOUBLE)
         |              ELSE (v % 13) + (p1 % 5) + CAST((t + 1) % 7 AS DOUBLE)
         |         END AS nv,
         |         v
         |  FROM rec WHERE t < 299),
         |base AS (SELECT t, v FROM rec),
         |stats AS (SELECT min(v) AS mn, max(v) AS mx FROM base)
         |SELECT 'ts5l' AS generator_id, t, ${scaleSql(1.0, 20.0)} AS value
         |FROM base, stats ORDER BY t""".stripMargin,

    // the anchor recurrence replayed step-by-step: rec carries
    // (slot, value, first point, second point) — a0 is fixed by the
    // seed row, a1 latches at slot 1 via the lateral alias nv and is
    // constant after; the t=1 literal branch never touches the NULL a1
    "g_custom_index" ->
      s"""WITH RECURSIVE rec(t, v, a0, a1) AS (
         |  SELECT 0, CAST(1 AS DOUBLE), CAST(1 AS DOUBLE), CAST(NULL AS DOUBLE)
         |  UNION ALL
         |  SELECT t + 1,
         |         CASE WHEN t + 1 = 1 THEN CAST(2 AS DOUBLE)
         |              ELSE (a0 % 9) + (a1 % 4) + (v % 6)
         |                + CAST((t + 1) % 7 AS DOUBLE)
         |         END AS nv,
         |         a0,
         |         CASE WHEN t + 1 = 1 THEN nv ELSE a1 END
         |  FROM rec WHERE t < 299),
         |base AS (SELECT t, v FROM rec),
         |stats AS (SELECT min(v) AS mn, max(v) AS mx FROM base)
         |SELECT 'ts5i' AS generator_id, t, ${scaleSql(1.0, 20.0)} AS value
         |FROM base, stats ORDER BY t""".stripMargin,

    "g_replay" ->
      s"""WITH src AS (SELECT event_id AS t, value AS v FROM events WHERE event_id < 2000),
         |grid AS (SELECT t FROM generate_series(0, 1999) AS g(t)),
         |al AS (SELECT grid.t AS t, coalesce(src.v, 0.0) AS v
         |       FROM grid LEFT JOIN src ON grid.t = src.t),
         |stats AS (SELECT min(v) AS mn, max(v) AS mx FROM al)
         |SELECT 'replay1' AS generator_id, t, ${scaleSql(1.0, 100.0)} AS value
         |FROM al, stats ORDER BY t""".stripMargin,

    "g_zerofill" ->
      """SELECT * FROM (
        |  SELECT 'tsa' AS generator_id, t,
        |         CAST(CASE WHEN t < 300 THEN 7 ELSE 0 END AS BIGINT) AS value
        |  FROM generate_series(0, 499) AS g(t)
        |  UNION ALL
        |  SELECT 'tsb' AS generator_id, t,
        |         CAST(CASE WHEN t % 15 < 10 THEN 10 ELSE 40 END AS BIGINT) AS value
        |  FROM generate_series(0, 499) AS g(t)
        |) ORDER BY generator_id, t""".stripMargin,

    // The md5 counter-RNG replays bit-identically in DuckDB (Rng
    // scaladoc); min-max scaling + round-9 + ceil mirror scaledExpr.
    "g_random_uniform" ->
      s"""WITH base AS (SELECT t, ${uniformSql("random/uniform", "tsr")} AS v
         |              FROM generate_series(0, 999) AS g(t)),
         |stats AS (SELECT min(v) AS mn, max(v) AS mx FROM base)
         |SELECT 'tsr' AS generator_id, t, ${scaleSql(1.0, 20.0)} AS value
         |FROM base, stats ORDER BY t""".stripMargin,

    "g_random_gauss" ->
      s"""WITH base AS (SELECT t, 10.0 + 3.0 * ${gaussSql("random/gauss", "tsg")} AS v
         |              FROM generate_series(0, 999) AS g(t)),
         |stats AS (SELECT min(v) AS mn, max(v) AS mx FROM base)
         |SELECT 'tsg' AS generator_id, t, ${scaleSql(1.0, 20.0)} AS value
         |FROM base, stats ORDER BY t""".stripMargin,

    // apply_noise semantics: rescale the REALIZED gaussian sample to
    // [noise_min, noise_max], add to the signal, clamp at 0.
    "g_noise" ->
      s"""WITH base AS (SELECT t, ${gaussSql("noise", "tsn")} AS v
         |              FROM generate_series(0, 499) AS g(t)),
         |stats AS (SELECT min(v) AS mn, max(v) AS mx FROM base)
         |SELECT 'tsn' AS generator_id, t,
         |       CAST(greatest(0.0, 10.0 +
         |            ceil(round((v - mn) / (mx - mn) * 4.0 + 1.0, 9))) AS BIGINT) AS value
         |FROM base, stats ORDER BY t""".stripMargin,

    // Anomaly slots are drawn driver-side from the deterministic seed,
    // so the SAME slots are injected here as literals; the default
    // formula is (floor(max(series)) + 1)^2 over the pre-injection
    // series.
    "g_anomalies" -> {
      val cfg = Config.of(AnomaliesCfgJson)
      val slots = Transforms.anomalySlots(cfg.anomalies.head, cfg.numPoints,
        Seed, "tsq", 0).mkString(", ")
      s"""WITH base AS (SELECT t, CAST(CASE WHEN t % 5 < 3 THEN 1 ELSE 7 END AS DOUBLE) AS v
         |              FROM generate_series(0, 199) AS g(t)),
         |stats AS (SELECT pow(floor(max(v)) + 1.0, 2.0) AS anom FROM base)
         |SELECT 'tsq' AS generator_id, t,
         |       CAST(CASE WHEN t IN ($slots) THEN anom ELSE v END AS BIGINT) AS value
         |FROM base, stats ORDER BY t""".stripMargin
    },

    "d_slots" ->
      """SELECT t,
        |       CAST(CASE WHEN t < 300 THEN 5 ELSE 0 END AS BIGINT) AS tsa,
        |       CAST(CASE WHEN t % 15 < 10 THEN 10 ELSE 40 END AS BIGINT) AS tsb
        |FROM generate_series(0, 499) AS g(t) ORDER BY t""".stripMargin,

    "d_slice" ->
      """SELECT * FROM (
        |  WITH base AS (SELECT t, CAST(CASE WHEN t % 5 < 3 THEN 0 ELSE 7 END AS BIGINT) AS v
        |                FROM generate_series(0, 199) AS g(t))
        |  SELECT 'tsq' AS generator_id, t,
        |         unnest(CASE WHEN v = 0 THEN [CAST(0 AS BIGINT)]
        |                ELSE [CAST(least(3, v - (i-1)*3) AS BIGINT)
        |                      for i in generate_series(1, CAST(ceil(v / 3.0) AS INT))]
        |                END) AS value
        |  FROM base
        |) ORDER BY t, value""".stripMargin,

    "g_stress_envelope" ->
      """SELECT printf('g%03d', i) AS generator_id, t,
        |       CAST(CASE WHEN t % ((i % 5 + 1) + (i % 3 + 1)) < i % 5 + 1
        |                 THEN i ELSE 2 * i + 1 END AS BIGINT) AS value
        |FROM range(100) AS g(i) CROSS JOIN range(20160) AS tt(t)
        |ORDER BY generator_id, t""".stripMargin,

    "k_metrics" ->
      """SELECT * FROM (
        |  SELECT 1767225600 AS ts, 'Timeseries' AS metric_name, 'constant' AS shape,
        |         'tsa' AS id, CAST(5 AS DOUBLE) AS value, 'Count' AS unit
        |  FROM generate_series(0, 299)
        |  UNION ALL
        |  SELECT 1767225600, 'Timeseries', 'square', 'tsb',
        |         CAST(CASE WHEN t % 15 < 10 THEN 10 ELSE 40 END AS DOUBLE), 'Count'
        |  FROM generate_series(0, 499) AS g(t)
        |) ORDER BY id, value""".stripMargin,

    // K1a structural oracle: every column of k_object_meta is a pure
    // function of md5 draws replayed here (see Sinks.fakeObjects); the
    // body line count is pinned by construction (2 disclaimer CRLFs +
    // fake_counts=2 single-line providers).
    "k_object_meta" -> {
      val keys = "t::VARCHAR || chr(1) || obj"
      def pickSql(items: Seq[String], stream: String): String =
        s"[${items.map("'" + _ + "'").mkString(",")}]" +
          s"[CAST(floor(${uniformSql(stream, "tsa", keys)} * ${items.size}.0) AS INT) + 1]"
      s"""WITH obj AS (SELECT t, o.i AS obj FROM generate_series(0, 49) g(t)
         |             CROSS JOIN generate_series(1, 3) o(i)),
         |m AS (SELECT t, obj, ${digestSql("obj_uuid", "tsa", keys)} AS d,
         |             ${pickSql(Seq("sentence", "email", "itin"), "obj_provider")} AS provider,
         |             ${uniformSql("obj_mixed", "tsa", keys)} AS um,
         |             ${pickSql(Seq("text/plain", "application/json"), "obj_ctype")} AS content_type,
         |             ${pickSql(Seq("private", "public-read"), "obj_acl")} AS acl
         |      FROM obj)
         |SELECT 'tsa' AS generator_id, t,
         |       (CASE WHEN um < 0.5 THEN provider ELSE 'mixed' END) || '/' ||
         |       ${uuidSql("d")} || '.fake' AS key,
         |       content_type, acl, CAST(4 AS BIGINT) AS n_lines
         |FROM m ORDER BY t, key""".stripMargin
    },

    // K1/get oracle: pool = the put target's 20 md5-derived keys (sorted,
    // limit 100), draws = floor(u*50) with replacement; draw >= pool size
    // falls into the fake-object tail whose 8-letter suffix is the md5
    // byte→52-letter map from Sinks.getRequests.
    "k_get_requests" -> {
      val letters = (('A' to 'Z') ++ ('a' to 'z')).mkString
      val fakeSuffix = (0 until 8).map(i =>
        s"substr('$letters', 1 + ('0x' || substr(f.d, ${2 * i + 1}, 2))::BIGINT % 52, 1)")
        .mkString(" || ")
      val putKeys = "t::VARCHAR || chr(1) || '1'"
      s"""WITH putobj AS (SELECT t, ${digestSql("obj_uuid", "tsa", putKeys)} AS d,
         |                       ${uniformSql("obj_mixed", "tsa", putKeys)} AS um
         |                FROM generate_series(0, 19) g(t)),
         |putkeys AS (SELECT 'data/' || (CASE WHEN um < 0.5 THEN 'sentence' ELSE 'mixed' END)
         |                   || '/' || ${uuidSql("d")} || '.fake' AS key FROM putobj),
         |pool AS (SELECT key, row_number() OVER (ORDER BY key) - 1 AS idx
         |         FROM (SELECT key FROM putkeys ORDER BY key LIMIT 100)),
         |draws AS (SELECT t, CAST(floor(${uniformSql("get_draw", "tsb", "t::VARCHAR || chr(1) || o.i")} * 50.0) AS BIGINT) AS draw
         |          FROM generate_series(0, 49) g(t) CROSS JOIN generate_series(1, 50) o(i)),
         |fk AS (SELECT t, draw, ${digestSql("get_key", "tsb", "t::VARCHAR || chr(1) || draw")} AS d FROM draws)
         |SELECT 'tsb' AS generator_id, f.t AS t,
         |       CASE WHEN f.draw < 20 THEN p.key
         |            ELSE 'data/fake-object-' || $fakeSuffix END AS key,
         |       CAST(50 AS BIGINT) AS key_pool_size
         |FROM fk f LEFT JOIN pool p ON f.draw = p.idx
         |ORDER BY t, key""".stripMargin
    },

    "d_unpivot" ->
      """SELECT * FROM (
        |  SELECT 'tsa' AS generator_id, t,
        |         CAST(CASE WHEN t < 300 THEN 5 ELSE 0 END AS BIGINT) AS value
        |  FROM generate_series(0, 499) AS g(t)
        |  UNION ALL
        |  SELECT 'tsb' AS generator_id, t,
        |         CAST(CASE WHEN t % 15 < 10 THEN 10 ELSE 40 END AS BIGINT) AS value
        |  FROM generate_series(0, 499) AS g(t)
        |) ORDER BY generator_id, t""".stripMargin,

    // Wire-format oracle: the blueprint uses only deterministic shapes
    // (constant 5, square 2/9 width 1/1), so the grouped envelope JSON
    // — including Spark's to_json field order and the sorted datapoint
    // array — is reconstructed literally.
    "d_envelopes" ->
      """SELECT t,
        |  'amazon-macie-activity-generator' AS source,
        |  'execute-datapoints' AS action,
        |  '2026-01-01T00:00:00Z' AS "timestamp",
        |  '[{"generator_id":"tsa","value":5},{"generator_id":"tsb","value":' ||
        |    CASE WHEN t % 2 = 0 THEN '2' ELSE '9' END || '}]' AS datapoints,
        |  '{"type":"lambda","function_name":"fn1"}' AS target
        |FROM generate_series(0, 99) AS g(t)
        |ORDER BY t""".stripMargin
  )

  // === Relational suite over the TPC-H-ish tables =======================

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** ONE recursive-CTE text executed verbatim by BOTH engines
    * (q_recursive_cte): exact-duplicate closure where each document
    * points at its GREATEST smaller same-text peer — unique parent ⇒
    * unique UNION ALL paths (terminates; row count is linear PER PATH
    * but the i-th smallest doc of a duplicate group walks i hops, so
    * totals are quadratic in the largest duplicate-group size — fine
    * for the 500-doc fixture, path-halving if a real corpus needs it),
    * and following the chain to its end reaches the group minimum. */
  private val RecursiveClosureSql: String =
    """WITH RECURSIVE
      |e AS (SELECT x, max(y) AS y FROM (
      |        SELECT a.doc_id AS x, b.doc_id AS y
      |        FROM documents a JOIN documents b
      |          ON a.text = b.text AND b.doc_id < a.doc_id)
      |      GROUP BY x),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION ALL
      |  SELECT reach.id, e.y FROM reach JOIN e ON reach.r = e.x)
      |SELECT id AS doc_id, min(r) AS rep
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  private val relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary; exact decimal sums → one final
    // double rounding, deterministic across engines.
    "q1_pricing_summary" -> ((s, dir) => {
      val l = tbl(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      val discPrice = dec2(col("l_extendedprice")) * dec2(lit(1.0) - col("l_discount"))
      val charge = discPrice.cast("decimal(18,4)") * dec2(lit(1.0) + col("l_tax"))
      l.groupBy("l_returnflag", "l_linestatus").agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3-style: 3-way join (broadcast dim), top-10 by revenue.
    "q3_top_orders" -> ((s, dir) => {
      val c = tbl(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = tbl(s, dir, "orders")
        .where(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      val l = tbl(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          unix_timestamp(col("o_orderdate")).as("o_orderdate_e"))
        .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1.0) - col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape — the 6-table star-with-a-twist (customer AND
    // supplier must share a nation): region/nation are broadcast dims,
    // customer broadcast onto orders, the fact-fact lineitem⋈orders
    // shuffles once on the order key, and the same-nation predicate
    // rides the supplier broadcast. Revenue in DECIMAL(18,2) exact
    // arithmetic, one double cast at the end (the q1/q3 discipline).
    "q5_local_supplier" -> ((s, dir) => {
      val r = tbl(s, dir, "region").where(col("r_name") === "ASIA")
      val n = tbl(s, dir, "nation")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val c = tbl(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val o = tbl(s, dir, "orders").select("o_orderkey", "o_custkey")
      val l = tbl(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val su = tbl(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1.0) - col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // Left-semi join: customers with at least one big order, per segment.
    "q_semi_join" -> ((s, dir) => {
      val bigOrders = tbl(s, dir, "orders").where(col("o_totalprice") > 400000.0)
      tbl(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")
    }),

    // Left-anti join: orders with no high-quantity lineitem, by status.
    "q_anti_join" -> ((s, dir) => {
      val hi = tbl(s, dir, "lineitem").where(col("l_quantity") >= 48.0)
      tbl(s, dir, "orders")
        .join(hi, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    // CUBE grouping sets over two dims.
    "q_cube" -> ((s, dir) =>
      tbl(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"))
        .orderBy("status", "priority")),

    // ROLLUP grouping sets (nulls exported as 'ALL' for cross-engine order).
    "q_rollup" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("sum_qty"))
        .orderBy("rflag", "lstatus")),

    // Correlated LATERAL subquery (§2.6 SQL-surface): per nation, the
    // lateral top-2 suppliers by account balance — the SQL spelling of
    // per-group top-k that pushes the correlation INTO the subquery.
    // Spark plans the correlated limit as a partitioned window under
    // the hood; DuckDB executes LATERAL natively — same rows, and the
    // SQL text idiom users port from warehouses runs verbatim.
    "q_lateral_join" -> ((s, dir) => {
      tbl(s, dir, "nation").createOrReplaceTempView("nation")
      tbl(s, dir, "supplier").createOrReplaceTempView("supplier")
      s.sql(
        """SELECT n.n_name, t.s_suppkey, t.s_acctbal
          |FROM nation n,
          |LATERAL (SELECT s_suppkey, s_acctbal FROM supplier
          |         WHERE s_nationkey = n.n_nationkey
          |         ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
          |ORDER BY n.n_name, t.s_acctbal DESC, t.s_suppkey""".stripMargin)
    }),

    // listagg (new SQL:2023 surface in Spark 4) with WITHIN GROUP
    // ordering — deterministic ordered string aggregation, the
    // report-building idiom ported from warehouses.
    "q_listagg" -> ((s, dir) => {
      tbl(s, dir, "nation").createOrReplaceTempView("nation")
      tbl(s, dir, "region").createOrReplaceTempView("region")
      s.sql(
        """SELECT r.r_name,
          |       listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
          |         AS nations,
          |       count(*) AS n
          |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
          |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin)
    }),

    // Window: top-3 orders per customer by totalprice.
    "q_window_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // Sessionization: 30-min inactivity gap, pure integer (µs) math.
    "q_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tse", "event_id")
      val e = eventsTbl(s, dir)
        .select(col("user_id"), col("event_id"), expr("ts div 1000").as("tse"))
      val flagged = e.withColumn("ns",
        when(lag("tse", 1).over(w).isNull ||
          col("tse") - lag("tse", 1).over(w) > 1800000000L, 1L).otherwise(0L))
      flagged
        .withColumn("sid", sum("ns").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"), min("tse").as("s_start"), max("tse").as("s_end"))
        .orderBy("user_id", "sid")
    }),

    // Batch form of the stream-stream interval join: the SAME
    // EventTimeOps.intervalJoin code path the streaming suite runs
    // (withWatermark is a no-op on batch frames), so the streaming
    // operator's join semantics get a DuckDB CORRECTNESS row. Clicks
    // paired with same-user errors within ±2h of event time.
    "q_interval_join" -> ((s, dir) => {
      val e = eventsTbl(s, dir).select(col("user_id"), col("event_type"),
        timestamp_micros(expr("ts div 1000")).as("ts"), col("value"))
      val clicks = e.where(col("event_type") === "click")
      val errors = e.where(col("event_type") === "error")
      graft.streaming.EventTimeOps.intervalJoin(
        clicks, errors, "user_id", "ts", "value", within = "2 hours")
        .select(col("user_id"),
          unix_micros(col("l_ts")).as("l_es"), col("l_value"),
          unix_micros(col("r_ts")).as("r_es"), col("r_value"))
        .orderBy("user_id", "l_es", "r_es")
    }),

    // Left-outer form of the same stream-stream operator: clicks with no
    // same-user error within ±2h survive with null right columns — the
    // batch CORRECTNESS row for the outer path (streaming emission at
    // the watermark is covered in StreamingSpec).
    "q_interval_join_outer" -> ((s, dir) => {
      val e = eventsTbl(s, dir).select(col("user_id"), col("event_type"),
        timestamp_micros(expr("ts div 1000")).as("ts"), col("value"))
      val clicks = e.where(col("event_type") === "click")
      val errors = e.where(col("event_type") === "error")
      graft.streaming.EventTimeOps.intervalJoin(
        clicks, errors, "user_id", "ts", "value", within = "2 hours",
        joinType = "left_outer")
        .select(col("user_id"),
          unix_micros(col("l_ts")).as("l_es"), col("l_value"),
          unix_micros(col("r_ts")).as("r_es"), col("r_value"))
        .orderBy("user_id", "l_es", "r_es")
    }),

    // Full-outer form: every click AND every error survives; the key is
    // coalesced across sides so it is never null.
    "q_interval_join_full" -> ((s, dir) => {
      val e = eventsTbl(s, dir).select(col("user_id"), col("event_type"),
        timestamp_micros(expr("ts div 1000")).as("ts"), col("value"))
      val clicks = e.where(col("event_type") === "click")
      val errors = e.where(col("event_type") === "error")
      graft.streaming.EventTimeOps.intervalJoin(
        clicks, errors, "user_id", "ts", "value", within = "2 hours",
        joinType = "full_outer")
        .select(col("user_id"),
          unix_micros(col("l_ts")).as("l_es"), col("l_value"),
          unix_micros(col("r_ts")).as("r_es"), col("r_value"))
        .orderBy("user_id", "l_es", "r_es")
    }),

    // Tumbling 1h event-time aggregation (batch form of the stream op).
    "q_events_hourly" -> ((s, dir) =>
      eventsTbl(s, dir)
        .groupBy(expr("(ts div 3600000000000) * 3600000000").as("hour_e"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
          min("value").as("min_value"), max("value").as("max_value"))
        .orderBy("hour_e", "event_type")),

    // Gap-filled resampling: per-type hourly counts over the FULL
    // [min, max] hour grid, missing hours zero-filled — the
    // timeseries-regularization step before any rolling computation;
    // the grid is a bounded per-key sequence explode (span-hours
    // fan-out), the zero-fill a narrow left join.
    "q_events_resample" -> ((s, dir) => {
      val e = eventsTbl(s, dir).select(col("event_type"),
        expr("ts div 3600000000000").as("hr"))
      val counts = e.groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
      val grid = e.groupBy("event_type")
        .agg(min("hr").as("lo"), max("hr").as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"))).as("hr"))
      grid.join(counts, Seq("event_type", "hr"), "left")
        .select(col("event_type"), (col("hr") * lit(3600000000L)).as("hour_e"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("event_type", "hour_e")
    }),

    // Contract validation (the dbt-test / data-quality gate): every
    // documents row checked against its declared invariants in ONE
    // scan pass; emits per-rule violation counts (all-zero here — the
    // gate's green path — but the rules run for real; a violating
    // fixture is spec-checked in ExtSpec).
    "x_schema_check" -> ((s, dir) =>
      Corpus.schemaCheck(tbl(s, dir, "documents"),
        Seq("en", "de", "fr", "es", "zh"))),

    // Exact integer anomaly screen over the resampled grid: flag
    // hours whose count deviates from the per-type mean by >3σ,
    // decided by the cross-multiplied INTEGER inequality
    // (n·N − S)² > 9·(Q·N − S²) — no float mean/σ anywhere, so the
    // flag set is bit-exact in both engines. Composes the resample
    // grid with a |types|-bounded moment frame.
    "x_events_anomalies" -> ((s, dir) => {
      val e = eventsTbl(s, dir).select(col("event_type"),
        expr("ts div 3600000000000").as("hr"))
      val counts = e.groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
      val grid = e.groupBy("event_type")
        .agg(min("hr").as("lo"), max("hr").as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"))).as("hr"))
      val filled = grid.join(counts, Seq("event_type", "hr"), "left")
        .select(col("event_type"), col("hr"),
          coalesce(col("n"), lit(0L)).as("n"))
      val moments = filled.groupBy("event_type").agg(
        count(lit(1)).as("nHours"), sum("n").as("sTot"),
        sum(col("n") * col("n")).as("qTot"))
      filled.join(broadcast(moments), "event_type")
        .where((col("n") * col("nHours") - col("sTot")) *
          (col("n") * col("nHours") - col("sTot")) >
          lit(9L) * (col("qTot") * col("nHours") - col("sTot") * col("sTot")))
        .select(col("event_type"), (col("hr") * lit(3600000000L)).as("hour_e"),
          col("n"))
        .orderBy("event_type", "hour_e")
    }),

    // JSON functions: parse events.props with a declared schema and
    // aggregate the extracted field (§2.6 array/map/JSON row).
    "q_json_extract" -> ((s, dir) =>
      eventsTbl(s, dir)
        .withColumn("k", expr("from_json(props, 'k LONG').k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")),

    // Spark 4 VARIANT surface (the schema-on-read JSON path — no
    // declared struct): parse_json → semi-structured VARIANT column,
    // typed variant_get extraction, try_variant_get's NULL on a type
    // mismatch, and schema_of_variant agreement across rows. The
    // oracle replays with plain json_extract (same values, no variant
    // needed on the DuckDB side — VARIANT is an execution detail, the
    // SEMANTICS are json path + cast).
    "q_variant_extract" -> ((s, dir) =>
      eventsTbl(s, dir)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'long')").as("k"),
          // a scalar can't become an array — the one cast variant
          // genuinely refuses (LONG→TIMESTAMP, by contrast, succeeds
          // as epoch seconds)
          expr("try_variant_get(v, '$.k', 'array<long>')").as("bad_cast"),
          expr("try_variant_get(v, '$.missing', 'long')").as("absent"),
          expr("schema_of_variant(v)").as("sch"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          count(col("bad_cast")).as("n_bad_cast"),
          count(col("absent")).as("n_absent"),
          countDistinct("sch").as("n_schemas"))
        .orderBy("event_type")),

    // Multi-format scan round-trip (§2.6 scans beyond parquet): the
    // lineitem projection is written ONCE to the warehouse as CSV and
    // as JSON (`_SUCCESS`-guarded, the build-once convention), read
    // back through Spark's csv/json sources with an explicit schema,
    // and aggregated to exact integers per format — the oracle
    // computes the same aggregate straight from parquet, so any
    // round-trip corruption in either format breaks the hash.
    "q_multiformat_scan" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      def ensure(fmt: String)(write: String => Unit): String = {
        val p = graft.ext.Warehouse.tablePath(s,
          whName(s"multifmt_$fmt", s"$dir|$fmt|v1"))
        // mode(overwrite) clears a partial previous write by itself
        if (!java.nio.file.Files.exists(p.resolve("_SUCCESS")))
          write(p.toString)
        p.toString
      }
      val csvPath = ensure("csv")(p =>
        li.write.mode("overwrite").option("header", "true").csv(p))
      val jsonPath = ensure("json")(p => li.write.mode("overwrite").json(p))
      val orcPath = ensure("orc")(p => li.write.mode("overwrite").orc(p))
      val schema = "l_orderkey BIGINT, l_linenumber INT, " +
        "l_returnflag STRING, l_quantity DOUBLE"
      val csv = s.read.schema(schema).option("header", "true").csv(csvPath)
      val json = s.read.schema(schema).json(jsonPath)
      val orc = s.read.schema(schema).orc(orcPath)
      def aggOf(df: DataFrame, fmt: String): DataFrame = df
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_orderkey")).as("sum_okey"),
          // quantities are integral; the long cast keeps the sum exact
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(lit(fmt).as("fmt"), col("l_returnflag"), col("n_rows"),
          col("sum_okey"), col("sum_qty"))
      aggOf(csv, "csv").unionByName(aggOf(json, "json"))
        .unionByName(aggOf(orc, "orc"))
        .orderBy("fmt", "l_returnflag")
    }),

    // Partition-pruned scan: documents written ONCE partitioned by
    // lang (`_SUCCESS`-guarded warehouse dir), read back with a
    // partition-column filter — the filter resolves at PLANNING time
    // (PartitionFilters in the scan, pinned by ScaleSpec), so only
    // the en/zh directories are listed and read. The layout every
    // 100 TB corpus store uses for its hottest predicate column.
    "q_partitioned_scan" -> ((s, dir) => {
      val p = graft.ext.Warehouse.tablePath(s,
        whName("docs_bylang", s"$dir|lang|v1"))
      if (!java.nio.file.Files.exists(p.resolve("_SUCCESS")))
        tbl(s, dir, "documents").select("doc_id", "n_chars", "lang")
          .write.mode("overwrite").partitionBy("lang").parquet(p.toString)
      s.read.parquet(p.toString)
        .where(col("lang").isin("en", "zh"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("lang")
    }),

    // Correlated scalar subquery (§2.6): customers above their
    // nation's average balance, driven through spark.sql so
    // Catalyst's decorrelation (subquery → aggregate + join) runs for
    // real. The comparison cross-multiplies on the cent grid —
    // integer-exact, so the oracle can't drift on float-avg
    // association order.
    "q_scalar_subquery" -> ((s, dir) => {
      tbl(s, dir, "customer").createOrReplaceTempView("graft_customer")
      s.sql(
        """SELECT c_custkey, c_nationkey
          |FROM graft_customer c
          |WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
          |      (SELECT count(*) FROM graft_customer c2
          |       WHERE c2.c_nationkey = c.c_nationkey) >
          |      (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT))
          |       FROM graft_customer c2
          |       WHERE c2.c_nationkey = c.c_nationkey)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Pivot (§2.6): revenue and row counts spread over the linestatus
    // axis — groupBy().pivot() with explicit values (plan-time column
    // set; a discovery pivot would add a collect job).
    "q_pivot_flags" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1.0) - col("l_discount")))
          .cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Set operations: EXCEPT / INTERSECT with distinct semantics.
    "q_setop" -> ((s, dir) => {
      val a = tbl(s, dir, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("key")).distinct()
      val b = tbl(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("key"))
      a.except(b).select(lit("except").as("op"), col("key"))
        .unionByName(a.intersect(b).select(lit("intersect").as("op"), col("key")))
        .orderBy("op", "key")
    }),

    // Null-safe equality join (§2.6 nuance): <=> pairs NULL keys with
    // NULL keys where a plain equi-join silently drops them — every
    // 100th key nulled on both sides, so the NULL×NULL match mass is
    // real and counted.
    "q_null_safe_join" -> ((s, dir) => {
      val l = tbl(s, dir, "lineitem")
        .select(when(col("l_orderkey") % 100 === 0, lit(null))
          .otherwise(col("l_orderkey")).as("lk"))
      val o = tbl(s, dir, "orders")
        .select(when(col("o_orderkey") % 100 === 0, lit(null))
          .otherwise(col("o_orderkey")).as("ok"), col("o_orderstatus"))
      l.join(o, col("lk") <=> col("ok"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("lk").isNull, 1L).otherwise(0L)).as("n_null_pairs"))
        .orderBy("o_orderstatus")
    }),

    // explode_outer semantics (§2.6 nuance): token-less documents
    // survive the explode as a NULL-token row instead of vanishing —
    // the difference between "per-token fact table" and "per-token
    // fact table that silently dropped 3% of the corpus".
    "q_explode_outer" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          explode_outer(TextStats.tokens(col("text"))).as("tok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_rows"), count(col("tok")).as("n_toks"))
        .orderBy("doc_id")),

    // Higher-order array functions (§2.6): transform / filter /
    // aggregate composed per row, all-integer so the fold is exact.
    "q_higher_order" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextStats.tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          size(col("tk")).cast("long").as("n_toks"),
          aggregate(transform(col("tk"), t => length(t).cast("long")),
            lit(0L), (acc, x) => acc + x).as("sum_len"),
          size(filter(col("tk"), t => length(t) > 4)).cast("long")
            .as("n_long"),
          aggregate(filter(transform(col("tk"), t => length(t).cast("long")),
            x => x % 2L === 0L), lit(0L), (acc, x) => acc + x)
            .as("sum_even_len"))
        .orderBy("doc_id")),

    // Multiset set-ops (§2.6's EXCEPT ALL / INTERSECT ALL forms):
    // per-occurrence semantics over duplicate-heavy key streams,
    // summarized to (op, key, surviving multiplicity).
    "q_setop_all" -> ((s, dir) => {
      val l = tbl(s, dir, "lineitem")
      val a = l.where(col("l_returnflag") === "A")
        .select(col("l_suppkey").as("k"))
      val b = l.where(col("l_returnflag") === "R")
        .select(col("l_suppkey").as("k"))
      a.exceptAll(b).groupBy("k").agg(count(lit(1)).as("n"))
        .select(lit("except_all").as("op"), col("k"), col("n"))
        .unionByName(
          a.intersectAll(b).groupBy("k").agg(count(lit(1)).as("n"))
            .select(lit("intersect_all").as("op"), col("k"), col("n")))
        .orderBy("op", "k")
    }),

    // String/date function coverage (§2.6): formatting, substrings,
    // regex replace, month bucketing via epoch math.
    "q_string_date" -> ((s, dir) =>
      tbl(s, dir, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("name_u"),
          substring(col("c_mktsegment"), 1, 4).as("seg4"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("name_masked"),
          concat_ws("|", col("c_mktsegment"), col("c_custkey")).as("tag"),
          length(col("c_name")).cast("long").as("name_len"))
        .orderBy("c_custkey")),

    // Exact percentiles (interpolated) per group.
    "q_percentiles" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Skew-safe salted join — must be bit-identical to the plain join
    // (the oracle IS the plain join in DuckDB). Hot/cold form: only a
    // designated hot-key slice pays the salting machinery (replication
    // bounded at |hot| × buckets); the cold majority joins plain —
    // what a real pipeline does once heavy hitters are known.
    "q_salted_join" -> ((s, dir) => {
      val l = tbl(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val o = tbl(s, dir, "orders").select("o_orderkey", "o_orderstatus")
        .withColumnRenamed("o_orderkey", "l_orderkey")
      // stand-in heavy-hitter list: every 50th orderkey (~2% of keys) —
      // deterministic, no extra pass over the fact side
      val hot = o.select("l_orderkey").where(pmod(col("l_orderkey"), lit(50)) === 0)
      graft.operators.SkewUtils.saltedJoinHotCold(l, o, Seq("l_orderkey"),
          buckets = 8, hotKeys = hot)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy("o_orderstatus")
    }),

    // Bucketed co-located join: both sides bucketed by the join key at
    // write time → SortMergeJoin with NO Exchange on either side (the
    // at-scale alternative to shuffling 100 TB per join). Result must
    // equal the plain join (same oracle shape as q_salted_join).
    "q_bucketed_join" -> ((s, dir) => {
      val buckets = 8
      // Each table guarded separately so a failure between the two
      // writes self-heals on retry. The in-memory catalog forgets tables
      // between sessions but warehouse dirs survive: a COMPLETE previous
      // write (_SUCCESS marker) is re-attached as an external bucketed
      // table over the same LOCATION — bucket ids live in the file
      // names, so the shuffle-free join survives without re-bucketing
      // the fact tables every session. Partial writes are cleared and
      // redone. The table name fingerprints sf dir + schema + bucket
      // count, so changing any of those falls through to a fresh CTAS
      // instead of silently attaching stale files.
      def suffix(src: org.apache.spark.sql.DataFrame): Int =
        scala.util.hashing.MurmurHash3.stringHash(
          s"$dir|${src.schema.toDDL}|$buckets") & 0x7fffffff
      def ensure(t: String, keyCol: String)(src: org.apache.spark.sql.DataFrame): Unit =
        if (!s.catalog.tableExists(t)) {
          val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir"))
          val p = java.nio.file.Paths.get(
            if (wh.getScheme == "file") java.nio.file.Paths.get(wh).toString
            else wh.getPath).resolve(t)
          if (java.nio.file.Files.exists(p.resolve("_SUCCESS"))) {
            s.sql(s"CREATE TABLE $t (${src.schema.toDDL}) USING PARQUET " +
              s"CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $buckets BUCKETS " +
              s"LOCATION '${p.toUri}'")
          } else {
            if (java.nio.file.Files.exists(p)) {
              java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
                .forEach(f => java.nio.file.Files.delete(f))
            }
            src.write.bucketBy(buckets, keyCol).sortBy(keyCol)
              .mode("overwrite").saveAsTable(t)
          }
        }
      val lSrc = tbl(s, dir, "lineitem").select("l_orderkey", "l_extendedprice")
      val oSrc = tbl(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      val lTbl = s"l_bucketed_${suffix(lSrc)}"
      val oTbl = s"o_bucketed_${suffix(oSrc)}"
      ensure(lTbl, "l_orderkey")(lSrc)
      ensure(oTbl, "o_orderkey")(oSrc)
      s.table(lTbl)
        .join(s.table(oTbl), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // As-of join: each click event aligned to the user's most recent
    // prior (or simultaneous) view. Union + per-key ordered window —
    // one shuffle on user_id, linear in |clicks|+|views|; never the
    // O(n·m)-per-key range-join formulation (see AsOfJoin scaladoc).
    "q_asof_join" -> ((s, dir) => {
      val e = eventsTbl(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_event_id"), col("value").as("view_value"))
      AsOfJoin.asOf(clicks, views, Seq("user_id"), "ts", "ts",
          Seq("view_event_id", "view_value"))
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("t_click_us"),
          col("asof_view_event_id").as("view_event_id"),
          col("asof_view_value").as("view_value"))
        .orderBy("event_id")
    }),

    // Range (interval-membership) join: lineitems classified into price
    // bands. The band dim is provably tiny → broadcast non-equi join
    // (BroadcastNestedLoop with a 5-row build side), so the fact table
    // streams through map-side with no shuffle.
    "q_range_join" -> ((s, dir) => {
      val bands = s.createDataFrame(Seq(
        ("A", 0.0, 10000.0), ("B", 10000.0, 25000.0),
        ("C", 25000.0, 50000.0), ("D", 50000.0, 100000.0),
        ("E", 100000.0, 1000000000.0))).toDF("band", "lo", "hi")
      tbl(s, dir, "lineitem").join(broadcast(bands),
          col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
        .groupBy("band").agg(count(lit(1)).as("n"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy("band")
    }),

    // Bloom semi-join reduction: the selective dim's key set rides a
    // broadcast Bloom filter that prunes the fact side BEFORE its
    // shuffle; false positives drop in the real join, so the result
    // equals the plain join (which is exactly what the oracle runs).
    "q_bloom_join" -> ((s, dir) => {
      val dim = tbl(s, dir, "orders").where(col("o_totalprice") > 450000.0)
      graft.operators.SkewUtils.bloomPrunedJoin(tbl(s, dir, "lineitem"), dim,
          "l_orderkey", "o_orderkey", expectedKeys = 20000L)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // Explicit GROUPING SETS (beyond rollup/cube): per-status,
    // per-priority, and grand-total aggregates in one pass. NULL
    // grouping keys are coalesced to 'ALL' like q_rollup/q_cube —
    // engines disagree on NULL sort position, so NULL keys must never
    // reach the cross-engine compare.
    "q_grouping_sets" -> ((s, dir) =>
      tbl(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy("status", "priority")),

    // Rolling window over event time per type (7-row trailing frame);
    // the frame sum runs in decimal so it is exact under any
    // evaluation order.
    "q_rolling_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type")
        .orderBy(col("t_us"), col("event_id")).rowsBetween(-6, 0)
      eventsTbl(s, dir)
        .select(col("event_type"), expr("ts div 1000").as("t_us"),
          col("event_id"), col("value"))
        .withColumn("roll_sum",
          sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
        .withColumn("roll_n", count(lit(1)).over(w))
        .drop("value")
        .orderBy("event_type", "t_us", "event_id")
    }),

    // RANGE-frame rolling window (§2.6's value-based frame, next to
    // q_rolling_window's ROWS frame): per type, every event sums the
    // trailing HOUR of values — the frame is defined by the timestamp
    // DISTANCE, not a row count, so ties and gaps behave per the SQL
    // standard (all peers included; empty hours shrink the frame).
    "q_range_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy(col("tsn"))
        .rangeBetween(-3600000000000L, 0L) // ns
      eventsTbl(s, dir)
        .select(col("event_type"), col("ts").as("tsn"), col("event_id"),
          col("value"))
        .withColumn("hr_sum",
          sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
        .withColumn("hr_n", count(lit(1)).over(w))
        .select(col("event_type"), expr("tsn div 1000").as("t_us"),
          col("event_id"), col("hr_sum"), col("hr_n"))
        .orderBy("event_type", "t_us", "event_id")
    }),

    // IGNORE NULLS forward fill — the gap-carry step of timeseries
    // regularization (q_events_resample fills the GRID; this carries
    // the last OBSERVATION): per-user running last purchase value over
    // a sparse event column. `last(_, ignoreNulls)` over a running
    // ROWS frame; ordering is (ts div 1000, event_id) — MICROS first,
    // matching the oracle's epoch_us(ts) resolution exactly (raw nanos
    // would let two events equal at micro resolution sort differently
    // across engines), then event_id for a total order.
    "q_forward_fill" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(expr("ts div 1000"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      eventsTbl(s, dir)
        .withColumn("__pv",
          when(col("event_type") === "purchase", col("value")))
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"),
          last(col("__pv"), ignoreNulls = true).over(w).as("last_purchase"))
        .orderBy("event_id")
    }),

    // unionByName with missing columns (schema-evolution append): the
    // two sides list their columns in DIFFERENT orders and each lacks
    // one of the other's — name-based alignment + null fill, the
    // by-position UNION's silent column mixup made impossible.
    // Recursive CTE (new SQL surface in Spark 4): exact-duplicate
    // closure as a parent-CHAIN recursion — each doc points at its
    // greatest smaller same-text peer, so UNION ALL paths are unique
    // (no combinatorial path blowup, no cycles) and depth is bounded
    // by the largest duplicate group. The SQL text runs verbatim in
    // BOTH engines; Spark executes it with its native recursion
    // (spark.sql.cteRecursionLevelLimit), not a driver loop.
    "q_recursive_cte" -> ((s, dir) => {
      tbl(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql(RecursiveClosureSql)
    }),

    "q_union_by_name" -> ((s, dir) => {
      val a = tbl(s, dir, "orders").where(col("o_orderkey") < 1000)
        .select(col("o_orderkey").as("k"), lit("order").as("kind"),
          col("o_totalprice").as("amount"))
      val b = tbl(s, dir, "lineitem").where(col("l_orderkey") < 1000)
        .select(lit("line").as("kind"), col("l_orderkey").as("k"),
          col("l_linenumber").as("ln"), col("l_quantity").as("qty"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("kind"), col("k"), coalesce(col("ln"), lit(-1)))
    }),

    // Window-function variety over one pass: lag/lead navigation,
    // ntile bucketing, percent_rank — per-customer order history.
    "q_window_funcs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_date_e"), col("o_orderkey"))
      tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("o_date_e"),
          col("o_totalprice"))
        .withColumn("prev_price", lag("o_totalprice", 1).over(w))
        .withColumn("next_price", lead("o_totalprice", 1).over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .orderBy("o_custkey", "o_date_e", "o_orderkey")
    }),

    // Grouped top-k via the bounded typed Aggregator (map-side pruning:
    // each partition forwards <= k rows per group into the shuffle),
    // oracle-checked against the window-rank formulation it replaces.
    "q_topk_agg" -> ((s, dir) =>
      graft.operators.TopK.perGroup(
          tbl(s, dir, "lineitem")
            .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey")),
          "l_returnflag", "l_extendedprice", "l_orderkey", k = 3)
        .orderBy("l_returnflag", "rank")),

    // Global sort + limit with a full tie-break.
    "q_sort_limit" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20))
  )

  private val relationalOracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))
        |           * CAST(1.0 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT l_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_e,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    // Correlated-subquery replay: identical SQL over the base table
    // (integer cross-multiplication — no float avg anywhere).
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_nationkey
        |FROM customer c
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
        |      (SELECT count(*) FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey) >
        |      (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT))
        |       FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    // Pivot replay: CASE-spread columns with Spark's pivot naming
    // (value_agg); empty cells are NULL in a Spark pivot even under
    // count, hence the NULLIF.
    "q_pivot_flags" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F'
        |       THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |            * CAST(1.0 - l_discount AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS F_rev,
        |  NULLIF(CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT),
        |    0) AS F_n,
        |  CAST(sum(CASE WHEN l_linestatus = 'O'
        |       THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |            * CAST(1.0 - l_discount AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS O_rev,
        |  NULLIF(CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT),
        |    0) AS O_n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    // Q5 replay: same joins, same exact decimal revenue.
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |             AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_cust
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_anti_join" ->
      """SELECT o_orderstatus, count(*) AS n_orders
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48.0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |       coalesce(l_linestatus, 'ALL') AS lstatus,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin,

    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    // listagg replay: DuckDB's ordered string_agg is the same
    // SQL:2023 semantic.
    "q_listagg" ->
      """SELECT r.r_name,
        |       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
        |       count(*) AS n
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,

    // The SAME lateral SQL text, executed natively by DuckDB.
    "q_lateral_join" ->
      """SELECT n.n_name, t.s_suppkey, t.s_acctbal
        |FROM nation n,
        |LATERAL (SELECT s_suppkey, s_acctbal FROM supplier
        |         WHERE s_nationkey = n.n_nationkey
        |         ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
        |ORDER BY n.n_name, t.s_acctbal DESC, t.s_suppkey""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tse FROM events),
        |l AS (SELECT user_id, event_id, tse,
        |             CASE WHEN lag(tse) OVER w IS NULL
        |                    OR tse - lag(tse) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tse, event_id)),
        |s AS (SELECT user_id, tse,
        |             CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY tse, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |      FROM l)
        |SELECT user_id, sid, count(*) AS n_events,
        |       min(tse) AS s_start, max(tse) AS s_end
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,

    "q_interval_join" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS es, value FROM events),
        |l AS (SELECT user_id, es AS l_es, value AS l_value FROM e WHERE event_type = 'click'),
        |r AS (SELECT user_id AS rk, es AS r_es, value AS r_value FROM e WHERE event_type = 'error')
        |SELECT user_id, l_es, l_value, r_es, r_value
        |FROM l JOIN r ON user_id = rk
        |  AND r_es >= l_es - 7200000000 AND r_es <= l_es + 7200000000
        |ORDER BY user_id, l_es, r_es""".stripMargin,

    "q_interval_join_outer" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS es, value FROM events),
        |l AS (SELECT user_id, es AS l_es, value AS l_value FROM e WHERE event_type = 'click'),
        |r AS (SELECT user_id AS rk, es AS r_es, value AS r_value FROM e WHERE event_type = 'error')
        |SELECT user_id, l_es, l_value, r_es, r_value
        |FROM l LEFT JOIN r ON user_id = rk
        |  AND r_es >= l_es - 7200000000 AND r_es <= l_es + 7200000000
        |ORDER BY user_id, l_es, r_es""".stripMargin,

    "q_interval_join_full" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS es, value FROM events),
        |l AS (SELECT user_id, es AS l_es, value AS l_value FROM e WHERE event_type = 'click'),
        |r AS (SELECT user_id AS rk, es AS r_es, value AS r_value FROM e WHERE event_type = 'error')
        |SELECT coalesce(user_id, rk) AS user_id, l_es, l_value, r_es, r_value
        |FROM l FULL JOIN r ON user_id = rk
        |  AND r_es >= l_es - 7200000000 AND r_es <= l_es + 7200000000
        |ORDER BY user_id, l_es, r_es""".stripMargin,

    "q_events_hourly" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_e, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |       min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Resample replay: same hour floor-div (epoch micros // 3.6e9 ≡
    // epoch nanos div 3.6e12), generate_series grid, left-join
    // zero-fill.
    "q_events_resample" ->
      """WITH e AS (SELECT event_type,
        |             epoch_us(ts) // 3600000000 AS hr FROM events),
        |c AS (SELECT event_type, hr, CAST(count(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2),
        |b AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi
        |      FROM e GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(lo, hi)) AS hr FROM b)
        |SELECT g.event_type, g.hr * 3600000000 AS hour_e,
        |       COALESCE(c.n, CAST(0 AS BIGINT)) AS n
        |FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hr = c.hr
        |ORDER BY g.event_type, hour_e""".stripMargin,

    // Contract replay: the same six invariants as plain aggregates
    // (NULL-tolerant CASE semantics match Spark's when/otherwise).
    "x_schema_check" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_id,
        |  CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS dup_id,
        |  CAST(sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang,
        |  CAST(sum(CASE WHEN n_chars <> len(text) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS bad_n_chars,
        |  CAST(sum(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS neg_chars
        |FROM documents""".stripMargin,

    // Anomaly replay: same grid, same integer cross-multiplied 3σ
    // inequality — no float moments to drift.
    "x_events_anomalies" ->
      """WITH e AS (SELECT event_type,
        |             epoch_us(ts) // 3600000000 AS hr FROM events),
        |c AS (SELECT event_type, hr, CAST(count(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2),
        |b AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi
        |      FROM e GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(lo, hi)) AS hr FROM b),
        |f AS (SELECT g.event_type, g.hr,
        |        COALESCE(c.n, CAST(0 AS BIGINT)) AS n
        |      FROM g LEFT JOIN c ON g.event_type = c.event_type
        |       AND g.hr = c.hr),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nn,
        |        CAST(sum(n) AS BIGINT) AS s,
        |        CAST(sum(n * n) AS BIGINT) AS q
        |      FROM f GROUP BY 1)
        |SELECT f.event_type, f.hr * 3600000000 AS hour_e, f.n
        |FROM f JOIN m ON f.event_type = m.event_type
        |WHERE (f.n * nn - s) * (f.n * nn - s) > 9 * (q * nn - s * s)
        |ORDER BY f.event_type, hour_e""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Variant replay: the values are json-path + cast; a LONG can't
    // cast to TIMESTAMP (n_bad_cast 0), '$.missing' is absent
    // (n_absent 0), and every props row is the same {"k": long} shape
    // (n_schemas 1) — the oracle states those contract constants, so a
    // variant-side behavior change breaks the hash.
    "q_variant_extract" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(0 AS BIGINT) AS n_bad_cast,
        |       CAST(0 AS BIGINT) AS n_absent,
        |       CAST(1 AS BIGINT) AS n_schemas
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_setop" ->
      """SELECT * FROM (
        |  SELECT 'except' AS op, key FROM (
        |    SELECT DISTINCT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
        |    EXCEPT
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  UNION ALL
        |  SELECT 'intersect' AS op, key FROM (
        |    SELECT DISTINCT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
        |    INTERSECT
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |) ORDER BY op, key""".stripMargin,

    // Null-safe-join replay: IS NOT DISTINCT FROM is DuckDB's <=>.
    "q_null_safe_join" ->
      """WITH l AS (SELECT CASE WHEN l_orderkey % 100 = 0 THEN NULL
        |                  ELSE l_orderkey END AS lk FROM lineitem),
        |o AS (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
        |             ELSE o_orderkey END AS ok, o_orderstatus FROM orders)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(sum(CASE WHEN lk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_null_pairs
        |FROM l JOIN o ON lk IS NOT DISTINCT FROM ok
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    // Multiset replay: DuckDB's EXCEPT ALL / INTERSECT ALL have the
    // same per-occurrence semantics as Spark's exceptAll/intersectAll.
    "q_setop_all" ->
      """WITH a AS (SELECT l_suppkey AS k FROM lineitem
        |           WHERE l_returnflag = 'A'),
        |b AS (SELECT l_suppkey AS k FROM lineitem
        |      WHERE l_returnflag = 'R'),
        |ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
        |ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
        |SELECT * FROM (
        |  SELECT 'except_all' AS op, k, CAST(count(*) AS BIGINT) AS n
        |  FROM ea GROUP BY 2
        |  UNION ALL
        |  SELECT 'intersect_all' AS op, k, CAST(count(*) AS BIGINT) AS n
        |  FROM ia GROUP BY 2
        |) ORDER BY op, k""".stripMargin,

    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,

    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_string_date" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_u,
        |  substr(c_mktsegment, 1, 4) AS seg4,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
        |  concat_ws('|', c_mktsegment, c_custkey) AS tag,
        |  CAST(len(c_name) AS BIGINT) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.9) AS p90,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_salted_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_topk_agg" ->
      """SELECT l_returnflag, rank, l_extendedprice, l_orderkey FROM (
        |  SELECT l_returnflag, l_extendedprice, l_orderkey,
        |         CAST(row_number() OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice DESC, l_orderkey) AS INT) AS rank
        |  FROM lineitem)
        |WHERE rank <= 3 ORDER BY l_returnflag, rank""".stripMargin,

    "q_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 450000.0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    "q_rolling_window" ->
      """SELECT event_type, epoch_us(ts) AS t_us, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS roll_sum,
        |  count(*) OVER w AS roll_n
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, t_us, event_id""".stripMargin,

    // RANGE-frame replay: identical value-distance frame in micros
    // (ts nanos are exactly micros×1000, so the hour boundary is the
    // same instant in both engines); peers included per the standard.
    "q_range_window" ->
      """SELECT event_type, epoch_us(ts) AS t_us, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS hr_sum,
        |  count(*) OVER w AS hr_n
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, t_us, event_id""".stripMargin,

    "q_recursive_cte" -> RecursiveClosureSql,

    "q_forward_fill" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |             IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase
        |FROM events ORDER BY event_id""".stripMargin,

    "q_union_by_name" ->
      """SELECT k, kind, amount, ln, qty FROM (
        |  SELECT o_orderkey AS k, 'order' AS kind, o_totalprice AS amount
        |  FROM orders WHERE o_orderkey < 1000
        |  UNION ALL BY NAME
        |  SELECT 'line' AS kind, l_orderkey AS k, l_linenumber AS ln,
        |         l_quantity AS qty
        |  FROM lineitem WHERE l_orderkey < 1000)
        |ORDER BY kind, k, coalesce(ln, -1)""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_date_e,
        |       o_totalprice,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       lead(o_totalprice, 1) OVER w AS next_price,
        |       ntile(4) OVER w AS quartile,
        |       percent_rank() OVER w AS pct_rank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY epoch(o_orderdate), o_orderkey)
        |ORDER BY o_custkey, o_date_e, o_orderkey""".stripMargin,

    "q_asof_join" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS t_click_us,
        |       v.event_id AS view_event_id, v.value AS view_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,

    "q_range_join" ->
      """SELECT band, count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |JOIN (VALUES ('A',0.0,10000.0),('B',10000.0,25000.0),('C',25000.0,50000.0),
        |             ('D',50000.0,100000.0),('E',100000.0,1000000000.0))
        |     AS bands(band, lo, hi)
        |  ON l_extendedprice >= lo AND l_extendedprice < hi
        |GROUP BY band ORDER BY band""".stripMargin
  )

  // === Extension suite: dedup / similarity / text / multimodal ==========

  /** DuckDB fragment: lowercased whitespace tokens of `text`. */
  private val toksSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"""

  /** Verbatim-8-token-window decontamination oracle over the %50
    * benchmark split — shared by x_decontaminate_substr and its
    * Bloom-prefiltered twin x_bloom_decontaminate (exact by
    * construction: the verify join removes Bloom false positives). */
  private lazy val decontWindowSql =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |dw AS (SELECT doc_id, unnest(list_distinct(
       |         [array_to_string(tk[i:i+7], ' ')
       |          for i in generate_series(1, len(tk) - 7)])) AS w
       |       FROM toks WHERE len(tk) >= 8 AND doc_id % 50 <> 0),
       |bw AS (SELECT DISTINCT unnest(list_distinct(
       |         [array_to_string(tk[i:i+7], ' ')
       |          for i in generate_series(1, len(tk) - 7)])) AS w
       |       FROM toks WHERE len(tk) >= 8 AND doc_id % 50 = 0)
       |SELECT doc_id, count(*) AS n_overlap_windows
       |FROM dw JOIN bw USING (w)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** DuckDB fragment: BPE-ish subword token count — mirrors
    * [[TextStats.bpeishTokenCount]] exactly (same ASCII classes in
    * both regex engines; cross-checked by x_text_quality's n_bpeish).
    * The whitespace class is spelled out because Java's `\s` includes
    * `\x0B` while RE2's does not — with a bare `\s` the equivalence
    * was corpus-dependent (TextStats.BpeishPattern is the Spark twin;
    * both regex dialects read these escapes identically). */
  private val bpeishExtractSql =
    """regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\x0B\f\r]')"""
  private val bpeishSql = s"len($bpeishExtractSql)"

  /** DuckDB fragment: occurrences of `word` via the length-difference
    * trick (mirrors TextStats.wordOccurrences exactly). */
  private def occSql(word: String): String = {
    val needle = s" $word "
    s"(len(' ' || lower(text) || ' ') - len(replace(' ' || lower(text) || ' ', '$needle', ' '))) / ${needle.length - 1}"
  }
  private def langScoreSql(lang: String): String =
    TextStats.langMarkers.toMap.apply(lang).map(occSql).mkString("(", " + ", ")")

  /** DuckDB fragment: the TextStats.qualityFacets bucket (shared by
    * x_text_quality and x_weighted_sample so the two can't drift). */
  private val qualityBucketSql: String = {
    val stopSum = Seq("the", "a", "and", "of", "to", "in", "is", "it",
      "that", "for").map(occSql).mkString(" + ")
    s"""CASE WHEN len($toksSql) >= 20
       |      AND len(text) <= len($toksSql) * 12
       |      AND len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]')) * 5 <= len($toksSql)
       |      AND $stopSum > 0
       |     THEN 'good'
       |     WHEN len($toksSql) >= 5 THEN 'fair'
       |     ELSE 'poor' END""".stripMargin
  }

  /** The merges-applied per-document BPE token count, as DuckDB CTEs
    * `m` (the injected Bpe.StandardMerges ladder) through `dc` =
    * (doc_id, n_tokens) — the separator-wrapped recursive replace
    * replay of the native BpeTokenCountExpr. Callers prepend
    * `WITH RECURSIVE`. Shared by x_pack_chunks_bpe and
    * x_bpe_compression so the two count under one merges table. */
  /** The injected Bpe.StandardMerges ladder as VALUES rows, plus the
    * recursive separator-wrapped replace CTEs (`m`, `steps`) over a
    * caller-supplied distinct-words CTE named `words` — the shared
    * replay core of every merges-based oracle. */
  private def bpeStepsCtes: String = {
    val merges = graft.ext.Bpe.StandardMerges
    val mergeVals = merges.zipWithIndex.map { case ((a, b), i) =>
      s"(${i + 1}, chr(1) || '$a' || chr(1) || chr(1) || '$b' || chr(1), " +
        s"chr(1) || '$a$b' || chr(1))"
    }.mkString(",\n        ")
    s"""m(lvl, pat, rep) AS (VALUES
       |        $mergeVals),
       |steps AS (
       |  SELECT w, chr(1) || array_to_string([w[i] for i in generate_series(1, len(w))],
       |                                      chr(1) || chr(1)) || chr(1) AS s,
       |         0 AS lvl
       |  FROM words
       |  UNION ALL
       |  SELECT st.w, replace(st.s, mm.pat, mm.rep), st.lvl + 1
       |  FROM steps st JOIN m mm ON mm.lvl = st.lvl + 1)""".stripMargin
  }

  /** Number of merges in the ladder (the final `steps` level). */
  private def bpeNumMerges: Int = graft.ext.Bpe.StandardMerges.length

  private def bpeDocCountCtes: String =
    s"""pt AS (SELECT doc_id, unnest($bpeishExtractSql) AS w FROM documents),
       |words AS (SELECT DISTINCT w FROM pt),
       |$bpeStepsCtes,
       |wc AS (SELECT w, (len(s) - len(replace(s, chr(1) || chr(1), ''))) // 2 + 1 AS n
       |       FROM steps WHERE lvl = $bpeNumMerges),
       |dc AS (SELECT pt.doc_id, CAST(sum(n) AS BIGINT) AS n_tokens
       |       FROM pt JOIN wc USING (w) GROUP BY 1)""".stripMargin

  /** Pack-slice replay (bpeish counter, capacity 256): same packChunks
    * CTE, then one row per pack in [pack_id, pack_id + pack_span) via
    * unnest(range(...)), ranges rebased to pack-local half-open
    * offsets. Shared by x_pack_slices and the x_pack_stats rollup. */
  private def packSlicesSql: String = {
    val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_order' || " +
      s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
    s"""WITH t AS (SELECT doc_id,
       |                  CAST($bpeishSql AS BIGINT) AS n_tokens,
       |                  $u AS u
       |           FROM documents),
       |o AS (SELECT doc_id, n_tokens,
       |             CAST(coalesce(sum(n_tokens) OVER (ORDER BY u, doc_id
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |                  0) AS BIGINT) AS start_tok
       |      FROM t),
       |c AS (SELECT doc_id, n_tokens, start_tok,
       |             CAST(floor(start_tok / 256.0) AS BIGINT) AS pack0,
       |             CAST(floor((start_tok + greatest(n_tokens, 1) - 1) / 256.0) AS BIGINT)
       |               AS pack1
       |      FROM o),
       |f AS (SELECT doc_id, n_tokens, start_tok, pack0,
       |             unnest(range(pack0, pack1 + 1)) AS pack_id
       |      FROM c)
       |SELECT doc_id, pack_id,
       |       CAST(pack_id - pack0 AS INT) AS slice_idx,
       |       greatest(start_tok, pack_id * 256) - pack_id * 256 AS tok_from,
       |       least(start_tok + n_tokens, (pack_id + 1) * 256) - pack_id * 256 AS tok_to,
       |       least(start_tok + n_tokens, (pack_id + 1) * 256)
       |         - greatest(start_tok, pack_id * 256) AS n_slice_tokens
       |FROM f ORDER BY pack_id, tok_from, doc_id""".stripMargin
  }

  /** Stopword list for x_gopher_rules, shared by query and oracle: the
    * synthetic corpus's entire function-word inventory is {the, a}
    * (measured — no other English stopword occurs), so the published
    * Gopher list would zero out the ">= 2 distinct stopwords" rule. */
  private val GopherQueryStopwords = Seq("the", "a")

  /** Split fractions shared by the x_split_assign query and its oracle
    * (the oracle embeds the exact IEEE cut values via Corpus.splitCuts). */
  private val SplitFractions =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** Per-language sampling quotas shared by x_stratified_sample and its
    * oracle: downsample the majority language, keep the rarest whole. */
  private val SampleRates = Map("en" -> 0.3, "zh" -> 1.0)
  private val SampleDefaultRate = 0.6

  /** Target training mixture for x_mix_to — deliberately UNNORMALIZED
    * ratio weights (sum 10), so the normalization path runs for real
    * in both the engine and the oracle (the normalized values are the
    * exact old mixture: 0.5/0.1/0.1/0.1/0.2). */
  private val MixWeights = Map(
    "en" -> 5.0, "de" -> 1.0, "fr" -> 1.0, "es" -> 1.0, "zh" -> 2.0)

  /** Target mixture for x_mix_to_upsample: two equal strata (ratio
    * form, like MixWeights) — the minority language gets an integer
    * repeat factor > 1 plus a fractional remainder, the majority is
    * thinned, and the other three languages exercise the
    * dropped-stratum path. */
  private val MixUpWeights = Map("en" -> 3.0, "fr" -> 3.0)

  /** Mixture-weight CASE arms for the mix oracles: the NORMALIZED
    * weight (v / total, the exact double Corpus.mixTo computes) is
    * emitted as a round-trip string literal, so the oracle replays the
    * engine's arithmetic bit-for-bit for ANY weight set — not only
    * ones whose raw sum happens to be exactly 1.0 in IEEE (previously
    * the raw literals were embedded, which silently required that). */
  private def mixWhensSql(weights: Map[String, Double]): String = {
    val total = weights.values.sum
    weights.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN CAST('${v / total}' AS DOUBLE)" }
      .mkString(" ")
  }

  /** Constant query for x_bm25_topk — high-df corpus words, so scores
    * exercise the tf/length normalization rather than rare-term idf. */
  private val Bm25Query = Seq("hash", "join", "vector")

  /** Constant query set for x_ndcg — five 3-term queries over corpus
    * vocabulary, shared verbatim with the oracle's VALUES table. */
  private val NdcgQueries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("hash", "join", "vector"),
    2 -> Seq("table", "scan", "fast"),
    3 -> Seq("merge", "sort", "batch"),
    4 -> Seq("stream", "window", "agg"),
    5 -> Seq("customer", "order", "part"))

  /** DuckDB replay of Corpus.splitAssign's label for the `doc_id` in
    * scope — shared by x_split_assign and x_split_leakage (the two
    * oracles cannot drift apart on the cut values). */
  private def splitCaseSql: String = splitCaseSqlOn("doc_id")

  /** The split CASE keyed on an arbitrary id column — `doc_id` for the
    * per-document split, `rep` for the cluster-aware (leakage-free)
    * variant; one definition so the cut literals cannot drift. */
  private def splitCaseSqlOn(idExpr: String): String = {
    val cuts = Corpus.splitCuts(SplitFractions)
    val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_split' || " +
      s"chr(1) || $idExpr::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
    val whens = SplitFractions.init.zip(cuts.init)
      .map { case ((name, _), cut) => s"WHEN $u < $cut THEN '$name'" }
      .mkString(" ")
    s"CASE $whens ELSE '${SplitFractions.last._1}' END"
  }

  /** DuckDB replay of Corpus.mixTo under MixWeights (the x_mix_to
    * oracle, also embedded by the x_mix_report rollup). */
  private def mixToSql: String = {
    val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_mix' || " +
      s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
    val whens = mixWhensSql(MixWeights)
    s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
       |                  CASE lang $whens END AS w
       |           FROM documents GROUP BY lang),
       |cw AS (SELECT * FROM c WHERE w IS NOT NULL),
       |s AS (SELECT min(n / w) AS scale FROM cw),
       |r AS (SELECT lang, least(CAST(1.0 AS DOUBLE), scale * w / n) AS rate
       |      FROM cw CROSS JOIN s)
       |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
       |WHERE $u < r.rate ORDER BY doc_id""".stripMargin
  }

  /** Language label set of the documents table, shared by
    * x_langid_trigram's query and oracle. */
  private val LangIdLangs = Seq("de", "en", "es", "fr", "zh")

  private val extQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic corpus split: label is a pure md5 function of
    // (seed, doc_id) — stable under corpus growth, exactly replayable.
    "x_split_assign" -> ((s, dir) =>
      Corpus.splitAssign(tbl(s, dir, "documents").select("doc_id"),
        SplitFractions, Seed).orderBy("doc_id")),

    // Cluster-aware (leakage-free) split: the split key is the doc's
    // near-dup cluster REPRESENTATIVE (persisted clusters probed, the
    // x_dedup_sizes posture; singletons key on themselves), so a whole
    // near-dup cluster lands in ONE split — the fix for the
    // cross-split leakage x_split_leakage measures.
    "x_split_by_cluster" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").select("doc_id")
      val clusters = Dedup.ensureClusters(s, jaccardClustersTableName(dir)) {
        Dedup.duplicateClusters(
          Dedup.ngramJaccardPairs(tbl(s, dir, "documents"), minJaccard = 0.05))
      }
      val withRep = d
        .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep"))
      Corpus.splitAssign(withRep, SplitFractions, Seed, idCol = "rep")
        .select("doc_id", "rep", "split").orderBy("doc_id")
    }),

    // Deterministic per-language quota sampling (corpus balancing):
    // keep iff the doc's md5 uniform clears its language's rate.
    "x_stratified_sample" -> ((s, dir) =>
      Corpus.stratifiedSample(
        tbl(s, dir, "documents").select("doc_id", "lang"),
        "lang", SampleRates, SampleDefaultRate, Seed).orderBy("doc_id")),

    // Deterministic k-sample per language: the 5 smallest md5 uniforms
    // per stratum via the bounded TopK aggregator (map-side partials,
    // never a full window sort).
    "x_sample_per_group" -> ((s, dir) =>
      Corpus.sampleKPerGroup(tbl(s, dir, "documents"), "lang", k = 5,
        seed = Seed).orderBy("lang", "rank")),

    // Benchmark decontamination: every 50th doc plays the held-out
    // benchmark; corpus docs sharing any word 3-gram with it are
    // flagged with their overlap count.
    "x_decontaminate" -> ((s, dir) => {
      val d = parallel(tbl(s, dir, "documents"))
      Corpus.decontaminate(
        d.where(col("doc_id") % 50 =!= 0),
        d.where(col("doc_id") % 50 === 0))
        .orderBy("doc_id")
    }),

    // Embedding-space decontamination — the semantic gate n-gram
    // screens miss (paraphrased eval leakage): train vectors whose
    // cosine to any held-out benchmark vector (vec_id%50=0 split)
    // reaches 0.35, with the closest benchmark item as evidence.
    // Broadcast benchmark, threshold BEFORE the bounded k=1 argmax.
    "x_decon_semantic" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.semanticDecontaminate(
        e.where(col("vec_id") % 50 =!= 0),
        e.where(col("vec_id") % 50 === 0)
          .withColumnRenamed("vec_id", "bench_id"),
        threshold = 0.35)
        .select(col("vec_id"), col("bench_id"),
          round(col("score"), 6).as("score_r"))
        .orderBy("vec_id")
    }),

    // Verbatim-window decontamination: same benchmark split, but only
    // exact 8-token runs flag — the production-strength leak check
    // (3-grams flag 257 docs here; this flags the 1 true leak).
    "x_decontaminate_substr" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      Corpus.decontaminateSubstring(
        d.where(col("doc_id") % 50 =!= 0),
        d.where(col("doc_id") % 50 === 0))
        .orderBy("doc_id")
    }),

    // Broadcast-Bloom decontamination: the same verbatim-window check
    // with a 2^16-bit Bloom of the benchmark windows folded into the
    // corpus scan as a plan-time literal — candidates (true hits + FP
    // trickle) alone pay the exact verify join, the shape for a
    // benchmark suite too large to ship as a join table. Exact by
    // construction; shares the substr oracle verbatim.
    "x_bloom_decontaminate" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      Corpus.decontaminateBloom(
        d.where(col("doc_id") % 50 =!= 0),
        d.where(col("doc_id") % 50 === 0))
        .orderBy("doc_id")
    }),

    // KMV distinct sketch: per-language distinct-token estimate from
    // bounded mergeable state (k doubles/group), alongside the exact
    // count it approximates.
    "x_kmv_distinct" -> ((s, dir) => {
      val toks = tbl(s, dir, "documents")
        .select(col("lang"), explode(TextStats.tokens(col("text"))).as("term"))
      val est = Sketches.kmvDistinct(toks, "lang", "term", k = 64, seed = Seed)
      val exact = toks.groupBy("lang").agg(countDistinct("term").as("n_distinct"))
      est.join(exact, "lang").orderBy("lang")
    }),

    // Heaps-law vocabulary growth: token mass vs distinct vocabulary at
    // 50-doc checkpoints — first-occurrence-per-TERM aggregation plus a
    // running sum over the bounded checkpoint frame (no corpus window).
    "x_heaps_law" -> ((s, dir) =>
      TextStats.vocabGrowth(tbl(s, dir, "documents"), step = 50L)
        .orderBy("checkpoint")),

    // Per-source KL divergence from the corpus unigram mixture — the
    // drift diagnostic: one token explode, both totals rolled up from
    // the same aggregated (source, term) frame, grid-summed.
    "x_source_kl" -> ((s, dir) =>
      TextStats.sourceKl(tbl(s, dir, "documents"), groupCol = "source")
        .orderBy("source")),

    // Zipf rank-frequency slope per language: OLS on the log-log
    // rank/count curve over the bounded top-500 (TopK aggregator, no
    // vocabulary sort); natural text sits near -1.
    "x_zipf_slope" -> ((s, dir) =>
      TextStats.zipfSlope(tbl(s, dir, "documents"), groupCol = "lang",
        topN = 500).orderBy("lang")),

    // Code-point entropy per document (fused native kernel — one
    // codegen projection, no per-char explode): low entropy flags
    // repeated-character/boilerplate docs, the char-level complement
    // of the Gopher token rules.
    "x_char_entropy" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
          (graft.plans.NativeFunctions.charEntropy9(col("text")) / lit(1e9))
            .as("entropy"))
        .orderBy("doc_id")),

    // Top-50 PMI collocations (min bigram count 5): the multi-word-
    // expression extractor; grid-quantized score, TakeOrdered top-k.
    "x_pmi_bigrams" -> ((s, dir) =>
      TextStats.pmiBigrams(tbl(s, dir, "documents"), minCount = 5L, k = 50)),

    // Split leakage: verified near-dup pairs (word-3-gram Jaccard ≥
    // 0.7) that CROSS the train/val/test boundary — the eval-integrity
    // check a pipeline runs after splitAssign; empty means clean.
    "x_split_leakage" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val splits = Corpus.splitAssign(docs.select("doc_id"),
        SplitFractions, Seed)
      Dedup.ngramJaccardPairs(docs, minJaccard = 0.7)
        .join(splits.select(col("doc_id").as("a"), col("split").as("split_a")), "a")
        .join(splits.select(col("doc_id").as("b"), col("split").as("split_b")), "b")
        .where(col("split_a") =!= col("split_b"))
        .select("a", "b", "split_a", "split_b", "jaccard")
        .orderBy("a", "b")
    }),

    // Per-doc OOV rate against the corpus frequency floor (count < 5):
    // the vocabulary-noise filter; one explode, count join on hashed
    // terms.
    "x_oov_rate" -> ((s, dir) =>
      TextStats.oovRate(tbl(s, dir, "documents"), minCount = 5L)
        .orderBy("doc_id")),

    // Benchmark-side contamination: per benchmark doc (the %50 slice),
    // the fraction of its distinct 3-grams present anywhere in the
    // training corpus — the GPT-3 "dirtiness" report, zero-hit rows
    // included.
    "x_bench_overlap" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      Corpus.benchOverlap(
        d.where(col("doc_id") % 50 === 0),
        d.where(col("doc_id") % 50 =!= 0))
        .orderBy("doc_id")
    }),

    // Corpus-level redundancy map: pairwise source Jaccard over
    // distinct hashed shingle sets — candidate volume bounded by
    // |sources|² per shingle, never corpus².
    "x_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlap(tbl(s, dir, "documents")).orderBy("a", "b")),

    // Bottom-k minwise estimate of the same source-overlap map — the
    // sketch path that replaces the corpus-sized shingle self-join
    // with bounded k-long signatures (one mergeable aggregation, then
    // |groups|² array ops); estimator replayed exactly in DuckDB via
    // the shared md5 hash convention.
    "x_bottomk_overlap" -> ((s, dir) =>
      Dedup.sourceOverlapSketch(parallel(tbl(s, dir, "documents")), k = 256,
        seed = Seed).orderBy("a", "b")),

    // Cluster-balanced diversity sampling: thin each k-means cell to
    // ≈20 vectors with a deterministic md5 keep rule — dense regions
    // downsampled, sparse regions kept whole.
    "x_cell_sample" -> ((s, dir) =>
      Similarity.cellSample(tbl(s, dir, "embeddings"), perCell = 20L)
        .orderBy("vec_id")),

    // Domain cap: flag the top-10 docs per source by (n_chars desc,
    // doc_id) via the bounded TopK aggregator — never a full-domain
    // window sort; rank NULL marks dropped rows.
    "x_source_cap" -> ((s, dir) =>
      Corpus.capPerGroup(
        tbl(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            col("n_chars").cast("double").as("score")),
        "source", "score", "doc_id", k = 10)
        .select(col("doc_id"), col("source"), col("rank"), col("kept"))
        .orderBy("doc_id")),

    // Temperature rebalancing: p_i^(1/T) renormalized on the 1e-9 grid
    // — the multilingual sampling-weight rule, T = 0.7 sharpens toward
    // the head; feed p_temp to mixTo for the actual selection.
    "x_mix_temperature" -> ((s, dir) =>
      Corpus.temperatureWeights(tbl(s, dir, "documents"), "lang",
        temperature = 0.7)
        .orderBy("lang")),

    // Token-budget mixture solver: per-language desired vs available
    // tokens under a 30k-token budget at the MixWeights mixture —
    // exact BigInt desired shares, single groupBy over token counts;
    // shortfall > 0 flags strata that cannot fill their share (en/zh
    // here), the upsample-or-renormalize decision input.
    "x_mix_budget" -> ((s, dir) =>
      Corpus.budgetMix(tbl(s, dir, "documents"), "lang", MixWeights,
        budgetTokens = 30000L,
        tokenCount = TextStats.tokenCount(col("text")).cast("long"))
        .orderBy("lang")),

    // HyperLogLog distinct: the register-bounded estimate next to the
    // exact count — the fourth sketch family (KMV=distinct-values,
    // histogram=quantiles, CMS=frequency, HLL=distinct-registers); see
    // Sketches.hllDistinct for the state-bound comparison vs KMV.
    "x_hll_distinct" -> ((s, dir) => {
      val toks = tbl(s, dir, "documents")
        .select(col("lang"), explode(TextStats.tokens(col("text"))).as("term"))
      val est = Sketches.hllDistinct(toks, "lang", "term", p = 8, seed = Seed)
      val exact = toks.groupBy("lang").agg(countDistinct("term").as("n_distinct"))
      est.join(exact, "lang").orderBy("lang")
    }),

    // Fixed-grid histogram sketch: per-language token-count quantiles
    // from bounded mergeable bin counts (≤64 bins/group map-side) —
    // quartiles + p90 read off as bin lower edges.
    "x_hist_quantiles" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
        .select(col("lang"), TextStats.tokenCount(col("text")).as("n_tokens"))
      Sketches.histQuantiles(docs, "lang", "n_tokens",
        width = 8.0, maxBins = 64, probs = Seq(0.25, 0.5, 0.75, 0.9))
        .orderBy("lang")
    }),

    // Domain-mixture rebalancing: thin each language to the target
    // mixture, binding stratum kept whole, md5 keep-decision.
    "x_mix_to" -> ((s, dir) =>
      Corpus.mixTo(tbl(s, dir, "documents").select("doc_id", "lang"),
        "lang", MixWeights, Seed)
        .select("doc_id", "lang").orderBy("doc_id")),

    // Mixture-achievement report: kept rows per stratum vs the
    // normalized target — achieved fraction, target, deviation (the
    // sampling noise a production mix job alerts on).
    "x_mix_report" -> ((s, dir) => {
      val total = MixWeights.values.sum
      val target = coalesce(MixWeights.toSeq.sortBy(_._1)
        .map { case (k, v) => when(col("lang") === k, lit(v / total)) }: _*)
      val mixed = Corpus.mixTo(
        tbl(s, dir, "documents").select("doc_id", "lang"),
        "lang", MixWeights, Seed)
      val kept = mixed.groupBy("lang").agg(count(lit(1)).as("n_kept"))
      kept.crossJoin(broadcast(mixed.agg(count(lit(1)).as("__n_total"))))
        .select(col("lang"), col("n_kept"),
          (col("n_kept").cast("double") / col("__n_total")).as("achieved"),
          target.as("target"),
          (col("n_kept").cast("double") / col("__n_total") - target)
            .as("deviation"))
        .orderBy("lang")
    }),

    // Mixture rebalance with upsampling: input-sized output ON the
    // requested mix — underweight strata get epoch repeats
    // (floor(rate) copies + md5 keep-decision on the remainder),
    // overweight strata are thinned by the same formula.
    "x_mix_to_upsample" -> ((s, dir) =>
      Corpus.mixTo(tbl(s, dir, "documents").select("doc_id", "lang"),
        "lang", MixUpWeights, Seed, upsample = true)
        .select("doc_id", "lang", "copy_idx")
        .orderBy("doc_id", "copy_idx")),

    // Sequence packing: deterministic shuffle order, then assign each
    // doc its offset + pack in the concatenated token stream — a
    // two-phase bucketed prefix sum (no single-partition global sort).
    // Counted in BPE-ish subword tokens (round 9): capacity means what
    // a trainer's tokenizer would see, not whitespace words.
    "x_pack_chunks" -> ((s, dir) =>
      Corpus.packChunks(tbl(s, dir, "documents"), capacity = 256L,
        seed = Seed, tokenCount = TextStats.bpeishTokenCount(col("text")),
        buckets = 64)
        .orderBy("ord")),

    // Sequence packing under REAL merges-based subword counts: the
    // same two-phase prefix sum, but capacity now means actual BPE
    // tokens (200 merges trained on the embedded standard text, a
    // plan-time constant like the LSH hyperplanes — see ext/Bpe.scala;
    // the oracle replays the merges via a recursive replace chain).
    "x_pack_chunks_bpe" -> ((s, dir) =>
      Corpus.packChunks(tbl(s, dir, "documents"), capacity = 256L,
        seed = Seed, tokenCount = graft.ext.Bpe.tokenCount(col("text")),
        buckets = 64)
        .orderBy("ord")),

    // Tokenizer ENCODE: the actual subword pieces per document, in
    // order — (doc, pre-token index, piece index, piece); ids are a
    // vocab-dictionary lookup away. Two narrow posexplodes over the
    // native pieces kernel (same merge application as the count
    // kernel by construction).
    "x_bpe_encode" -> ((s, dir) =>
      parallel(tbl(s, dir, "documents"))
        .select(col("doc_id"), posexplode(regexp_extract_all(col("text"),
          lit(TextStats.BpeishPattern), lit(0))).as(Seq("w_idx", "w")))
        .select(col("doc_id"), col("w_idx"),
          posexplode(graft.plans.NativeFunctions.bpePieces(col("w"),
            graft.ext.Bpe.StandardMerges)).as(Seq("p_idx", "piece")))
        .orderBy("doc_id", "w_idx", "p_idx")),

    // Tokenizer-efficiency report: every counter tier side by side
    // (bytes, whitespace, pre-tokenizer pieces, character symbols,
    // merges-applied BPE) plus the two planning ratios — all in one
    // shuffle-free projection over the native BPE kernel. BPE starts
    // from CHARACTER symbols, so merge_savings is measured against
    // n_symbols (n_bpe is always within [n_bpeish, n_symbols]).
    "x_bpe_compression" -> ((s, dir) =>
      tbl(s, dir, "documents").select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        TextStats.tokenCount(col("text")).cast("long").as("n_ws"),
        TextStats.bpeishTokenCount(col("text")).cast("long").as("n_bpeish"),
        length(regexp_replace(col("text"), "[ \\t\\n\\x0B\\f\\r]", ""))
          .cast("long").as("n_symbols"),
        graft.ext.Bpe.tokenCount(col("text")).cast("long").as("n_bpe"))
        .withColumn("bytes_per_token",
          when(col("n_bpe") > 0,
            col("n_bytes").cast("double") / col("n_bpe").cast("double"))
            .otherwise(lit(0.0)))
        .withColumn("merge_savings",
          when(col("n_symbols") > 0,
            lit(1.0) - col("n_bpe").cast("double") / col("n_symbols").cast("double"))
            .otherwise(lit(0.0)))
        .orderBy("doc_id")),

    // Pack-slice fan-out: one row per (document, pack) with half-open
    // in-pack token ranges — the frame a packing job feeds the
    // tokenizer writer; straddling docs contribute one slice per pack.
    // Same BPE-ish counter as x_pack_chunks.
    "x_pack_slices" -> ((s, dir) =>
      Corpus.packSlices(tbl(s, dir, "documents"), capacity = 256L,
        seed = Seed, tokenCount = TextStats.bpeishTokenCount(col("text")),
        buckets = 64)
        .orderBy("pack_id", "tok_from", "doc_id")),

    // Pack utilization report: slices rolled up per pack — how full
    // every training sequence is (the tail pack trails off, all
    // interior packs sit at exactly capacity by construction).
    "x_pack_stats" -> ((s, dir) =>
      Corpus.packSlices(tbl(s, dir, "documents"), capacity = 256L,
        seed = Seed, tokenCount = TextStats.bpeishTokenCount(col("text")),
        buckets = 64)
        .groupBy("pack_id")
        .agg(count(lit(1)).as("n_slices"),
          sum("n_slice_tokens").as("pack_tokens"))
        .select(col("pack_id"), col("n_slices"), col("pack_tokens"),
          (col("pack_tokens").cast("double") / lit(256.0)).as("utilization"))
        .orderBy("pack_id")),

    // TF-IDF top-3 terms per doc (quantized ln per the Rng.gaussian
    // trick; ties broken by term).
    "x_tfidf_topk" -> ((s, dir) =>
      TextStats.tfidfTopK(tbl(s, dir, "documents"), k = 3)
        .orderBy(col("doc_id"), col("score").desc, col("term"))),

    // Okapi BM25 top-15 for a constant query (retrieval-based
    // curation): contributions snapped to the 1e-9 grid before the
    // order-independent long sum, ties by id.
    "x_bm25_topk" -> ((s, dir) =>
      TextStats.bm25TopK(tbl(s, dir, "documents"), Bm25Query, k = 15)),

    // Overlapping token-window chunking (RAG/embedding prep): 32-token
    // chunks every 16 tokens, half-open offsets + rebuilt chunk text,
    // one narrow Generate per doc.
    "x_chunk_docs" -> ((s, dir) =>
      Corpus.chunkDocs(tbl(s, dir, "documents"), chunkTokens = 32,
        strideTokens = 16)
        .orderBy("doc_id", "chunk_idx")),

    // Quality-weighted sampling: per-row acceptance probability from
    // the quality bucket (good kept whole, fair halved, poor decimated)
    // — rejection sampling with the growth-stable md5 keep-decision.
    "x_weighted_sample" -> ((s, dir) => {
      val q = TextStats.qualityFacets(parallel(tbl(s, dir, "documents")))
      val w = when(col("quality_bucket") === "good", lit(1.0))
        .when(col("quality_bucket") === "fair", lit(0.5))
        .otherwise(lit(0.1))
      Corpus.weightedSample(q, w, Seed)
        .select("doc_id", "quality_bucket").orderBy("doc_id")
    }),

    // Unigram LM quality proxy: per-doc mean ln p(token) under the
    // corpus unigram distribution, summed on the 1e-9 integer grid.
    "x_unigram_logprob" -> ((s, dir) =>
      TextStats.unigramLogProb(tbl(s, dir, "documents"))
        .orderBy("doc_id")),

    // Bigram stupid-backoff LM (perplexity-style quality filter):
    // counts trained on the even-id half, every doc scored — odd docs
    // exercise the Laplace-smoothed backoff on unseen grams/words.
    "x_bigram_logprob" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      TextStats.bigramLogProb(d, d.where(col("doc_id") % 2 === 0))
        .orderBy("doc_id")
    }),

    // Interpolated trigram LM — the n-gram ladder's top rung: λ-mixed
    // trigram/bigram/add-one-unigram per position, five hashed-key left
    // joins, per-doc sums on the 1e-9 grid.
    "x_trigram_logprob" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      TextStats.trigramLogProb(d, d.where(col("doc_id") % 2 === 0))
        .orderBy("doc_id")
    }),

    // Span-level quality: each document's WORST 10-token window by
    // self-corpus unigram log-prob — the garbage-span detector a
    // doc-level average hides; NULLs for docs shorter than the window.
    "x_worst_window" -> ((s, dir) =>
      TextStats.worstWindow(tbl(s, dir, "documents"), window = 10)
        .orderBy("doc_id")),

    // Count-min sketch validation: exact top-20 token frequencies next
    // to their CM estimates from a 4×256 grid — one-sided error, the
    // grid being the only aggregate a production caller would run.
    "x_cms_heavy" -> ((s, dir) => {
      val toks = tbl(s, dir, "documents")
        .select(explode(TextStats.tokens(col("text"))).as("token"))
      Sketches.cmsHeavyHitters(toks, "token", k = 20, seed = Seed)
        .orderBy(col("n_exact").desc, col("token"))
    }),

    // Deterministic sharded training-order shuffle: the dataloader
    // manifest — (shard, pos) per document, md5-keyed permutation.
    "x_shuffle_shards" -> ((s, dir) =>
      Corpus.shuffleShards(tbl(s, dir, "documents"), nShards = 16, seed = Seed)
        .orderBy("doc_id")),

    // Curriculum training order: quality buckets (good→0 … poor→2)
    // laid out easy-to-hard, md5-shuffled within bucket, densified to
    // a global 0..N-1 position — every window (bucket, shard)-
    // partitioned, cross-bucket offsets from a bounded frame.
    "x_curriculum_order" -> ((s, dir) => {
      val f = TextStats.qualityFacets(tbl(s, dir, "documents"))
      Corpus.curriculumOrder(f,
        when(col("quality_bucket") === "good", 0)
          .when(col("quality_bucket") === "fair", 1).otherwise(2),
        nShards = 8, seed = Seed)
        .orderBy("doc_id")
    }),

    // Snapshot diff: the corpus-versioning audit — old (id%3≠0,
    // original text) vs new (id%4≠0, every 10th doc edited) classified
    // added/removed/changed/unchanged via one digest-projected
    // full-outer id join.
    "x_snapshot_diff" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val old = d.where(col("doc_id") % 3 =!= 0)
      val nw = d.where(col("doc_id") % 4 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      Corpus.snapshotDiff(old, nw)
        .select("doc_id", "status").orderBy("doc_id")
    }),

    // Output-layout planner: per-source file counts targeting ~4 KB
    // per file (bench scale) — the small-files guard every corpus
    // writer runs before `repartition(n_files)`; exact ceil-division.
    "x_file_plan" -> ((s, dir) =>
      Corpus.filePlan(tbl(s, dir, "documents"), "source",
        col("n_chars"), targetBytes = 4096L)
        .orderBy("source")),

    // Shard-balance rollup over the SAME assignment (shared code path
    // and shared oracle CTE, so report and manifest can't drift):
    // docs, BPE-ish token mass, and the max position per shard.
    "x_shard_balance" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .withColumn("n_tok", TextStats.bpeishTokenCount(col("text")))
      Corpus.shuffleShards(d, nShards = 16, seed = Seed, payload = Seq("n_tok"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          max("pos").as("max_pos"))
        .orderBy("shard")
    }),

    // DSIR importance weights: non-English pool scored against the
    // English target domain under the hashed bag-of-n-grams model.
    "x_dsir_weights" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      Corpus.dsirWeights(d.where(col("lang") =!= "en"),
          d.where(col("lang") === "en"))
        .orderBy("doc_id")
    }),

    // DSIR Gumbel-top-k resample: 50 of the pool docs drawn
    // proportionally to their importance weights, deterministically.
    "x_dsir_select" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      Corpus.dsirResample(d.where(col("lang") =!= "en"),
        d.where(col("lang") === "en"), k = 50, seed = Seed)
    }),

    // Budget-constrained greedy selection: the best 5000 BPE-ish
    // tokens from the non-English pool, prioritized by the fused DSIR
    // kernel score — the terminal "build me an N-token dataset" step.
    "x_budget_select" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val raw = d.where(col("lang") =!= "en")
      val lr9 = Corpus.dsirRatioTable(raw, d.where(col("lang") === "en")).toSeq
      val base = raw.select(col("doc_id"),
          graft.plans.NativeFunctions.dsirScore(col("text"), lr9).as("__sc"),
          TextStats.bpeishTokenCount(col("text")).as("__n"))
        .select(col("doc_id"), col("__sc.n_feats").as("__nf"),
          col("__sc.s9").as("__p9"), col("__n"))
        .where(col("__nf") > 0)
      Corpus.selectToBudget(base, col("__p9"), col("__n"),
          budget = 5000L, bandWidth = 1000000000L)
        .orderBy("doc_id")
    }),

    // Rollup over the SAME selection (shared code path and oracle
    // CTE): how full the budget ran and which priority bands made the
    // cut — the report a curation job prints.
    "x_budget_stats" -> ((s, dir) => {
      val sel = queries("x_budget_select")(s, dir)
      sel.agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens_total"),
        max("band").as("top_band"), min("band").as("cut_band"))
    }),

    // CCNet head/middle/tail perplexity buckets per source stratum,
    // scored under the same even-id-trained bigram LM as
    // x_bigram_logprob (shared oracle CTEs).
    "x_ppl_buckets" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      TextStats.pplBuckets(d, d.where(col("doc_id") % 2 === 0))
        .orderBy("doc_id")
    }),

    "x_dedup_exact" -> ((s, dir) =>
      Dedup.exactByDigest(tbl(s, dir, "documents")).orderBy("digest")),

    // URL-normalized dedup: the CCNet/RefinedWeb re-crawl pre-filter —
    // canonicalize the URL (lowercase; strip query/fragment, scheme,
    // www., default port, trailing slash), then the narrow exactByDigest
    // aggregate on the canonical key. The documents table carries no
    // URL column, so crawl-style URL dressing is synthesized
    // deterministically from (doc_id, source) — scheme/www/port/slash/
    // tracking-param/fragment variants that all collapse onto
    // source.example.com/articles/{doc_id % 40}.
    "x_url_dedup" -> ((s, dir) => {
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("https://"))
          .otherwise(lit("HTTP://")),
        when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
        col("source"), lit(".example.com"),
        when(col("doc_id") % 4 === 0, lit(":443")).otherwise(lit("")),
        lit("/Articles/"), (col("doc_id") % 40).cast("string"),
        when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit("?utm_source=feed&ref=abc"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("#section-2")).otherwise(lit("")))
      Dedup.urlDedup(tbl(s, dir, "documents").withColumn("url", url))
        .orderBy("url_norm")
    }),

    // Distributed global rank under an arbitrary total order — the
    // operator that removed the catalog's one corpus-sized
    // unpartitioned window (x_logreg_calibration's global ntile): a
    // range partition + parallel per-partition row_number + bounded
    // broadcast offsets. Oracle states the plain single-window
    // row_number; the hash match pins the decomposition to it.
    "x_global_rank" -> ((s, dir) =>
      Corpus.globalRank(
        tbl(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars")),
        Seq(col("n_chars").desc, col("doc_id")), "rank")
        .orderBy("doc_id")),

    // Per-domain crawl report off the same canonicalization: distinct
    // canonical pages vs raw docs per registered-domain heuristic —
    // the frame for domain blocklists / per-domain caps. Mobile hosts
    // (m.) are genuinely distinct pages; www. and the query dressing
    // are not. Two narrow aggregates; URL text leaves the plan at the
    // first (counts ride xxhash64(url_norm)).
    "x_domain_stats" -> ((s, dir) => {
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("https://"))
          .otherwise(lit("http://")),
        when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("m.")),
        col("source"),
        when(col("doc_id") % 4 === 0, lit(".com")).otherwise(lit(".org")),
        lit("/p/"), (col("doc_id") % 15).cast("string"),
        when(col("doc_id") % 6 === 0, lit("?ref=rss")).otherwise(lit("")))
      Dedup.domainStats(tbl(s, dir, "documents").withColumn("url", url))
        .orderBy("domain")
    }),

    // WET-style web-archive round-trip: render the documents table into
    // Common Crawl-shaped files (sharded, multi-record, CRLF headers +
    // Content-Length payload framing), then parse them back with the
    // pure-Column record codec. The oracle states the identity the
    // codec must preserve — doc_id, URI, declared length, exact
    // payload — so the hash match pins BOTH directions of the format.
    "x_wet_roundtrip" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/doc/"), col("doc_id").cast("string"))
      val files = Warc.renderFiles(d
        .withColumn("url", url)
        .withColumn("shard", pmod(col("doc_id"), lit(8))))
      Warc.parseRecords(files)
        .select(col("rec_id").as("doc_id"), col("uri"),
          col("content_length"), col("payload"))
        .orderBy("doc_id")
    }),

    // Byte-oriented WET roundtrip: the same archive codec with
    // Content-Length declared in UTF-8 OCTETS, over the corpus
    // suffixed with 2-/3-/4-byte characters so the orientation
    // genuinely diverges from character mode on every row — the
    // contract real WET files keep. The oracle states byte lengths
    // via strlen (DuckDB's byte counter) plus the payload identity.
    "x_wet_bytes" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .withColumn("text", concat(col("text"), lit(" café—😀")))
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/doc/"), col("doc_id").cast("string"))
      val files = Warc.renderFiles(d
        .withColumn("url", url)
        .withColumn("shard", pmod(col("doc_id"), lit(8))),
        byteOriented = true)
      Warc.parseRecords(files, byteOriented = true)
        .select(col("rec_id").as("doc_id"), col("uri"),
          col("content_length"), col("payload"), col("intact"))
        .orderBy("doc_id")
    }),

    // Per-record gzip WARC (the real .warc.gz disk contract: one gzip
    // MEMBER per record, concatenated): render member-wise compressed
    // files, inflate them in the typed kernel, and run the UNCHANGED
    // byte-oriented Column parse downstream — the same multi-byte
    // dressing as x_wet_bytes, so the roundtrip pins that compression
    // is transparent to the record layer (construct-the-output
    // oracle; a lost or mis-framed member loses rows and breaks the
    // hash).
    "x_warc_gzip" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .withColumn("text", concat(col("text"), lit(" café—😀")))
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/doc/"), col("doc_id").cast("string"))
      val gz = Warc.renderGzipFiles(d
        .withColumn("url", url)
        .withColumn("shard", pmod(col("doc_id"), lit(8))),
        byteOriented = true)
      Warc.parseRecords(Warc.inflateGzipFiles(gz), byteOriented = true)
        .select(col("rec_id").as("doc_id"), col("uri"),
          col("content_length"), col("payload"), col("intact"))
        .orderBy("doc_id")
    }),

    // WARC revisit records — how real archives dedup refetches
    // (Common Crawl stores a `revisit` record with WARC-Refers-To
    // instead of a payload its digest set already holds): the first
    // capture in file order is the original, later captures of the
    // same payload flag is_revisit + refers_to. The %100 body
    // dressing makes every payload recur across shards, so the
    // min-struct choice (shard, then in-file position) is genuinely
    // load-bearing.
    "x_warc_revisit" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/doc/"), id.cast("string"))
      val files = Warc.renderFiles(d
        .withColumn("url", url)
        .withColumn("shard", pmod(id, lit(8)))
        .withColumn("body", concat(lit("body "), (id % 100).cast("string"))),
        textCol = "body")
      Warc.markRevisits(Warc.parseRecords(files))
        .select(col("rec_id").as("doc_id"), col("shard"), col("rec_pos"),
          col("is_revisit"), col("refers_to"))
        .orderBy("doc_id")
    }),

    // Crawl-file ingest report off the same parse: per-file record
    // count, payload volume, length spread, intact count — the monitor
    // frame a WET ingest job alerts on. Exercises the multi-record
    // file path (8 files × many records) where the roundtrip pins
    // per-record fields.
    "x_wet_stats" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/doc/"), col("doc_id").cast("string"))
      val files = Warc.renderFiles(d
        .withColumn("url", url)
        .withColumn("shard", pmod(col("doc_id"), lit(8))))
      Warc.fileStats(Warc.parseRecords(files)).orderBy("shard")
    }),

    // Crawl-frontier expansion: the discovery half of the crawl loop —
    // extract hrefs from fetched pages, RESOLVE each against the
    // page's own base URL (real pages are overwhelmingly relative
    // links: the dressing plants all four RFC 3986 reference forms —
    // absolute, protocol-relative, rooted, relative-with-dot-segments
    // — plus a mailto decoy the http filter drops), canonicalize,
    // drop pages already crawled (left_anti on the canonical key),
    // gate the rest through robots. Compliance is honored at BOTH
    // layers: a page whose <meta name="robots"> says nofollow
    // contributes no links, and a rel="nofollow" link never enters
    // the frontier. The /articles/4 Disallow makes PREFIX matching
    // load-bearing: it blocks /articles/40..49 too, which only exist
    // via discovery. The relative link's dot-segment resolution
    // DEPENDS on the base's trailing slash (%5 rows: the /Articles/N/
    // directory form keeps the articles segment; others pop it) — the
    // merge rule is genuinely load-bearing, not decorative.
    "x_frontier" -> ((s, dir) => {
      import s.implicits._
      val d = tbl(s, dir, "documents")
      val crawledUrl = concat(
        when(col("doc_id") % 2 === 0, lit("https://"))
          .otherwise(lit("HTTP://")),
        when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
        col("source"), lit(".example.com"),
        when(col("doc_id") % 4 === 0, lit(":443")).otherwise(lit("")),
        lit("/Articles/"), (col("doc_id") % 40).cast("string"),
        when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit("?utm_source=feed&ref=abc"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("#section-2")).otherwise(lit("")))
      // the crawled set is the corpus-sized side: it distincts and
      // joins as 8-byte xxhash64 keys (the hash-identity convention),
      // never as URL text
      val crawled = d.withColumn("url", crawledUrl)
        .select(xxhash64(Dedup.normalizeUrl(col("url"))).as("__ch")).distinct()
      val metaContent = when(col("doc_id") % 19 === 0,
          lit("noindex, nofollow"))
        .when(col("doc_id") % 23 === 0, lit("noindex"))
        .otherwise(lit("index, follow"))
      val pageHtml = concat(
        lit("<meta name=\"robots\" content=\""), metaContent, lit("\">"),
        lit("<a href=\"HTTPS://"), col("source"), lit(".example.com/Articles/"),
        ((col("doc_id") * 3) % 53).cast("string"), lit("?utm=x\">a</a>"),
        lit("<a href=\"//hub.example.org/t/"),
        (col("doc_id") % 7).cast("string"), lit("\">h</a>"),
        lit("<a href=\"/Tag/"), (col("doc_id") % 11).cast("string"),
        when(col("doc_id") % 13 === 0, lit("\" rel=\"nofollow\">t</a>"))
          .otherwise(lit("\">t</a>")),
        lit("<a href=\"../Archive/"), ((col("doc_id") * 5) % 23).cast("string"),
        lit("/./item\">r</a><a href=\"mailto:ed@example.com\">m</a>"))
      // robots.txt is fetched per HOST (not per registered domain):
      // the gate keys on urlHost, one robots body per discovered host.
      val discovered = d
        .where(!Html.metaRobots(pageHtml)("nofollow"))
        .select(crawledUrl.as("base"),
          explode(Html.extractLinksDetailed(pageHtml)).as("l"))
        .where(!col("l")("nofollow"))
        .select(Html.resolveHref(col("base"), col("l")("href")).as("resolved"))
        .where(col("resolved").rlike("(?i)^https?://"))
        .select(Dedup.normalizeUrl(col("resolved")).as("url_norm")).distinct()
        .join(crawled, xxhash64(col("url_norm")) === col("__ch"), "left_anti")
        .withColumn("domain", Dedup.urlHost(col("url_norm")))
        .withColumn("path", regexp_extract(col("url_norm"), "(/.*)$", 1))
      val robots = discovered.select("domain").distinct()
        .withColumn("content",
          when(col("domain") === "hub.example.org",
            lit("User-agent: *\nDisallow: /t/2\n"))
            .otherwise(lit("User-agent: *\nDisallow: /articles/4\n")))
      graft.ext.Robots.applyRules(discovered,
          graft.ext.Robots.parseRules(robots))
        .select("url_norm", "domain", "blocked", "rule")
        .orderBy("url_norm")
    }),

    // Politeness scheduler over the discovered frontier: the robots
    // fold also yields per-host Crawl-delay; each allowed URL gets a
    // fetch slot on its host's timeline (host-PARTITIONED window —
    // never a global sort — times the bounded delay table, broadcast).
    // Hosts with no declared delay run at the 1 s default.
    "x_crawl_schedule" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val crawledUrl = concat(
        when(col("doc_id") % 2 === 0, lit("https://"))
          .otherwise(lit("HTTP://")),
        when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
        col("source"), lit(".example.com"),
        when(col("doc_id") % 4 === 0, lit(":443")).otherwise(lit("")),
        lit("/Articles/"), (col("doc_id") % 40).cast("string"),
        when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit("?utm_source=feed&ref=abc"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("#section-2")).otherwise(lit("")))
      // the crawled set is the corpus-sized side: it distincts and
      // joins as 8-byte xxhash64 keys (the hash-identity convention),
      // never as URL text
      val crawled = d.withColumn("url", crawledUrl)
        .select(xxhash64(Dedup.normalizeUrl(col("url"))).as("__ch")).distinct()
      val pageHtml = concat(
        lit("<a href=\"HTTPS://"), col("source"), lit(".example.com/Articles/"),
        ((col("doc_id") * 3) % 53).cast("string"),
        lit("?utm=x\">n</a><a href=\"http://hub.example.org/t/"),
        (col("doc_id") % 7).cast("string"), lit("\">h</a>"))
      val discovered = d
        .select(explode(Html.extractLinks(pageHtml)).as("link"))
        .select(Dedup.normalizeUrl(col("link")).as("url_norm")).distinct()
        .join(crawled, xxhash64(col("url_norm")) === col("__ch"), "left_anti")
        .withColumn("domain", Dedup.urlHost(col("url_norm")))
        .withColumn("path", regexp_extract(col("url_norm"), "(/.*)$", 1))
      val robots = discovered.select("domain").distinct()
        .withColumn("content",
          when(col("domain") === "hub.example.org",
            lit("User-agent: *\nCrawl-delay: 5\nDisallow: /t/2\n"))
            .otherwise(lit("User-agent: *\nDisallow: /articles/4\n")))
      val allowed = graft.ext.Robots
        .applyRules(discovered, graft.ext.Robots.parseRules(robots))
        .where(!col("blocked"))
        .select("url_norm", "domain")
      graft.ext.Robots.schedule(allowed,
          graft.ext.Robots.parseCrawlDelay(robots))
        .orderBy("url_norm")
    }),

    // Sitemap-driven recrawl planning (the discovery channel beside
    // link extraction): render per-site sitemap XML, publish the site
    // files through <sitemapindex> documents (the protocol's 50k-cap
    // nesting — resolved first: index parse → child-loc join → entry
    // parse, so a lost child loses rows and breaks the hash), parse
    // the entries into typed rows (lastmod DATE, priority DOUBLE;
    // malformed decoy values try_cast to null), canonicalize the
    // announced locs, collapse to the freshest announcement per
    // canonical page, and mark which pages the crawl already has —
    // the frame a recrawl scheduler prioritizes by (known, lastmod,
    // priority).
    "x_sitemap_recrawl" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val crawledUrl = concat(
        when(col("doc_id") % 2 === 0, lit("https://"))
          .otherwise(lit("HTTP://")),
        when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
        col("source"), lit(".example.com"),
        when(col("doc_id") % 4 === 0, lit(":443")).otherwise(lit("")),
        lit("/Articles/"), (col("doc_id") % 40).cast("string"),
        when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit("?utm_source=feed&ref=abc"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("#section-2")).otherwise(lit("")))
      // the crawled set is the corpus-sized side: it distincts and
      // joins as 8-byte xxhash64 keys (the hash-identity convention),
      // never as URL text
      val crawled = d.withColumn("url", crawledUrl)
        .select(xxhash64(Dedup.normalizeUrl(col("url"))).as("__ch")).distinct()
      val loc = concat(lit("https://"), col("source"),
        lit(".example.com/Articles/"),
        ((col("doc_id") * 7) % 43).cast("string"),
        when(col("doc_id") % 5 === 0, lit("?v=2")).otherwise(lit("")))
      val lmStr = when(col("doc_id") % 97 === 13, lit("soon"))
        .otherwise(concat(lit("2026-01-"),
          lpad(((col("doc_id") % 28) + 1).cast("string"), 2, "0")))
      val prio = when(col("doc_id") % 89 === 7, lit("high"))
        .when(col("doc_id") % 3 === 0, lit("0.8")).otherwise(lit("0.5"))
      val sitemaps = Sitemap.renderSitemaps(
        d.select(col("doc_id"), col("source").as("site"), loc.as("loc"),
          lmStr.as("lastmod"), prio.as("priority")))
      // publish the site files behind <sitemapindex> docs (one index
      // per leading site letter) and resolve the nesting before the
      // entry parse — index parse → child join on the bounded loc list
      val childFiles = sitemaps.withColumn("loc",
        concat(lit("https://"), col("site"), lit(".example.com/sitemap.xml")))
      val indexes = Sitemap.renderSitemapIndex(
        childFiles.withColumn("index_key", substring(col("site"), 1, 1)))
      val resolved = Sitemap.parseSitemapIndex(indexes)
        .join(childFiles.select("loc", "site", "content"), "loc")
      Sitemap.parseSitemaps(resolved)
        .select(Dedup.normalizeUrl(col("loc")).as("url_norm"),
          col("lastmod"), col("priority"))
        .groupBy("url_norm")
        .agg(max("lastmod").as("lastmod"), max("priority").as("priority"))
        .join(crawled, xxhash64(col("url_norm")) === col("__ch"), "left")
        .withColumn("known", col("__ch").isNotNull)
        .drop("__ch")
        .orderBy("url_norm")
    }),

    // Conditional-recrawl policy — the If-Modified-Since ECONOMICS a
    // recrawl scheduler runs over the sitemap channel: join the
    // freshest announcement per canonical page against the crawl
    // HISTORY (last fetch date per known page) and decide fetch/skip —
    // fetch_new (never crawled), refetch_stale (announced lastmod
    // newer than our copy), refetch_unknown (announcement carries no
    // usable lastmod — the try_cast'd decoys — so fetch
    // conservatively), skip_fresh (our copy is current). Each decision
    // carries a staleness-weighted score (priority × days since
    // lastmod at the as-of date) — the ordering a fetch-budget
    // allocator would spend down. Same narrow-aggregate +
    // hash-key-join shape as x_sitemap_recrawl; history is one more
    // groupBy max over 8-byte keys.
    "x_recrawl_policy" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val crawledUrl = concat(
        when(col("doc_id") % 2 === 0, lit("https://"))
          .otherwise(lit("HTTP://")),
        when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
        col("source"), lit(".example.com"),
        when(col("doc_id") % 4 === 0, lit(":443")).otherwise(lit("")),
        lit("/Articles/"), (col("doc_id") % 40).cast("string"),
        when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit("?utm_source=feed&ref=abc"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("#section-2")).otherwise(lit("")))
      // crawl history: last fetch date per known canonical page —
      // dates ride the same 8-byte keys as every crawled-set join
      val hist = d.withColumn("url", crawledUrl)
        .select(xxhash64(Dedup.normalizeUrl(col("url"))).as("__ch"),
          date_add(to_date(lit("2026-01-01")),
            pmod(col("doc_id") * 11, lit(28)).cast("int")).as("f"))
        .groupBy("__ch").agg(max("f").as("last_fetched"))
      val loc = concat(lit("https://"), col("source"),
        lit(".example.com/Articles/"),
        ((col("doc_id") * 7) % 43).cast("string"),
        when(col("doc_id") % 5 === 0, lit("?v=2")).otherwise(lit("")))
      val lmStr = when(col("doc_id") % 97 === 13, lit("soon"))
        .otherwise(concat(lit("2026-01-"),
          lpad(((col("doc_id") % 28) + 1).cast("string"), 2, "0")))
      val prio = when(col("doc_id") % 89 === 7, lit("high"))
        .when(col("doc_id") % 3 === 0, lit("0.8")).otherwise(lit("0.5"))
      val sitemaps = Sitemap.renderSitemaps(
        d.select(col("doc_id"), col("source").as("site"), loc.as("loc"),
          lmStr.as("lastmod"), prio.as("priority")))
      val asof = to_date(lit("2026-03-01"))
      Sitemap.parseSitemaps(sitemaps)
        .select(Dedup.normalizeUrl(col("loc")).as("url_norm"),
          col("lastmod"), col("priority"))
        .groupBy("url_norm")
        .agg(max("lastmod").as("lastmod"), max("priority").as("priority"))
        .join(hist, xxhash64(col("url_norm")) === col("__ch"), "left")
        .withColumn("known", col("__ch").isNotNull)
        .drop("__ch")
        .withColumn("decision",
          when(!col("known"), lit("fetch_new"))
            .when(col("lastmod").isNull, lit("refetch_unknown"))
            .when(col("lastmod") > col("last_fetched"), lit("refetch_stale"))
            .otherwise(lit("skip_fresh")))
        .withColumn("score",
          coalesce(col("priority"), lit(0.5)) *
            datediff(asof, coalesce(col("lastmod"), to_date(lit("2026-01-01")))))
        .orderBy("url_norm")
    }),

    // Sitemap discovery via robots.txt — how a crawler actually
    // LEARNS a site's sitemap URLs (sitemaps.org protocol: `Sitemap:`
    // directives in robots.txt, section-INDEPENDENT unlike rules).
    // Dressing plants a commented-out decoy, an indented directive,
    // lowercase field casing, and a second (news) sitemap on
    // vowel-initial hosts; the badbot section around them must not
    // scope them.
    "x_sitemap_discovery" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val hosts = d.select(
        concat(col("source"), lit(".example.com")).as("host")).distinct()
      val content = concat(
        lit("User-agent: *\nDisallow: /tmp\n" +
          "# Sitemap: https://decoy.example.com/no.xml\n"),
        lit("Sitemap: https://"), col("host"), lit("/sitemap.xml\n"),
        when(col("host").rlike("^[aeiou]"),
          concat(lit("  sitemap: https://"), col("host"),
            lit("/news-sitemap.xml\n"))).otherwise(lit("")),
        lit("User-agent: badbot\nDisallow: /\n"))
      graft.ext.Robots.sitemapDirectives(
          hosts.withColumn("content", content), domainCol = "host")
        .orderBy("domain", "sitemap_url")
    }),

    // <base href> honored in link resolution (WHATWG HTML §4.2.3: the
    // document base overrides the page URL; first tag wins; the base
    // may itself be RELATIVE and resolves against the page URL — the
    // empty-ref trick makes one resolveHref call cover presence and
    // absence uniformly). Three page shapes: absolute cdn base,
    // relative ./v2/ base, no base; two link forms each.
    "x_base_links" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      val pageUrl = concat(lit("https://"), col("source"),
        lit(".example.com/Articles/"), (id % 40).cast("string"))
      val baseTag = when(id % 3 === 0,
          concat(lit("<base href=\"https://cdn."), col("source"),
            lit(".example.org/pages/\">")))
        .when(id % 3 === 1, lit("<base href=\"./v2/\">"))
        .otherwise(lit(""))
      val html = concat(baseTag,
        lit("<a href=\"item/"), (id % 9).cast("string"),
        lit("\">i</a><a href=\"/rooted/"), (id % 5).cast("string"),
        lit("\">r</a>"))
      val effBase = Html.resolveHref(pageUrl,
        coalesce(Html.baseHref(html), lit("")))
      // extractLinksDetailed, not extractLinks: the <base> tag's own
      // href= must not enter the link list
      d.select(id.as("doc_id"), effBase.as("__b"),
          posexplode(Html.extractLinksDetailed(html))
            .as(Seq("link_pos", "l")))
        .select(col("doc_id"), col("link_pos"),
          Html.resolveHref(col("__b"), col("l")("href")).as("resolved"))
        .orderBy("doc_id", "link_pos")
    }),

    // rel=canonical dedup — the strongest IN-PAGE dedup signal a
    // crawl carries: URL variants (mobile m. subdomain, tracking
    // params) declare the clean canonical; identity = the declared
    // canonical resolved against the page URL (relative canonicals
    // keep the variant HOST — the %21 rows pin that real subtlety),
    // falling back to the page's own canonicalized URL. One narrow
    // groupBy on the canonical key, the urlDedup aggregate shape.
    "x_canonical_dedup" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      val pageUrl = concat(
        when(id % 3 === 1, lit("https://m.")).otherwise(lit("https://")),
        col("source"), lit(".example.com/a/"), (id % 25).cast("string"),
        when(id % 4 === 0, lit("?utm=x")).otherwise(lit("")))
      val canonTag = when(id % 3 === 1 || id % 4 === 0,
          when(id % 7 === 0,
            concat(lit("<link rel=\"canonical\" href=\"/a/"),
              (id % 25).cast("string"), lit("\">")))
            .otherwise(concat(
              lit("<link rel=\"canonical\" href=\"https://"), col("source"),
              lit(".example.com/a/"), (id % 25).cast("string"), lit("\">"))))
        .otherwise(lit(""))
      val html = concat(canonTag, lit("<p>body</p>"))
      val canon = Dedup.normalizeUrl(coalesce(
        Html.resolveHref(pageUrl, Html.canonicalUrl(html)), pageUrl))
      d.select(canon.as("canonical_norm"), id)
        .groupBy("canonical_norm")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_pages"))
        .orderBy("canonical_norm")
    }),

    // HTML → text extraction (the content-conversion step between a
    // raw crawl response and WET plain text): script/style blocks and
    // comments dropped, tags stripped, the five predefined entities
    // decoded, whitespace collapsed. The dressing plants decoys for
    // every rule — tags INSIDE a script string, a style body, a
    // comment, a double-entity — and the oracle CONSTRUCTS the
    // expected text directly (no regex on the oracle side), so the
    // whole pipeline is pinned, not mirrored.
    "x_html_text" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      d.select(col("doc_id"), Html.htmlToText(htmlDressing).as("extracted"))
        .orderBy("doc_id")
    }),

    // href extraction off the same dressing — the op that turns a
    // fetched page into crawl-frontier candidates (the input to the
    // streaming URL first-occurrence gate). posexplode keeps document
    // order so the frontier is deterministic.
    "x_html_links" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      d.select(col("doc_id"),
          posexplode(Html.extractLinks(htmlDressing)).as(Seq("link_pos", "link")))
        .orderBy("doc_id", "link_pos")
    }),

    // Crawl-to-corpus funnel e2e: the whole raw-crawl ingest chain as
    // ONE DataFrame job — render raw WARC response files, parse them
    // back (record + HTTP layers), apply the WET-derivation keep
    // filter, honor in-page <meta name="robots" content="noindex">
    // (the page's own half of the compliance contract — a noindexed
    // page is fetched and counted but never enters the kept corpus),
    // gate the rest through robots rules on the CANONICAL URL, then
    // collapse to distinct canonical pages — reported as a per-HOST
    // funnel (fetched → kept → robots-blocked → noindexed → pages).
    // robots.txt is a per-host resource (RFC 9309 §2.3), so both the
    // rules fetch list and the report grain key on urlHost — the
    // same grain the frontier queries gate on; www.foo.com and
    // m.foo.com get independent rule sets. Counts ride
    // xxhash64(url_norm); archive text never aggregates.
    "x_crawl_e2e" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("https://"))
          .otherwise(lit("http://")),
        when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("m.")),
        col("source"),
        when(col("doc_id") % 4 === 0, lit(".com")).otherwise(lit(".org")),
        lit("/p/"), (col("doc_id") % 15).cast("string"),
        when(col("doc_id") % 6 === 0, lit("?ref=rss")).otherwise(lit("")))
      val status = when(col("doc_id") % 11 === 7, lit("404 Not Found"))
        .when(col("doc_id") % 13 === 5, lit("301 Moved Permanently"))
        .otherwise(lit("200 OK"))
      val ctype = when(col("doc_id") % 9 === 4, lit("application/pdf"))
        .otherwise(lit("text/html; charset=UTF-8"))
      val body = concat(
        when(col("doc_id") % 10 === 3,
          lit("<meta name=\"robots\" content=\"noindex\">"))
          .otherwise(lit("")), col("text"))
      val files = Warc.renderFiles(
        d.withColumn("url", url)
          .withColumn("shard", pmod(col("doc_id"), lit(8)))
          .withColumn("http", Warc.httpPayload(status, ctype, body)),
        textCol = "http", warcType = "response")
      val norm = Dedup.normalizeUrl(col("uri"))
      val pages = Warc.parseHttp(Warc.parseRecords(files))
        .select(col("rec_id"), col("kept"),
          coalesce(Html.metaRobots(col("body"))("noindex"), lit(false))
            .as("noindex"),
          norm.as("url_norm"))
        .withColumn("host", Dedup.urlHost(col("url_norm")))
        .withColumn("path", regexp_extract(col("url_norm"), "(/.*)$", 1))
      // the robots fetch list comes straight off the URL projection —
      // enumerating hosts must not re-render the archive branch
      val robots = d.withColumn("url", url)
        .select(Dedup.urlHost(Dedup.normalizeUrl(col("url"))).as("host"))
        .distinct()
        .withColumn("content",
          when(col("host").endsWith(".com"),
            lit("# policy\nUser-agent: badbot\nDisallow: /\n\n" +
              "User-agent: *\nDisallow: /p/3\nDisallow: /p/11\n"))
            .otherwise(
              lit("User-agent: *\r\nDisallow: /p/7\r\nDisallow:\r\n" +
                "# tail comment\r\nUser-agent: badbot\r\nDisallow: /\r\n")))
      val surviving = col("kept") && !col("blocked") && !col("noindex")
      graft.ext.Robots.applyRules(pages,
          graft.ext.Robots.parseRules(robots, domainCol = "host"),
          domainCol = "host")
        .groupBy("host")
        .agg(count(lit(1)).as("n_fetched"),
          sum(when(surviving, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept") && col("blocked"), 1L).otherwise(0L))
            .as("n_robots_blocked"),
          sum(when(col("kept") && !col("blocked") && col("noindex"), 1L)
            .otherwise(0L)).as("n_noindexed"),
          countDistinct(when(surviving, xxhash64(col("url_norm"))))
            .as("n_pages"))
        .orderBy("host")
    }),

    // robots.txt compliance gate: per-domain robots bodies (decoy
    // badbot sections, comments, blank Disallow allow-all markers,
    // mixed LF/CRLF endings) parsed by the HOF fold, then the bounded
    // rules table broadcast-joined against the page frame. The decoy
    // `User-agent: badbot / Disallow: /` section means a parser that
    // ignored sections would block EVERY page — the oracle's
    // per-domain CASE genuinely pins the section logic. RFC 9309
    // precedence is load-bearing on both TLDs: .com pins
    // longest-match (Disallow /p/1 vs /p/11) plus Allow-overrides
    // (/p/12 stays crawlable inside the /p/1 block); .org pins
    // wildcard+anchor matching (/p/*4$ catches /p/4 AND /p/14) with
    // the exact-tie Allow override (/p/14$, same length) releasing
    // /p/14 only.
    "x_robots_filter" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("https://"))
          .otherwise(lit("http://")),
        when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("m.")),
        col("source"),
        when(col("doc_id") % 4 === 0, lit(".com")).otherwise(lit(".org")),
        lit("/p/"), (col("doc_id") % 15).cast("string"),
        when(col("doc_id") % 6 === 0, lit("?ref=rss")).otherwise(lit("")))
      val norm = Dedup.normalizeUrl(col("url"))
      val pages = d.withColumn("url", url)
        .select(col("doc_id"), Dedup.urlDomain(norm).as("domain"),
          regexp_extract(norm, "(/.*)$", 1).as("path"))
      val robots = pages.select("domain").distinct()
        .withColumn("content",
          when(col("domain").endsWith(".com"),
            lit("# policy\nUser-agent: badbot\nDisallow: /\n\n" +
              "User-agent: *\nDisallow: /p/1\nAllow: /p/12\n" +
              "Disallow: /p/3\nDisallow: /p/11\n"))
            .otherwise(
              lit("User-agent: *\r\nDisallow: /p/7\r\nDisallow: /p/*4$\r\n" +
                "Allow: /p/14$\r\nDisallow:\r\n" +
                "# tail comment\r\nUser-agent: badbot\r\nDisallow: /\r\n")))
      graft.ext.Robots.applyRules(pages, graft.ext.Robots.parseRules(robots))
        .orderBy("doc_id")
    }),

    // Robots availability semantics (RFC 9309 §2.3.1): the gate's
    // verdict depends on how the robots.txt FETCH went — 4xx means no
    // robots exists (allow all, the parsed /p/1 block LIFTS on m-org
    // hosts), 5xx means unreachable (assume complete disallow, every
    // org-503 page blocked with the 'unreachable' sentinel), 2xx
    // applies the rules (.com hosts, incl. the /p/12 Allow
    // carve-out). All three host classes share the SAME robots body —
    // only the status differs, so a gate ignoring availability gets
    // every class wrong.
    "x_robots_availability" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      val url = concat(
        when(id % 2 === 0, lit("https://")).otherwise(lit("http://")),
        when(id % 3 === 0, lit("www.")).otherwise(lit("m.")),
        col("source"),
        when(id % 4 === 0, lit(".com")).otherwise(lit(".org")),
        lit("/p/"), (id % 15).cast("string"))
      val norm = Dedup.normalizeUrl(col("url"))
      val pages = d.withColumn("url", url)
        .select(id.as("doc_id"), Dedup.urlHost(norm).as("host"),
          regexp_extract(norm, "(/.*)$", 1).as("path"))
      val hosts = pages.select("host").distinct()
      val robots = hosts.withColumn("content",
        lit("User-agent: *\nDisallow: /p/1\nAllow: /p/12\n"))
      val status = hosts.withColumn("robots_status",
        when(col("host").endsWith(".com"), lit(200))
          .when(col("host").startsWith("m."), lit(404))
          .otherwise(lit(503)))
      graft.ext.Robots.applyWithAvailability(pages,
          graft.ext.Robots.parseRules(robots, domainCol = "host"),
          status, domainCol = "host")
        .orderBy("doc_id")
    }),

    // Raw-WARC response layer (one below WET): render response records
    // whose payloads are full HTTP messages (status line, Content-Type,
    // body), parse them back, and compute the WET-derivation decision —
    // `kept` = status 200 with a text/* mime — exactly the filter that
    // turns raw crawl WARCs into WET conversions. Status/mime dressing
    // is deterministic off doc_id so the oracle replays the whole
    // parse + filter as a projection.
    "x_warc_http" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/doc/"), col("doc_id").cast("string"))
      val status = when(col("doc_id") % 11 === 7, lit("404 Not Found"))
        .when(col("doc_id") % 13 === 5, lit("301 Moved Permanently"))
        .otherwise(lit("200 OK"))
      val ctype = when(col("doc_id") % 9 === 4, lit("application/pdf"))
        .otherwise(lit("text/html; charset=UTF-8"))
      val files = Warc.renderFiles(
        d.withColumn("url", url)
          .withColumn("shard", pmod(col("doc_id"), lit(8)))
          .withColumn("http", Warc.httpPayload(status, ctype, col("text"))),
        textCol = "http", warcType = "response")
      Warc.parseHttp(Warc.parseRecords(files))
        .select(col("rec_id").as("doc_id"), col("status_code"), col("mime"),
          length(col("body")).cast("long").as("body_chars"), col("kept"))
        .orderBy("doc_id")
    }),

    // Charset-aware body decode (the real-crawl contract one step
    // below x_warc_http): bodies are BYTES in the charset the
    // Content-Type header declares — the dressing plants latin-1
    // (é as ONE byte), utf-8 (multi-byte em-dash + astral emoji), and
    // a charset-less text/plain that exercises the utf-8 fallback.
    // The whole archive rides the latin-1 byte-view bijection
    // (decode(bytes,'ISO-8859-1') chars ≡ bytes), so the standard
    // character-mode WARC framing IS byte framing; parseHttpCharset
    // re-decodes each body per its declared charset. The oracle
    // CONSTRUCTS the expected decoded text per residue — a decoder
    // that ignored charset= would hand back mojibake and break the
    // hash.
    "x_warc_charset" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/doc/"), id.cast("string"))
      val bodyBytes = when(id % 3 === 0,
          encode(concat(col("text"), lit(" café")), "ISO-8859-1"))
        .when(id % 3 === 1,
          encode(concat(col("text"), lit(" café—😀")), "UTF-8"))
        .otherwise(encode(col("text"), "UTF-8"))
      val ctype = when(id % 3 === 0, lit("text/html; charset=ISO-8859-1"))
        .when(id % 3 === 1, lit("text/html; charset=UTF-8"))
        .otherwise(lit("text/plain"))
      val files = Warc.renderFiles(
        d.withColumn("url", url)
          .withColumn("shard", pmod(id, lit(8)))
          .withColumn("http", Warc.httpPayload(lit("200 OK"), ctype,
            decode(bodyBytes, "ISO-8859-1"))),
        textCol = "http", warcType = "response")
      Warc.parseHttpCharset(Warc.parseRecords(files))
        .select(col("rec_id").as("doc_id"), col("mime"), col("charset"),
          col("body"), col("kept"))
        .orderBy("doc_id")
    }),

    // Redirect-chain resolution — the crawl-graph edge raw WARC
    // carries and WET hides: render response records whose 3xx rows
    // carry a Location header, parse them back, and pointer-double
    // the (uri -> location) edge set to each source's final canonical
    // target (the feed for urlDedup / the frontier). Dressing plants
    // every chain shape: %17∈{2,3} rows form adjacent-id 2-cycles
    // that must surface as looped (never hang or mis-resolve);
    // %13==5 rows chain +13 for up to 3 hops before the div-guard
    // breaks the run; a +13 run landing on a cycle member inherits
    // its loop. Oracle replays the walk as a recursive CTE.
    "x_redirect_resolve" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      val urlOf = (i: Column) =>
        concat(lit("https://redir.example.com/r/"), i.cast("string"))
      val dstId = when(id % 17 === 2, id + 1)
        .when(id % 17 === 3, id - 1)
        .when(id % 13 === 5 && floor(id / 13) % 4 =!= 3, id + 13)
      val status = when(dstId.isNotNull, lit("301 Moved Permanently"))
        .otherwise(lit("200 OK"))
      val files = Warc.renderFiles(
        d.withColumn("url", urlOf(id))
          .withColumn("shard", pmod(id, lit(8)))
          .withColumn("http", Warc.httpPayload(status,
            lit("text/html; charset=UTF-8"), col("text"),
            location = when(dstId.isNotNull, urlOf(dstId)))),
        textCol = "http", warcType = "response")
      val edges = Warc.parseHttp(Warc.parseRecords(files))
        .where(col("status_code").between(300, 399) &&
          col("location").isNotNull)
        .select(Dedup.normalizeUrl(col("uri")).as("src"),
          Dedup.normalizeUrl(col("location")).as("dst"))
      Warc.resolveRedirects(edges).orderBy("src")
    }),

    // Frontier URL-trap hygiene: the admission filters between link
    // discovery and the fetch queue — depth caps, length caps, and
    // the cyclic-path-trap signature (a segment recurring 3+ times:
    // calendar/session mazes). Mutually-exclusive dressing branches
    // (first residue wins) so the oracle restates each trap class
    // directly.
    "x_url_traps" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      val path = when(id % 11 === 0, lit("/d/1/2/3/4/5/6/7/8/9"))
        .when(id % 13 === 0, lit("/p/q/p/q/p/q"))
        .when(id % 17 === 0, concat(lit("/"), rpad(lit("z"), 110, "z")))
        .otherwise(concat(lit("/a/"), (id % 30).cast("string")))
      val urls = d.select(id.as("doc_id"),
        concat(col("source"), lit(".example.com"), path).as("url_norm"))
      Dedup.urlTrapFlags(urls).orderBy("doc_id")
    }),

    // Crawl-identity resolution e2e — the composition the redirect
    // family exists for: parse the raw archive, pull its 3xx edge
    // set, pointer-double it to final targets, then gate EVERY
    // fetched page through the resolved map (gateRedirects — the same
    // stateless join the streaming twin runs) so each page carries
    // its crawl identity: redirect sources adopt their chain's final
    // target, cycles keep their own URL flagged looped, plain pages
    // pass through. Gives the gate a full DuckDB oracle (the
    // recursive-CTE walk joined back over all pages) next to its
    // stream≡batch spec pin.
    "x_redirect_identity" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      val urlOf = (i: Column) =>
        concat(lit("https://redir.example.com/r/"), i.cast("string"))
      val dstId = when(id % 17 === 2, id + 1)
        .when(id % 17 === 3, id - 1)
        .when(id % 13 === 5 && floor(id / 13) % 4 =!= 3, id + 13)
      val status = when(dstId.isNotNull, lit("301 Moved Permanently"))
        .otherwise(lit("200 OK"))
      val files = Warc.renderFiles(
        d.withColumn("url", urlOf(id))
          .withColumn("shard", pmod(id, lit(8)))
          .withColumn("http", Warc.httpPayload(status,
            lit("text/html; charset=UTF-8"), col("text"),
            location = when(dstId.isNotNull, urlOf(dstId)))),
        textCol = "http", warcType = "response")
      // parsed feeds BOTH the edge extraction and the gated page side —
      // checkpoint so the WARC render + parse kernel chain runs once,
      // not once per consumer (the parse-once-persist posture)
      val parsed = Warc.parseHttp(Warc.parseRecords(files)).localCheckpoint()
      val edges = parsed
        .where(col("status_code").between(300, 399) &&
          col("location").isNotNull)
        .select(Dedup.normalizeUrl(col("uri")).as("src"),
          Dedup.normalizeUrl(col("location")).as("dst"))
      Warc.gateRedirects(
          parsed.select(col("rec_id").as("doc_id"), col("uri").as("url")),
          Warc.resolveRedirects(edges))
        .select("doc_id", "url_norm", "final_norm", "redirected", "looped")
        .orderBy("doc_id")
    }),

    // Link-graph host centrality — the curation quality prior
    // (CC-Net/RefinedWeb lineage): pages render <a> tags in three RFC
    // 3986 reference forms (absolute with uppercase scheme,
    // protocol-relative, rooted + dotted relative — the latter two
    // resolve to the page's own host and must vanish as self-edges),
    // links resolve and canonicalize through the standard frontier
    // pipeline, collapse to the distinct host→host edge set, and a
    // 10-round fixed-point PageRank (damping 85/100) ranks the hosts.
    // INTEGER fixed-point throughout (10^12 units, floor division) —
    // double summation is addition-order-dependent and could never
    // hash-match; the DuckDB oracle replays the identical recurrence
    // as a recursive CTE sharing K, the damping fraction, and the
    // scale constant.
    "x_host_rank" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      def host(k: Column): Column =
        concat(lit("h"), k.cast("string"), lit(".example.com"))
      val pageUrl = concat(lit("https://"), host(id % 53),
        lit("/p/"), id.cast("string"))
      val pageHtml = concat(
        lit("<a href=\"HTTPS://"), host((id * 2 + 1) % 53),
        lit("/x/"), (id % 10).cast("string"), lit("\">a</a>"),
        lit("<a href=\"//"), host((id * 3 + 7) % 53), lit("/y\">b</a>"),
        lit("<a href=\"/local/"), (id % 5).cast("string"), lit("\">c</a>"),
        lit("<a href=\"../up/"), (id % 3).cast("string"), lit("\">d</a>"))
      val links = d
        .select(pageUrl.as("url"),
          explode(Html.extractLinksDetailed(pageHtml)).as("l"))
        .select(col("url"),
          Html.resolveHref(col("url"), col("l")("href")).as("link"))
      LinkGraph.hostRank(LinkGraph.hostEdges(links)).orderBy("host")
    }),

    // Weighted variant: edges keep their page-level MULTIPLICITY (a
    // host linking somewhere from many pages endorses it more than a
    // single footnote), each source splitting its mass proportionally
    // — contrib = (rank div total_out_weight) · weight, still exact
    // integer arithmetic. Same recursive-CTE oracle with the distinct
    // replaced by a count-weighted group.
    "x_host_rank_weighted" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      def host(k: Column): Column =
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
      LinkGraph.hostRank(LinkGraph.hostEdgesWeighted(links),
          weightCol = "weight")
        .orderBy("host")
    }),

    // SEEDED variant — the TrustRank shape: all teleport mass
    // concentrates on a curated 5-host seed set, so trust flows
    // outward from the seeds along links and a host unreachable from
    // every seed settles at exactly 0 (not the uniform floor) — the
    // standard spam-demotion / allowlist-proximity prior. Same
    // integer fixed-point recurrence; the oracle's recursive CTE
    // carries the per-host seed flag into both the init and the base
    // term.
    "x_host_rank_seeded" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      def host(k: Column): Column =
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
      val seeds = s.range(5).select(
        concat(lit("h"), col("id").cast("string"), lit(".example.com"))
          .as("host"))
      LinkGraph.hostRankSeeded(LinkGraph.hostEdges(links), seeds)
        .orderBy("host")
    }),

    // The prior put to work: each host's document quota is
    // floor(rank · budget / scale) — exact integer arithmetic, quotas
    // sum to ≤ budget — and the host's first-quota docs by id are
    // kept. Host-partitioned window over the doc frame; the
    // host-bounded rank table broadcasts.
    "x_rank_weighted_select" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      def host(k: Column): Column =
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
      val ranks = LinkGraph.hostRank(LinkGraph.hostEdges(links))
      LinkGraph.rankWeightedSelect(
          d.select(host(id % 53).as("host"), col("doc_id")),
          ranks, totalBudget = 300L)
        .orderBy("host", "doc_id")
    }),

    // The prior feeding the CRAWL side: discovered frontier URLs
    // prioritized by their target host's centrality (quality-first
    // scheduling, the OPIC-lineage policy) — distinct resolved
    // targets join the host-bounded rank table (broadcastable) and
    // take a per-HOST politeness slot (host-partitioned window, never
    // a global sort); output ordered best-host-first.
    "x_frontier_priority" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      def host(k: Column): Column =
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
      val targets = links
        .select(Dedup.normalizeUrl(col("link")).as("url_norm")).distinct()
        .withColumn("host", Dedup.urlHost(col("url_norm")))
      val ranks = LinkGraph.hostRank(LinkGraph.hostEdges(links))
      targets.join(broadcast(ranks), "host")
        .withColumn("slot", row_number().over(
          Window.partitionBy(col("host")).orderBy(col("url_norm")))
          .cast("long"))
        .select("url_norm", "host", "rank", "slot")
        .orderBy(col("rank").desc, col("url_norm"))
    }),

    // Host-graph connected components — mirror-site / site-family
    // clustering (the second standard graph prior after centrality:
    // cluster a family of mirrored hosts before sampling so it can't
    // dominate a mixture once per mirror). Pages plant a 60-host
    // graph whose links shift by +12/+24 mod 60, so reachability
    // never leaves a residue class mod 12 — exactly 12 components of
    // 5 hosts each, labeled by their lexicographically smallest host.
    // Engine runs hash-min contraction to the exact fixpoint; the
    // DuckDB oracle derives the identical partition from PURE
    // reachability (a recursive CTE closes (host, reachable-label)
    // pairs, then min per host) — construct-the-output, no hash and
    // no contraction mirrored.
    "x_host_components" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      def host(k: Column): Column =
        concat(lit("h"), k.cast("string"), lit(".example.com"))
      val pageUrl = concat(lit("https://"), host(id % 60),
        lit("/p/"), id.cast("string"))
      val links = d.select(pageUrl.as("url"),
        explode(array(
          concat(lit("https://"), host((id + 12) % 60), lit("/m")),
          concat(lit("https://"), host((id + 24) % 60), lit("/m"))))
          .as("link"))
      LinkGraph.hostComponents(LinkGraph.hostEdges(links))
        .orderBy("host")
    }),

    // The two graph priors COMPOSED: weighted host rank over the
    // mod-60 family graph, then rank mass summed per mirror family —
    // the "which families dominate the crawl" report a mixture
    // designer reads before setting family quotas. Exact long sums
    // (fixed-point ranks add commutatively), so the composition
    // hash-matches an oracle that replays rank and components
    // independently and joins them.
    "x_family_rank" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      def host(k: Column): Column =
        concat(lit("h"), k.cast("string"), lit(".example.com"))
      val pageUrl = concat(lit("https://"), host(id % 60),
        lit("/p/"), id.cast("string"))
      val links = d.select(pageUrl.as("url"),
        explode(array(
          concat(lit("https://"), host((id + 12) % 60), lit("/m")),
          concat(lit("https://"), host((id + 24) % 60), lit("/m"))))
          .as("link"))
      val ranks = LinkGraph.hostRank(LinkGraph.hostEdgesWeighted(links),
        weightCol = "weight")
      val comps = LinkGraph.hostComponents(LinkGraph.hostEdges(links))
      ranks.join(comps.select("host", "component"), "host")
        .groupBy("component")
        .agg(sum(col("rank")).as("family_rank"),
          count(lit(1)).as("n_hosts"))
        .orderBy("component")
    }),

    // The component prior put to work — family-capped selection: docs
    // join their host's mirror-family label (the host-bounded
    // component table broadcasts, the rankWeightedSelect posture) and
    // each FAMILY keeps its first 5 docs by id — so a family of five
    // mirrored hosts contributes 5 docs total where host-level
    // sampling would take 5 EACH. Component-partitioned window, never
    // global.
    "x_mirror_family_select" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      def host(k: Column): Column =
        concat(lit("h"), k.cast("string"), lit(".example.com"))
      val pageUrl = concat(lit("https://"), host(id % 60),
        lit("/p/"), id.cast("string"))
      val links = d.select(pageUrl.as("url"),
        explode(array(
          concat(lit("https://"), host((id + 12) % 60), lit("/m")),
          concat(lit("https://"), host((id + 24) % 60), lit("/m"))))
          .as("link"))
      import org.apache.spark.sql.expressions.Window
      val comps = LinkGraph.hostComponents(LinkGraph.hostEdges(links))
      d.select(host(id % 60).as("host"), col("doc_id"))
        .join(broadcast(comps.select("host", "component")), "host")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("component")).orderBy(col("doc_id"))))
        .where(col("rn") <= 5)
        .select(col("component"), col("host"), col("doc_id"))
        .orderBy("component", "doc_id")
    }),

    // HTTP wire-coding decode — the layer BELOW charsets a real raw
    // crawl carries: nine body classes (identity / chunked /
    // Content-Encoding gzip / chunked-over-gzip / truncated gzip /
    // zlib deflate / RAW deflate, the classic server misconfiguration
    // / the RFC 7230 §3.3.1 coding LIST `Transfer-Encoding: gzip,
    // chunked`, removed right-to-left / unsupported `br`) are
    // RENDERED with the engine's own deterministic gzip + zlib
    // members and two-chunk framing over the latin-1 byte view,
    // framed into WARC response records, then parseHttpEncoded strips
    // the framing and inflates every coding in ONE fused kernel call
    // and charset-decodes — the corrupt-gzip and unsupported-br
    // classes degrade to (body null, body_ok false), rows to
    // quarantine. Construct-the-output oracle: every decoded body
    // must equal the base text column verbatim, so the oracle states
    // the expectation WITHOUT mirroring any codec.
    "x_warc_encoding" -> ((s, dir) => {
      val d = parallel(tbl(s, dir, "documents"))
      val id = col("doc_id")
      val cls = id % 9
      val plainView = decode(encode(col("text"), "UTF-8"), "ISO-8859-1")
      val gzView = decode(
        graft.plans.NativeFunctions.gzip(encode(col("text"), "UTF-8")),
        "ISO-8859-1")
      val zlView = decode(
        graft.plans.NativeFunctions.zlib(encode(col("text"), "UTF-8")),
        "ISO-8859-1")
      // raw deflate ≡ the zlib stream minus its 2-byte header and
      // 4-byte Adler trailer (same Deflater bits)
      val rawView = zlView.substr(lit(3), (length(zlView) - 6).cast("int"))
      def chunked(v: Column): Column = {
        val l = length(v)
        val len1 = floor(l / 2).cast("int")
        val len2 = (l - len1).cast("int")
        when(l >= 2, concat(
            lower(hex(len1)), lit("\r\n"), v.substr(lit(1), len1),
            lit("\r\n"), lower(hex(len2)), lit("\r\n"),
            v.substr(len1 + 1, len2), lit("\r\n0\r\n\r\n")))
          .when(l === 1, concat(lit("1\r\n"), v, lit("\r\n0\r\n\r\n")))
          .otherwise(lit("0\r\n\r\n"))
      }
      val body = when(cls === 0, plainView)
        .when(cls === 1, chunked(plainView))
        .when(cls === 2, gzView)
        .when(cls === 3, chunked(gzView))
        // drop the last 6 bytes: trailer gone → member walk fails
        .when(cls === 4,
          gzView.substr(lit(1), (length(gzView) - 6).cast("int")))
        .when(cls === 5, zlView)
        .when(cls === 6, rawView)
        .when(cls === 7, chunked(gzView)) // TE list: gzipped THEN chunked
        .otherwise(plainView) // 8: the br coding quarantines regardless
      val extra = when(cls === 1, lit("\r\nTransfer-Encoding: chunked"))
        .when(cls === 2 || cls === 4, lit("\r\nContent-Encoding: gzip"))
        .when(cls === 3,
          lit("\r\nTransfer-Encoding: chunked\r\nContent-Encoding: gzip"))
        .when(cls === 5 || cls === 6, lit("\r\nContent-Encoding: deflate"))
        .when(cls === 7, lit("\r\nTransfer-Encoding: gzip, chunked"))
        .when(cls === 8, lit("\r\nContent-Encoding: br"))
        .otherwise(lit(""))
      val files = Warc.renderFiles(d
        .withColumn("url", concat(lit("https://enc.example.com/d/"),
          id.cast("string")))
        .withColumn("shard", pmod(id, lit(8)))
        .withColumn("http", Warc.httpPayload(lit("200 OK"),
          lit("text/plain; charset=utf-8"), body, extraHeaders = extra)),
        textCol = "http", warcType = "response")
      Warc.parseHttpEncoded(Warc.parseRecords(files))
        .select(col("rec_id").as("doc_id"), col("transfer_encoding"),
          col("content_encoding"), col("body_ok"), col("body"))
        .orderBy("doc_id")
    }),

    // Anchor-text corpus: aggregate what the web SAYS about each page
    // — pages render <a> elements whose inner markup carries nested
    // tags and entities (both must clean), a nofollow edge (excluded,
    // the frontier convention), and an empty image-style anchor
    // (dropped); targets resolve through resolveHref (absolute,
    // protocol-relative, and rooted forms), canonicalize, and the
    // per-target aggregate keys on the 8-byte URL hash with sorted
    // distinct anchors capped at 8 entries × 20 chars. The oracle
    // CONSTRUCTS the expected (target, anchor) pairs from doc_id
    // arithmetic — no oracle-side mirroring of the HTML cleanup.
    "x_anchor_text" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      val base = concat(lit("https://h"), (id % 31).cast("string"),
        lit(".example.com/p/"), id.cast("string"))
      val html = concat(
        lit("<a href=\"https://t.example.org/a/"), (id % 40).cast("string"),
        lit("\"><b>Article</b> "), (id % 40).cast("string"),
        lit(" v"), (id % 9).cast("string"), lit("</a>"),
        lit("<a href=\"/local/"), (id % 7).cast("string"),
        lit("\">Local &amp; More "), (id % 7).cast("string"),
        lit(" with a long tail</a>"),
        lit("<a href=\"//t.example.org/a/"), ((id * 3) % 40).cast("string"),
        lit("\" rel=\"nofollow\">skip me</a>"),
        lit("<a href=\"https://t.example.org/a/"), (id % 40).cast("string"),
        lit("\"></a>"))
      val anchors = d
        .select(base.as("base"), explode(Html.extractAnchors(html)).as("an"))
        .where(!col("an")("nofollow"))
        .select(Html.resolveHref(col("base"), col("an")("href")).as("url"),
          col("an")("anchor").as("anchor"))
      LinkGraph.anchorCorpus(anchors, maxAnchors = 8, maxLen = 20)
        .orderBy("url_norm")
    }),

    // Multi-byte charset decode — the CJK extension of the charset
    // layer: three declared charsets (shift_jis / euc-jp / gb18030)
    // rotate per row, each body planted as the charset's own BYTES
    // (pre-encoded at query-build time into the latin-1 view) plus an
    // ASCII suffix; the per-row decode_charset kernel must recover
    // the original text exactly (Spark's decode only takes constant
    // charsets — this is the bounded-table kernel path). Construct
    // oracle: the expected text restated as UTF-8 literals.
    "x_warc_charset_cjk" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val id = col("doc_id")
      val iso = java.nio.charset.StandardCharsets.ISO_8859_1
      def viewOf(text: String, jdkName: String): String = new String(
        text.getBytes(java.nio.charset.Charset.forName(jdkName)), iso)
      val cls = id % 3
      val bodyView = concat(
        when(cls === 0, lit(viewOf("日本語テキスト", "Shift_JIS")))
          .when(cls === 1, lit(viewOf("かな漢字混じり文", "EUC-JP")))
          .otherwise(lit(viewOf("简体中文内容", "GB18030"))),
        lit(" #"), (id % 10).cast("string"))
      val ctype = when(cls === 0, lit("text/html; charset=shift_jis"))
        .when(cls === 1, lit("text/html; charset=EUC-JP"))
        .otherwise(lit("text/html; charset=gb18030"))
      val files = Warc.renderFiles(d
        .withColumn("url", concat(lit("https://cjk.example.com/d/"),
          id.cast("string")))
        .withColumn("shard", pmod(id, lit(8)))
        .withColumn("http", Warc.httpPayload(lit("200 OK"), ctype, bodyView)),
        textCol = "http", warcType = "response")
      Warc.parseHttpCharset(Warc.parseRecords(files))
        .select(col("rec_id").as("doc_id"), col("charset"), col("body"))
        .orderBy("doc_id")
    }),

    // Quality-aware exact dedup: keep the highest-n_chars copy of each
    // duplicate group (tie → smallest id) — the production keep rule
    // when mirrors differ in metadata; one max_by-struct aggregate on
    // narrow (digest, score, id) rows, never a per-group window sort.
    "x_dedup_keep_best" -> ((s, dir) =>
      Dedup.exactKeepBest(tbl(s, dir, "documents"), col("n_chars"))
        .orderBy("digest")),

    // Heavy-hitter detection (the planning half of the hot/cold salted
    // join): keys holding >= 15% of the table.
    "x_hot_keys" -> ((s, dir) =>
      graft.operators.SkewUtils.hotKeys(tbl(s, dir, "documents"),
        Seq("lang"), minShare = 0.15)
        .orderBy("lang")),

    // Corpus dedup stats: exact distincts (oracle) — the approx
    // (HLL sketch) variant lives in the rows-only x-queries since
    // sketch estimates are engine-specific by construction.
    "x_dedup_stats" -> ((s, dir) =>
      tbl(s, dir, "documents").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_text"),
        countDistinct(sha2(col("text"), 256)).as("n_distinct_digest"),
        countDistinct(col("lang")).as("n_langs"))),

    "x_jaccard_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(parallel(tbl(s, dir, "documents")), minJaccard = 0.05)
        .orderBy("a", "b")),

    // Directional containment (Broder): |grams(a)∩grams(b)| / |grams(a)|
    // — catches the short-doc-quoted-whole-inside-long-doc shape whose
    // Jaccard is arbitrarily small; both directions emitted when both
    // clear the threshold.
    "x_containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(tbl(s, dir, "documents"), minContainment = 0.6)
        .orderBy("a", "b")),

    // Cross-corpus (snapshot-vs-snapshot) near-dup candidates: the
    // incremental-ingest dedup shape — new docs (odd ids) flagged
    // against the archived snapshot (even ids) via the SAME band
    // kernel batch and streaming use (flagAgainstCorpus is frame-
    // agnostic: the static side is the state).
    "x_crosscorpus_dedup" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      graft.streaming.NearDupStream.flagAgainstCorpus(
          d.where(col("doc_id") % 2 === 1),
          d.where(col("doc_id") % 2 === 0))
        .select("doc_id", "hist_id").distinct()
        .orderBy("doc_id", "hist_id")
    }),

    // LSH candidate recall/precision against exact Jaccard truth at
    // the near-dup operating point — measures the banding quality the
    // whole near-dup family rests on (x_ann_recall's dedup sibling).
    "x_lsh_recall" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val truth = Dedup.ngramJaccardPairs(d, minJaccard = 0.7).select("a", "b")
      val cand = Dedup.minhashLshPairs(d).select("a", "b")
      val hit = truth.join(cand, Seq("a", "b"), "left_semi")
      truth.agg(count(lit(1)).as("n_true_pairs"))
        .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_true_pairs"), col("n_candidates"), col("n_hit"),
          when(col("n_true_pairs") > 0,
            col("n_hit").cast("double") / col("n_true_pairs").cast("double"))
            .otherwise(lit(1.0)).as("recall"),
          when(col("n_candidates") > 0,
            col("n_hit").cast("double") / col("n_candidates").cast("double"))
            .otherwise(lit(1.0)).as("cand_precision"))
    }),

    // Exact-substring dedup (Lee et al.): pairs sharing a verbatim
    // 8-token window, found via the one-pass hashed-window kernel and
    // an 8-byte-key equi-join — the suffix-array-free formulation that
    // stays a bucketed join at 100 TB.
    "x_substring_dedup" -> ((s, dir) =>
      Dedup.exactSubstringPairs(tbl(s, dir, "documents"), windowTokens = 8)
        .orderBy("a", "b")),

    // ... and its LENGTH refinement: the longest common consecutive
    // token run per pair (diagonal islands over positional window
    // matches) — the "drop any run >= N tokens" dedup-policy input,
    // still suffix-array-free.
    "x_longest_run" -> ((s, dir) =>
      Dedup.longestRunPairs(parallel(tbl(s, dir, "documents")), windowTokens = 8)
        .orderBy("a", "b")),

    // ... and the policy APPLY: every shared run >= 8 tokens removed
    // from the later document, span-precise (first occurrence keeps
    // its text; positions rebuilt token-by-token).
    "x_verbatim_scrub" -> ((s, dir) =>
      Dedup.verbatimSpanScrub(parallel(tbl(s, dir, "documents")), windowTokens = 8,
        minRunTokens = 8).orderBy("doc_id")),

    // Intra-doc twin: longest run occurring at least TWICE within one
    // document (looping boilerplate, degenerate generation) — the
    // run-length upgrade of the repetition ratios.
    "x_self_repeat" -> ((s, dir) =>
      Dedup.selfRepeatRuns(parallel(tbl(s, dir, "documents")), windowTokens = 3)
        .orderBy("doc_id")),

    // Per-doc n-gram novelty: fraction of a doc's distinct 8-token
    // windows unique to it corpus-wide — the linear-cost diversity
    // diagnostic (doc-frequency agg, no pair term).
    "x_ngram_novelty" -> ((s, dir) =>
      Dedup.ngramNovelty(tbl(s, dir, "documents"), windowTokens = 8)
        .orderBy("doc_id")),

    "x_text_quality" -> ((s, dir) =>
      TextStats.qualityFacets(tbl(s, dir, "documents"))
        .select("doc_id", "n_chars_m", "n_tokens", "n_bpeish", "n_punct",
          "n_stop", "quality_bucket")
        .orderBy("doc_id")),

    // End-to-end SQL surface: the SAME kernels, driven entirely
    // through `spark.sql` over a registered view and the graft_*
    // function registry (GraftExtensions) — proving a SQL-only user
    // gets oracle-exact results from the session-extension path, not
    // just the Column API.
    "x_sql_surface" -> ((s, dir) => {
      graft.plans.GraftExtensions.register(s)
      tbl(s, dir, "documents").createOrReplaceTempView("graft_documents")
      s.sql(
        """SELECT doc_id, qc.n_tokens AS n_tokens, qc.n_bpeish AS n_bpeish,
          |       qc.n_punct AS n_punct, qc.n_stop AS n_stop,
          |       CAST(size(graft_cdc_chunks(text, 8)) AS BIGINT) AS n_chunks
          |FROM (SELECT doc_id, text, graft_quality_counts(text) AS qc
          |      FROM graft_documents)
          |ORDER BY doc_id""".stripMargin)
    }),

    "x_langid" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextStats.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    // Document-frequency spectrum: how many vocabulary terms appear in
    // exactly k documents — the diagnostic behind df-based filtering
    // thresholds (stopword cutoffs, rare-term floors), completing the
    // Heaps/Zipf/hapax family. Two narrow-key aggregations, both
    // map-side combinable.
    "x_df_spectrum" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), explode(TextStats.tokens(col("text"))).as("term"))
        .distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
        .groupBy("df").agg(count(lit(1)).as("n_terms"))
        .orderBy("df")),

    // Trigram-model language ID (CCNet/fastText lineage): per-language
    // char-trigram profiles trained on the labeled even-id half, every
    // doc scored by Laplace-smoothed log-prob argmax — odd docs are the
    // held-out half (LangIdSpec pins accuracy >= the marker heuristic).
    // PROBE-ONLY serving path: the profile trains ONCE into a
    // _SUCCESS-guarded warehouse table (ensureLangIdProfile — counts
    // are exact longs, so persisted scoring is bit-identical to
    // training inline and the oracle is unchanged); the query plan has
    // no train-side explode (ScaleSpec-pinned).
    "x_langid_trigram" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val profile = TextStats.ensureLangIdProfile(s,
        whName("langid_prof", s"$dir|even|${LangIdLangs.mkString(",")}"),
        LangIdLangs) {
        TextStats.langIdProfile(d.where(col("doc_id") % 2 === 0), LangIdLangs)
      }
      // fused serving form: per-gram contributions precomputed from the
      // persisted profile (bit-identical to scoreLangId — spec-pinned),
      // scored by a one-pass kernel with no explode/join/rollup
      TextStats.scoreLangIdFused(d, profile, LangIdLangs)
        .orderBy("doc_id")
    }),

    // Language-ID confidence margin: best − second-best grid log-prob
    // per doc (exact long subtraction off the same fused score
    // struct) — small margins mark the ambiguous-language docs a
    // curation pass routes to review; und rows carry NULL.
    "x_langid_margin" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val profile = TextStats.ensureLangIdProfile(s,
        whName("langid_prof", s"$dir|even|${LangIdLangs.mkString(",")}"),
        LangIdLangs) {
        TextStats.langIdProfile(d.where(col("doc_id") % 2 === 0), LangIdLangs)
      }
      TextStats.scoreLangIdMargin(d, profile, LangIdLangs)
        .orderBy("doc_id")
    }),

    "x_fingerprint" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // Normalization-aware exact dedup: group on the whitespace-
    // insensitive rolling fingerprint instead of the raw digest —
    // catches the copy that differs only in spacing/line-wrapping
    // (the most common mirror artifact), same narrow-key groupBy
    // shape as x_dedup_exact with an 8-byte key.
    "x_dedup_normalized" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(TextStats.fingerprint(col("text")).as("fp"), col("doc_id"))
        .groupBy("fp")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("fp")),

    // Cross-source score calibration: raw per-doc scores (n_chars
    // here) replaced by their within-source percent-rank — the
    // rank-normalization that makes quality scores comparable ACROSS
    // sources before a global budget selection (a verbose source's
    // raw scores would otherwise swamp a terse one's). percent_rank
    // windows are source-partitioned (parallel; never a global sort);
    // ties share a rank in both engines.
    "x_quality_calibrate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("pct",
          percent_rank().over(Window.partitionBy("source")
            .orderBy("n_chars")))
        .orderBy("doc_id")
    }),

    // Percentile-clipped length screen: per-language p5/p95 token-count
    // cuts (exact interpolated percentile — a bounded |langs|-row
    // frame, broadcast back), docs outside flagged short/long — the
    // truncation/outlier filter most curation recipes run before
    // quality scoring.
    "x_length_outliers" -> ((s, dir) => {
      val t = tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextStats.tokenCount(col("text")).cast("long").as("n_tokens"))
      val cuts = t.groupBy("lang").agg(
        expr("percentile(n_tokens, 0.05)").as("lo"),
        expr("percentile(n_tokens, 0.95)").as("hi"))
      t.join(broadcast(cuts), "lang")
        .where(col("n_tokens") < col("lo") || col("n_tokens") > col("hi"))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("lo"),
          col("hi"),
          when(col("n_tokens") < col("lo"), "short").otherwise("long")
            .as("flag"))
        .orderBy("doc_id")
    }),

    // Corpus-wide bigram heavy hitters: map-side-combinable hash agg
    // over the exploded grams, then TakeOrdered (never a global sort)
    // with a full tie-break so the top-k set is deterministic.
    // Grams come from arrays_zip of two shifted slices — plain
    // expressions, NOT a higher-order `transform` (HOF lambdas are
    // interpreted per element; the zip form stays codegen-friendly and
    // builds each gram string once, post-explode).
    "x_ngram_topk" -> ((s, dir) => {
      val toks = TextStats.tokens(col("text"))
      val n1 = greatest(size(toks) - 1, lit(0))
      tbl(s, dir, "documents")
        .select(explode(arrays_zip(
          slice(toks, lit(1), n1).as("a"), slice(toks, lit(2), n1).as("b"))).as("z"))
        .select(concat_ws(" ", col("z.a"), col("z.b")).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram")).limit(50)
    }),

    // Vocabulary statistics via two-level aggregation: per-token counts
    // (one shuffle on the token), then a scalar rollup — total tokens,
    // vocabulary size, and hapax legomena (frequency-1 tokens).
    "x_vocab_stats" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(explode(TextStats.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .agg(sum("n").as("n_tokens"), count(lit(1)).as("n_vocab"),
          sum(when(col("n") === 1, 1).otherwise(0)).as("n_hapax"))),

    // Gopher rules (Rae et al. A1.1): the published pretraining filter
    // suite as exact per-doc facets + composite verdict. The stopword
    // list is the corpus's actual function-word inventory (see
    // GopherQueryStopwords) so the ">= 2 kinds" rule discriminates.
    "x_gopher_rules" -> ((s, dir) =>
      TextStats.gopherRules(tbl(s, dir, "documents"),
        stopwords = GopherQueryStopwords).orderBy("doc_id")),

    // Scorer agreement (Cohen's kappa): the heuristic quality bucket
    // vs the Gopher gate as two weak labelers over the same corpus —
    // the labeler-audit step before trusting either as a filter.
    // Counts are exact longs; kappa is one shared expression tree over
    // them (identical IEEE in both engines), guarded for the
    // degenerate pe=1 case.
    "x_scorer_agreement" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val a = TextStats.qualityFacets(d)
        .select(col("doc_id"), (col("quality_bucket") === "good").as("a"))
      val b = TextStats.gopherRules(d, stopwords = GopherQueryStopwords)
        .select(col("doc_id"), col("passes").as("b"))
      def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
      val agg = a.join(b, "doc_id").agg(
        count(lit(1)).as("n"),
        cnt(col("a") && col("b")).as("n_both"),
        cnt(col("a") && !col("b")).as("n_only_a"),
        cnt(!col("a") && col("b")).as("n_only_b"),
        cnt(!col("a") && !col("b")).as("n_neither"))
      val nD = col("n").cast("double")
      val po = (col("n_both") + col("n_neither")).cast("double") / nD
      val pa = (col("n_both") + col("n_only_a")).cast("double") / nD
      val pb = (col("n_both") + col("n_only_b")).cast("double") / nD
      val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
      agg.select(col("n"), col("n_both"), col("n_only_a"),
        col("n_only_b"), col("n_neither"),
        round(when(lit(1.0) - pe === 0.0, lit(1.0))
          .otherwise((po - pe) / (lit(1.0) - pe)), 6).as("kappa_r"))
    }),

    // Per-source quality report: the Gopher verdicts rolled up with
    // per-rule failure counts — the corpus curation dashboard row.
    "x_quality_report" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
      TextStats.gopherRules(d, stopwords = GopherQueryStopwords)
        .join(d.select("doc_id", "source"), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          cnt(col("passes")).as("n_pass"),
          (cnt(col("passes")).cast("double") /
            count(lit(1)).cast("double")).as("pass_rate"),
          cnt(col("n_words") < 50 || col("n_words") > 100000).as("fail_words"),
          cnt(col("mean_word_len") < 3.0 || col("mean_word_len") > 10.0)
            .as("fail_word_len"),
          cnt(col("symbol_ratio") > 0.1).as("fail_symbol"),
          cnt(col("alpha_frac") < 0.8).as("fail_alpha"),
          cnt(col("n_stop_kinds") < 2).as("fail_stop"),
          cnt(col("top_bigram_frac") > 0.20).as("fail_top2"),
          cnt(col("dup_5gram_frac") > 0.15).as("fail_dup5"))
        .orderBy("source")
    }),

    // Per-document repetition: duplicated-bigram fraction — the standard
    // "repetitive text" pretraining filter signal. Pure projection, no
    // shuffle. Counts avoid materializing gram strings entirely:
    // total bigrams = token count - 1, distinct bigrams = the native
    // one-pass hashed-shingle kernel (2^-64 collision odds, same
    // equivalence the oracle-checked jaccard pipeline relies on).
    "x_repetition" -> ((s, dir) => {
      val toks = TextStats.tokens(col("text"))
      val nb = greatest(size(toks) - 1, lit(0)).cast("long")
      val nd = when(size(toks) < 2, lit(0L))
        .otherwise(size(graft.plans.NativeFunctions.hashedShingles(col("text"), 2)).cast("long"))
      tbl(s, dir, "documents").select(
        col("doc_id"),
        nb.as("n_bigrams"),
        nd.as("n_distinct"),
        when(nb === 0, lit(0.0)).otherwise(
          (nb - nd).cast("double") / nb.cast("double")).as("rep_ratio"))
        .orderBy("doc_id")
    }),

    // Cluster resolution over the (oracle-checked) jaccard pair graph:
    // every doc in a pair component mapped to its min-id representative.
    "x_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(parallel(tbl(s, dir, "documents")), minJaccard = 0.05)
      Dedup.duplicateClusters(pairs).orderBy("id")
    }),

    // Cluster-size histogram over the same resolved clusters — the
    // dedup run report. PROBE-ONLY serving path: the cluster pipeline
    // is resolved once into a _SUCCESS-guarded warehouse table
    // (Dedup.ensureClusters — the x_sim_ivf_probe pattern) and the
    // report is two cheap aggregations over the persisted frame; no
    // LSH/verify/pointer-doubling in the probe plan (ScaleSpec-pinned).
    // Identical output to resolving inline, so the oracle is unchanged.
    "x_dedup_sizes" -> ((s, dir) => {
      Dedup.ensureClusters(s, jaccardClustersTableName(dir)) {
        Dedup.duplicateClusters(
          Dedup.ngramJaccardPairs(tbl(s, dir, "documents"), minJaccard = 0.05))
      }
        .groupBy("rep").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
        .select(col("sz").as("cluster_size"), col("n_clusters"))
        .orderBy("cluster_size")
    }),

    // Apply the dedup decision: non-representative cluster members
    // dropped via one anti-join — the deduplicated corpus itself.
    // PROBE-ONLY like x_dedup_sizes: the full LSH → verify → cluster
    // pipeline persists once (first caller builds), the apply query
    // is a scan + anti-join against the persisted cluster table.
    "x_dedup_apply" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val clusters = Dedup.ensureClusters(s, neardupClustersTableName(dir)) {
        Dedup.nearDuplicates(docs, minJaccard = 0.3)
      }
      Dedup.applyDedup(docs, clusters)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    // The END-TO-END DATA RECIPE — the flagship integration proof: one
    // composed DataFrame job chaining quality filter → near-dup apply →
    // verbatim decontamination → mixture rebalance → sequence packing,
    // each stage the SAME operator its standalone query oracle-checks
    // (see ext/Recipe.scala). Every 50th doc plays the held-out
    // benchmark; the rest are the corpus being built.
    "x_recipe_e2e" -> ((s, dir) => {
      val d = parallel(tbl(s, dir, "documents"))
      graft.ext.Recipe.run(
        d.where(col("doc_id") % 50 =!= 0),
        d.where(col("doc_id") % 50 === 0),
        MixWeights, Seed, TextStats.bpeishTokenCount(col("text")),
        buckets = 64)
        .orderBy("ord")
    }),

    // Curation funnel: the stage-by-stage survivor counts of
    // x_curate_e2e — the ops dashboard row for a refresh run (how
    // much did dedup eat, how much did the leak gate eat).
    "x_curate_funnel" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val docs = d.where(col("doc_id") % 50 =!= 0)
      val bench = d.where(col("doc_id") % 50 === 0)
      val winners = Dedup.exactKeepBest(docs, length(col("text")).cast("long"))
      // checkpointed: feeds its own count, the window kernel, AND the
      // anti-join left (the Recipe stage-boundary rationale)
      val deduped = docs.join(winners.select(col("keep_id").as("doc_id")),
        Seq("doc_id"), "left_semi").localCheckpoint()
      val clean = deduped.join(
        Corpus.decontaminateBloom(deduped, bench).select("doc_id"),
        Seq("doc_id"), "left_anti")
      docs.agg(count(lit(1)).as("n_input"))
        .crossJoin(broadcast(deduped.agg(count(lit(1)).as("n_deduped"))))
        .crossJoin(broadcast(clean.agg(count(lit(1)).as("n_clean"))))
        .select(col("n_input"), col("n_deduped"), col("n_clean"),
          (col("n_input") - col("n_deduped")).as("n_dropped_dup"),
          (col("n_deduped") - col("n_clean")).as("n_dropped_leak"))
    }),

    // The CURATION recipe — the release-refresh companion: keep-best
    // exact dedup → Bloom-gated decontamination → curriculum training
    // manifest, one composed job over the continuation operators
    // (ext/Recipe.curate), same benchmark split as x_recipe_e2e.
    "x_curate_e2e" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      graft.ext.Recipe.curate(
        d.where(col("doc_id") % 50 =!= 0),
        d.where(col("doc_id") % 50 === 0),
        nShards = 8, seed = Seed)
        .orderBy("doc_id")
    }),

    "x_sim_bruteforce" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.bruteForceTopK(emb, queries, k = AnnK)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("score"), 6).as("score_r"))
        .orderBy("query_id", "rank")
    }),

    // Hard-negative mining: top-5 most-similar WRONG-label vectors per
    // query — the contrastive-training batch next to x_sim_bruteforce's
    // positives; label filter inside the broadcast join, bounded TopK
    // aggregation (never a corpus window).
    "x_hard_negatives" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"), col("label"))
      Similarity.hardNegatives(emb, queries, k = AnnK)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("score"), 6).as("score_r"))
        .orderBy("query_id", "rank")
    }),

    // MinHash-LSH candidate pairs — exact-oracle checked: the md5 gram
    // key, affine permutations, and band buckets all replay in DuckDB
    // with the same injected coefficients (Dedup.minhashCoefs).
    "x_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(tbl(s, dir, "documents")).orderBy("a", "b")),

    // Edit-distance-verified near-dup pairs: the LSH candidate set
    // re-checked by BOUNDED levenshtein (threshold variant → banded
    // O(len·maxDist) DP per pair, never O(len²)). DuckDB's unbounded
    // levenshtein + dist filter replays the identical pair set.
    "x_edit_pairs" -> ((s, dir) =>
      Dedup.editDistancePairs(tbl(s, dir, "documents"), maxDist = 20)
        .orderBy("a", "b")),

    // MinHash estimator calibration: per candidate pair, the
    // signature-estimated Jaccard vs the exact one and the signed
    // error — is 32 hashes enough at the operating threshold?
    "x_minhash_est" -> ((s, dir) =>
      Dedup.minhashEstimates(tbl(s, dir, "documents"))
        .select(col("a"), col("b"), col("n_match"),
          round(col("jacc_est"), 6).as("est_r"),
          round(col("jaccard"), 6).as("jacc_r"),
          round(col("jacc_est") - col("jaccard"), 6).as("err_r"))
        .orderBy("a", "b")),

    // Corpus-level segment dedup (C4's duplicated-line rule on
    // 4-token segments): keep each segment's corpus-wide first
    // instance, rebuild per-doc text from survivors. Exact-dup docs
    // collapse to '' — the oracle replays the same first-occurrence
    // window over the segment strings.
    "x_segment_dedup" -> ((s, dir) =>
      Corpus.segmentDedup(tbl(s, dir, "documents"), segTokens = 4)
        .orderBy("doc_id")),

    // Source-level boilerplate report (C4's repeated-line rule):
    // segments held by ≥5% of a source's docs — linear segment
    // aggregation, no pair term, the cheap pre-pass before scrubbing.
    "x_boilerplate" -> ((s, dir) =>
      Corpus.boilerplateSegments(tbl(s, dir, "documents"), segTokens = 4,
        minFrac = 0.05).orderBy("source", "segment")),

    // ... and the scrub: rebuild docs with every occurrence of their
    // source's boilerplate removed (broadcast flag table, sorted
    // rebuild — segmentDedup's aggregation shape).
    "x_boilerplate_scrub" -> ((s, dir) =>
      Corpus.boilerplateScrub(tbl(s, dir, "documents"), segTokens = 4,
        minFrac = 0.05).orderBy("doc_id")),

    // Full composed pipeline: LSH candidates → exact-jaccard verify →
    // cluster resolution. The oracle compares the exact transitive
    // closure at the verify threshold (valid while LSH recall is 1.0 —
    // and the candidate set itself is now pinned by the x_minhash_pairs
    // exact oracle, so a recall drop shows up there first).
    "x_neardup_text" -> ((s, dir) =>
      Dedup.nearDuplicates(tbl(s, dir, "documents"), minJaccard = 0.3)
        .orderBy("id")),

    // SimHash near-dup pairs — exact-oracle checked (60-bit md5-vote
    // signature + 15-bit chunk banding replays in DuckDB).
    "x_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(tbl(s, dir, "documents")).orderBy("a", "b")),

    // Token-stutter removal: the intra-document repetition cleaner
    // (drop tokens equal to their predecessor, rebuild the text) —
    // a TRANSFORM, so the oracle compares the rebuilt text itself.
    "x_squeeze_repeats" -> ((s, dir) =>
      TextStats.squeezeRepeats(tbl(s, dir, "documents")).orderBy("doc_id")),

    // Winnowing (MOSS) fingerprints — md5-keyed gram hashes, sliding
    // min-window selection; the SELECTED hash set replays exactly in
    // DuckDB (same md5-prefix key both sides).
    "x_winnow" -> ((s, dir) =>
      Dedup.winnowFingerprints(tbl(s, dir, "documents"))
        .orderBy("doc_id", "fp")),

    // ... and the fingerprint-sharing candidate pairs over the same
    // selection (shared winnowCtes oracle — pair set can't drift from
    // the fingerprint set).
    "x_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowPairs(tbl(s, dir, "documents"), minShared = 2L)
        .orderBy("a", "b")),

    // Content-defined chunking (FastCDC family over word tokens):
    // md5-key boundary tokens, so an identical token run chunks
    // identically at ANY offset — the shift-resistant segmentation
    // fixed-stride chunking lacks. One codegen'd projection + one
    // narrow Generate; the boundary family replays exactly in DuckDB.
    "x_cdc_chunks" -> ((s, dir) =>
      Dedup.cdcChunks(tbl(s, dir, "documents"))
        .orderBy("doc_id", "chunk_idx")),

    // ... the cross-document duplicated-chunk report over the same
    // chunking (≥4-token chunks in ≥2 docs — the boilerplate map).
    "x_cdc_dups" -> ((s, dir) =>
      Dedup.cdcDuplicateChunks(tbl(s, dir, "documents"))
        .orderBy("chunk_text")),

    // ... and duplicated-span scrubbing: every non-canonical occurrence
    // of a cross-document duplicated chunk drops; the min-id holder
    // keeps its copy (CCNet's duplicated-paragraph removal, for
    // corpora without line structure).
    "x_cdc_scrub" -> ((s, dir) =>
      Dedup.cdcScrub(tbl(s, dir, "documents"))
        .orderBy("doc_id")),

    // ... and chunk-level decontamination over the SAME chunking: a
    // benchmark doc (the % 50 split, as x_decontaminate) is dirty when
    // any ≥4-token chunk appears verbatim in the training corpus —
    // the coarse leak signal at ~1/8 of the window-index size.
    "x_cdc_decontaminate" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      Dedup.cdcContamination(
        d.where(col("doc_id") % 50 === 0),
        d.where(col("doc_id") % 50 =!= 0))
        .orderBy("doc_id")
    }),

    // Multinomial Naive Bayes source classifier (the fastText-adjacent
    // curation classifier): trained on the even-id half, every doc
    // scored under every label on the 1e-9 grid — the argmax is
    // decided by exact long compares, ties to the smallest label.
    // Served by the fused lookup kernel (train once per call, scoring
    // is a single projection — the scoreLangIdFused posture; ExtSpec
    // pins kernel ≡ DataFrame formulation).
    // Trainable classifier: full-batch logistic regression on hashed
    // BoW counts + bias, 20 grid-exact GD steps from w=0, DISTILLING
    // the heuristic quality labeler into a linear model (the
    // fastText-style "train a fast classifier to imitate an expensive
    // labeler" production pattern; 92.8% train accuracy vs the 86.2%
    // majority baseline at sf0.01). The learned weights are
    // BIT-IDENTICAL in both engines (integer z/gradient sums; σ and
    // the step are single shared-shape double expressions). The
    // oracle re-trains from scratch in SQL.
    "x_logreg_weights" -> ((s, dir) => {
      val w9 = trainedLogreg(s, dir)
      import s.implicits._
      w9.zipWithIndex.map { case (w, dm) => (dm.toLong, w) }.toSeq
        .toDF("dim", "w9").orderBy("dim")
    }),

    // ... and the classifier applied: integer-exact margin z9 per doc
    // under the trained weights, thresholded at 0, next to the
    // distilled label — train accuracy is one rollup away, every
    // column exact.
    "x_logreg_predict" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val w9 = trainedLogreg(s, dir)
      val wArr = array(w9.map(lit): _*)
      val z = TextStats.logisticFeatures(d, LogRegDims)
        .withColumn("__w9", element_at(wArr, col("dim").cast("int") + 1))
        .groupBy("doc_id").agg(sum(col("__w9") * col("c")).as("z9"))
      TextStats.qualityFacets(d)
        .select(col("doc_id"),
          (col("quality_bucket") === "good").cast("int").as("y"))
        .join(z, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("z9"), lit(0L)).as("z9"),
          (coalesce(col("z9"), lit(0L)) > 0L).cast("int").as("pred"),
          col("y"))
        .orderBy("doc_id")
    }),

    // Calibration curve of the trained classifier: equal-frequency
    // margin bins over (z9, doc_id) — SQL-ntile semantics, but
    // computed from Corpus.globalRank + ntileFromRank so NO
    // single-partition window ever sees the scored frame (the
    // previous `ntile(10) OVER (ORDER BY …)` formulation planned
    // exactly that — the one corpus-sized unpartitioned window the
    // catalog had). The oracle keeps the plain ntile spelling; the
    // hash match pins the decomposition to it.
    "x_logreg_calibration" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val w9 = trainedLogreg(s, dir)
      val wArr = array(w9.map(lit): _*)
      val z = TextStats.logisticFeatures(d, LogRegDims)
        .withColumn("__w9", element_at(wArr, col("dim").cast("int") + 1))
        .groupBy("doc_id").agg(sum(col("__w9") * col("c")).as("z9"))
      val scored = TextStats.qualityFacets(d)
        .select(col("doc_id"),
          (col("quality_bucket") === "good").cast("long").as("y"))
        .join(z, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("z9"), lit(0L)).as("z9"), col("y"))
      val nDf = scored.groupBy().agg(count(lit(1)).as("__n"))
      Corpus.globalRank(scored, Seq(col("z9"), col("doc_id")), "__rk")
        .crossJoin(broadcast(nDf)) // sanctioned broadcast-scalar join
        .withColumn("bin",
          Corpus.ntileFromRank(col("__rk"), col("__n"), 10))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("y").as("n_good"),
          min("z9").as("z9_lo"), max("z9").as("z9_hi"))
        .withColumn("frac_good", col("n_good").cast("double") / col("n"))
        .orderBy("bin")
    }),

    "x_nb_classify" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      TextStats.naiveBayesFused(d, d.where(col("doc_id") % 2 === 0))
        .orderBy("doc_id")
    }),

    // ... and its per-label confusion rollup (shared builder with
    // x_nb_classify — the accuracy report cannot drift from the
    // per-doc predictions).
    "x_nb_accuracy" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      TextStats.naiveBayesFused(d, d.where(col("doc_id") % 2 === 0))
        .groupBy("actual")
        .agg(count(lit(1)).as("n_docs"),
          sum("correct").as("n_correct"))
        .orderBy("actual")
    }),

    // NB confidence margin: best − runner-up grid log-prob per doc
    // (exact long subtraction off the same fused prediction struct) —
    // the reject-option knob: small-margin docs go to review instead
    // of trusting the argmax.
    "x_nb_margin" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      TextStats.naiveBayesMargin(d, d.where(col("doc_id") % 2 === 0))
        .orderBy("doc_id")
    }),

    // Confusion matrix of the NB classifier — the (actual, predicted)
    // cell counts behind x_nb_accuracy; all-integer, one extra
    // |labels|²-bounded groupBy over the shared per-doc predictions.
    "x_nb_confusion" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      TextStats.naiveBayesFused(d, d.where(col("doc_id") % 2 === 0))
        .groupBy("actual", "predicted")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("actual", "predicted")
    }),

    // ... and per-label precision/recall/F1 from the same cells — the
    // report a curation-classifier eval actually reads. Marginals are
    // exact longs; the three ratios are the only doubles (fixed op
    // order, replayed identically by the oracle). A label that is
    // never predicted gets precision 0 by convention.
    "x_nb_prf" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val cells = TextStats.naiveBayesFused(d, d.where(col("doc_id") % 2 === 0))
        .groupBy("actual", "predicted")
        .agg(count(lit(1)).as("n"))
      val byActual = cells.groupBy("actual")
        .agg(sum("n").as("n_actual"),
          sum(when(col("actual") === col("predicted"), col("n"))
            .otherwise(0L)).as("tp"))
      val byPred = cells.groupBy("predicted")
        .agg(sum("n").as("n_pred"))
      val j = byActual.join(byPred, col("actual") === col("predicted"), "left")
        .select(col("actual").as("label"), col("n_actual"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"), col("tp"))
      val p = when(col("n_pred") === 0L, lit(0.0))
        .otherwise(col("tp").cast("double") / col("n_pred").cast("double"))
      val r = when(col("n_actual") === 0L, lit(0.0))
        .otherwise(col("tp").cast("double") / col("n_actual").cast("double"))
      j.withColumn("prec", p).withColumn("rec", r)
        .withColumn("f1",
          when(col("prec") + col("rec") === 0.0, lit(0.0))
            .otherwise(lit(2.0) * col("prec") * col("rec") /
              (col("prec") + col("rec"))))
        .orderBy("label")
    }),

    // ... and the HASHED-vocabulary variant (fastText's bucket trick,
    // 64 md5 buckets): the serving table is dims × labels longs BY
    // CONSTRUCTION — the posture for web-scale vocabularies where the
    // exact table is unbounded. Same grid NB semantics over bucket ids.
    "x_nb_hashed" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      TextStats.naiveBayesFused(d, d.where(col("doc_id") % 2 === 0),
          hashDims = 64)
        .orderBy("doc_id")
    }),

    // Feature-hashing vectorizer summary — 64-bucket hashing-trick
    // count vectors summarized (nnz, ‖v‖², max, argmax) in ONE fused
    // projection; all-integer, so the whole row is oracle-exact.
    "x_hash_features" -> ((s, dir) =>
      TextStats.hashFeatures(tbl(s, dir, "documents"))
        .orderBy("doc_id")),

    // Corpus card: the one-row dataset summary every release ships —
    // size, vocabulary, exact-dup mass, language/source spread, and
    // the quality-bucket split, composed from the already-proven
    // facets in three bounded aggregates.
    "x_corpus_card" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val base = TextStats.qualityFacets(d).agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_chars_m").as("n_chars"),
        countDistinct("lang").as("n_langs"),
        countDistinct("source").as("n_sources"),
        sum(when(col("quality_bucket") === "good", 1L).otherwise(0L)).as("n_good"),
        sum(when(col("quality_bucket") === "fair", 1L).otherwise(0L)).as("n_fair"),
        sum(when(col("quality_bucket") === "poor", 1L).otherwise(0L)).as("n_poor"))
      val vocab = d.select(explode(TextStats.tokens(col("text"))).as("t"))
        .agg(countDistinct("t").as("n_vocab"))
      val dups = d.agg(
        (count(lit(1)) - countDistinct(col("text"))).as("n_dup_docs"))
      base.crossJoin(broadcast(vocab)).crossJoin(broadcast(dups))
        .withColumn("mean_doc_tokens", col("n_tokens") / col("n_docs"))
    }),

    // Per-source dataset cards: the x_corpus_card facets grouped by
    // source — the release-notes table for a multi-source corpus
    // (size, token mass, language spread, exact-dup mass, quality
    // split per provider), one map-side-combinable aggregate.
    "x_source_cards" -> ((s, dir) =>
      TextStats.qualityFacets(tbl(s, dir, "documents"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("n_tokens"),
          countDistinct("lang").as("n_langs"),
          (count(lit(1)) - countDistinct(col("text"))).as("n_dup_docs"),
          sum(when(col("quality_bucket") === "good", 1L).otherwise(0L))
            .as("n_good"))
        .withColumn("mean_doc_tokens", col("n_tokens") / col("n_docs"))
        .orderBy("source")),

    // nDCG@10 of BM25 retrieval against term-overlap relevance — the
    // ranking-eval half of retrieval-based curation; per-position
    // gains on the 1e-9 grid, both orderings deterministically
    // tie-broken.
    "x_ndcg" -> ((s, dir) =>
      TextStats.ndcgAtK(tbl(s, dir, "documents"), NdcgQueries)
        .orderBy("query_id")),

    // MRR companion over the SAME candidate frame (shared builder —
    // the two retrieval metrics cannot drift): rank of the first
    // all-terms match per query, reciprocal on the grid.
    "x_mrr" -> ((s, dir) =>
      TextStats.mrrOf(tbl(s, dir, "documents"), NdcgQueries)
        .orderBy("query_id")),

    // ... and recall@10 (coverage leg): how many of the all-terms
    // matches the BM25 top-10 retrieves, same frame, same ordering.
    "x_recall_at_k" -> ((s, dir) =>
      TextStats.recallAtK(tbl(s, dir, "documents"), NdcgQueries)
        .orderBy("query_id")),

    // ... and average precision@10 (the ranking-of-ALL-hits leg whose
    // mean over queries is MAP), same frame, same ordering; per-rank
    // precisions are exact longs on the 1e-9 grid so the sum is
    // order-free across partitions.
    "x_map" -> ((s, dir) =>
      TextStats.apAtK(tbl(s, dir, "documents"), NdcgQueries)
        .orderBy("query_id")),

    // Reciprocal-rank fusion of the BM25 and term-coverage orderings
    // over the shared candidate frame — ranker combination without
    // score calibration, fused on the integer grid.
    "x_rrf" -> ((s, dir) =>
      TextStats.rrfOf(tbl(s, dir, "documents"), NdcgQueries)
        .orderBy("query_id", "rank")),

    // MATTR lexical diversity — windowed type-token ratio (the
    // length-robust repetitiveness score): a single shuffle-free
    // codegen projection per document, integer window-distinct sums,
    // one double division at the end.
    "x_mattr" -> ((s, dir) =>
      TextStats.mattr(tbl(s, dir, "documents"), window = 50)
        .orderBy("doc_id")),

    // Weighted reservoir (A-ES): EXACTLY 100 docs sampled with
    // probability proportional to quality weight — the budgeted
    // companion to x_weighted_sample's Bernoulli keep; plans as a
    // TakeOrdered top-k on the grid-quantized A-ES key, never a full
    // sort.
    "x_weighted_reservoir" -> ((s, dir) => {
      val q = TextStats.qualityFacets(tbl(s, dir, "documents"))
        .select(col("doc_id"), col("quality_bucket"))
      val w = when(col("quality_bucket") === "good", lit(1.0))
        .when(col("quality_bucket") === "fair", lit(0.5))
        .otherwise(lit(0.1))
      Corpus.weightedReservoir(q, w, k = 100, seed = Seed)
        .orderBy("doc_id")
    }),

    // LSH bucket-occupancy histogram — the pre-flight report for the
    // round-11 bucket caps: how corpus mass distributes over band
    // buckets BEFORE paying the pair join (bucket_size → n_buckets).
    "x_lsh_occupancy" -> ((s, dir) =>
      Dedup.minhashBucketStats(tbl(s, dir, "documents"))
        .groupBy("n").agg(count(lit(1)).as("n_buckets"))
        .select(col("n").as("bucket_size"), col("n_buckets"))
        .orderBy("bucket_size")),

    // Budget-selection band occupancy — the selectToBudget skew
    // pre-flight over the SAME DSIR priority x_budget_select ranks by
    // (shared dsir/banded CTEs, so report and selection can't drift).
    "x_band_occupancy" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val raw = d.where(col("lang") =!= "en")
      val lr9 = Corpus.dsirRatioTable(raw, d.where(col("lang") === "en")).toSeq
      val base = raw.select(col("doc_id"),
          graft.plans.NativeFunctions.dsirScore(col("text"), lr9).as("__sc"),
          TextStats.bpeishTokenCount(col("text")).as("__n"))
        .select(col("doc_id"), col("__sc.n_feats").as("__nf"),
          col("__sc.s9").as("__p9"), col("__n"))
        .where(col("__nf") > 0)
      Corpus.bandOccupancy(base, col("__p9"), col("__n"),
          bandWidth = 1000000000L)
        .orderBy("band")
    }),

    // Embedding-space outliers: bottom-3 per k-means cell by cosine to
    // the own centroid — the data-quality sweep before ANN/SemDeDup
    // decisions; shares the IVF k-means replay (ivfAssignCtes).
    "x_embedding_outliers" -> ((s, dir) =>
      Similarity.cellOutliers(tbl(s, dir, "embeddings"), k = 3)
        .select(col("vec_id"), col("cid"), col("rank"),
          round(col("cos_centroid"), 6).as("cos_r"))
        .orderBy("cid", "rank")),

    // Threshold tuned to the synthetic corpus (random vectors: max
    // pairwise cosine ≈ 0.51) so the candidate-verify path yields rows.
    // Oracle-checked despite the LSH step: the hyperplanes are
    // plan-time literals from a seeded generator, so the SAME constants
    // are injected into the DuckDB oracle SQL (see neardupEmbeddingSql)
    // — bucket assignment and exact-cosine verify replay identically.
    "x_neardup_embedding" -> ((s, dir) =>
      Dedup.embeddingNearDups(tbl(s, dir, "embeddings"), threshold = 0.35,
        planes = 4)
        .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine_r"))
        .orderBy("a", "b")),

    // Cross-lingual pair mining (bitext-mining shape): embedding
    // pairs above threshold whose documents carry DIFFERENT language
    // tags — the doc table joins in on the shared id space, the lang
    // filter runs after the bounded pair verify.
    "x_crosslingual_pairs" -> ((s, dir) => {
      val langs = tbl(s, dir, "documents").select(col("doc_id"), col("lang"))
      Similarity.cosinePairs(parallel(tbl(s, dir, "embeddings")), threshold = 0.3)
        .join(langs.select(col("doc_id").as("a"), col("lang").as("lang_a")), "a")
        .join(langs.select(col("doc_id").as("b"), col("lang").as("lang_b")), "b")
        .where(col("lang_a") =!= col("lang_b"))
        .select(col("a"), col("b"), col("lang_a"), col("lang_b"),
          round(col("cosine"), 6).as("cosine_r"))
        .orderBy("a", "b")
    }),

    // Exact all-pairs cosine — the recall baseline for the LSH/IVF
    // paths (see Similarity.cosinePairs scaladoc for the scale
    // contract).
    "x_cosine_pairs" -> ((s, dir) =>
      Similarity.cosinePairs(parallel(tbl(s, dir, "embeddings")), threshold = 0.35)
        .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine_r"))
        .orderBy("a", "b")),

    // Inter-label similarity matrix: nano-grid-exact per-label mean
    // vectors, then all label-pair cosines — the corpus "data map"
    // (which slices cover the same embedding region). Both stages are
    // bounded: |labels|·dims aggregation keys, |labels|² pairs.
    "x_centroid_cosine" -> ((s, dir) => {
      val cents = Similarity.groupCentroids(tbl(s, dir, "embeddings"), "label")
      Similarity.centroidCosines(cents, "label")
        .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine_r"))
        .orderBy("a", "b")
    }),

    // Int8-quantized ANN: recall@5 of brute-force ranking over
    // quantized vectors (native one-pass symmetric quantization;
    // per-vector scales cancel in cosine) against the float baseline —
    // the 4×-bandwidth path, its accuracy itself oracle-checked.
    "x_quantized_recall" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val qc = Similarity.quantizeInt8(emb)
        .select(col("vec_id"), col("qvec").as("embedding"))
      val qq = Similarity.quantizeInt8(queries)
        .select(col("query_id"), col("qvec").as("embedding"))
      val bf = Similarity.bruteForceTopK(emb, queries, k = AnnK)
        .select("query_id", "neighbor_id")
      val qbf = Similarity.bruteForceTopK(qc, qq, k = AnnK)
        .select("query_id", "neighbor_id")
      val hits = bf.join(qbf, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
      queries.select("query_id").join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)) * (100 / AnnK)).as("recall_pct"))
        .orderBy("query_id")
    }),

    // Product-quantization recall@5: codes from per-subspace Lloyd
    // codebooks (the IVF trainer on each 16-dim slice of the
    // normalized corpus), ADC ranking against the float brute-force
    // truth. The classic RAM-resident ANN: m code bytes per vector in
    // the scored frame, never the floats.
    "x_pq_recall" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val cb = Similarity.pqTrain(emb, m = PqM, k = PqK, iters = 3,
        seed = Seed)
      val bf = Similarity.bruteForceTopK(emb, queries, k = AnnK)
        .select("query_id", "neighbor_id")
      val pq = Similarity.pqTopK(emb, queries, cb, kNeighbors = AnnK)
        .select("query_id", "neighbor_id")
      val hits = bf.join(pq, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
      queries.select("query_id").join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)) * (100 / AnnK)).as("recall_pct"))
        .orderBy("query_id")
    }),

    // PQ serving path: build-once persisted codebooks + codes
    // (x_sim_ivf_probe's posture) — the probe plan scans the code
    // table and ranks; no Lloyd, no encode. Same build params ⇒
    // bit-identical to the train-per-query ranking.
    "x_pq_probe" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val name = whName("pq", s"$dir|${emb.schema.toDDL}|$PqM|$PqK|3|$Seed")
      Similarity.ensurePqIndex(emb, name, m = PqM, k = PqK, iters = 3,
        seed = Seed)
      Similarity.pqProbeTopK(s, name, queries, kNeighbors = AnnK)
        .orderBy("query_id", "rank")
    }),

    // ANN quality measurement: recall@5 of the LSH path against the
    // exact brute-force baseline, per query vector — the "did the
    // approximate path actually work" check, itself oracle-checked.
    // JL-projection recall: the 64→16-dim random projection's top-5
    // against the full-dim float baseline — the dimensionality half of
    // embedding compression, measured exactly like the int8 half.
    "x_jl_recall" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val jc = Similarity.jlProject(emb, outDims = JlDims, seed = Seed + 9)
        .select(col("vec_id"), col("jvec").as("embedding"))
      val jq = Similarity.jlProject(queries, outDims = JlDims, seed = Seed + 9)
        .select(col("query_id"), col("jvec").as("embedding"))
      val bf = Similarity.bruteForceTopK(emb, queries, k = AnnK)
        .select("query_id", "neighbor_id")
      val jbf = Similarity.bruteForceTopK(jc, jq, k = AnnK)
        .select("query_id", "neighbor_id")
      val hits = bf.join(jbf, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
      queries.select("query_id").join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)) * (100 / AnnK)).as("recall_pct"))
        .orderBy("query_id")
    }),

    "x_ann_recall" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val bf = Similarity.bruteForceTopK(emb, queries, k = AnnK)
        .select("query_id", "neighbor_id")
      val lsh = Similarity.lshTopK(emb, queries, k = AnnK)
        .select("query_id", "neighbor_id")
      val hits = bf.join(lsh, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
      queries.select("query_id").join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)) * (100 / AnnK)).as("recall_pct"))
        .orderBy("query_id")
    }),

    // Norm statistics over the embedding corpus. The sum is quantized
    // to integer micro-units BEFORE aggregating: long addition is exact
    // and order-independent, and `round(x*1e6)` is the same computation
    // in both engines — unlike a double→DECIMAL(28,12) cast, whose
    // 12th-digit rounding mode differs between engines on ~1/1500
    // full-precision doubles.
    "x_embed_stats" -> ((s, dir) =>
      tbl(s, dir, "embeddings")
        .select(Similarity.norm(col("embedding")).as("nrm"))
        .agg(count(lit(1)).as("n_vecs"),
          round(min("nrm"), 6).as("min_norm"),
          round(max("nrm"), 6).as("max_norm"),
          sum(round(col("nrm") * 1e6).cast("long")).as("sum_norm_u6"))),

    // Oracle-checked like x_neardup_embedding: all 4 hash tables' plane
    // constants are injected into the DuckDB SQL (simLshSql).
    "x_sim_lsh" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.lshTopK(emb, queries, k = AnnK)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("score"), 6).as("score_r"))
        .orderBy("query_id", "rank")
    }),

    // Exact-oracle checked with NO injected constants: the oracle
    // re-derives the same centroids (md5-ranked init, quantized exact
    // means) from the data — see simIvfSql.
    // SemDeDup: same k-means as the IVF index, within-cell cosine
    // neighbors, keep-first-by-id — the semantic layer of the dedup
    // family (exact digest -> MinHash text -> embedding LSH -> this).
    "x_semdedup" -> ((s, dir) =>
      Similarity.semDedup(tbl(s, dir, "embeddings"), threshold = SemDedupTau)
        .orderBy("vec_id")),

    // SemDeDup APPLICATION: keep only the semantic representatives —
    // flag -> apply closed for the embedding layer exactly as
    // x_dedup_apply closes it for text (semi-join on the verdict).
    "x_semdedup_apply" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val verdict = Similarity.semDedup(emb, threshold = SemDedupTau)
      emb.join(verdict.where(col("kept")).select("vec_id"),
          Seq("vec_id"), "left_semi")
        .select("vec_id", "label").orderBy("vec_id")
    }),

    // IVF cell balance: vectors per k-means cell — the skew
    // diagnostic both the ANN probe and SemDeDup pair costs scale by.
    "x_ivf_cells" -> ((s, dir) =>
      Similarity.assignCells(tbl(s, dir, "embeddings"))
        .groupBy("cid").agg(count(lit(1)).as("n_vectors"))
        .orderBy("cid")),

    // Cluster-quality (inertia) report under the same k-means: per
    // cell Σ‖v−c‖² on the 1e-9 grid — the elbow metric read before
    // sizing nCentroids for semDedup / IVF probing.
    "x_kmeans_inertia" -> ((s, dir) =>
      Similarity.clusterInertia(tbl(s, dir, "embeddings"))
        .orderBy("cid")),

    // Per-dimension whitening stats: mean/variance/min/max per
    // coordinate from grid-quantized decimal sums — the embedding
    // normalization pre-flight.
    "x_embed_dim_stats" -> ((s, dir) =>
      Similarity.dimStats(tbl(s, dir, "embeddings"))
        .orderBy("dim")),

    // Near-dup hub report: per-document degree in the LSH candidate
    // pair graph — template/boilerplate hubs surface as high-degree
    // nodes; a bounded rollup of the SAME pair set as x_minhash_pairs.
    "x_neardup_degree" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(tbl(s, dir, "documents"))
      pairs.select(col("a").as("doc_id"))
        .unionAll(pairs.select(col("b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
        .orderBy("doc_id")
    }),

    "x_sim_ivf" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.ivfTopK(emb, queries, k = AnnK).orderBy("query_id", "rank")
    }),

    // IVF SERVING path: the index (centroids + cid-partitioned
    // assignments) is built once into _SUCCESS-guarded warehouse
    // tables and re-attached across sessions (the q_bucketed_join
    // pattern); the query itself only probes — no k-means in its plan
    // (ScaleSpec-pinned). Bit-identical ranking to x_sim_ivf, so it
    // shares that oracle.
    "x_sim_ivf_probe" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val name = "ivf_" + (scala.util.hashing.MurmurHash3.stringHash(
        s"$dir|${emb.schema.toDDL}|16|3|42") & 0x7fffffff)
      Similarity.ensureIvfIndex(emb, name)
      Similarity.ivfProbeTopK(s, name, queries, k = AnnK)
        .orderBy("query_id", "rank")
    }),

    "x_media_meta" -> ((s, dir) =>
      Multimodal.withMeta(Multimodal.asMediaFrame(tbl(s, dir, "documents")))
        .select(col("media_id"), col("kind"), col("meta.width"),
          col("meta.height"), col("meta.duration_s"), col("meta.n_bytes"),
          col("meta.sample_rate"), col("meta.channels"))
        .orderBy("media_id")),

    // frame_payload is BINARY; the driver's pandas compare cannot sort a
    // bytearray column, so the dump carries lower(hex(..)) — same rule as
    // the x_media_features scalar-columns note below.
    "x_media_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.withMeta(Multimodal.asMediaFrame(tbl(s, dir, "documents"))), 60)
        .select(col("media_id"), col("frame_ts"),
          lower(hex(col("frame_payload"))).as("frame_hex"))
        .orderBy("media_id", "frame_ts")),

    // Dumped in long form (media_id, dim, feature_val): the driver's
    // compare sorts rows with pandas, which cannot sort an
    // array<double> column — scalar columns keep the dump canonical.
    "x_media_features" -> ((s, dir) =>
      Multimodal.features(Multimodal.asMediaFrame(tbl(s, dir, "documents")))
        .select(col("media_id"), posexplode(col("feature")).as(Seq("dim", "feature_val")))
        .orderBy("media_id", "dim")),

    "x_media_decode" -> ((s, dir) =>
      Multimodal.decodeBatched(Multimodal.asMediaFrame(tbl(s, dir, "documents")))
        .toDF().orderBy("media_id")),

    // PII/credential scan over a deterministic mixed corpus (planted
    // positives + clean rows), constructed identically in the oracle —
    // the cross-engine check of the detector regex semantics.
    "x_pii_scan" -> ((s, dir) =>
      PiiScan.scan(piiCorpus(parallel(tbl(s, dir, "customer"))), "txt")
        .drop("txt").orderBy("c_custkey")),

    // Redaction (the scanner's write path): the same planted corpus
    // with every detector match replaced — the text a pipeline would
    // actually publish/train on after the scan.
    "x_pii_redact" -> ((s, dir) =>
      PiiScan.redact(piiCorpus(parallel(tbl(s, dir, "customer"))), "txt")
        .select(col("c_custkey"), col("redacted"))
        .orderBy("c_custkey")),

    // Roundtrip: the engine's own fake sensitive-data corpus (SURVEY
    // §2.5 providers) fed through the scanner — every planted secret
    // class must be detected (rows-only: corpus content is seeded-RNG;
    // per-provider hit guarantees pinned in PiiSpec).
    "x_pii_roundtrip" -> ((s, _) => {
      val bp = BlueprintParser.parse(
        """{"generators":[{"id":"tsa","shape":"constant","config":{"num_points":60,"constant":3}}],
          | "targets":[{"type":"s3","action":"put","generators":["tsa"],
          |   "fake_types":["itin","aws_creds","slack_creds","github_creds","facebook_creds",
          |                 "cve","iban","ssn","email","phone_number","credit_card_full","rsa","profile"],
          |   "fake_counts":2}]}""".stripMargin)
      val series = Engine.materialize(s, bp, Seed)
      val corpus = Sinks.fakeObjects(Dispatch.routeToTarget(series, bp.targets.head),
        bp.targets.head, Seed)
        .select(col("key").as("doc_id"), col("body").as("text"))
      PiiScan.findings(corpus)
        .groupBy("detector")
        .agg(count(lit(1)).as("n_docs"), sum("n_matches").as("n_matches"))
        .orderBy("detector")
    })
  )

  /**
   * Deterministic HTML page dressing over the documents table — one
   * decoy per extraction rule: a style body, a comment, a
   * double-escaped entity, tags inside a script string, numeric
   * character references (decimal, hex, an astral surrogate pair,
   * plus out-of-range forms that must stay literal and a
   * double-escaped `&amp;#60;` that must decode only one level), and
   * two href targets (one on-domain "next" link, one off-site hub
   * link). The oracle constructs the expected plain text / link list
   * directly from (doc_id, source, text).
   */
  private def htmlDressing: Column = concat(
    lit("<html><head><title>doc "), col("doc_id").cast("string"),
    lit("</title><style>p{color:red}</style></head><body><!-- hidden -->"),
    lit("<h1>Doc &amp; "), col("doc_id").cast("string"),
    lit(" em&#8212;dash &#x2019; &#65; &#x1F600; &#0; &#55296; &amp;#60;</h1>"),
    lit("<a href=\"https://"), col("source"),
    lit(".example.com/doc/"), ((col("doc_id") + 1) % 40).cast("string"),
    lit("\">next</a><p class=\"b\">"), col("text"),
    lit("</p><a href=\"http://hub.example.org/t/"),
    (col("doc_id") % 7).cast("string"),
    lit("\">hub</a><script>var s = \"<p>not text</p>\";</script>" +
      "</body></html>"))

  /**
   * Deterministic PII test corpus: customer rows with secrets planted by
   * key residue (ssn on key%3=0, email on key%2=0, …) so the frame mixes
   * positives, negatives, and multi-hit rows. Built from arithmetic +
   * format_string only — the oracle constructs the identical text in SQL.
   */
  private def piiCorpus(customer: DataFrame): DataFrame = {
    val k = col("c_custkey")
    def m(n: Long) = pmod(k, lit(n))
    val txt = concat_ws(" ",
      col("c_name"),
      when(m(2) === 0, format_string("contact user%d@example.com", k)),
      when(m(3) === 0, format_string("ssn %03d-%02d-%04d",
        m(800) + 100, m(90) + 10, m(10000))),
      when(m(5) === 0, format_string("itin 9%02d-7%d-%04d",
        m(100), m(10), m(10000))),
      when(m(7) === 0, format_string("card %04d %04d %04d %04d",
        m(10000), pmod(k * 3, lit(10000)), pmod(k * 7, lit(10000)),
        pmod(k * 11, lit(10000)))),
      when(m(4) === 0, format_string("src %d.%d.%d.%d",
        m(256), pmod(k * 3, lit(256)), pmod(k * 7, lit(256)), pmod(k * 11, lit(256)))),
      when(m(6) === 0, format_string("CVE-%d-%d", m(28) + 1999, m(9999) + 1)),
      when(m(9) === 0, format_string("slack_token=xoxb-%04d-%04d-%05d-%010d",
        m(10000), pmod(k * 3, lit(10000)), m(100000), m(10000000000L))),
      when(m(8) === 0, format_string("tel (%03d) %03d-%04d",
        m(800) + 200, m(700) + 300, m(10000))),
      when(m(11) === 0, concat(lit("AKIA"),
        lpad(pmod(k * 999983L, lit(10000000000000000L)).cast("string"), 16, "0"))))
    customer.select(k, txt.as("txt"))
  }

  /** DuckDB mirror of [[piiCorpus]]'s text construction. */
  private val piiCorpusSql: String =
    """SELECT c_custkey, concat_ws(' ', c_name,
      |  CASE WHEN c_custkey % 2 = 0 THEN printf('contact user%d@example.com', c_custkey) END,
      |  CASE WHEN c_custkey % 3 = 0 THEN printf('ssn %03d-%02d-%04d',
      |       c_custkey % 800 + 100, c_custkey % 90 + 10, c_custkey % 10000) END,
      |  CASE WHEN c_custkey % 5 = 0 THEN printf('itin 9%02d-7%d-%04d',
      |       c_custkey % 100, c_custkey % 10, c_custkey % 10000) END,
      |  CASE WHEN c_custkey % 7 = 0 THEN printf('card %04d %04d %04d %04d',
      |       c_custkey % 10000, (c_custkey * 3) % 10000, (c_custkey * 7) % 10000,
      |       (c_custkey * 11) % 10000) END,
      |  CASE WHEN c_custkey % 4 = 0 THEN printf('src %d.%d.%d.%d',
      |       c_custkey % 256, (c_custkey * 3) % 256, (c_custkey * 7) % 256,
      |       (c_custkey * 11) % 256) END,
      |  CASE WHEN c_custkey % 6 = 0 THEN printf('CVE-%d-%d',
      |       c_custkey % 28 + 1999, c_custkey % 9999 + 1) END,
      |  CASE WHEN c_custkey % 9 = 0 THEN printf('slack_token=xoxb-%04d-%04d-%05d-%010d',
      |       c_custkey % 10000, (c_custkey * 3) % 10000, c_custkey % 100000,
      |       c_custkey % 10000000000) END,
      |  CASE WHEN c_custkey % 8 = 0 THEN printf('tel (%03d) %03d-%04d',
      |       c_custkey % 800 + 200, c_custkey % 700 + 300, c_custkey % 10000) END,
      |  CASE WHEN c_custkey % 11 = 0 THEN 'AKIA' ||
      |       lpad(CAST((c_custkey * 999983) % 10000000000000000 AS VARCHAR), 16, '0') END
      |) AS txt FROM customer""".stripMargin

  /** DuckDB mirror of "exact 3-gram jaccard pairs >= threshold →
    * min-reachable-id clusters" (recursive CTE transitive closure). */
  /** Exact transitive closure of the jaccard pair graph at `threshold`
    * over `src` (any relation/CTE exposing doc_id + text) — the shared
    * oracle for the cluster-resolution pipelines. */

  /** DuckDB replay of TextStats.gopherRules (x_gopher_rules oracle,
    * also embedded by the x_quality_report rollup — one definition so
    * the report and the per-doc verdicts cannot drift). */
  private def gopherRulesSql: String = {
    val stopKinds = GopherQueryStopwords
      .map(w => s"CASE WHEN ${occSql(w)} > 0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH tk AS (SELECT doc_id, text, $toksSql AS t FROM documents),
         |base AS (SELECT doc_id, text, t, len(t) AS nw,
         |                array_to_string(t, ' ') AS norm FROM tk),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |                    i -> t[i] || ' ' || t[i+1])) AS gram
         |       FROM tk WHERE len(t) >= 2),
         |bgc AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
         |        FROM bg GROUP BY 1, 2),
         |top2 AS (SELECT doc_id, c AS t2c, CAST(len(gram) AS BIGINT) AS t2l
         |         FROM (SELECT doc_id, gram, c, row_number() OVER
         |                 (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
         |               FROM bgc) WHERE rn = 1),
         |g5 AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
         |            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
         |                 t[i+3] || ' ' || t[i+4])) AS gram
         |       FROM tk WHERE len(t) >= 5),
         |g5c AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
         |        FROM g5 GROUP BY 1, 2),
         |dup5 AS (SELECT doc_id, CAST(sum(c * len(gram)) AS BIGINT) AS d5
         |         FROM g5c WHERE c > 1 GROUP BY 1),
         |f AS (SELECT b.doc_id,
         |        CAST(b.nw AS BIGINT) AS n_words,
         |        CAST(len(b.norm) AS BIGINT) AS chars,
         |        CASE WHEN b.nw > 0
         |             THEN CAST(len(b.norm) - (b.nw - 1) AS DOUBLE) / b.nw
         |             ELSE 0.0 END AS mean_word_len,
         |        CASE WHEN b.nw > 0
         |             THEN CAST(len(regexp_extract_all(b.norm,
         |                    '[^ ]*[a-z][^ ]*')) AS DOUBLE) / b.nw
         |             ELSE 0.0 END AS alpha_frac,
         |        CASE WHEN b.nw > 0
         |             THEN CAST((len(b.norm) - len(replace(b.norm, '#', '')))
         |                  + (len(b.norm) - len(replace(b.norm, '...', ''))) / 3
         |                  AS DOUBLE) / b.nw
         |             ELSE 0.0 END AS symbol_ratio,
         |        CAST($stopKinds AS BIGINT) AS n_stop_kinds,
         |        coalesce(t2.t2c * t2.t2l, 0) AS t2chars,
         |        coalesce(d.d5, 0) AS d5chars
         |      FROM base b
         |      LEFT JOIN top2 t2 USING (doc_id)
         |      LEFT JOIN dup5 d USING (doc_id)),
         |f2 AS (SELECT doc_id, n_words, mean_word_len, alpha_frac,
         |         symbol_ratio, n_stop_kinds,
         |         CASE WHEN chars > 0 THEN CAST(t2chars AS DOUBLE) / chars
         |              ELSE 0.0 END AS top_bigram_frac,
         |         CASE WHEN chars > 0 THEN CAST(d5chars AS DOUBLE) / chars
         |              ELSE 0.0 END AS dup_5gram_frac
         |       FROM f)
         |SELECT doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio,
         |       n_stop_kinds, top_bigram_frac, dup_5gram_frac,
         |       (n_words >= 50 AND n_words <= 100000
         |        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |        AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
         |        AND n_stop_kinds >= 2 AND top_bigram_frac <= 0.20
         |        AND dup_5gram_frac <= 0.15) AS passes
         |FROM f2 ORDER BY doc_id""".stripMargin
  }

  /** The MinHash band-bucket replay (32/8/3 defaults): CTEs `toks`
    * through `bands` = (doc_id, band, bucket), shared by the pair,
    * recall, and cross-corpus oracles. */
  private def minhashBandsCtes: String = {
    val (as, bs) = Dedup.minhashCoefs(32)
    val aList = as.mkString("[", ", ", "]")
    val bList = bs.mkString("[", ", ", "]")
    val p = Dedup.MinhashPrime
    s"""toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |grams AS (SELECT doc_id, unnest(list_distinct(
       |            CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
       |                 ELSE [array_to_string(tk[i:i+2], ' ')
       |                       for i in generate_series(1, len(tk) - 2)] END)) AS g
       |          FROM toks),
       |xs AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT % $p AS x
       |       FROM grams),
       |sig AS (SELECT doc_id, j,
       |               min(($aList[j+1] * x + $bList[j+1]) % $p) AS h
       |        FROM xs CROSS JOIN generate_series(0, 31) s(j) GROUP BY 1, 2),
       |bands AS (SELECT doc_id, j // 4 AS band,
       |                 string_agg(h::VARCHAR, ',' ORDER BY j) AS bucket
       |          FROM sig GROUP BY 1, 2)""".stripMargin
  }

  /** DuckDB replay of Dedup.winnowFingerprints at the 3-gram/4-window
    * defaults — positional (NON-distinct) grams, md5-prefix 60-bit
    * keys, sliding min windows, full-window filter with the
    * short-document single-window fallback. Shared by x_winnow and
    * x_winnow_pairs so the pair set can't drift from the selection. */
  private def winnowCtes: String = {
    val p = Dedup.MinhashPrime
    s"""toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |gl AS (SELECT doc_id, CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
       |         ELSE [array_to_string(tk[i:i+2], ' ')
       |               for i in generate_series(1, len(tk) - 2)] END AS gs
       |       FROM toks),
       |grams AS (SELECT doc_id, unnest(gs) AS g,
       |                 generate_subscripts(gs, 1) - 1 AS pos FROM gl),
       |hs AS (SELECT doc_id, pos,
       |              ('0x' || substr(md5(g), 1, 15))::BIGINT % $p AS h
       |       FROM grams),
       |cnts AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY 1),
       |wins AS (SELECT doc_id, pos,
       |                min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
       |         FROM hs),
       |fps AS (SELECT DISTINCT w.doc_id, w.fp
       |        FROM wins w JOIN cnts c USING (doc_id)
       |        WHERE w.pos <= greatest(c.n - 4, 0))""".stripMargin
  }

  /** DuckDB replay of Dedup.cdcChunks at boundaryMod=8 — positional
    * tokens, md5-prefix boundary keys, chunk id = running boundary
    * count over STRICTLY PRIOR tokens (a boundary token closes the
    * chunk it belongs to), chunks rebuilt in position order. Shared by
    * x_cdc_chunks / x_cdc_dups / x_cdc_scrub so report and scrub
    * cannot drift from the chunking. */
  private def cdcCtes: String = {
    val p = Dedup.MinhashPrime
    s"""t AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |tokp AS (SELECT doc_id, unnest(tk) AS w,
       |                generate_subscripts(tk, 1) AS pos FROM t),
       |bnd AS (SELECT doc_id, pos, w,
       |          CASE WHEN (('0x' || substr(md5(w), 1, 15))::BIGINT % $p) % 8 = 0
       |               THEN 1 ELSE 0 END AS b
       |        FROM tokp),
       |cs AS (SELECT doc_id, pos, w,
       |          COALESCE(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
       |        FROM bnd),
       |ch AS (SELECT doc_id, CAST(cid AS INT) AS chunk_idx,
       |          string_agg(w, ' ' ORDER BY pos) AS chunk_text,
       |          CAST(count(*) AS INT) AS n_chunk_tokens
       |        FROM cs GROUP BY 1, 2)""".stripMargin
  }

  /** DuckDB replay of TextStats.bm25QueryCandidates over NdcgQueries —
    * per-(query, candidate-doc) BM25 grid score + term-overlap
    * relevance. Shared by x_ndcg and x_mrr (the two retrieval-eval
    * oracles read the SAME candidate frame, like the Spark builder). */
  private def ndcgPqCtes: String = {
    val vals = NdcgQueries
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
    val allTerms = NdcgQueries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    val k1 = 1.2
    val b = 0.75
    s"""q AS (SELECT * FROM (VALUES $vals) AS v(query_id, term)),
       |dl AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl FROM documents),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents)
       |       WHERE term IN ($allTerms) GROUP BY 1, 2),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |pq AS (SELECT q.query_id, tf.doc_id,
       |         CAST(sum(CAST(round(ln((n - df + ${d(0.5)}) / (df + ${d(0.5)}) + ${d(1.0)})
       |           * (tf * ${d(k1 + 1.0)}) / (tf + ${d(k1)} * (${d(1.0)} - ${d(b)}
       |           + ${d(b)} * dl / avgdl)) * 1e9) AS BIGINT)) AS BIGINT) AS s9,
       |         CAST(count(DISTINCT tf.term) AS BIGINT) AS rel
       |       FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       |       JOIN dl USING (doc_id) CROSS JOIN st
       |       GROUP BY 1, 2)""".stripMargin
  }

  /** Hashed-BoW feature width (+1 bias slot) and GD schedule shared
    * by the logistic-regression query pair and its oracle. */
  private val LogRegDims = 64
  private val LogRegIters = 20
  private val LogRegLr = 0.8

  /** Per-process memo of the trained weights: x_logreg_weights and
    * x_logreg_predict (and repeated bench trials) share ONE training
    * run per sf dir — the model is dims+1 longs, the cheapest possible
    * cache entry. The key carries a DATA fingerprint (row count +
    * schema hash), not just the path: if testdata under the same dir
    * is regenerated within one long-lived process, the cache misses
    * and retrains instead of serving stale weights against a DuckDB
    * oracle that sees the new data. (Count on parquet is a row-group
    * metadata read — cheap relative to training.) */
  private val logregCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
  private def trainedLogreg(s: SparkSession, dir: String): Array[Long] = {
    val docs = tbl(s, dir, "documents")
    val fp = docs.count().toString + "|" +
      docs.schema.map(f => f.name + ":" + f.dataType.sql).mkString(",").hashCode
    logregCache.computeIfAbsent(s"$dir|$fp", _ =>
      TextStats.logisticTrain(
        TextStats.qualityFacets(docs),
        col("quality_bucket") === "good",
        dims = LogRegDims, iters = LogRegIters, lr = LogRegLr))
  }

  /** DuckDB replay of TextStats.logisticTrain (LogRegIters grid-exact
    * GD steps, lr LogRegLr, quality-good label) — md5-hashed count
    * features + the bias row, integer z/gradient sums, and the SAME
    * σ/step expression shapes; `wN` holds the final grid weights,
    * `zf` the margins under them. Shared by x_logreg_weights and
    * x_logreg_predict (one training, one set of weights). */
  private def logregCtes: String = {
    val dims = LogRegDims
    // every per-iteration CTE is MATERIALIZED: w_r references w_{r-1}
    // through two paths (directly and via g_r→s_r→z_r), so an inlining
    // planner would re-expand the whole chain per reference —
    // exponential in iters. Materialization makes the replay linear.
    def iter(r: Int): String =
      s"""z$r AS MATERIALIZED (SELECT f.doc_id, CAST(sum(w.w9 * f.c) AS BIGINT) AS z9
         |        FROM feat f JOIN w${r - 1} w USING (dim) GROUP BY 1),
         |s$r AS MATERIALIZED (SELECT l.doc_id, l.y,
         |               CAST(round(1e9 / (1.0 + exp(-(CAST(COALESCE(z.z9, 0) AS DOUBLE) / 1e9)))) AS BIGINT) AS s9
         |        FROM lab l LEFT JOIN z$r z USING (doc_id)),
         |g$r AS MATERIALIZED (SELECT f.dim, CAST(sum((s.s9 - s.y * 1000000000) * f.c) AS BIGINT) AS g9
         |        FROM feat f JOIN s$r s USING (doc_id) GROUP BY 1),
         |w$r AS MATERIALIZED (SELECT w.dim,
         |               w.w9 - CAST(round($LogRegLr * CAST(COALESCE(g.g9, 0) AS DOUBLE) / nn.n) AS BIGINT) AS w9
         |        FROM w${r - 1} w LEFT JOIN g$r g USING (dim) CROSS JOIN nn)""".stripMargin
    s"""toksq AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |feat AS MATERIALIZED (SELECT doc_id,
       |                ('0x' || substr(md5(tok), 1, 15))::BIGINT % $dims AS dim,
       |                CAST(count(*) AS BIGINT) AS c
       |         FROM toksq GROUP BY 1, 2
       |         UNION ALL
       |         SELECT doc_id, CAST($dims AS BIGINT), CAST(1 AS BIGINT)
       |         FROM documents),
       |lab AS MATERIALIZED (SELECT doc_id,
       |               CASE WHEN ($qualityBucketSql) = 'good' THEN 1 ELSE 0 END AS y
       |        FROM documents),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |w0 AS (SELECT CAST(d AS BIGINT) AS dim, CAST(0 AS BIGINT) AS w9
       |       FROM generate_series(0, $dims) g(d)),
       |${(1 to LogRegIters).map(iter).mkString(",\n")},
       |zf AS (SELECT f.doc_id, CAST(sum(w.w9 * f.c) AS BIGINT) AS z9
       |       FROM feat f JOIN w$LogRegIters w USING (dim) GROUP BY 1)""".stripMargin
  }

  /** DuckDB replay of TextStats.naiveBayes over the even-id train
    * split — Laplace-smoothed multinomial likelihood + doc-count
    * prior on the 1e-9 grid, argmax by (score desc, label asc).
    * `keyExpr` maps the token column `w` to its count/join key: the
    * token itself for the exact-vocabulary variant, its md5 bucket
    * for the hashed variant. Shared by x_nb_classify, x_nb_accuracy,
    * and x_nb_hashed. */
  private def nbCtesWith(keyExpr: String): String =
    s"""tr AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 2 = 0),
       |ttk0 AS (SELECT source AS lbl, unnest($toksSql) AS w FROM tr),
       |ttk AS (SELECT lbl, $keyExpr AS k FROM ttk0),
       |cnt AS (SELECT lbl, k, CAST(count(*) AS BIGINT) AS c FROM ttk GROUP BY 1, 2),
       |ls AS (SELECT lbl, CAST(count(*) AS BIGINT) AS t FROM ttk GROUP BY 1),
       |ndl AS (SELECT source AS lbl, CAST(count(*) AS BIGINT) AS nd FROM tr GROUP BY 1),
       |sv AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS v FROM ttk),
       |ntr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tr),
       |pos0 AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
       |pos AS (SELECT doc_id, $keyExpr AS k FROM pos0),
       |contrib AS (SELECT p.doc_id, l.lbl,
       |    CAST(round(ln((COALESCE(c.c, 0) + 1) / CAST(l.t + sv.v AS DOUBLE))
       |      * 1e9) AS BIGINT) AS l9
       |  FROM pos p CROSS JOIN ls l CROSS JOIN sv
       |  LEFT JOIN cnt c ON c.lbl = l.lbl AND c.k = p.k),
       |scored AS (SELECT co.doc_id, co.lbl,
       |    CAST(sum(co.l9) AS BIGINT)
       |    + CAST(round(ln(ndl.nd / CAST(ntr.n AS DOUBLE)) * 1e9) AS BIGINT) AS sc9
       |  FROM contrib co JOIN ndl ON ndl.lbl = co.lbl CROSS JOIN ntr
       |  GROUP BY co.doc_id, co.lbl, ndl.nd, ntr.n),
       |bestl AS (SELECT doc_id, lbl AS predicted, sc9 AS best_lp9,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY sc9 DESC, lbl) AS rk
       |  FROM scored),
       |nb AS (SELECT d.doc_id, d.source AS actual, b.predicted, b.best_lp9,
       |    CASE WHEN d.source = b.predicted THEN 1 ELSE 0 END AS correct
       |  FROM bestl b JOIN documents d USING (doc_id) WHERE b.rk = 1)""".stripMargin

  /** DuckDB replay of Dedup.minhashLshPairs at the 32/8/3 defaults —
    * the x_minhash_pairs oracle, also embedded as the candidate set of
    * x_lsh_recall (one definition, the sets cannot drift). */
  private def minhashPairsSql: String =
    s"""WITH $minhashBandsCtes,
       |pairs AS (SELECT DISTINCT la.doc_id AS a, lb.doc_id AS b
       |          FROM bands la JOIN bands lb ON la.band = lb.band
       |           AND la.bucket = lb.bucket AND la.doc_id < lb.doc_id)
       |SELECT a, b FROM pairs ORDER BY a, b""".stripMargin

  /** DuckDB replay of the exact Jaccard pair set at the near-dup
    * operating threshold (0.7) — x_lsh_recall's ground truth. */
  private def jaccardTruthSql: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |grams AS (SELECT doc_id, unnest(list_distinct(
       |            CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
       |                 ELSE [array_to_string(tk[i:i+2], ' ')
       |                       for i in generate_series(1, len(tk) - 2)] END)) AS g
       |          FROM toks),
       |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
       |inter AS (SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS n_common
       |          FROM grams ga JOIN grams gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id
       |          GROUP BY 1, 2)
       |SELECT a, b FROM inter
       |JOIN sizes sa ON sa.doc_id = a
       |JOIN sizes sb ON sb.doc_id = b
       |WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.7""".stripMargin

  private def jaccardClustersSql(threshold: Double, src: String = "documents"): String =
    s"""WITH RECURSIVE toks AS (SELECT doc_id, $toksSql AS tk FROM $src),
       |grams AS (SELECT doc_id, unnest(list_distinct(
       |            CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
       |                 ELSE [array_to_string(tk[i:i+2], ' ')
       |                       for i in generate_series(1, len(tk) - 2)] END)) AS g
       |          FROM toks),
       |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
       |inter AS (SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS n_common
       |          FROM grams ga JOIN grams gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id
       |          GROUP BY 1, 2),
       |pairs AS (SELECT a, b FROM inter
       |          JOIN sizes sa ON sa.doc_id = a
       |          JOIN sizes sb ON sb.doc_id = b
       |          WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= $threshold),
       |edges AS (SELECT a AS x, b AS y FROM pairs
       |          UNION SELECT b, a FROM pairs),
       |reach AS (SELECT x AS id, x AS r FROM edges
       |          UNION
       |          SELECT reach.id, e.y FROM reach JOIN edges e ON reach.r = e.x)
       |SELECT id, min(r) AS rep FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** k for the ANN query suite (bruteforce/LSH/IVF top-k and the
    * recall measurement) — one constant shared by the Spark queries AND
    * the generated oracle SQL so the `recall_pct` arithmetic and the
    * `rank <= k` bounds cannot drift apart. Must divide 100. */
  private val AnnK = 5

  /** Output dimensionality of the JL random projection (x_jl_recall). */
  private val JlDims = 16

  /** DuckDB fragment: sequential-fold self dot product of `v` (matches
    * the engine's left-to-right fold in NativeFunctions.dot). */
  private val selfDotSql =
    """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |          [v[i] * v[i] for i in generate_series(1, 64)]), (a, b) -> a + b)""".stripMargin

  /** DuckDB fragment: sequential-fold dot of `l.v` and `r.v`. */
  private val pairDotSql =
    """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |          [l.v[i] * r.v[i] for i in generate_series(1, 64)]), (x, y) -> x + y)""".stripMargin

  /**
   * DuckDB mirror of [[Dedup.embeddingNearDups]] (threshold 0.35,
   * planes 4, seed 42): the hyperplanes are plan-time constants from
   * [[Similarity.planeLiterals]], so the SAME literals are embedded
   * here — the LSH bucket assignment replays bit-identically and the
   * "approximate" pipeline becomes exactly oracle-checkable.
   */
  private def neardupEmbeddingSql: String = {
    val planes = Similarity.planeLiterals(dims = 64, planes = 4, seed = 42L)
    def dotPlane(p: Seq[Double]): String = {
      val lst = p.mkString("[", ", ", "]")
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"[v[i] * ($lst)[i] for i in generate_series(1, 64)]), (a, b) -> a + b)"
    }
    val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotPlane(p)} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("\n        + ")
    s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
       |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
       |n AS (SELECT vec_id, v, bucket, sqrt($selfDotSql) AS nrm FROM b),
       |p AS (SELECT l.vec_id AS a, r.vec_id AS b,
       |        $pairDotSql / (l.nrm * r.nrm) AS cosine
       |      FROM n l JOIN n r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
       |SELECT a, b, round(cosine, 6) AS cosine_r FROM p
       |WHERE cosine >= 0.35 ORDER BY a, b""".stripMargin
  }

  /**
   * DuckDB mirror of [[Similarity.lshTopK]] (k=5, 8 planes × 4 tables,
   * seed 42, queries = vec_id < 5) with all 32 plane-constant arrays
   * injected — candidate generation via per-table bucket equality, then
   * exact cosine and per-query ranking, replayed bit-identically.
   */
  private def simLshSql: String = {
    def dotPlane(p: Seq[Double]): String = {
      val lst = p.mkString("[", ", ", "]")
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"[v[i] * ($lst)[i] for i in generate_series(1, 64)]), (a, b) -> a + b)"
    }
    val perTable = (0 until 4).map { t =>
      val planes = Similarity.planeLiterals(dims = 64, planes = 8, seed = 42L + 1000L * t)
      val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN ${dotPlane(p)} >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("\n          + ")
      s"SELECT vec_id, v, nrm, $t AS tbl, $bucketExpr AS bucket FROM n"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt($selfDotSql) AS nrm FROM e),
       |cb AS ($perTable),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |         FROM cb c JOIN cb q ON c.tbl = q.tbl AND c.bucket = q.bucket
       |         WHERE q.vec_id < 5),
       |scored AS (SELECT cd.query_id, cd.neighbor_id,
       |             $pairDotSql / (l.nrm * r.nrm) AS score
       |           FROM cand cd
       |           JOIN n l ON l.vec_id = cd.neighbor_id
       |           JOIN n r ON r.vec_id = cd.query_id),
       |ranked AS (SELECT query_id, neighbor_id,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY score DESC, neighbor_id) AS rank,
       |             round(score, 6) AS score_r
       |           FROM scored)
       |SELECT query_id, neighbor_id, rank, score_r
       |FROM ranked WHERE rank <= $AnnK ORDER BY query_id, rank""".stripMargin
  }

  /**
   * DuckDB mirror of [[Similarity.ivfTopK]] (16 centroids, 3 Lloyd
   * iterations, 4 probes, k=5, seed 42, queries = vec_id < 5) — the
   * whole k-means replays: md5-ranked init, argmin assignment with the
   * same sequential-fold dot products, integer-nano-unit exact means
   * (the reason ivfTopK's means are quantized), probe, exact cosine,
   * rank. No constants are injected; the oracle derives the same
   * centroids from the data.
   */
  // sequential-fold helpers over aliased DOUBLE-list columns — the
  // same left-to-right order as NativeFunctions.dot. Shared by the
  // IVF and SemDeDup oracles.
  private def ivfDotL(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[$a[i] * $b[i] for i in generate_series(1, 64)]), (x, y) -> x + y)"
  private def ivfNorm2(a: String): String = ivfDotL(a, a)

  /** The k-means replay shared by simIvfSql and semDedupSql: CTEs `e`
    * (double-cast vectors) through `af` (assignments after 3 Lloyd
    * iterations) — md5-ranked init, exact quantized means with
    * empty-cluster carry-over, deterministic nearest-centroid
    * tie-break on ascending cid. One definition so the ANN oracle and
    * the semantic-dedup oracle can never train different clusterings. */
  private def ivfAssignCtes: String = {
    def dotL(a: String, b: String) = ivfDotL(a, b)
    def norm2(a: String) = ivfNorm2(a)
    // one Lloyd iteration: assign to nearest centroid of `cent`, then
    // exact quantized means with empty-cluster carry-over
    def iterate(cent: String, next: String): String =
      s"""a_$next AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, c.cid,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |           (${norm2("c.cv")} - 2.0 * ${dotL("e.v", "c.cv")}) ASC, c.cid ASC) AS rn
         |  FROM e CROSS JOIN $cent c) WHERE rn = 1),
         |m_$next AS (SELECT cid, pos,
         |         sum(CAST(round(v[pos] * 1000000000.0) AS BIGINT)) AS s,
         |         count(*) AS n
         |       FROM a_$next CROSS JOIN generate_series(1, 64) g(pos)
         |       GROUP BY cid, pos),
         |$next AS (SELECT c.cid, coalesce(m.cv, c.cv) AS cv
         |       FROM $cent c LEFT JOIN
         |         (SELECT cid, list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0)
         |                           ORDER BY pos) AS cv
         |          FROM m_$next GROUP BY cid) m ON c.cid = m.cid)""".stripMargin
    s"""e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
       |cent0 AS (SELECT row_number() OVER (ORDER BY rnk, vec_id) - 1 AS cid, v AS cv
       |          FROM (SELECT vec_id, v,
       |                  ('0x' || substr(md5('$Seed' || chr(1) || 'ivf/init' || chr(1) ||
       |                     vec_id::VARCHAR), 1, 13))::BIGINT AS rnk
       |                FROM e ORDER BY rnk, vec_id LIMIT 16)),
       |${iterate("cent0", "cent1")},
       |${iterate("cent1", "cent2")},
       |${iterate("cent2", "cent3")},
       |af AS (SELECT vec_id, v, cid FROM (
       |  SELECT e.vec_id, e.v, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |           (${norm2("c.cv")} - 2.0 * ${dotL("e.v", "c.cv")}) ASC, c.cid ASC) AS rn
       |  FROM e CROSS JOIN cent3 c) WHERE rn = 1)""".stripMargin
  }

  /** PQ geometry shared by the x_pq_recall query and oracle: 4
    * subspaces of 16 dims, 16 sub-centroids each. */
  private val PqM = 4
  private val PqK = 16

  /** DuckDB replay of Similarity.pqTrain/pqEncode for subspace `s`:
    * CTEs `es_s` (16-dim slices of the normalized vectors `en`)
    * through `paf_s` (final code assignment after 3 Lloyd
    * iterations) — the ivfAssignCtes machinery parameterized over the
    * dim slice, sharing ONE `pinit` ranked-init frame so every
    * subspace trains on the same member set, exactly like the engine. */
  private def pqSubCtes(s: Int, sub: Int, iters: Int): String = {
    val off = s * sub
    def dotL(a: String, b: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"[$a[i] * $b[i] for i in generate_series(1, $sub)]), (x, y) -> x + y)"
    def norm2(a: String) = dotL(a, a)
    def iterate(prev: String, r: Int): String =
      s"""pa${r}_$s AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, c.cid,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |           (${norm2("c.cv")} - 2.0 * ${dotL("e.v", "c.cv")}) ASC, c.cid ASC) AS rn
         |  FROM es_$s e CROSS JOIN $prev c) WHERE rn = 1),
         |pm${r}_$s AS (SELECT cid, pos,
         |         sum(CAST(round(v[pos] * 1000000000.0) AS BIGINT)) AS sm,
         |         count(*) AS n
         |       FROM pa${r}_$s CROSS JOIN generate_series(1, $sub) g(pos)
         |       GROUP BY cid, pos),
         |pc${r}_$s AS (SELECT c.cid, coalesce(m.cv, c.cv) AS cv
         |       FROM $prev c LEFT JOIN
         |         (SELECT cid, list(CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0)
         |                           ORDER BY pos) AS cv
         |          FROM pm${r}_$s GROUP BY cid) m ON c.cid = m.cid)""".stripMargin
    s"""es_$s AS (SELECT vec_id, vn[${off + 1}:${off + sub}] AS v FROM en),
       |pc0_$s AS (SELECT i.cid, e.v AS cv FROM pinit i JOIN es_$s e USING (vec_id)),
       |${(1 to iters).map(r => iterate(s"pc${r - 1}_$s", r)).mkString(",\n")},
       |paf_$s AS (SELECT vec_id, cid FROM (
       |  SELECT e.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |           (${norm2("c.cv")} - 2.0 * ${dotL("e.v", "c.cv")}) ASC, c.cid ASC) AS rn
       |  FROM es_$s e CROSS JOIN pc${iters}_$s c) WHERE rn = 1)""".stripMargin
  }

  /** ADC core of the PQ oracles: normalized vectors, one shared
    * md5-ranked init, per-subspace Lloyd replay, ADC scoring of the
    * code joins against the final codebooks, per-query rank (`pqr`).
    * Shared by x_pq_recall and x_pq_probe (one training, one ranking —
    * the two cannot drift). */
  private def pqAdcCtes: String = {
    val sub = 64 / PqM
    def dotL(a: String, b: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"[$a[i] * $b[i] for i in generate_series(1, $sub)]), (x, y) -> x + y)"
    def norm2(a: String) = dotL(a, a)
    val pcode = (0 until PqM).map(s => s"a$s.cid AS c$s").mkString(", ")
    val pcodeFrom = (0 until PqM).map {
      case 0 => "paf_0 a0"
      case s => s"JOIN paf_$s a$s USING (vec_id)"
    }.mkString(" ")
    val centJoins = (0 until PqM)
      .map(s => s"JOIN pc3_$s cc$s ON cc$s.cid = d.c$s").mkString(" ")
    val adist = (0 until PqM).map { s =>
      val q = s"q.vn[${s * sub + 1}:${s * sub + sub}]"
      s"(${norm2(s"cc$s.cv")} - 2.0 * ${dotL(q, s"cc$s.cv")})"
    }.mkString(" + ")
    s"""pe AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
       |pn AS (SELECT vec_id, v,
       |              sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |                [v[i] * v[i] for i in generate_series(1, 64)]), (x, y) -> x + y)) AS nrm
       |       FROM pe),
       |en AS (SELECT vec_id,
       |              [CASE WHEN nrm = 0 THEN 0.0 ELSE v[i] / nrm END
       |               for i in generate_series(1, 64)] AS vn
       |       FROM pn),
       |pinit AS (SELECT vec_id, row_number() OVER (ORDER BY rnk, vec_id) - 1 AS cid
       |          FROM (SELECT vec_id,
       |                  ('0x' || substr(md5('$Seed' || chr(1) || 'ivf/init' || chr(1) ||
       |                     vec_id::VARCHAR), 1, 13))::BIGINT AS rnk
       |                FROM en ORDER BY rnk, vec_id LIMIT $PqK)),
       |${(0 until PqM).map(s => pqSubCtes(s, sub, iters = 3)).mkString(",\n")},
       |pcode AS (SELECT a0.vec_id, $pcode FROM $pcodeFrom),
       |pquery AS (SELECT vec_id AS query_id, vn FROM en WHERE vec_id < 5),
       |scored AS (SELECT q.query_id, d.vec_id AS neighbor_id, $adist AS adist
       |           FROM pcode d $centJoins CROSS JOIN pquery q),
       |pqr AS (SELECT query_id, neighbor_id,
       |               row_number() OVER (PARTITION BY query_id
       |                                  ORDER BY adist ASC, neighbor_id ASC) AS rank
       |        FROM scored)""".stripMargin
  }

  private def pqRecallSql: String =
    s"""WITH $pqAdcCtes,
       |pqk AS (SELECT query_id, neighbor_id FROM pqr WHERE rank <= $AnnK),
       |bf AS ($simBruteforceSql),
       |hits AS (SELECT bf.query_id, count(*) AS n_hit
       |         FROM bf JOIN pqk USING (query_id, neighbor_id)
       |         GROUP BY bf.query_id)
       |SELECT query_id, CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       |       CAST(coalesce(n_hit, 0) * ${100 / AnnK} AS BIGINT) AS recall_pct
       |FROM (SELECT DISTINCT query_id FROM bf) q
       |LEFT JOIN hits USING (query_id)
       |ORDER BY query_id""".stripMargin

  /** x_pq_probe oracle: the ADC ranking itself (rank ≤ k) — identical
    * build parameters make the persisted-index probe bit-identical to
    * the train-per-query path, so both read the same CTEs. */
  private def pqProbeSql: String =
    s"""WITH $pqAdcCtes
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
       |FROM pqr WHERE rank <= $AnnK ORDER BY query_id, rank""".stripMargin

  private def simIvfSql: String = {
    def dotL(a: String, b: String) = ivfDotL(a, b)
    def norm2(a: String) = ivfNorm2(a)
    s"""WITH $ivfAssignCtes,
       |probed AS (SELECT query_id, qv, cid FROM (
       |  SELECT q.vec_id AS query_id, q.v AS qv, c.cid,
       |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |           (${norm2("c.cv")} - 2.0 * ${dotL("q.v", "c.cv")}) ASC, c.cid ASC) AS pr
       |  FROM (SELECT * FROM e WHERE vec_id < 5) q CROSS JOIN cent3 c) WHERE pr <= 4),
       |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id,
       |           ${dotL("a.v", "p.qv")} /
       |             (sqrt(${norm2("a.v")}) * sqrt(${norm2("p.qv")})) AS score
       |         FROM af a JOIN probed p ON a.cid = p.cid),
       |ranked AS (SELECT query_id, neighbor_id, score,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY score DESC, neighbor_id ASC) AS rank
       |           FROM cand)
       |SELECT query_id, neighbor_id, score, rank
       |FROM ranked WHERE rank <= $AnnK ORDER BY query_id, rank""".stripMargin
  }

  /** Cosine threshold shared by the x_semdedup query and oracle. */
  private val SemDedupTau = 0.35

  /** The bigram-LM scoring chain shared by x_bigram_logprob and
    * x_ppl_buckets (train on even doc ids, stupid-backoff alpha 0.4,
    * 1e-9-grid sums): CTEs through `lpf` = (doc_id, n_bigrams,
    * avg_logprob). One definition so the score a bucket is assigned
    * from is the score the standalone query checks. */
  private def bigramLpCtes: String = {
    val a = "CAST('0.4' AS DOUBLE)"
    def posCte(name: String, src: String, idSel: String) =
      s"""$name AS (SELECT $idSel unnest([{'w1': tk[i], 'w2': tk[i+1]}
         |            for i in generate_series(1, len(tk) - 1)]) AS z
         |          FROM $src WHERE len(tk) >= 2)""".stripMargin
    s"""alltk AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |tr AS (SELECT doc_id, tk FROM alltk WHERE doc_id % 2 = 0),
       |${posCte("tpz", "tr", "")}
       |, tp AS (SELECT z.w1 AS w1, z.w2 AS w2 FROM tpz),
       |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM tp GROUP BY 1, 2),
       |ut AS (SELECT unnest(tk) AS w FROM tr),
       |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM ut GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS t,
       |               CAST(count(DISTINCT w) AS BIGINT) AS v FROM ut),
       |${posCte("posz", "alltk", "doc_id,")}
       |, pos AS (SELECT doc_id, z.w1 AS w1, z.w2 AS w2 FROM posz),
       |j AS (SELECT pos.doc_id,
       |             CASE WHEN cb IS NOT NULL AND c1.cu IS NOT NULL
       |                  THEN cb / c1.cu
       |                  ELSE $a * (coalesce(c2.cu, 0) + 1) / (t + v) END AS p
       |      FROM pos
       |      LEFT JOIN big USING (w1, w2)
       |      LEFT JOIN uni c1 ON c1.w = pos.w1
       |      LEFT JOIN uni c2 ON c2.w = pos.w2
       |      CROSS JOIN tot),
       |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |             sum(CAST(round(ln(p) * 1e9) AS BIGINT)) AS s9
       |      FROM j GROUP BY 1),
       |lpf AS (SELECT doc_id, n_bigrams, s9 / (n_bigrams * 1e9) AS avg_logprob
       |        FROM s)""".stripMargin
  }

  /** DuckDB mirror of the deterministic sharded shuffle (16 shards,
    * stream `corpus_shuffle`): md5 uniform, floor bucketing, 0-based
    * row_number per shard ordered by (u, doc_id). Shared by
    * x_shuffle_shards and the x_shard_balance rollup. */
  private def shardCtes: String = {
    val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_shuffle' || " +
      s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
    s"""sh AS (SELECT doc_id, $u AS u,
       |              CAST(floor($u * 16) AS INTEGER) AS shard,
       |              CAST(len($bpeishExtractSql) AS BIGINT) AS n_tok
       |       FROM documents),
       |sp AS (SELECT doc_id, shard, n_tok,
       |              CAST(row_number() OVER (PARTITION BY shard
       |                     ORDER BY u, doc_id) AS BIGINT) - 1 AS pos
       |       FROM sh)""".stripMargin
  }

  /** DuckDB mirror of the budget-constrained greedy selection (budget
    * 5000 BPE-ish tokens, priority = DSIR s9, bandWidth 1e9, clamp
    * ±1000): [[dsirCtes]] scores, banded two-phase prefix sum, the
    * inclusive prefix-cut keep rule — `bsel` is the kept set. Shared
    * by x_budget_select and the x_budget_stats rollup. */
  /** The dsir-scored, token-counted, priority-banded frame (CTE `bd`)
    * shared by the budget selection, its stats rollup, and the
    * band-occupancy pre-flight. */
  private def budgetBandedCtes: String =
    s"""$dsirCtes,
       |sb AS (SELECT dw.doc_id, dw.s9,
       |              CAST(len($bpeishExtractSql) AS BIGINT) AS n
       |       FROM dw JOIN documents USING (doc_id)),
       |bd AS (SELECT doc_id, s9, n,
       |              CAST(least(greatest(floor(s9 / 1000000000), -1000), 1000)
       |                   AS BIGINT) AS band
       |       FROM sb)""".stripMargin

  private def budgetCtes: String =
    s"""$budgetBandedCtes,
       |offs AS (SELECT band,
       |                CAST(coalesce(sum(bn) OVER (ORDER BY band DESC
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |                     0) AS BIGINT) AS excl
       |         FROM (SELECT band, sum(n) AS bn FROM bd GROUP BY 1)),
       |w AS (SELECT bd.doc_id, bd.band, bd.n, offs.excl,
       |             CAST(sum(bd.n) OVER (PARTITION BY bd.band
       |                    ORDER BY bd.s9 DESC, bd.doc_id
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |                  AS BIGINT) AS incl
       |      FROM bd JOIN offs USING (band)),
       |bsel AS (SELECT doc_id, band, n FROM w WHERE excl + incl <= 5000)""".stripMargin

  /** DuckDB mirror of the DSIR hashed bag-of-n-grams importance model
    * (buckets = [[Corpus.DsirBuckets]], target = lang 'en', raw = the
    * rest): unigram + bigram feature occurrences, 60-bit-md5-prefix
    * bucketed, add-one-smoothed per-bucket log ratios snapped to the
    * 1e-9 grid, per-doc long sums. Shared by x_dsir_weights and
    * x_dsir_select so report and selection can't drift. */
  private def dsirCtes: String = {
    val b = Corpus.DsirBuckets
    s"""alltk AS (SELECT doc_id, lang, $toksSql AS tk FROM documents),
       |uf AS (SELECT doc_id, lang, unnest(tk) AS g FROM alltk),
       |bgf AS (SELECT doc_id, lang, unnest([tk[i] || ' ' || tk[i+1]
       |           for i in generate_series(1, len(tk) - 1)]) AS g
       |        FROM alltk WHERE len(tk) >= 2),
       |fb AS (SELECT doc_id, lang,
       |              ('0x' || substr(md5(g), 1, 15))::BIGINT % $b AS b
       |       FROM (SELECT * FROM uf UNION ALL SELECT * FROM bgf)),
       |tgtp AS (SELECT b, CAST(count(*) AS BIGINT) AS ct
       |         FROM fb WHERE lang = 'en' GROUP BY 1),
       |rawf AS (SELECT doc_id, b FROM fb WHERE lang <> 'en'),
       |rawp AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM rawf GROUP BY 1),
       |tots AS (SELECT (SELECT CAST(sum(ct) AS BIGINT) FROM tgtp) AS tt,
       |                (SELECT CAST(sum(cr) AS BIGINT) FROM rawp) AS tr),
       |ratio AS (SELECT b,
       |                 CAST(round((ln((coalesce(ct, 0) + 1) / (tt + $b)) -
       |                             ln((cr + 1) / (tr + $b))) * 1e9)
       |                      AS BIGINT) AS lr9
       |          FROM rawp LEFT JOIN tgtp USING (b) CROSS JOIN tots),
       |dw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |              CAST(sum(lr9) AS BIGINT) AS s9
       |       FROM rawf JOIN ratio USING (b) GROUP BY 1)""".stripMargin
  }

  /** DuckDB mirror of x_semdedup: the shared k-means assignment CTEs,
    * then within-cell smaller-id neighbors at >= tau cosine (same
    * sequential-fold dot/norm — the unrounded compare is the proven
    * x_cosine_pairs equivalence). */
  private def semDedupSql: String =
    s"""WITH $ivfAssignCtes,
       |dup AS (SELECT DISTINCT b.vec_id AS ib
       |        FROM af a JOIN af b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |        WHERE ${ivfDotL("a.v", "b.v")} /
       |              (sqrt(${ivfNorm2("a.v")}) * sqrt(${ivfNorm2("b.v")}))
       |              >= CAST('${SemDedupTau.toString}' AS DOUBLE))
       |SELECT af.vec_id, CAST(af.cid AS INTEGER) AS cid,
       |       af.vec_id NOT IN (SELECT ib FROM dup) AS kept
       |FROM af ORDER BY af.vec_id""".stripMargin

  /** DuckDB replay of the trained-trigram language ID — shared by
    * x_langid_trigram (argmax only) and x_langid_margin (plus the
    * best − second-best confidence margin off a sorted score list).
    * One builder so the two cannot train different profiles. */
  private def langIdTrigramSql(margin: Boolean): String = {
    val langs = LangIdLangs
    val lam = s"CAST('${TextStats.LangIdLambda}' AS DOUBLE)"
    val oneMinus = s"CAST('${1.0 - TextStats.LangIdLambda}' AS DOUBLE)"
    val gramList = "[substr(txt, i, 3) for i in generate_series(1, len(txt) - 2)]"
    val cCols = langs.map(l =>
      s"sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS c_$l").mkString(", ")
    val tCols = langs.map(l =>
      s"sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS t_$l").mkString(", ")
    val cTot = langs.map(l => s"coalesce(c_$l, 0)").mkString(" + ")
    val tTot = langs.map(l => s"t_$l").mkString(" + ")
    val bg = s"(($cTot + 1) / ($tTot + v))"
    val lpCols = langs.map(l =>
      s"CAST(round(ln($lam * (CASE WHEN t_$l > 0 THEN coalesce(c_$l, 0) / t_$l " +
        s"ELSE CAST(0.0 AS DOUBLE) END) + $oneMinus * $bg) * 1e9) AS BIGINT) AS lp_$l")
      .mkString(",\n             ")
    val sCols = langs.map(l => s"CAST(sum(lp_$l) AS BIGINT) AS s_$l").mkString(", ")
    val mx = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val caseArms = langs.sorted.reverse.init
      .map(l => s"WHEN s_$l = $mx THEN '$l'").mkString("\n            ")
    val sortedList = langs.map(l => s"s_$l").mkString("list_sort([", ", ", "])")
    val marginCol =
      if (!margin) ""
      else
        s""",
           |       CASE WHEN sc.doc_id IS NULL THEN NULL
           |            ELSE $sortedList[${langs.length}]
           |                 - $sortedList[${langs.length - 1}] END AS margin9""".stripMargin
    s"""WITH lt AS (SELECT doc_id, lang, lower(text) AS txt FROM documents),
       |tg AS (SELECT lang, unnest($gramList) AS g
       |       FROM lt WHERE doc_id % 2 = 0 AND len(txt) >= 3),
       |prof AS (SELECT g, $cCols FROM tg GROUP BY g),
       |tot AS (SELECT $tCols, count(DISTINCT g) AS v FROM tg),
       |pos AS (SELECT doc_id, unnest($gramList) AS g
       |        FROM lt WHERE len(txt) >= 3),
       |j AS (SELECT pos.doc_id,
       |             $lpCols
       |      FROM pos LEFT JOIN prof USING (g) CROSS JOIN tot),
       |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams, $sCols
       |       FROM j GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(sc.n_trigrams, 0) AS BIGINT) AS n_trigrams,
       |       CASE WHEN sc.doc_id IS NULL THEN 'und'
       |            $caseArms
       |            ELSE '${langs.sorted.head}' END AS lang_pred$marginCol
       |FROM documents d LEFT JOIN sc USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB mirror of x_sim_bruteforce (exact cosine top-5 for the
    * first 5 vectors) — also reused as a CTE by x_ann_recall. */
  private val simBruteforceSql: String =
    s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |             sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |               [v[i] * v[i] for i in generate_series(1, 64)]), (a, b) -> a + b)) AS nrm
      |      FROM e),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
      |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
      |                  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |                    [c.v[i] * q.qv[i] for i in generate_series(1, 64)]), (a, b) -> a + b)
      |                  / (c.nrm * q.qn) AS score
      |           FROM n c CROSS JOIN q),
      |ranked AS (SELECT query_id, neighbor_id,
      |                  row_number() OVER (PARTITION BY query_id
      |                                     ORDER BY score DESC, neighbor_id) AS rank,
      |                  round(score, 6) AS score_r
      |           FROM scored)
      |SELECT query_id, neighbor_id, rank, score_r
      |FROM ranked WHERE rank <= $AnnK ORDER BY query_id, rank""".stripMargin

  /** DuckDB mirror of the int8-quantized brute-force ranking: same
    * one-pass symmetric grid (127/max|x| scale; floor/ceil half-offset
    * rounding — plain exact double ops in both engines), same
    * sequential-fold dot/norm as simBruteforceSql. */
  private val simQuantizedSql: String =
    s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
      |sc AS (SELECT vec_id, v,
      |              CASE WHEN list_max([abs(x) for x in v]) = 0 THEN CAST(0.0 AS DOUBLE)
      |                   ELSE 127 / list_max([abs(x) for x in v]) END AS s
      |       FROM e),
      |q8 AS (SELECT vec_id,
      |              [CASE WHEN x * s >= 0 THEN floor(x * s + 0.5)
      |                    ELSE ceil(x * s - 0.5) END for x in v] AS qv
      |       FROM sc),
      |n AS (SELECT vec_id, qv, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |             [qv[i] * qv[i] for i in generate_series(1, 64)]), (a, b) -> a + b)) AS nrm
      |      FROM q8),
      |q AS (SELECT vec_id AS query_id, qv AS uqv, nrm AS qn FROM n WHERE vec_id < 5),
      |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
      |                  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |                    [c.qv[i] * q.uqv[i] for i in generate_series(1, 64)]), (a, b) -> a + b)
      |                  / (c.nrm * q.qn) AS score
      |           FROM n c CROSS JOIN q),
      |ranked AS (SELECT query_id, neighbor_id,
      |                  row_number() OVER (PARTITION BY query_id
      |                                     ORDER BY score DESC, neighbor_id) AS rank
      |           FROM scored)
      |SELECT query_id, neighbor_id FROM ranked WHERE rank <= $AnnK""".stripMargin

  /** DuckDB mirror of the JL-projected brute-force top-5: the same 16
    * Gaussian direction arrays injected as literals, the same
    * sequential-fold projection and scoring, row_number ties broken by
    * neighbor id — shared shape with [[simQuantizedSql]]. */
  private def simJlSql: String = {
    val planes = Similarity.planeLiterals(dims = 64, planes = JlDims,
      seed = Seed + 9)
    def proj(p: Seq[Double]): String = {
      val lst = p.mkString("[", ", ", "]")
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"[v[i] * ($lst)[i] for i in generate_series(1, 64)]), (a, b) -> a + b)"
    }
    val jvExpr = planes.map(proj).mkString("[", ",\n         ", "]")
    s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
       |jp AS (SELECT vec_id, $jvExpr AS jv FROM e),
       |n AS (SELECT vec_id, jv, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        [jv[i] * jv[i] for i in generate_series(1, $JlDims)]), (a, b) -> a + b)) AS nrm
       |      FROM jp),
       |q AS (SELECT vec_id AS query_id, jv AS qv, nrm AS qn FROM n WHERE vec_id < 5),
       |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |                  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |                    [c.jv[i] * q.qv[i] for i in generate_series(1, $JlDims)]), (a, b) -> a + b)
       |                  / (c.nrm * q.qn) AS score
       |           FROM n c CROSS JOIN q),
       |ranked AS (SELECT query_id, neighbor_id,
       |                  row_number() OVER (PARTITION BY query_id
       |                                     ORDER BY score DESC, neighbor_id) AS rank
       |           FROM scored)
       |SELECT query_id, neighbor_id FROM ranked WHERE rank <= $AnnK""".stripMargin
  }

  private val extOracles: Map[String, String] = Map(
    // JL-projection recall: the float baseline and the 16-dim ranking
    // share their oracle CTEs verbatim, so the measured distortion of
    // the 4×-dimensionality-reduction path is exactly cross-checked.
    "x_jl_recall" ->
      s"""WITH bf AS ($simBruteforceSql),
         |jbf AS ($simJlSql),
         |hits AS (SELECT bf.query_id, count(*) AS n_hit
         |         FROM bf JOIN jbf USING (query_id, neighbor_id)
         |         GROUP BY bf.query_id)
         |SELECT query_id, CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
         |       CAST(coalesce(n_hit, 0) * ${100 / AnnK} AS BIGINT) AS recall_pct
         |FROM (SELECT DISTINCT query_id FROM bf) q
         |LEFT JOIN hits USING (query_id)
         |ORDER BY query_id""".stripMargin,

    // Quantized-ANN recall: both rankings replayed in full (the float
    // baseline and the int8 ranking share the oracle CTEs verbatim),
    // so the measured accuracy of the 4×-bandwidth path is itself
    // exactly cross-engine-checked.
    // PQ-ADC recall replay: per-subspace Lloyd (shared pinit), code
    // joins to the final codebooks, adist ranking, recall vs bf.
    "x_pq_recall" -> pqRecallSql,

    // The persisted-index probe shares the same ADC CTEs (identical
    // build parameters ⇒ identical ranking).
    "x_pq_probe" -> pqProbeSql,

    "x_quantized_recall" ->
      s"""WITH bf AS ($simBruteforceSql),
         |qbf AS ($simQuantizedSql),
         |hits AS (SELECT bf.query_id, count(*) AS n_hit
         |         FROM bf JOIN qbf USING (query_id, neighbor_id)
         |         GROUP BY bf.query_id)
         |SELECT query_id, CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
         |       CAST(coalesce(n_hit, 0) * ${100 / AnnK} AS BIGINT) AS recall_pct
         |FROM (SELECT DISTINCT query_id FROM bf) q
         |LEFT JOIN hits USING (query_id)
         |ORDER BY query_id""".stripMargin,
    // Split-assignment replay: the same md5 uniform and the same IEEE
    // cumulative cuts (embedded via Double.toString, which round-trips
    // exactly through DuckDB's literal parser).
    "x_split_assign" ->
      s"""SELECT doc_id, $splitCaseSql AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    // Cluster-aware split replay: the same transitive-closure CTE as
    // x_dedup_clusters, singletons keyed on themselves, the SAME split
    // cut literals keyed on `rep` (splitCaseSqlOn — cannot drift).
    "x_split_by_cluster" ->
      s"""WITH cl AS (${jaccardClustersSql(0.05)}),
         |w AS (SELECT d.doc_id, COALESCE(cl.rep, d.doc_id) AS rep
         |      FROM documents d LEFT JOIN cl ON cl.id = d.doc_id)
         |SELECT doc_id, rep, ${splitCaseSqlOn("rep")} AS split
         |FROM w ORDER BY doc_id""".stripMargin,

    // Stratified-sample replay: same md5 uniform (distinct stream from
    // the split), same rate literals (Double.toString round-trips).
    "x_stratified_sample" -> {
      val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_sample' || " +
        s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      val whens = SampleRates.toSeq.sortBy(_._1)
        .map { case (k, v) => s"WHEN lang = '$k' THEN $v" }.mkString(" ")
      s"""SELECT doc_id, lang FROM documents
         |WHERE $u < (CASE $whens ELSE $SampleDefaultRate END)
         |ORDER BY doc_id""".stripMargin
    },

    // Decontamination replay: same distinct word 3-grams (short docs
    // contribute their whole token sequence), same 60-bit md5 gram keys
    // joined against the benchmark slice's distinct key set.
    "x_decontaminate" -> {
      val gramsCase =
        """CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
          |     ELSE [array_to_string(tk[i:i+2], ' ')
          |           for i in generate_series(1, len(tk) - 2)] END""".stripMargin
      val key = s"('0x' || substr(md5(g), 1, 15))::BIGINT % ${Dedup.MinhashPrime}"
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |docg AS (SELECT doc_id, unnest(list_distinct($gramsCase)) AS g
         |         FROM toks WHERE doc_id % 50 <> 0),
         |bg AS (SELECT DISTINCT $key AS k
         |       FROM (SELECT unnest(list_distinct($gramsCase)) AS g
         |             FROM toks WHERE doc_id % 50 = 0)),
         |dk AS (SELECT doc_id, $key AS k FROM docg)
         |SELECT doc_id, count(*) AS n_overlap_grams
         |FROM dk JOIN bg USING (k)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    // Semantic decontamination replay: the simBruteforceSql fold
    // shape across the vec_id%50 benchmark split — threshold on the
    // unrounded score, argmax per train vector with bench-id
    // tie-break, single terminal round(6).
    "x_decon_semantic" ->
      s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
         |n AS (SELECT vec_id, v,
         |             sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |               [v[i] * v[i] for i in generate_series(1, 64)]), (a, b) -> a + b)) AS nrm
         |      FROM e),
         |b AS (SELECT vec_id AS bench_id, v AS bv, nrm AS bn FROM n WHERE vec_id % 50 = 0),
         |t AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 50 <> 0),
         |s AS (SELECT t.vec_id, b.bench_id,
         |             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |               [t.v[i] * b.bv[i] for i in generate_series(1, 64)]), (a, b) -> a + b)
         |             / (t.nrm * b.bn) AS score
         |      FROM t CROSS JOIN b),
         |f AS (SELECT vec_id, bench_id, score,
         |             row_number() OVER (PARTITION BY vec_id
         |                                ORDER BY score DESC, bench_id) AS rk
         |      FROM s WHERE score >= 0.35)
         |SELECT vec_id, bench_id, round(score, 6) AS score_r
         |FROM f WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    // Verbatim-window decontamination replay: the x_substring_dedup
    // window CTE across the two benchmark-split sides (engine joins on
    // window hashes, oracle on window strings — the proven 2^-64
    // equivalence).
    "x_decontaminate_substr" -> decontWindowSql,

    // The Bloom-prefiltered variant is EXACT by construction (the
    // verify join removes the Bloom's false positives), so it shares
    // the verbatim-window oracle — the filter changes the plan, not
    // the answer.
    "x_bloom_decontaminate" -> decontWindowSql,

    // KMV replay: the sketch's bounded-state answer equals the k
    // smallest DISTINCT md5 uniforms per group by construction, so the
    // oracle computes it as a window over the distinct-u frame.
    "x_kmv_distinct" -> {
      val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'kmv' || " +
        s"chr(1) || term), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      s"""WITH tok AS (SELECT lang, unnest($toksSql) AS term FROM documents),
         |u AS (SELECT DISTINCT lang, $u AS u FROM tok),
         |r AS (SELECT lang, u,
         |             row_number() OVER (PARTITION BY lang ORDER BY u) AS rk,
         |             count(*) OVER (PARTITION BY lang) AS nd
         |      FROM u),
         |est AS (SELECT lang,
         |               CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
         |                    ELSE 63 / max(CASE WHEN rk = 64 THEN u END) END
         |                 AS est_distinct
         |        FROM r GROUP BY lang),
         |ex AS (SELECT lang, CAST(count(DISTINCT term) AS BIGINT) AS n_distinct
         |       FROM tok GROUP BY lang)
         |SELECT lang, est_distinct, n_distinct FROM est JOIN ex USING (lang)
         |ORDER BY lang""".stripMargin
    },

    // Heaps replay: per-term min checkpoint, per-checkpoint new-term
    // counts, cumulative window over the checkpoint frame.
    "x_heaps_law" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |ckd AS (SELECT (CAST(floor(doc_id / 50.0) AS BIGINT) + 1) * 50 AS checkpoint,
         |               term FROM tok),
         |mass AS (SELECT checkpoint, CAST(count(*) AS BIGINT) AS n_tok
         |         FROM ckd GROUP BY 1),
         |fo AS (SELECT term, min(checkpoint) AS first_ck FROM ckd GROUP BY 1),
         |nw AS (SELECT first_ck AS checkpoint, CAST(count(*) AS BIGINT) AS n_new
         |       FROM fo GROUP BY 1),
         |j AS (SELECT coalesce(m.checkpoint, n.checkpoint) AS checkpoint,
         |             coalesce(n_tok, 0) AS n_tok, coalesce(n_new, 0) AS n_new
         |      FROM mass m FULL JOIN nw n ON m.checkpoint = n.checkpoint)
         |SELECT checkpoint, n_tok, n_new,
         |       CAST(sum(n_tok) OVER (ORDER BY checkpoint) AS BIGINT) AS tokens_cum,
         |       CAST(sum(n_new) OVER (ORDER BY checkpoint) AS BIGINT) AS vocab_cum
         |FROM j ORDER BY checkpoint""".stripMargin,

    // KL replay: word-string grouping stands in for the engine's
    // hashed keys; identical p·ln(p/q) double expression, contributions
    // grid-quantized before the order-independent sum.
    "x_source_kl" ->
      s"""WITH tok AS (SELECT source, unnest($toksSql) AS w FROM documents),
         |st AS (SELECT source, w, CAST(count(*) AS BIGINT) AS cst
         |       FROM tok GROUP BY 1, 2),
         |ct AS (SELECT w, CAST(sum(cst) AS BIGINT) AS ctot FROM st GROUP BY 1),
         |ts AS (SELECT source, CAST(sum(cst) AS BIGINT) AS tsum,
         |              CAST(count(*) AS BIGINT) AS n_terms
         |       FROM st GROUP BY 1),
         |tt AS (SELECT CAST(sum(ctot) AS BIGINT) AS t FROM ct),
         |c AS (SELECT st.source,
         |        CAST(round((CAST(cst AS DOUBLE) / CAST(tsum AS DOUBLE)) *
         |          ln((CAST(cst AS DOUBLE) / CAST(tsum AS DOUBLE)) /
         |             (CAST(ctot AS DOUBLE) / CAST(t AS DOUBLE))) * 1e9)
         |          AS BIGINT) AS kl9
         |      FROM st JOIN ct USING (w) JOIN ts USING (source) CROSS JOIN tt),
         |k AS (SELECT source, CAST(sum(kl9) AS BIGINT) AS k9 FROM c GROUP BY 1)
         |SELECT source, tsum AS n_tokens, n_terms, k9 / 1e9 AS kl_divergence
         |FROM k JOIN ts USING (source) ORDER BY source""".stripMargin,

    // Zipf replay: row_number rank (tie order is free — the OLS sums
    // see only the (rank, count) multiset, which ties cannot change);
    // per-rank log terms quantized before summing; the closing
    // slope/intercept arithmetic is the same IEEE expression.
    "x_zipf_slope" ->
      s"""WITH tok AS (SELECT lang, unnest($toksSql) AS w FROM documents),
         |c AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
         |      FROM tok GROUP BY 1, 2),
         |r AS (SELECT lang, cnt, CAST(row_number() OVER (PARTITION BY lang
         |        ORDER BY cnt DESC) AS BIGINT) AS rk FROM c),
         |q AS (SELECT lang, rk, cnt FROM r WHERE rk <= 500),
         |g AS (SELECT lang,
         |        CAST(round(ln(CAST(rk AS DOUBLE)) * 1e9) AS BIGINT) AS x9,
         |        CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e9) AS BIGINT) AS y9,
         |        CAST(round(ln(CAST(rk AS DOUBLE)) * ln(CAST(cnt AS DOUBLE))
         |          * 1e9) AS BIGINT) AS xy9,
         |        CAST(round(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE))
         |          * 1e9) AS BIGINT) AS xx9
         |      FROM q),
         |s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(x9) AS BIGINT) AS sx, CAST(sum(y9) AS BIGINT) AS sy,
         |        CAST(sum(xy9) AS BIGINT) AS sxy,
         |        CAST(sum(xx9) AS BIGINT) AS sxx
         |      FROM g GROUP BY 1),
         |f AS (SELECT lang, n,
         |        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) / 1e9
         |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / 1e18)
         |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) / 1e9
         |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / 1e18) AS slope,
         |        CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
         |      FROM s)
         |SELECT lang, n AS n_ranks, slope,
         |       (syd / 1e9 - slope * (sxd / 1e9)) / CAST(n AS DOUBLE) AS intercept
         |FROM f ORDER BY lang""".stripMargin,

    // Entropy replay: per-character unnest (the engine fuses this into
    // one kernel pass), identical -p·ln(p) contributions on the grid;
    // docs with no characters coalesce to 0.
    "x_char_entropy" ->
      s"""WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '[\\s\\S]')) AS c
         |            FROM documents),
         |cc AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n
         |       FROM ch GROUP BY 1, 2),
         |l AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS ln_ FROM cc GROUP BY 1),
         |e AS (SELECT cc.doc_id,
         |        CAST(sum(CAST(round(-(CAST(n AS DOUBLE) / CAST(ln_ AS DOUBLE)) *
         |          ln(CAST(n AS DOUBLE) / CAST(ln_ AS DOUBLE)) * 1e9) AS BIGINT))
         |          AS BIGINT) AS e9
         |      FROM cc JOIN l USING (doc_id) GROUP BY 1)
         |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
         |       coalesce(e.e9, 0) / 1e9 AS entropy
         |FROM documents d LEFT JOIN e USING (doc_id) ORDER BY doc_id""".stripMargin,

    // PMI replay: bigram/unigram count tables, identical
    // ln(pB/(p1·p2)) double expression on the grid, same
    // (score desc, gram) top-50 cut.
    "x_pmi_bigrams" ->
      s"""WITH tk AS (SELECT $toksSql AS t FROM documents),
         |bg AS (SELECT unnest([{'w1': t[i], 'w2': t[i+1]}
         |          for i in generate_series(1, len(t) - 1)]) AS z
         |       FROM tk WHERE len(t) >= 2),
         |b AS (SELECT z.w1 AS w1, z.w2 AS w2, CAST(count(*) AS BIGINT) AS n
         |      FROM bg GROUP BY 1, 2),
         |u AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
         |      FROM (SELECT unnest(t) AS w FROM tk) GROUP BY 1),
         |tb AS (SELECT CAST(sum(n) AS BIGINT) AS tb FROM b),
         |tu AS (SELECT CAST(sum(cu) AS BIGINT) AS tu FROM u),
         |sc AS (SELECT w1, w2, n,
         |         CAST(round(ln((CAST(n AS DOUBLE) / CAST(tb AS DOUBLE)) /
         |           ((CAST(c1.cu AS DOUBLE) / CAST(tu AS DOUBLE)) *
         |            (CAST(c2.cu AS DOUBLE) / CAST(tu AS DOUBLE)))) * 1e9)
         |           AS BIGINT) AS pmi9
         |       FROM b JOIN u c1 ON c1.w = b.w1 JOIN u c2 ON c2.w = b.w2
         |       CROSS JOIN tb CROSS JOIN tu WHERE n >= 5)
         |SELECT w1, w2, n, pmi9 / 1e9 AS pmi FROM sc
         |ORDER BY pmi9 DESC, w1, w2 LIMIT 50""".stripMargin,

    // Leakage replay: the exact-Jaccard truth at 0.7 (same distinct
    // word-3-gram construction as x_jaccard_pairs) joined to the
    // splitCaseSql labels on both endpoints.
    "x_split_leakage" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |grams AS (SELECT doc_id, unnest(list_distinct(
         |            CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |                 ELSE [array_to_string(tk[i:i+2], ' ')
         |                       for i in generate_series(1, len(tk) - 2)] END)) AS g
         |          FROM toks),
         |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
         |inter AS (SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS n_common
         |          FROM grams ga JOIN grams gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id
         |          GROUP BY 1, 2),
         |j AS (SELECT a, b,
         |        CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
         |      FROM inter
         |      JOIN sizes sa ON sa.doc_id = a
         |      JOIN sizes sb ON sb.doc_id = b
         |      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
         |        >= CAST('0.7' AS DOUBLE)),
         |sp AS (SELECT doc_id, $splitCaseSql AS split FROM documents)
         |SELECT j.a, j.b, spa.split AS split_a, spb.split AS split_b, j.jaccard
         |FROM j
         |JOIN sp spa ON spa.doc_id = j.a
         |JOIN sp spb ON spb.doc_id = j.b
         |WHERE spa.split <> spb.split ORDER BY a, b""".stripMargin,

    // OOV replay: same corpus-count floor, word-string counts standing
    // in for the hashed-key counts.
    "x_oov_rate" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |v AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(sum(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |       CAST(sum(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE) AS oov_rate
         |FROM tok JOIN v USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Benchmark-overlap replay: x_decontaminate's gram/key construction
    // with the sides swapped and a left join so zero-hit rows survive.
    "x_bench_overlap" -> {
      val gramsCase =
        """CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
          |     ELSE [array_to_string(tk[i:i+2], ' ')
          |           for i in generate_series(1, len(tk) - 2)] END""".stripMargin
      val key = s"('0x' || substr(md5(g), 1, 15))::BIGINT % ${Dedup.MinhashPrime}"
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |bg AS (SELECT doc_id, unnest(list_distinct($gramsCase)) AS g
         |       FROM toks WHERE doc_id % 50 = 0),
         |ck AS (SELECT DISTINCT $key AS k
         |       FROM (SELECT unnest(list_distinct($gramsCase)) AS g
         |             FROM toks WHERE doc_id % 50 <> 0)),
         |bk AS (SELECT doc_id, $key AS k FROM bg),
         |h AS (SELECT bk.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |        CAST(sum(CASE WHEN ck.k IS NOT NULL THEN 1 ELSE 0 END)
         |          AS BIGINT) AS n_hit
         |      FROM bk LEFT JOIN ck ON bk.k = ck.k GROUP BY 1)
         |SELECT doc_id, n_grams, n_hit,
         |       CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) AS overlap_frac
         |FROM h ORDER BY doc_id""".stripMargin
    },

    // Source-overlap replay: distinct (source, gram) from the same
    // short-doc-aware gram construction; string grams stand in for the
    // engine's hashed shingles (proven 2^-64 equivalence).
    "x_source_overlap" -> {
      val gramsCase =
        """CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
          |     ELSE [array_to_string(tk[i:i+2], ' ')
          |           for i in generate_series(1, len(tk) - 2)] END""".stripMargin
      s"""WITH toks AS (SELECT source, $toksSql AS tk FROM documents),
         |gr AS (SELECT source, unnest(list_distinct($gramsCase)) AS g FROM toks),
         |g AS (SELECT DISTINCT source, g FROM gr),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
         |inter AS (SELECT ga.source AS a, gb.source AS b,
         |                 CAST(count(*) AS BIGINT) AS n_common
         |          FROM g ga JOIN g gb ON ga.g = gb.g AND ga.source < gb.source
         |          GROUP BY 1, 2)
         |SELECT a, b, n_common,
         |       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
         |FROM inter
         |JOIN sz sa ON sa.source = a
         |JOIN sz sb ON sb.source = b
         |ORDER BY a, b""".stripMargin
    },

    // Bottom-k minwise replay: same gram strings, same 52-bit md5
    // longs (stream botk), k smallest per source, k smallest of each
    // pair's union, membership counted against both signatures.
    "x_bottomk_overlap" -> {
      val gramsCase =
        """CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
          |     ELSE [array_to_string(tk[i:i+2], ' ')
          |           for i in generate_series(1, len(tk) - 2)] END""".stripMargin
      val h = s"(('0x' || substr(md5('$Seed' || chr(1) || 'botk' || " +
        "chr(1) || g), 1, 13))::BIGINT)"
      s"""WITH toks AS (SELECT source, $toksSql AS tk FROM documents),
         |gr AS (SELECT source, unnest($gramsCase) AS g FROM toks),
         |hv AS (SELECT DISTINCT source, $h AS h FROM gr),
         |r AS (SELECT source, h, row_number() OVER (
         |        PARTITION BY source ORDER BY h) AS rk FROM hv),
         |sig AS (SELECT source, h FROM r WHERE rk <= 256),
         |gs AS (SELECT DISTINCT source FROM sig),
         |p AS (SELECT g1.source AS a, g2.source AS b
         |      FROM gs g1, gs g2 WHERE g1.source < g2.source),
         |u AS (SELECT p.a, p.b, s.h FROM p JOIN sig s
         |        ON s.source = p.a OR s.source = p.b
         |      GROUP BY 1, 2, 3),
         |ur AS (SELECT a, b, h, row_number() OVER (
         |         PARTITION BY a, b ORDER BY h) AS rk FROM u),
         |uk AS (SELECT a, b, h FROM ur WHERE rk <= 256),
         |x AS (SELECT uk.a, uk.b, CAST(count(*) AS BIGINT) AS n_sample,
         |        CAST(count(*) FILTER (WHERE sa.h IS NOT NULL
         |          AND sb.h IS NOT NULL) AS BIGINT) AS n_both
         |      FROM uk
         |      LEFT JOIN sig sa ON sa.source = uk.a AND sa.h = uk.h
         |      LEFT JOIN sig sb ON sb.source = uk.b AND sb.h = uk.h
         |      GROUP BY 1, 2)
         |SELECT a, b, n_sample, n_both,
         |       CAST(n_both AS DOUBLE) / n_sample AS est_jaccard
         |FROM x WHERE n_both > 0 ORDER BY a, b""".stripMargin
    },

    // Cell-sample replay: the shared k-means assignment (ivfAssignCtes)
    // plus the per-cell keep rate and the engine's md5-uniform stream.
    "x_cell_sample" -> {
      val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'cell_sample' || " +
        s"chr(1) || vec_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      s"""WITH $ivfAssignCtes,
         |cnt AS (SELECT cid, CAST(count(*) AS BIGINT) AS n FROM af GROUP BY 1),
         |r AS (SELECT cid, least(CAST('1.0' AS DOUBLE),
         |        CAST('20.0' AS DOUBLE) / CAST(n AS DOUBLE)) AS rate FROM cnt)
         |SELECT af.vec_id, CAST(af.cid AS INTEGER) AS cid
         |FROM af JOIN r ON r.cid = af.cid
         |WHERE $u < rate
         |ORDER BY vec_id""".stripMargin
    },

    // Domain-cap replay: the bounded TopK aggregator's (score desc, id
    // asc) order IS row_number's; rank NULL for rows past the cap.
    "x_source_cap" ->
      s"""WITH r AS (SELECT doc_id, source,
         |             row_number() OVER (PARTITION BY source
         |               ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id) AS rk
         |           FROM documents)
         |SELECT doc_id, source,
         |       CASE WHEN rk <= 10 THEN CAST(rk AS INT) END AS rank,
         |       (rk <= 10) AS kept
         |FROM r ORDER BY doc_id""".stripMargin,

    // Temperature replay: identical p^(1/T) with the exponent injected
    // as the same double; scaled weights quantized to the 1e-9 grid
    // before the normalizing sum (order-independent).
    "x_mix_temperature" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
         |           FROM documents GROUP BY 1),
         |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM c),
         |w AS (SELECT lang, n_docs,
         |        CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE) AS p_native,
         |        CAST(round(power(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE),
         |          CAST('${1.0 / 0.7}' AS DOUBLE)) * 1000000000.0) AS BIGINT) AS wq
         |      FROM c CROSS JOIN t),
         |z AS (SELECT CAST(sum(wq) AS BIGINT) AS zz FROM w)
         |SELECT lang, n_docs, p_native,
         |       CAST(wq AS DOUBLE) / CAST(zz AS DOUBLE) AS p_temp
         |FROM w CROSS JOIN z ORDER BY lang""".stripMargin,

    // Budget-mix replay: the oracle RE-DERIVES the desired shares the
    // engine computes in plan-time BigInt — same 1e-9 weight quanta
    // (identical double op order wt/s*1e9), HUGEINT floor-div for
    // budget·wq/Z — so the arithmetic is verified, not copied; avail
    // tokens from the shared tokenizer fragment.
    "x_mix_budget" -> {
      val vals = MixWeights.toSeq.sortBy(_._1)
        .map { case (k, v) => s"('$k', CAST('$v' AS DOUBLE))" }
        .mkString(", ")
      s"""WITH w AS (SELECT * FROM (VALUES $vals) t(lang, wt)),
         |tot AS (SELECT sum(wt) AS s FROM w),
         |q AS (SELECT lang, CAST(round(wt / s * 1000000000.0) AS BIGINT) AS wq
         |      FROM w CROSS JOIN tot),
         |z AS (SELECT sum(wq) AS zz FROM q),
         |d AS (SELECT lang,
         |        CAST((30000::HUGEINT * wq::HUGEINT) // zz::HUGEINT AS BIGINT)
         |          AS desired_tokens
         |      FROM q CROSS JOIN z),
         |a AS (SELECT lang, CAST(sum(len($toksSql)) AS BIGINT) AS avail_tokens
         |      FROM documents GROUP BY 1)
         |SELECT a.lang, avail_tokens, desired_tokens,
         |       least(avail_tokens, desired_tokens) AS kept_tokens,
         |       CASE WHEN avail_tokens = 0 THEN 0.0
         |            ELSE CAST(least(avail_tokens, desired_tokens) AS DOUBLE)
         |                 / CAST(avail_tokens AS DOUBLE) END AS rate,
         |       greatest(CAST(0 AS BIGINT), desired_tokens - avail_tokens)
         |         AS shortfall
         |FROM a JOIN d USING (lang) ORDER BY lang""".stripMargin
    },

    // HLL replay: register = 60-bit md5 mod 256, rho = 61 - len(bin(h))
    // (integer-exact — bin drops leading zeros in both engines), the
    // harmonic sum on the 1e-9 grid (floor(1e9·2^-M) is an exact
    // product: 1e9 = 5^9·2^9), linear-counting correction under 2.5m
    // with ln rounded at 4 decimals (Box–Muller ln precedent).
    "x_hll_distinct" -> {
      def h(stream: String) =
        s"('0x' || substr(md5('$Seed' || chr(1) || '$stream' || chr(1) || term), 1, 15))::BIGINT"
      s"""WITH tok AS (SELECT lang, unnest($toksSql) AS term FROM documents),
         |r AS (SELECT lang, ${h("hll/reg")} % 256 AS reg, ${h("hll/rho")} AS hv
         |      FROM tok),
         |mr AS (SELECT lang, reg,
         |         max(CASE WHEN hv = 0 THEN 61 ELSE 61 - len(bin(hv)) END) AS m_reg
         |       FROM r GROUP BY 1, 2),
         |ag AS (SELECT lang, count(*) AS nr,
         |          sum(CAST(floor(1000000000.0 * power(2.0, -m_reg)) AS BIGINT)) AS sp
         |       FROM mr GROUP BY 1),
         |e AS (SELECT lang, CAST(256 - nr AS BIGINT) AS n_zero_regs,
         |         CAST('${Sketches.hllAlphaM2E9(8)}' AS DOUBLE)
         |           / (sp + (256 - nr) * 1000000000) AS raw
         |      FROM ag),
         |ex AS (SELECT lang, CAST(count(DISTINCT term) AS BIGINT) AS n_distinct
         |       FROM tok GROUP BY lang)
         |SELECT lang, n_zero_regs,
         |       round(CASE WHEN raw <= 640.0 AND n_zero_regs > 0
         |             THEN 256.0 * ln(256.0 / n_zero_regs) ELSE raw END, 4) AS hll_est,
         |       n_distinct
         |FROM e JOIN ex USING (lang) ORDER BY lang""".stripMargin
    },

    // k-sample replay: rank = row_number over (u asc, id asc) per
    // group — exactly the TopK aggregator's pruning order.
    "x_sample_per_group" -> {
      val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_ksample' || " +
        s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      s"""WITH r AS (SELECT lang, doc_id,
         |                  row_number() OVER (PARTITION BY lang
         |                    ORDER BY $u, doc_id) AS rk
         |           FROM documents)
         |SELECT lang, CAST(rk AS INT) AS rank, doc_id
         |FROM r WHERE rk <= 5 ORDER BY lang, rank""".stripMargin
    },

    // Histogram replay: same clamped floor(x/width) grid, cumulative
    // window per group, quantile = lower edge of the first bin whose
    // running count reaches max(1, ceil(p*n)).
    "x_hist_quantiles" -> {
      val qCols = Seq(0.25, 0.5, 0.75, 0.9).map { p =>
        s"min(CASE WHEN cum >= greatest(1, ceil($p * n)) THEN bin END) * 8.0 AS q_${math.round(p * 1000)}"
      }.mkString(",\n       ")
      s"""WITH t AS (SELECT lang, CAST(len($toksSql) AS DOUBLE) AS x FROM documents),
         |b AS (SELECT lang,
         |             least(greatest(CAST(floor(x / 8.0) AS BIGINT), 0), 63) AS bin,
         |             CAST(count(*) AS BIGINT) AS c
         |      FROM t GROUP BY 1, 2),
         |cum AS (SELECT lang, bin,
         |               sum(c) OVER (PARTITION BY lang ORDER BY bin) AS cum,
         |               sum(c) OVER (PARTITION BY lang) AS n
         |        FROM b)
         |SELECT lang,
         |       $qCols
         |FROM cum GROUP BY lang ORDER BY lang""".stripMargin
    },

    // Mixture replay: same per-stratum counts, same double arithmetic
    // for scale/rates (BIGINT/DOUBLE division promotes to DOUBLE in
    // both engines; normalized weights injected as round-trip string
    // literals — see mixWhensSql), same md5 keep-decision.
    "x_mix_to" -> mixToSql,

    // Mixture-achievement report: the kept rows rolled up per stratum
    // against the normalized targets — how close the downsample
    // landed. Shares mixToSql (one replay) and mixWhensSql (one
    // normalization) with the mix queries.
    "x_mix_report" -> {
      val whens = mixWhensSql(MixWeights)
      s"""WITH m AS ($mixToSql),
         |k AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
         |      FROM m GROUP BY lang),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM m)
         |SELECT lang, n_kept,
         |       CAST(n_kept AS DOUBLE) / n_total AS achieved,
         |       CASE lang $whens END AS target,
         |       CAST(n_kept AS DOUBLE) / n_total
         |         - (CASE lang $whens END) AS deviation
         |FROM k CROSS JOIN t ORDER BY lang""".stripMargin
    },

    // Upsample replay: same per-stratum counts, scale = total kept rows
    // as DOUBLE, rate = (scale * w) / n in the same operation order
    // with normalized weights (mixWhensSql); repeats = floor(rate) +
    // (u < frac), replayed via unnest(range(1, reps + 1)).
    "x_mix_to_upsample" -> {
      val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_mix' || " +
        s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      val whens = mixWhensSql(MixUpWeights)
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |                  CASE lang $whens END AS w
         |           FROM documents GROUP BY lang),
         |cw AS (SELECT * FROM c WHERE w IS NOT NULL),
         |s AS (SELECT CAST(sum(n) AS DOUBLE) AS scale FROM cw),
         |r AS (SELECT lang, scale * w / n AS rate FROM cw CROSS JOIN s),
         |reps AS (SELECT d.doc_id, d.lang,
         |                CAST(floor(rate) AS BIGINT)
         |                  + (CASE WHEN $u < rate - floor(rate) THEN 1 ELSE 0 END)
         |                  AS nrep
         |         FROM documents d JOIN r USING (lang))
         |SELECT doc_id, lang, unnest(range(1, nrep + 1)) AS copy_idx
         |FROM reps WHERE nrep >= 1
         |ORDER BY doc_id, copy_idx""".stripMargin
    },

    // Sequence-packing replay: the two-phase bucketed prefix sum equals
    // a plain global window ORDER BY (u, doc_id) because the bucket id
    // floor(u*B) is monotone in u. Same 256.0-divisor double floor as
    // the Spark side (exact below 2^52); same BPE-ish subword counter.
    "x_pack_chunks" -> {
      val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_order' || " +
        s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      s"""WITH t AS (SELECT doc_id,
         |                  CAST($bpeishSql AS BIGINT) AS n_tokens,
         |                  $u AS u
         |           FROM documents),
         |o AS (SELECT doc_id, n_tokens,
         |             CAST(row_number() OVER (ORDER BY u, doc_id) - 1 AS BIGINT) AS ord,
         |             CAST(coalesce(sum(n_tokens) OVER (ORDER BY u, doc_id
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |                  0) AS BIGINT) AS start_tok
         |      FROM t)
         |SELECT doc_id, n_tokens, ord, start_tok,
         |       CAST(floor(start_tok / 256.0) AS BIGINT) AS pack_id,
         |       CAST(floor((start_tok + greatest(n_tokens, 1) - 1) / 256.0) AS BIGINT)
         |         - CAST(floor(start_tok / 256.0) AS BIGINT) + 1 AS pack_span
         |FROM o ORDER BY ord""".stripMargin
    },

    // Merges-based packing replay: the x_pack_chunks CTE with the
    // token counter swapped for real BPE counts. The injected merge
    // table (the SAME Bpe.StandardMerges constants the engine plan
    // carries) is applied by a recursive CTE over separator-wrapped
    // symbol strings — one left-to-right `replace` per merge level,
    // which equals the engine's sequential merge application (see
    // ext/Bpe.scala scaladoc for the equivalence argument). Each
    // symbol is wrapped as chr(1)||sym||chr(1), so a merge's pattern
    // matches exactly at symbol boundaries; merge operands are always
    // alphanumeric (only [A-Za-z0-9_]+ words have >1 symbol), and the
    // chr(1) separator cannot collide with corpus text by the same
    // ASCII-dataset grounds as the media oracles.
    // ENCODE replay: the same recursive replace ladder, with the final
    // separator-wrapped form split back into pieces and both indices
    // rebuilt positionally (driver compare is order-insensitive, the
    // (doc, w_idx, p_idx) key makes rows unambiguous anyway).
    "x_bpe_encode" ->
      s"""WITH RECURSIVE pw0 AS (
         |  SELECT doc_id, unnest([{'wi': i, 'w': arr[i]}
         |           for i in generate_series(1, len(arr))]) AS z
         |  FROM (SELECT doc_id, $bpeishExtractSql AS arr FROM documents)),
         |pw AS (SELECT doc_id, CAST(z.wi - 1 AS INT) AS w_idx, z.w AS w
         |       FROM pw0),
         |words AS (SELECT DISTINCT w FROM pw),
         |$bpeStepsCtes,
         |pieces AS (SELECT w, string_split(substr(s, 2, len(s) - 2),
         |                                  chr(1) || chr(1)) AS ps
         |           FROM steps WHERE lvl = $bpeNumMerges),
         |px0 AS (SELECT pw.doc_id, pw.w_idx,
         |               unnest([{'pj': j, 'p': ps[j]}
         |                 for j in generate_series(1, len(ps))]) AS z
         |        FROM pw JOIN pieces USING (w))
         |SELECT doc_id, w_idx, CAST(z.pj - 1 AS INT) AS p_idx, z.p AS piece
         |FROM px0 ORDER BY doc_id, w_idx, p_idx""".stripMargin,

    // Tokenizer-efficiency replay: same merges CTEs as
    // x_pack_chunks_bpe (shared bpeDocCountCtes), joined to the other
    // counter tiers; ratios are single double ops on exact integers.
    "x_bpe_compression" ->
      s"""WITH RECURSIVE $bpeDocCountCtes,
         |f AS (SELECT d.doc_id,
         |        CAST(strlen(d.text) AS BIGINT) AS n_bytes,
         |        CAST(len($toksSql) AS BIGINT) AS n_ws,
         |        CAST($bpeishSql AS BIGINT) AS n_bpeish,
         |        CAST(len(regexp_replace(d.text, '[ \\t\\n\\x0B\\f\\r]', '', 'g'))
         |          AS BIGINT) AS n_symbols,
         |        CAST(coalesce(dc.n_tokens, 0) AS BIGINT) AS n_bpe
         |      FROM documents d LEFT JOIN dc USING (doc_id))
         |SELECT doc_id, n_bytes, n_ws, n_bpeish, n_symbols, n_bpe,
         |       CASE WHEN n_bpe > 0 THEN CAST(n_bytes AS DOUBLE) / n_bpe
         |            ELSE 0.0 END AS bytes_per_token,
         |       CASE WHEN n_symbols > 0
         |            THEN 1.0 - CAST(n_bpe AS DOUBLE) / n_symbols
         |            ELSE 0.0 END AS merge_savings
         |FROM f ORDER BY doc_id""".stripMargin,

    "x_pack_chunks_bpe" -> {
      val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_order' || " +
        s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      s"""WITH RECURSIVE $bpeDocCountCtes,
         |t AS (SELECT d.doc_id, CAST(coalesce(dc.n_tokens, 0) AS BIGINT) AS n_tokens,
         |             $u AS u
         |      FROM documents d LEFT JOIN dc USING (doc_id)),
         |o AS (SELECT doc_id, n_tokens,
         |             CAST(row_number() OVER (ORDER BY u, doc_id) - 1 AS BIGINT) AS ord,
         |             CAST(coalesce(sum(n_tokens) OVER (ORDER BY u, doc_id
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |                  0) AS BIGINT) AS start_tok
         |      FROM t)
         |SELECT doc_id, n_tokens, ord, start_tok,
         |       CAST(floor(start_tok / 256.0) AS BIGINT) AS pack_id,
         |       CAST(floor((start_tok + greatest(n_tokens, 1) - 1) / 256.0) AS BIGINT)
         |         - CAST(floor(start_tok / 256.0) AS BIGINT) + 1 AS pack_span
         |FROM o ORDER BY ord""".stripMargin
    },

    // Pack-slice replay: same packChunks CTE, then one row per pack in
    // [pack_id, pack_id + pack_span) via unnest(range(...)), ranges
    // rebased to pack-local half-open offsets. Same BPE-ish counter.
    "x_pack_slices" -> packSlicesSql,

    // Pack utilization report: the slice replay rolled up per pack.
    "x_pack_stats" ->
      s"""WITH ps AS ($packSlicesSql)
         |SELECT pack_id, CAST(count(*) AS BIGINT) AS n_slices,
         |       CAST(sum(n_slice_tokens) AS BIGINT) AS pack_tokens,
         |       CAST(sum(n_slice_tokens) AS DOUBLE) / 256.0 AS utilization
         |FROM ps GROUP BY pack_id ORDER BY pack_id""".stripMargin,

    // TF-IDF replay: same tokenizer, same round(tf*ln(N/df), 9)
    // quantization, same (score desc, term) tie-break.
    "x_tfidf_topk" -> {
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |       FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |s AS (SELECT doc_id, term, tf, df, round(tf * ln(n / df), 9) AS score
         |      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM s)
         |SELECT doc_id, term, tf, df, score FROM r WHERE rk <= 3
         |ORDER BY doc_id, score DESC, term""".stripMargin
    },

    // BM25 replay: identical expression tree (constants injected as
    // round-trip string literals so DuckDB gets the exact doubles
    // Scala computed — never DECIMAL arithmetic), contributions
    // snapped to the 1e-9 grid before the order-independent long sum
    // (the unigram-logprob precedent), avgdl from exact integer
    // aggregates.
    "x_bm25_topk" -> {
      val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
      def d(x: Double) = s"CAST('$x' AS DOUBLE)"
      val k1 = 1.2
      val b = 0.75
      s"""WITH dl AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl FROM documents),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |       FROM (SELECT doc_id, unnest($toksSql) AS term FROM documents)
         |       WHERE term IN ($terms) GROUP BY 1, 2),
         |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |c AS (SELECT tf.doc_id,
         |             CAST(round(ln((n - df + ${d(0.5)}) / (df + ${d(0.5)}) + ${d(1.0)})
         |               * (tf * ${d(k1 + 1.0)}) / (tf + ${d(k1)} * (${d(1.0)} - ${d(b)}
         |               + ${d(b)} * dl / avgdl)) * 1e9) AS BIGINT) AS u9
         |      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
         |s AS (SELECT doc_id, CAST(sum(u9) AS BIGINT) AS score_u9 FROM c GROUP BY 1)
         |SELECT doc_id, score_u9, score_u9 / 1e9 AS score FROM s
         |ORDER BY score_u9 DESC, doc_id LIMIT 15""".stripMargin
    },

    // Chunking replay: same starts (multiples of stride below the
    // token count), same half-open clamps, same 1-based inclusive
    // token slice joined with single spaces.
    "x_chunk_docs" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |f AS (SELECT doc_id, tk,
         |             unnest(generate_series(0, len(tk) - 1, 16)) AS tok_from
         |      FROM t WHERE len(tk) > 0)
         |SELECT doc_id, CAST(tok_from // 16 AS INT) AS chunk_idx,
         |       CAST(tok_from AS BIGINT) AS tok_from,
         |       CAST(least(tok_from + 32, len(tk)) AS BIGINT) AS tok_to,
         |       CAST(least(tok_from + 32, len(tk)) - tok_from AS BIGINT) AS n_chunk_tokens,
         |       array_to_string(tk[tok_from + 1 : least(tok_from + 32, len(tk))], ' ')
         |         AS chunk_text
         |FROM f ORDER BY doc_id, chunk_idx""".stripMargin,

    // Recipe replay: the five stage oracles chained as CTEs in pipeline
    // order — quality predicate on the corpus split, the x_neardup_text
    // closure over the quality survivors (LSH recall 1.0, as pinned by
    // x_minhash_pairs), the x_decontaminate_substr window join over the
    // dedup survivors, the x_mix_to rate filter over the clean set, and
    // the x_pack_chunks prefix sum over the mixed set.
    // Funnel replay: counts over the same chained stage CTEs.
    "x_curate_funnel" ->
      s"""WITH kb AS (SELECT doc_id, text,
         |              row_number() OVER (PARTITION BY sha256(text)
         |                ORDER BY len(text) DESC, doc_id) AS rk
         |            FROM documents WHERE doc_id % 50 <> 0),
         |kept AS (SELECT doc_id, text FROM kb WHERE rk = 1),
         |kt AS (SELECT doc_id, $toksSql AS tk FROM kept),
         |dw AS (SELECT doc_id, unnest(list_distinct(
         |         [array_to_string(tk[i:i+7], ' ')
         |          for i in generate_series(1, len(tk) - 7)])) AS w
         |       FROM kt WHERE len(tk) >= 8),
         |bt AS (SELECT $toksSql AS tk FROM documents WHERE doc_id % 50 = 0),
         |bw AS (SELECT DISTINCT unnest(list_distinct(
         |         [array_to_string(tk[i:i+7], ' ')
         |          for i in generate_series(1, len(tk) - 7)])) AS w
         |       FROM bt WHERE len(tk) >= 8),
         |cont AS (SELECT DISTINCT doc_id FROM dw JOIN bw USING (w)),
         |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n_input FROM documents
         |       WHERE doc_id % 50 <> 0),
         |n2 AS (SELECT CAST(count(*) AS BIGINT) AS n_deduped FROM kept),
         |n3 AS (SELECT CAST(count(*) AS BIGINT) AS n_clean
         |       FROM kept k LEFT JOIN cont c ON k.doc_id = c.doc_id
         |       WHERE c.doc_id IS NULL)
         |SELECT n_input, n_deduped, n_clean,
         |       n_input - n_deduped AS n_dropped_dup,
         |       n_deduped - n_clean AS n_dropped_leak
         |FROM n1, n2, n3""".stripMargin,

    // Curation-recipe replay: the stage CTEs chained — keep-best
    // winners (rk=1 on len desc, id asc per digest), verbatim-window
    // contamination drop (the Bloom prefilter is answer-invariant, so
    // the oracle is the exact check), then the x_curriculum_order
    // replay over the clean survivors.
    "x_curate_e2e" -> {
      val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_curriculum' " +
        s"|| chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      s"""WITH kb AS (SELECT doc_id, text,
         |              row_number() OVER (PARTITION BY sha256(text)
         |                ORDER BY len(text) DESC, doc_id) AS rk
         |            FROM documents WHERE doc_id % 50 <> 0),
         |kept AS (SELECT doc_id, text FROM kb WHERE rk = 1),
         |kt AS (SELECT doc_id, $toksSql AS tk FROM kept),
         |dw AS (SELECT doc_id, unnest(list_distinct(
         |         [array_to_string(tk[i:i+7], ' ')
         |          for i in generate_series(1, len(tk) - 7)])) AS w
         |       FROM kt WHERE len(tk) >= 8),
         |bt AS (SELECT $toksSql AS tk FROM documents WHERE doc_id % 50 = 0),
         |bw AS (SELECT DISTINCT unnest(list_distinct(
         |         [array_to_string(tk[i:i+7], ' ')
         |          for i in generate_series(1, len(tk) - 7)])) AS w
         |       FROM bt WHERE len(tk) >= 8),
         |cont AS (SELECT DISTINCT doc_id FROM dw JOIN bw USING (w)),
         |clean AS (SELECT k.doc_id, k.text FROM kept k
         |          LEFT JOIN cont c ON k.doc_id = c.doc_id
         |          WHERE c.doc_id IS NULL),
         |f AS (SELECT doc_id, ($qualityBucketSql) AS qb FROM clean),
         |b AS (SELECT doc_id,
         |        CASE WHEN qb = 'good' THEN 0
         |             WHEN qb = 'fair' THEN 1 ELSE 2 END AS bucket_rank,
         |        $u AS u
         |      FROM f),
         |s AS (SELECT doc_id, bucket_rank,
         |        CAST(floor(u * 8) AS INTEGER) AS shard, u FROM b)
         |SELECT doc_id, bucket_rank, shard,
         |       CAST(row_number() OVER (PARTITION BY bucket_rank, shard
         |              ORDER BY u, doc_id) AS BIGINT) - 1 AS pos,
         |       CAST(row_number() OVER (ORDER BY bucket_rank, shard, u,
         |              doc_id) AS BIGINT) - 1 AS global_pos
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "x_recipe_e2e" -> {
      val uMix = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_mix' || " +
        s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      val uOrd = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_order' || " +
        s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      val winList = """list_distinct([array_to_string(tk[i:i+7], ' ')
                      |            for i in generate_series(1, len(tk) - 7)])""".stripMargin
      s"""WITH q AS (SELECT doc_id, lang, text FROM documents
         |           WHERE doc_id % 50 <> 0 AND ($qualityBucketSql) <> 'poor'),
         |cl AS (${jaccardClustersSql(0.3, "q")}),
         |sur AS (SELECT doc_id, lang, text FROM q
         |        WHERE doc_id NOT IN (SELECT id FROM cl WHERE id <> rep)),
         |stoks AS (SELECT doc_id, $toksSql AS tk FROM sur),
         |dw AS (SELECT doc_id, unnest($winList) AS w
         |       FROM stoks WHERE len(tk) >= 8),
         |btoks AS (SELECT $toksSql AS tk FROM documents WHERE doc_id % 50 = 0),
         |bw AS (SELECT DISTINCT unnest($winList) AS w
         |       FROM btoks WHERE len(tk) >= 8),
         |clean AS (SELECT doc_id, lang, text FROM sur
         |          WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM dw JOIN bw USING (w))),
         |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |             CASE lang ${mixWhensSql(MixWeights)} END AS w
         |      FROM clean GROUP BY lang),
         |cw AS (SELECT * FROM c WHERE w IS NOT NULL),
         |s AS (SELECT min(n / w) AS scale FROM cw),
         |r AS (SELECT lang, least(CAST(1.0 AS DOUBLE), scale * w / n) AS rate
         |      FROM cw CROSS JOIN s),
         |mixed AS (SELECT d.doc_id, d.text FROM clean d JOIN r USING (lang)
         |          WHERE $uMix < r.rate),
         |t AS (SELECT doc_id, CAST($bpeishSql AS BIGINT) AS n_tokens,
         |             $uOrd AS u
         |      FROM mixed),
         |o AS (SELECT doc_id, n_tokens,
         |             CAST(row_number() OVER (ORDER BY u, doc_id) - 1 AS BIGINT) AS ord,
         |             CAST(coalesce(sum(n_tokens) OVER (ORDER BY u, doc_id
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |                  0) AS BIGINT) AS start_tok
         |      FROM t)
         |SELECT doc_id, n_tokens, ord, start_tok,
         |       CAST(floor(start_tok / 256.0) AS BIGINT) AS pack_id,
         |       CAST(floor((start_tok + greatest(n_tokens, 1) - 1) / 256.0) AS BIGINT)
         |         - CAST(floor(start_tok / 256.0) AS BIGINT) + 1 AS pack_span
         |FROM o ORDER BY ord""".stripMargin
    },

    // Dedup-apply replay: survivors = documents minus non-representative
    // members of the exact transitive closure at the verify threshold
    // (same closure CTE as x_neardup_text).
    "x_dedup_apply" ->
      s"""WITH cl AS (${jaccardClustersSql(0.3)})
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM cl WHERE id <> rep)
         |ORDER BY doc_id""".stripMargin,

    // Bigram-LM replay: identical backoff CASE (alpha injected as a
    // round-trip string literal), same 1e-9 grid snap before the long
    // sum, positions via the proven list-comprehension bigram CTE.
    "x_bigram_logprob" ->
      s"""WITH $bigramLpCtes
         |SELECT doc_id, n_bigrams, avg_logprob
         |FROM lpf ORDER BY doc_id""".stripMargin,

    // Trigram-LM replay: word-string n-gram equality stands in for the
    // engine's xxhash64 keys (the bigram precedent); the λ-mix uses
    // injected double literals and the same ELSE-0 context guards.
    "x_trigram_logprob" -> {
      val (l3, l2, l1) = ("CAST('0.5' AS DOUBLE)", "CAST('0.3' AS DOUBLE)",
        "CAST('0.2' AS DOUBLE)")
      s"""WITH alltk AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |tr AS (SELECT doc_id, tk FROM alltk WHERE doc_id % 2 = 0),
         |t3z AS (SELECT unnest([{'w1': tk[i], 'w2': tk[i+1], 'w3': tk[i+2]}
         |           for i in generate_series(1, len(tk) - 2)]) AS z
         |        FROM tr WHERE len(tk) >= 3),
         |tri AS (SELECT z.w1 AS w1, z.w2 AS w2, z.w3 AS w3,
         |               CAST(count(*) AS BIGINT) AS c3
         |        FROM t3z GROUP BY 1, 2, 3),
         |t2z AS (SELECT unnest([{'w1': tk[i], 'w2': tk[i+1]}
         |           for i in generate_series(1, len(tk) - 1)]) AS z
         |        FROM tr WHERE len(tk) >= 2),
         |big AS (SELECT z.w1 AS w1, z.w2 AS w2, CAST(count(*) AS BIGINT) AS cb
         |        FROM t2z GROUP BY 1, 2),
         |ut AS (SELECT unnest(tk) AS w FROM tr),
         |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM ut GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS t,
         |               CAST(count(DISTINCT w) AS BIGINT) AS v FROM ut),
         |posz AS (SELECT doc_id, unnest([{'w1': tk[i], 'w2': tk[i+1], 'w3': tk[i+2]}
         |           for i in generate_series(1, len(tk) - 2)]) AS z
         |         FROM alltk WHERE len(tk) >= 3),
         |pos AS (SELECT doc_id, z.w1 AS w1, z.w2 AS w2, z.w3 AS w3 FROM posz),
         |j AS (SELECT pos.doc_id,
         |        $l3 * (CASE WHEN t.c3 IS NOT NULL AND b12.cb IS NOT NULL
         |                    THEN t.c3 / b12.cb ELSE 0.0 END)
         |        + $l2 * (CASE WHEN b23.cb IS NOT NULL AND u2.cu IS NOT NULL
         |                      THEN b23.cb / u2.cu ELSE 0.0 END)
         |        + $l1 * ((coalesce(u3.cu, 0) + 1) / (tot.t + tot.v)) AS p
         |      FROM pos
         |      LEFT JOIN tri t ON t.w1 = pos.w1 AND t.w2 = pos.w2 AND t.w3 = pos.w3
         |      LEFT JOIN big b12 ON b12.w1 = pos.w1 AND b12.w2 = pos.w2
         |      LEFT JOIN big b23 ON b23.w1 = pos.w2 AND b23.w2 = pos.w3
         |      LEFT JOIN uni u2 ON u2.w = pos.w2
         |      LEFT JOIN uni u3 ON u3.w = pos.w3
         |      CROSS JOIN tot),
         |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |             sum(CAST(round(ln(p) * 1e9) AS BIGINT)) AS s9
         |      FROM j GROUP BY 1)
         |SELECT doc_id, n_trigrams, s9 / (n_trigrams * 1e9) AS avg_logprob
         |FROM s ORDER BY doc_id""".stripMargin
    },

    // Worst-window replay: rolling 10-token sums per doc, argmin by
    // (roll9, pos) via rank-1 — the engine's min(struct) order.
    "x_worst_window" ->
      s"""WITH tok AS (SELECT doc_id, unnest(tk) AS term,
         |                    generate_subscripts(tk, 1) - 1 AS pos
         |             FROM (SELECT doc_id, $toksSql AS tk FROM documents)),
         |cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok),
         |lp AS (SELECT doc_id, pos,
         |         CAST(round(ln(cnt / total) * 1e9) AS BIGINT) AS lp9
         |       FROM tok JOIN cf USING (term) CROSS JOIN tot),
         |r AS (SELECT doc_id, pos,
         |        sum(lp9) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS roll9,
         |        count(*) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS nw
         |      FROM lp),
         |w AS (SELECT doc_id, pos, roll9,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY roll9, pos) AS rk
         |      FROM r WHERE nw = 10),
         |n AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |      FROM documents)
         |SELECT n.doc_id, n.n_tokens,
         |       CAST(w.pos - 9 AS BIGINT) AS worst_start,
         |       w.roll9 / (10 * 1e9) AS worst_avg_logprob
         |FROM n LEFT JOIN w ON w.doc_id = n.doc_id AND w.rk = 1
         |ORDER BY n.doc_id""".stripMargin,

    // CCNet perplexity bucketing: the bigram-LM score chain (shared
    // CTEs — the two oracles cannot train different LMs), joined to
    // CMS replay: same md5-salted row hashes, same 4×256 grid counts,
    // same min-over-rows estimate; the top-20 cut is fully ordered
    // (n_exact DESC, token) so the probe SET replays exactly.
    "x_cms_heavy" ->
      s"""WITH toku AS (SELECT unnest($toksSql) AS token FROM documents),
         |ga AS (SELECT token, i FROM toku, generate_series(0, 3) AS t(i)),
         |grid AS (SELECT i, ('0x' || substr(md5('$Seed' || chr(1) || 'cms' ||
         |                i::VARCHAR || chr(1) || token), 1, 15))::BIGINT % 256 AS b,
         |                CAST(count(*) AS BIGINT) AS c
         |         FROM ga GROUP BY 1, 2),
         |exact AS (SELECT token, CAST(count(*) AS BIGINT) AS n_exact FROM toku
         |          GROUP BY 1 ORDER BY n_exact DESC, token LIMIT 20),
         |pb AS (SELECT e.token, e.n_exact, t.i,
         |              ('0x' || substr(md5('$Seed' || chr(1) || 'cms' ||
         |                t.i::VARCHAR || chr(1) || e.token), 1, 15))::BIGINT % 256 AS b
         |       FROM exact e, generate_series(0, 3) AS t(i))
         |SELECT pb.token, pb.n_exact, min(g.c) AS cms_est
         |FROM pb JOIN grid g ON g.i = pb.i AND g.b = pb.b
         |GROUP BY 1, 2 ORDER BY n_exact DESC, token""".stripMargin,

    // Sharded-shuffle replay: same md5 uniform, same floor bucketing,
    // same (u, doc_id) within-shard order — row_number agrees because
    // the order keys are bit-identical doubles.
    "x_shuffle_shards" ->
      s"""WITH $shardCtes
         |SELECT doc_id, shard, pos FROM sp ORDER BY doc_id""".stripMargin,

    // Curriculum replay: same quality bucket, same md5 uniform
    // (stream 'corpus_curriculum'), same floor-shard; the engine's
    // offset+pos densification equals ONE global row_number over
    // (bucket, shard, u, id) — the lexicographic order the offsets
    // frame encodes.
    "x_curriculum_order" -> {
      val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_curriculum' " +
        s"|| chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      s"""WITH f AS (SELECT doc_id, ($qualityBucketSql) AS qb FROM documents),
         |b AS (SELECT doc_id,
         |        CASE WHEN qb = 'good' THEN 0
         |             WHEN qb = 'fair' THEN 1 ELSE 2 END AS bucket_rank,
         |        $u AS u
         |      FROM f),
         |s AS (SELECT doc_id, bucket_rank,
         |        CAST(floor(u * 8) AS INTEGER) AS shard, u FROM b)
         |SELECT doc_id, bucket_rank, shard,
         |       CAST(row_number() OVER (PARTITION BY bucket_rank, shard
         |              ORDER BY u, doc_id) AS BIGINT) - 1 AS pos,
         |       CAST(row_number() OVER (ORDER BY bucket_rank, shard, u,
         |              doc_id) AS BIGINT) - 1 AS global_pos
         |FROM s ORDER BY doc_id""".stripMargin
    },

    // Snapshot-diff replay: same side filters, same edit, sha256
    // digest compare over a full outer join.
    "x_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, sha256(text) AS od FROM documents
        |           WHERE doc_id % 3 <> 0),
        |n AS (SELECT doc_id,
        |        sha256(CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
        |                    ELSE text END) AS nd
        |      FROM documents WHERE doc_id % 4 <> 0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |       CASE WHEN od IS NULL THEN 'added'
        |            WHEN nd IS NULL THEN 'removed'
        |            WHEN od = nd THEN 'unchanged'
        |            ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    // File-plan replay: exact integer ceil-divisions (`//` after the
    // +b-1 shift, the engine's div twin).
    "x_file_plan" ->
      """WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(n_chars) AS BIGINT) AS total_bytes
        |           FROM documents GROUP BY 1),
        |f AS (SELECT source, n_docs, total_bytes,
        |        least(n_docs, greatest(CAST(1 AS BIGINT),
        |          (total_bytes + 4095) // 4096)) AS n_files
        |      FROM a)
        |SELECT source, n_docs, total_bytes, n_files,
        |       (n_docs + n_files - 1) // n_files AS docs_per_file
        |FROM f ORDER BY source""".stripMargin,

    // Shard-balance rollup over the SAME shared CTE as the manifest.
    "x_shard_balance" ->
      s"""WITH $shardCtes
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |       max(pos) AS max_pos
         |FROM sp GROUP BY 1 ORDER BY shard""".stripMargin,

    // DSIR weights replay: same md5 bucket hash, same add-one-smoothed
    // log ratios on the 1e-9 grid (ln and round half-away-from-zero
    // agree between engines), order-independent long sums.
    "x_dsir_weights" ->
      s"""WITH $dsirCtes
         |SELECT doc_id, n_feats, s9 / 1e9 AS logratio
         |FROM dw ORDER BY doc_id""".stripMargin,

    // DSIR Gumbel-top-k replay: the same md5 uniform, the same clamped
    // double ladder to the Gumbel draw, both ranking addends on the
    // 1e-9 long grid — the top-50 cut is an exact integer compare with
    // doc_id as tie-break, so the selected SET replays exactly.
    "x_dsir_select" -> {
      val u = s"(1 - (('0x' || substr(md5('$Seed' || chr(1) || 'corpus_dsir' || " +
        s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52}))"
      s"""WITH $dsirCtes,
         |gk AS (SELECT doc_id, n_feats, s9,
         |              s9 + CAST(round(-ln(greatest(-ln($u),
         |                     CAST('${(1e-26).toString}' AS DOUBLE))) * 1e9)
         |                   AS BIGINT) AS key9
         |       FROM dw)
         |SELECT doc_id, n_feats, s9 / 1e9 AS logratio, key9 / 1e9 AS gumbel_key
         |FROM gk ORDER BY key9 DESC, doc_id LIMIT 50""".stripMargin
    },

    // Budget-selection replay: the same dsirCtes s9 priorities, the
    // same banded two-phase prefix sum — all sums are exact longs and
    // the order keys are grid integers, so the kept SET replays
    // exactly. floor(s9/1e9): BIGINT/BIGINT is true division in
    // DuckDB, matching Spark's double division before floor.
    "x_budget_select" ->
      s"""WITH $budgetCtes
         |SELECT doc_id, band, n AS n_tokens FROM bsel
         |ORDER BY doc_id""".stripMargin,

    // Rollup over the budget selection through the SAME banded CTEs —
    // only the final SELECT differs, so report and selection can't
    // drift.
    "x_budget_stats" ->
      s"""WITH $budgetCtes
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n) AS BIGINT) AS n_tokens_total,
         |       max(band) AS top_band, min(band) AS cut_band
         |FROM bsel""".stripMargin,

    // the stratum column, split by NTILE over the bit-identical score
    // doubles. Spark and DuckDB NTILE agree (first n%b buckets take
    // the extras), so the label replays exactly.
    "x_ppl_buckets" ->
      s"""WITH $bigramLpCtes,
         |jb AS (SELECT l.doc_id, d.source, l.n_bigrams, l.avg_logprob
         |       FROM lpf l JOIN documents d USING (doc_id)),
         |b AS (SELECT *, ntile(3) OVER (PARTITION BY source
         |          ORDER BY avg_logprob DESC, doc_id) AS nt FROM jb)
         |SELECT doc_id, source, n_bigrams, avg_logprob,
         |       CASE WHEN nt = 1 THEN 'head'
         |            WHEN nt = 3 THEN 'tail'
         |            ELSE 'middle' END AS bucket
         |FROM b ORDER BY doc_id""".stripMargin,

    // Unigram-LM replay: same grid snap (round half away from zero
    // agrees between engines), integer sums are order-independent, and
    // the final division is one double op on exact integers.
    "x_unigram_logprob" -> {
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok),
         |lp AS (SELECT doc_id, CAST(round(ln(cnt / total) * 1e9) AS BIGINT) AS lp9
         |       FROM tok JOIN cf USING (term) CROSS JOIN tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(sum(lp9) AS BIGINT) / (count(*) * 1e9) AS avg_logprob
         |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // Synthetic-corpus structural replay: provider dir / keys / ctype /
    // acl are the same md5-column derivations as k_object_meta (constant
    // generator value=2 → 2 objects per slot over 200 slots); n_lines is
    // pinned by construction (2 disclaimer CRLFs + fake_counts=3
    // single-line providers = 5 per doc — sentence/email/address/profile
    // emit no embedded CRLF, see FakeData) and disclaimed=true for every
    // body (Sinks.Disclaimer prefix), so the Spark-side aggregates over
    // REAL bodies replay as constants here.
    "x_synthetic_corpus" -> {
      val keys = "t::VARCHAR || chr(1) || obj"
      val provs = Seq("sentence", "email", "address", "profile")
      s"""WITH obj AS (SELECT t, o.i AS obj FROM generate_series(0, 199) g(t)
         |             CROSS JOIN generate_series(1, 2) o(i)),
         |m AS (SELECT ${digestSql("obj_uuid", "tsa", keys)} AS d,
         |             [${provs.map("'" + _ + "'").mkString(",")}]
         |               [CAST(floor(${uniformSql("obj_provider", "tsa", keys)} * ${provs.size}.0) AS INT) + 1] AS provider,
         |             ${uniformSql("obj_mixed", "tsa", keys)} AS um
         |      FROM obj),
         |k AS (SELECT (CASE WHEN um < 0.5 THEN provider ELSE 'mixed' END) AS provider_dir,
         |             (CASE WHEN um < 0.5 THEN provider ELSE 'mixed' END) || '/' ||
         |               ${uuidSql("d")} || '.fake' AS doc_id
         |      FROM m)
         |SELECT provider_dir, 'text/plain' AS content_type, 'private' AS acl,
         |       count(*) AS n_docs, count(DISTINCT doc_id) AS n_keys,
         |       CAST(5 * count(*) AS BIGINT) AS total_lines,
         |       TRUE AS all_disclaimed,
         |       min(doc_id) AS first_key, max(doc_id) AS last_key
         |FROM k GROUP BY 1, 2, 3 ORDER BY provider_dir""".stripMargin
    },

    "x_dedup_exact" ->
      """SELECT sha256(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same synthetic URL dressing as the Spark side, then the same
    // five-step canonicalization (lowercase; strip query/fragment,
    // scheme, www., default :80/:443, trailing slashes) — plain RE2
    // regexes, DuckDB replacement backrefs spelled \1 where Spark
    // spells $1.
    "x_url_dedup" ->
      """WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |    source || '.example.com' ||
        |    (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
        |    '/Articles/' || CAST(doc_id % 40 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&ref=abc' ELSE '' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
        |  FROM documents),
        |n AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(lower(url), '[?#].*', ''),
        |      '^https?://', ''), '^www\.', ''),
        |      '^([^/:]+):(80|443)(/|$)', '\1\3'), '/+$', '') AS url_norm
        |  FROM u)
        |SELECT url_norm, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,

    // Global-rank replay: the plain single-window row_number the
    // engine's range-partition decomposition must reproduce exactly.
    "x_global_rank" ->
      """SELECT doc_id, source, n_chars,
        |  CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
        |    AS rank
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Same dressing + canonicalization as the Spark side; the oracle
    // groups pages by url_norm TEXT where the engine groups by
    // xxhash64(url_norm) — identical counts under the suite's standard
    // hash-identity convention.
    "x_domain_stats" ->
      """WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE 'm.' END) ||
        |    source ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '.com' ELSE '.org' END) ||
        |    '/p/' || CAST(doc_id % 15 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '?ref=rss' ELSE '' END) AS url
        |  FROM documents),
        |n AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(lower(url), '[?#].*', ''),
        |      '^https?://', ''), '^www\.', ''),
        |      '^([^/:]+):(80|443)(/|$)', '\1\3'), '/+$', '') AS url_norm
        |  FROM u),
        |h AS (SELECT doc_id, url_norm,
        |    regexp_replace(regexp_extract(url_norm, '^[^/]*'),
        |      ':[0-9]+$', '') AS host
        |  FROM n),
        |d AS (SELECT doc_id, url_norm,
        |    COALESCE(NULLIF(regexp_extract(host, '([^.]+\.[^.]+)$', 1), ''),
        |      host) AS domain
        |  FROM h),
        |g AS (SELECT domain, url_norm, count(*) AS n FROM d GROUP BY 1, 2)
        |SELECT domain, CAST(sum(n) AS BIGINT) AS n_docs,
        |  count(*) AS n_pages, CAST(max(n) AS BIGINT) AS max_copies,
        |  CAST('1.0' AS DOUBLE) -
        |    CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS dup_frac
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // Roundtrip identity: the parse of the render must reproduce the
    // documents frame exactly — id from the record header, the URI
    // dressing, Content-Length = length(text), payload = text.
    "x_wet_roundtrip" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.com/doc/' ||
        |    CAST(doc_id AS VARCHAR) AS uri,
        |  CAST(length(text) AS BIGINT) AS content_length,
        |  text AS payload
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Byte-orientation replay: strlen is DuckDB's OCTET counter, so
    // the oracle states the UTF-8 byte Content-Length the engine must
    // declare and re-slice; payload identity pins the byte-accurate
    // slicing (an off-by-one or char-oriented slice would truncate
    // the multi-byte suffix and break the hash).
    "x_wet_bytes" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.com/doc/' ||
        |    CAST(doc_id AS VARCHAR) AS uri,
        |  CAST(strlen(text || ' café—😀') AS BIGINT) AS content_length,
        |  text || ' café—😀' AS payload,
        |  TRUE AS intact
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Gzip replay: identical to the x_wet_bytes identity — the
    // compression layer must be invisible to the parsed rows.
    "x_warc_gzip" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.com/doc/' ||
        |    CAST(doc_id AS VARCHAR) AS uri,
        |  CAST(strlen(text || ' café—😀') AS BIGINT) AS content_length,
        |  text || ' café—😀' AS payload,
        |  TRUE AS intact
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Revisit replay: the same file layout reconstructed (rec_pos =
    // in-shard rank by id), then first-capture-per-payload via window
    // functions over (shard, rec_pos) order.
    "x_warc_revisit" ->
      """WITH p AS (SELECT doc_id, doc_id % 8 AS shard,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
        |      - 1 AS rec_pos,
        |    'body ' || CAST(doc_id % 100 AS VARCHAR) AS payload
        |  FROM documents),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY payload
        |      ORDER BY shard, rec_pos) AS rk,
        |    first_value(doc_id) OVER (PARTITION BY payload
        |      ORDER BY shard, rec_pos) AS orig
        |  FROM p)
        |SELECT doc_id, shard, CAST(rec_pos AS INTEGER) AS rec_pos,
        |  (rk > 1) AS is_revisit,
        |  CASE WHEN rk > 1 THEN orig END AS refers_to
        |FROM r ORDER BY doc_id""".stripMargin,

    // Ingest-report replay: the per-file aggregate over the same mod-8
    // sharding; every record of the ASCII corpus parses intact, so
    // n_intact = n_records.
    "x_wet_stats" ->
      """SELECT doc_id % 8 AS shard, count(*) AS n_records,
        |  CAST(sum(length(text)) AS BIGINT) AS payload_chars,
        |  CAST(min(length(text)) AS BIGINT) AS min_len,
        |  CAST(max(length(text)) AS BIGINT) AS max_len,
        |  count(*) AS n_intact
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,

    // Frontier replay: crawled pages via the same canonicalization
    // chain as x_url_dedup; discovered links CONSTRUCTED in their
    // RESOLVED canonical form — each UNION branch restates one RFC
    // 3986 reference form's merge outcome (the engine must resolve
    // against the page base, remove dot segments, shed the dressed
    // scheme/path case and tracking params to match); meta-nofollow
    // pages (%19) and rel-nofollow links (%13 rooted) contribute
    // nothing; the relative branch's CASE restates the
    // trailing-slash-dependent dot-segment merge. Set difference +
    // the robots CASE with real prefix semantics (/articles/4
    // catches /articles/40+).
    "x_frontier" ->
      """WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |    source || '.example.com' ||
        |    (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
        |    '/Articles/' || CAST(doc_id % 40 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&ref=abc' ELSE '' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
        |  FROM documents),
        |crawled AS (SELECT DISTINCT
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(lower(url), '[?#].*', ''),
        |      '^https?://', ''), '^www\.', ''),
        |      '^([^/:]+):(80|443)(/|$)', '\1\3'), '/+$', '') AS url_norm
        |  FROM u),
        |l AS (SELECT source || '.example.com/articles/' ||
        |        CAST((doc_id * 3) % 53 AS VARCHAR) AS url_norm
        |      FROM documents WHERE doc_id % 19 <> 0
        |      UNION
        |      SELECT 'hub.example.org/t/' || CAST(doc_id % 7 AS VARCHAR)
        |      FROM documents WHERE doc_id % 19 <> 0
        |      UNION
        |      SELECT source || '.example.com/tag/' ||
        |        CAST(doc_id % 11 AS VARCHAR)
        |      FROM documents WHERE doc_id % 19 <> 0 AND doc_id % 13 <> 0
        |      UNION
        |      SELECT source || '.example.com' ||
        |        (CASE WHEN doc_id % 5 = 0 THEN '/articles/archive/'
        |              ELSE '/archive/' END) ||
        |        CAST((doc_id * 5) % 23 AS VARCHAR) || '/item'
        |      FROM documents WHERE doc_id % 19 <> 0),
        |f AS (SELECT url_norm FROM l
        |      WHERE url_norm NOT IN (SELECT url_norm FROM crawled)),
        |g AS (SELECT url_norm,
        |    regexp_extract(url_norm, '^[^/]*') AS domain,
        |    regexp_extract(url_norm, '(/.*)$', 1) AS path
        |  FROM f)
        |SELECT url_norm, domain,
        |  CASE WHEN domain = 'hub.example.org' THEN path LIKE '/t/2%'
        |       ELSE path LIKE '/articles/4%' END AS blocked,
        |  CASE WHEN domain = 'hub.example.org' AND path LIKE '/t/2%'
        |         THEN '/t/2'
        |       WHEN domain <> 'hub.example.org' AND path LIKE '/articles/4%'
        |         THEN '/articles/4'
        |  END AS rule
        |FROM g ORDER BY url_norm""".stripMargin,

    // Scheduler replay: frontier set difference, the allow filter,
    // then the per-host slot window times the per-host delay CASE.
    "x_crawl_schedule" ->
      """WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |    source || '.example.com' ||
        |    (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
        |    '/Articles/' || CAST(doc_id % 40 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&ref=abc' ELSE '' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
        |  FROM documents),
        |crawled AS (SELECT DISTINCT
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(lower(url), '[?#].*', ''),
        |      '^https?://', ''), '^www\.', ''),
        |      '^([^/:]+):(80|443)(/|$)', '\1\3'), '/+$', '') AS url_norm
        |  FROM u),
        |l AS (SELECT source || '.example.com/articles/' ||
        |        CAST((doc_id * 3) % 53 AS VARCHAR) AS url_norm
        |      FROM documents
        |      UNION
        |      SELECT 'hub.example.org/t/' || CAST(doc_id % 7 AS VARCHAR)
        |      FROM documents),
        |f AS (SELECT url_norm FROM l
        |      WHERE url_norm NOT IN (SELECT url_norm FROM crawled)),
        |g AS (SELECT url_norm,
        |    regexp_extract(url_norm, '^[^/]*') AS domain,
        |    regexp_extract(url_norm, '(/.*)$', 1) AS path
        |  FROM f),
        |a AS (SELECT url_norm, domain FROM g
        |  WHERE NOT (CASE WHEN domain = 'hub.example.org'
        |                  THEN path LIKE '/t/2%'
        |                  ELSE path LIKE '/articles/4%' END))
        |SELECT url_norm, domain,
        |  CAST((row_number() OVER (PARTITION BY domain ORDER BY url_norm)
        |        - 1) *
        |    (CASE WHEN domain = 'hub.example.org' THEN 5 ELSE 1 END)
        |    AS BIGINT) AS fetch_at_s
        |FROM a ORDER BY url_norm""".stripMargin,

    // Recrawl replay: announced pages constructed in canonical form
    // with typed lastmod/priority (malformed decoys NULL, replaying
    // the engine's try_cast); freshest per page; membership against
    // the same crawled canonicalization chain as x_url_dedup. The
    // index layer is pinned implicitly: losing a child sitemap in the
    // nesting resolve would drop that site's rows from the hash.
    "x_sitemap_recrawl" ->
      """WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |    source || '.example.com' ||
        |    (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
        |    '/Articles/' || CAST(doc_id % 40 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&ref=abc' ELSE '' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
        |  FROM documents),
        |crawled AS (SELECT DISTINCT
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(lower(url), '[?#].*', ''),
        |      '^https?://', ''), '^www\.', ''),
        |      '^([^/:]+):(80|443)(/|$)', '\1\3'), '/+$', '') AS url_norm
        |  FROM u),
        |e AS (SELECT
        |    source || '.example.com/articles/' ||
        |      CAST((doc_id * 7) % 43 AS VARCHAR) AS url_norm,
        |    CAST(CASE WHEN doc_id % 97 = 13 THEN NULL
        |         ELSE '2026-01-' ||
        |           lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') END
        |      AS DATE) AS lastmod,
        |    CAST(CASE WHEN doc_id % 89 = 7 THEN NULL
        |         WHEN doc_id % 3 = 0 THEN '0.8' ELSE '0.5' END
        |      AS DOUBLE) AS priority
        |  FROM documents),
        |g AS (SELECT url_norm, max(lastmod) AS lastmod,
        |        max(priority) AS priority
        |      FROM e GROUP BY 1)
        |SELECT url_norm, lastmod, priority,
        |  (url_norm IN (SELECT url_norm FROM crawled)) AS known
        |FROM g ORDER BY url_norm""".stripMargin,

    // Policy replay: the same announced-page collapse joined to the
    // reconstructed fetch history, then the decision CASE and the
    // staleness-weighted score restated in SQL date arithmetic.
    "x_recrawl_policy" ->
      """WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |    source || '.example.com' ||
        |    (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
        |    '/Articles/' || CAST(doc_id % 40 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&ref=abc' ELSE '' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
        |  FROM documents),
        |h AS (SELECT
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(lower(url), '[?#].*', ''),
        |      '^https?://', ''), '^www\.', ''),
        |      '^([^/:]+):(80|443)(/|$)', '\1\3'), '/+$', '') AS url_norm,
        |    DATE '2026-01-01' + CAST((doc_id * 11) % 28 AS INTEGER) AS f
        |  FROM u),
        |hist AS (SELECT url_norm, max(f) AS last_fetched
        |         FROM h GROUP BY 1),
        |e AS (SELECT
        |    source || '.example.com/articles/' ||
        |      CAST((doc_id * 7) % 43 AS VARCHAR) AS url_norm,
        |    CAST(CASE WHEN doc_id % 97 = 13 THEN NULL
        |         ELSE '2026-01-' ||
        |           lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') END
        |      AS DATE) AS lastmod,
        |    CAST(CASE WHEN doc_id % 89 = 7 THEN NULL
        |         WHEN doc_id % 3 = 0 THEN '0.8' ELSE '0.5' END
        |      AS DOUBLE) AS priority
        |  FROM documents),
        |g AS (SELECT url_norm, max(lastmod) AS lastmod,
        |        max(priority) AS priority
        |      FROM e GROUP BY 1)
        |SELECT g.url_norm, g.lastmod, g.priority, hist.last_fetched,
        |  (hist.url_norm IS NOT NULL) AS known,
        |  CASE WHEN hist.url_norm IS NULL THEN 'fetch_new'
        |       WHEN g.lastmod IS NULL THEN 'refetch_unknown'
        |       WHEN g.lastmod > hist.last_fetched THEN 'refetch_stale'
        |       ELSE 'skip_fresh' END AS decision,
        |  coalesce(g.priority, 0.5) *
        |    (DATE '2026-03-01' - coalesce(g.lastmod, DATE '2026-01-01'))
        |    AS score
        |FROM g LEFT JOIN hist ON g.url_norm = hist.url_norm
        |ORDER BY g.url_norm""".stripMargin,

    // Discovery replay: every host announces /sitemap.xml; vowel
    // hosts add the news sitemap; the commented decoy contributes
    // nothing (a parser that didn't strip comments would emit it and
    // break the hash).
    "x_sitemap_discovery" ->
      """WITH h AS (SELECT DISTINCT source || '.example.com' AS domain
        |           FROM documents)
        |SELECT domain, sitemap_url FROM (
        |  SELECT domain,
        |    'https://' || domain || '/sitemap.xml' AS sitemap_url
        |  FROM h
        |  UNION ALL
        |  SELECT domain, 'https://' || domain || '/news-sitemap.xml'
        |  FROM h WHERE regexp_matches(domain, '^[aeiou]'))
        |ORDER BY domain, sitemap_url""".stripMargin,

    // Base-href replay: each residue class's merge outcome restated —
    // cdn-dir base, relative ./v2/ base resolved against the page,
    // and the no-base fallback to the page's own directory.
    "x_base_links" ->
      """SELECT doc_id, link_pos, resolved FROM (
        |  SELECT doc_id, 0 AS link_pos,
        |    CASE WHEN doc_id % 3 = 0 THEN 'https://cdn.' || source ||
        |           '.example.org/pages/item/' || CAST(doc_id % 9 AS VARCHAR)
        |         WHEN doc_id % 3 = 1 THEN 'https://' || source ||
        |           '.example.com/Articles/v2/item/' ||
        |           CAST(doc_id % 9 AS VARCHAR)
        |         ELSE 'https://' || source || '.example.com/Articles/item/'
        |           || CAST(doc_id % 9 AS VARCHAR) END AS resolved
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 1,
        |    CASE WHEN doc_id % 3 = 0 THEN 'https://cdn.' || source ||
        |           '.example.org/rooted/' || CAST(doc_id % 5 AS VARCHAR)
        |         ELSE 'https://' || source || '.example.com/rooted/' ||
        |           CAST(doc_id % 5 AS VARCHAR) END
        |  FROM documents)
        |ORDER BY doc_id, link_pos""".stripMargin,

    // Canonical replay: the declared-canonical identity per residue —
    // absolute canonicals land on the desktop host, RELATIVE
    // canonicals keep the variant host (m. pages), undeclared pages
    // fall back to their own canonicalized URL.
    "x_canonical_dedup" ->
      """WITH c AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 1 AND doc_id % 7 = 0
        |           THEN 'm.' || source || '.example.com/a/' ||
        |             CAST(doc_id % 25 AS VARCHAR)
        |         ELSE source || '.example.com/a/' ||
        |             CAST(doc_id % 25 AS VARCHAR) END AS canonical_norm
        |  FROM documents)
        |SELECT canonical_norm, min(doc_id) AS keep_id,
        |  count(*) AS n_pages
        |FROM c GROUP BY 1 ORDER BY canonical_norm""".stripMargin,

    // Extraction replay by CONSTRUCTION: the oracle assembles the
    // expected text from (doc_id, text) directly — 'doc N Doc & N
    // em—dash ... next <text> hub' with the document's own whitespace
    // collapsed — so any decoy surviving the engine's pipeline
    // (script string tags, style body, comment, double entity, a
    // numeric ref left literal or an out-of-range one decoded)
    // breaks the hash. The decoded characters appear as UTF-8
    // literals here: em dash U+2014 (&#8212;), right single quote
    // U+2019 (&#x2019;), 'A' (&#65;), and the astral U+1F600 emoji
    // assembled from its surrogate pair (&#x1F600;).
    "x_html_text" ->
      """WITH t AS (SELECT doc_id,
        |    trim(regexp_replace(text, '\s+', ' ', 'g')) AS body
        |  FROM documents)
        |SELECT doc_id,
        |  'doc ' || CAST(doc_id AS VARCHAR) || ' Doc & ' ||
        |  CAST(doc_id AS VARCHAR) ||
        |  ' em—dash ’ A 😀 &#0; &#55296; &#60; next ' ||
        |  (CASE WHEN body = '' THEN '' ELSE body || ' ' END) || 'hub'
        |    AS extracted
        |FROM t ORDER BY doc_id""".stripMargin,

    // Frontier replay: the two planted hrefs per page, in document
    // order.
    "x_html_links" ->
      """SELECT doc_id, link_pos, link FROM (
        |  SELECT doc_id, 0 AS link_pos,
        |    'https://' || source || '.example.com/doc/' ||
        |      CAST((doc_id + 1) % 40 AS VARCHAR) AS link
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 1,
        |    'http://hub.example.org/t/' || CAST(doc_id % 7 AS VARCHAR)
        |  FROM documents)
        |ORDER BY doc_id, link_pos""".stripMargin,

    // Funnel replay: one CTE chain replays dressing → canonical URL →
    // host/path → HTTP keep + robots CASE → per-HOST counts (robots
    // is a per-host resource, the grain the frontier queries share),
    // with canonical-page distincts on url_norm TEXT where the engine
    // counts xxhash64(url_norm) (the suite's hash-identity
    // convention).
    "x_crawl_e2e" ->
      """WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE 'm.' END) ||
        |    source ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '.com' ELSE '.org' END) ||
        |    '/p/' || CAST(doc_id % 15 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '?ref=rss' ELSE '' END) AS url,
        |    CASE WHEN doc_id % 11 = 7 THEN 404
        |         WHEN doc_id % 13 = 5 THEN 301 ELSE 200 END AS status_code,
        |    CASE WHEN doc_id % 9 = 4 THEN 'application/pdf'
        |         ELSE 'text/html' END AS mime
        |  FROM documents),
        |n AS (SELECT doc_id, status_code, mime,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(lower(url), '[?#].*', ''),
        |      '^https?://', ''), '^www\.', ''),
        |      '^([^/:]+):(80|443)(/|$)', '\1\3'), '/+$', '') AS url_norm
        |  FROM u),
        |p AS (SELECT doc_id, url_norm, status_code, mime,
        |    regexp_replace(regexp_extract(url_norm, '^[^/]*'),
        |      ':[0-9]+$', '') AS host,
        |    regexp_extract(url_norm, '(/.*)$', 1) AS path
        |  FROM n),
        |f AS (SELECT doc_id, host, url_norm,
        |    (status_code = 200 AND mime LIKE 'text/%') AS kept,
        |    (doc_id % 10 = 3) AS noindex,
        |    CASE WHEN host LIKE '%.com' THEN path IN ('/p/3', '/p/11')
        |         ELSE path = '/p/7' END AS blocked
        |  FROM p)
        |SELECT host, count(*) AS n_fetched,
        |  CAST(sum(CASE WHEN kept AND NOT blocked AND NOT noindex
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN kept AND blocked THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_robots_blocked,
        |  CAST(sum(CASE WHEN kept AND NOT blocked AND noindex
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_noindexed,
        |  count(DISTINCT CASE WHEN kept AND NOT blocked AND NOT noindex
        |    THEN url_norm END) AS n_pages
        |FROM f GROUP BY 1 ORDER BY host""".stripMargin,

    // Availability replay: per host class — .com applies the rules
    // (longest-match + the /p/12 Allow), m-org's 404 lifts
    // everything, org's 503 blocks everything with the sentinel.
    "x_robots_availability" ->
      """WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 3 = 0 THEN '' ELSE 'm.' END) ||
        |    source ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '.com' ELSE '.org' END) AS host,
        |    '/p/' || CAST(doc_id % 15 AS VARCHAR) AS path
        |  FROM documents)
        |SELECT doc_id, host, path,
        |  CASE WHEN host LIKE '%.com'
        |         THEN (path LIKE '/p/1%' AND path <> '/p/12')
        |       WHEN host LIKE 'm.%' THEN FALSE
        |       ELSE TRUE END AS blocked,
        |  CASE WHEN host LIKE '%.com' AND path = '/p/12' THEN '/p/12'
        |       WHEN host LIKE '%.com' AND path LIKE '/p/1%' THEN '/p/1'
        |       WHEN host NOT LIKE '%.com' AND host NOT LIKE 'm.%'
        |         THEN 'unreachable'
        |  END AS rule
        |FROM u ORDER BY doc_id""".stripMargin,

    // Robots replay: same dressing + canonicalization as
    // x_domain_stats (paths are /p/{0..14}); the per-TLD CASE states
    // the RFC 9309 outcome the section-aware parse + most-specific-
    // match gate must recover from the decoy-laden bodies — .com pins
    // longest-match (/p/1 vs /p/11) and the /p/12 Allow carve-out;
    // .org pins the /p/*4$ wildcard (blocks /p/4 and /p/14) with the
    // same-length /p/14$ Allow releasing /p/14 on the tie.
    "x_robots_filter" ->
      """WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE 'm.' END) ||
        |    source ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '.com' ELSE '.org' END) ||
        |    '/p/' || CAST(doc_id % 15 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '?ref=rss' ELSE '' END) AS url
        |  FROM documents),
        |n AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(lower(url), '[?#].*', ''),
        |      '^https?://', ''), '^www\.', ''),
        |      '^([^/:]+):(80|443)(/|$)', '\1\3'), '/+$', '') AS url_norm
        |  FROM u),
        |h AS (SELECT doc_id, url_norm,
        |    regexp_replace(regexp_extract(url_norm, '^[^/]*'),
        |      ':[0-9]+$', '') AS host
        |  FROM n),
        |p AS (SELECT doc_id,
        |    COALESCE(NULLIF(regexp_extract(host, '([^.]+\.[^.]+)$', 1), ''),
        |      host) AS domain,
        |    regexp_extract(url_norm, '(/.*)$', 1) AS path
        |  FROM h)
        |SELECT doc_id, domain, path,
        |  CASE WHEN domain LIKE '%.com'
        |       THEN path IN ('/p/1', '/p/3', '/p/10', '/p/11', '/p/13', '/p/14')
        |       ELSE path IN ('/p/4', '/p/7') END AS blocked,
        |  CASE WHEN domain LIKE '%.com' THEN
        |         CASE WHEN path = '/p/3' THEN '/p/3'
        |              WHEN path = '/p/11' THEN '/p/11'
        |              WHEN path = '/p/12' THEN '/p/12'
        |              WHEN path IN ('/p/1', '/p/10', '/p/13', '/p/14')
        |                THEN '/p/1'
        |         END
        |       ELSE
        |         CASE WHEN path = '/p/7' THEN '/p/7'
        |              WHEN path = '/p/4' THEN '/p/*4$'
        |              WHEN path = '/p/14' THEN '/p/14$'
        |         END
        |  END AS rule
        |FROM p ORDER BY doc_id""".stripMargin,

    // WET-derivation replay: the status/mime dressing is a pure
    // doc_id projection, so the parse + keep decision replays without
    // ever constructing archive text. CASE order matters for ids that
    // hit both residues (404 wins), matching the when-chain.
    "x_warc_http" ->
      """WITH s AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 7 THEN 404
        |         WHEN doc_id % 13 = 5 THEN 301 ELSE 200 END AS status_code,
        |    CASE WHEN doc_id % 9 = 4 THEN 'application/pdf'
        |         ELSE 'text/html' END AS mime,
        |    CAST(length(text) AS BIGINT) AS body_chars
        |  FROM documents)
        |SELECT doc_id, status_code, mime, body_chars,
        |  (status_code = 200 AND mime LIKE 'text/%') AS kept
        |FROM s ORDER BY doc_id""".stripMargin,

    // Charset replay: the expected DECODED body constructed per
    // residue — the latin-1 é and the utf-8 em-dash/emoji must come
    // back as the characters themselves, pinning that the engine
    // re-decoded the declared charset rather than echoing bytes.
    "x_warc_charset" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 'text/plain'
        |       ELSE 'text/html' END AS mime,
        |  CASE WHEN doc_id % 3 = 0 THEN 'iso-8859-1'
        |       WHEN doc_id % 3 = 1 THEN 'utf-8' END AS charset,
        |  CASE WHEN doc_id % 3 = 0 THEN text || ' café'
        |       WHEN doc_id % 3 = 1 THEN text || ' café—😀'
        |       ELSE text END AS body,
        |  TRUE AS kept
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Redirect replay: the same deterministic edge dressing, then the
    // chain walked by a recursive CTE — terminal = a target that is
    // not itself a redirect source; sources with no terminal within
    // the hop cap (the planted cycles, and any chain feeding them)
    // are looped with null final/hops, matching the engine's
    // redirect-budget flagging. The cap is Warc.RedirectHopBudget
    // (= 2^maxRounds = 32 composed hops) — the SAME budget the
    // engine's pointer doubling resolves, so a legit chain of any
    // length gets the identical resolved-vs-looped verdict on both
    // sides.
    "x_redirect_resolve" ->
      """WITH RECURSIVE e AS (SELECT
        |    'redir.example.com/r/' || CAST(doc_id AS VARCHAR) AS src,
        |    'redir.example.com/r/' || CAST(
        |      CASE WHEN doc_id % 17 = 2 THEN doc_id + 1
        |           WHEN doc_id % 17 = 3 THEN doc_id - 1
        |           ELSE doc_id + 13 END AS VARCHAR) AS dst
        |  FROM documents
        |  WHERE doc_id % 17 IN (2, 3)
        |     OR (doc_id % 13 = 5 AND (doc_id // 13) % 4 <> 3)),
        |w(src, cur, hops) AS (
        |  SELECT src, dst, 1 FROM e
        |  UNION ALL
        |  SELECT w.src, e2.dst, w.hops + 1
        |  FROM w JOIN e e2 ON w.cur = e2.src
        |  WHERE w.hops < 32),
        |term AS (SELECT src, cur, hops FROM w
        |  WHERE cur NOT IN (SELECT src FROM e))
        |SELECT e.src, t.cur AS final_url, CAST(t.hops AS BIGINT) AS hops,
        |  (t.src IS NULL) AS looped
        |FROM e LEFT JOIN term t ON e.src = t.src
        |ORDER BY e.src""".stripMargin,

    // Trap replay: each residue class's flags restated — depth and
    // looping by branch, length computed on the same constructed
    // string.
    "x_url_traps" ->
      """WITH u AS (SELECT doc_id,
        |    source || '.example.com' ||
        |    CASE WHEN doc_id % 11 = 0 THEN '/d/1/2/3/4/5/6/7/8/9'
        |         WHEN doc_id % 13 = 0 THEN '/p/q/p/q/p/q'
        |         WHEN doc_id % 17 = 0 THEN '/' || repeat('z', 110)
        |         ELSE '/a/' || CAST(doc_id % 30 AS VARCHAR) END AS url_norm,
        |    CASE WHEN doc_id % 11 = 0 THEN 10
        |         WHEN doc_id % 13 = 0 THEN 6
        |         WHEN doc_id % 17 = 0 THEN 1 ELSE 2 END AS depth,
        |    (doc_id % 11 <> 0 AND doc_id % 13 = 0) AS looping
        |  FROM documents)
        |SELECT doc_id, url_norm, CAST(depth AS INTEGER) AS depth,
        |  CAST(length(url_norm) AS INTEGER) AS url_len,
        |  (depth > 8) AS too_deep,
        |  (length(url_norm) > 120) AS too_long,
        |  looping,
        |  (depth > 8 OR length(url_norm) > 120 OR looping) AS trapped
        |FROM u ORDER BY doc_id""".stripMargin,

    // Identity replay: the same recursive walk as x_redirect_resolve,
    // LEFT-joined back over EVERY fetched page — non-sources pass
    // through, looped sources keep their own URL.
    "x_redirect_identity" ->
      """WITH RECURSIVE e AS (SELECT
        |    'redir.example.com/r/' || CAST(doc_id AS VARCHAR) AS src,
        |    'redir.example.com/r/' || CAST(
        |      CASE WHEN doc_id % 17 = 2 THEN doc_id + 1
        |           WHEN doc_id % 17 = 3 THEN doc_id - 1
        |           ELSE doc_id + 13 END AS VARCHAR) AS dst
        |  FROM documents
        |  WHERE doc_id % 17 IN (2, 3)
        |     OR (doc_id % 13 = 5 AND (doc_id // 13) % 4 <> 3)),
        |w(src, cur, hops) AS (
        |  SELECT src, dst, 1 FROM e
        |  UNION ALL
        |  SELECT w.src, e2.dst, w.hops + 1
        |  FROM w JOIN e e2 ON w.cur = e2.src
        |  WHERE w.hops < 32),
        |term AS (SELECT src, cur FROM w
        |  WHERE cur NOT IN (SELECT src FROM e)),
        |r AS (SELECT e.src, t.cur AS final, (t.src IS NULL) AS lp
        |      FROM e LEFT JOIN term t ON e.src = t.src),
        |p AS (SELECT doc_id,
        |    'redir.example.com/r/' || CAST(doc_id AS VARCHAR) AS url_norm
        |  FROM documents)
        |SELECT p.doc_id, p.url_norm,
        |  CASE WHEN r.src IS NULL OR r.lp THEN p.url_norm
        |       ELSE r.final END AS final_norm,
        |  (r.src IS NOT NULL AND NOT r.lp) AS redirected,
        |  coalesce(r.lp, FALSE) AS looped
        |FROM p LEFT JOIN r ON p.url_norm = r.src
        |ORDER BY p.doc_id""".stripMargin,

    // Power-iteration replay: the identical integer fixed-point
    // recurrence as a recursive CTE — same K (10), damping (85/100),
    // and scale (10^12); per-host dummy self-loops (w=0) keep every
    // host in the recursive working set so no-in-link hosts settle at
    // the teleport base exactly as the engine's left join does.
    // (`hosts` uses DISTINCT-over-UNION-ALL: under WITH RECURSIVE,
    // DuckDB treats a plain UNION CTE body as a recursive union and
    // skips the dedup.)
    "x_host_rank" ->
      """WITH RECURSIVE raw(src, dst) AS (
        |  SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id * 2 + 1) % 53 AS VARCHAR) || '.example.com'
        |  FROM documents
        |  UNION ALL
        |  SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id * 3 + 7) % 53 AS VARCHAR) || '.example.com'
        |  FROM documents),
        |edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
        |hosts AS (SELECT DISTINCT host FROM
        |  (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM hosts),
        |e2 AS (SELECT src, dst, 1 AS w FROM edges
        |       UNION ALL SELECT host, host, 0 FROM hosts),
        |pr(iter, host, rank) AS (
        |  SELECT 0, host, 1000000000000 // n FROM hosts CROSS JOIN nn
        |  UNION ALL
        |  SELECT pr.iter + 1, e2.dst,
        |         ((100 - 85) * 1000000000000 // 100) // max(nn.n)
        |         + (85 * SUM(CASE WHEN e2.w = 1
        |                          THEN pr.rank // d.outdeg ELSE 0 END)) // 100
        |  FROM pr JOIN e2 ON pr.host = e2.src
        |  LEFT JOIN deg d ON d.src = e2.src CROSS JOIN nn
        |  WHERE pr.iter < 10
        |  GROUP BY pr.iter, e2.dst)
        |SELECT host, CAST(rank AS BIGINT) AS rank
        |FROM pr WHERE iter = 10 ORDER BY host""".stripMargin,

    // The seeded recurrence: per-host seed flag rides the recursion —
    // init is s·(scale // nSeeds), the base term is s·base (so
    // non-seeds have NO teleport floor and unreachable hosts stay 0).
    "x_host_rank_seeded" ->
      """WITH RECURSIVE raw(src, dst) AS (
        |  SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id * 2 + 1) % 53 AS VARCHAR) || '.example.com'
        |  FROM documents
        |  UNION ALL
        |  SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id * 3 + 7) % 53 AS VARCHAR) || '.example.com'
        |  FROM documents),
        |edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
        |hosts AS (SELECT DISTINCT host FROM
        |  (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
        |hostf AS (SELECT host,
        |    CASE WHEN host IN ('h0.example.com', 'h1.example.com',
        |      'h2.example.com', 'h3.example.com', 'h4.example.com')
        |      THEN 1 ELSE 0 END AS s
        |  FROM hosts),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM hostf WHERE s = 1),
        |e2 AS (SELECT src, dst, 1 AS w FROM edges
        |       UNION ALL SELECT host, host, 0 FROM hosts),
        |pr(iter, host, rank) AS (
        |  SELECT 0, host, s * (1000000000000 // n)
        |  FROM hostf CROSS JOIN nn
        |  UNION ALL
        |  SELECT pr.iter + 1, e2.dst,
        |         max(hf.s) * (((100 - 85) * 1000000000000 // 100) // max(nn.n))
        |         + (85 * SUM(CASE WHEN e2.w = 1
        |                          THEN pr.rank // d.outdeg ELSE 0 END)) // 100
        |  FROM pr JOIN e2 ON pr.host = e2.src
        |  LEFT JOIN deg d ON d.src = e2.src
        |  JOIN hostf hf ON hf.host = e2.dst
        |  CROSS JOIN nn
        |  WHERE pr.iter < 10
        |  GROUP BY pr.iter, e2.dst)
        |SELECT host, CAST(rank AS BIGINT) AS rank
        |FROM pr WHERE iter = 10 ORDER BY host""".stripMargin,

    // The weighted recurrence: the distinct becomes a count-weighted
    // group, sources split mass proportionally to edge weight.
    "x_host_rank_weighted" ->
      """WITH RECURSIVE raw(src, dst) AS (
        |  SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id * 2 + 1) % 53 AS VARCHAR) || '.example.com'
        |  FROM documents
        |  UNION ALL
        |  SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id * 3 + 7) % 53 AS VARCHAR) || '.example.com'
        |  FROM documents),
        |edges AS (SELECT src, dst, count(*) AS w FROM raw
        |          WHERE src <> dst GROUP BY 1, 2),
        |hosts AS (SELECT DISTINCT host FROM
        |  (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
        |deg AS (SELECT src, SUM(w) AS totw FROM edges GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM hosts),
        |e2 AS (SELECT src, dst, w FROM edges
        |       UNION ALL SELECT host, host, 0 FROM hosts),
        |pr(iter, host, rank) AS (
        |  SELECT 0, host, 1000000000000 // n FROM hosts CROSS JOIN nn
        |  UNION ALL
        |  SELECT pr.iter + 1, e2.dst,
        |         ((100 - 85) * 1000000000000 // 100) // max(nn.n)
        |         + (85 * SUM(CASE WHEN e2.w > 0
        |                          THEN (pr.rank // d.totw) * e2.w
        |                          ELSE 0 END)) // 100
        |  FROM pr JOIN e2 ON pr.host = e2.src
        |  LEFT JOIN deg d ON d.src = e2.src CROSS JOIN nn
        |  WHERE pr.iter < 10
        |  GROUP BY pr.iter, e2.dst)
        |SELECT host, CAST(rank AS BIGINT) AS rank
        |FROM pr WHERE iter = 10 ORDER BY host""".stripMargin,

    // Same recurrence, then quota = floor(rank · 300 / 10^12) and the
    // host's first-quota doc ids via a host-partitioned row_number.
    "x_rank_weighted_select" ->
      """WITH RECURSIVE raw(src, dst) AS (
        |  SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id * 2 + 1) % 53 AS VARCHAR) || '.example.com'
        |  FROM documents
        |  UNION ALL
        |  SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id * 3 + 7) % 53 AS VARCHAR) || '.example.com'
        |  FROM documents),
        |edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
        |hosts AS (SELECT DISTINCT host FROM
        |  (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM hosts),
        |e2 AS (SELECT src, dst, 1 AS w FROM edges
        |       UNION ALL SELECT host, host, 0 FROM hosts),
        |pr(iter, host, rank) AS (
        |  SELECT 0, host, 1000000000000 // n FROM hosts CROSS JOIN nn
        |  UNION ALL
        |  SELECT pr.iter + 1, e2.dst,
        |         ((100 - 85) * 1000000000000 // 100) // max(nn.n)
        |         + (85 * SUM(CASE WHEN e2.w = 1
        |                          THEN pr.rank // d.outdeg ELSE 0 END)) // 100
        |  FROM pr JOIN e2 ON pr.host = e2.src
        |  LEFT JOIN deg d ON d.src = e2.src CROSS JOIN nn
        |  WHERE pr.iter < 10
        |  GROUP BY pr.iter, e2.dst),
        |quota AS (SELECT host,
        |    CAST((rank * 300) // 1000000000000 AS BIGINT) AS quota
        |  FROM pr WHERE iter = 10),
        |docs AS (SELECT
        |    'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com' AS host,
        |    doc_id,
        |    row_number() OVER (PARTITION BY doc_id % 53 ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT d.host, d.doc_id, q.quota
        |FROM docs d JOIN quota q ON d.host = q.host
        |WHERE d.rn <= q.quota
        |ORDER BY d.host, d.doc_id""".stripMargin,

    // Same recurrence, then the frontier targets restated from doc_id
    // arithmetic, each joined to its host's rank with a per-host slot.
    "x_frontier_priority" ->
      """WITH RECURSIVE raw(src, dst) AS (
        |  SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id * 2 + 1) % 53 AS VARCHAR) || '.example.com'
        |  FROM documents
        |  UNION ALL
        |  SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id * 3 + 7) % 53 AS VARCHAR) || '.example.com'
        |  FROM documents),
        |edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
        |hosts AS (SELECT DISTINCT host FROM
        |  (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM hosts),
        |e2 AS (SELECT src, dst, 1 AS w FROM edges
        |       UNION ALL SELECT host, host, 0 FROM hosts),
        |pr(iter, host, rank) AS (
        |  SELECT 0, host, 1000000000000 // n FROM hosts CROSS JOIN nn
        |  UNION ALL
        |  SELECT pr.iter + 1, e2.dst,
        |         ((100 - 85) * 1000000000000 // 100) // max(nn.n)
        |         + (85 * SUM(CASE WHEN e2.w = 1
        |                          THEN pr.rank // d.outdeg ELSE 0 END)) // 100
        |  FROM pr JOIN e2 ON pr.host = e2.src
        |  LEFT JOIN deg d ON d.src = e2.src CROSS JOIN nn
        |  WHERE pr.iter < 10
        |  GROUP BY pr.iter, e2.dst),
        |final AS (SELECT host, CAST(rank AS BIGINT) AS rank
        |          FROM pr WHERE iter = 10),
        |turl AS (SELECT DISTINCT url, host FROM (
        |  SELECT 'h' || CAST((doc_id * 2 + 1) % 53 AS VARCHAR) ||
        |           '.example.com/x/' || CAST(doc_id % 10 AS VARCHAR) AS url,
        |         'h' || CAST((doc_id * 2 + 1) % 53 AS VARCHAR) ||
        |           '.example.com' AS host
        |  FROM documents
        |  UNION ALL
        |  SELECT 'h' || CAST((doc_id * 3 + 7) % 53 AS VARCHAR) ||
        |           '.example.com/y',
        |         'h' || CAST((doc_id * 3 + 7) % 53 AS VARCHAR) ||
        |           '.example.com'
        |  FROM documents)),
        |slotted AS (SELECT url AS url_norm, host,
        |    row_number() OVER (PARTITION BY host ORDER BY url) AS slot
        |  FROM turl)
        |SELECT s.url_norm, s.host, f.rank, s.slot
        |FROM slotted s JOIN final f ON s.host = f.host
        |ORDER BY f.rank DESC, s.url_norm""".stripMargin,

    // Pure-reachability replay: the recursive CTE closes
    // (host, reachable-host) pairs over the SYMMETRIZED edge set
    // (recursive-UNION dedup terminates the closure), then the
    // component label is simply the minimum reachable name — no
    // contraction, no hash, nothing of the engine's algorithm
    // restated. (`sym`/`hosts` use DISTINCT-over-UNION-ALL: under
    // WITH RECURSIVE, DuckDB treats a plain UNION in a non-recursive
    // CTE body as UNION ALL and skips the dedup.)
    "x_host_components" ->
      """WITH RECURSIVE raw(src, dst) AS (
        |  SELECT 'h' || CAST(doc_id % 60 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id + 12) % 60 AS VARCHAR) || '.example.com'
        |  FROM documents
        |  UNION ALL
        |  SELECT 'h' || CAST(doc_id % 60 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id + 24) % 60 AS VARCHAR) || '.example.com'
        |  FROM documents),
        |edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
        |sym AS (SELECT DISTINCT a, b FROM
        |  (SELECT src AS a, dst AS b FROM edges
        |   UNION ALL SELECT dst, src FROM edges)),
        |hosts AS (SELECT DISTINCT a AS host FROM sym),
        |r(host, lbl) AS (
        |  SELECT host, host FROM hosts
        |  UNION
        |  SELECT s.a, r.lbl FROM r JOIN sym s ON r.host = s.b),
        |c AS (SELECT host, min(lbl) AS component FROM r GROUP BY host),
        |sz AS (SELECT component, count(*) AS comp_size
        |       FROM c GROUP BY component)
        |SELECT c.host, c.component, sz.comp_size
        |FROM c JOIN sz ON c.component = sz.component
        |ORDER BY c.host""".stripMargin,

    // Both priors replayed independently — the weighted recurrence
    // (count-weighted mod-60 edges) and the reachability closure —
    // joined and summed per family.
    "x_family_rank" ->
      """WITH RECURSIVE raw(src, dst) AS (
        |  SELECT 'h' || CAST(doc_id % 60 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id + 12) % 60 AS VARCHAR) || '.example.com'
        |  FROM documents
        |  UNION ALL
        |  SELECT 'h' || CAST(doc_id % 60 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id + 24) % 60 AS VARCHAR) || '.example.com'
        |  FROM documents),
        |edges AS (SELECT src, dst, count(*) AS w FROM raw
        |          WHERE src <> dst GROUP BY 1, 2),
        |hosts AS (SELECT DISTINCT host FROM
        |  (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
        |deg AS (SELECT src, SUM(w) AS totw FROM edges GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM hosts),
        |e2 AS (SELECT src, dst, w FROM edges
        |       UNION ALL SELECT host, host, 0 FROM hosts),
        |pr(iter, host, rank) AS (
        |  SELECT 0, host, 1000000000000 // n FROM hosts CROSS JOIN nn
        |  UNION ALL
        |  SELECT pr.iter + 1, e2.dst,
        |         ((100 - 85) * 1000000000000 // 100) // max(nn.n)
        |         + (85 * SUM(CASE WHEN e2.w > 0
        |                          THEN (pr.rank // d.totw) * e2.w
        |                          ELSE 0 END)) // 100
        |  FROM pr JOIN e2 ON pr.host = e2.src
        |  LEFT JOIN deg d ON d.src = e2.src CROSS JOIN nn
        |  WHERE pr.iter < 10
        |  GROUP BY pr.iter, e2.dst),
        |final AS (SELECT host, rank FROM pr WHERE iter = 10),
        |dedges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
        |sym AS (SELECT DISTINCT a, b FROM
        |  (SELECT src AS a, dst AS b FROM dedges
        |   UNION ALL SELECT dst, src FROM dedges)),
        |chosts AS (SELECT DISTINCT a AS host FROM sym),
        |r(host, lbl) AS (
        |  SELECT host, host FROM chosts
        |  UNION
        |  SELECT s.a, r.lbl FROM r JOIN sym s ON r.host = s.b),
        |c AS (SELECT host, min(lbl) AS component FROM r GROUP BY host)
        |SELECT c.component,
        |  CAST(SUM(f.rank) AS BIGINT) AS family_rank,
        |  count(*) AS n_hosts
        |FROM final f JOIN c ON f.host = c.host
        |GROUP BY c.component ORDER BY c.component""".stripMargin,

    // Same reachability closure, then docs join their host's family
    // label and each family keeps its first 5 docs by id.
    "x_mirror_family_select" ->
      """WITH RECURSIVE raw(src, dst) AS (
        |  SELECT 'h' || CAST(doc_id % 60 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id + 12) % 60 AS VARCHAR) || '.example.com'
        |  FROM documents
        |  UNION ALL
        |  SELECT 'h' || CAST(doc_id % 60 AS VARCHAR) || '.example.com',
        |         'h' || CAST((doc_id + 24) % 60 AS VARCHAR) || '.example.com'
        |  FROM documents),
        |edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
        |sym AS (SELECT DISTINCT a, b FROM
        |  (SELECT src AS a, dst AS b FROM edges
        |   UNION ALL SELECT dst, src FROM edges)),
        |hosts AS (SELECT DISTINCT a AS host FROM sym),
        |r(host, lbl) AS (
        |  SELECT host, host FROM hosts
        |  UNION
        |  SELECT s.a, r.lbl FROM r JOIN sym s ON r.host = s.b),
        |c AS (SELECT host, min(lbl) AS component FROM r GROUP BY host),
        |docs AS (SELECT
        |    'h' || CAST(doc_id % 60 AS VARCHAR) || '.example.com' AS host,
        |    doc_id
        |  FROM documents),
        |sel AS (SELECT c.component, d.host, d.doc_id,
        |    row_number() OVER (PARTITION BY c.component
        |                       ORDER BY d.doc_id) AS rn
        |  FROM docs d JOIN c ON d.host = c.host)
        |SELECT component, host, doc_id FROM sel
        |WHERE rn <= 5 ORDER BY component, doc_id""".stripMargin,

    // Construct-the-output identity: whatever wire coding the engine
    // rendered, the decoded body must equal the base text verbatim
    // (and the corrupt class must flag, not fail) — the oracle never
    // re-states a codec.
    "x_warc_encoding" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 9 IN (1, 3) THEN 'chunked'
        |       WHEN doc_id % 9 = 7 THEN 'gzip, chunked' END
        |    AS transfer_encoding,
        |  CASE WHEN doc_id % 9 IN (2, 3, 4) THEN 'gzip'
        |       WHEN doc_id % 9 IN (5, 6) THEN 'deflate'
        |       WHEN doc_id % 9 = 8 THEN 'br' END
        |    AS content_encoding,
        |  (doc_id % 9 NOT IN (4, 8)) AS body_ok,
        |  CASE WHEN doc_id % 9 IN (4, 8) THEN NULL ELSE text END AS body
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Construct-the-expected-pairs oracle: the cleaned anchor text and
    // canonical target of every followed link restated from doc_id
    // arithmetic, then the same capped distinct-sort aggregate.
    "x_anchor_text" ->
      """WITH l(url, a) AS (
        |  SELECT 't.example.org/a/' || CAST(doc_id % 40 AS VARCHAR),
        |         'Article ' || CAST(doc_id % 40 AS VARCHAR) ||
        |           ' v' || CAST(doc_id % 9 AS VARCHAR)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'h' || CAST(doc_id % 31 AS VARCHAR) ||
        |           '.example.com/local/' || CAST(doc_id % 7 AS VARCHAR),
        |         substr('Local & More ' || CAST(doc_id % 7 AS VARCHAR) ||
        |           ' with a long tail', 1, 20)
        |  FROM documents)
        |SELECT url AS url_norm, count(*) AS n_links,
        |  count(DISTINCT a) AS n_distinct,
        |  array_to_string(list_sort(list_distinct(list(a)))[1:8], ' | ')
        |    AS anchors
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,

    // Construct-the-output oracle: the planted CJK bytes must decode
    // back to these exact UTF-8 literals (plus the ASCII suffix).
    "x_warc_charset_cjk" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'shift_jis' WHEN 1 THEN 'euc-jp'
        |       ELSE 'gb18030' END AS charset,
        |  (CASE doc_id % 3 WHEN 0 THEN '日本語テキスト'
        |        WHEN 1 THEN 'かな漢字混じり文' ELSE '简体中文内容' END)
        |    || ' #' || CAST(doc_id % 10 AS VARCHAR) AS body
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Keep-best replay: the argmax (n_chars desc, doc_id asc) winner
    // per digest group via max_by on the same (score, -id) pair the
    // engine's struct-max aggregate orders on.
    "x_dedup_keep_best" ->
      """WITH r AS (SELECT sha256(text) AS digest, doc_id, n_chars,
        |             row_number() OVER (PARTITION BY sha256(text)
        |               ORDER BY n_chars DESC, doc_id) AS rk,
        |             count(*) OVER (PARTITION BY sha256(text)) AS n_copies
        |           FROM documents)
        |SELECT digest, doc_id AS keep_id, n_chars AS keep_score, n_copies
        |FROM r WHERE rk = 1 ORDER BY digest""".stripMargin,

    // Heavy-hitter replay: same count/total share with the same
    // double arithmetic (explicit casts; threshold as a round-trip
    // string literal).
    "x_hot_keys" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents)
        |SELECT lang FROM c CROSS JOIN t
        |WHERE n >= 1 AND CAST(n AS DOUBLE) / total >= CAST('0.15' AS DOUBLE)
        |ORDER BY lang""".stripMargin,

    "x_dedup_stats" ->
      """SELECT count(*) AS n_docs,
        |       count(DISTINCT text) AS n_distinct_text,
        |       count(DISTINCT sha256(text)) AS n_distinct_digest,
        |       count(DISTINCT lang) AS n_langs
        |FROM documents""".stripMargin,

    "x_jaccard_pairs" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |grams AS (SELECT doc_id, unnest(list_distinct(
         |            CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |                 ELSE [array_to_string(tk[i:i+2], ' ')
         |                       for i in generate_series(1, len(tk) - 2)] END)) AS g
         |          FROM toks),
         |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
         |inter AS (SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS n_common
         |          FROM grams ga JOIN grams gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id
         |          GROUP BY 1, 2)
         |SELECT a, b,
         |       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a
         |JOIN sizes sb ON sb.doc_id = b
         |WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.05
         |ORDER BY a, b""".stripMargin,

    // Containment replay: gram-string equality stands in for the
    // engine's 64-bit gram hashes (same equivalence as x_jaccard_pairs);
    // directional denominator = the LEFT doc's distinct-gram count.
    "x_containment_pairs" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |grams AS (SELECT doc_id, unnest(list_distinct(
         |            CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |                 ELSE [array_to_string(tk[i:i+2], ' ')
         |                       for i in generate_series(1, len(tk) - 2)] END)) AS g
         |          FROM toks),
         |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
         |inter AS (SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS n_common
         |          FROM grams ga JOIN grams gb ON ga.g = gb.g AND ga.doc_id <> gb.doc_id
         |          GROUP BY 1, 2)
         |SELECT a, b, CAST(n_common AS DOUBLE) / sa.n AS containment
         |FROM inter JOIN sizes sa ON sa.doc_id = a
         |WHERE CAST(n_common AS DOUBLE) / sa.n >= 0.6
         |ORDER BY a, b""".stripMargin,

    "x_dedup_clusters" -> jaccardClustersSql(0.05),

    // Cluster-size histogram: same recursive cluster replay, rolled up.
    "x_dedup_sizes" ->
      s"""WITH c AS (${jaccardClustersSql(0.05)}),
         |s AS (SELECT rep, CAST(count(*) AS BIGINT) AS sz FROM c GROUP BY rep)
         |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         |FROM s GROUP BY sz ORDER BY cluster_size""".stripMargin,

    // Exact-substring replay: same tokenizer, same distinct 8-token
    // windows (the engine joins on their xxhash64-chain hashes; the
    // oracle joins on the window STRINGS — counts agree modulo 2^-64
    // collisions, the jaccard pipeline's proven equivalence), same
    // >= windowTokens participation filter.
    "x_substring_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |wins AS (SELECT doc_id, unnest(list_distinct(
         |           [array_to_string(tk[i:i+7], ' ')
         |            for i in generate_series(1, len(tk) - 7)])) AS g
         |         FROM toks WHERE len(tk) >= 8)
         |SELECT wa.doc_id AS a, wb.doc_id AS b, count(*) AS n_shared_windows
         |FROM wins wa JOIN wins wb ON wa.g = wb.g AND wa.doc_id < wb.doc_id
         |GROUP BY 1, 2 ORDER BY a, b""".stripMargin,

    // Longest-run replay: POSITIONAL windows (no distinct — runs need
    // every occurrence), diagonal = pb − pa, gaps-and-islands via
    // pos − row_number per (pair, diagonal), max island + 7 tokens.
    "x_longest_run" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |w AS (SELECT doc_id, unnest(generate_series(1, len(tk) - 7)) AS i, tk
         |      FROM toks WHERE len(tk) >= 8),
         |g AS (SELECT doc_id, i - 1 AS pos,
         |             array_to_string(tk[i:i+7], ' ') AS g FROM w),
         |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, ga.pos AS pa,
         |             gb.pos - ga.pos AS diag
         |      FROM g ga JOIN g gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id),
         |r AS (SELECT a, b, diag, pa, row_number() OVER (
         |        PARTITION BY a, b, diag ORDER BY pa) AS rn FROM p),
         |runs AS (SELECT a, b, diag, pa - rn AS grp,
         |                CAST(count(*) AS BIGINT) AS c
         |         FROM r GROUP BY a, b, diag, pa - rn)
         |SELECT a, b, CAST(count(*) AS BIGINT) AS n_runs,
         |       CAST(max(c) + 7 AS BIGINT) AS longest_run_tokens
         |FROM runs GROUP BY 1, 2 ORDER BY a, b""".stripMargin,

    // Self-repeat replay: the islands machinery with both join sides
    // the same document (pa < pb, positive diagonal).
    "x_self_repeat" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |w AS (SELECT doc_id, unnest(generate_series(1, len(tk) - 2)) AS i, tk
         |      FROM toks WHERE len(tk) >= 3),
         |g AS (SELECT doc_id, i - 1 AS pos,
         |             array_to_string(tk[i:i+2], ' ') AS g FROM w),
         |p AS (SELECT ga.doc_id AS doc_id, ga.pos AS pa,
         |             gb.pos - ga.pos AS diag
         |      FROM g ga JOIN g gb ON ga.g = gb.g
         |        AND ga.doc_id = gb.doc_id AND ga.pos < gb.pos),
         |r AS (SELECT doc_id, diag, pa, row_number() OVER (
         |        PARTITION BY doc_id, diag ORDER BY pa) AS rn FROM p),
         |runs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
         |         FROM r GROUP BY doc_id, diag, pa - rn)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
         |       CAST(max(c) + 2 AS BIGINT) AS longest_repeat_tokens
         |FROM runs GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Span-scrub replay: the same islands, mapped to the later doc's
    // covered token range, exploded to flagged positions, tokens
    // rebuilt in order (every ≥1-token doc appears).
    "x_verbatim_scrub" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |w AS (SELECT doc_id, unnest(generate_series(1, len(tk) - 7)) AS i, tk
         |      FROM toks WHERE len(tk) >= 8),
         |g AS (SELECT doc_id, i - 1 AS pos,
         |             array_to_string(tk[i:i+7], ' ') AS g FROM w),
         |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, ga.pos AS pa,
         |             gb.pos - ga.pos AS diag
         |      FROM g ga JOIN g gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id),
         |r AS (SELECT a, b, diag, pa, row_number() OVER (
         |        PARTITION BY a, b, diag ORDER BY pa) AS rn FROM p),
         |sp AS (SELECT b, min(pa) + diag AS s,
         |              min(pa) + diag + count(*) + 6 AS e
         |       FROM r GROUP BY a, b, diag, pa - rn
         |       HAVING count(*) + 7 >= 8),
         |fl AS (SELECT DISTINCT b AS doc_id, unnest(generate_series(s, e)) AS pos
         |       FROM sp),
         |tp AS (SELECT doc_id, unnest(generate_series(1, len(tk))) - 1 AS pos,
         |              tk FROM toks WHERE len(tk) >= 1),
         |tt AS (SELECT doc_id, pos, tk[pos + 1] AS tok FROM tp)
         |SELECT tt.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(count(*) FILTER (fl.pos IS NOT NULL) AS BIGINT) AS n_flagged,
         |       COALESCE(string_agg(tt.tok, ' ' ORDER BY tt.pos)
         |         FILTER (fl.pos IS NULL), '') AS clean_text
         |FROM tt LEFT JOIN fl ON tt.doc_id = fl.doc_id AND tt.pos = fl.pos
         |GROUP BY 1 ORDER BY tt.doc_id""".stripMargin,

    // Novelty replay: same window strings as x_substring_dedup, with
    // the corpus-wide half a doc-frequency count instead of a join.
    "x_ngram_novelty" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |wins AS (SELECT doc_id, unnest(list_distinct(
         |           [array_to_string(tk[i:i+7], ' ')
         |            for i in generate_series(1, len(tk) - 7)])) AS g
         |         FROM toks WHERE len(tk) >= 8),
         |df AS (SELECT g, CAST(count(*) AS BIGINT) AS nd FROM wins GROUP BY g)
         |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |       CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |       CAST(count(*) - sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*) AS novelty
         |FROM wins w JOIN df USING (g)
         |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin,

    // MinHash-LSH replay: same md5 gram keys, same injected affine
    // coefficients, same band buckets (see Dedup.minhashSignatures).
    "x_minhash_pairs" -> minhashPairsSql,

    // Estimator calibration replay: the same bands CTEs expose the
    // full (doc_id, j, h) signature grid; per candidate pair the
    // component-match count and the exact-Jaccard CTEs (engine joins
    // hashed shingles, oracle gram strings — the 2^-64 equivalence).
    "x_minhash_est" ->
      s"""WITH $minhashBandsCtes,
         |cand AS (SELECT DISTINCT la.doc_id AS a, lb.doc_id AS b
         |         FROM bands la JOIN bands lb ON la.band = lb.band
         |          AND la.bucket = lb.bucket AND la.doc_id < lb.doc_id),
         |m AS (SELECT c.a, c.b,
         |             CAST(sum(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS BIGINT) AS n_match
         |      FROM cand c
         |      JOIN sig sa ON sa.doc_id = c.a
         |      JOIN sig sb ON sb.doc_id = c.b AND sb.j = sa.j
         |      GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
         |inter AS (SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS n_common
         |          FROM grams ga JOIN grams gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id
         |          GROUP BY 1, 2),
         |jx AS (SELECT a, b,
         |              CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
         |       FROM inter JOIN sizes sa ON sa.doc_id = a
         |                  JOIN sizes sb ON sb.doc_id = b)
         |SELECT m.a, m.b, m.n_match,
         |       round(CAST(m.n_match AS DOUBLE) / 32, 6) AS est_r,
         |       round(jx.jaccard, 6) AS jacc_r,
         |       round(CAST(m.n_match AS DOUBLE) / 32 - jx.jaccard, 6) AS err_r
         |FROM m JOIN jx ON jx.a = m.a AND jx.b = m.b
         |ORDER BY m.a, m.b""".stripMargin,

    // Edit-verified pairs: the SAME candidate CTE as x_minhash_pairs
    // (sets cannot drift), each pair re-checked by levenshtein ≤ 20.
    // DuckDB's unbounded DP and Spark's threshold-banded DP agree on
    // every distance at or under the bound — the only values kept.
    "x_edit_pairs" ->
      s"""WITH cand AS (SELECT a, b FROM ($minhashPairsSql)),
         |p AS (SELECT a, b,
         |             CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist
         |      FROM cand
         |      JOIN documents da ON da.doc_id = a
         |      JOIN documents db ON db.doc_id = b)
         |SELECT a, b, dist FROM p WHERE dist <= 20 ORDER BY a, b""".stripMargin,

    // Segment-dedup replay: 4-token segments with ordinals via a
    // struct list_transform, corpus-wide first instance by the
    // (doc_id, seg_idx) window, per-doc rebuild with an ordered
    // filtered string_agg (engine groups on xxhash64(segment), oracle
    // on the segment string — the proven 2^-64 hashed-key equivalence).
    "x_segment_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |segx AS (SELECT doc_id, unnest(list_transform(
         |           generate_series(0, CAST(ceil(len(tk) / 4.0) AS BIGINT) - 1),
         |           i -> {'seg_idx': i,
         |                 'seg': array_to_string(tk[(i*4)+1:(i+1)*4], ' '),
         |                 'ntok': least(4, len(tk) - i*4)})) AS u
         |         FROM toks WHERE len(tk) > 0),
         |marked AS (SELECT doc_id, u.seg_idx AS seg_idx, u.seg AS seg,
         |                  u.ntok AS ntok,
         |                  row_number() OVER (PARTITION BY u.seg
         |                                     ORDER BY doc_id, u.seg_idx) AS rn
         |           FROM segx)
         |SELECT doc_id,
         |       CAST(count(*) AS BIGINT) AS n_segs,
         |       CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
         |       CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |       CAST(COALESCE(sum(ntok) FILTER (rn = 1), 0) AS BIGINT) AS n_kept_tokens,
         |       COALESCE(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (rn = 1), '') AS dedup_text
         |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Boilerplate replay: same segmentation, per-doc-distinct segment
    // rows, source doc-frequency over the distinct frame, double
    // fraction of two longs.
    "x_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, source, $toksSql AS tk FROM documents),
         |segx AS (SELECT doc_id, source, unnest(list_transform(
         |           generate_series(0, CAST(ceil(len(tk) / 4.0) AS BIGINT) - 1),
         |           i -> array_to_string(tk[(i*4)+1:(i+1)*4], ' '))) AS seg
         |         FROM toks WHERE len(tk) > 0),
         |d AS (SELECT DISTINCT source, doc_id, seg FROM segx),
         |nd AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |       FROM d GROUP BY 1),
         |f AS (SELECT d.source, seg, CAST(count(*) AS BIGINT) AS df,
         |             max(n_docs) AS n_docs
         |      FROM d JOIN nd ON d.source = nd.source GROUP BY 1, 2)
         |SELECT source, seg AS segment, df, n_docs,
         |       CAST(df AS DOUBLE) / n_docs AS frac
         |FROM f WHERE n_docs >= 2 AND CAST(df AS DOUBLE) / n_docs >= 0.05
         |ORDER BY source, segment""".stripMargin,

    // Scrub replay: the flag table above anti-marks every occurrence;
    // kept segments rebuild in seg_idx order (empty docs → '').
    "x_boilerplate_scrub" ->
      s"""WITH toks AS (SELECT doc_id, source, $toksSql AS tk FROM documents),
         |segx AS (SELECT doc_id, source, unnest(list_transform(
         |           generate_series(0, CAST(ceil(len(tk) / 4.0) AS BIGINT) - 1),
         |           i -> {'seg_idx': i,
         |                 'seg': array_to_string(tk[(i*4)+1:(i+1)*4], ' ')})) AS u
         |         FROM toks WHERE len(tk) > 0),
         |sx AS (SELECT doc_id, source, u.seg_idx AS seg_idx, u.seg AS seg
         |       FROM segx),
         |d AS (SELECT DISTINCT source, doc_id, seg FROM sx),
         |nd AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |       FROM d GROUP BY 1),
         |fl AS (SELECT d.source, seg FROM d JOIN nd ON d.source = nd.source
         |       GROUP BY 1, 2, n_docs
         |       HAVING n_docs >= 2 AND CAST(count(*) AS DOUBLE) / n_docs >= 0.05)
         |SELECT sx.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_segs,
         |       CAST(count(*) FILTER (fl.seg IS NOT NULL) AS BIGINT) AS n_dropped,
         |       COALESCE(string_agg(sx.seg, ' ' ORDER BY sx.seg_idx)
         |         FILTER (fl.seg IS NULL), '') AS clean_text
         |FROM sx LEFT JOIN fl ON sx.source = fl.source AND sx.seg = fl.seg
         |GROUP BY 1 ORDER BY sx.doc_id""".stripMargin,

    // Cross-corpus replay: bands over ALL docs (signatures depend only
    // on text), collisions filtered to new (odd) × archive (even).
    "x_crosscorpus_dedup" ->
      s"""WITH $minhashBandsCtes
         |SELECT DISTINCT ln.doc_id AS doc_id, lh.doc_id AS hist_id
         |FROM bands ln JOIN bands lh
         |  ON ln.band = lh.band AND ln.bucket = lh.bucket
         |WHERE ln.doc_id % 2 = 1 AND lh.doc_id % 2 = 0
         |ORDER BY doc_id, hist_id""".stripMargin,

    // LSH recall/precision against exact Jaccard ground truth at the
    // near-dup operating point (0.7) — the dedup analogue of
    // x_ann_recall, from the same replayed pair sets.
    "x_lsh_recall" ->
      s"""WITH truth AS (SELECT a, b FROM ($jaccardTruthSql)),
         |cand AS (SELECT a, b FROM ($minhashPairsSql)),
         |h AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
         |      FROM truth t JOIN cand c ON t.a = c.a AND t.b = c.b),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS n_true_pairs FROM truth),
         |cc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cand)
         |SELECT n_true_pairs, n_candidates, n_hit,
         |       CASE WHEN n_true_pairs > 0
         |            THEN CAST(n_hit AS DOUBLE) / n_true_pairs
         |            ELSE 1.0 END AS recall,
         |       CASE WHEN n_candidates > 0
         |            THEN CAST(n_hit AS DOUBLE) / n_candidates
         |            ELSE 1.0 END AS cand_precision
         |FROM h, tt, cc""".stripMargin,

    // SimHash replay: 60-bit signature from per-bit ±1 votes of each
    // distinct token's md5 key; 4×15-bit chunk banding; exact Hamming
    // verify (see Dedup.simhashSignatures).
    "x_simhash_pairs" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |dtok AS (SELECT doc_id, unnest(list_distinct(tk)) AS tok FROM toks),
         |hs AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM dtok),
         |votes AS (SELECT doc_id, b, sum(2 * ((h >> b) & 1) - 1) AS v
         |          FROM hs CROSS JOIN generate_series(0, 59) s(b) GROUP BY 1, 2),
         |sigs0 AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sig
         |          FROM votes GROUP BY 1),
         |sigs AS (SELECT d.doc_id, coalesce(s.sig, 0) AS sig
         |         FROM documents d LEFT JOIN sigs0 s ON d.doc_id = s.doc_id),
         |chunks AS (SELECT doc_id, sig, c, (sig >> (c * 15)) & 32767 AS key
         |           FROM sigs CROSS JOIN generate_series(0, 3) s(c)),
         |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.sig AS sa, r.sig AS sb
         |         FROM chunks l JOIN chunks r ON l.c = r.c AND l.key = r.key
         |          AND l.doc_id < r.doc_id)
         |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS dist
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY a, b""".stripMargin,

    // token-stutter removal: case-sensitive single-space split, lag
    // window per doc, ordered string_agg rebuild — a transform, so the
    // rebuilt TEXT is compared, not just counts
    "x_squeeze_repeats" ->
      """WITH parts AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |                      generate_subscripts(string_split(text, ' '), 1) AS pos
        |               FROM documents),
        |k AS (SELECT doc_id, pos, w,
        |             lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS pw
        |      FROM parts),
        |kk AS (SELECT doc_id, pos, w FROM k WHERE pw IS NULL OR w <> pw),
        |agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS text_clean,
        |               count(*) AS n_kept
        |        FROM kk GROUP BY 1)
        |SELECT d.doc_id, a.text_clean, a.n_kept,
        |       CAST(len(string_split(d.text, ' ')) AS BIGINT) - a.n_kept AS n_dropped
        |FROM documents d JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

    "x_winnow" ->
      s"""WITH $winnowCtes
         |SELECT doc_id, fp FROM fps ORDER BY doc_id, fp""".stripMargin,

    "x_winnow_pairs" ->
      s"""WITH $winnowCtes,
         |shared AS (SELECT fa.doc_id AS a, fb.doc_id AS b, count(*) AS n_shared
         |           FROM fps fa JOIN fps fb
         |             ON fa.fp = fb.fp AND fa.doc_id < fb.doc_id
         |           GROUP BY 1, 2)
         |SELECT a, b, n_shared FROM shared WHERE n_shared >= 2
         |ORDER BY a, b""".stripMargin,

    "x_cdc_chunks" ->
      s"""WITH $cdcCtes
         |SELECT doc_id, chunk_idx, chunk_text, n_chunk_tokens
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    "x_cdc_dups" ->
      s"""WITH $cdcCtes
         |SELECT chunk_text, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       CAST(count(*) AS BIGINT) AS n_occurrences,
         |       CAST(min(doc_id) AS BIGINT) AS min_doc
         |FROM ch WHERE n_chunk_tokens >= 4
         |GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY chunk_text""".stripMargin,

    "x_cdc_scrub" ->
      s"""WITH $cdcCtes,
         |dup AS (SELECT chunk_text, min(doc_id) AS md
         |        FROM ch WHERE n_chunk_tokens >= 4
         |        GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
         |j AS (SELECT c.doc_id, c.chunk_idx, c.chunk_text,
         |        CASE WHEN d.chunk_text IS NULL OR c.doc_id = d.md
         |             THEN 1 ELSE 0 END AS keep
         |      FROM ch c LEFT JOIN dup d USING (chunk_text))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |       CAST(sum(1 - keep) AS BIGINT) AS n_dropped,
         |       COALESCE(string_agg(CASE WHEN keep = 1 THEN chunk_text END,
         |         ' ' ORDER BY chunk_idx), '') AS clean_text
         |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Per-source card replay: corpus-card fragments grouped by source.
    "x_source_cards" ->
      s"""WITH f AS (SELECT source, lang, text,
         |             CAST(len($toksSql) AS BIGINT) AS ntk,
         |             ($qualityBucketSql) AS qb
         |           FROM documents),
         |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(ntk) AS BIGINT) AS n_tokens,
         |        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |        CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_docs,
         |        CAST(sum(CASE WHEN qb = 'good' THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_good
         |      FROM f GROUP BY 1)
         |SELECT source, n_docs, n_tokens, n_langs, n_dup_docs, n_good,
         |       CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
         |         AS mean_doc_tokens
         |FROM a ORDER BY source""".stripMargin,

    "x_corpus_card" ->
      s"""WITH f AS (SELECT lang, source, text,
         |       CAST(len(text) AS BIGINT) AS nch,
         |       CAST(len($toksSql) AS BIGINT) AS ntk,
         |       ($qualityBucketSql) AS qb
         |     FROM documents),
         |base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(ntk) AS BIGINT) AS n_tokens,
         |       CAST(sum(nch) AS BIGINT) AS n_chars,
         |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |       CAST(sum(CASE WHEN qb = 'good' THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
         |       CAST(sum(CASE WHEN qb = 'fair' THEN 1 ELSE 0 END) AS BIGINT) AS n_fair,
         |       CAST(sum(CASE WHEN qb = 'poor' THEN 1 ELSE 0 END) AS BIGINT) AS n_poor
         |     FROM f),
         |v AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS n_vocab
         |      FROM (SELECT unnest($toksSql) AS t FROM documents)),
         |du AS (SELECT CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_docs
         |       FROM documents)
         |SELECT base.*, v.n_vocab, du.n_dup_docs,
         |       n_tokens / CAST(n_docs AS DOUBLE) AS mean_doc_tokens
         |FROM base, v, du""".stripMargin,

    "x_cdc_decontaminate" ->
      s"""WITH $cdcCtes,
         |trn AS (SELECT DISTINCT chunk_text FROM ch
         |        WHERE doc_id % 50 <> 0 AND n_chunk_tokens >= 4),
         |bc AS (SELECT doc_id, chunk_text, n_chunk_tokens FROM ch
         |       WHERE doc_id % 50 = 0)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |       CAST(sum(CASE WHEN trn.chunk_text IS NOT NULL
         |                      AND n_chunk_tokens >= 4
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |       CAST(max(CASE WHEN trn.chunk_text IS NOT NULL
         |                      AND n_chunk_tokens >= 4
         |                     THEN 1 ELSE 0 END) AS INT) AS dirty
         |FROM bc LEFT JOIN trn USING (chunk_text)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Logistic regression re-trained from scratch in SQL: the final
    // grid weights, then the margins/predictions under them.
    "x_logreg_weights" ->
      s"""WITH $logregCtes
         |SELECT dim, w9 FROM w$LogRegIters ORDER BY dim""".stripMargin,

    "x_logreg_predict" ->
      s"""WITH $logregCtes
         |SELECT l.doc_id, COALESCE(z.z9, 0) AS z9,
         |       CASE WHEN COALESCE(z.z9, 0) > 0 THEN 1 ELSE 0 END AS pred,
         |       l.y
         |FROM lab l LEFT JOIN zf z USING (doc_id)
         |ORDER BY l.doc_id""".stripMargin,

    // Calibration replay: same margins, same deterministic ntile.
    "x_logreg_calibration" ->
      s"""WITH $logregCtes,
         |sc AS (SELECT l.doc_id, COALESCE(z.z9, 0) AS z9,
         |              CAST(l.y AS BIGINT) AS y
         |       FROM lab l LEFT JOIN zf z USING (doc_id)),
         |bn AS (SELECT doc_id, z9, y,
         |              ntile(10) OVER (ORDER BY z9, doc_id) AS bin FROM sc)
         |SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(y) AS BIGINT) AS n_good,
         |       min(z9) AS z9_lo, max(z9) AS z9_hi,
         |       CAST(sum(y) AS DOUBLE) / count(*) AS frac_good
         |FROM bn GROUP BY 1 ORDER BY bin""".stripMargin,

    "x_nb_classify" ->
      s"""WITH ${nbCtesWith("w")}
         |SELECT doc_id, actual, predicted, best_lp9, correct
         |FROM nb ORDER BY doc_id""".stripMargin,

    "x_nb_accuracy" ->
      s"""WITH ${nbCtesWith("w")}
         |SELECT actual, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(correct) AS BIGINT) AS n_correct
         |FROM nb GROUP BY 1 ORDER BY actual""".stripMargin,

    "x_nb_hashed" -> {
      val p = Dedup.MinhashPrime
      val bucket = s"(('0x' || substr(md5(w), 1, 15))::BIGINT % $p) % 64"
      s"""WITH ${nbCtesWith(bucket)}
         |SELECT doc_id, actual, predicted, best_lp9, correct
         |FROM nb ORDER BY doc_id""".stripMargin
    },

    // Margin replay: the scored CTE's rk=1/rk=2 scores subtracted —
    // the same (sc9 DESC, lbl) ranking the engine's top-2 tracker
    // realizes.
    "x_nb_margin" ->
      s"""WITH ${nbCtesWith("w")},
         |r2 AS (SELECT doc_id, lbl, sc9,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY sc9 DESC, lbl) AS rk
         |       FROM scored)
         |SELECT b.doc_id, b.lbl AS predicted, b.sc9 AS best_lp9,
         |       s.sc9 AS second_lp9, b.sc9 - s.sc9 AS margin9
         |FROM r2 b JOIN r2 s ON b.doc_id = s.doc_id
         |WHERE b.rk = 1 AND s.rk = 2
         |ORDER BY b.doc_id""".stripMargin,

    "x_nb_confusion" ->
      s"""WITH ${nbCtesWith("w")}
         |SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
         |FROM nb GROUP BY 1, 2 ORDER BY actual, predicted""".stripMargin,

    // PRF replay: exact integer marginals from the confusion cells;
    // the ratio doubles follow the engine's exact op order (tp/denom
    // single divisions; f1 = 2·p·r/(p+r) left-associated).
    "x_nb_prf" ->
      s"""WITH ${nbCtesWith("w")},
         |cells AS (SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
         |          FROM nb GROUP BY 1, 2),
         |ba AS (SELECT actual, CAST(sum(n) AS BIGINT) AS n_actual,
         |         CAST(sum(CASE WHEN actual = predicted THEN n ELSE 0 END)
         |           AS BIGINT) AS tp
         |       FROM cells GROUP BY 1),
         |bp AS (SELECT predicted, CAST(sum(n) AS BIGINT) AS n_pred
         |       FROM cells GROUP BY 1),
         |m AS (SELECT actual AS label, n_actual,
         |        COALESCE(n_pred, CAST(0 AS BIGINT)) AS n_pred, tp
         |      FROM ba LEFT JOIN bp ON ba.actual = bp.predicted),
         |pr AS (SELECT label, n_actual, n_pred, tp,
         |         CASE WHEN n_pred = 0 THEN 0.0
         |              ELSE CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END
         |           AS prec,
         |         CASE WHEN n_actual = 0 THEN 0.0
         |              ELSE CAST(tp AS DOUBLE) / CAST(n_actual AS DOUBLE) END
         |           AS rec
         |       FROM m)
         |SELECT label, n_actual, n_pred, tp, prec, rec,
         |       CASE WHEN prec + rec = 0.0 THEN 0.0
         |            ELSE 2.0 * prec * rec / (prec + rec) END AS f1
         |FROM pr ORDER BY label""".stripMargin,

    "x_hash_features" -> {
      val p = Dedup.MinhashPrime
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |dimc AS (SELECT doc_id,
         |    CAST((('0x' || substr(md5(w), 1, 15))::BIGINT % $p) % 64 AS INT) AS dim,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM tok GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nnz,
         |    CAST(sum(c * c) AS BIGINT) AS norm_sq, max(c) AS mx
         |  FROM dimc GROUP BY 1),
         |am AS (SELECT d.doc_id, min(d.dim) AS argmax_dim
         |  FROM dimc d JOIN agg a ON d.doc_id = a.doc_id AND d.c = a.mx
         |  GROUP BY 1)
         |SELECT doc.doc_id, COALESCE(a.nnz, 0) AS nnz,
         |       COALESCE(a.norm_sq, 0) AS norm_sq,
         |       COALESCE(a.mx, 0) AS max_count,
         |       COALESCE(am.argmax_dim, -1) AS argmax_dim
         |FROM documents doc LEFT JOIN agg a USING (doc_id)
         |LEFT JOIN am USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "x_ndcg" -> {
      def d(x: Double) = s"CAST('$x' AS DOUBLE)"
      val ln2 = d(math.log(2.0))
      s"""WITH $ndcgPqCtes,
         |dr AS (SELECT query_id, rel, row_number() OVER (
         |         PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rk FROM pq),
         |ir AS (SELECT query_id, rel, row_number() OVER (
         |         PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rk FROM pq),
         |dg AS (SELECT query_id, CAST(sum(CAST(round(rel / (ln(rk + ${d(1.0)})
         |         / $ln2) * 1e9) AS BIGINT)) AS BIGINT) AS dcg_u9
         |       FROM dr WHERE rk <= 10 GROUP BY 1),
         |ig AS (SELECT query_id, CAST(sum(CAST(round(rel / (ln(rk + ${d(1.0)})
         |         / $ln2) * 1e9) AS BIGINT)) AS BIGINT) AS idcg_u9
         |       FROM ir WHERE rk <= 10 GROUP BY 1)
         |SELECT query_id, dcg_u9, idcg_u9,
         |       dcg_u9 / CAST(idcg_u9 AS DOUBLE) AS ndcg
         |FROM dg JOIN ig USING (query_id) ORDER BY query_id""".stripMargin
    },

    "x_mrr" -> {
      val nts = NdcgQueries
        .map { case (q, ts) => s"($q, ${ts.distinct.size})" }.mkString(", ")
      s"""WITH $ndcgPqCtes,
         |nt AS (SELECT * FROM (VALUES $nts) AS v(query_id, nterms)),
         |r AS (SELECT query_id, rel, row_number() OVER (
         |        PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rk FROM pq),
         |fr AS (SELECT r.query_id, CAST(min(rk) AS BIGINT) AS first_rank
         |       FROM r JOIN nt USING (query_id) WHERE rel = nterms GROUP BY 1)
         |SELECT nt.query_id, fr.first_rank,
         |       COALESCE(CAST(round(1e9 / fr.first_rank) AS BIGINT), 0) AS rr_u9
         |FROM nt LEFT JOIN fr USING (query_id) ORDER BY query_id""".stripMargin
    },

    "x_recall_at_k" -> {
      val nts = NdcgQueries
        .map { case (q, ts) => s"($q, ${ts.distinct.size})" }.mkString(", ")
      s"""WITH $ndcgPqCtes,
         |nt AS (SELECT * FROM (VALUES $nts) AS v(query_id, nterms)),
         |r AS (SELECT query_id, rel, row_number() OVER (
         |        PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rk FROM pq),
         |ag AS (SELECT r.query_id, CAST(count(*) AS BIGINT) AS n_relevant,
         |         CAST(sum(CASE WHEN rk <= 10 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_retrieved
         |       FROM r JOIN nt USING (query_id) WHERE rel = nterms GROUP BY 1)
         |SELECT nt.query_id, COALESCE(ag.n_relevant, 0) AS n_relevant,
         |       COALESCE(ag.n_retrieved, 0) AS n_retrieved,
         |       ag.n_retrieved / CAST(ag.n_relevant AS DOUBLE) AS recall
         |FROM nt LEFT JOIN ag USING (query_id) ORDER BY query_id""".stripMargin
    },

    // AP@10 replay: same pq frame and rank window; the i-th relevant
    // doc (ordered by rank) contributes round(1e9·i/rank) when inside
    // the top 10 — exact long arithmetic until the final division.
    "x_map" -> {
      val nts = NdcgQueries
        .map { case (q, ts) => s"($q, ${ts.distinct.size})" }.mkString(", ")
      s"""WITH $ndcgPqCtes,
         |nt AS (SELECT * FROM (VALUES $nts) AS v(query_id, nterms)),
         |r AS (SELECT query_id, rel, doc_id, row_number() OVER (
         |        PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rk FROM pq),
         |relr AS (SELECT r.query_id, rk, row_number() OVER (
         |           PARTITION BY r.query_id ORDER BY rk) AS cum
         |         FROM r JOIN nt USING (query_id) WHERE rel = nterms),
         |ag AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant,
         |         CAST(sum(CASE WHEN rk <= 10
         |           THEN CAST(round(cum * 1e9 / rk) AS BIGINT) ELSE 0 END)
         |           AS BIGINT) AS sum_prec_u9
         |       FROM relr GROUP BY 1)
         |SELECT nt.query_id, COALESCE(ag.n_relevant, 0) AS n_relevant,
         |       COALESCE(ag.sum_prec_u9, 0) AS sum_prec_u9,
         |       CAST(ag.sum_prec_u9 AS DOUBLE)
         |         / (1e9 * least(ag.n_relevant, 10)) AS ap
         |FROM nt LEFT JOIN ag USING (query_id) ORDER BY query_id""".stripMargin
    },

    // RRF replay: the same two rank windows over pq, the same
    // grid-integer contributions, the same (fused desc, id) cut.
    "x_rrf" ->
      s"""WITH $ndcgPqCtes,
         |rk AS (SELECT query_id, doc_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY s9 DESC, doc_id) AS r1,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY rel DESC, doc_id) AS r2
         |       FROM pq),
         |f AS (SELECT query_id, doc_id,
         |        CAST(CAST(round(1e9 / (60 + r1)) AS BIGINT)
         |           + CAST(round(1e9 / (60 + r2)) AS BIGINT) AS BIGINT) AS fused9
         |      FROM rk),
         |c AS (SELECT query_id, doc_id, fused9,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY fused9 DESC, doc_id) AS rank
         |      FROM f)
         |SELECT query_id, doc_id, fused9, CAST(rank AS INT) AS rank
         |FROM c WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // MATTR replay: per-doc sliding 50-token windows, integer distinct
    // counts summed exactly, one double division.
    "x_mattr" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |w AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
         |             CAST(greatest(len(tk) - 49, 1) AS BIGINT) AS nw, tk
         |      FROM toks),
         |c AS (SELECT doc_id, n, nw,
         |             unnest(generate_series(1, nw)) AS i, tk FROM w),
         |d AS (SELECT doc_id, n, nw,
         |             CAST(len(list_distinct(tk[i:i+49])) AS BIGINT) AS dc
         |      FROM c),
         |a AS (SELECT doc_id, max(n) AS n_tokens, max(nw) AS n_windows,
         |             CAST(sum(dc) AS BIGINT) AS sd
         |      FROM d GROUP BY 1)
         |SELECT doc_id, n_tokens, n_windows,
         |       CAST(sd AS DOUBLE) / (n_windows * least(50, n_tokens)) AS mattr
         |FROM a ORDER BY doc_id""".stripMargin,

    // A-ES reservoir replay: same md5 uniform (stream corpus_wres),
    // same grid-quantized ln(u)/w key, same (key desc, doc_id) top-100.
    "x_weighted_reservoir" -> {
      val u = s"(CAST('1.0' AS DOUBLE) - ('0x' || substr(md5('$Seed' || chr(1) || " +
        s"'corpus_wres' || chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      s"""WITH q AS (SELECT doc_id, $qualityBucketSql AS quality_bucket
         |           FROM documents),
         |k AS (SELECT doc_id, quality_bucket,
         |        CAST(round(ln($u) / (CASE quality_bucket
         |          WHEN 'good' THEN CAST('1.0' AS DOUBLE)
         |          WHEN 'fair' THEN CAST('0.5' AS DOUBLE)
         |          ELSE CAST('0.1' AS DOUBLE) END) * 1e9) AS BIGINT) AS key9
         |      FROM q)
         |SELECT doc_id, quality_bucket, key9 FROM k
         |ORDER BY key9 DESC, doc_id LIMIT 100""".stripMargin
    },

    "q_multiformat_scan" ->
      s"""WITH a AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
         |        CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
         |        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         |      FROM lineitem GROUP BY 1)
         |SELECT 'csv' AS fmt, l_returnflag, n_rows, sum_okey, sum_qty FROM a
         |UNION ALL
         |SELECT 'json' AS fmt, l_returnflag, n_rows, sum_okey, sum_qty FROM a
         |UNION ALL
         |SELECT 'orc' AS fmt, l_returnflag, n_rows, sum_okey, sum_qty FROM a
         |ORDER BY fmt, l_returnflag""".stripMargin,

    // Partitioned-scan replay: the pruning changes what the engine
    // READS, not what it computes — the oracle is the plain filtered
    // aggregate over the source table.
    "q_partitioned_scan" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents WHERE lang IN ('en', 'zh')
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    // bucket-size histogram over the SAME band/bucket construction as
    // x_minhash_pairs (shared minhashBandsCtes)
    "x_lsh_occupancy" ->
      s"""WITH $minhashBandsCtes,
         |sizes AS (SELECT band, bucket, count(*) AS n
         |          FROM bands GROUP BY 1, 2)
         |SELECT n AS bucket_size, count(*) AS n_buckets
         |FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin,

    // band occupancy over the SAME dsir-banded frame as
    // x_budget_select (shared budgetBandedCtes)
    "x_band_occupancy" ->
      s"""WITH $budgetBandedCtes
         |SELECT band, count(*) AS n_rows, CAST(sum(n) AS BIGINT) AS n_tokens
         |FROM bd GROUP BY 1 ORDER BY 1""".stripMargin,

    // Stub media codecs replay in DuckDB: documents.text IS the payload
    // byte-for-byte (Spark casts the string to binary = its UTF-8 bytes;
    // DuckDB md5/strlen also operate on UTF-8 bytes), and the stub's
    // entropy source is the same md5 prefix both engines compute. All
    // forms here are byte-semantic (strlen, hex(encode(..)) slicing), so
    // the oracles hold even for non-ASCII corpora; the ScaleSpec ASCII
    // pin is a dataset canary, not a correctness precondition.
    // sample_rate/channels are the REAL wav-parse outputs, pinned 0 here
    // because a text payload can never carry the RIFF/WAVE magic — the
    // wav branch itself is exercised in MultimodalSpec.
    "x_media_meta" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |                  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |                  ('0x' || substr(md5(text), 1, 15))::BIGINT AS h,
        |                  CAST(strlen(text) AS BIGINT) AS n_bytes
        |           FROM documents)
        |SELECT media_id, kind,
        |       CAST(h % 1920 + 1 AS INT) AS width,
        |       CAST((h >> 16) % 1080 + 1 AS INT) AS height,
        |       CAST((h >> 32) % 600 + 1 AS INT) AS duration_s,
        |       n_bytes,
        |       CAST(0 AS INT) AS sample_rate, CAST(0 AS INT) AS channels
        |FROM m ORDER BY media_id""".stripMargin,

    // decodeBatched's MessageDigest kernel computes the same md5 prefix
    // as the Column path, so the oracle is the same formula.
    "x_media_decode" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |                  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |                  ('0x' || substr(md5(text), 1, 15))::BIGINT AS h,
        |                  CAST(strlen(text) AS BIGINT) AS n_bytes
        |           FROM documents)
        |SELECT media_id, kind,
        |       CAST(h % 1920 + 1 AS INT) AS width,
        |       CAST((h >> 16) % 1080 + 1 AS INT) AS height,
        |       CAST((h >> 32) % 600 + 1 AS INT) AS duration_s,
        |       n_bytes,
        |       CAST(0 AS INT) AS sample_rate, CAST(0 AS INT) AS channels
        |FROM m ORDER BY media_id""".stripMargin,

    "x_media_frames" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
        |                  ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        |           FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT media_id, text,
        |              unnest(generate_series(0, (h >> 32) % 600, 60)) AS frame_ts
        |       FROM m)
        |SELECT media_id, frame_ts,
        |       lower(substr(hex(encode(text)),
        |                    CAST((frame_ts % 16) * 2 + 1 AS INT), 32)) AS frame_hex
        |FROM fr ORDER BY media_id, frame_ts""".stripMargin,

    "x_semdedup" -> semDedupSql,
    "x_semdedup_apply" ->
      s"""WITH sd AS ($semDedupSql)
         |SELECT e.vec_id, e.label FROM embeddings e
         |JOIN sd ON e.vec_id = sd.vec_id AND sd.kept
         |ORDER BY e.vec_id""".stripMargin,
    "x_ivf_cells" ->
      s"""WITH $ivfAssignCtes
         |SELECT CAST(cid AS INTEGER) AS cid,
         |       CAST(count(*) AS BIGINT) AS n_vectors
         |FROM af GROUP BY cid ORDER BY cid""".stripMargin,

    // Inertia replay: ‖c‖² − 2·v·c + ‖v‖² with the same left-to-right
    // fold arithmetic (ivfDotL), per-row 1e-9 quantization BEFORE the
    // long sum — identical associativity to the engine's expansion.
    "x_kmeans_inertia" ->
      s"""WITH $ivfAssignCtes,
         |d AS (SELECT af.cid,
         |        CAST(round((${ivfNorm2("c.cv")} - 2.0 * ${ivfDotL("af.v", "c.cv")}
         |          + ${ivfNorm2("af.v")}) * 1000000000.0) AS BIGINT) AS q9
         |      FROM af JOIN cent3 c ON af.cid = c.cid)
         |SELECT CAST(cid AS INTEGER) AS cid,
         |       CAST(count(*) AS BIGINT) AS n_vectors,
         |       CAST(sum(q9) AS DOUBLE) / 1000000000.0 AS inertia
         |FROM d GROUP BY 1 ORDER BY cid""".stripMargin,

    // Dim-stats replay: same grids (1e-9 values / 1e-12 squares),
    // HUGEINT sums (the engine's decimal(38,0) twin), same final
    // double op order.
    "x_embed_dim_stats" ->
      """WITH e AS (SELECT [CAST(x AS DOUBLE) for x in embedding] AS v
        |           FROM embeddings),
        |x AS (SELECT i - 1 AS dim, v[i] AS x
        |      FROM e CROSS JOIN generate_series(1, 64) g(i)),
        |a AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(round(x * 1000000000.0) AS BIGINT)) AS s9,
        |        sum(CAST(round(x * x * 1000000000000.0) AS BIGINT)) AS q12,
        |        min(x) AS min_v, max(x) AS max_v
        |      FROM x GROUP BY 1)
        |SELECT CAST(dim AS INTEGER) AS dim, n,
        |       CAST(s9 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0)
        |         AS mean,
        |       CAST(q12 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000000.0)
        |         - (CAST(s9 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0))
        |         * (CAST(s9 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0))
        |         AS variance,
        |       min_v, max_v
        |FROM a ORDER BY dim""".stripMargin,

    // Degree replay over the SAME pair construction as
    // x_minhash_pairs (shared minhashPairsSql).
    "x_neardup_degree" ->
      s"""WITH cand AS (SELECT a, b FROM ($minhashPairsSql))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS degree
         |FROM (SELECT a AS doc_id FROM cand
         |      UNION ALL SELECT b AS doc_id FROM cand)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // bottom-3 per cell by cosine to the own centroid — same k-means
    // replay (ivfAssignCtes), same sequential-fold dot arithmetic as
    // the ranked sim queries
    "x_embedding_outliers" ->
      s"""WITH $ivfAssignCtes,
         |cc AS (SELECT a.vec_id, CAST(a.cid AS INTEGER) AS cid,
         |              ${ivfDotL("a.v", "c.cv")} /
         |                (sqrt(${ivfNorm2("a.v")}) * sqrt(${ivfNorm2("c.cv")})) AS cos
         |       FROM af a JOIN cent3 c ON a.cid = c.cid),
         |rk AS (SELECT vec_id, cid, cos,
         |              row_number() OVER (PARTITION BY cid
         |                ORDER BY cos ASC, vec_id ASC) AS rank
         |       FROM cc)
         |SELECT vec_id, cid, CAST(rank AS INTEGER) AS rank, round(cos, 6) AS cos_r
         |FROM rk WHERE rank <= 3 ORDER BY cid, rank""".stripMargin,
    "x_sim_ivf" -> simIvfSql,

    // The probe-only query ranks bit-identically to the
    // train-per-query form (same centroids persisted and reloaded as
    // exact doubles), so it shares the same from-scratch oracle.
    "x_sim_ivf_probe" -> simIvfSql,

    "x_media_features" ->
      """SELECT doc_id AS media_id, d AS dim,
        |       (('0x' || substr(md5(text || chr(1) || d::VARCHAR), 1, 15))::BIGINT
        |        % 2000) / 1000.0 - 1.0 AS feature_val
        |FROM documents CROSS JOIN generate_series(0, 7) s(d)
        |ORDER BY media_id, dim""".stripMargin,

    // Exact transitive closure at the pipeline's verify threshold: the
    // LSH banding stage only *proposes* candidates and the exact-jaccard
    // verify keeps pairs >= 0.3, so the output equals the closure over
    // ALL exact pairs >= 0.3 whenever LSH recall is 1.0 — verified by
    // running this oracle at sf0.001, sf0.01, AND sf0.1 (the data and
    // seeds are fixed, so the banding outcome is deterministic per SF).
    "x_neardup_text" -> jaccardClustersSql(0.3),

    "x_text_quality" ->
      s"""SELECT doc_id,
         |  CAST(len(text) AS BIGINT) AS n_chars_m,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |  CAST($bpeishSql AS BIGINT) AS n_bpeish,
         |  CAST(len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]')) AS BIGINT) AS n_punct,
         |  CAST(${Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for").map(occSql).mkString(" + ")} AS BIGINT) AS n_stop,
         |  $qualityBucketSql AS quality_bucket
         |FROM documents ORDER BY doc_id""".stripMargin,

    // SQL-surface replay: the x_text_quality counter fragments plus
    // the shared CDC chunk CTE (docs with no chunks coalesce to 0) —
    // the registry path computes what the Column path computes.
    "x_sql_surface" ->
      s"""WITH $cdcCtes,
         |cc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
         |       FROM ch GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |  CAST($bpeishSql AS BIGINT) AS n_bpeish,
         |  CAST(len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]')) AS BIGINT) AS n_punct,
         |  CAST(${Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for").map(occSql).mkString(" + ")} AS BIGINT) AS n_stop,
         |  COALESCE(cc.n_chunks, CAST(0 AS BIGINT)) AS n_chunks
         |FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Weighted-sample replay: same bucket fragment, same rate CASE,
    // same md5 keep-decision (explicit DOUBLE casts as in x_mix_to).
    "x_weighted_sample" -> {
      val u = s"(('0x' || substr(md5('$Seed' || chr(1) || 'corpus_wsample' || " +
        s"chr(1) || doc_id::VARCHAR), 1, 13))::BIGINT * ${Rng.Inv2p52})"
      s"""WITH q AS (SELECT doc_id, $qualityBucketSql AS quality_bucket
         |           FROM documents)
         |SELECT doc_id, quality_bucket FROM q
         |WHERE $u < (CASE quality_bucket WHEN 'good' THEN CAST(1.0 AS DOUBLE)
         |            WHEN 'fair' THEN CAST(0.5 AS DOUBLE)
         |            ELSE CAST(0.1 AS DOUBLE) END)
         |ORDER BY doc_id""".stripMargin
    },

    "x_langid" ->
      s"""WITH scored AS (SELECT doc_id,
         |  CAST(${langScoreSql("en")} AS BIGINT) AS s_en,
         |  CAST(${langScoreSql("de")} AS BIGINT) AS s_de,
         |  CAST(${langScoreSql("fr")} AS BIGINT) AS s_fr,
         |  CAST(${langScoreSql("es")} AS BIGINT) AS s_es,
         |  CAST(${langScoreSql("zh")} AS BIGINT) AS s_zh
         |FROM documents)
         |SELECT doc_id,
         |  CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
         |       WHEN s_zh = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'zh'
         |       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
         |       WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
         |       WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
         |       ELSE 'de' END AS lang_pred
         |FROM scored ORDER BY doc_id""".stripMargin,

    // Trigram-langid replay: same char trigrams (code-point substr on
    // the lowercased text), same Jelinek-Mercer-interpolated scores
    // (λ and 1−λ as round-trip double literals, identical operation
    // order) on the 1e-9 grid (order-independent long sums), same
    // descending-lexicographic tie-break as the struct greatest.
    "x_langid_trigram" -> langIdTrigramSql(margin = false),

    // Margin replay: the same score CTEs, second-best read off a
    // sorted score list, exact long subtraction.
    "x_langid_margin" -> langIdTrigramSql(margin = true),

    "x_fingerprint" ->
      s"""SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    [CAST(unicode(c) AS BIGINT)
         |     for c in split(array_to_string($toksSql, ' '), '')]),
         |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    // Normalized-dedup replay: the x_fingerprint rolling hash as the
    // group key.
    "x_dedup_normalized" ->
      s"""WITH f AS (SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    [CAST(unicode(c) AS BIGINT)
         |     for c in split(array_to_string($toksSql, ' '), '')]),
         |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
         |FROM documents)
         |SELECT fp, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
         |FROM f GROUP BY 1 ORDER BY fp""".stripMargin,

    // Calibration replay: percent_rank is (rank-1)/(n-1) with shared
    // tie ranks in both engines; same source partitioning and
    // n_chars order.
    "x_quality_calibrate" ->
      """SELECT doc_id, source, n_chars,
        |       percent_rank() OVER (PARTITION BY source
        |         ORDER BY n_chars) AS pct
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Length-outlier replay: quantile_cont is DuckDB's interpolated
    // percentile (the q_percentiles-proven twin of Spark's
    // `percentile`); long-vs-double compares are exact.
    "x_length_outliers" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |             CAST(len($toksSql) AS BIGINT) AS n_tokens
         |           FROM documents),
         |c AS (SELECT lang, quantile_cont(n_tokens, 0.05) AS lo,
         |        quantile_cont(n_tokens, 0.95) AS hi
         |      FROM t GROUP BY 1)
         |SELECT doc_id, lang, n_tokens, lo, hi,
         |       CASE WHEN n_tokens < lo THEN 'short' ELSE 'long' END AS flag
         |FROM t JOIN c USING (lang)
         |WHERE n_tokens < lo OR n_tokens > hi
         |ORDER BY doc_id""".stripMargin,

    "x_ngram_topk" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
         |g AS (SELECT unnest(list_transform(range(1, len(t)),
         |                    i -> t[i] || ' ' || t[i+1])) AS gram
         |      FROM tk WHERE len(t) >= 2)
         |SELECT gram, count(*) AS n FROM g
         |GROUP BY gram ORDER BY n DESC, gram LIMIT 50""".stripMargin,

    // explode_outer replay: n_rows = max(1, |toks|) per doc (the NULL
    // row keeps empty docs), n_toks counts non-null tokens only.
    // (Lives in this later map chunk because it reads toksSql — the
    // early chunk initializes before that val.)
    "q_explode_outer" ->
      s"""SELECT doc_id,
         |  CAST(greatest(1, len($toksSql)) AS BIGINT) AS n_rows,
         |  CAST(len($toksSql) AS BIGINT) AS n_toks
         |FROM documents ORDER BY doc_id""".stripMargin,

    // Higher-order replay: list_transform/list_filter/list_reduce with
    // the same integer fold (0-prepended left fold = Spark aggregate).
    "q_higher_order" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents)
         |SELECT doc_id,
         |  CAST(len(tk) AS BIGINT) AS n_toks,
         |  CAST(list_reduce(list_prepend(0,
         |    list_transform(tk, x -> len(x))), (a, b) -> a + b) AS BIGINT)
         |    AS sum_len,
         |  CAST(len(list_filter(tk, x -> len(x) > 4)) AS BIGINT) AS n_long,
         |  CAST(list_reduce(list_prepend(0,
         |    list_filter(list_transform(tk, x -> len(x)), x -> x % 2 = 0)),
         |    (a, b) -> a + b) AS BIGINT) AS sum_even_len
         |FROM t ORDER BY doc_id""".stripMargin,

    "x_df_spectrum" ->
      s"""WITH tk AS (SELECT DISTINCT doc_id, unnest($toksSql) AS term
         |           FROM documents),
         |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |       FROM tk GROUP BY 1)
         |SELECT df, CAST(count(*) AS BIGINT) AS n_terms
         |FROM df GROUP BY 1 ORDER BY df""".stripMargin,

    "x_vocab_stats" ->
      s"""WITH tk AS (SELECT unnest($toksSql) AS tok FROM documents),
         |c AS (SELECT tok, count(*) AS n FROM tk GROUP BY tok)
         |SELECT CAST(sum(n) AS BIGINT) AS n_tokens, count(*) AS n_vocab,
         |       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
         |FROM c""".stripMargin,

    "x_repetition" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
         |b AS (SELECT doc_id, list_transform(range(1, len(t)),
         |                     i -> t[i] || ' ' || t[i+1]) AS bg FROM tk)
         |SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
         |       CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct,
         |       CASE WHEN len(bg) = 0 THEN 0.0
         |            ELSE CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE)
         |                 / CAST(len(bg) AS DOUBLE) END AS rep_ratio
         |FROM b ORDER BY doc_id""".stripMargin,

    // Gopher rules: every facet is a ratio of exact integer counts with
    // one double division, so comparisons replay bit-identically; the
    // top-bigram tie-break (count DESC, gram ASC) mirrors the engine's
    // min(struct(-c, gram)).
    "x_gopher_rules" -> gopherRulesSql,

    // Kappa replay: same gopher CTE, same quality-bucket CASE, same
    // count-then-one-expression-tree kappa (CASE-guarded).
    "x_scorer_agreement" ->
      s"""WITH g AS ($gopherRulesSql),
         |q AS (SELECT doc_id, ($qualityBucketSql) = 'good' AS a FROM documents),
         |j AS (SELECT q.a, g.passes AS b FROM q JOIN g USING (doc_id)),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         |             CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
         |             CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b,
         |             CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
         |      FROM j),
         |k AS (SELECT n, n_both, n_only_a, n_only_b, n_neither,
         |             CAST(n_both + n_neither AS DOUBLE) / CAST(n AS DOUBLE) AS po,
         |             CAST(n_both + n_only_a AS DOUBLE) / CAST(n AS DOUBLE) AS pa,
         |             CAST(n_both + n_only_b AS DOUBLE) / CAST(n AS DOUBLE) AS pb
         |      FROM c)
         |SELECT n, n_both, n_only_a, n_only_b, n_neither,
         |       round(CASE WHEN 1.0 - (pa * pb + (1.0 - pa) * (1.0 - pb)) = 0.0
         |                  THEN 1.0
         |                  ELSE (po - (pa * pb + (1.0 - pa) * (1.0 - pb)))
         |                       / (1.0 - (pa * pb + (1.0 - pa) * (1.0 - pb))) END,
         |             6) AS kappa_r
         |FROM k""".stripMargin,

    // Quality report: the per-doc verdicts joined to their stratum and
    // rolled up — counts only, so every column is exact by construction
    // (the one double is a single division per row).
    "x_quality_report" ->
      s"""WITH g AS ($gopherRulesSql),
         |j AS (SELECT g.*, d.source FROM g JOIN documents d USING (doc_id))
         |SELECT source,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |       CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*) AS pass_rate,
         |       CAST(sum(CASE WHEN n_words < 50 OR n_words > 100000
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
         |       CAST(sum(CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_len,
         |       CAST(sum(CASE WHEN symbol_ratio > 0.1
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol,
         |       CAST(sum(CASE WHEN alpha_frac < 0.8
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
         |       CAST(sum(CASE WHEN n_stop_kinds < 2
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
         |       CAST(sum(CASE WHEN top_bigram_frac > 0.20
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS fail_top2,
         |       CAST(sum(CASE WHEN dup_5gram_frac > 0.15
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS fail_dup5
         |FROM j GROUP BY source ORDER BY source""".stripMargin,


    // Detector regexes injected from the SAME registry the Spark query
    // uses (PiiScan.detectors) — oracle and engine cannot drift apart.
    "x_pii_scan" -> {
      val counts = PiiScan.detectors.map { case (n, p) =>
        s"CAST(len(regexp_extract_all(txt, '${p.replace("'", "''")}')) AS BIGINT) AS pii_$n"
      }.mkString(",\n  ")
      val total = PiiScan.detectors.map { case (n, _) => s"pii_$n" }.mkString(" + ")
      s"""WITH corpus AS ($piiCorpusSql),
         |scanned AS (SELECT c_custkey,
         |  $counts
         |FROM corpus)
         |SELECT *, $total AS pii_total,
         |       CAST(($total) > 0 AS INT) AS has_pii
         |FROM scanned ORDER BY c_custkey""".stripMargin
    },

    // Redaction replay: the identical fixed regexp_replace chain (the
    // 'g' flag matches Spark's replace-all), innermost = first
    // registry detector.
    "x_pii_redact" -> {
      val redSql = PiiScan.detectors.foldLeft("txt") { case (acc, (n, p)) =>
        s"regexp_replace($acc, '${p.replace("'", "''")}', '[REDACTED:$n]', 'g')"
      }
      s"""WITH corpus AS ($piiCorpusSql)
         |SELECT c_custkey, $redSql AS redacted
         |FROM corpus ORDER BY c_custkey""".stripMargin
    },

    "x_neardup_embedding" -> neardupEmbeddingSql,

    "x_sim_lsh" -> simLshSql,

    "x_cosine_pairs" ->
      s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt($selfDotSql) AS nrm FROM e),
         |p AS (SELECT l.vec_id AS a, r.vec_id AS b,
         |        $pairDotSql / (l.nrm * r.nrm) AS cosine
         |      FROM n l JOIN n r ON l.vec_id < r.vec_id)
         |SELECT a, b, round(cosine, 6) AS cosine_r FROM p
         |WHERE cosine >= 0.35 ORDER BY a, b""".stripMargin,

    // Cross-lingual replay: the x_cosine_pairs fold shape at 0.3,
    // documents joined per side, different-language filter.
    "x_crosslingual_pairs" ->
      s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt($selfDotSql) AS nrm FROM e),
         |p AS (SELECT l.vec_id AS a, r.vec_id AS b,
         |        $pairDotSql / (l.nrm * r.nrm) AS cosine
         |      FROM n l JOIN n r ON l.vec_id < r.vec_id)
         |SELECT a, b, da.lang AS lang_a, db.lang AS lang_b,
         |       round(cosine, 6) AS cosine_r
         |FROM p
         |JOIN documents da ON da.doc_id = a
         |JOIN documents db ON db.doc_id = b
         |WHERE cosine >= 0.3 AND da.lang <> db.lang
         |ORDER BY a, b""".stripMargin,

    // Centroid replay: per-(label, dim) nano-grid means (the
    // trainIvfCentroids mean construction — order-independent long
    // sums), centroids assembled in dim order, then the same
    // fold-ordered dot/norm fragments as x_cosine_pairs.
    "x_centroid_cosine" ->
      s"""WITH x AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
         |                  unnest(embedding) AS xv FROM embeddings),
         |m AS (SELECT label, pos,
         |        CAST(sum(CAST(round(CAST(xv AS DOUBLE) * 1000000000.0) AS BIGINT)) AS DOUBLE)
         |          / (CAST(count(*) AS DOUBLE) * 1000000000.0) AS mv
         |      FROM x GROUP BY 1, 2),
         |c AS (SELECT label, list(mv ORDER BY pos) AS v FROM m GROUP BY 1),
         |n AS (SELECT label, v, sqrt($selfDotSql) AS nrm FROM c),
         |p AS (SELECT l.label AS a, r.label AS b,
         |        $pairDotSql / (l.nrm * r.nrm) AS cosine
         |      FROM n l JOIN n r ON l.label < r.label)
         |SELECT a, b, round(cosine, 6) AS cosine_r FROM p ORDER BY a, b""".stripMargin,

    "x_embed_stats" ->
      s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
         |n AS (SELECT sqrt($selfDotSql) AS nrm FROM e)
         |SELECT count(*) AS n_vecs,
         |       round(min(nrm), 6) AS min_norm,
         |       round(max(nrm), 6) AS max_norm,
         |       CAST(sum(CAST(round(nrm * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_norm_u6
         |FROM n""".stripMargin,

    "x_sim_bruteforce" -> simBruteforceSql,

    // Hard-negative replay: simBruteforceSql's fold arithmetic with
    // the label-mismatch join predicate.
    "x_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label,
         |             [CAST(x AS DOUBLE) for x in embedding] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, label, v,
         |             sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |               [v[i] * v[i] for i in generate_series(1, 64)]),
         |               (a, b) -> a + b)) AS nrm
         |      FROM e),
         |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv, nrm AS qn
         |      FROM n WHERE vec_id < 5),
         |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |                  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |                    [c.v[i] * q.qv[i] for i in generate_series(1, 64)]),
         |                    (a, b) -> a + b) / (c.nrm * q.qn) AS score
         |           FROM n c JOIN q ON c.label <> q.qlabel),
         |ranked AS (SELECT query_id, neighbor_id,
         |                  row_number() OVER (PARTITION BY query_id
         |                    ORDER BY score DESC, neighbor_id) AS rank,
         |                  round(score, 6) AS score_r
         |           FROM scored)
         |SELECT query_id, neighbor_id, rank, score_r
         |FROM ranked WHERE rank <= $AnnK ORDER BY query_id, rank""".stripMargin,

    // ANN quality measurement as a first-class query: recall@5 of the
    // LSH path against the exact baseline, per query vector. Both
    // sides' oracle SQL is reused verbatim as CTEs, so the measured
    // recall is itself exactly cross-engine-checked.
    "x_ann_recall" ->
      s"""WITH bf AS ($simBruteforceSql),
         |lsh AS ($simLshSql),
         |hits AS (SELECT bf.query_id, count(*) AS n_hit
         |         FROM bf JOIN lsh USING (query_id, neighbor_id)
         |         GROUP BY bf.query_id)
         |SELECT query_id, CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
         |       CAST(coalesce(n_hit, 0) * ${100 / AnnK} AS BIGINT) AS recall_pct
         |FROM (SELECT DISTINCT query_id FROM bf) q
         |LEFT JOIN hits USING (query_id)
         |ORDER BY query_id""".stripMargin
  )

  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    engineQueries ++ relationalQueries ++ extQueries

  def oracleSql: Map[String, String] =
    engineOracles ++ relationalOracles ++ extOracles
}
