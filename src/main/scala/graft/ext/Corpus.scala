package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Rng

/**
 * Corpus-management operators a large-scale training-data pipeline needs
 * around the dedup/similarity/text suite: deterministic dataset splits
 * and benchmark decontamination. Both are pure column pipelines — no
 * UDFs, no driver-side state — and both are md5-replayable in the
 * DuckDB oracle (same rationale as [[graft.functions.Rng]]).
 *
 * Not in the reference (which generates corpora, src/main.py:977-1020);
 * part of the training-pipeline extension surface.
 */
object Corpus {

  /**
   * Deterministic train/val/test assignment: each row's split label is a
   * pure function of `(seed, idCol)` via the md5 counter RNG — stable
   * under repartitioning, retries, re-runs, and incremental corpus
   * growth (adding documents never reassigns existing ones; a fractional
   * `sample()`/`randomSplit()` reshuffles everything on every change).
   * One narrow projection, no shuffle, fully codegen'd.
   *
   * `fractions` are (label, weight) in order; weights are normalized and
   * the final label absorbs the rounding tail, so every row gets exactly
   * one label.
   */
  /** Cumulative normalized thresholds of a fraction list — one shared
    * double-arithmetic path, so the oracle SQL embeds bit-identical cut
    * literals (0.8+0.1 is 0.9000000000000001 in IEEE; writing 0.9 in
    * the oracle would misclassify a u landing in the gap). */
  def splitCuts(fractions: Seq[(String, Double)]): Seq[Double] = {
    val total = fractions.map(_._2).sum
    fractions.map(_._2 / total).scanLeft(0.0)(_ + _).tail
  }

  def splitAssign(df: DataFrame, fractions: Seq[(String, Double)],
      seed: Long, idCol: String = "doc_id",
      stream: String = "corpus_split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be non-empty positive weights")
    val u = Rng.uniform(seed, stream, col(idCol))
    val cuts = splitCuts(fractions)
    // last label via otherwise(): u < 1.0 always, and the final cut may
    // land a hair under 1.0 in floating point
    val label = fractions.init.zip(cuts.init).reverse
      .foldLeft(lit(fractions.last._1): Column) { case (acc, ((name, _), cut)) =>
        when(u < cut, name).otherwise(acc)
      }
    df.withColumn("split", label)
  }

  /**
   * Deterministic stratified sampling: keep a row iff its md5 uniform
   * (keyed on `idCol`, independent of the [[splitAssign]] stream) falls
   * under its stratum's rate — per-language/per-source quota sampling
   * for corpus balancing. Same determinism story as [[splitAssign]]:
   * stable under repartitioning, retries, and corpus growth, where
   * `DataFrame.sampleBy` is seed-and-partition dependent. Strata absent
   * from `rates` keep `defaultRate`. One narrow codegen'd filter — at
   * 100 TB this is a scan with a pushed-down-able projection, no
   * shuffle, no driver state.
   */
  def stratifiedSample(df: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double, seed: Long,
      idCol: String = "doc_id",
      stream: String = "corpus_sample"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val u = Rng.uniform(seed, stream, col(idCol))
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultRate): Column) { case (acc, (k, v)) =>
        when(col(strataCol) === k, v).otherwise(acc)
      }
    df.where(u < rate)
  }

  /**
   * Deterministic k-sample per group: the k rows with the SMALLEST md5
   * uniforms in each stratum — "pull k curated examples per
   * language/source" for spot-checks, eval slices, or few-shot pools.
   * Unlike a rate-based sample ([[stratifiedSample]]) the output size
   * is exactly `min(k, |group|)` per group; unlike `ORDER BY rand()
   * LIMIT k` per group it is deterministic under repartitioning,
   * retries and re-runs (the uniform is a pure function of
   * `(seed, idCol)`). Not growth-stable by construction: a fixed-size
   * sample must displace an old member when a smaller-u document
   * arrives — use a rate-based sampler when growth-stability matters.
   *
   * Shape at scale: rides [[graft.operators.TopK.TopKAggregator]] —
   * bounded k-entry buffers with map-side partial aggregation, so each
   * partition forwards at most k rows per group into the shuffle where
   * a window-rank formulation would shuffle and sort every row.
   * Returns `(groupCol, rank, idCol)` with rank 1 = smallest uniform.
   */
  def sampleKPerGroup(df: DataFrame, groupCol: String, k: Int, seed: Long,
      idCol: String = "doc_id",
      stream: String = "corpus_ksample"): DataFrame = {
    require(k > 0, "k must be positive")
    // TopK keeps the LARGEST scores; negate the uniform so rank 1 is
    // the smallest u (ties — impossible in practice — break by id asc,
    // matching the oracle's ORDER BY u, id)
    val scored = df.select(col(groupCol), col(idCol))
      .withColumn("__negu", -Rng.uniform(seed, stream, col(idCol)))
    graft.operators.TopK.perGroup(scored, groupCol, "__negu", idCol, k)
      .select(col(groupCol), col("rank"), col(idCol))
  }

  /**
   * Benchmark decontamination: flag corpus documents sharing any word
   * `n`-gram with a held-out benchmark set — the standard guard against
   * evaluation leakage in training corpora. Returns
   * `(idCol, n_overlap_grams)` for contaminated documents only.
   *
   * Shape at scale: distinct grams per side, joined on the 8-byte
   * [[Dedup.md5Key]] hash of the gram — a short-key equi-join, never a
   * string-payload shuffle. The benchmark side is distinct-reduced
   * first; for a typical benchmark (≪ corpus) AQE turns the join into a
   * broadcast. Never all-pairs, never driver-side.
   */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // gramRows (shifted-slice zip) keeps gram construction in
    // whole-stage codegen — an interpreted transform() lambda here
    // measured ~4x slower end to end. Per-doc distinct AFTER the
    // explode dedups on the gram string (matching the oracle's
    // list_distinct), then only the 8-byte key crosses the join.
    val dg = Dedup.gramRows(docs.select(col(idCol), col(textCol)),
        idCol, textCol, n)
      .dropDuplicates(idCol, "__g")
      .select(col(idCol), Dedup.md5Key(col("__g")).as("__k"))
    val bg = Dedup.gramRows(benchmark.select(lit(0L).as("__bid"), col(textCol)),
        "__bid", textCol, n)
      .select(Dedup.md5Key(col("__g")).as("__k")).distinct()
    dg.join(bg, "__k")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_overlap_grams"))
  }

  /**
   * Per-benchmark-document contamination fraction — [[decontaminate]]
   * viewed from the benchmark's side: for each benchmark item, the
   * share of its distinct word n-grams that appear ANYWHERE in the
   * training corpus (the GPT-3-appendix "dirtiness" measure; 1.0 means
   * the item is fully reconstructible from training n-grams, ~0 means
   * it is clean). Emits every benchmark document, zero-hit ones
   * included — the report is per-item, not flagged-only.
   *
   * Same scale shape as [[decontaminate]] with the sides swapped: the
   * CORPUS gram set is distinct-reduced to 8-byte keys (corpus-sized,
   * so the join shuffles on the key — never broadcast), the benchmark
   * side keeps its doc ids, and the fraction is per-doc long
   * arithmetic after a left join.
   */
  def benchOverlap(benchmark: DataFrame, corpus: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bg = Dedup.gramRows(benchmark.select(col(idCol), col(textCol)),
        idCol, textCol, n)
      .dropDuplicates(idCol, "__g")
      .select(col(idCol), Dedup.md5Key(col("__g")).as("__k"))
    val cg = Dedup.gramRows(corpus.select(lit(0L).as("__cid"), col(textCol)),
        "__cid", textCol, n)
      .select(Dedup.md5Key(col("__g")).as("__k")).distinct()
      .withColumn("__hit", lit(1L))
    bg.join(cg, Seq("__k"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("overlap_frac",
        col("n_hit").cast("double") / col("n_grams").cast("double"))
  }

  /**
   * Verbatim-window decontamination — the production-strength variant
   * of [[decontaminate]]: flag corpus documents sharing an exact run
   * of `windowTokens` tokens with the benchmark, instead of ANY word
   * n-gram. Short-gram overlap over-flags badly (at sf0.01 the 3-gram
   * check flags 257 documents, the 8-token-window check flags the 1
   * true verbatim leak); a `windowTokens`-wide match is the signal
   * eval-leak audits act on (same Lee-et-al rationale as
   * [[Dedup.exactSubstringPairs]], which shares the kernel).
   *
   * Shape at scale: identical to [[decontaminate]] — distinct hashed
   * windows per side from the one-pass native kernel, 8-byte-key
   * equi-join, benchmark side distinct-reduced (AQE broadcasts it).
   * Returns `(idCol, n_overlap_windows)` for contaminated docs only.
   */
  def decontaminateSubstring(docs: DataFrame, benchmark: DataFrame,
      windowTokens: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    def windows(df: DataFrame, cols: Seq[Column]): DataFrame = df
      .where(size(TextStats.tokens(col(textCol))) >= windowTokens)
      .select(cols :+ explode(graft.plans.NativeFunctions.hashedShingles(
        col(textCol), windowTokens)).as("__w"): _*)
    val dw = windows(docs, Seq(col(idCol)))
    val bw = windows(benchmark, Nil).select("__w").distinct()
    dw.join(bw, "__w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_overlap_windows"))
  }

  /**
   * Data-contract validation — the dbt-test-style quality gate run
   * before a corpus ships: every declared invariant checked in ONE
   * scan pass, emitting a single row of per-rule violation counts
   * (a green gate is all-zero except `n_rows`). Rules: non-null ids,
   * unique ids, language whitelist, `n_chars` consistent with the
   * text, non-negative lengths.
   */
  def schemaCheck(df: DataFrame, allowedLangs: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang", nCharsCol: String = "n_chars"): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(idCol).isNull, 1L).otherwise(0L)).as("null_id"),
      (count(lit(1)) - countDistinct(col(idCol))).as("dup_id"),
      sum(when(!col(langCol).isin(allowedLangs: _*), 1L).otherwise(0L))
        .as("bad_lang"),
      sum(when(col(nCharsCol) =!= length(col(textCol)), 1L).otherwise(0L))
        .as("bad_n_chars"),
      sum(when(col(nCharsCol) < 0L, 1L).otherwise(0L)).as("neg_chars"))

  /**
   * Broadcast-Bloom decontamination — [[decontaminateSubstring]] with
   * a Bloom-filter prefilter in front of the verify join, the shape
   * that survives a benchmark-suite side too large to ship to every
   * task as a join table: a `bits`-bit Bloom of the benchmark's
   * hashed windows (k hash probes per window) rides along as a
   * plan-time array literal (KBs, like the JL projection's Gaussian
   * literals), the corpus side drops every window that misses the
   * filter INSIDE the scan projection, and only surviving candidates
   * — true hits plus the Bloom's false-positive trickle — pay the
   * exact 8-byte-key equi-join. The verify join makes the output
   * EXACTLY [[decontaminateSubstring]]'s (the Bloom admits a superset
   * of true hits and the join removes false positives), so the oracle
   * is shared verbatim; only the shuffled row count changes.
   *
   * Defaults (2^16 bits, 3 probes) hold the false-positive rate under
   * ~1% up to ≈6k distinct benchmark windows; size `bits` ∝ benchmark
   * windows at scale (the array literal grows as bits/8 bytes).
   *
   * Size regime: the literal stays plan-friendly (≤ a few MB) up to
   * ~10^7 benchmark windows (2^27 bits). Beyond that, prefilter value
   * fades against literal-shipping cost — fall back to
   * [[decontaminateSubstring]]'s distinct-key equi-join (AQE
   * broadcasts the benchmark side while it fits, shuffles when it
   * doesn't), or shard the benchmark and OR several window-disjoint
   * filters. The Bloom's niche is the middle regime: a suite too big
   * to broadcast-join cheaply but whose bitmap still rides the plan.
   */
  def decontaminateBloom(docs: DataFrame, benchmark: DataFrame,
      windowTokens: Int = 8, bits: Int = 1 << 16, numProbes: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(bits > 0 && (bits & 63) == 0, "bits must be a positive multiple of 64")
    require(numProbes > 0, "numProbes must be positive")
    def windows(df: DataFrame, cols: Seq[Column]): DataFrame = df
      .where(size(TextStats.tokens(col(textCol))) >= windowTokens)
      .select(cols :+ explode(graft.plans.NativeFunctions.hashedShingles(
        col(textCol), windowTokens)).as("__w"): _*)
    def probes(w: Column): Seq[Column] =
      (0 until numProbes).map(i => pmod(xxhash64(w, lit(i)), lit(bits.toLong)))
    val bw = windows(benchmark, Nil).select("__w").distinct()
    // Build the filter: distinct bit positions of all benchmark-window
    // probes — a bounded plan-time collect (≤ bits ints, the DSIR-table
    // convention), packed into bits/64 longs and injected as a literal.
    val setBits = bw
      .select(explode(array(probes(col("__w")): _*)).as("__p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](bits / 64)
    setBits.foreach(p => words(p.toInt >> 6) |= 1L << (p.toInt & 63))
    val bloom = typedLit(words.toSeq)
    val hit = probes(col("__w")).map { p =>
      // & 1, not % 2: arithmetic shiftright keeps the sign, and a
      // negative odd remainder is -1
      call_function("shiftright",
        element_at(bloom, (p / 64).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
    val candidates = windows(docs, Seq(col(idCol))).where(hit)
    candidates.join(bw, "__w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_overlap_windows"))
  }

  /**
   * Quality-weighted sampling: keep each row with its own acceptance
   * probability `weight` (any Column in [0,1] — typically a quality
   * score mapped to a keep rate). The continuous generalization of
   * [[stratifiedSample]]: the keep-decision is the same growth-stable
   * md5 uniform, so re-runs, retries, and corpus growth never
   * reshuffle which rows survive. One codegen'd filter over the scan.
   */
  def weightedSample(df: DataFrame, weight: Column, seed: Long,
      idCol: String = "doc_id",
      stream: String = "corpus_wsample"): DataFrame =
    df.where(Rng.uniform(seed, stream, col(idCol)) < weight)

  /**
   * Weighted reservoir sampling WITHOUT replacement, exact size `k` —
   * the budgeted companion to [[weightedSample]] (whose Bernoulli
   * keep-rule only hits a target size in expectation): when the task
   * is "give me exactly k documents, preferring high quality", draw
   * the k rows with the largest `ln(u)/w` where `u` is the row's
   * growth-stable md5 uniform and `w > 0` its weight — the
   * Efraimidis–Spirakis A-ES key (`u^(1/w)` in log form: same order,
   * no tiny-power underflow), under which row `i` wins a slot with
   * probability proportional to `w_i` among remaining rows.
   *
   * The key is quantized to the 1e-9 grid (`key9 = round(1e9·ln(u)/w)`,
   * ties broken by `idCol`) — the engine's standard cross-engine
   * determinism posture for transcendental arithmetic, so the selected
   * SET replays exactly in DuckDB. `key9` is PART OF THE OUTPUT — the
   * sampling key is what makes a draw auditable/replayable (the
   * x_weighted_reservoir oracle and the streaming reservoir pin both
   * read it) — so an input that already carries a `key9` column is
   * rejected rather than silently clobbered.
   *
   * Scale shape: one codegen'd projection computes the key, and the
   * global top-k plans as TakeOrdered (bounded per-partition heaps +
   * driver merge of k·partitions rows) — never a full sort, never a
   * single-reducer shuffle. k is a driver-side budget (thousands, not
   * corpus-sized).
   */
  def weightedReservoir(df: DataFrame, weight: Column, k: Int, seed: Long,
      idCol: String = "doc_id",
      stream: String = "corpus_wres"): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains("key9"),
      "input already has a 'key9' column — weightedReservoir emits the " +
        "sampling key under that name (rename the input column)")
    // u ∈ (0,1] so ln is finite; w ≤ 0 would silently rank last, so
    // surface it as the caller bug it is
    val key9 = round(log(Rng.uniformPos(seed, stream, col(idCol))) / weight
      * lit(1e9)).cast("long")
    df.withColumn("key9", key9)
      .orderBy(col("key9").desc, col(idCol))
      .limit(k)
  }

  /**
   * Domain-mixture rebalancing: resample strata so the surviving
   * corpus follows `weights` (target mixture proportions, normalized)
   * — the "rebalance sources to the training mix" step of a
   * pretraining pipeline. Strata absent from `weights` are dropped.
   * Selection is the same growth-stable md5 keep-decision as
   * [[stratifiedSample]].
   *
   * Two modes:
   *   - `upsample = false` (default): downsample-only. The binding
   *     stratum (smallest `count/weight`) is kept whole; every other
   *     stratum is thinned to match. Output rows are a subset of the
   *     input; no `copy_idx` column.
   *   - `upsample = true`: the target size of stratum `k` is
   *     `N_total * w_k` (N_total = rows across weighted strata), so
   *     the output is input-sized but ON the requested mix. A stratum
   *     whose target exceeds its count gets epoch repeats: each row is
   *     emitted `floor(rate)` times plus one more iff its md5 uniform
   *     clears the fractional remainder — which for `rate < 1`
   *     degenerates to exactly the downsample keep-rule, so one
   *     formula covers both directions. Adds a `copy_idx` column
   *     (1-based repeat number) so downstream shuffles see distinct
   *     rows.
   *
   * Shape at scale: one small per-stratum count aggregate, a one-row
   * reduction over it, a broadcast join of the ≤|strata| rate frame
   * back onto the scan, and a codegen'd filter (plus, when upsampling,
   * a narrow `explode(sequence(...))` whose fan-out is bounded by
   * `max(rate)+1` per row). No wide shuffle of the corpus.
   */
  def mixTo(df: DataFrame, strataCol: String, weights: Map[String, Double],
      seed: Long, idCol: String = "doc_id",
      stream: String = "corpus_mix", upsample: Boolean = false): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val total = weights.values.sum
    val wNorm = weights.map { case (k, v) => k -> v / total }
    val wExpr = wNorm.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("double")) { case (acc, (k, v)) =>
        when(col(strataCol) === k, lit(v)).otherwise(acc)
      }
    val counts = df.groupBy(strataCol)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", wExpr)
      .where(col("__w").isNotNull)
    val scale =
      if (upsample) counts.agg(sum("__n").cast("double").as("__scale"))
      else counts.agg(min(col("__n") / col("__w")).as("__scale"))
    val rawRate = col("__scale") * col("__w") / col("__n")
    val rates = counts.crossJoin(broadcast(scale))
      .select(col(strataCol),
        (if (upsample) rawRate else least(lit(1.0), rawRate)).as("__rate"))
    val joined = df.join(broadcast(rates), strataCol)
    val u = Rng.uniform(seed, stream, col(idCol))
    if (!upsample) joined.where(u < col("__rate")).drop("__rate")
    else {
      // floor(rate) whole repeats + one more iff u clears the remainder;
      // explode of a null/empty sequence drops the row (reps == 0)
      val reps = floor(col("__rate")).cast("long") +
        when(u < col("__rate") - floor(col("__rate")), 1L).otherwise(0L)
      joined
        .withColumn("copy_idx",
          explode(when(reps >= 1L, sequence(lit(1L), reps))))
        .drop("__rate")
    }
  }

  /**
   * Overlapping token-window chunking — the retrieval/embedding prep
   * step (RAG indexing, context-window shaping) that sits beside
   * packing in a training-data pipeline: one row per chunk of
   * `chunkTokens` whitespace tokens, a new chunk starting every
   * `strideTokens` (stride < chunk ⇒ overlapping windows), the last
   * chunk(s) truncated at the document end. Every token of a document
   * appears in at least one chunk; tokenless documents contribute no
   * rows. Returns `(idCol, chunk_idx, tok_from, tok_to,
   * n_chunk_tokens, chunk_text)` with half-open token offsets and the
   * chunk text rebuilt single-space-joined (the canonical form the
   * whitespace tokenizer reads back identically).
   *
   * Shape at scale: one projection + a narrow `posexplode(sequence)`
   * Generate per document (fan-out bounded by `n/stride + 1`); no
   * shuffle, no UDFs, fully codegen — the same posture as
   * [[packSlices]].
   */
  def chunkDocs(df: DataFrame, chunkTokens: Int, strideTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      "strideTokens must be in [1, chunkTokens]")
    val toks = TextStats.tokens(col(textCol))
    val tokTo = least(col("tok_from") + chunkTokens,
      size(col("__tk")).cast("long"))
    df.select(col(idCol), toks.as("__tk"))
      .where(size(col("__tk")) > 0)
      .select(col(idCol), col("__tk"),
        posexplode(sequence(lit(0L), (size(col("__tk")) - 1).cast("long"),
          lit(strideTokens.toLong))).as(Seq("chunk_idx", "tok_from")))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        col("tok_from"), tokTo.as("tok_to"),
        (tokTo - col("tok_from")).as("n_chunk_tokens"),
        array_join(slice(col("__tk"), (col("tok_from") + 1).cast("int"),
          (tokTo - col("tok_from")).cast("int")), " ").as("chunk_text"))
  }

  /**
   * Sequence packing (concatenate-and-chunk): assign every document its
   * position in a deterministically shuffled global token stream and the
   * fixed-capacity training pack(s) it lands in — the GPT-style "pack
   * documents into `capacity`-token blocks" step of a training-data
   * pipeline. Returns
   * `(idCol, n_tokens, ord, start_tok, pack_id, pack_span)` where `ord`
   * is the 0-based rank in shuffle order, `start_tok` the document's
   * offset in the concatenated token stream, `pack_id = floor(start_tok
   * / capacity)` and `pack_span` the number of packs the document
   * straddles.
   *
   * The shuffle order is the md5 uniform of `(seed, idCol)` (ties broken
   * by id) — the same growth-stable determinism as [[splitAssign]], and
   * exactly replayable in the oracle as
   * `row_number()/sum() OVER (ORDER BY u, doc_id)`.
   *
   * Shape at scale — the point of this implementation: a global rank is
   * NOT a global `Window.orderBy` (that plans a single-partition
   * Exchange: one task sorts the corpus). Because the shuffle key is a
   * uniform double, `bucket = floor(u * buckets)` is monotone in the
   * sort order, so rank and prefix-sum decompose into a two-phase
   * prefix sum: (1) per-bucket counts/token-sums — an aggregate of
   * ≤`buckets` rows whose own exclusive prefix is a window over that
   * tiny frame; (2) a broadcast join of the bucket offsets back onto the
   * data and a per-bucket window (parallel across buckets). Everything
   * stays distributed; the only narrow spot is the ≤`buckets`-row
   * offset frame.
   *
   * `pack_id` is computed as `floor(start_tok / capacity)` in doubles —
   * exact while `start_tok < 2^52` (≈4.5e15 tokens ≈ tens of PB of
   * text), comfortably past the 100 TB design point.
   */
  def packChunks(df: DataFrame, capacity: Long, seed: Long,
      tokenCount: Column, idCol: String = "doc_id",
      buckets: Int = 256, stream: String = "corpus_order"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(buckets > 0, "buckets must be positive")
    val base = df.select(col(idCol), tokenCount.cast("long").as("n_tokens"))
      .withColumn("__u", Rng.uniform(seed, stream, col(idCol)))
      .withColumn("__b", floor(col("__u") * buckets).cast("int"))
    // Phase 1: exclusive per-bucket offsets. The frame is ≤`buckets`
    // rows, so the single-partition window over it is bounded by
    // construction (same rationale as the IVF centroid collect).
    val wOff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy("__b")
      .agg(count(lit(1)).as("__c"), sum("n_tokens").as("__s"))
      .select(col("__b"),
        coalesce(sum("__c").over(wOff), lit(0L)).as("__ord_off"),
        coalesce(sum("__s").over(wOff), lit(0L)).as("__tok_off"))
    // Phase 2: per-bucket rank + running sum, parallel across buckets.
    val wb = Window.partitionBy("__b").orderBy(col("__u"), col(idCol))
    val wbRun = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = base.join(broadcast(offs), "__b")
      .withColumn("ord",
        col("__ord_off") + row_number().over(wb).cast("long") - lit(1L))
      .withColumn("start_tok",
        col("__tok_off") + sum("n_tokens").over(wbRun) - col("n_tokens"))
    packed
      .withColumn("pack_id",
        floor(col("start_tok") / lit(capacity.toDouble)).cast("long"))
      .withColumn("pack_span",
        floor((col("start_tok") + greatest(col("n_tokens"), lit(1L)) - lit(1L))
          / lit(capacity.toDouble)).cast("long") - col("pack_id") + lit(1L))
      .select(idCol, "n_tokens", "ord", "start_tok", "pack_id", "pack_span")
  }

  /**
   * Pack-slice fan-out: one row per (document, pack) with the document's
   * in-pack token range — the frame an actual packing job feeds to the
   * tokenizer writer, where a document straddling pack boundaries
   * contributes a slice to each pack it touches. Built on
   * [[packChunks]]'s output columns: for each pack `p` in
   * `[pack_id, pack_id + pack_span)`, the document's global token span
   * `[start_tok, start_tok + n_tokens)` intersected with the pack's
   * span `[p*capacity, (p+1)*capacity)` and rebased to pack-local
   * offsets. Ranges are half-open (`tok_from` inclusive, `tok_to`
   * exclusive; `n_slice_tokens = tok_to - tok_from`), so an empty
   * document yields one zero-width slice instead of an inverted range.
   *
   * Returns `(idCol, pack_id, slice_idx, tok_from, tok_to,
   * n_slice_tokens)` where `slice_idx` is the 0-based position of the
   * slice among the document's slices.
   *
   * Shape at scale: the fan-out is an `explode(sequence(...))` over
   * [[packChunks]]'s already-distributed frame — a narrow Generate,
   * rows bounded by `n_tokens/capacity + 1` per document, NO new
   * shuffle or window beyond what packChunks already plans (pinned by
   * ScaleSpec).
   */
  def packSlices(df: DataFrame, capacity: Long, seed: Long,
      tokenCount: Column, idCol: String = "doc_id",
      buckets: Int = 256, stream: String = "corpus_order"): DataFrame = {
    val cap = lit(capacity)
    val chunks = packChunks(df, capacity, seed, tokenCount, idCol, buckets, stream)
    val packStart = col("__p") * cap
    chunks
      .withColumn("__p",
        explode(sequence(col("pack_id"), col("pack_id") + col("pack_span") - 1)))
      .withColumn("slice_idx", (col("__p") - col("pack_id")).cast("int"))
      .withColumn("tok_from",
        greatest(col("start_tok"), packStart) - packStart)
      .withColumn("tok_to",
        least(col("start_tok") + col("n_tokens"), packStart + cap) - packStart)
      .select(col(idCol), col("__p").as("pack_id"), col("slice_idx"),
        col("tok_from"), col("tok_to"),
        (col("tok_to") - col("tok_from")).as("n_slice_tokens"))
  }

  /**
   * Deterministic global training-order shuffle into `nShards` shards —
   * the manifest a dataloader consumes: every document gets a
   * `(shard, pos)` coordinate, shards are balanced in expectation, and
   * the within-shard order is a uniform random permutation. The shuffle
   * key is the partition-independent md5 uniform, so the ORDER is a
   * pure function of `(seed, idCol)`: stable under repartitioning,
   * retries, and re-runs, and adding documents never reorders a
   * shard's existing prefix relative to a fractional `orderBy(rand())`
   * (which reshuffles everything on every change).
   *
   * `payload` columns are carried through untouched (for rollups that
   * must share this exact assignment rather than re-derive it).
   *
   * Returns `(idCol, payload*, shard, pos)` with `pos` 0-based within
   * the shard.
   *
   * Shape at scale: one projection (md5 + floor bucketing), then one
   * window PARTITIONED BY shard — per-shard sort only, parallel across
   * shards; `nShards` is chosen so a shard fits an executor (at 100 TB
   * you run thousands of shards). No global sort, no driver state.
   */
  def shuffleShards(df: DataFrame, nShards: Int, seed: Long,
      idCol: String = "doc_id", payload: Seq[String] = Nil,
      stream: String = "corpus_shuffle"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val reserved = Set("shard", "pos", "__u")
    require(!(payload :+ idCol).exists(reserved),
      s"payload/id columns may not use reserved names $reserved")
    val base = df
      .select(col(idCol) +: payload.map(col): _*)
      .withColumn("__u", Rng.uniform(seed, stream, col(idCol)))
      .withColumn("shard", floor(col("__u") * nShards).cast("int"))
    base
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("__u"), col(idCol)))
        .cast("long") - lit(1L))
      .select(col(idCol) +: payload.map(col) :+ col("shard") :+ col("pos"): _*)
  }

  /**
   * Curriculum training order: documents grouped into an
   * easy-to-hard `bucketRank` (any deterministic integer column —
   * typically the quality bucket mapped 0=good…2=poor), deterministic
   * md5-shuffled WITHIN each bucket, and laid out as a single global
   * order `good shards first … poor shards last`. Returns one manifest
   * row per document: `(idCol, bucket_rank, shard, pos, global_pos)`
   * with `global_pos` a dense 0..N-1 permutation — the dataloader
   * reads shards in (bucket_rank, shard) order and each shard
   * sequentially, which IS ascending global_pos.
   *
   * Scale shape: [[shuffleShards]]'s posture with the bucket as an
   * extra partition key — every window is (bucket, shard)-partitioned
   * (never a global sort); the cross-bucket offsets that densify
   * `global_pos` come from a |buckets|·nShards-row aggregate, windowed
   * driver-small and broadcast back (the selectToBudget offsets-frame
   * convention).
   */
  def curriculumOrder(df: DataFrame, bucketRank: Column, nShards: Int,
      seed: Long, idCol: String = "doc_id",
      stream: String = "corpus_curriculum"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val base = df
      .select(col(idCol), bucketRank.cast("int").as("bucket_rank"))
      .withColumn("__u", Rng.uniform(seed, stream, col(idCol)))
      .withColumn("shard", floor(col("__u") * nShards).cast("int"))
    val pos = base.withColumn("pos",
      row_number().over(Window.partitionBy("bucket_rank", "shard")
        .orderBy(col("__u"), col(idCol))).cast("long") - 1L)
    val counts = pos.groupBy("bucket_rank", "shard")
      .agg(count(lit(1)).as("__n"))
    // exclusive prefix over the bounded (bucket, shard) frame — the
    // unpartitioned window runs on ≤ |buckets|·nShards rows
    val offsets = counts.withColumn("__off",
      coalesce(sum("__n").over(Window.orderBy("bucket_rank", "shard")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    pos.join(broadcast(offsets.select("bucket_rank", "shard", "__off")),
        Seq("bucket_rank", "shard"))
      .select(col(idCol), col("bucket_rank"), col("shard"), col("pos"),
        (col("__off") + col("pos")).as("global_pos"))
  }

  /**
   * Snapshot diff — the corpus-versioning primitive: given two
   * snapshots of the same keyed corpus, classify every id as
   * `added` (new only), `removed` (old only), `changed` (both, digest
   * differs), or `unchanged`. Production curation re-runs diff
   * against the previous release to audit churn and to ship
   * incremental updates instead of full rewrites.
   *
   * Scale shape: each side reduces to (id, 32-byte digest) in the
   * scan projection, then ONE full-outer equi-join on the id — no
   * text crosses the shuffle.
   */
  /**
   * Distributed GLOBAL rank under an arbitrary total order — the
   * general form of [[packChunks]]' two-phase prefix trick (which
   * needs a uniform key): `rankCol = row_number() OVER (ORDER BY
   * orderCols)` with NO single-partition window anywhere. Range-
   * partition on the order columns (contiguous key ranges per
   * partition), rank WITHIN each partition in parallel, then add each
   * partition's exclusive row-count offset — an aggregate of
   * ≤`partitions` rows whose own prefix sum is a window over that tiny
   * frame, broadcast back.
   *
   * `orderCols` MUST be a total order (include an id tie-break):
   * range-partition boundaries split ties arbitrarily, so equal keys
   * straddling a boundary would rank nondeterministically otherwise.
   * Equal to the single-window formulation row-for-row (spec-pinned).
   */
  def globalRank(df: DataFrame, orderCols: Seq[Column],
      rankCol: String = "rank", partitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // checkpoint the INPUT first: repartitionByRange's boundary
    // SAMPLE is a separate job over the child plan, so an expensive
    // upstream (x_logreg_calibration's per-token feature build) would
    // otherwise run twice — once for the sample, once for the
    // shuffle. Callers should project narrow before ranking.
    val src = df.localCheckpoint()
    // checkpoint the partitioned frame too: it feeds BOTH the offsets
    // branch and the ranking branch, and the boundary sample is
    // seeded per-RDD — two independent computations can draw
    // different boundaries, silently skewing every offset (caught by
    // the tri-sf oracle before this pin existed)
    val parted = src.repartitionByRange(p, orderCols: _*)
      .withColumn("__gr_p", spark_partition_id())
      .localCheckpoint()
    val offs = parted.groupBy("__gr_p").agg(count(lit(1)).as("__gr_c"))
      .withColumn("__gr_off",
        coalesce(sum("__gr_c").over(Window.orderBy("__gr_p")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__gr_p", "__gr_off")
    parted
      .withColumn("__gr_r", row_number().over(
        Window.partitionBy("__gr_p").orderBy(orderCols: _*)))
      .join(broadcast(offs), "__gr_p")
      .withColumn(rankCol, col("__gr_off") + col("__gr_r"))
      .drop("__gr_p", "__gr_r", "__gr_off")
  }

  /** `ntile(b)` computed from a [[globalRank]] rank and the total row
    * count, bit-equal to SQL ntile: with `q = n div b`, `rem = n % b`,
    * the first `rem` tiles hold `q+1` rows. Avoids the
    * single-partition window `ntile` itself plans. Every division is
    * made EXACT first (numerator reduced to a multiple of the
    * denominator via `%`), so Spark's double `/` returns the integral
    * quotient bit-exactly (operands far below 2^53 at any corpus
    * size); `q = 0` is only reachable when the first branch covers all
    * ranks, so the second branch's `/ q` never evaluates there. */
  def ntileFromRank(rank: Column, n: Column, b: Int): Column = {
    require(b > 0, "b must be positive")
    val q = (n - n % b) / b
    val rem = n % b
    val fat = rem * (q + 1)
    when(rank <= fat,
        ((rank - 1) - (rank - 1) % (q + 1)) / (q + 1) + 1)
      .otherwise({
        val r2 = rank - fat - 1
        rem + (r2 - r2 % q) / q + 1
      })
      .cast("int")
  }

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val o = oldDf.select(col(idCol), sha2(col(textCol), 256).as("old_digest"))
    val n = newDf.select(col(idCol), sha2(col(textCol), 256).as("new_digest"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_digest").isNull, "added")
          .when(col("new_digest").isNull, "removed")
          .when(col("old_digest") === col("new_digest"), "unchanged")
          .otherwise("changed"))
  }

  /**
   * Output-layout planner — the small-files guard: per stratum, how
   * many output files should a writer emit so each lands near
   * `targetBytes`? `n_files = clamp(ceil(bytes/target), 1, n_docs)`
   * (never more files than rows), `docs_per_file = ceil(docs/files)`.
   * All ceil-division in exact integer arithmetic. The planning step
   * before a `repartition(n_files)`-per-partition write; at 100 TB the
   * difference between 10⁴ right-sized files and 10⁷ kilobyte ones.
   */
  def filePlan(df: DataFrame, strataCol: String, bytes: Column,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    // `div`, not `/`: Column./ on longs is DOUBLE division
    def ceilDiv(a: Column, b: Column): Column =
      call_function("div", a + b - 1L, b)
    df.groupBy(strataCol)
      .agg(count(lit(1)).as("n_docs"), sum(bytes).as("total_bytes"))
      .withColumn("n_files",
        least(col("n_docs"),
          greatest(lit(1L),
            ceilDiv(col("total_bytes"), lit(targetBytes)).cast("long"))))
      .withColumn("docs_per_file",
        ceilDiv(col("n_docs"), col("n_files")).cast("long"))
  }

  /**
   * Budget-constrained greedy selection: keep documents in descending
   * priority order until a token budget is exhausted — "build the best
   * `budget`-token dataset from this pool", the terminal step of a
   * curation pipeline. A document is kept iff the total token mass of
   * all strictly-higher-priority documents plus its own fits the
   * budget (inclusive rule: the output NEVER overshoots; ties break by
   * `idCol`). `priority` must be an integer-grid column (e.g. the DSIR
   * `s9` score) so the order is exact in both engines.
   *
   * The global ordered prefix sum is computed WITHOUT a global sort,
   * via the [[packChunks]] two-phase shape over priority BANDS
   * (`floor(p/bandWidth)` clamped to ±`maxBands` — monotone in `p`):
   * phase 1 aggregates per-band token mass and occupancy and takes
   * exclusive higher-band offsets driver-side over the
   * ≤`2·maxBands+1`-row band frame (bounded BY CONSTRUCTION — the
   * DSIR-ratio-table posture, never corpus-sized); phase 2 ranks
   * within each band in parallel. Keep decision =
   * `band_offset + within_band_inclusive_sum ≤ budget` — one formula,
   * exact global greedy.
   *
   * Band-skew guard: phase 1's occupancy doubles as a skew detector.
   * When any band holds more than `splitBandRows` rows (the
   * DSIR-scored corpus whose scores pile up near the mode), phase 2
   * automatically decomposes once more — exact sub-band offsets over
   * (priority value, `id div idBandWidth`) groups, contiguous in the
   * in-band order by construction — so the rank stays
   * partition-parallel even when one band swallows the corpus (see
   * the in-body comment for the decomposition argument, and
   * [[bandOccupancy]] for the pre-flight report).
   *
   * Returns `(idCol, band, n_tokens)` for selected documents.
   */
  def selectToBudget(df: DataFrame, priority: Column, tokenCount: Column,
      budget: Long, bandWidth: Long, maxBands: Int = 1000,
      idCol: String = "doc_id", splitBandRows: Long = 4194304L,
      idBandWidth: Long = 65536L): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(bandWidth > 0, "bandWidth must be positive")
    require(maxBands > 0, "maxBands must be positive")
    require(splitBandRows > 0, "splitBandRows must be positive")
    require(idBandWidth > 0, "idBandWidth must be positive")
    val spark = df.sparkSession
    val base = df.select(col(idCol), priority.cast("long").as("__p9"),
      tokenCount.cast("long").as("__n"))
    val banded = base.withColumn("__band",
      least(greatest(floor(col("__p9") / lit(bandWidth.toDouble)),
        lit(-maxBands.toLong)), lit(maxBands.toLong)).cast("long"))
    // Phase 1: per-band totals AND occupancy, collected — the band
    // frame is ≤2·maxBands+1 rows BY CONSTRUCTION (the bounded-space
    // posture of the DSIR ratio table), so the driver round-trip is
    // constant-size; exclusive higher-band offsets are a running sum
    // over it, and the occupancy numbers double as the skew guard.
    val bandTotals = banded.groupBy("__band")
      .agg(sum("__n").as("__bn"), count(lit(1)).as("__bc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)
    var acc = 0L
    val offRows = bandTotals.map { case (b, bn, bc) =>
      val excl = acc; acc += bn; (b, excl, bc)
    }
    import spark.implicits._
    val offs = broadcast(
      offRows.map { case (b, e, _) => (b, e) }.toSeq.toDF("__band", "__excl"))
    if (!offRows.exists(_._3 > splitBandRows)) {
      // Healthy occupancy: rank within each band in parallel.
      val wIn = Window.partitionBy("__band")
        .orderBy(col("__p9").desc, col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      banded.join(offs, "__band")
        .withColumn("__incl", sum("__n").over(wIn))
        .where(col("__excl") + col("__incl") <= budget)
        .select(col(idCol), col("__band").as("band"), col("__n").as("n_tokens"))
    } else {
      // Band-skew guard: some band holds > splitBandRows rows — the
      // DSIR-scored worst case (most documents score near the mode,
      // one band swallows the corpus) would otherwise single-partition
      // the in-band sort. Decompose once more, EXACTLY: within a band
      // the order is (__p9 desc, id asc), and grouping by the exact
      // priority value plus an id GRID (`id div idBandWidth` — ids
      // ascend within equal __p9, so each (value, id-band) group is
      // contiguous in the in-band order) splits the rank into
      //   band offset + sub-band exclusive offset + in-sub-band
      //   inclusive sum,
      // with the in-sub-band window partitioned by (band, value,
      // id-band) — parallel even when ONE priority value floods one
      // band. The sub-band offsets window is partitioned by band over
      // one row per (value, id-band): bounded by #id-bands for the
      // tie-flood case this guard targets. (A band fat with DISTINCT
      // priority values keeps one sub-band per value — for that shape
      // the right knob remains a finer `bandWidth`.)
      val sub = banded.withColumn("__idb",
        expr(s"CAST(`$idCol` AS BIGINT) DIV $idBandWidth"))
      val wSub = Window.partitionBy("__band")
        .orderBy(col("__p9").desc, col("__idb"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val subOffs = sub.groupBy("__band", "__p9", "__idb")
        .agg(sum("__n").as("__sn"))
        .select(col("__band"), col("__p9"), col("__idb"),
          coalesce(sum("__sn").over(wSub), lit(0L)).as("__sexcl"))
      val wIn = Window.partitionBy("__band", "__p9", "__idb")
        .orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sub.join(offs, "__band")
        .join(subOffs, Seq("__band", "__p9", "__idb"))
        .withColumn("__incl", sum("__n").over(wIn))
        .where(col("__excl") + col("__sexcl") + col("__incl") <= budget)
        .select(col(idCol), col("__band").as("band"), col("__n").as("n_tokens"))
    }
  }

  /** Band-occupancy diagnostic of [[selectToBudget]] — the
    * x_shard_balance-style pre-flight: `(band, n_rows, n_tokens)` per
    * occupied priority band. A band holding most of the corpus means
    * the in-band rank would degrade to one partition without the
    * automatic sub-band split; prefer re-running with a finer
    * `bandWidth` when the fat band spans many distinct priorities. */
  def bandOccupancy(df: DataFrame, priority: Column, tokenCount: Column,
      bandWidth: Long, maxBands: Int = 1000,
      idCol: String = "doc_id"): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    df.select(col(idCol), priority.cast("long").as("__p9"),
        tokenCount.cast("long").as("__n"))
      .withColumn("__band",
        least(greatest(floor(col("__p9") / lit(bandWidth.toDouble)),
          lit(-maxBands.toLong)), lit(maxBands.toLong)).cast("long"))
      .groupBy(col("__band").as("band"))
      .agg(count(lit(1)).as("n_rows"), sum("__n").as("n_tokens"))
  }

  // === DSIR importance resampling =======================================

  /** Feature-space size of the DSIR hashed bag-of-n-grams model (the
    * paper uses 10k; 1k keeps the sf0.01 profiles dense enough to
    * discriminate while staying trivially broadcastable). */
  val DsirBuckets: Int = 1024

  /** Hashed unigram+bigram feature buckets of every token position:
    * one row per feature OCCURRENCE (the model is a bag, not a set),
    * bucketed by the shared 60-bit md5 prefix key mod `buckets` so the
    * oracle replays the hash exactly. Unigrams and bigrams are two
    * codegen explodes unioned — the bigram side reuses the shifted
    * slice/zip from [[TextStats.bigramLogProb]] rather than a
    * higher-order `zip_with` lambda (HOF lambdas evaluate interpreted;
    * the recurring hot-path bug). */
  private def dsirFeatures(df: DataFrame, idCols: Seq[Column],
      textCol: String, buckets: Int): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    val n1 = greatest(size(toks) - 1, lit(0))
    val uni = df.select(idCols :+ explode(toks).as("__g"): _*)
    val big = df
      .select(idCols :+ explode(arrays_zip(
        slice(toks, lit(1), n1).as("w1"),
        slice(toks, lit(2), n1).as("w2"))).as("__z"): _*)
      .select(idCols :+ concat(col("__z.w1"), lit(" "), col("__z.w2")).as("__g"): _*)
    uni.unionByName(big)
      .select(idCols :+ (conv(substring(md5(col("__g")), 1, 15), 16, 10)
        .cast("long") % buckets).as("__b"): _*)
  }

  /**
   * Dense per-bucket DSIR log-ratio table, trained on the driver:
   * `lr9(b) = round((ln((ct_b+1)/(T_t+B)) − ln((cr_b+1)/(T_r+B)))·1e9)`
   * with add-one smoothing, for EVERY bucket `b` (cells absent from
   * both profiles get the all-zero-count default). The two profile
   * aggregations stay distributed; only the ≤`buckets`-row joined
   * profile is collected — the IVF-centroid posture, bounded by the
   * bucket SPACE, never the corpus. The rounding is half-away-from-
   * zero (BigDecimal HALF_UP), matching Spark's `round` and DuckDB's
   * `round` exactly, so kernel scores replay in the oracle.
   */
  def dsirRatioTable(raw: DataFrame, target: DataFrame,
      buckets: Int = DsirBuckets, textCol: String = "text"): Array[Long] = {
    require(buckets > 0, "buckets must be positive")
    val tgtProf = dsirFeatures(target, Nil, textCol, buckets)
      .groupBy("__b").agg(count(lit(1)).as("__ct"))
    val rawProf = dsirFeatures(raw, Nil, textCol, buckets)
      .groupBy("__b").agg(count(lit(1)).as("__cr"))
    val cells = tgtProf.join(rawProf, Seq("__b"), "full_outer")
      .select(col("__b"),
        coalesce(col("__ct"), lit(0L)), coalesce(col("__cr"), lit(0L)))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
    val tt = cells.map(_._2).sum
    val tr = cells.map(_._3).sum
    def lr9(ct: Long, cr: Long): Long = {
      val lr = math.log((ct + 1L).toDouble / (tt + buckets).toDouble) -
        math.log((cr + 1L).toDouble / (tr + buckets).toDouble)
      // BigDecimal.valueOf (Double.toString form) + HALF_UP is exactly
      // Spark's Round(double) path — the form the oracle equivalence
      // is proven against; the exact-binary constructor can disagree
      // at a grid boundary.
      java.math.BigDecimal.valueOf(lr * 1e9)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }
    val table = Array.fill(buckets)(lr9(0L, 0L))
    cells.foreach { case (b, ct, cr) => table(b) = lr9(ct, cr) }
    table
  }

  /**
   * Stateless DSIR scoring under a trained [[dsirRatioTable]]: ONE
   * fused codegen projection per row ([[graft.plans.Native.dsirScore]]
   * — tokenize, hash every unigram/bigram, accumulate the bucket's
   * grid ratio), bit-identical to the explode → broadcast-probe →
   * per-doc-sum formulation it replaces. No explode, no join, no
   * shuffle — which is why the SAME call scores a readStream frame at
   * ingest (train-batch / score-stream, the production quality-filter
   * shape). Token-less documents are dropped, matching the exploded
   * formulation's inner semantics.
   */
  def dsirScoreWith(df: DataFrame, lr9: Seq[Long],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol),
        graft.plans.NativeFunctions.dsirScore(col(textCol), lr9).as("__sc"))
      .select(col(idCol), col("__sc.n_feats").as("n_feats"),
        col("__sc.s9").as("s9"))
      .where(col("n_feats") > 0)

  /** Shared scoring core: `(idCol, n_feats, __s9)` with `__s9` the
    * doc's total log-likelihood ratio on the 1e-9 integer grid —
    * trains the dense table (bounded driver collect at plan-build
    * time), then scores with the fused kernel. */
  private def dsirScored(raw: DataFrame, target: DataFrame, buckets: Int,
      idCol: String, textCol: String): DataFrame =
    dsirScoreWith(raw,
      dsirRatioTable(raw, target, buckets, textCol).toSeq, idCol, textCol)
      .withColumnRenamed("s9", "__s9")

  /**
   * DSIR importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): each candidate
   * document in `raw` is scored by the log-likelihood ratio of a
   * hashed bag-of-n-grams (unigram+bigram) model of the TARGET domain
   * versus the raw pool itself:
   *
   *   log w(d) = Σ_{feature occurrences f∈d} ln(p_tgt[b(f)] / p_raw[b(f)])
   *
   * with add-one smoothing over `buckets` hash buckets. Documents with
   * zero features (empty text) carry no evidence and are absent from
   * the output.
   *
   * Shape at scale: two bounded profile aggregations train the dense
   * ratio table ([[dsirRatioTable]] — ≤`buckets` rows collected, the
   * IVF-centroid posture); scoring is then ONE stateless fused-kernel
   * projection ([[dsirScoreWith]]) — no explode, no join, no shuffle,
   * no string keys anywhere.
   *
   * Returns `(idCol, n_feats, logratio)` — `logratio` is the TOTAL
   * (not averaged) log ratio, the paper's importance weight: longer
   * on-domain documents accumulate more evidence.
   */
  def dsirWeights(raw: DataFrame, target: DataFrame,
      buckets: Int = DsirBuckets, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    dsirScored(raw, target, buckets, idCol, textCol)
      .select(col(idCol), col("n_feats"),
        (col("__s9") / lit(1e9)).as("logratio"))

  /**
   * DSIR Gumbel-top-k resampling: sample `k` documents without
   * replacement, proportionally to their importance weights, by
   * ranking on `log w(d) + G(d)` with `G(d)` a Gumbel(0,1) draw — the
   * standard Gumbel-max reduction of weighted sampling to a top-k.
   * The Gumbel is derived from the partition-independent md5 RNG
   * (`-ln(-ln(U))`, `U = uniformPos`), so selection is deterministic,
   * stable under repartitioning, and replays exactly in the DuckDB
   * oracle; the inner `-ln(U)` is floored at 1e-26 (probability 2^-52
   * edge where U = 1) so no infinity ever reaches the grid. Both
   * addends live on the 1e-9 long grid, making the ranking key an
   * exact integer compare with `idCol` as the deterministic
   * tie-break. Top-k is a `TakeOrderedAndProject` — per-partition
   * heaps, no global sort.
   *
   * Returns `(idCol, n_feats, logratio, gumbel_key)` for the `k`
   * selected documents.
   */
  def dsirResample(raw: DataFrame, target: DataFrame, k: Int, seed: Long,
      buckets: Int = DsirBuckets, idCol: String = "doc_id",
      textCol: String = "text", stream: String = "corpus_dsir"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = Rng.uniformPos(seed, stream, col(idCol))
    val g = -log(greatest(-log(u), lit(1e-26)))
    dsirScored(raw, target, buckets, idCol, textCol)
      .withColumn("__key9", col("__s9") + round(g * lit(1e9)).cast("long"))
      .orderBy(col("__key9").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("n_feats"),
        (col("__s9") / lit(1e9)).as("logratio"),
        (col("__key9") / lit(1e9)).as("gumbel_key"))
  }

  /**
   * Per-group document cap ("domain cap", the web-pipeline guard that
   * no single domain/source dominates the mixture): flag — not filter —
   * the top `k` rows of each group by `(scoreCol DESC, idCol ASC)`, so
   * callers can both select (`where(kept)`) and report what a cap
   * would drop. Output = the input plus `rank` (1-based within the
   * kept set, NULL for dropped rows) and `kept`.
   *
   * The rank comes from [[graft.operators.TopK]]'s bounded aggregator,
   * NOT `row_number` over a group window: map-side combine forwards at
   * most k rows per (group, partition) into the shuffle, so a
   * mega-domain costs k rows instead of a single-partition sort of the
   * whole domain — the selectToBudget band-skew shape, avoided by
   * construction. The flag join is id-keyed (k·|groups| narrow rows),
   * never a broadcast of the corpus.
   */
  def capPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val kept = graft.operators.TopK.perGroup(
        df.select(col(groupCol), col(scoreCol), col(idCol)),
        groupCol, scoreCol, idCol, k)
      .select(col(idCol), col("rank"))
    df.join(kept, Seq(idCol), "left")
      .withColumn("kept", col("rank").isNotNull)
  }

  /**
   * Temperature-scaled mixture weights over the observed strata
   * shares — the standard multilingual/domain rebalancing rule
   * (sample stratum i with probability ∝ p_i^(1/T), where p_i is its
   * native share): T = 1 keeps native proportions, T → ∞ flattens
   * toward uniform, boosting tail strata at the expense of the head.
   * Returns `(strataCol, n_docs, p_native, p_temp)` — feed `p_temp`
   * to [[mixTo]] as the target weights.
   *
   * Cross-engine determinism: each scaled weight is quantized to the
   * 1e-9 grid BEFORE the normalizing sum (order-independent long
   * addition — a double Σ would follow partitioning order), the same
   * discipline as every aggregated float in the engine. All frames
   * after the first count are bounded by |strata|.
   */
  def temperatureWeights(df: DataFrame, strataCol: String,
      temperature: Double): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum("n_docs").as("__N"))
    val wq = counts.crossJoin(broadcast(tot))
      .withColumn("p_native",
        col("n_docs").cast("double") / col("__N").cast("double"))
      .withColumn("__wq",
        round(pow(col("p_native"), lit(1.0 / temperature)) * lit(1e9)).cast("long"))
    val z = wq.agg(sum("__wq").as("__Z"))
    wq.crossJoin(broadcast(z))
      .select(col(strataCol), col("n_docs"), col("p_native"),
        (col("__wq").cast("double") / col("__Z").cast("double")).as("p_temp"))
  }

  /**
   * Token-budget mixture solver — the capacity-planning step BEFORE a
   * mixture job runs: given a total token budget and per-stratum
   * mixture weights, how many tokens does each stratum owe
   * (`desired_tokens`), how many can it actually supply
   * (`avail_tokens`), what sampling rate hits the target
   * (`rate = kept/avail`), and where does the mix fall short
   * (`shortfall` > 0 ⇒ the stratum can't fill its share and the
   * run under-delivers unless weights are renormalized or the
   * stratum is upsampled — the [[mixTo]] `upsample` decision made
   * with token units instead of document counts).
   *
   * Exactness: per-stratum desired counts are computed ONCE in exact
   * BigInt arithmetic at plan time — `floor(budget · wq_s / Z)` with
   * weights on the 1e-9 grid — and injected as literals (the oracle
   * recomputes them in HUGEINT, so the arithmetic is verified, not
   * copied). The only double is the final rate, a single division.
   *
   * Shape at scale: one map-side-combinable groupBy over
   * (stratum, tokenCount) rows; everything after is |strata|-bounded.
   */
  def budgetMix(df: DataFrame, strataCol: String,
      weights: Map[String, Double], budgetTokens: Long,
      tokenCount: Column): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    require(budgetTokens >= 0, "budgetTokens must be non-negative")
    val total = weights.values.sum
    // 1e-9-grid weight quanta, exact desired share via BigInt floor-div
    val wq = weights.map { case (k, v) =>
      k -> BigInt(math.round(v / total * 1e9))
    }
    val z = wq.values.sum
    val desired = wq.map { case (k, q) =>
      k -> (BigInt(budgetTokens) * q / z).toLong
    }
    val dExpr = desired.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("long")) { case (acc, (k, d)) =>
        when(col(strataCol) === k, lit(d)).otherwise(acc)
      }
    df.groupBy(strataCol)
      .agg(sum(tokenCount).as("avail_tokens"))
      .withColumn("desired_tokens", dExpr)
      .where(col("desired_tokens").isNotNull)
      .select(col(strataCol), col("avail_tokens"), col("desired_tokens"),
        least(col("avail_tokens"), col("desired_tokens")).as("kept_tokens"),
        when(col("avail_tokens") === 0L, lit(0.0))
          .otherwise(
            least(col("avail_tokens"), col("desired_tokens")).cast("double") /
              col("avail_tokens").cast("double")).as("rate"),
        greatest(lit(0L), col("desired_tokens") - col("avail_tokens"))
          .as("shortfall"))
  }

  /**
   * Corpus-level segment deduplication — the C4 "remove any duplicated
   * line, keep its first occurrence" rule, generalized to fixed
   * `segTokens`-token segments (this corpus is one line per document;
   * at web scale the unit is a line/paragraph and the plan is
   * identical). Every document is cut into consecutive non-overlapping
   * segments (the last one may be short); a segment INSTANCE survives
   * iff it is the corpus-wide first occurrence of its text, "first"
   * being the (idCol, seg_idx) lexicographic minimum — deterministic
   * under any partitioning. Returns per document
   * `(idCol, n_segs, n_kept, n_tokens, n_kept_tokens, dedup_text)`
   * with `dedup_text` rebuilt from the surviving segments in document
   * order ('' when every segment was seen earlier — exact-duplicate
   * documents collapse to empty here, which is why C4 runs this AFTER
   * exact dedup; both orders are supported, this operator doesn't
   * care). Tokenless documents contribute no rows ([[chunkDocs]]
   * convention).
   *
   * Shape at scale: one narrow `posexplode(sequence)` Generate per
   * document (fan-out n/segTokens), then ONE shuffle on the 8-byte
   * `xxhash64(segment)` key — a min-struct aggregate (map-side
   * partial: first-occurrence is an associative min) joined back to
   * the segment rows on that same key (co-partitioned, no second
   * shuffle of the big side), and a per-document rollup. No global
   * sort, no windows over the corpus; the duplicate-mass skew case
   * (millions of instances of one boilerplate segment) costs one
   * hot-key min — an aggregate, not a pair join, so it cannot go
   * quadratic. The per-doc rebuild `collect_list` is bounded by the
   * document's own segment count.
   */
  /** The per-document segment frame shared by [[segmentDedup]] (batch)
    * and the streaming first-occurrence gate
    * ([[graft.streaming.NearDupStream.flagDupSegments]]): every input
    * column preserved, plus `__seg_idx`, `__seg` (single-space-joined
    * segment text), `__ntok`, and the 8-byte `__key = xxhash64(__seg)`
    * both sides group/keep state on. Tokenless rows contribute nothing. */
  private[graft] def segmentRows(df: DataFrame, segTokens: Int,
      textCol: String): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    df.withColumn("__tk", TextStats.tokens(col(textCol)))
      .where(size(col("__tk")) > 0)
      .select(col("*"),
        posexplode(sequence(lit(0L), (size(col("__tk")) - 1).cast("long"),
          lit(segTokens.toLong))).as(Seq("__seg_idx", "__tok_from")))
      .withColumn("__seg",
        array_join(slice(col("__tk"), (col("__tok_from") + 1).cast("int"),
          lit(segTokens)), " "))
      .withColumn("__ntok", least(lit(segTokens).cast("long"),
        size(col("__tk")).cast("long") - col("__tok_from")))
      .withColumn("__key", xxhash64(col("__seg")))
      .drop("__tk", "__tok_from")
  }

  def segmentDedup(df: DataFrame, segTokens: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val segs = segmentRows(df, segTokens, textCol)
      .select(col(idCol), col("__seg_idx"), col("__seg"), col("__ntok"),
        col("__key"))
    // Corpus-wide first instance per segment text: associative min of
    // the (id, seg_idx) struct — map-side combinable, hot keys cheap.
    val first = segs.groupBy(col("__key"))
      .agg(min(struct(col(idCol), col("__seg_idx"))).as("__first"))
    segs.join(first, "__key")
      .withColumn("__kept",
        col("__first").getField(idCol) === col(idCol) &&
          col("__first").getField("__seg_idx") === col("__seg_idx"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segs"),
        sum(col("__kept").cast("long")).as("n_kept"),
        sum(col("__ntok")).as("n_tokens"),
        sum(when(col("__kept"), col("__ntok")).otherwise(0L))
          .as("n_kept_tokens"),
        array_join(transform(
          array_sort(collect_list(when(col("__kept"),
            struct(col("__seg_idx"), col("__seg"))))),
          s => s.getField("__seg")), " ").as("dedup_text"))
  }

  /**
   * SOURCE-level boilerplate detection — the report behind C4's
   * "remove lines that repeat across a site" rule, on the engine's
   * fixed-width token segments: a segment appearing in at least
   * `minFrac` of a source's documents is boilerplate (headers,
   * banners, navigation, license footers), not content. Returns one
   * row per flagged `(source, segment)`: document frequency within
   * the source, the source's document count, and the fraction.
   *
   * Scale shape: per-doc-distinct segment rows (narrow: source, id,
   * 8-byte key + the segment payload), one count aggregation keyed on
   * (source, segment-key) — map-side combinable; the per-source doc-count
   * table is |sources| rows and broadcasts. No pair term anywhere:
   * cost is linear in total segments at any corpus size, which is why
   * this report is the cheap pre-pass before any scrubbing decision.
   */
  def boilerplateSegments(df: DataFrame, segTokens: Int = 4,
      minFrac: Double = 0.25, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text",
      minDocs: Long = 2L): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, "minFrac must be in (0, 1]")
    require(minDocs >= 1, "minDocs must be at least 1")
    // Per-document distinct occurrences, KEYED on the 8-byte
    // `__key = xxhash64(__seg)` that [[segmentRows]] already computed —
    // segment-identity-by-hash is the family convention
    // ([[segmentDedup]] groups on the same key). The segment text rides
    // only as a min() AGGREGATE payload for the report, never as a
    // shuffle key: both exchanges below partition on (source, id, key)
    // / (source, key), not on corpus text.
    val segs = segmentRows(df, segTokens, textCol)
      .select(col(sourceCol), col(idCol), col("__key"), col("__seg"))
    val perDoc = segs.groupBy(col(sourceCol), col(idCol), col("__key"))
      .agg(min(col("__seg")).as("__seg"))
    val nDocs = perDoc.select(col(sourceCol), col(idCol)).distinct()
      .groupBy(sourceCol).agg(count(lit(1)).as("n_docs"))
    perDoc.groupBy(col(sourceCol), col("__key"))
      .agg(count(lit(1)).as("df"), min(col("__seg")).as("__seg"))
      .join(broadcast(nDocs), sourceCol)
      .withColumn("frac", col("df").cast("double") / col("n_docs"))
      // tiny-source exemption: with n_docs < minDocs EVERY segment is
      // trivially "frequent" (a 1-doc source scores 1.0 across the
      // board) — frequency carries no boilerplate signal there
      .where(col("n_docs") >= minDocs && col("frac") >= minFrac)
      .select(col(sourceCol), col("__seg").as("segment"), col("df"),
        col("n_docs"), col("frac"))
  }

  /** Broadcast/collect bound for the boilerplate flag table: 2^20
    * (source, segment) flags ≈ 8 MB of 8-byte keys. Boilerplate is
    * few-distinct-by-definition, so healthy corpora sit far below it —
    * but |sources| is unbounded (millions of web domains), so every
    * exit that materializes the table caps here, keeping the
    * highest-`frac` flags deterministically (ties on (source,
    * segment)). Audit what a cap dropped with
    * [[boilerplateFlagOverflow]]; pass `Int.MaxValue` to disable —
    * the [[graft.ext.Dedup.MaxBucketSize]] contract. */
  val MaxFlagged: Int = 1 << 20

  /** Keep the `maxFlagged` highest-`frac` flag rows (deterministic
    * tie-break on (source, segment)) — a TakeOrdered over the already
    * minFrac-filtered flag table, the guard in front of every
    * driver-collect/broadcast exit of the boilerplate family. */
  private def capFlags(flags: DataFrame, maxFlagged: Int,
      sourceCol: String): DataFrame =
    if (maxFlagged == Int.MaxValue) flags
    else flags.orderBy(col("frac").desc, col(sourceCol), col("segment"))
      .limit(maxFlagged)

  /** Audit companion of the `maxFlagged` cap ([[Dedup]]'s
    * bucket-overflow posture): the flagged rows BEYOND the cap — the
    * lowest-`frac` flags [[boilerplateScrub]] / [[boilerplateFlagKeys]]
    * would ignore. Empty in healthy corpora. */
  def boilerplateFlagOverflow(df: DataFrame, segTokens: Int = 4,
      minFrac: Double = 0.25, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text",
      minDocs: Long = 2L, maxFlagged: Int = MaxFlagged): DataFrame = {
    val flags = boilerplateSegments(df, segTokens, minFrac, sourceCol,
      idCol, textCol, minDocs)
    flags.join(
      broadcast(capFlags(flags, maxFlagged, sourceCol)
        .select(col(sourceCol), col("segment"))),
      Seq(sourceCol, "segment"), "left_anti")
  }

  /**
   * STATELESS per-row form of [[boilerplateScrub]] for streams: the
   * flag table from a batch [[boilerplateSegments]] run (small by
   * definition — boilerplate is few distinct segments repeated widely
   * — and capped at `maxFlagged` by [[boilerplateFlagKeys]] besides)
   * rides the plan as a plan-time-constant SORTED key array inside one
   * fused kernel ([[graft.plans.Native.scrubSegments]]): each row
   * re-tokenizes, re-keys `xxhash64(source || '\u0001' || segment)`,
   * and rebuilds itself from its own unflagged segments — a binary
   * search per segment where the previous `array_contains` literal
   * formulation re-scanned the whole key list per segment. No join, no
   * state store, so it gates a `readStream` exactly like the
   * broadcast-Bloom decontaminator. Returns the input columns plus
   * `(n_segs, n_dropped, clean_text)`.
   *
   * Equal to the batch scrub over the same flag table for every
   * TOKEN-BEARING document (StreamingSpec pins it): the batch side
   * explodes + re-aggregates, this side filters the same segments
   * inside the row. Deliberate deviation at the boundary: tokenless
   * documents get a `(0, 0, "")` row here but NO row from
   * [[boilerplateScrub]] (nothing survives its `segmentRows` explode
   * to re-aggregate) — a stream gate must pass every row through.
   */
  def scrubRowStateless(df: DataFrame, flaggedKeys: Seq[Long],
      segTokens: Int = 4, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    df.withColumn("__sc", graft.plans.NativeFunctions.scrubSegments(
        col(sourceCol), col(textCol), flaggedKeys, segTokens))
      .select(col("*"),
        col("__sc").getField("n_segs").as("n_segs"),
        col("__sc").getField("n_dropped").as("n_dropped"),
        col("__sc").getField("clean_text").as("clean_text"))
      .drop("__sc")
  }

  /** The (source, segment) flag table of [[boilerplateSegments]]
    * reduced to the key list [[scrubRowStateless]] ships into its
    * plan — a driver-side collect bounded by the `maxFlagged` cap
    * (highest-`frac` flags kept; audit the remainder with
    * [[boilerplateFlagOverflow]]). */
  def boilerplateFlagKeys(df: DataFrame, segTokens: Int = 4,
      minFrac: Double = 0.25, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text",
      minDocs: Long = 2L, maxFlagged: Int = MaxFlagged): Seq[Long] =
    capFlags(
      boilerplateSegments(df, segTokens, minFrac, sourceCol, idCol,
        textCol, minDocs),
      maxFlagged, sourceCol)
      .select(xxhash64(concat(col(sourceCol), lit("\u0001"),
        col("segment"))).as("k"))
      .collect().map(_.getLong(0)).toSeq

  /**
   * [[boilerplateSegments]]'s scrub companion: rebuild each document
   * with its source's boilerplate segments REMOVED (every occurrence —
   * unlike [[segmentDedup]], which keeps the first instance; a banner
   * is noise in its first document too). Returns
   * `(idCol, n_segs, n_dropped, clean_text)`.
   *
   * The flag side is the `maxFlagged`-capped flag table re-keyed to
   * `(source, xxhash64(segment))` — 8-byte keys, bounded rows — so the
   * scrub is a BROADCAST left join against the per-segment rows on
   * `(source, __key)` (the same hash identity [[segmentDedup]] and the
   * big side's own `segmentRows` already carry; no segment text in any
   * join key), then the same sorted-rebuild aggregation as
   * [[segmentDedup]].
   */
  def boilerplateScrub(df: DataFrame, segTokens: Int = 4,
      minFrac: Double = 0.25, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text",
      maxFlagged: Int = MaxFlagged): DataFrame = {
    val segs = segmentRows(df, segTokens, textCol)
      .select(col(sourceCol), col(idCol), col("__seg_idx"), col("__seg"),
        col("__key"))
    val flagged = capFlags(
      boilerplateSegments(df, segTokens, minFrac, sourceCol, idCol,
        textCol),
      maxFlagged, sourceCol)
      .select(col(sourceCol), xxhash64(col("segment")).as("__key"),
        lit(true).as("__boiler"))
    segs.join(broadcast(flagged), Seq(sourceCol, "__key"), "left")
      .withColumn("__drop", coalesce(col("__boiler"), lit(false)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segs"),
        sum(col("__drop").cast("long")).as("n_dropped"),
        array_join(transform(
          array_sort(collect_list(when(!col("__drop"),
            struct(col("__seg_idx"), col("__seg"))))),
          s => s.getField("__seg")), " ").as("clean_text"))
  }
}
