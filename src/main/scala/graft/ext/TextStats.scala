package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines (SURVEY §2.7):
 * language ID (marker-n-gram heuristic), quality scoring, token counting,
 * and document fingerprinting. Pure Column math — every operator is a
 * single projection over the scan (no shuffle, full codegen), which is
 * exactly the shape that survives a 100 TB corpus.
 */
object TextStats {

  /** Whitespace tokens, lowercased, empties dropped — the ONE
    * tokenizer definition; [[Dedup.tokens]] delegates here so the
    * shared DuckDB oracle fragment can't desynchronize. Served by the
    * fused native expression ([[graft.plans.Native.tokensOf]], same
    * lowering + Java regex split) — the Column formulation below pays
    * an interpreted per-element lambda for the empty filter, which
    * taxed every tokens-exploding operator; ExtSpec pins equality. */
  def tokens(text: Column): Column =
    graft.plans.NativeFunctions.tokensOf(text)

  /** The `filter(split(lower))` Column formulation [[tokens]]'s fused
    * expression replaced — the equivalence reference. */
  private[graft] def tokensColumnar(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * Token-stutter removal — the intra-document half of repetition
   * cleaning (Rae-et-al lineage: generated/boilerplate text stutters,
   * "the the", "a a"): drop every token equal to its immediate
   * predecessor and rebuild the text. CASE-SENSITIVE single-space
   * tokenization (split on ' ', not [[tokens]]) — this operator
   * REWRITES the text, so it must not lowercase or re-space what it
   * keeps; corpora with other whitespace conventions normalize first.
   *
   * Returns `(idCol, text_clean, n_kept, n_dropped)`.
   *
   * Shape at scale: one narrow posexplode, one per-document lag
   * window (hash-partitioned by id — parallel across documents,
   * bounded by document length within), one ordered re-aggregation.
   * No corpus-wide anything; cost is linear in total tokens. The
   * rebuild's `transform` over the per-doc sorted struct array is an
   * interpreted HOF, but it runs once per DOCUMENT on the already
   * aggregated array — not per token in a hot loop (the distinction
   * the fused-kernel rule is about).
   */
  def squeezeRepeats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val kept = parts
      .withColumn("__pw", lag(col("w"), 1).over(w))
      .where(col("__pw").isNull || col("w") =!= col("__pw"))
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("text_clean"))
    docs
      .select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("__nt"))
      .join(rebuilt, Seq(idCol))
      .select(col(idCol), col("text_clean"), col("n_kept"),
        (col("__nt") - col("n_kept")).as("n_dropped"))
  }

  /**
   * BPE-ish subword proxy count: word-characters runs + standalone
   * punctuation, the classic `\w+|[^\w\s]` pre-tokenizer (ASCII classes
   * for cross-engine determinism).
   *
   * This is the packing-grade counter: what a trainer sees is the
   * TOKENIZER's count, and a whitespace count undercounts punctuation-
   * heavy text badly (a real BPE emits ~1 token per word-ish piece
   * plus one per punctuation mark — exactly this pre-tokenization,
   * before merges shave a few percent). [[graft.ext.Corpus.packChunks]]
   * takes the counter as a Column precisely so callers can plug a
   * stricter one; the engine's pack queries use this proxy, exactly
   * replayable in the oracle as `len(regexp_extract_all(...))`.
   *
   * The whitespace class is spelled explicitly ([[BpeishPattern]]):
   * Java's `\s` includes `\x0B` (vertical tab) while RE2's does not,
   * so a bare `\s` would make the oracle equivalence corpus-dependent.
   */
  val BpeishPattern: String = "[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n\\x0B\\f\\r]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Bytes-per-token proxy: ceil(utf8 bytes / 4) — the "1 token ≈ 4
    * bytes" rule of thumb. The cheapest counter (no regex, no token
    * array) for capacity planning at 100 TB; replayable as
    * `ceil(strlen(text) / 4.0)`. */
  def byteProxyTokenCount(text: Column): Column =
    ceil(octet_length(text) / lit(4.0)).cast("long")

  /** Occurrences of a marker word, computed by the length-difference
    * trick — deterministic and portable to any SQL engine. */
  def wordOccurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val needle = s" $word "
    // counts non-overlapping occurrences; immediately-adjacent repeats
    // ("the the") count once — acceptable for heuristic scoring and
    // reproducible in any engine doing the same length-difference math
    (length(padded) - length(replace(padded, lit(needle), lit(" ")))) /
      lit(needle.length - 1)
  }

  /** Language marker lexicons (tiny on purpose — a heuristic, not a model). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "que", "es", "una"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Integer score per language: total marker-word occurrences. */
  def langScore(text: Column, lang: String): Column =
    langMarkers.toMap.apply(lang)
      .map(w => wordOccurrences(text, w))
      .reduce(_ + _).cast("long")

  /**
   * Language-ID: argmax of marker scores; all-zero scores fall back to
   * "und" (undetermined). Deterministic tie-break: higher score wins,
   * then the lexicographically larger language code (struct `greatest`
   * compares fields left-to-right).
   */
  def langId(text: Column): Column = {
    val scored = langMarkers.map { case (lang, _) =>
      struct(langScore(text, lang).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** English-ish stopword ratio over whitespace tokens. */
  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is",
    "it", "that", "for")

  def stopwordCount(text: Column): Column =
    Stopwords.map(w => wordOccurrences(text, w)).reduce(_ + _).cast("long")

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?'\"()\\[\\]{}-]"), lit(0)))

  /**
   * Quality facets as exact integers (cross-engine-safe), plus a coarse
   * quality bucket from integer comparisons: a document is "good" when it
   * has enough tokens, a sane mean word length, and is not punctuation
   * soup. Mirrors the usual pretraining-filter heuristics (length /
   * punctuation / stopword ratios).
   */
  def qualityFacets(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // the four text counters come from ONE fused pass
    // ([[graft.plans.Native.qualityCounts]] — bit-identical to the
    // Column formulations tokenCount/bpeishTokenCount/punctCount/
    // stopwordCount, which ExtSpec pins; the stopword trick alone was
    // ten full-text replace passes as Columns)
    df.withColumn("__qc", graft.plans.NativeFunctions.qualityCounts(t))
      .withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("n_tokens", col("__qc.n_tokens"))
      .withColumn("n_bpeish", col("__qc.n_bpeish"))
      .withColumn("n_punct", col("__qc.n_punct"))
      .withColumn("n_stop", col("__qc.n_stop"))
      .drop("__qc")
      .withColumn("quality_bucket",
        when(col("n_tokens") >= 20 &&
             col("n_chars_m") <= col("n_tokens") * 12 &&
             col("n_punct") * 5 <= col("n_tokens") &&
             col("n_stop") > 0, lit("good"))
        .when(col("n_tokens") >= 5, lit("fair"))
        .otherwise(lit("poor")))
  }

  /**
   * Word n-grams (space-joined) over the shared tokenizer. Documents
   * with fewer than n tokens yield an EMPTY array — corpus-statistics
   * semantics, in contrast to [[Dedup.shingles]] which falls back to
   * the whole document (a recall choice for dedup candidate
   * generation, wrong for frequency counting).
   *
   * NOTE: this is the semantic REFERENCE implementation; the `transform`
   * lambda is interpreted per element, so corpus-scale hot paths must
   * not call it. For counting, derive sizes without materializing grams
   * (total = tokens−n+1; distinct = the native hashed-shingle kernel);
   * for materialized bigrams use the codegen-friendly
   * `arrays_zip(slice, slice)` formulation (see `x_ngram_topk`).
   */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + lit(j))): _*)))
  }

  /**
   * Document fingerprint: polynomial rolling hash of the lowercased,
   * whitespace-normalized text — `acc = (acc * 31 + code) mod 1e9+7`,
   * folded with `aggregate` over the character array. Stable across
   * engines (all intermediates < 2^63) and usable as a cheap
   * near-identity key after normalization.
   */
  def fingerprint(text: Column): Column =
    graft.plans.NativeFunctions.normalizedRollingHash(text)

  /**
   * Per-document average unigram log-probability under the corpus's
   * own unigram distribution — the classic cheap LM-quality proxy
   * (documents full of corpus-rare tokens score low). Per-token
   * `ln(count/total)` is snapped to the 1e-9 integer grid BEFORE the
   * per-document sum (the Rng scaladoc's integer-grid trick): summing
   * raw doubles is addition-order-dependent, so a cross-engine hash
   * compare would drift in the last ulp; summing grid integers is
   * exact under any order. The final average divides the integer sum
   * back out as one double op.
   *
   * Shape at scale: one (term) count shuffle, a vocabulary-sized join
   * back onto the token stream (AQE broadcasts it while the vocab
   * fits), a single-row total cross-joined in, one per-doc aggregate.
   */
  def unigramLogProb(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val cf = toks.groupBy("term").agg(count(lit(1)).as("__cnt"))
    val tot = toks.agg(count(lit(1)).as("__total"))
    toks.join(cf, "term")
      .crossJoin(broadcast(tot))
      .withColumn("__lp9",
        round(log(col("__cnt") / col("__total")) * lit(1e9)).cast("long"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("__lp9").as("__slp9"))
      .withColumn("avg_logprob", col("__slp9") / (col("n_tokens") * lit(1e9)))
      .select(idCol, "n_tokens", "avg_logprob")
  }

  /**
   * TF-IDF top-`k` terms per document over the shared tokenizer:
   * `score = round(tf * ln(N / df), 9)` with deterministic tie-break
   * (score desc, then term asc). The 9-digit quantization is the same
   * documented trick as [[graft.functions.Rng.gaussian]] — it absorbs
   * the last-ulp `ln` differences between engines so the oracle hash
   * compares bit-identical doubles.
   *
   * Shape at scale: one shuffle to `(doc, term)` counts, one
   * vocabulary-sized aggregate for document frequencies (broadcastable
   * — AQE picks broadcast when the vocab fits), a single-row corpus
   * count cross-joined in, and a per-document window for top-k. No
   * global sort, no driver-side state.
   */
  def tfidfTopK(df: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, "k must be positive")
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("__n") / col("df")), 9))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(idCol, "term", "tf", "df", "score")
  }

  /**
   * Bigram stupid-backoff language-model scoring — the
   * perplexity-style quality filter (CCNet lineage): train bigram and
   * unigram counts on a reference corpus `train`, then score every
   * document of `docs` by its mean ln p over bigram positions:
   *
   *   p(w2|w1) = c(w1 w2) / c(w1)          when the bigram was seen
   *            = α · (c(w2)+1) / (T+V)     otherwise — stupid backoff
   *              into the Laplace-smoothed train unigram, so unseen
   *              words score finitely instead of −∞
   *
   * Contributions snap to the 1e-9 grid before the order-independent
   * long sum ([[unigramLogProb]]'s trick), so scores replay exactly in
   * the SQL oracle. Documents with fewer than 2 tokens emit no row.
   * Low mean log-prob = high perplexity = "unlike the reference
   * corpus" — the standard filter signal.
   *
   * Shape at scale: two train-side aggregations (bigram/unigram
   * counts) joined onto the scored position frame, the (T, V) totals
   * broadcast as one scalar row; gram construction is the
   * shifted-slice zip (codegen), never an interpreted lambda. Every
   * count/join key is the `xxhash64` of the gram or word — 8 bytes
   * cross each shuffle instead of one or two strings (the same trick
   * as [[Dedup.ngramJaccardPairs]]'s hashed grams, with the same
   * 2^-64-collision equivalence the oracle relies on: the oracle
   * joins on the strings themselves). The word strings are dropped
   * before any aggregation, so no string ever keys an exchange
   * (pinned by ScaleSpec).
   */
  def bigramLogProb(docs: DataFrame, train: DataFrame, alpha: Double = 0.4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    // (w1, w2) positions reduced to hashed keys in the same projection
    // that explodes them: __k12 keys the bigram join, __k1/__k2 the
    // unigram joins. Seeded concatenation (xxhash64(w1, w2)) is
    // order-sensitive, so "a b" and "b a" key differently.
    def positions(df: DataFrame, idCols: Seq[Column]): DataFrame = {
      val toks = tokens(col(textCol))
      val n1 = greatest(size(toks) - 1, lit(0))
      df.select(idCols :+ explode(arrays_zip(
          slice(toks, lit(1), n1).as("w1"),
          slice(toks, lit(2), n1).as("w2"))).as("z"): _*)
        .select(idCols ++ Seq(xxhash64(col("z.w1"), col("z.w2")).as("__k12"),
          xxhash64(col("z.w1")).as("__k1"), xxhash64(col("z.w2")).as("__k2")): _*)
    }
    val big = positions(train, Nil)
      .groupBy("__k12").agg(count(lit(1)).as("__cb"))
    val uniToks = train.select(explode(tokens(col(textCol))).as("__w"))
      .select(xxhash64(col("__w")).as("__kw"))
    val uni = uniToks.groupBy("__kw").agg(count(lit(1)).as("__cu"))
    val tot = uniToks.agg(count(lit(1)).as("__t"),
      countDistinct("__kw").as("__v"))
    val p = when(col("__cb").isNotNull && col("__c1").isNotNull,
        col("__cb") / col("__c1"))
      .otherwise(lit(alpha) * (coalesce(col("__c2"), lit(0L)) + lit(1L)) /
        (col("__t") + col("__v")))
    positions(docs, Seq(col(idCol)))
      .join(big, Seq("__k12"), "left")
      .join(uni.select(col("__kw").as("__k1"), col("__cu").as("__c1")), Seq("__k1"), "left")
      .join(uni.select(col("__kw").as("__k2"), col("__cu").as("__c2")), Seq("__k2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("__lp9", round(log(p) * lit(1e9)).cast("long"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("__lp9").as("__s"))
      .withColumn("avg_logprob", col("__s") / (col("n_bigrams") * lit(1e9)))
      .select(idCol, "n_bigrams", "avg_logprob")
  }

  /**
   * Jelinek–Mercer-interpolated TRIGRAM language model — the classic
   * n-gram LM ladder's top rung over [[unigramLogProb]] and
   * [[bigramLogProb]]: per trigram position,
   *
   *   p = λ₃·c(w₁w₂w₃)/c(w₁w₂) + λ₂·c(w₂w₃)/c(w₂) + λ₁·(c(w₃)+1)/(T+V)
   *
   * with each ML term contributing 0 when its context is unseen and
   * the add-one unigram floor keeping p > 0 always (so `log` is total
   * — no doc can NaN out). Counts come from `train`; the λs must sum
   * to 1 with λ₁ > 0.
   *
   * Same scale shape as [[bigramLogProb]]: all n-gram keys are hashed
   * to 8 bytes IN the exploding projection (xxhash64 over the window's
   * tokens — order-sensitive), so the five left joins shuffle narrow
   * keys; count tables aggregate map-side; the single-row totals
   * cross-join broadcasts; per-doc sums run on the 1e-9 integer grid
   * (order-independent, oracle-exact). Documents under 3 tokens have
   * no trigram positions and are absent, like [[bigramLogProb]]'s
   * under-2 rule.
   */
  def trigramLogProb(docs: DataFrame, train: DataFrame,
      l3: Double = 0.5, l2: Double = 0.3, l1: Double = 0.2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(l1 > 0 && l2 >= 0 && l3 >= 0, "lambdas must be non-negative, l1 > 0")
    require(math.abs(l3 + l2 + l1 - 1.0) < 1e-12, "lambdas must sum to 1")
    def triPositions(df: DataFrame, idCols: Seq[Column]): DataFrame = {
      val toks = tokens(col(textCol))
      val n2 = greatest(size(toks) - 2, lit(0))
      df.select(idCols :+ explode(arrays_zip(
          slice(toks, lit(1), n2).as("w1"),
          slice(toks, lit(2), n2).as("w2"),
          slice(toks, lit(3), n2).as("w3"))).as("z"): _*)
        .select(idCols ++ Seq(
          xxhash64(col("z.w1"), col("z.w2"), col("z.w3")).as("__k123"),
          xxhash64(col("z.w1"), col("z.w2")).as("__k12"),
          xxhash64(col("z.w2"), col("z.w3")).as("__k23"),
          xxhash64(col("z.w2")).as("__kw2"),
          xxhash64(col("z.w3")).as("__kw3")): _*)
    }
    def bigPositions(df: DataFrame): DataFrame = {
      val toks = tokens(col(textCol))
      val n1 = greatest(size(toks) - 1, lit(0))
      df.select(explode(arrays_zip(
          slice(toks, lit(1), n1).as("w1"),
          slice(toks, lit(2), n1).as("w2"))).as("z"))
        .select(xxhash64(col("z.w1"), col("z.w2")).as("__kb"))
    }
    val tri = triPositions(train, Nil)
      .groupBy("__k123").agg(count(lit(1)).as("__c3"))
    val big = bigPositions(train).groupBy("__kb").agg(count(lit(1)).as("__cb"))
    val uniToks = train.select(explode(tokens(col(textCol))).as("__w"))
      .select(xxhash64(col("__w")).as("__kw"))
    val uni = uniToks.groupBy("__kw").agg(count(lit(1)).as("__cu"))
    val tot = uniToks.agg(count(lit(1)).as("__t"),
      countDistinct("__kw").as("__v"))
    val p3 = when(col("__c3").isNotNull && col("__cb12").isNotNull,
      col("__c3") / col("__cb12")).otherwise(lit(0.0))
    val p2 = when(col("__cb23").isNotNull && col("__cu2").isNotNull,
      col("__cb23") / col("__cu2")).otherwise(lit(0.0))
    val p1 = (coalesce(col("__cu3"), lit(0L)) + lit(1L)) /
      (col("__t") + col("__v"))
    val p = lit(l3) * p3 + lit(l2) * p2 + lit(l1) * p1
    triPositions(docs, Seq(col(idCol)))
      .join(tri, Seq("__k123"), "left")
      .join(big.select(col("__kb").as("__k12"), col("__cb").as("__cb12")),
        Seq("__k12"), "left")
      .join(big.select(col("__kb").as("__k23"), col("__cb").as("__cb23")),
        Seq("__k23"), "left")
      .join(uni.select(col("__kw").as("__kw2"), col("__cu").as("__cu2")),
        Seq("__kw2"), "left")
      .join(uni.select(col("__kw").as("__kw3"), col("__cu").as("__cu3")),
        Seq("__kw3"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("__lp9", round(log(p) * lit(1e9)).cast("long"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"), sum("__lp9").as("__s"))
      .withColumn("avg_logprob", col("__s") / (col("n_trigrams") * lit(1e9)))
      .select(idCol, "n_trigrams", "avg_logprob")
  }

  /**
   * Worst fixed-width token window per document by self-corpus unigram
   * log-probability — the span-level quality sweep: a document whose
   * WORST `window`-token run is still probable is clean throughout,
   * while a good average can hide one garbage span (the failure mode
   * doc-level scores like [[unigramLogProb]] cannot see). Returns one
   * row per input document: token count, the worst window's 0-based
   * start, and its average log-prob (NULL start/score for docs shorter
   * than `window` — no full window exists).
   *
   * Shape at scale: the corpus unigram table is vocabulary-bounded, so
   * it folds into the scan as a sorted plan-time key table (the
   * `naiveBayesFused` posture) and the whole sweep — lookup, rolling
   * sum, argmin — runs inside [[graft.plans.Native.worstWindow]] as
   * ONE codegen'd projection: no position explode, no vocab join, no
   * per-document window sort. [[worstWindowWindowed]] keeps the
   * join + partitioned-window formulation as the spec-pinned
   * reference (ExtSpec proves row equality).
   */
  def worstWindow(docs: DataFrame, window: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0, "window must be positive")
    val grouped = docs
      .select(explode(tokens(col(textCol))).as("__w"))
      .select(Dedup.md5Key(col("__w")).as("__kw"))
      .groupBy("__kw").agg(count(lit(1)).as("__cnt"))
      .localCheckpoint() // feeds the total and the table collect once
    val total = grouped.agg(sum("__cnt")).collect()(0).getLong(0)
    // per-token grid contribution computed BY Spark — identical
    // rounding to the windowed formulation's __lp9 column
    val rows = grouped.select(col("__kw"),
        round(log(col("__cnt") / lit(total)) * lit(1e9)).cast("long").as("__lp9"))
      .collect().sortBy(_.getLong(0))
    val keys = rows.map(_.getLong(0)).toSeq
    val lp9 = rows.map(_.getLong(1)).toSeq
    val st = graft.plans.NativeFunctions.worstWindow(col(textCol), keys, lp9, window)
    val full = col("__w.n_found") >= window
    docs.select(col(idCol), st.as("__w"))
      .select(col(idCol), col("__w.n_tokens").as("n_tokens"),
        when(full, col("__w.worst_start")).as("worst_start"),
        when(full, col("__w.worst_roll9") / (lit(window) * lit(1e9)))
          .as("worst_avg_logprob"))
  }

  /** The posexplode + vocab-join + per-document rolling-window
    * formulation [[worstWindow]]'s fused kernel replaced — kept as the
    * equivalence reference (ExtSpec pins kernel ≡ windowed, including
    * the under-window NULL rows and tie-breaking). */
  private[graft] def worstWindowWindowed(docs: DataFrame, window: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0, "window must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("__pos", "__term")))
    val cf = toks.groupBy("__term").agg(count(lit(1)).as("__cnt"))
    val tot = toks.agg(count(lit(1)).as("__total"))
    val w = Window.partitionBy(idCol).orderBy("__pos")
      .rowsBetween(-(window - 1), Window.currentRow)
    val rolled = toks.join(cf, "__term")
      .crossJoin(broadcast(tot))
      .withColumn("__lp9",
        round(log(col("__cnt") / col("__total")) * lit(1e9)).cast("long"))
      .withColumn("__roll9", sum("__lp9").over(w))
      .withColumn("__nw", count(lit(1)).over(w))
      .where(col("__nw") === window)
    val worst = rolled
      .groupBy(idCol)
      .agg(min(struct(col("__roll9"), col("__pos"))).as("__m"))
      .select(col(idCol),
        (col("__m").getField("__pos") - lit(window - 1)).cast("long")
          .as("worst_start"),
        (col("__m").getField("__roll9") / (lit(window) * lit(1e9)))
          .as("worst_avg_logprob"))
    docs.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(worst, Seq(idCol), "left")
  }

  /**
   * Trigram-model language identification — the production-strength
   * upgrade of the [[langId]] marker heuristic, in the CCNet/fastText
   * lineage: per-language CHARACTER-trigram profiles are trained on a
   * labeled reference corpus, and each document is scored per language
   * by its sum of Jelinek-Mercer-interpolated trigram log-probs:
   *
   *   score_L(d) = Σ_{g} ln(λ·c_L(g)/T_L + (1−λ)·(c(g)+1)/(T+V))
   *
   * with `c_L(g)` the trigram's count in language L's training text,
   * `T_L` language L's total trigram count, `c(g)`/`T` the pooled
   * counts across ALL languages, `V` the number of distinct training
   * trigrams, and λ = 0.9. The interpolated background term is the
   * crucial choice: a gram unseen in EVERY language contributes the
   * SAME `(1−λ)·1/(T+V)` to every score, so unseen text is
   * language-neutral — plain add-one smoothing instead scores unseen
   * grams `1/(T_L+V)`, which systematically biases every
   * out-of-domain document toward whichever language has the LEAST
   * training data (measured: a corpus of held-out sentences collapsed
   * onto the shortest-profile language). Discrimination comes only
   * from grams a language has actually seen, as it should. A language
   * with no training data at all takes the background term alone. The
   * prediction is the argmax language; ties break toward the
   * lexicographically larger code (struct `greatest`, exactly like
   * [[langId]]); documents with fewer than 3 characters predict
   * "und". Per-position contributions snap to the 1e-9 integer grid
   * before the order-independent long sum ([[unigramLogProb]]'s
   * trick), so every score — and therefore every argmax — replays
   * exactly in the DuckDB oracle.
   *
   * Trigrams are built from the lowercased raw text (spaces included
   * — word-boundary grams carry real signal) via the shifted-slice
   * zip over the character array, never an interpreted per-element
   * lambda; the join key is the trigram's `xxhash64`, so the shuffle
   * carries 8-byte keys while the oracle joins the gram strings (the
   * proven 2^-64 equivalence). Character splitting is code-point
   * based in both engines; supplementary-plane text (outside the BMP)
   * is the one documented divergence risk between Java's and DuckDB's
   * splitting and does not occur in the test corpora.
   *
   * Returns `(idCol, n_trigrams, lang_pred)`.
   *
   * Shape at scale: one train-side profile aggregation (bounded by
   * the trigram space, broadcastable — AQE decides, as with the
   * unigram LM), a (1-row) totals frame broadcast explicitly, one
   * hashed equi-join from the exploded position frame, one per-doc
   * aggregate. No string shuffle keys, no windows, no driver state.
   */
  /** Interpolation weight of the in-language term; `1 - Lambda` of the
    * mass goes to the pooled background model. Shared with the oracle
    * as round-trip double literals. */
  val LangIdLambda: Double = 0.9

  /** Positional trigram hash rows — the fused native kernel, one pass
    * per row, no per-char array/slice/zip allocation; hash family
    * identical to the xxhash64(concat(c0,c1,c2)) formulation it
    * replaced (same bytes, same seed — LangIdSpec pins the
    * equivalence). Documents with fewer than 3 code points yield an
    * empty array, which explode drops — the `where(size >= 3)` gate,
    * for free. */
  private def trigramRows(df: DataFrame, idCols: Seq[Column],
      textCol: String): DataFrame =
    df.select(idCols :+ explode(
      graft.plans.NativeFunctions.charTrigramHashes(col(textCol))).as("__kg"): _*)

  /**
   * Per-language trigram-count profile `(__kg, __c_<lang>…)` — the
   * TRAINED half of [[langIdTrigram]], exposed so serving paths train
   * once and score many times ([[ensureLangIdProfile]]). Cardinality
   * is bounded by the trigram SPACE (|charset|³ — constant in corpus
   * size), so the profile is always persistable and broadcastable.
   */
  def langIdProfile(train: DataFrame, langs: Seq[String],
      textCol: String = "text", labelCol: String = "lang"): DataFrame = {
    require(langs.nonEmpty, "langs must be non-empty")
    def perLangCount(l: String, out: String): Column =
      sum(when(col(labelCol) === l, 1L).otherwise(0L)).as(out)
    trigramRows(train, Seq(col(labelCol)), textCol).groupBy("__kg")
      .agg(perLangCount(langs.head, s"__c_${langs.head}"),
        langs.tail.map(l => perLangCount(l, s"__c_$l")): _*)
  }

  /**
   * Build-once persistence of the language-ID profile — the
   * [[graft.ext.Warehouse]] serving posture: the train-side explode +
   * aggregation runs ONCE per (corpus, langs) fingerprint and lands in
   * a `_SUCCESS`-guarded warehouse table; every subsequent scoring
   * query probes the persisted counts (exact longs — parquet
   * round-trips them bit-identically, so scores are unchanged vs
   * training inline). Fingerprint `name` with the training source and
   * the language set.
   */
  def ensureLangIdProfile(spark: org.apache.spark.sql.SparkSession,
      name: String, langs: Seq[String])(train: => DataFrame): DataFrame = {
    val ddl = ("__kg BIGINT" +: langs.map(l => s"__c_$l BIGINT")).mkString(", ")
    Warehouse.ensureTable(spark, name, ddl)(train)
    spark.table(name)
  }

  /**
   * Score `docs` against a trained trigram `profile`
   * ([[langIdProfile]] output or its persisted table) — the PROBE half
   * of [[langIdTrigram]]: no train-side explode anywhere in this plan
   * (ScaleSpec pins it); the profile broadcasts (trigram-space
   * bounded) and only the per-doc rollup shuffles.
   */
  def scoreLangId(docs: DataFrame, profile: DataFrame, langs: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(langs.nonEmpty, "langs must be non-empty")
    // totals roll up from the PROFILE (one row per distinct gram, so
    // count(*) is the vocabulary and the per-language sums are the
    // training totals) — aggregating ~|trigram space| rows instead of
    // re-running the corpus-sized train explode a second time
    val tot = profile.agg(
      sum(col(s"__c_${langs.head}")).as(s"__t_${langs.head}"),
      langs.tail.map(l => sum(col(s"__c_$l")).as(s"__t_$l")) :+
        count(lit(1)).as("__v"): _*)
    // pooled background: total count of this gram across languages and
    // the grand trigram total, Laplace-floored so it is never zero
    val cTot = langs.map(l => coalesce(col(s"__c_$l"), lit(0L))).reduce(_ + _)
    val tTot = langs.map(l => col(s"__t_$l")).reduce(_ + _)
    val background = (cTot + lit(1L)) / (tTot + col("__v"))
    // the profile's cardinality is bounded by the TRIGRAM SPACE
    // (|charset|³ — a constant independent of corpus size), so
    // broadcasting it is scale-correct and spares the scored explode
    // (corpus-sized) its join shuffle; only the per-doc rollup
    // shuffles, and that partial-aggregates map-side
    val scored = trigramRows(docs, Seq(col(idCol)), textCol)
      .join(broadcast(profile), Seq("__kg"), "left")
      .crossJoin(broadcast(tot))
      .select(col(idCol) +: langs.map { l =>
        val inLang = when(col(s"__t_$l") > 0,
          coalesce(col(s"__c_$l"), lit(0L)) / col(s"__t_$l")).otherwise(lit(0.0))
        round(log(lit(LangIdLambda) * inLang +
          lit(1.0 - LangIdLambda) * background) * lit(1e9))
          .cast("long").as(s"__lp_$l")
      }: _*)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"),
        langs.map(l => sum(s"__lp_$l").as(s"__s_$l")): _*)
    val best = greatest(langs.map(l =>
      struct(col(s"__s_$l").as("score"), lit(l).as("lang"))): _*)
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        when(col("n_trigrams").isNull, lit("und"))
          .otherwise(best.getField("lang")).as("lang_pred"))
  }

  /**
   * Fused serving form of [[scoreLangId]] — same output, one kernel
   * projection instead of the explode → broadcast join → rollup
   * subtree. A profiled gram's quantized log-probability contribution
   * is a pure function of the PROFILE (not the scored document), so it
   * is computed ONCE per gram — in Spark, with the very Column
   * expressions [[scoreLangId]] evaluates per scored row, so the
   * collected table is bit-for-bit the per-row values and the oracle
   * replay argument transfers unchanged — then looked up per scored
   * trigram by a one-pass native kernel
   * ([[graft.plans.Native.langIdScore]]: binary search over the sorted
   * key table, miss row = the Laplace background shared by every
   * unprofiled gram). Equality with [[scoreLangId]] is spec-pinned.
   *
   * Scale: the collect is bounded by the trigram SPACE (|charset|³ —
   * constant in corpus size; the same bound that lets [[scoreLangId]]
   * broadcast the profile), and the scored pass is a shuffle-free
   * codegen projection — the per-doc rollup aggregation disappears
   * entirely.
   */
  def scoreLangIdFused(docs: DataFrame, profile: DataFrame,
      langs: Seq[String], idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val st = langIdScoreCol(profile, langs, textCol)
    val best = greatest(langs.map(l =>
      struct(col(s"__st").getField(s"s_$l").as("score"), lit(l).as("lang"))): _*)
    docs.select(col(idCol), st.as("__st"))
      .select(col(idCol),
        col("__st").getField("n_trigrams").as("n_trigrams"),
        when(col("__st").getField("n_trigrams") === 0L, lit("und"))
          .otherwise(best.getField("lang")).as("lang_pred"))
  }

  /**
   * Language-ID confidence margin — the fused scorer's struct read a
   * second way: `margin9 = best − second-best` summed grid log-prob
   * (exact long subtraction). A small margin marks the
   * ambiguous-language documents a curation pass routes to review or
   * drops; `und` rows (no trigrams) carry a NULL margin. Same
   * shuffle-free projection as [[scoreLangIdFused]].
   */
  def scoreLangIdMargin(docs: DataFrame, profile: DataFrame,
      langs: Seq[String], idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val st = langIdScoreCol(profile, langs, textCol)
    val best = greatest(langs.map(l =>
      struct(col(s"__st").getField(s"s_$l").as("score"), lit(l).as("lang"))): _*)
    val sorted = array_sort(array(langs.map(l =>
      col("__st").getField(s"s_$l")): _*))
    docs.select(col(idCol), st.as("__st"))
      .select(col(idCol),
        col("__st").getField("n_trigrams").as("n_trigrams"),
        when(col("__st").getField("n_trigrams") === 0L, lit("und"))
          .otherwise(best.getField("lang")).as("lang_pred"),
        when(col("__st").getField("n_trigrams") === 0L,
          lit(null).cast("long"))
          .otherwise(element_at(sorted, langs.length) -
            element_at(sorted, langs.length - 1)).as("margin9"))
  }

  /** The fused per-document score struct (n_trigrams + per-lang grid
    * log-prob sums) shared by [[scoreLangIdFused]] and
    * [[scoreLangIdMargin]] — one construction of the lookup-kernel
    * contribution table, so the two readers cannot drift. */
  private def langIdScoreCol(profile: DataFrame, langs: Seq[String],
      textCol: String): Column = {
    require(langs.nonEmpty, "langs must be non-empty")
    val totRow = profile.agg(
      sum(col(s"__c_${langs.head}")).as(s"__t_${langs.head}"),
      langs.tail.map(l => sum(col(s"__c_$l")).as(s"__t_$l")) :+
        count(lit(1)).as("__v"): _*).collect()(0)
    val tOf = langs.indices.map(i => langs(i) -> totRow.getLong(i)).toMap
    val v = totRow.getLong(langs.length)
    val tTot = langs.map(tOf).sum
    // identical arithmetic shape to scoreLangId's per-row columns,
    // with the training totals as folded literals
    val cTot = langs.map(l => coalesce(col(s"__c_$l"), lit(0L))).reduce(_ + _)
    val background = (cTot + lit(1L)) / (lit(tTot) + lit(v))
    val contribCols = langs.map { l =>
      val inLang =
        if (tOf(l) > 0) coalesce(col(s"__c_$l"), lit(0L)) / lit(tOf(l))
        else lit(0.0)
      round(log(lit(LangIdLambda) * inLang +
        lit(1.0 - LangIdLambda) * background) * lit(1e9))
        .cast("long").as(s"__lp_$l")
    }
    val spark = profile.sparkSession
    val rows = profile.select(col("__kg") +: contribCols: _*)
      .collect().sortBy(_.getLong(0))
    val keys = rows.map(_.getLong(0)).toSeq
    val contribs = rows.flatMap(r => langs.indices.map(i => r.getLong(i + 1))).toSeq
    // the miss contribution = the same expressions over an all-null
    // count row (what scoreLangId's left-join miss produces)
    val miss = spark.range(1)
      .select(langs.map(l => lit(null).cast("long").as(s"__c_$l")): _*)
      .select(contribCols: _*).collect()(0)
    val missSeq = langs.indices.map(miss.getLong(_))
    graft.plans.NativeFunctions.langIdScore(col(textCol), langs,
      keys, contribs, missSeq)
  }

  /** Train-and-score in one call: [[langIdProfile]] + [[scoreLangId]].
    * The one-shot convenience; serving paths use
    * [[ensureLangIdProfile]] so training runs once, not per query. */
  def langIdTrigram(docs: DataFrame, train: DataFrame, langs: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      labelCol: String = "lang"): DataFrame =
    scoreLangId(docs, langIdProfile(train, langs, textCol, labelCol),
      langs, idCol, textCol)

  /**
   * Okapi BM25 relevance of a constant query against the corpus — the
   * retrieval primitive of training-data curation (pull the documents
   * most relevant to a benchmark topic for inspection, targeted
   * upsampling, or decontamination review). Lucene's +1-inside-the-log
   * idf keeps every contribution positive:
   *
   *   idf(t)   = ln((N − df + 0.5) / (df + 0.5) + 1)
   *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   *
   * Per-(doc, term) contributions are snapped to the 1e-9 integer grid
   * BEFORE summing (long addition is exact and order-independent — the
   * [[unigramLogProb]] trick), so the score replays exactly in the SQL
   * oracle; `avgdl` is `sum(dl)/N` on exact integer aggregates (one
   * double division), never a float `avg`. Returns the top `k` docs as
   * `(idCol, score_u9, score)`, ties broken by id.
   *
   * Shape at scale: the token explode is filtered to the |Q| query
   * terms BEFORE the shuffle, so the tf frame carries only matching
   * rows; df re-aggregates that frame (≤ |Q| rows, broadcast back);
   * N/avgdl are one scalar aggregate broadcast into the score
   * projection; per-doc lengths join on the id (corpus-sized — left to
   * AQE, never a driver-side broadcast); top-k is TakeOrdered, not a
   * global sort.
   */
  def bm25TopK(df: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, "k must be positive")
    val toks = tokens(col(textCol))
    val dl = df.select(col(idCol), size(toks).cast("long").as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"),
      (sum("__dl") / count(lit(1))).as("__avgdl"))
    val tf = df.select(col(idCol), explode(toks).as("term"))
      .where(col("term").isInCollection(queryTerms))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val denom = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl"))
    val contribU9 = round(idf * (col("tf") * lit(k1 + 1.0)) / denom * lit(1e9))
      .cast("long")
    tf.join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol), contribU9.as("__u9"))
      .groupBy(col(idCol)).agg(sum("__u9").as("score_u9"))
      .select(col(idCol), col("score_u9"),
        (col("score_u9") / lit(1e9)).as("score"))
      .orderBy(col("score_u9").desc, col(idCol))
      .limit(k)
  }

  /**
   * Multinomial Naive Bayes text classifier — the fastText-adjacent
   * linear quality/domain classifier every production curation stack
   * carries (CCNet's lang filter, GPT-3's WebText-vs-CommonCrawl
   * quality model are this shape): train per-label token counts on
   * `train`, score every document of `docs` under every label,
   *
   *   score(L) = ln(docs_L / docs_train)
   *            + Σ_tokens ln((c(L, w) + 1) / (T_L + V))
   *
   * (Laplace-smoothed multinomial likelihood + doc-count prior), and
   * predict the argmax with ties broken to the lexicographically
   * smallest label. Every term snaps to the 1e-9 integer grid BEFORE
   * its per-(doc, label) sum ([[unigramLogProb]]'s trick), so the
   * winning label is decided by exact long comparisons and replays
   * bit-identically in the oracle. Token-less documents have no
   * likelihood positions and are absent ([[bigramLogProb]]'s
   * under-length rule). Returns `(idCol, actual, predicted, best_lp9,
   * correct)` with `correct` 0/1.
   *
   * Shape at scale: train counts aggregate map-side on (label, hashed
   * token) — 8-byte keys, no string crosses a shuffle; the per-label
   * stats (|labels| rows) and the (V, N) scalar broadcast; scoring is
   * the position frame × |labels| fan-out joined against the count
   * table, then two narrow aggregates. Linear in tokens × labels.
   */
  def naiveBayes(docs: DataFrame, train: DataFrame,
      labelCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val trainToks = train
      .select(col(labelCol).as("__lbl"), explode(tokens(col(textCol))).as("__w"))
      .select(col("__lbl"), xxhash64(col("__w")).as("__kw"))
    val counts = trainToks.groupBy("__lbl", "__kw").agg(count(lit(1)).as("__c"))
    val labelStats = trainToks.groupBy("__lbl").agg(count(lit(1)).as("__t"))
      .join(train.groupBy(col(labelCol).as("__lbl"))
        .agg(count(lit(1)).as("__nd")), Seq("__lbl"))
    val scalars = trainToks.agg(countDistinct("__kw").as("__v"))
      .crossJoin(train.agg(count(lit(1)).as("__ntr")))
    val positions = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("__w"))
      .select(col(idCol), xxhash64(col("__w")).as("__kw"))
    val lik9 = round(log((coalesce(col("__c"), lit(0L)) + lit(1L)) /
      (col("__t") + col("__v"))) * lit(1e9)).cast("long")
    val prior9 = round(log(col("__nd") / col("__ntr")) * lit(1e9)).cast("long")
    val scored = positions
      .crossJoin(broadcast(labelStats.select("__lbl", "__t")))
      .join(counts, Seq("__lbl", "__kw"), "left")
      .crossJoin(broadcast(scalars))
      .select(col(idCol), col("__lbl"), lik9.as("__l9"))
      .groupBy(col(idCol), col("__lbl"))
      .agg(sum("__l9").as("__s9"))
      .join(broadcast(labelStats.select("__lbl", "__nd")), Seq("__lbl"))
      .crossJoin(broadcast(scalars.select("__ntr")))
      .select(col(idCol), col("__lbl"), (col("__s9") + prior9).as("__sc9"))
    // argmax via min(struct(-score, label)): largest score, then the
    // lexicographically smallest label on exact-long ties
    scored
      .groupBy(col(idCol))
      .agg(min(struct((-col("__sc9")).as("__neg"), col("__lbl"))).as("__best"))
      .select(col(idCol), col("__best.__lbl").as("predicted"),
        (-col("__best.__neg")).as("best_lp9"))
      .join(docs.select(col(idCol), col(labelCol).as("actual")), Seq(idCol))
      .select(col(idCol), col("actual"), col("predicted"), col("best_lp9"),
        when(col("actual") === col("predicted"), 1).otherwise(0).as("correct"))
  }

  /**
   * Serving-side Naive Bayes — [[naiveBayes]]'s semantics as ONE fused
   * projection (the `scoreLangIdFused` posture): the training half
   * aggregates per-(token, label) counts once, folds every profiled
   * token's per-label 1e-9-grid contribution into a sorted key table
   * (computed BY Spark expressions, so the grid math cannot drift from
   * the DataFrame formulation), and scoring + argmax run inside
   * [[graft.plans.Native.nbPredict]] — no position explode, no
   * |labels|-way fan-out join, no scoring shuffle at all. The collect
   * is bounded by train vocabulary × |labels| (the langid-profile
   * bound); the scored side is a stateless projection usable on a
   * stream unchanged.
   *
   * Key family is the md5-prefix 60-bit key rather than
   * [[naiveBayes]]'s xxhash64 — same 2^-64-collision equivalence class
   * (the oracle joins the token strings themselves); ExtSpec pins
   * fused ≡ DataFrame on constructed corpora including exact ties.
   */
  /** `hashDims > 0` switches to the HASHED vocabulary (fastText's
    * bucket trick): tokens fold into `hashDims` md5 buckets before
    * counting and scoring, so the plan-time table is `hashDims ×
    * labels` longs BY CONSTRUCTION — the 100 TB posture, where the
    * exact vocabulary is unbounded. Semantics are standard multinomial
    * NB over bucket ids (V = distinct OCCUPIED buckets); with
    * `hashDims` far above the vocabulary the two variants coincide
    * exactly (spec-pinned). */
  def naiveBayesFused(docs: DataFrame, train: DataFrame,
      labelCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text", hashDims: Int = 0): DataFrame = {
    val (labels, st) = nbModel(train, labelCol, textCol, hashDims)
    docs.select(col(idCol), col(labelCol).as("actual"), st.as("__p"))
      .where(col("__p.n_tokens") > 0)
      .select(col(idCol), col("actual"),
        element_at(typedlit(labels), col("__p.best_idx") + lit(1)).as("predicted"),
        col("__p.best_lp9").as("best_lp9"))
      .withColumn("correct",
        when(col("actual") === col("predicted"), 1).otherwise(0))
  }

  /** Train-once model builder shared by [[naiveBayesFused]] and
    * [[naiveBayesMargin]]: the sorted label list plus the fused
    * per-document prediction struct column. */
  private def nbModel(train: DataFrame, labelCol: String, textCol: String,
      hashDims: Int): (Seq[String], Column) = {
    val spark = train.sparkSession
    // one job for labels + doc priors (ntr = Σ per-label doc counts)
    val ndRow = train.groupBy(col(labelCol).cast("string").as("__lbl"))
      .agg(count(lit(1)).as("__nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(ndRow.nonEmpty, "train must hold at least one label")
    val labels = ndRow.keys.toSeq.sorted
    val ntr = ndRow.values.sum
    // ONE token explode feeds the one (vocab × labels) pivot; token
    // totals and the vocabulary size both roll up from the pivot, so
    // training costs exactly two aggregation jobs, not five
    val rawKey = Dedup.md5Key(col("__w"))
    val key = if (hashDims > 0) rawKey % lit(hashDims.toLong) else rawKey
    val prof = train
      .select(col(labelCol).as("__lbl"), explode(tokens(col(textCol))).as("__w"))
      .select(col("__lbl"), key.as("__kw"))
      .groupBy("__kw").pivot("__lbl", labels).count()
      .localCheckpoint()
    val totRow = prof.agg(
      coalesce(sum(col(s"`${labels.head}`")), lit(0L)).as("t0"),
      labels.tail.map(l => coalesce(sum(col(s"`$l`")), lit(0L)).as(s"t_$l")) :+
        count(lit(1)).as("__v"): _*).collect()(0)
    val tOf = labels.indices.map(i => labels(i) -> totRow.getLong(i)).toMap
    val v = totRow.getLong(labels.length)
    // per-label contribution of a count column c: the EXACT expression
    // of [[naiveBayes]]'s lik9, evaluated by Spark so rounding agrees
    def contribCols = labels.map { l =>
      round(log((coalesce(col(s"`$l`"), lit(0L)) + lit(1L)) /
        (lit(tOf(l)) + lit(v))) * lit(1e9)).cast("long").as(s"__lp_$l")
    }
    val rows = prof.select(col("__kw") +: contribCols: _*)
      .collect().sortBy(_.getLong(0))
    val keys = rows.map(_.getLong(0)).toSeq
    val contribs = rows.flatMap(r => labels.indices.map(i => r.getLong(i + 1))).toSeq
    val missRow = spark.range(1)
      .select(labels.map(l => lit(null).cast("long").as(l)): _*)
      .select(contribCols: _*).collect()(0)
    val miss = labels.indices.map(missRow.getLong(_))
    val priorRow = spark.range(1).select(labels.map(l =>
      round(log(lit(ndRow(l)) / lit(ntr)) * lit(1e9)).cast("long").as(l)): _*)
      .collect()(0)
    val prior = labels.indices.map(priorRow.getLong(_))
    val st = graft.plans.NativeFunctions.nbPredict(col(textCol),
      keys, contribs, miss, prior, hashDims)
    (labels, st)
  }

  /**
   * NB confidence margin — [[naiveBayesFused]]'s score struct read
   * with the runner-up: `margin9 = best_lp9 − second_lp9` (exact long
   * subtraction; 0 on a top-score tie). The reject-option knob of a
   * curation classifier: route small-margin documents to review
   * instead of trusting the argmax. Same training tables, same
   * shuffle-free scored projection.
   */
  def naiveBayesMargin(docs: DataFrame, train: DataFrame,
      labelCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text", hashDims: Int = 0): DataFrame = {
    val (labels, st) = nbModel(train, labelCol, textCol, hashDims)
    docs.select(col(idCol), st.as("__p"))
      .where(col("__p.n_tokens") > 0)
      .select(col(idCol),
        element_at(typedlit(labels), col("__p.best_idx") + lit(1)).as("predicted"),
        col("__p.best_lp9").as("best_lp9"),
        col("__p.second_lp9").as("second_lp9"),
        (col("__p.best_lp9") - col("__p.second_lp9")).as("margin9"))
  }

  /**
   * Feature-hashing (hashing-trick) vectorizer summary — the input
   * side of every linear text model at scale (Weinberger et al.;
   * fastText's bucket hashing): tokens hash into `dims` buckets via
   * the md5-prefix key family, and each document reports its count
   * vector's (nnz, ‖v‖², max_count, argmax_dim) — all integers, so
   * the whole row replays exactly in the oracle. One codegen'd
   * projection ([[graft.plans.Native.hashFeatureStats]]): the vector
   * never materializes, nothing shuffles, and the same kernel scores
   * a stream unchanged (the [[graft.plans.Native.dsirScore]] posture).
   */
  def hashFeatures(docs: DataFrame, dims: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        graft.plans.NativeFunctions.hashFeatureStats(col(textCol), dims).as("__hf"))
      .select(col(idCol), col("__hf.nnz").as("nnz"),
        col("__hf.norm_sq").as("norm_sq"),
        col("__hf.max_count").as("max_count"),
        col("__hf.argmax_dim").as("argmax_dim"))

  /**
   * Hashed bag-of-words count rows `(idCol, dim, c)` — the sparse
   * feature frame behind [[logisticTrain]]: every token maps to
   * `md5-60-bit % dims` (the [[graft.functions.Rng]] cross-engine hash
   * family, so the feature construction replays verbatim in DuckDB),
   * counts are exact longs. One explode + one aggregation; tokenless
   * documents contribute no rows (their feature vector is zero).
   */
  def hashedCountRows(docs: DataFrame, dims: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .select(col(idCol),
        (conv(substring(md5(col("__tok")), 1, 15), 16, 10).cast("long")
          % dims).as("dim"))
      .groupBy(col(idCol), col("dim"))
      .agg(count(lit(1)).as("c"))

  /** [[hashedCountRows]] plus a constant BIAS feature at index `dims`
    * for every document (tokenless ones included) — a linear model
    * over all-positive counts without an intercept can only draw
    * boundaries through the origin, which no count threshold
    * ("n_tokens ≥ 20") lies on. */
  def logisticFeatures(docs: DataFrame, dims: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    hashedCountRows(docs, dims, idCol, textCol).union(
      docs.select(col(idCol), lit(dims.toLong).as("dim"), lit(1L).as("c")))

  /**
   * Distributed logistic regression on hashed bag-of-words counts with
   * BIT-EXACT cross-engine training — the trainable quality/language
   * classifier next to the counting [[naiveBayes]]. Full-batch
   * gradient descent, `iters` steps from w = 0, entirely on the 1e-9
   * integer grid:
   *
   *   z9_i   = Σ_d w9_d · c_{i,d}                 (exact long sum)
   *   σ9_i   = round(1e9 / (1 + e^{-z9_i/1e9}))   (ONE double expr)
   *   g9_d   = Σ_i (σ9_i − y_i·1e9) · c_{i,d}     (exact long sum)
   *   w9_d  −= roundAway(lr · g9_d / n)           (driver, exact ints in/out)
   *
   * Every cross-row reduction is an integer sum (order-independent
   * under any partitioning); the only floating point is the σ
   * expression and the step size, both single shared-shape expressions
   * that DuckDB replays identically (same rationale as the NB/BM25
   * `ln` grids) — so the learned weights are bit-identical in both
   * engines (`x_logreg_weights`).
   *
   * Shape at scale: the feature frame is checkpointed once; each
   * iteration is one aggregate per doc (z), one broadcast-sized join
   * back, one aggregate per dim (gradient, `dims` rows collected). The
   * model is `dims` longs on the driver — the Lloyd-trainer posture.
   */
  def logisticTrain(docs: DataFrame, label: Column, dims: Int = 64,
      iters: Int = 20, lr: Double = 0.8, idCol: String = "doc_id",
      textCol: String = "text"): Array[Long] = {
    require(dims > 0 && iters >= 0, "dims must be positive, iters >= 0")
    val feat = logisticFeatures(docs, dims, idCol, textCol).localCheckpoint()
    val lab = docs.select(col(idCol), label.cast("int").as("__y"))
      .localCheckpoint()
    val n = lab.count()
    // DuckDB round() is half-AWAY-from-zero; Scala math.round is
    // half-up (differs on negative ties) — mirror the SQL exactly
    def roundAway(x: Double): Long =
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    var w9 = Array.fill(dims + 1)(0L) // + the bias slot at index dims
    var it = 0
    while (it < iters) {
      val wArr = array(w9.map(lit): _*)
      val z = feat
        .withColumn("__w9", element_at(wArr, col("dim").cast("int") + 1))
        .groupBy(col(idCol)).agg(sum(col("__w9") * col("c")).as("z9"))
      val s = lab.join(z, Seq(idCol), "left")
        .select(col(idCol), col("__y"),
          round(lit(1e9) / (lit(1.0) +
            exp(-(coalesce(col("z9"), lit(0L)).cast("double") / lit(1e9)))))
            .cast("long").as("s9"))
      val g = feat.join(s, Seq(idCol))
        .groupBy("dim")
        .agg(sum((col("s9") - col("__y").cast("long") * lit(1000000000L)) *
          col("c")).as("g9"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      w9 = w9.zipWithIndex.map { case (w, d) =>
        w - roundAway(lr * g.getOrElse(d.toLong, 0L).toDouble / n)
      }
      it += 1
    }
    w9
  }

  /**
   * nDCG@k ranking evaluation of BM25 retrieval — the eval half of the
   * retrieval-based curation loop ([[bm25TopK]] is the serving half):
   * for each query, rank documents by the BM25 score ([[bm25TopK]]'s
   * exact grid arithmetic; ties by id), grade relevance as the number
   * of DISTINCT query terms the document contains, and report
   *
   *   DCG@k  = Σ_{i≤k} round(rel_i / log2(i+1) · 1e9)   (BM25 order)
   *   IDCG@k = the same sum in ideal (relevance-descending) order
   *   nDCG@k = DCG/IDCG
   *
   * Per-position gains snap to the 1e-9 grid before the sum, and both
   * orderings break ties deterministically (score desc then id; rel
   * desc then id), so both engines sum the identical gain multiset.
   * Only documents matching ≥1 query term participate (rel-0 rows add
   * nothing to either sum).
   *
   * Shape at scale: one token explode filtered to the query-term set
   * (tiny), per-(query, doc) tf/rel aggregates, the df/length stats
   * broadcast, and two per-query top-k windows over candidate docs —
   * partitioned by query, never a global sort.
   */
  /** Per-(query, candidate-doc) BM25 grid scores + term-overlap
    * relevance — the shared candidate frame of [[ndcgAtK]] and
    * [[mrrOf]] (one definition, the eval metrics cannot drift apart).
    * Candidates are documents matching ≥1 query term. */
  private def bm25QueryCandidates(docs: DataFrame,
      queries: Seq[(Int, Seq[String])], k1: Double, b: Double,
      idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qdf = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val allTerms = queries.flatMap(_._2).distinct
    val toks = tokens(col(textCol))
    val dl = docs.select(col(idCol), size(toks).cast("long").as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"),
      (sum("__dl") / count(lit(1))).as("__avgdl"))
    val tf = docs.select(col(idCol), explode(toks).as("term"))
      .where(col("term").isInCollection(allTerms))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val denom = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl"))
    val contribU9 = round(idf * (col("tf") * lit(k1 + 1.0)) / denom * lit(1e9))
      .cast("long")
    tf.join(broadcast(qdf), "term")
      .join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col(idCol), col("term"), contribU9.as("__u9"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum("__u9").as("__score9"), countDistinct("term").as("__rel"))
  }

  def ndcgAtK(docs: DataFrame, queries: Seq[(Int, Seq[String])], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val perQueryDoc = bm25QueryCandidates(docs, queries, k1, b, idCol, textCol)
    val wBm = Window.partitionBy("query_id")
      .orderBy(col("__score9").desc, col(idCol))
    val wIdeal = Window.partitionBy("query_id")
      .orderBy(col("__rel").desc, col(idCol))
    def gain9(rank: Column): Column =
      round(col("__rel") / (log(rank + lit(1.0)) / lit(math.log(2.0))) * lit(1e9))
        .cast("long")
    val dcg = perQueryDoc.withColumn("__rk", row_number().over(wBm))
      .where(col("__rk") <= k)
      .groupBy("query_id").agg(sum(gain9(col("__rk"))).as("dcg_u9"))
    val idcg = perQueryDoc.withColumn("__rk", row_number().over(wIdeal))
      .where(col("__rk") <= k)
      .groupBy("query_id").agg(sum(gain9(col("__rk"))).as("idcg_u9"))
    dcg.join(idcg, "query_id")
      .select(col("query_id"), col("dcg_u9"), col("idcg_u9"),
        (col("dcg_u9").cast("double") / col("idcg_u9")).as("ndcg"))
  }

  /**
   * Mean-reciprocal-rank inputs — nDCG's companion metric for
   * known-item retrieval: per query, the BM25 rank (score desc, id
   * ties — [[ndcgAtK]]'s exact ordering over the SAME candidate
   * frame) of the first FULLY relevant document (one containing every
   * query term), and its reciprocal on the 1e-9 grid (`rr_u9 = 0` and
   * NULL rank when no document matches all terms). Averaging `rr_u9`
   * over queries gives MRR; the per-query rows are kept so the oracle
   * hash-checks the ranks themselves, not just the mean.
   */
  def mrrOf(docs: DataFrame, queries: Seq[(Int, Seq[String])],
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val nt = queries.map { case (q, ts) => (q, ts.distinct.size.toLong) }
      .toDF("query_id", "__nt")
    val w = Window.partitionBy("query_id")
      .orderBy(col("__score9").desc, col(idCol))
    val firsts = bm25QueryCandidates(docs, queries, k1, b, idCol, textCol)
      .withColumn("__rk", row_number().over(w))
      .join(broadcast(nt), "query_id")
      .where(col("__rel") === col("__nt"))
      .groupBy("query_id").agg(min("__rk").cast("long").as("first_rank"))
    nt.join(firsts, Seq("query_id"), "left")
      .select(col("query_id"), col("first_rank"),
        coalesce(round(lit(1e9) / col("first_rank")).cast("long"), lit(0L))
          .as("rr_u9"))
  }

  /**
   * Recall@k — the third leg of the retrieval-eval family
   * ([[ndcgAtK]] ranks quality, [[mrrOf]] first-hit position, this
   * one coverage): per query, how many of the fully relevant
   * documents (those containing every query term) the BM25 top-`k`
   * retrieves, over the SAME candidate frame and the same
   * deterministic ordering. Returns `(query_id, n_relevant,
   * n_retrieved, recall)`; recall is the exact ratio of the two longs
   * (NULL when the query has no fully relevant document).
   */
  def recallAtK(docs: DataFrame, queries: Seq[(Int, Seq[String])],
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val nt = queries.map { case (q, ts) => (q, ts.distinct.size.toLong) }
      .toDF("query_id", "__nt")
    val w = Window.partitionBy("query_id")
      .orderBy(col("__score9").desc, col(idCol))
    val flagged = bm25QueryCandidates(docs, queries, k1, b, idCol, textCol)
      .withColumn("__rk", row_number().over(w))
      .join(broadcast(nt), "query_id")
      .where(col("__rel") === col("__nt"))
    val agg = flagged.groupBy("query_id").agg(
      count(lit(1)).as("n_relevant"),
      sum(when(col("__rk") <= k, 1L).otherwise(0L)).as("n_retrieved"))
    nt.join(agg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
        (col("n_retrieved").cast("double") / col("n_relevant")).as("recall"))
  }

  /**
   * Average precision at `k` — the fourth retrieval-eval leg
   * ([[ndcgAtK]] graded quality, [[mrrOf]] first hit, [[recallAtK]]
   * coverage; this one ranks ALL hits): per query,
   * `AP@k = (Σ_{relevant hit at rank r ≤ k} precision@r) / min(R, k)`
   * with R the total fully relevant count (every query term present)
   * and precision@r the relevant fraction of the top r. Averaging
   * `ap` over queries gives MAP. Same BM25 candidate frame and
   * deterministic (score desc, id) ordering as the other three, so
   * the metrics cannot drift apart.
   *
   * Exactness: each precision@r is `round(1e9·cum/r)` — a long on the
   * 1e-9 grid — and their SUM is exact long arithmetic, order-free
   * across partitions; the single double division happens once at the
   * end. `(query_id, n_relevant, sum_prec_u9, ap)`; zero row when the
   * query has no fully relevant document (ap NULL, sums 0).
   */
  def apAtK(docs: DataFrame, queries: Seq[(Int, Seq[String])],
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val nt = queries.map { case (q, ts) => (q, ts.distinct.size.toLong) }
      .toDF("query_id", "__nt")
    val w = Window.partitionBy("query_id")
      .orderBy(col("__score9").desc, col(idCol))
    // relevant docs only, still carrying their rank in the FULL
    // candidate ordering; the i-th relevant doc (by rank) has
    // cum-relevant i at its own rank — a per-query window over the
    // relevant subset, bounded by candidates per query
    val rel = bm25QueryCandidates(docs, queries, k1, b, idCol, textCol)
      .withColumn("__rk", row_number().over(w))
      .join(broadcast(nt), "query_id")
      .where(col("__rel") === col("__nt"))
    val wCum = Window.partitionBy("query_id").orderBy("__rk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agg = rel
      .withColumn("__cum", count(lit(1)).over(wCum))
      .groupBy("query_id").agg(
        count(lit(1)).as("n_relevant"),
        sum(when(col("__rk") <= k,
          round(col("__cum") * lit(1e9) / col("__rk")).cast("long"))
          .otherwise(0L)).as("sum_prec_u9"))
    nt.join(agg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("sum_prec_u9"), lit(0L)).as("sum_prec_u9"),
        (col("sum_prec_u9").cast("double") /
          (lit(1e9) * least(col("n_relevant"), lit(k.toLong)))).as("ap"))
  }

  /**
   * Reciprocal-rank fusion (Cormack et al.) — the standard way to
   * combine rankers without score calibration: each ranker contributes
   * `1/(rrfK + rank)` and documents sort by the sum. Here the two
   * rankers are the BM25 score order and the term-coverage order (the
   * same two orderings [[ndcgAtK]] compares as DCG vs ideal), both
   * over the SHARED candidate frame, fused on the 1e-9 grid
   * (`fused9 = Σ round(1e9/(rrfK + rank))` — exact long arithmetic,
   * order-free) and cut to the top `k` per query with a deterministic
   * (fused desc, id) tiebreak. `(query_id, idCol, fused9, rank)`.
   */
  def rrfOf(docs: DataFrame, queries: Seq[(Int, Seq[String])],
      k: Int = 5, rrfK: Int = 60, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    require(k > 0 && rrfK > 0, "k and rrfK must be positive")
    import org.apache.spark.sql.expressions.Window
    val byScore = Window.partitionBy("query_id")
      .orderBy(col("__score9").desc, col(idCol))
    val byRel = Window.partitionBy("query_id")
      .orderBy(col("__rel").desc, col(idCol))
    def contrib(rank: Column): Column =
      round(lit(1e9) / (lit(rrfK) + rank)).cast("long")
    val wFused = Window.partitionBy("query_id")
      .orderBy(col("fused9").desc, col(idCol))
    bm25QueryCandidates(docs, queries, k1, b, idCol, textCol)
      .withColumn("fused9",
        contrib(row_number().over(byScore)) + contrib(row_number().over(byRel)))
      .withColumn("rank", row_number().over(wFused))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("fused9"), col("rank"))
  }

  /**
   * MATTR — moving-average type-token ratio (Covington & McFall
   * 2010), the length-robust lexical-diversity score: raw TTR
   * (distinct/total tokens) collapses as documents grow (Heaps' law),
   * so average the TTR of every `window`-token sliding window
   * instead. Repetitive boilerplate scores low at ANY length; varied
   * prose scores high. Complements [[charEntropy]] (characters) and
   * the repetition counters (verbatim runs) as the token-level
   * diversity leg of the quality suite.
   *
   * Returns `(idCol, n_tokens, n_windows, mattr)`; documents shorter
   * than `window` get one whole-document window (plain TTR), empty
   * documents a NULL mattr.
   *
   * Scale shape: a single shuffle-free projection — the fused
   * one-pass kernel ([[graft.plans.Native.mattrStats]]: sliding
   * occurrence map, O(len) per doc where the Column formulation's
   * per-window `array_distinct(slice(...))` was O(len·window) and
   * measured 2.6 s at sf0.1) emits exact long sums, so the one double
   * division at the end replays bit-identically in DuckDB regardless
   * of evaluation order.
   */
  def mattr(docs: DataFrame, window: Int = 50, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(window > 0, "window must be positive")
    docs.select(col(idCol),
        graft.plans.NativeFunctions.mattrStats(col(textCol), window).as("__m"))
      .select(col(idCol), col("__m.n_tokens").as("n_tokens"),
        col("__m.n_windows").as("n_windows"),
        col("__m.sum_distinct").as("__sd"))
      .select(col(idCol), col("n_tokens"), col("n_windows"),
        // explicit empty-doc guard: NULL, matching the oracle's
        // divide-by-zero→NULL (ANSI Spark would otherwise throw)
        when(col("n_tokens") > 0,
          col("__sd").cast("double") /
            (col("n_windows") * least(lit(window.toLong), col("n_tokens"))))
          .as("mattr"))
  }

  /**
   * CCNet-style perplexity bucketing: score every document under the
   * [[bigramLogProb]] LM (trained on `train`), then split each
   * `partitionCol` stratum into `nBuckets` equal-frequency buckets by
   * LM fit — bucket 1 ("head") is the best-fitting (highest average
   * log-prob = lowest perplexity) tercile, "tail" the worst, exactly
   * the head/middle/tail split CCNet (Wenzek et al. 2020) uses to
   * keep/downsample/drop web text. Returns
   * `(idCol, partitionCol, n_bigrams, avg_logprob, bucket)` for every
   * document with at least one bigram (shorter docs have no LM score,
   * [[bigramLogProb]] semantics).
   *
   * The split is `ntile(nBuckets)` over (avg_logprob DESC, id ASC) —
   * both engines implement SQL NTILE identically (first `n % buckets`
   * buckets take the extra rows), and the score doubles are
   * bit-identical by the 1e-9-grid argument, so the bucket label
   * replays exactly in the oracle.
   *
   * Shape at scale: the window partitions by the stratum column —
   * CCNet buckets per language for exactly this reason — so no
   * single-partition global sort exists; each stratum sorts within
   * its shuffle partition. A stratum is assumed executor-sized
   * (languages/domains at 100 TB are many and individually bounded);
   * a degenerate single-stratum corpus would need the two-phase
   * range-partitioned rank instead.
   */
  def pplBuckets(docs: DataFrame, train: DataFrame, nBuckets: Int = 3,
      partitionCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text", alpha: Double = 0.4): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be at least 2")
    import org.apache.spark.sql.expressions.Window
    val lp = bigramLogProb(docs, train, alpha, idCol, textCol)
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(col("avg_logprob").desc, col(idCol).asc)
    lp.join(docs.select(col(idCol), col(partitionCol)), Seq(idCol))
      .withColumn("__nt", ntile(nBuckets).over(w))
      .withColumn("bucket",
        when(col("__nt") === 1, lit("head"))
          .when(col("__nt") === nBuckets, lit("tail"))
          .otherwise(lit("middle")))
      .select(col(idCol), col(partitionCol), col("n_bigrams"),
        col("avg_logprob"), col("bucket"))
  }

  /** Codegen word-n-gram explode: `(idCol, gram)` rows via the
    * arrays_zip-of-shifted-slices formulation (no interpreted
    * `transform` lambda — the [[wordNgrams]] scaladoc's prescription,
    * generalized from the bigram form in `x_ngram_topk`). Documents
    * with fewer than `n` tokens contribute no rows. */
  def gramRows(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = tokens(col(textCol))
    val cnt = greatest(size(toks) - (n - 1), lit(0))
    val zipped = arrays_zip(
      (1 to n).map(j => slice(toks, lit(j), cnt).as(s"w$j")): _*)
    df.select(col(idCol), explode(zipped).as("z"))
      .select(col(idCol),
        concat_ws(" ", (1 to n).map(j => col(s"z.w$j")): _*).as("gram"))
  }

  /** The Gopher rules' stopword list (Rae et al. 2021, table A1:
    * "must contain at least two of ..."), distinct from the
    * [[Stopwords]] scoring list. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher-style document quality rules (Rae et al. 2021, appendix
   * A1.1 — the filter suite C4/MassiveText-lineage pipelines apply
   * before dedup), computed per document as exact facets plus the
   * composite `passes` verdict. The thresholds are the published
   * defaults; all facets are ratios of exact integer counts (single
   * double division each), so every comparison replays bit-identically
   * in the DuckDB oracle.
   *
   * Facets (over the shared lowercased whitespace tokenizer; `norm` is
   * the single-space re-joined text, the denominator for character
   * fractions):
   *  - `n_words`, `mean_word_len` — word count / mean word length.
   *  - `alpha_frac` — fraction of words containing an [a-z] character
   *    (counted on `norm` with one regex, `[^ ]*[a-z][^ ]*`: a
   *    greedy match consumes exactly the qualifying token, so no
   *    array lambda is needed; the class is spelled without `\S`
   *    because Java and RE2 disagree on `\x0B`).
   *  - `symbol_ratio` — (# of `#` + # of `...`) / words, both counted
   *    by the length-difference trick (`...` left-to-right
   *    non-overlapping in both engines).
   *  - `n_stop_kinds` — how many DISTINCT `stopwords` appear
   *    (presence via [[wordOccurrences]], the proven oracle mirror).
   *    The list is a parameter (default [[GopherStopwords]]) because
   *    the rule only discriminates over the corpus's actual
   *    function-word inventory — the synthetic test corpus's is
   *    {the, a}, under which the published "≥ 2 kinds" threshold
   *    keeps its intent.
   *  - `top_bigram_frac` — chars covered by the most frequent word
   *    bigram (count × gram length, tie toward the lexicographically
   *    smallest gram) / chars of `norm`.
   *  - `dup_5gram_frac` — chars covered by all occurrences of
   *    repeated 5-grams (Σ count × length over grams with count > 1)
   *    / chars of `norm`; overlapping occurrences are each charged,
   *    so the ratio can exceed 1 on degenerate text (documented
   *    deviation from the paper's character-attribution, which needs
   *    positional interval union — deliberately out of SQL reach).
   *
   * `passes` = words ∈ [50, 100000] ∧ mean_word_len ∈ [3, 10] ∧
   * symbol_ratio ≤ 0.1 ∧ alpha_frac ≥ 0.8 ∧ n_stop_kinds ≥ 2 ∧
   * top_bigram_frac ≤ 0.20 ∧ dup_5gram_frac ≤ 0.15.
   *
   * Shape at scale: ONE shuffle-free projection. Every facet is
   * per-document, so the original explode→group formulation's two
   * shuffles were pure overhead; the gram statistics now come from the
   * fused native kernel ([[graft.plans.Native.gopherGramStats]] — one
   * pass, doc-local hash maps, codegen call), equivalence spec-pinned
   * against the [[gramRows]] aggregation it replaced. The whole rule
   * suite runs at scan speed at any corpus size.
   */
  def gopherRules(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      stopwords: Seq[String] = GopherStopwords): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val norm = concat_ws(" ", toks)
    val nWords = size(toks).cast("long")
    val charTotal = length(norm).cast("long")
    val wordChars = charTotal - (nWords - 1)
    val alphaWords =
      size(regexp_extract_all(norm, lit("[^ ]*[a-z][^ ]*"), lit(0))).cast("long")
    val nHash = (length(norm) - length(replace(norm, lit("#"), lit("")))).cast("long")
    val nEllipsis =
      ((length(norm) - length(replace(norm, lit("..."), lit("")))) / 3).cast("long")
    val nStopKinds = stopwords
      .map(w => (wordOccurrences(t, w) > 0).cast("int"))
      .reduce(_ + _).cast("long")
    df.select(
        col(idCol),
        nWords.as("n_words"),
        charTotal.as("__chars"),
        when(nWords > 0, wordChars.cast("double") / nWords.cast("double"))
          .otherwise(lit(0.0)).as("mean_word_len"),
        when(nWords > 0, alphaWords.cast("double") / nWords.cast("double"))
          .otherwise(lit(0.0)).as("alpha_frac"),
        when(nWords > 0, (nHash + nEllipsis).cast("double") / nWords.cast("double"))
          .otherwise(lit(0.0)).as("symbol_ratio"),
        nStopKinds.as("n_stop_kinds"),
        graft.plans.NativeFunctions.gopherGramStats(t).as("__gs"))
      .select(col(idCol), col("n_words"), col("mean_word_len"),
        col("alpha_frac"), col("symbol_ratio"), col("n_stop_kinds"),
        when(col("__chars") > 0,
          (col("__gs.top2_cnt") * col("__gs.top2_len")).cast("double") /
            col("__chars").cast("double"))
          .otherwise(lit(0.0)).as("top_bigram_frac"),
        when(col("__chars") > 0,
          col("__gs.dup5_chars").cast("double") /
            col("__chars").cast("double"))
          .otherwise(lit(0.0)).as("dup_5gram_frac"))
      .withColumn("passes",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("symbol_ratio") <= 0.1 && col("alpha_frac") >= 0.8 &&
        col("n_stop_kinds") >= 2 &&
        col("top_bigram_frac") <= 0.20 && col("dup_5gram_frac") <= 0.15)
  }

  /**
   * Per-document out-of-vocabulary rate against the corpus's own
   * frequency floor: a token position is OOV when its term occurs
   * fewer than `minCount` times corpus-wide. High OOV rate flags
   * id-strings, hashes, and mojibake — the CCNet-style vocabulary
   * filter, with the corpus itself as the reference model. Documents
   * with no tokens have no positions and are absent (the
   * [[bigramLogProb]] under-threshold rule).
   *
   * One explode; the vocabulary counts aggregate THAT frame (AQE
   * reuses the exchange rather than re-exploding); the count join
   * runs on 8-byte hashed terms; everything after is per-doc longs.
   */
  def oovRate(docs: DataFrame, minCount: Long = 5L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minCount >= 1, "minCount must be at least 1")
    val toks = docs.select(col(idCol),
        explode(tokens(col(textCol))).as("__w"))
      .select(col(idCol), xxhash64(col("__w")).as("__k"))
    val vocab = toks.groupBy("__k").agg(count(lit(1)).as("__cnt"))
    toks.join(vocab, "__k")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__cnt") < minCount, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /**
   * Per-group KL divergence of each group's unigram token distribution
   * from the whole-corpus distribution — the mixture-drift diagnostic a
   * training-data pipeline runs per source/domain/language: KL ≈ 0
   * means the group reads like the corpus average, a large KL flags a
   * source whose vocabulary is off-mixture (boilerplate, another
   * language, machine text). KL(P_g ‖ P) = Σ_w p_g(w)·ln(p_g(w)/p(w))
   * over the group's vocabulary — every group term exists corpus-wide
   * (the group is a subset), so the log is total and no smoothing is
   * needed.
   *
   * Scale shape: ONE token explode, counted once per (group, hashed
   * term) — group totals AND corpus term counts both roll up from that
   * aggregated frame (never a second explode); the corpus-count join
   * runs on 8-byte hashed keys; the single-row grand total broadcasts.
   * Per-term contributions are pure functions of four longs quantized
   * to the 1e-9 grid before the order-independent sum.
   */
  def sourceKl(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(groupCol),
        explode(tokens(col(textCol))).as("__w"))
      .select(col(groupCol), xxhash64(col("__w")).as("__k"))
    val st = toks.groupBy(groupCol, "__k").agg(count(lit(1)).as("__cst"))
    val ct = st.groupBy("__k").agg(sum("__cst").as("__ct"))
    val ts = st.groupBy(groupCol).agg(sum("__cst").as("__ts"),
      count(lit(1)).as("n_terms"))
    val tot = ct.agg(sum("__ct").as("__t"))
    val p = col("__cst").cast("double") / col("__ts").cast("double")
    val q = col("__ct").cast("double") / col("__t").cast("double")
    st.join(ct, "__k")
      .join(broadcast(ts), groupCol)
      .crossJoin(broadcast(tot))
      .withColumn("__kl9", round(p * log(p / q) * lit(1e9)).cast("long"))
      .groupBy(groupCol)
      .agg(first("__ts").as("n_tokens"), first("n_terms").as("n_terms"),
        (sum("__kl9") / lit(1e9)).as("kl_divergence"))
  }

  /**
   * Zipf rank–frequency slope per group: OLS fit of ln(count) against
   * ln(rank) over the `topN` most frequent tokens — natural language
   * sits near −1; a much flatter slope flags id-like noise vocabularies
   * and a steeper one flags template text. The companion diagnostic to
   * [[vocabGrowth]] (Heaps and Zipf are the two classic corpus laws).
   *
   * The per-group top-N rank uses the bounded [[graft.operators.TopK]]
   * aggregator via [[Corpus.capPerGroup]] — never a full vocabulary
   * sort. Rank ties (equal counts) cannot move the answer: the fit
   * depends only on the multiset of (rank, count) pairs, which tie
   * order does not change — so the hash tie-break needs no cross-engine
   * agreement. Per-rank OLS terms (x, y, xy, x²) are quantized to the
   * 1e-9 grid before their order-independent long sums; the closing
   * slope/intercept arithmetic is the same IEEE expression both here
   * and in the oracle.
   */
  def zipfSlope(docs: DataFrame, groupCol: String = "lang", topN: Int = 500,
      textCol: String = "text"): DataFrame = {
    require(topN >= 2, "need at least two ranks to fit a line")
    val counts = docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("__w"))
      .groupBy(groupCol, "__w").agg(count(lit(1)).as("__cnt"))
    // the cap id must be frame-unique (capPerGroup joins rank back on
    // it): hash the (group, term) pair, not the term alone
    val ranked = Corpus.capPerGroup(
        counts.select(col(groupCol), col("__cnt").cast("double").as("score"),
          xxhash64(col(groupCol), col("__w")).as("id")),
        groupCol, "score", "id", k = topN)
      .where(col("kept"))
      .select(col(groupCol), col("rank").cast("long").as("__r"),
        col("score").cast("long").as("__cnt"))
    val lx = log(col("__r").cast("double"))
    val ly = log(col("__cnt").cast("double"))
    val g9 = (c: Column) => round(c * lit(1e9)).cast("long")
    val sums = ranked.groupBy(groupCol).agg(
      count(lit(1)).as("__n"),
      sum(g9(lx)).as("__sx"), sum(g9(ly)).as("__sy"),
      sum(g9(lx * ly)).as("__sxy"), sum(g9(lx * lx)).as("__sxx"))
    val nD = col("__n").cast("double")
    val (sx, sy, sxy, sxx) = (col("__sx").cast("double"),
      col("__sy").cast("double"), col("__sxy").cast("double"),
      col("__sxx").cast("double"))
    val slope = (nD * sxy / lit(1e9) - sx * sy / lit(1e18)) /
      (nD * sxx / lit(1e9) - sx * sx / lit(1e18))
    sums.select(col(groupCol), col("__n").as("n_ranks"), slope.as("slope"),
      ((sy / lit(1e9) - slope * (sx / lit(1e9))) / nD).as("intercept"))
  }

  /**
   * Top-k PMI collocations: pointwise mutual information
   * ln(p(w₁w₂) / (p(w₁)·p(w₂))) over corpus bigrams with at least
   * `minCount` occurrences — the classic collocation extractor
   * ("multi-word expressions score high, chance co-occurrences score
   * ~0"); the frequency floor removes the rare-pair PMI bias. Bigram
   * probability is count/total-bigrams, unigram count/total-tokens.
   *
   * One bigram explode + one token explode, both aggregated map-side;
   * the two unigram joins run against the aggregated vocabulary frame;
   * the totals broadcast; top-k is TakeOrderedAndProject on the
   * grid-quantized score (never a full sort), ties broken by the gram
   * strings.
   */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5L, k: Int = 50,
      textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val n1 = greatest(size(toks) - 1, lit(0))
    val big = docs.select(explode(arrays_zip(
        slice(toks, lit(1), n1).as("w1"),
        slice(toks, lit(2), n1).as("w2"))).as("z"))
      .select(col("z.w1").as("w1"), col("z.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    val uni = docs.select(explode(toks).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__cu"))
    val totB = big.agg(sum("n").as("__tb"))
    val totU = uni.agg(sum("__cu").as("__tu"))
    val pB = col("n").cast("double") / col("__tb").cast("double")
    val pU1 = col("__c1").cast("double") / col("__tu").cast("double")
    val pU2 = col("__c2").cast("double") / col("__tu").cast("double")
    big.where(col("n") >= minCount)
      .join(uni.select(col("__w").as("w1"), col("__cu").as("__c1")), "w1")
      .join(uni.select(col("__w").as("w2"), col("__cu").as("__c2")), "w2")
      .crossJoin(broadcast(totB)).crossJoin(broadcast(totU))
      .withColumn("__pmi9", round(log(pB / (pU1 * pU2)) * lit(1e9)).cast("long"))
      .orderBy(col("__pmi9").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("n"),
        (col("__pmi9") / lit(1e9)).as("pmi"))
  }

  /**
   * Heaps-law vocabulary-growth curve: cumulative token mass vs
   * cumulative distinct vocabulary at every `step`-document checkpoint
   * of the id order — the corpus-health plot that shows whether new
   * data still brings new vocabulary (sub-linear growth ⇒ healthy
   * natural text; a flat curve ⇒ the corpus is saturating, near-linear
   * ⇒ id-like noise tokens).
   *
   * No global sort and no corpus-sized window anywhere: "first time
   * the vocabulary sees term t" is `min(checkpoint)` per TERM (a
   * map-side-combined aggregation), collapsed to per-checkpoint
   * new-term counts, and the running sums then run over the
   * N/step-row checkpoint frame — the bounded-band discipline of
   * `Corpus.selectToBudget`. Choose `step` so N/step stays a
   * plot-sized frame (it IS a plot).
   *
   * Returns `(checkpoint, n_tok, n_new, tokens_cum, vocab_cum)`; a
   * checkpoint whose documents contribute no tokens at all (every doc
   * empty) is absent from both sides, like an empty group.
   */
  def vocabGrowth(docs: DataFrame, step: Long = 50L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(step > 0, "step must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
      explode(tokens(col(textCol))).as("__term"))
    val ck = ((floor(col(idCol) / step) + 1) * step).as("checkpoint")
    val mass = toks.groupBy(ck).agg(count(lit(1)).as("n_tok"))
    val firsts = toks.select(ck, col("__term"))
      .groupBy("__term").agg(min("checkpoint").as("checkpoint"))
      .groupBy("checkpoint").agg(count(lit(1)).as("n_new"))
    // running sums over the bounded checkpoint frame (unpartitioned
    // window is safe BY CONSTRUCTION: N/step rows)
    val w = Window.orderBy("checkpoint")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mass.join(firsts, Seq("checkpoint"), "full")
      .na.fill(0L, Seq("n_tok", "n_new"))
      .withColumn("tokens_cum", sum("n_tok").over(w))
      .withColumn("vocab_cum", sum("n_new").over(w))
  }
}
