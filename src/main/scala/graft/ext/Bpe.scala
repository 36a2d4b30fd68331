package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding merge training and merges-based token counting —
 * the "count what the trainer's tokenizer would emit" upgrade over the
 * [[TextStats.bpeishTokenCount]] pre-tokenizer proxy, for
 * [[Corpus.packChunks]]'s pluggable counter.
 *
 * Training is the classic greedy procedure (Sennrich et al., "Neural
 * Machine Translation of Rare Words with Subword Units"): start from
 * code points, repeatedly merge the most frequent adjacent symbol
 * pair. Counting applies the learned merges to each pre-token and
 * counts the surviving symbols.
 *
 * APPLICATION ORDER — the property the oracle leans on: engine,
 * Scala reference, and DuckDB oracle all apply the merge list
 * SEQUENTIALLY, one left-to-right pass per merge in training order,
 * so the three are consistent BY CONSTRUCTION. Sequential application
 * is what a chain of string `replace`s computes — which is exactly
 * how the DuckDB oracle replays it (a recursive CTE over
 * separator-wrapped symbol strings, one replace per merge level; SQL
 * `replace` is left-to-right non-overlapping, same as the in-pass
 * scan here).
 *
 * Equivalence to the rank-priority loop GPT-2-style tokenizers run
 * holds for the USUAL reason — a merge's operand symbols can only be
 * created by strictly-earlier merges (that is how the pair got
 * counted during training), and merging normally cannot make an
 * already-processed pair adjacent again — but it is NOT exact in one
 * corner: the same symbol string can be derivable by two DISTINCT
 * merges (e.g. (a,bc) and (ab,c) both yield "abc"), in which case a
 * later merge can re-create an operand of an earlier one that a
 * rank-priority loop would then re-apply and a single sequential
 * pass will not. Treat external-tokenizer parity as approximate
 * unless the merge table is duplicate-derivation-free; internal and
 * oracle results are unaffected either way (all three sides share
 * the sequential semantics).
 *
 * Merges are PLAN-TIME CONSTANTS, like the LSH hyperplanes: the
 * engine's packing query uses [[StandardMerges]] (trained at class
 * load on the embedded [[StandardTrainingText]], deterministically),
 * and the oracle injects the same pairs as literals. Production
 * builds would train on the corpus itself via
 * [[trainMergesFromCorpus]] — a driver-side collect bounded by the
 * pre-token vocabulary (capped), the same build-once-index posture as
 * the IVF centroids — and inject those; BpeSpec exercises that path
 * on the real test corpus.
 */
object Bpe {

  /** Split into code points (matches DuckDB's character indexing). */
  private[ext] def codePoints(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** One left-to-right non-overlapping merge pass (the in-training
    * application; also the per-merge application step when counting). */
  private def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /**
   * Greedy BPE training over a word-frequency table. Deterministic:
   * the best pair maximizes count, ties break to the lexicographically
   * smallest (a, b). Stops early when no pair occurs at least twice
   * (merging hapax pairs memorizes noise).
   */
  def trainMerges(wordFreqs: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    var vocab = wordFreqs.map { case (w, f) => (codePoints(w), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var j = 0
        while (j + 1 < syms.length) {
          val k = (syms(j), syms(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          j += 1
        }
      }
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          merges += ((a, b))
          vocab = vocab.map { case (syms, f) => (applyMerge(syms, a, b), f) }
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  /** Pre-token frequency table of a text via the shared
    * [[TextStats.BpeishPattern]] pre-tokenizer. */
  def wordFreqs(texts: Seq[String]): Seq[(String, Long)] = {
    val p = java.util.regex.Pattern.compile(TextStats.BpeishPattern)
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    texts.foreach { t =>
      val m = p.matcher(t)
      while (m.find()) counts.update(m.group(), counts.getOrElse(m.group(), 0L) + 1L)
    }
    counts.toSeq
  }

  /**
   * Train merges on a corpus column — the production path. One
   * pre-token count aggregation (map-side combinable), then a
   * driver-side collect of the top `maxVocab` words by frequency
   * (TakeOrdered, never a full sort): bounded like the IVF centroid
   * collect. The frequency cutoff is the STANDARD PRACTICAL
   * APPROXIMATION for BPE training, not an exact truncation: a long
   * tail of individually-rare words sharing a common pair can sum to
   * a pair count that would have won a merge round, so truncation can
   * change the learned merges on heavily skewed vocabularies — size
   * `maxVocab` generously there.
   */
  def trainMergesFromCorpus(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 65536): Seq[(String, String)] = {
    val freqs = df
      .select(explode(regexp_extract_all(col(textCol),
        lit(TextStats.BpeishPattern), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    trainMerges(freqs, numMerges)
  }

  /**
   * Embedded training text for [[StandardMerges]] — ordinary English
   * over the analytics vocabulary the test corpora draw from, so the
   * learned merges actually fire there. A constant by design (the
   * oracle injects the resulting pairs as literals; data-dependent
   * merges would need the production inject-your-own path).
   */
  val StandardTrainingText: Seq[String] = Seq(
    "the query planner scans the table and filters the rows before the join",
    "a hash join shuffles the big table on the join key and builds a hash table",
    "the window function sorts each group and computes a running value",
    "the stream of batches flows through the filter and the aggregation",
    "small dimension tables broadcast to every worker for the hash join",
    "the scan reads the column values and skips the other columns",
    "sort merge join partitions both sides on the key and merges sorted runs",
    "the customer orders arrive in batches and the pipeline packs the lines",
    "a fast vector scan beats a slow row scan on wide tables",
    "the group by key aggregates partial values and merges the partials",
    "the query reads the data and writes the sorted output to the table",
    "big data systems spark streams of values through windows and filters",
    "the merge of the sorted parts keeps the order of the key columns",
    "each batch of rows filters fast and joins the small table in memory",
    "the customer line items group by order key and sum the values")

  /** The engine's standard merge table: 200 merges trained on
    * [[StandardTrainingText]] at class load — deterministic, so the
    * SAME pairs are injected into the DuckDB oracle (BpeSpec pins the
    * training determinism and a golden prefix). */
  val StandardMerges: Seq[(String, String)] =
    trainMerges(wordFreqs(StandardTrainingText), numMerges = 200)

  /** Pure-Scala reference of the native counting kernel — the
    * slow-but-obvious twin BpeSpec cross-checks [[tokenCount]]
    * against (same pre-tokenizer, same sequential merge application,
    * no cache). */
  def tokenCountRef(text: String,
      merges: Seq[(String, String)] = StandardMerges): Long = {
    val p = java.util.regex.Pattern.compile(TextStats.BpeishPattern)
    val m = p.matcher(text)
    var total = 0L
    while (m.find()) {
      var syms = codePoints(m.group())
      merges.foreach { case (a, b) =>
        if (syms.length > 1) syms = applyMerge(syms, a, b)
      }
      total += syms.length
    }
    total
  }

  /** Merges-based token count Column over the native one-pass kernel
    * ([[graft.plans.Native.bpeTokenCount]]): pre-tokenize with the
    * shared pattern, apply `merges` per word (cached per thread),
    * count surviving symbols. Drop-in for [[Corpus.packChunks]]'s
    * `tokenCount`. */
  def tokenCount(text: Column, merges: Seq[(String, String)] = StandardMerges): Column =
    graft.plans.NativeFunctions.bpeTokenCount(text, merges)
}
