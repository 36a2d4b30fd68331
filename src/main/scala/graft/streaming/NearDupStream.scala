package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ext.Dedup
import graft.plans.NativeFunctions

/**
 * Incremental (streaming) MinHash near-dup flagging — the streaming
 * counterpart of the batch [[graft.ext.Dedup.minhashLshPairs]]: flag a
 * document as it ARRIVES when it collides with an earlier document in
 * any LSH band bucket, instead of re-running a corpus-wide self-join.
 * The use case is dedup-at-ingest for a training-data pipeline: the
 * verdict for each new document depends only on bounded per-bucket
 * state, never on a scan of what came before.
 *
 * The reference is processing-time batch only (SURVEY §2.9); this is
 * part of the training-pipeline extension surface.
 */
object NearDupStream {

  /**
   * Per-row LSH band-bucket keys, computed with NO shuffle: the full
   * MinHash signature comes from the fused native kernel
   * ([[graft.plans.Native.minhashSignature]]) — the SAME kernel, md5
   * gram-key family, coefficient family ([[Dedup.minhashCoefs]]) and
   * defaults (32 hashes / 8 bands) as batch
   * [[Dedup.minhashSignatures]], so a streaming flag lands in exactly
   * the band buckets the batch pass would join on: flags reconcile
   * with batch pairs value-for-value (pinned by StreamingSpec's
   * agreement case). Signatures are banded `r = numHashes/bands` per
   * bucket; returns `array<string>` of `bands` bucket keys
   * ("band:h_i,h_j,..."), one codegen'd projection per row.
   *
   * `sig` must be the signature array column (compute it in its own
   * projection — [[flagNearDups]] does — so the kernel runs once per
   * row rather than once per band reference).
   *
   * Keys carry the [[BucketKeyVersion]] prefix naming the signature
   * family, so state written under an older family can never silently
   * match (see the checkpoint-compatibility note on [[flagNearDups]]).
   */
  def bandBucketKeys(sig: Column, numHashes: Int = 32, bands: Int = 8): Column = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    array((0 until bands).map { b =>
      concat_ws(",",
        lit(s"$BucketKeyVersion$b:") +: (b * r until (b + 1) * r).map(j =>
          element_at(sig, j + 1).cast("string")): _*)
    }: _*)
  }

  /** Version tag of the streaming bucket-key family: "v2" = the fused
    * md5 MinHash kernel with 32 hashes / 8 bands ("v1", never tagged,
    * was the pre-round-9 xxhash64 16/4 family). Bump on ANY change to
    * the signature kernel, coefficient family, or defaults — the tag
    * is what makes stale checkpoint state detectable. */
  val BucketKeyVersion: String = "v2|"

  /** The shared batch/streaming signature column — [[Dedup.minhashCoefs]]
    * coefficients over the fused native kernel. */
  def signature(text: Column, numHashes: Int = 32, shingleN: Int = 3): Column = {
    val (as, bs) = Dedup.minhashCoefs(numHashes)
    NativeFunctions.minhashSignature(text, as, bs, shingleN)
  }

  /**
   * Flag documents against a STATIC historical corpus — the
   * "new data vs everything already ingested" half of ingest dedup
   * ([[flagNearDups]] covers new-vs-new within the stream). The
   * historical side is the batch band-bucket frame (computed once from
   * the same fused kernel; persist it in practice); the incoming side
   * — streaming or batch — explodes onto the same buckets, and a
   * stream-static equi-join emits `(doc_id, hist_id, bucket)` per
   * collision. Stateless (no watermark, no state store): the static
   * side is the state. Same kernel, coefficients and defaults as
   * [[graft.ext.Dedup.minhashLshPairs]], so a flag means exactly "the
   * batch pass would have paired these"; a document may flag once per
   * shared bucket — consumers dedup on (doc_id, hist_id).
   */
  def flagAgainstCorpus(docs: DataFrame, corpus: DataFrame,
      numHashes: Int = 32, bands: Int = 8, shingleN: Int = 3): DataFrame = {
    def buckets(df: DataFrame, idOut: String): DataFrame = df
      .withColumn("__sig", signature(col("text"), numHashes, shingleN))
      .select(col("doc_id").as(idOut),
        explode(bandBucketKeys(col("__sig"), numHashes, bands)).as("bucket"))
    buckets(docs, "doc_id")
      .join(buckets(corpus, "hist_id"), "bucket")
      .select(col("doc_id"), col("hist_id"), col("bucket"))
  }

  /**
   * Verbatim-leak flagging at ingest — streaming decontamination, the
   * exact-substring counterpart of [[flagAgainstCorpus]]: an incoming
   * document is flagged when any of its `windowTokens`-token windows
   * appears verbatim in the static benchmark set, using the SAME
   * one-pass hashed-window kernel as the batch
   * [[graft.ext.Dedup.exactSubstringPairs]] /
   * [[graft.ext.Corpus.decontaminateSubstring]] (so a streaming flag
   * means exactly "the batch decontamination pass would drop this").
   * The benchmark side is the distinct hashed-window frame — bounded
   * by the benchmark (≪ corpus), computed once and broadcast into the
   * stream-static equi-join; persist it in practice. Stateless: no
   * watermark, no state store — the static side is the state.
   *
   * Emits one `(doc_id, window_hash)` row per matching distinct
   * window; consumers dedup on doc_id to drop-or-quarantine.
   * Documents shorter than `windowTokens` tokens cannot leak a
   * qualifying run and pass untouched, exactly as in the batch
   * operator.
   */
  def flagVerbatim(docs: DataFrame, benchmark: DataFrame,
      windowTokens: Int = 8): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    import graft.ext.TextStats
    def windows(df: DataFrame, cols: Seq[Column]): DataFrame = df
      .where(size(TextStats.tokens(col("text"))) >= windowTokens)
      .select(cols :+ explode(NativeFunctions.hashedShingles(
        col("text"), windowTokens)).as("__w"): _*)
    val bw = windows(benchmark, Nil).select("__w").distinct()
    windows(docs, Seq(col("doc_id")))
      .join(bw, "__w")
      .select(col("doc_id"), col("__w").as("window_hash"))
  }

  /**
   * The DROP side of streaming decontamination: admit only documents
   * with NO verbatim `windowTokens`-token overlap with the benchmark
   * set. [[flagVerbatim]] emits flag rows (quarantine workflows);
   * this returns the clean complement — which an append-mode stream
   * cannot derive from the flags (doc-level "no window matched" is an
   * aggregation over the exploded frame, and a stream cannot
   * anti-join its own derivative without watermark state). Instead
   * the benchmark's distinct window hashes — bounded by the
   * benchmark, ≪ corpus, the same bounded-collect posture as the IVF
   * centroids and LSH hyperplanes — ride the plan as an array
   * literal, and admission is ONE codegen predicate over the same
   * one-pass window kernel: no join, no shuffle, no state. Documents
   * shorter than the window pass untouched (batch semantics). For a
   * benchmark too big to literal-ize, swap the exact array for the
   * [[graft.operators.SkewUtils]] bloom-literal probe and accept its
   * false-positive drop rate; `maxWindows` makes the exact path's
   * bound explicit instead of silently inflating plans.
   */
  def admitVerbatim(docs: DataFrame, benchmark: DataFrame,
      windowTokens: Int = 8, maxWindows: Int = 1 << 20): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    import graft.ext.TextStats
    val hashes = benchmark
      .where(size(TextStats.tokens(col("text"))) >= windowTokens)
      .select(explode(NativeFunctions.hashedShingles(
        col("text"), windowTokens)).as("__w"))
      .distinct().collect().map(_.getLong(0))
    require(hashes.length <= maxWindows,
      s"benchmark has ${hashes.length} distinct windows (> $maxWindows): " +
        "use the bloom-literal probe instead of the exact array literal")
    docs.where(
      size(TextStats.tokens(col("text"))) < windowTokens ||
        !arrays_overlap(
          NativeFunctions.hashedShingles(col("text"), windowTokens),
          typedLit(hashes.toSeq)))
  }

  final case class BucketHit(bucket: String, doc_id: Long, ts_us: Long)
  /** One (canonical doc, last activity) entry per live bucket — the
    * bounded "band-bucket → min-doc" map, sharded by group key. */
  final case class BucketState(canonical_id: Long, last_us: Long)
  final case class DupFlag(doc_id: Long, dup_of: Long, bucket: String)

  /**
   * Flag streaming near-dups: documents `(doc_id LONG, text STRING,
   * ts_us LONG)` are exploded onto their band buckets; the first
   * document seen in a bucket becomes its canonical, and every LATER
   * distinct document hitting that bucket emits a
   * `DupFlag(doc_id, dup_of = canonical, bucket)` — a candidate flag
   * with the same guarantees as batch LSH banding (a flag means "agreed
   * on a full band", verification against a threshold is a downstream
   * join, exactly as in the batch pipeline). A document may emit one
   * flag per shared bucket; consumers dedup on (doc_id, dup_of).
   *
   * State is bounded two ways: one `BucketState` per live bucket
   * (regardless of how many documents hit it), and an EVENT-TIME
   * timeout reclaims a bucket once the watermark passes
   * `last activity + horizonUs` — so state tracks the active horizon,
   * not the whole stream. Events later than `lateness` are dropped by
   * the watermark; a late-but-within-lateness near-dup still finds the
   * bucket state and is flagged (replay-deterministic, same rationale
   * as [[EventTimeOps.sessionize]]).
   *
   * CHECKPOINT COMPATIBILITY: bucket keys are versioned with a
   * `v2|` prefix naming the signature family (round 9 moved the
   * family from xxhash64 16-hash/4-band to the fused md5 kernel at
   * 32/8). Bucket keys are plain strings, so WITHOUT the version tag
   * a query restarted from a checkpoint written under a different
   * family would silently keep stale bucket state that can never
   * match newly-signed documents — cross-upgrade near-dups would be
   * missed with no schema error. With the tag, stale state simply
   * times out under its own key space and any cross-family miss is
   * diagnosable by inspecting flagged bucket strings. A future family
   * change must bump the prefix.
   */
  def flagNearDups(docs: DataFrame, horizonUs: Long,
      lateness: String = "10 minutes", numHashes: Int = 32, bands: Int = 8,
      shingleN: Int = 3): Dataset[DupFlag] = {
    require(horizonUs > 0, "horizonUs must be positive")
    import docs.sparkSession.implicits._
    docs
      .withColumn("__ts", timestamp_micros(col("ts_us")))
      .withWatermark("__ts", lateness)
      // signature in its own projection: one kernel run per row (the
      // band columns reference it numHashes times)
      .withColumn("__sig", signature(col("text"), numHashes, shingleN))
      .select(
        explode(bandBucketKeys(col("__sig"), numHashes, bands)).as("bucket"),
        col("doc_id"), col("ts_us"),
        col("__ts")) // the watermark column must stay visible to the
                     // grouped frame for the event-time timeout
      .as[BucketHit]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, DupFlag](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (bucket, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove() // horizon passed: reclaim the bucket
            Iterator.empty
          } else {
            // arrival order within a batch is not meaningful; process in
            // event-time order (ties by id) so the canonical choice is
            // replay-deterministic
            val sorted = rows.toSeq.sortBy(r => (r.ts_us, r.doc_id))
            var cur = state.getOption
            val flags = scala.collection.mutable.ListBuffer.empty[DupFlag]
            sorted.foreach { r =>
              cur match {
                case None =>
                  cur = Some(BucketState(r.doc_id, r.ts_us))
                case Some(s) =>
                  // redeliveries of the canonical itself are not dups
                  if (r.doc_id != s.canonical_id)
                    flags += DupFlag(r.doc_id, s.canonical_id, bucket)
                  cur = Some(s.copy(last_us = math.max(s.last_us, r.ts_us)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // reclaim once the watermark passes last + horizon; clamp
              // above the current watermark (Spark rejects timeouts at
              // or before it)
              state.setTimeoutTimestamp(math.max((s.last_us + horizonUs) / 1000L,
                state.getCurrentWatermarkMs + 1L))
            }
            flags.iterator
          }
      }
  }

  final case class SegHit(key: Long, doc_id: Long, seg_idx: Long, ts_us: Long)
  /** First instance seen for a segment key: the canonical (doc,
    * seg_idx) plus last activity for the event-time reclaim. */
  final case class SegState(canonical_id: Long, canonical_seg: Long,
      last_us: Long)
  final case class SegDupFlag(doc_id: Long, seg_idx: Long, dup_of: Long,
      key: Long)

  /**
   * Streaming first-occurrence segment gate — the ingest form of
   * [[graft.ext.Corpus.segmentDedup]]'s C4 duplicated-segment rule:
   * documents `(doc_id LONG, text STRING, ts_us LONG)` explode onto
   * their `segTokens`-token segments (the SAME
   * [[graft.ext.Corpus.segmentRows]] frame and 8-byte xxhash64 keys as
   * batch); the first instance seen under a key becomes canonical, and
   * every LATER instance — including a repeat within the same document
   * — emits a `SegDupFlag(doc_id, seg_idx, dup_of = canonical doc,
   * key)`. Downstream drops flagged segments at rebuild, exactly the
   * batch survivor set when arrival order matches the batch
   * (doc, seg_idx) order (spec-proven).
   *
   * State is one `SegState` per live segment key regardless of
   * instance count (boilerplate floods update one entry — never
   * quadratic), reclaimed by the event-time timeout once the watermark
   * passes `last activity + horizonUs`; within-lateness stragglers
   * still find the canonical ([[flagNearDups]]' replay-determinism
   * rationale).
   */
  def flagDupSegments(docs: DataFrame, horizonUs: Long, segTokens: Int = 4,
      lateness: String = "10 minutes"): Dataset[SegDupFlag] = {
    require(horizonUs > 0, "horizonUs must be positive")
    import docs.sparkSession.implicits._
    graft.ext.Corpus.segmentRows(
        docs.withColumn("__ts", timestamp_micros(col("ts_us")))
          .withWatermark("__ts", lateness),
        segTokens, "text")
      .select(col("__key").as("key"), col("doc_id"),
        col("__seg_idx").cast("long").as("seg_idx"), col("ts_us"),
        col("__ts"))
      .as[SegHit]
      .groupByKey(_.key)
      .flatMapGroupsWithState[SegState, SegDupFlag](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[SegState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // event-time order (ties by doc then position) makes the
            // canonical choice replay-deterministic
            val sorted = rows.toSeq.sortBy(r => (r.ts_us, r.doc_id, r.seg_idx))
            var cur = state.getOption
            val flags = scala.collection.mutable.ListBuffer.empty[SegDupFlag]
            sorted.foreach { r =>
              cur match {
                case None =>
                  cur = Some(SegState(r.doc_id, r.seg_idx, r.ts_us))
                case Some(s) =>
                  // redelivery of the canonical INSTANCE is not a dup;
                  // the same segment elsewhere (even same doc) is
                  if (!(r.doc_id == s.canonical_id && r.seg_idx == s.canonical_seg))
                    flags += SegDupFlag(r.doc_id, r.seg_idx, s.canonical_id, key)
                  cur = Some(s.copy(last_us = math.max(s.last_us, r.ts_us)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(math.max((s.last_us + horizonUs) / 1000L,
                state.getCurrentWatermarkMs + 1L))
            }
            flags.iterator
          }
      }
  }

  final case class UrlHit(key: Long, doc_id: Long, ts_us: Long)
  /** First instance seen for a canonical-URL key, plus last activity
    * for the event-time reclaim. */
  final case class UrlState(canonical_id: Long, last_us: Long)
  final case class UrlDupFlag(doc_id: Long, dup_of: Long, key: Long)

  /**
   * Streaming first-occurrence URL gate — the ingest form of
   * [[graft.ext.Dedup.urlDedup]], and the cheapest admit decision a
   * crawl pipeline has (the CCNet/RefinedWeb re-crawl pre-filter made
   * incremental): documents `(doc_id LONG, url STRING, ts_us LONG)`
   * are keyed on `xxhash64(normalizeUrl(url))` — the SAME
   * canonicalization as batch, so a streaming flag is exactly a batch
   * `n_copies > 1` membership — and the first instance seen under a
   * key becomes canonical; every LATER instance emits a
   * `UrlDupFlag(doc_id, dup_of = canonical doc, key)`.
   *
   * State is one `UrlState` per live canonical URL regardless of
   * re-crawl count (a hot page updates one entry), reclaimed by the
   * event-time timeout once the watermark passes
   * `last activity + horizonUs`; within-lateness stragglers still find
   * the canonical ([[flagNearDups]]' replay-determinism rationale:
   * event-time order, ties by doc id).
   */
  def flagDupUrls(docs: DataFrame, horizonUs: Long,
      urlCol: String = "url",
      lateness: String = "10 minutes"): Dataset[UrlDupFlag] = {
    require(horizonUs > 0, "horizonUs must be positive")
    import docs.sparkSession.implicits._
    docs.withColumn("__ts", timestamp_micros(col("ts_us")))
      .withWatermark("__ts", lateness)
      .select(xxhash64(Dedup.normalizeUrl(col(urlCol))).as("key"),
        col("doc_id"), col("ts_us"), col("__ts"))
      .as[UrlHit]
      .groupByKey(_.key)
      .flatMapGroupsWithState[UrlState, UrlDupFlag](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[UrlState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts_us, r.doc_id))
            var cur = state.getOption
            val flags = scala.collection.mutable.ListBuffer.empty[UrlDupFlag]
            sorted.foreach { r =>
              cur match {
                case None =>
                  cur = Some(UrlState(r.doc_id, r.ts_us))
                case Some(st) =>
                  // redeliveries of the canonical itself are not dups
                  if (r.doc_id != st.canonical_id)
                    flags += UrlDupFlag(r.doc_id, st.canonical_id, key)
                  cur = Some(st.copy(last_us = math.max(st.last_us, r.ts_us)))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(math.max(
                (st.last_us + horizonUs) / 1000L,
                state.getCurrentWatermarkMs + 1L))
            }
            flags.iterator
          }
      }
  }
}
