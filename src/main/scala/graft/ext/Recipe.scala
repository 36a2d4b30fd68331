package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The end-to-end training-data recipe — the integration surface that
 * composes the engine's individually-proven operators into the actual
 * shape of a pretraining-corpus build:
 *
 *   quality filter   → [[TextStats.qualityFacets]] (drop "poor")
 *   near-dup apply   → [[Dedup.nearDuplicates]] + [[Dedup.applyDedup]]
 *   decontaminate    → [[Corpus.decontaminateSubstring]] (drop flagged)
 *   mixture rebalance→ [[Corpus.mixTo]]
 *   sequence packing → [[Corpus.packChunks]]
 *
 * Every stage is the SAME operator its standalone oracle-checked query
 * runs — no re-implementation, so the composed pipeline's exact oracle
 * (`x_recipe_e2e`) is the stage oracles' CTEs chained in order. One
 * pipeline proof over five operator proofs.
 *
 * Composition cost (the reason this is one DataFrame job, not five):
 * the quality filter is a codegen'd predicate fused into the scan; the
 * dedup/decontaminate drops are narrow anti-joins on the id; the mix
 * keep-decision is a broadcast-joined filter; and packing adds its two
 * bounded windows. The only corpus-wide exchanges after the dedup
 * stage are the pack phase-2 bucket window's hashpartitioning(__b)
 * and the anti-join shuffles — no stage re-shuffles another stage's
 * output on the same key (pinned by ScaleSpec). The near-dup stage
 * internally materializes its signature/gram frames via
 * localCheckpoint exactly as the standalone pipeline does.
 */
object Recipe {

  /**
   * Run the full recipe. `docs` must expose (`idCol`, `strataCol`,
   * `textCol`); `benchmark` needs `textCol`. Returns the packed
   * corpus — [[Corpus.packChunks]]'s frame `(idCol, n_tokens, ord,
   * start_tok, pack_id, pack_span)` over the filtered, deduplicated,
   * decontaminated, rebalanced survivors. (The stratum column is NOT
   * re-attached here: that would take a second pass over the mixed
   * frame's whole upstream lineage just to carry one column — callers
   * who need it join the output ids back to the source table, a
   * narrow 8-byte-key join against the scan.)
   */
  def run(docs: DataFrame, benchmark: DataFrame,
      mixWeights: Map[String, Double], seed: Long,
      tokenCount: Column, capacity: Long = 256L,
      minJaccard: Double = 0.3, windowTokens: Int = 8,
      buckets: Int = 256, idCol: String = "doc_id",
      strataCol: String = "lang", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol), col(strataCol), col(textCol))

    // 1. quality: drop the "poor" bucket (the facet columns exist only
    // inside the stage — the predicate fuses into the scan projection).
    // CHECKPOINTED: the survivors feed the near-dup stage THREE times
    // (exact-digest membership, LSH banding, verification grams) plus
    // the apply-step anti-join left — without the materialization each
    // consumer re-runs the full facet kernel chain over the scan
    // (measured: 4 evaluations of qualityFacets per x_recipe_e2e run).
    // Same stage-boundary persist posture as the dedup/clean stages
    // below.
    val quality = TextStats.qualityFacets(base, textCol)
      .where(col("quality_bucket") =!= "poor")
      .select(col(idCol), col(strataCol), col(textCol))
      .localCheckpoint()

    // 2. near-dup apply: EXACT dedup → flag → verify → cluster on the
    // quality survivors (nearDuplicates collapses identical texts
    // before any signature is computed — the production stage order:
    // byte-identical boilerplate never reaches the LSH join, so no
    // quadratic candidate cell can form), then drop
    // non-representatives by anti-join. The
    // result is CHECKPOINTED: it feeds both sides of the
    // decontamination (as window source and as anti-join left), and
    // without the materialization each consumer would re-run the
    // whole quality+dedup subtree — the measured unmaterialized plan
    // evaluated the corpus scan three times. One materialization per
    // stage boundary is exactly the persist-between-stages posture a
    // 100 TB build uses.
    val clusters = Dedup.nearDuplicates(quality, idCol, textCol,
      minJaccard = minJaccard)
    val deduped = Dedup.applyDedup(quality, clusters, idCol).localCheckpoint()

    // 3. decontaminate: drop documents sharing a verbatim
    // `windowTokens`-token run with the benchmark; checkpoint again —
    // the mix stage reads the clean corpus twice (stratum counts +
    // the keep-filter pass)
    val flagged = Corpus.decontaminateSubstring(deduped, benchmark,
      windowTokens, idCol, textCol)
    val clean = deduped.join(flagged.select(col(idCol)), Seq(idCol), "left_anti")
      .localCheckpoint()

    // 4. mixture rebalance on the clean corpus (downsample-only mode —
    // the binding stratum is kept whole)
    val mixed = Corpus.mixTo(clean, strataCol, mixWeights, seed, idCol)

    // 5. pack into capacity-token blocks
    Corpus.packChunks(mixed, capacity, seed, tokenCount, idCol, buckets)
  }

  /**
   * The serving/curation recipe built from the round-12-continuation
   * operators — the companion to [[run]] for the "refresh an existing
   * release" shape rather than the "build from raw crawl" one:
   *
   *   keep-best dedup   → [[Dedup.exactKeepBest]] (quality-argmax
   *                       representative per digest, score = n_chars)
   *   Bloom decontam.   → [[Corpus.decontaminateBloom]] (drop docs
   *                       sharing a verbatim window with the
   *                       benchmark; broadcast-literal prefilter)
   *   curriculum order  → [[TextStats.qualityFacets]] buckets +
   *                       [[Corpus.curriculumOrder]] (easy→hard global
   *                       training manifest)
   *
   * Same composition discipline as [[run]]: every stage is the SAME
   * operator its standalone oracle-checked query runs, so the
   * composed oracle (`x_curate_e2e`) is the stage CTEs chained.
   * Returns the final dataloader manifest `(idCol, bucket_rank,
   * shard, pos, global_pos)` over the surviving documents.
   *
   * Stage boundaries: the deduped survivors feed both the
   * decontamination window kernel and the anti-join left, so they are
   * checkpointed once ([[run]]'s measured rationale); the curriculum
   * stage reads the clean frame twice (facets + offsets) behind the
   * same checkpoint.
   */
  def curate(docs: DataFrame, benchmark: DataFrame, nShards: Int,
      seed: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // 1. keep-best exact dedup: survivors are the per-digest argmax
    // (length, -id) representatives, recovered by a narrow id semi-join
    val winners = Dedup.exactKeepBest(docs, length(col(textCol)).cast("long"),
      idCol, textCol)
    val deduped = docs
      .join(winners.select(col("keep_id").as(idCol)), Seq(idCol), "left_semi")
      .localCheckpoint()

    // 2. Bloom-gated decontamination on the survivors
    val flagged = Corpus.decontaminateBloom(deduped, benchmark,
      idCol = idCol, textCol = textCol)
    val clean = deduped
      .join(flagged.select(col(idCol)), Seq(idCol), "left_anti")
      .localCheckpoint()

    // 3. curriculum manifest over the clean corpus
    val facets = TextStats.qualityFacets(clean, textCol)
    Corpus.curriculumOrder(facets,
      when(col("quality_bucket") === "good", 0)
        .when(col("quality_bucket") === "fair", 1).otherwise(2),
      nShards, seed, idCol)
  }
}
