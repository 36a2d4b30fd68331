package graft.examples

import org.apache.spark.sql.SparkSession

/**
 * Scale-growth probe behind SCALING.md: times the dedup/similarity
 * family at sf0.001 / sf0.01 / sf0.1 (min-of-3, noop sink — the same
 * estimator as [[graft.Bench]]) and prints one JSON line per
 * (query, sf) plus per-query input/output row counts, so the
 * runtime-vs-rows growth ratio is measured, not argued.
 */
object ScalingProbe {
  private val Queries = Seq("x_minhash_pairs", "x_substring_dedup",
    "x_jaccard_pairs", "x_dedup_clusters", "x_recipe_e2e",
    "x_gopher_rules", "x_langid_trigram", "x_ngram_novelty",
    "x_dsir_weights", "x_cms_heavy",
    // round-12 kernel families
    "x_winnow", "x_winnow_pairs", "x_cdc_chunks", "x_cdc_scrub",
    "x_nb_classify", "x_worst_window", "x_hash_features",
    // round-12 continuation families
    "x_bloom_decontaminate", "x_decontaminate_substr",
    "x_curriculum_order", "x_dedup_keep_best", "x_neardup_degree",
    // round-12 second-pass families
    "x_segment_dedup", "x_edit_pairs", "x_decon_semantic", "x_pq_probe",
    // round-13 families: PQ training, logreg training, and the two
    // newly capped pair finders (post-guard plans)
    "x_pq_recall", "x_logreg_weights", "x_containment_pairs",
    "x_source_overlap",
    // round-13 second batch: run finders/scrubbers, sketches, reports
    "x_longest_run", "x_verbatim_scrub", "x_self_repeat",
    "x_bottomk_overlap", "x_boilerplate", "x_boilerplate_scrub",
    "x_mattr", "x_map", "x_weighted_reservoir",
    // round-16: re-keyed boilerplate family, URL-normalized dedup,
    // domain report, and the globalRank-decomposed calibration
    "x_url_dedup", "x_domain_stats", "x_logreg_calibration",
    "x_global_rank",
    // round-16 second batch: the WET ingest codec (render + parse)
    "x_wet_roundtrip", "x_wet_stats", "x_warc_http", "x_robots_filter",
    "x_crawl_e2e", "x_html_text", "x_html_links", "x_frontier",
    "x_crawl_schedule", "x_sitemap_recrawl",
    // round-17: byte-oriented WET and redirect-chain resolution
    "x_wet_bytes", "x_redirect_resolve",
    // round-18: charset decode, gzip members, recrawl policy (the
    // changed frontier/funnel/html queries re-probe under their old
    // names above)
    "x_warc_charset", "x_warc_gzip", "x_recrawl_policy",
    // round-18 second batch: robots-announced sitemaps, base-href
    // resolution, rel=canonical dedup
    "x_sitemap_discovery", "x_base_links", "x_canonical_dedup",
    // round-18 third batch: revisit records, robots availability,
    // frontier trap hygiene
    "x_warc_revisit", "x_robots_availability", "x_url_traps",
    "x_redirect_identity",
    // round-19: host centrality + quota select, HTTP wire codings,
    // anchor-text corpus, CJK charsets
    "x_host_rank", "x_rank_weighted_select", "x_warc_encoding",
    "x_anchor_text", "x_warc_charset_cjk", "x_frontier_priority",
    "x_host_rank_weighted",
    // round-20: connected components + family-capped select, seeded
    // (TrustRank-shape) rank; the capped anchor corpus and the
    // 9-class wire-coding matrix re-probe under their old names above
    "x_host_components", "x_mirror_family_select", "x_host_rank_seeded",
    "x_family_rank",
    // round-21 (optimization round): queries whose plans changed —
    // candidate-restricted minhash calibration, scan-floored kernel
    // queries, bridge-checkpointed loops re-probe under their old
    // names above
    "x_minhash_est", "x_cosine_pairs", "x_weighted_sample",
    "x_bpe_encode", "x_pii_scan", "x_pii_redact", "x_decontaminate")
  private val Sfs = Seq("sf0.001", "sf0.01", "sf0.1")

  def main(args: Array[String]): Unit = {
    // optional arg list: probe only the named queries (local iteration)
    val only = args.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    val runs = 3
    for (sf <- Sfs) {
      val dir = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      for (name <- Queries if only.isEmpty || only(name)) {
        val fn = graft.SparkEntry.queries(name)
        var rows = -1L
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        rows = fn(spark, dir).count()
        val mn = math.rint(times.min * 1000) / 1000
        println(s"""{"probe":"scaling","query":"$name","sf":"$sf","docs":$docs,"out_rows":$rows,"sec_min":$mn}""")
      }
    }
    spark.stop()
  }
}
