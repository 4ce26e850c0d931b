package graft.analytics

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over `documents` / `embeddings`
  * (builder-prompt extension surface): deduplication (exact, n-gram Jaccard,
  * MinHash+LSH, SimHash), similarity search (brute-force cosine top-k and a
  * hyperplane-LSH ANN variant), text analysis (language-ID, quality scoring,
  * token counting, fingerprinting) and multimodal binary metadata.
  *
  * Every operator here is *oracle-checkable*: all hashing is built from
  * `md5(...)` (identical hex output in Spark and DuckDB), hex→int conversion
  * uses `instr`-arithmetic that parses the same in both engines, and vector
  * math is emitted as explicit per-dimension double arithmetic so the IEEE
  * result is bit-identical on both sides. [[duckdb]] holds the generated
  * DuckDB mirror for each query.
  *
  * Scale design (the real goal is 100 TB, tested at sf≤0.1):
  *  - shingle/token explosion is the dominant cost; everything downstream of
  *    `explode` aggregates by doc_id (map-side partial agg) or joins on the
  *    shingle hash — both shuffle-bounded by total token count, not doc².
  *  - pairwise similarity is *blocked*: n-gram Jaccard blocks on
  *    (lang, length-bucket), embedding near-dup blocks on label, LSH bands /
  *    hyperplane buckets do the blocking for MinHash/ANN — no unblocked
  *    cross joins anywhere except the deliberately-small brute-force top-k
  *    baseline (query set is a 1/50 sample, candidates scanned once).
  *  - skew: shingle frequency filtering is implicit in the distinct-per-doc
  *    shingling; at production scale a stop-shingle frequency cap (drop
  *    shingles in > 0.1% of docs) bounds the worst key.
  */
object LlmOps extends OpsKernels with TxtOps with DedupOps with SimOps
    with IngestOps with LlmOracles
    with TxtOracles with DedupOracles with SimOracles with IngestOracles {


  /** One-time family STATE builds, exposed so Bench can time them as an
    * explicit pre-stage: without this the cost lands on whichever family
    * member runs first alphabetically (jaccard pairs → dd_align, passage
    * windows → dd_contamination, fingerprint state →
    * dd_incremental_bucketed), distorting per-query floors. Each thunk is
    * idempotent — memo- or table-guarded — so queries re-running later pay
    * only their own plan cost. */
  def stateBuilders(spark: SparkSession, dir: String): Seq[(String, () => Unit)] = Seq(
    "jaccard_pairs" -> (() => { jaccardPairs(spark, dir).count(); () }),
    // the wide signatures build BEFORE the banded pair state that consumes
    // them (round 20: the 64-perm table is now a slice of the 128-perm
    // one), so each entry's timing is its own build, not a dependency's
    "minhash_wide128_sig" -> (() => { minhashWide128Sig(spark, dir).count(); () }),
    "minhash_wide_sig" -> (() => { minhashWideSig(spark, dir).count(); () }),
    "jaccard_pairs_banded" -> (() => { bandedJaccardPairs(spark, dir).count(); () }),
    "jaccard_edges" -> (() => { jaccardEdges08(spark, dir).count(); () }),
    // round 20: the CC label table over those edges — three query paths
    // re-ran the pointer-doubling fixpoint per call before the memo
    "cc_labels_08" -> (() => { jaccardCcLabels(spark, dir).count(); () }),
    "containment_pairs" -> (() => { containmentPairs(spark, dir).count(); () }),
    "passage_windows_n4" -> (() => { passageWindows(spark, dir, 4).count(); () }),
    "passage_windows_n8" -> (() => { passageWindows(spark, dir, 8).count(); () }),
    "simhash_sig" -> (() => { simhashSig(spark, dir).count(); () }),
    "simhash_wide_sig" -> (() => { simhashWideSig(spark, dir).count(); () }),
    // round 20: the capped band-bucket memberships are index state (an LSH
    // index persists bucket -> members); both pairs queries self-join them
    "simhash_bands16" -> (() => { simhashBands16(spark, dir).count(); () }),
    "simhash_bands60" -> (() => { simhashBands60(spark, dir).count(); () }),
    "minhash_sig" -> (() => { minhashSig(spark, dir).count(); () }),
    "band_candidates" -> (() => { wideBandCandidates(spark, dir).count(); () }),
    // round 20: the incremental probe's persistent corpus-side LSH index
    "incr_corpus_bands" -> (() => { incrCorpusBands(spark, dir).count(); () }),
    "bpe_merges" -> (() => { bpeMergeTable(spark, dir).count(); () }),
    "rarity_tf" -> (() => { rarityTf(spark, dir).count(); () }),
    // round 20: the two filter-verdict tables — each re-ran its
    // interpreted-lambda text scan in 3-4 consumers before the memo
    "gopher_scored" -> (() => { gopherScored(spark, dir).count(); () }),
    "classifier_scored" -> (() => { classifierScored(spark, dir).count(); () }),
    "fingerprint_state" -> (() => { fingerprintTable(spark, dir); () }),
    "frontier_state" -> (() => { frontierTable(spark, dir); () }),
    "topk_cosine" -> (() => { bruteTruthTable(spark, dir).count(); () }),
    "ivf_assign" -> (() => { ivfAssignTable(spark, dir).count(); () }),
    "ivf_kmeans_assign" -> (() => { ivfKmeansAssignTable(spark, dir).count(); () }),
    "ann_bucket" -> (() => { annBucketTable(spark, dir).count(); () }),
    "pq_codes" -> (() => { pqCodesTable(spark, dir).count(); () }),
    "pq_codes256" -> (() => { pqCodesTable256(spark, dir).count(); () }),
    "ivf_serve_assign" -> (() => { ivfServeAssignTable(spark, dir).count(); () }),
    "serve_insert_assign" -> (() => { serveInsertAssign(spark, dir).count(); () }),
    "ivf_serve_pq_codes" -> (() => { servePqCodesTable(spark, dir).count(); () }),
    "ivf2_assign" -> (() => { ivf2AssignTable(spark, dir).count(); () }),
    // round 20: the image-side IVF was the one memoized index NOT prewarmed
    // — its build landed on whichever mm consumer ran first alphabetically
    // (mm_cell_balance), distorting that query's floor exactly like the
    // jaccard state once distorted dd_align's.
    "mm_image_cells" -> (() => { imageCellAssign(spark, dir).count(); () }))


  // ----------------------------------------------------------------- maps


  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_tokens" -> txtTokens _,
    "txt_quality" -> txtQuality _,
    "txt_quality_cut" -> txtQualityCut _,
    "txt_classifier" -> txtClassifier _,
    "txt_langid" -> txtLangid _,
    "txt_fingerprint" -> txtFingerprint _,
    "txt_top_terms" -> txtTopTerms _,
    "dd_exact" -> ddExact _,
    "dd_ngram_jaccard" -> ddNgramJaccard _,
    "dd_containment" -> ddContainment _,
    "dd_containment_thin" -> ddContainmentThin _,
    "dd_url" -> ddUrl _,
    "dd_url_hosts" -> ddUrlHosts _,
    "dd_url_incremental" -> ddUrlIncremental _,
    "dd_url_incremental_bucketed" -> ddUrlIncrementalBucketed _,
    "dd_host_cap" -> ddHostCap _,
    "dd_source_overlap" -> ddSourceOverlap _,
    "dd_crawl_funnel" -> ddCrawlFunnel _,
    "dd_funnel_by_source" -> ddFunnelBySource _,
    "dd_optout" -> ddOptout _,
    "dd_takedown" -> ddTakedown _,
    "dd_snapshot_diff" -> ddSnapshotDiff _,
    "mm_clip_filter" -> mmClipFilter _,
    "mm_retrieval_recall" -> mmRetrievalRecall _,
    "mm_image_dedup" -> mmImageDedup _,
    "mm_media_dedup" -> mmMediaDedup _,
    "txt_langid_confusion" -> txtLangidConfusion _,
    "txt_pii" -> txtPii _,
    "txt_pii_census" -> txtPiiCensus _,
    "txt_sample_exec" -> txtSampleExec _,
    "dd_dedup_keep" -> ddDedupKeep _,
    "dd_dedup_keep_best" -> ddDedupKeepBest _,
    "dd_cluster" -> ddCluster _,
    "dd_cluster_hist" -> ddClusterHist _,
    "dd_band_gap" -> ddBandGap _,
    "txt_tfidf" -> txtTfidf _,
    "txt_balance" -> txtBalance _,
    "txt_vocab_coverage" -> txtVocabCoverage _,
    "txt_bpe_pairs" -> txtBpePairs _,
    "txt_bpe_merge" -> txtBpeMerge _,
    "txt_bpe_vocab" -> txtBpeVocab _,
    "txt_bpe_encode" -> txtBpeEncode _,
    "txt_classifier_sweep" -> txtClassifierSweep _,
    "txt_len_histogram" -> txtLenHistogram _,
    "txt_chunks" -> txtChunks _,
    "txt_pack" -> txtPack _,
    "txt_pack_ffd" -> txtPackFfd _,
    "txt_pack_report" -> txtPackReport _,
    "txt_scrub" -> txtScrub _,
    "txt_gopher" -> txtGopher _,
    "dd_lines" -> ddLines _,
    "dd_passages" -> ddPassages _,
    "dd_dup_fraction" -> ddDupFraction _,
    "dd_align" -> ddAlign _,
    "txt_dup_ngrams" -> txtDupNgrams _,
    "txt_top_terms_cms" -> txtTopTermsCms _,
    "dd_contamination" -> ((s: SparkSession, d: String) => ddContamination(s, d)),
    "dd_contamination8" -> ddContamination8 _,
    "dd_contamination_rate" -> ddContaminationRate _,
    "txt_clean_corpus" -> txtCleanCorpus _,
    "txt_curation_funnel" -> txtCurationFunnel _,
    "txt_shards" -> txtShards _,
    "txt_split" -> txtSplit _,
    "txt_mixture" -> txtMixture _,
    "txt_data_budget" -> txtDataBudget _,
    "mm_join" -> mmJoin _,
    "mm_frame_sample" -> mmFrameSample _,
    "dd_minhash_sig" -> ddMinhashSig _,
    "dd_minhash_pairs" -> ddMinhashPairs _,
    "dd_minhash_wide" -> ddMinhashWide _,
    "dd_minhash_wide128" -> ddMinhashWide128 _,
    "dd_minhash_wide_pairs" -> ddMinhashWidePairs _,
    "dd_minhash_recall" -> ddMinhashRecall _,
    "dd_minhash_calibration" -> ddMinhashCalibration _,
    "dd_incremental_near" -> ddIncrementalNear _,
    "dd_incremental_capped" -> ddIncrementalCapped _,
    "ingest_quarantine" -> ingestQuarantine _,
    "dd_simhash" -> ddSimhash _,
    "dd_simhash_pairs" -> ddSimhashPairs _,
    "dd_simhash_wide" -> ddSimhashWide _,
    "dd_simhash_wide_pairs" -> ddSimhashWidePairs _,
    "dd_semdedup" -> ddSemdedup _,
    "dd_semdedup_keep" -> ddSemdedupKeep _,
    "txt_rarity" -> txtRarity _,
    "txt_lm_score" -> txtLmScore _,
    "dd_incremental" -> ddIncremental _,
    "dd_incremental_bucketed" -> ddIncrementalBucketed _,
    "dd_embed_topk" -> ddEmbedTopk _,
    "dd_embed_lsh" -> ddEmbedLsh _,
    "sim_topk_cosine" -> simTopkCosine _,
    "sim_ann_lsh" -> simAnnLsh _,
    "sim_ann_multiprobe" -> simAnnMultiprobe _,
    "sim_ann_probe2" -> simAnnProbe2 _,
    "sim_ann_recall" -> simAnnRecall _,
    "sim_ivf" -> simIvf _,
    "sim_ivf_serve" -> simIvfServe _,
    "sim_ivf_serve_pq" -> simIvfServePq _,
    "sim_ivf_serve_insert" -> simIvfServeInsert _,
    "sim_ivf_serve_delete" -> simIvfServeDelete _,
    "sim_ivf_compact" -> simIvfCompact _,
    "sim_ivf_retrain" -> simIvfRetrain _,
    "sim_ivf_retrain_exec" -> simIvfRetrainExec _,
    "sim_ivf_filtered" -> simIvfFiltered _,
    "sim_ivf_filtered_pq" -> simIvfFilteredPq _,
    "sim_ivf_nprobe2" -> simIvfNprobe2 _,
    "sim_ivf_recall" -> simIvfRecall _,
    "sim_ivf2" -> simIvf2 _,
    "sim_ivf_kmeans" -> simIvfKmeans _,
    "sim_ivf_balance" -> simIvfBalance _,
    "mm_cell_balance" -> mmCellBalance _,
    "sim_ivf_pq" -> simIvfPq _,
    "sim_ivf_pq256" -> simIvfPq256 _,
    "sim_pq_recall" -> simPqRecall _,
    "sim_ivf_pq_rerank" -> simIvfPqRerank _,
    "mm_meta" -> mmMeta _)
}
