package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale-stress run (SURVEY §2.4): replicate the largest fixture
  * REP× with remapped keys and re-time the queries whose cost is NOT
  * linear in input size — the Σdf² shingle join, banded/bucketed
  * similarity ops, and the stateful streams — to check that the tuning
  * chosen at sf0.1 still holds an order of magnitude up (~sf1).
  *
  * Replication is shape-preserving, not row-copying:
  *  - documents: doc_id remapped per replica; a per-replica token is
  *    appended to the text, so shingle document-frequencies scale ×REP
  *    (the df-skew stress) while replicas are near- but not exact dups.
  *  - events: event_id remapped; user_id offset per replica, so session/
  *    state-key cardinality scales ×REP (state-store stress) rather than
  *    events-per-session.
  *  - embeddings: vec_id remapped; each component nudged by a per-replica
  *    epsilon so replicas are near-neighbors, not exact ties (bucket-
  *    population stress for SRP/IVF).
  *  - lineitem: copied with remapped order keys — the linear-scan
  *    reference point.
  *
  * The stress corpus is derived, written under target/, and used ONLY for
  * this timing artifact — correctness always runs against the immutable
  * driver fixtures.
  *
  * Output: one JSON line, same shape as Bench, with sf = "<base>x<REP>".
  */
object BenchStress {

  /** Queries with super-linear or stateful cost profiles, plus one linear
    * scan as the yardstick. Together with [[NotStressed]] this must
    * partition the WHOLE declared surface — a spec enforces it, so a new
    * query cannot ship without a stress-triage decision. */
  private[graft] val StressQueries = Seq(
    "q_agg_groupby", // linear yardstick
    "q_dedup_exact",
    // round-11: bloom pre-filtered delta-vs-base dedup — the filter
    // build treeAggregate and the base hash scan grow xREP while the
    // candidate verify stays (dups + fpp)-sized; stressed to prove the
    // probe stage stays a pure map
    "q_dedup_bloom",
    // round-12: banded-signature bloom near-dup — the band bloom build
    // and band join grow xREP while bloom-negative delta docs skip the
    // join; stressed to prove the shed fraction and verify stage hold
    "q_dedup_bloom_bands",
    // round-12: streaming bloom ingest gate — per-micro-batch verify
    // joins against the persisted base hash index grow xREP
    "q_stream_dedup_bloom",
    // round-12: the packed-shard write — corpus-sized id stream through
    // a per-shard sort into a hive-partitioned write; stressed to prove
    // the pack stays one exchange while the token stream grows xREP
    "q_shard_write",
    // round-13: the incremental append — base build + delta continuation
    // from a partition-pruned manifest aggregate; stressed to prove the
    // delta pass scales with the delta, not the base
    "q_shard_append",
    // round-13: LSM compaction — the re-pack must stay bounded by
    // |tail + delta| while the base generation grows xREP untouched
    "q_shard_compact",
    // round-13: right-to-be-forgotten delete — affected-generation
    // re-pack + dynamic partition overwrite at 10x store size
    "q_shard_forget",
    // round-13: perceptual top-k search — probe-side shuffle-hash build
    // against index band buckets growing xREP; stressed to prove the
    // candidate stream stays band-bounded, never probe×index
    "q_simsearch_media",
    // round-14: the same search over the PERSISTED band index — stressed
    // to demonstrate the serving-path win: timed passes read the index
    // artifact (built once at warm-up via the corpus stamp) + hash only
    // the probe set, so it should sit well under q_simsearch_media
    "q_simsearch_media_index",
    // round-14: the audio twin of the persisted-index serving path
    "q_simsearch_audio_index",
    // round-14: search over the STREAM-maintained band-signature log —
    // per-batch delta appends (stressed inside the stream pipelines'
    // cost class), search cost = the q_simsearch_media_index claim
    "q_stream_media_index",
    // round-14: RTBF propagation into the serving index — affected-
    // generation re-derive + dynamic partition overwrite at 10x
    "q_media_index_forget",
    // round-14: the audio twin of the index-forget compliance path
    "q_audio_index_forget",
    // round-16: the EMBEDDING modality's persisted-ANN lifecycle
    // (VERDICT r15 task 3) — the rebuild twin re-hashes the corpus
    // (bucket populations grow xREP; candidates stay band-bounded)...
    "q_simsearch_ann_rad",
    // ...while the persisted-index search reads the stamped artifact
    // and hashes only the probe set — the serving-path claim is
    // "indexed <= rebuild at 10x", checked directly in the artifact
    "q_simsearch_ann_index",
    // stream-maintained signature log: search cost = the
    // q_simsearch_ann_index claim over the distinct-collapsed log
    "q_stream_ann_index",
    // distinct fold of the signature log into a single-file base +
    // the indexed search (the q_stream_media_index_compact class)
    "q_stream_ann_index_compact",
    // RTBF into the ANN index: filter-in-place generation rewrite +
    // dynamic partition overwrite at 10x index size
    "q_ann_index_forget",
    // round-15: RTBF into the posting index — 2x corpus-sized posting
    // build + affected-generation re-tokenize + the manifest-backed
    // search; stressed to prove the forget stays slice-sized and the
    // search stays term-pruned at 10x
    "q_search_index_forget",
    // round-15: RTBF over the STREAM-built store — pristine store built
    // once at warm-up (corpus-stamped memo), timed passes pay
    // copy + blast-radius re-pack + read-back; the x_streamstore_forget
    // variants decompose the proportional-cost claim
    "q_stream_pipeline_forget",
    // round-15: LSM compaction over the stream store — the re-pack must
    // stay bounded by |tails + later generations| while gen-0 full rows
    // (the bulk at 10x) stay file-untouched
    "q_stream_pipeline_compact",
    // round-16: RTBF on a COMPACTED store — source-replay re-merge of
    // the touched shards; stressed to prove the replay cost is
    // touched-shard-sized (the fixture pred touches every shard — the
    // worst case, ~one corpus re-tokenize) and untouched files stay put
    "q_stream_pipeline_forget_compacted",
    // round-13: perceptual media near-dup — dHash map + band buckets
    // grow xREP; stressed to prove candidates stay banded (no all-pairs)
    "q_dedup_media",
    // round-13: the WAV counterpart — temporal-fingerprint bands over
    // the decoded sample streams, same banded-never-all-pairs claim
    "q_dedup_audio",
    // round-13: audio top-k search — probe-side shuffle-hash build
    // against fingerprint band buckets growing xREP (the
    // q_simsearch_media claim on the audio kernels)
    "q_simsearch_audio",
    // round-13: the end-to-end streaming corpus pipeline — gates,
    // tokenize, pack per micro-batch; stressed to prove per-batch work
    // scales with the batch and log reads with accepted-hash count
    "q_stream_pipeline",
    // round-14: the near-dup-gated pipeline — adds per-batch band-key
    // generation, a band-bucket join against the metadata-narrow band
    // log, and a candidate-bounded exact verify; stressed to prove the
    // candidate stream stays band-bucket-bounded at 10x
    "q_stream_pipeline_neardup",
    "q_dedup_ngram_jaccard",
    // round-11: the shard-manifest composition — the stressed clean
    // pipeline's survivor set chunked (bounded Generate) and packed
    // (one shard shuffle + per-shard running sum); stressed with its
    // parent q_pipeline_clean, whose near-dup stage dominates
    "q_pipeline_shards",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_text_fingerprint_winnow",
    "q_text_boilerplate",
    "q_pipeline_clean",
    "q_sink_compaction",
    "q_simsearch_cosine",
    "q_simsearch_ann_srp",
    "q_simsearch_ivf",
    // round-10: the ADC scan variant — same probed lists as IVF but the
    // candidate stream carries M codes instead of vectors; stressed to
    // keep the encode join + LUT-lookup stage on the tracked surface
    "q_simsearch_ivfpq",
    "q_dedup_embedding",
    "q_sessionize",
    "q_stream_tumbling",
    "q_stream_dedup",
    "q_stream_session",
    // round-11: the streaming z-gate — windowed append-mode state rows
    // grow with (type x window) cardinality xREP; stressed with the
    // rest of the stateful streaming tier
    "q_stream_anomaly",
    // round-12: the statestore reader — checkpoint state rows grow with
    // (type x window) xREP; stressed to prove the offline read scales
    // with the state, not the stream
    "q_stream_state_inspect",
    // round-11: the LSM merge pass — folds a delta log that grows with
    // (terms x batches) xREP and rewrites the base index; stressed to
    // prove the fold stays term-sized while the corpus stream grows
    "q_stream_index_compact",
    // round-14: the media-signature analog of the stressed
    // q_stream_index_compact — distinct fold of the stream log into a
    // single-file base + the indexed search
    "q_stream_media_index_compact",
    // round-3 additions: stream-static enrichment (broadcast side grows
    // with the dim table), foreachBatch sink (per-batch write amplification),
    // JDBC round trip (writer fan-in) — stressed so the tracked surface
    // matches the declared surface
    "q_stream_static_join",
    "q_stream_foreachbatch",
    "q_sink_jdbc_roundtrip",
    // round-4 curation tier: merge shuffles |keys| rows (WindowGroupLimit
    // pushdown), decontamination broadcasts a gram index that grows with
    // the test set, packing windows over 32 shards — all claimed ~linear
    "q_merge_upsert",
    "q_decontaminate",
    "q_pack_sequences",
    // round-5 additions (VERDICT r4 task 2): the six late-r4 queries that
    // shipped without a 10x datapoint, plus the three remaining stateful
    // streams (state-key cardinality scales xREP — exactly what this
    // artifact stresses)
    "q_shuffle_deterministic",
    "q_variant_extract",
    "q_agg_grouping_sets",
    // round-9: BPE learning scans the corpus once for the word dict, then
    // (round 10) runs the merge loop driver-local — the 10x point proves
    // the loop cost stays vocab-bound while the corpus scan scales
    // linearly
    "q_text_bpe",
    // round-10: the tokenize-then-pack composition — same per-shard
    // running-sum window as q_pack_sequences (already stressed) but fed
    // by the broadcast-dict token counts; stressed for parity with it
    "q_pack_bpe",
    // round-10: frozen-tokenizer holdout encoding — contains its own
    // base-slice learning pass (corpus scan + dict collect) plus the
    // Merges-deep replace chain over held-out distinct words
    "q_bpe_encode",
    // round-11: the unigram sibling — base-slice EM learning (dict-
    // bounded driver Viterbi loop) + frozen holdout encode; the 10x
    // point proves the driver loop stays vocab/type-bound while the
    // corpus scans scale linearly
    "q_unigram_encode",
    "q_sink_text_roundtrip",
    "q_redact_scrub",
    "q_sample_stratified",
    "q_stream_stateful",
    "q_stream_transform_with_state",
    "q_stream_timer_expiry",
    "q_stream_sink_files",
    "q_stream_join",
    // round-5: the AQE skew-join demo — the hot key holds 70% of the fact
    // side at every replication, so 10x is a genuine skew stress
    "q_join_skewed",
    // round-6: the star shape — the fact-fact SMJ shuffle grows xREP on
    // both sides while the broadcast dims stay put; exactly the balance a
    // 100 TB warehouse query must keep
    "q_join_star",
    // round-6: two chained state stores in one plan — per-batch state
    // rows grow with the event volume in stage 1 and with closed-window
    // count in stage 2; watermark propagation is what's being stressed
    "q_stream_chained",
    // round-7: the partitioned-fact rewrite grows xREP (hive-partitioned
    // writer fan-out) and the DPP join must keep pruning to the two
    // 'web' partition dirs at every replication
    "q_join_dpp",
    // round-8: iterative tier. Components' round count grows with the
    // near-dup graph's structure (xREP multiplies both edges and
    // component sizes); k-means/semdedup assignment is linear xREP but
    // semdedup's within-cluster pair term is quadratic in cluster size
    // at fixed K — exactly the regime the stress run must watch; span
    // dedup is keyed-linear x W but its dup-gram set grows with REP
    "q_dedup_components", "q_cluster_kmeans", "q_cluster_semdedup",
    "q_text_span_dedup",
    // round-8: the delta-vs-base probe's candidate volume is
    // |delta prefix| x base-df — exactly the product xREP multiplies;
    // SCD-2's per-key version windows grow with the replicated user set
    "q_dedup_incremental", "q_scd2_build",
    // round-10: DSIR importance weighting — linear by design (fixed
    // 1024-bucket models, one doc_id shuffle); stressed to PROVE the
    // bucket tables stay bounded while the corpus token stream grows xREP
    "q_dsir_weights",
    // round-10: PQ trains M sub-codebooks with the kmeans loop (already
    // stressed) and encodes with an M×K broadcast — stressed for parity
    // with q_cluster_kmeans, whose cost family it shares
    "q_embed_pq",
    // round-10: perceptron training — per-iteration margin+gradient
    // aggregations over the checkpointed feature relation; stressed to
    // prove the iteration cost stays linear while state stays B+1 rows
    "q_train_classifier",
    // round-10: unigram-LM tokenizer — dict-local EM learning (constant
    // in corpus replication) + broadcast-dict application; stressed to
    // prove the learn+apply total stays linear in the corpus
    "q_text_unigram",
    // round-10: exact Gram matrix — a 2080-way Generate fan-out pipelined
    // into a map-side aggregate; stressed to prove the inflation stays
    // transient (no exchange grows with the corpus)
    "q_embed_gram",
    // round-10: PCA projection — two single-buffer moment aggregates +
    // a driver eigensolve + a map-side projection; stressed to prove the
    // whole composition is two scans + a map at any corpus size
    "q_embed_pca",
    // round-11: reduce-then-cluster — the q_cluster_kmeans loop run in
    // the 8-dim projected space; stressed to prove the projection map +
    // reduced-dim assignment stays linear (and cheaper than raw kmeans)
    "q_cluster_pca_kmeans",
    // round-10: inverted-index build — the corpus-sized (term, doc) tf
    // shuffle grows xREP while the per-term heap stays O(P); stressed to
    // prove the postings-head state never follows df
    "q_search_index",
    // round-10: PageRank consumes the shared near-dup pair set, whose
    // edge count grows SUPER-linearly under replication (replicated docs
    // are near-dups of each other) — same risk class as the stressed
    // q_dedup_components, plus 8 iteration rounds over the edges
    "q_graph_pagerank",
    // round-10: per-micro-batch index-delta appends — write
    // amplification per batch, stressed for parity with
    // q_stream_foreachbatch whose sink shape it shares
    "q_stream_index_maintain")

  /** Declared queries deliberately NOT in the stress run, with the class
    * of reason. Everything here is linear-in-input map/filter/agg work,
    * dim-table-bound, or a fixed-size round-trip whose sf0.1 bench row
    * already pins the trend — no super-linear or stateful risk at 10x.
    * The triage spec asserts StressQueries ++ NotStressed == declared. */
  private[graft] val NotStressed: Set[String] = Set(
    // declared-schema scan over the two-vintage fixture + one grouped
    // agg — linear, the q_agg_groupby class (the fixture itself is a
    // one-time write, not the measured operator)
    "q_schema_evolution",
    // same class over the three-vintage zone: widening happens inside
    // the vectorized reader (no extra pass), rename is one coalesce
    "q_schema_evolution_v2",
    // the streamed variant: the same linear per-batch language agg in
    // micro-batches + a (lang × batches)-sized log fold — the
    // q_stream_index_maintain cost class, already stressed there
    "q_stream_schema_evolution",
    // doc-grain grouped count + one partitioned prefix-sum window —
    // the q_winfunc class; its heavy producer (the tokenize stream) is
    // what the stressed shard queries already pay
    "q_shard_lineage",
    // same plan class as q_shard_lineage (one prefix-sum window / a
    // survivor-filtered variant of it) over the same tokenize stream
    "q_shard_lineage_compact", "q_shard_lineage_forget",
    // same lineage cost class over the streamed store: gate filters
    // (stressed inside q_stream_pipeline) + one prefix-sum window
    "q_stream_pipeline_lineage",
    // as-of manifests: the lineage cost class (per-(shard, gen) token
    // counts + an integer-division fan-out) — strictly less work than
    // q_shard_lineage's per-doc window; no store scan by construction
    "q_shard_asof",
    // same engine over the streamed store's admitted token stream —
    // the gate filters are stressed inside q_stream_pipeline
    "q_stream_pipeline_asof",
    // linear scans / projections / filters / per-row scalar maps
    "q_scan_parquet", "q_project_cast", "q_filter_between", "q_filter_pred",
    "q_round_format", "q_scalar_string", "q_scalar_string2",
    "q_scalar_datemath", "q_scalar_math", "q_scalar_json", "q_array_map",
    "q_explode", "q_map_ops", "q_na_ops", "q_null_handling", "q_udf_scala",
    "q_flatmap_shingles", "q_embed_norm", "q_embed_quantize",
    "q_multimodal_meta", "q_multimodal_features", "q_multimodal_decode",
    "q_text_analysis",
    // hashed-ngram linear scorer: a zero-shuffle per-row map, same class
    // as the heuristic quality gate
    "q_text_quality_model",
    // subword-id sequences: word explode + broadcast dict/vocab joins +
    // one grouped shuffle — linear, same class as q_text_token_ids
    "q_text_bpe_ids", "q_text_unigram_ids",
    // fertility stats: the same word-explode + broadcast-dict join with
    // a lang-cardinality aggregate — strictly less work than bpe_ids
    "q_tokenizer_fertility",
    // byte-fallback encode: the stressed q_bpe_encode's fold/broadcast
    // shape plus a per-row byte decomposition — same scaling class
    "q_bpe_bytes",
    // media-dedup audit: 2x the stressed q_dedup_media plus the pixel
    // ground-truth pass (same banded class) and 1-row flag attaches
    "q_dedup_media_audit",
    // rad-ANN recall audit: the stressed q_simsearch_ann_rad plus the
    // exact-cosine truth (whose super-linear scorer q_simsearch_cosine
    // is already in StressQueries) — audit-only by design
    "q_simsearch_ann_rad_audit",
    // media-search audit: the stressed q_simsearch_media plus the
    // probe-broadcast brute-force truth — audit-only by design (the
    // exact re-score is the thing the banded path exists to avoid)
    "q_simsearch_media_audit",
    // audio-dedup audit: 2x the stressed q_dedup_audio plus the sample
    // ground-truth pass (same banded class) and 1-row flag attaches
    "q_dedup_audio_audit",
    // audio-search audit: the stressed q_simsearch_audio plus the
    // probe-broadcast brute force — audit-only by design
    "q_simsearch_audio_audit",
    // near-dup pipeline audit: reads the memoized pipeline logs (build
    // cost tracked by x_neardup_pipeline_build) plus the brute-force
    // all-pairs exact Jaccard truth — audit-only by design (the banded
    // gate exists to avoid exactly that pass)
    "q_stream_pipeline_neardup_audit",
    // post-eviction statestore read: the stressed q_stream_state_inspect
    // plan family with one more micro-batch and a SMALLER surviving
    // state to read — strictly less offline-read work
    "q_stream_state_evict",
    // tokenizer artifact + coverage curve: vocab-sized plans over the
    // memoized learned dict — never touch the corpus beyond the learning
    // pass, which x_bpe_learn times at 10x
    "q_bpe_vocab", "q_vocab_coverage",
    // one corpus agg with domain-cardinality output / a broadcast-factor
    // pure-map copy decision / a pure map + bounded explode
    // (≈ n_tok/stride rows per doc) — all linear
    "q_mix_weights", "q_mix_sample", "q_text_chunk",
    // mixture materialization: q_mix_sample's plan + a bounded Generate
    // (total output mass ≈ input corpus by the smoothing target) — the
    // same linear class as q_text_chunk's explode
    "q_mix_execute",
    // unigram vocab artifact: vocab-sized plan over the memoized learned
    // dict (the q_bpe_vocab class); its EM learning cost is what
    // q_unigram_encode (stressed) pays in its base-slice pass
    "q_unigram_vocab",
    "q_text_langid", "q_text_quality", "q_text_tokens", "q_text_token_ids",
    "q_text_fingerprint", "q_text_repetition", "q_text_gopher",
    // MG sketch: vocabulary-bounded O(capacity) state per buffer — the
    // whole point is that it does NOT scale with input
    "q_text_heavy_hitters",
    // one keyed count + 1-row stats + TakeOrdered head — single-shuffle
    // linear, the q_agg_groupby class
    "q_profile_skew",
    // single-shuffle aggregations (partial-agg bound, linear map side)
    "q_agg_avg_window5m", "q_agg_collect", "q_agg_cube", "q_agg_distinct",
    "q_agg_dropdup", "q_agg_hll", "q_agg_sketch_rollup", "q_agg_percentile",
    "q_agg_percentile_approx", "q_agg_sliding_window", "q_agg_stats",
    "q_rollup_cube", "q_salted_agg", "q_custom_decimal_avg",
    // bounded-heap top-k agg: linear scan + k-row partials; its
    // super-linear consumer (q_simsearch_cosine's 400M-row scored
    // stream) is already in StressQueries
    "q_custom_topk_agg", "q_pivot_wide",
    "q_unpivot", "q_grouped_map", "q_window_fallback", "q_throttle_dedup",
    "q_session_window_batch",
    // window functions: one shuffle + per-partition sort, linear
    "q_winfunc_rank", "q_winfunc_frame", "q_winfunc_range", "q_winfunc_dist",
    // joins against dim tables absent from the stress corpus (customer/
    // supplier/part/region); their shapes are plan-guarded instead
    "q_join_broadcast", "q_join_smj", "q_join_semi_anti", "q_join_outer",
    "q_join_cross", "q_join_bucketed", "q_join_range_asof",
    "q_join_asof_exec", "q_sql_subquery", "q_sort_limit_topk", "q_setops",
    "q_setops_all", "q_sample_split",
    // fixed-size sink round-trips (5-row results; writer-path covered by
    // q_sink_compaction/q_sink_jdbc_roundtrip/q_sink_text_roundtrip)
    "q_sink_csv_roundtrip", "q_sink_json_roundtrip", "q_sink_orc_roundtrip",
    "q_sink_partitioned",
    // payload fixture is a fixed NPayloads-file corpus by construction
    "q_source_payload_json", "q_stream_source_payload",
    // driver-gate audit companions: their cost profile IS the audited
    // op's (already stressed) plus a bounded window / one-row reduction
    "q_agg_hll_audit", "q_agg_sketch_rollup_audit",
    "q_agg_percentile_approx_audit",
    "q_dedup_minhash_audit", "q_dedup_simhash_audit",
    "q_text_fingerprint_winnow_audit", "q_dedup_embedding_audit",
    "q_simsearch_ann_srp_audit", "q_simsearch_ivf_audit",
    "q_simsearch_ivfpq_audit", "q_text_unigram_audit",
    "q_text_unigram_ids_audit", "q_embed_pca_audit",
    "q_text_heavy_hitters_audit",
    "q_unigram_vocab_audit", "q_unigram_encode_audit",
    "q_cluster_pca_kmeans_audit", "q_dedup_bloom_audit",
    "q_dedup_bloom_bands_audit",
    // watermarked single-window streams already covered by
    // q_stream_tumbling; combine is a 5-row formatting step
    "q_stream_combine",
    // round-8: two keyed aggs + vocab join + per-doc bounded rank window
    // — linear in tokens; a single one-pass profile aggregation whose
    // Expand factor is the fixed column count; and the z-order bucket
    // aggregation (pure map + one bounded-output shuffle)
    "q_text_salient_terms", "q_profile_table", "q_layout_zorder",
    // round-12: the constraint gate is the q_profile_table class — one
    // fact scan, fixed constraint count, broadcast dim-key join; and
    // the Gopher line rules are a pure per-row map (q_text_gopher class)
    "q_expectations", "q_text_gopher_lines",
    // round-10 retrieval tier: term search prunes the token stream to
    // the fixed query's terms BEFORE any shuffle (matching postings
    // only); phrase search is a pure map + filter; hybrid fuses two
    // bounded top-N heads (its corpus-sized inputs are the stressed
    // q_search_index/q_simsearch_cosine cost families)
    "q_search_term", "q_search_phrase", "q_search_hybrid_rrf",
    // pre-filtered subset of the stressed q_simsearch_cosine scan —
    // strictly less scoring work at every replication
    "q_simsearch_filtered",
    // stateless per-row gate ahead of source-cardinality-bounded state
    // (20 rows at any corpus size); the stream fixed costs are covered
    // by the stressed stream family
    "q_stream_quality_gate",
    // one corpus scan (bounded per-doc explode) into vocabulary-bounded
    // category aggregations + a |vocab|-row full-outer join
    "q_profile_drift",
    // behavioral analytics: retention scans events once into a cached
    // user×day working set; the funnel is two pruned scans plus a linear
    // user-keyed purchase shuffle — no event×event join in either
    "q_cohort_retention", "q_funnel_conversion",
    // one windowed aggregation (the stressed q_agg_avg_window5m cost
    // family) + a 5-row moment broadcast + a map-side flag
    "q_anomaly_windows",
    // pure interval filter over the stressed q_scd2_build's windows
    "q_scd2_asof")

  def materialize(s: SparkSession, base: String, rep: Int): String = {
    import s.implicits._
    val name = s"${new java.io.File(base).getName}x$rep"
    val dir = Paths.get("target", "stress", name).toAbsolutePath
    // stamped marker: rebuilds whenever the source corpus regenerates or
    // the replica layout changes (v3 added the customer dim for
    // q_join_skewed; v4 switched to FixtureStamp source fingerprints)
    val marker = dir.resolve("_complete_v3")
    val stamp = graft.FixtureStamp.stamp("v4", base,
      "documents", "events", "embeddings", "lineitem", "orders", "nation", "customer")
    if (graft.FixtureStamp.upToDate(marker, stamp)) return dir.toString
    Files.createDirectories(dir)
    val reps = s.range(rep).select($"id".cast("int").as("rep"))

    def write(df: DataFrame, table: String): Unit =
      df.write.mode("overwrite").parquet(dir.resolve(s"$table.parquet").toString)

    val docs = Tables.documents(s, base)
    write(docs.crossJoin(reps)
      .withColumn("doc_id", $"doc_id" * rep + $"rep")
      .withColumn("text", concat($"text", lit(" r"), $"rep"))
      .withColumn("n_chars", length($"text").cast(docs.schema("n_chars").dataType))
      .drop("rep"), "documents")

    // keep ts in whatever raw vintage the corpus shipped (nanos-as-long or
    // µs-NTZ) so Tables.events' normalize path round-trips on the replica
    write(Tables.rawEvents(s, base).crossJoin(reps)
      .withColumn("event_id", $"event_id" * rep + $"rep")
      .withColumn("user_id", $"user_id" + $"rep".cast("long") * 1000000L)
      .drop("rep"), "events")

    val emb = Tables.embeddings(s, base)
    write(emb.crossJoin(reps)
      .withColumn("vec_id", $"vec_id" * rep + $"rep")
      .withColumn("embedding",
        transform($"embedding",
          x => (x + $"rep".cast("float") * lit(1e-3f)).cast("float")))
      .drop("rep"), "embeddings")

    write(Tables.lineitem(s, base).crossJoin(reps)
      .withColumn("l_orderkey", $"l_orderkey" * rep + $"rep")
      .drop("rep"), "lineitem")

    // orders: fact side of the grouping-sets aggregate — remapped keys,
    // xREP rows (the group-key space is low-cardinality and stays put)
    write(Tables.orders(s, base).crossJoin(reps)
      .withColumn("o_orderkey", $"o_orderkey" * rep + $"rep")
      .drop("rep"), "orders")

    // dim tables ride along unreplicated — at scale the fact side grows,
    // the enrichment dim does not (q_stream_static_join's broadcast side,
    // q_join_skewed's customer dim)
    write(Tables.nation(s, base), "nation")
    write(Tables.customer(s, base), "customer")

    graft.FixtureStamp.complete(marker, stamp)
    dir.toString
  }

  /** Flush dirty pages before timing. A fresh stress-corpus materialize
    * leaves GiBs of async writeback in flight, which lands squarely on
    * the first WRITE-heavy timed query (q_shard_write drew 17.3 s on the
    * fresh-corpus r12 draw vs 6.4–6.9 s on the stamped ones — the
    * round's only >1.5× band). `sync` makes the flush synchronous and
    * BEFORE the timed window instead of during it. */
  private def syncFs(): Unit =
    try new ProcessBuilder("sync").start().waitFor()
    catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_STRESS_REP", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // settle gate (same contract as Bench): refuse to time against a busy
    // box — the round-9 first stress artifact was inflated ~uniformly by
    // running right after a bench+verify burst
    val loadMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_MAX", "8").toDouble
    val settleSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_SETTLE_SEC", "180").toInt
    val deadline = System.nanoTime() + settleSec * 1000000000L
    while (Bench.loadAvg().exists(_ > loadMax) && System.nanoTime() < deadline)
      Thread.sleep(5000)
    val dir = materialize(spark, base, rep)
    syncFs() // fresh-materialize writeback must not bleed into timing

    // the two ngram-jaccard strategies head-to-head at stress scale: the
    // df-skew question decided the round-8 default flip TO prefix-filter
    // (direct 290 s vs prefix 37 s on the regenerated hot-shingle corpus);
    // the direct formulation stays measured here so a future corpus can
    // flip it back on evidence
    val extra: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "x_ngram_direct" ->
        ((s, d) => operators.DedupOps.ngramJaccardPairs(s, d, prefixFilter = false)),
      // the DECLARED q_dedup_ngram_jaccard reads the shared localCheckpoint
      // materialization since round 9 (its stress entry times the read);
      // this extra measures the actual prefix-strategy pair COMPUTATION
      "x_ngram_prefix_filter" ->
        ((s, d) => operators.DedupOps.ngramJaccardPairs(s, d, prefixFilter = true)),
      // likewise: the declared BPE queries read the per-corpus memoized
      // tokenizer; this times the actual learning loop
      "x_bpe_learn" ->
        ((s, d) => operators.BpeOps.learnBpeUncached(s, d)._2),
      // r15: the declared q_stream_pipeline_neardup reads the memoized
      // log pair (its stress entry times the LSM read); this times the
      // actual gated stream build — the cost that used to be double-paid
      // by the audit
      "x_neardup_pipeline_build" -> ((s, d) => {
        val (shardLog, _) = streaming.StreamingOps.buildNdLogs(s, d)
        s.read.parquet(shardLog)
      }),
      // the q_shard_forget blast-radius decomposition (VERDICT r13 task
      // 1, re-derived r15 after the ADVICE r14 parity finding): four
      // points separating the REWRITE-FIXED cost (per-rewrite corpus
      // read + machinery; the tokenize itself is slice-sized — the
      // survivor filter sits directly above the parquet relation, below
      // the explode) from the TOKEN-PROPORTIONAL re-pack cost.
      //   noop      zero rewrites — build + manifest only
      //   shardwipe ids ≡ 4 (mod 8): the WHOLE shard deleted — both
      //             partitions dropped at directory level, ZERO tokens
      //             re-packed → (shardwipe − noop) is the pure fixed
      //             cost of two rewrite passes
      //   bounded   ids ≡ 4 (mod 16): a PARTIAL delete of shard 4 with
      //             non-empty survivors in BOTH generations (gen-1
      //             survivors ≡ 60 mod 80), so the frozen-offset gen-1
      //             re-pack path genuinely executes — the r14 advice's
      //             intent; expect ≈ shardwipe + ~1/16 of the full
      //             token re-pack
      //   declared  the fixture rule hits EVERY partition — fixed +
      //             the full token re-pack (the worst case)
      // An odd residue is never used: gen-1 membership (doc_id % 10 = 0)
      // is even-only, so odd residues silently skip gen 1 entirely.
      "x_shard_forget_bounded" -> ((s, d) => operators.ShardOps
        .forgetVariant(s, d,
          col("doc_id") % (2L * operators.ShardOps.NShards) === 4)),
      "x_shard_forget_shardwipe" -> ((s, d) => operators.ShardOps
        .forgetVariant(s, d,
          col("doc_id") % operators.ShardOps.NShards === 4)),
      "x_shard_forget_noop" -> ((s, d) => operators.ShardOps
        .forgetVariant(s, d, lit(false))),
      // the q_stream_pipeline_forget blast-radius decomposition, same
      // methodology: bounded = a partial delete inside one shard, both
      // generations touched with survivors in both (ids ≡ 4 mod 16 —
      // an even-intersecting residue, the r14 parity lesson); noop =
      // zero partitions (the shared copy + kept-set + manifest fixed
      // cost). The predicate deletes HALF of shard 4, so the
      // token-proportional part is (1/8 shard) × (1/2 survivors):
      // expect (bounded − noop) ≈ fixed-rewrite cost + ~1/16 of the
      // full token re-pack (the x_shard_forget decomposition's model).
      "x_streamstore_forget_bounded" -> ((s, d) => streaming.StreamingOps
        .forgetStreamVariant(s, d, "stream_pipe_store_xb",
          col("doc_id") % (2L * operators.ShardOps.NShards) === 4)),
      "x_streamstore_forget_noop" -> ((s, d) => streaming.StreamingOps
        .forgetStreamVariant(s, d, "stream_pipe_store_xn", lit(false))),
      // the reference DAG end-to-end at 10x payload volume (VERDICT r4
      // task 4): 3000-file landing zone → PayloadJsonSource micro-batches
      // (admission-capped at 256 files/trigger, so the stream takes ~12
      // real batches) → watermarked 5-min window agg on RocksDB state.
      // The returned memory table is the O14 avg_info result.
      "x_reference_pipeline_stream" -> ((s, _) => {
        val pdir = sources.PayloadCorpus.ensure("stress-api-payloads", 3000)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "8")
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")
        val q = api.BitcoinEtl.avgInfoStream(ss, pdir, Some(256))
          .writeStream.format("memory").queryName("stress_avg_info")
          .outputMode("complete")
          .start()
        q.processAllAvailable()
        q.stop()
        ss.table("stress_avg_info")
      }))

    // SPARK_GRAFT_STRESS_ONLY=q1,q2 restricts the run to named entries —
    // for focused multi-draw band measurements (a full pass costs
    // ~12-15 min; a 3-draw band on two queries should not cost 45)
    val only = sys.env.get("SPARK_GRAFT_STRESS_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val allFull = StressQueries.map(n => n -> SparkEntry.queries(n)) ++ extra
    val all = only.fold(allFull)(o => allFull.filter(p => o.contains(p._1)))
    all.foreach { case (_, fn) => // warm-up: JIT + staging materialization
      try fn(spark, dir).count() catch { case _: Throwable => () }
      spark.sharedState.cacheManager.clearCache()
    }
    syncFs() // warm-up wrote shard/sink artifacts; flush before timing
    // interleaved multi-pass + per-query median, same defence as Bench:
    // one 28 GiB JVM driving 47 10×-scale queries takes multi-second GC
    // pauses that land on RANDOM entries (a pure per-row map swung
    // 2.6 s ↔ 14.6 s across single-pass round-9 runs) — a lone pass
    // makes the artifact a lottery. With 2 passes the median is the
    // lower value (contention-only noise over-estimates, so min is
    // closer to truth); a query failing in ANY pass reports "fail".
    val passes = sys.env.getOrElse("SPARK_GRAFT_STRESS_PASSES", "2").toInt
    val samples = (1 to passes).map { _ =>
      all.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, dir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"STRESS-FAIL $name: ${e.getClass.getName}: " +
              String.valueOf(e.getMessage).take(500))
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        name -> (if (ok) Some(dt) else None)
      }.toMap
    }
    val results = all.map { case (name, _) =>
      val rs = samples.map(_(name))
      name -> (if (rs.exists(_.isEmpty)) None
               else Some(Bench.median(rs.flatten)))
    }
    def f(v: Double): String =
      "%.1f".formatLocal(java.util.Locale.ROOT, v)
    // failures surface as "fail" (not a fake negative timing) and are
    // EXCLUDED from the total, so one red query can't corrupt the metric
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v.map(f).getOrElse("\"fail\"") }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val nFail = results.count(_._2.isEmpty)
    if (nFail > 0) System.err.println(s"STRESS: $nFail queries failed")
    val sfName = s"${new java.io.File(base).getName}x$rep"
    println(s"""{"metric":"stress_total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfName"}""")
    spark.stop()
  }
}
