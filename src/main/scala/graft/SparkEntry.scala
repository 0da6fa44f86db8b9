package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY.md §2 (or a
  * north-star LLM-pipeline operator) expressed Spark-first; `oracleSql`
  * holds the DuckDB-equivalent SQL for each SQL-expressible one. Oracle
  * parity rules (see operators/Tables.scala): exact-decimal money sums
  * surfaced as double, sequential double folds for vector math, explicit
  * sort keys everywhere.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticsQueries.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference index surface (SURVEY §2 A-G) over the test corpus
    "a6_refcounts" -> (IndexQueries.a6Refcounts _),
    "b1_exists" -> (IndexQueries.b1Exists _),
    "b2_point_lookup" -> (IndexQueries.b2PointLookup _),
    "b4_semi_join" -> (IndexQueries.b4SemiJoin _),
    "c1_position_lookup" -> (IndexQueries.c1PositionLookup _),
    "d1_list_prefix" -> (IndexQueries.d1ListPrefix _),
    "e1_index_stats" -> (IndexQueries.e1IndexStats _),
    "e3_object_rollup" -> (IndexQueries.e3ObjectRollup _),
    "f1_gc_orphans" -> (IndexQueries.f1GcOrphans _),
    "g1_reconstruct" -> (IndexQueries.g1Reconstruct _),
    // --- CDC chunker exposed as a query — ORACLED: the MD5 window scan is
    // expressible in SQL (all window starts are multiples of shiftCount,
    // so per-position fires + a recursive boundary walk reproduce the
    // chunker exactly; see the a3 entry in oracleSql)
    "a3_cdc_chunks" -> (ChunkQueries.a3CdcChunks _),
    "g2_ranged_read" -> (ChunkQueries.g2RangedRead _),
    // --- generic analytics (north_star: joins/windows/aggs first-class)
    "q1_pricing_summary" -> (AnalyticsQueries.q1PricingSummary _),
    "q3_top_revenue" -> (AnalyticsQueries.q3TopRevenue _),
    "q4_order_priority" -> (AnalyticsQueries.q4OrderPriority _),
    "q5_region_revenue" -> (AnalyticsQueries.q5RegionRevenue _),
    "q10_returned_revenue" -> (AnalyticsQueries.q10ReturnedRevenue _),
    "q11_revenue_share" -> (AnalyticsQueries.q11RevenueShare _),
    "q21_waiting_supplier" -> (AnalyticsQueries.q21WaitingSupplier _),
    "q18_large_orders" -> (AnalyticsQueries.q18LargeOrders _),
    "q14_promo_share" -> (AnalyticsQueries.q14PromoShare _),
    "q7_volume_shipping" -> (AnalyticsQueries.q7VolumeShipping _),
    "q13_order_distribution" -> (AnalyticsQueries.q13OrderDistribution _),
    "q22_dormant_balance" -> (AnalyticsQueries.q22DormantBalance _),
    "q15_top_supplier" -> (AnalyticsQueries.q15TopSupplier _),
    "q17_small_quantity" -> (AnalyticsQueries.q17SmallQuantity _),
    "q19_disjunctive" -> (AnalyticsQueries.q19DisjunctiveRevenue _),
    "q8_market_share" -> (AnalyticsQueries.q8MarketShare _),
    "q16_supplier_variety" -> (AnalyticsQueries.q16SupplierVariety _),
    // q2/q9/q12/q20: the four TPC-H shapes the corpus previously lacked,
    // adapted (no partsupp → lineitem supply edges + p_retailprice cost
    // proxy; no shipmode → ship-delay buckets); completes all 22 shapes
    "q2_min_cost_supplier" -> (AnalyticsQueries.q2MinCostSupplier _),
    "q9_product_profit" -> (AnalyticsQueries.q9ProductProfit _),
    "q12_late_priority" -> (AnalyticsQueries.q12LatePriority _),
    "q20_excess_supply" -> (AnalyticsQueries.q20ExcessSupply _),
    "w4_trailing_revenue" -> (AnalyticsQueries.w4TrailingRevenue _),
    "w1_top_per_brand" -> (AnalyticsQueries.w1TopPerBrand _),
    "w2_running_revenue" -> (AnalyticsQueries.w2RunningRevenue _),
    "w3_topk_agg" -> (AnalyticsQueries.w3TopKAgg _),
    "r1_rollup" -> (AnalyticsQueries.r1Rollup _),
    "r2_cube" -> (AnalyticsQueries.r2Cube _),
    "r3_grouping_sets" -> (AnalyticsQueries.r3GroupingSets _),
    "s3_bag_set_ops" -> (AnalyticsQueries.s3BagSetOps _),
    "w5_window_suite" -> (AnalyticsQueries.w5WindowSuite _),
    // w6: strict-sequence funnel via stacked running-min windows
    "w6_funnel" -> (AnalyticsQueries.w6Funnel _),
    "p1_percentiles" -> (AnalyticsQueries.p1Percentiles _),
    // p2b replaces the r1-11 p2_approx_percentiles row (retired r12): the
    // KLL sketch's rank-envelope contract — previously a bounded-pass only
    // the LOCAL gate could see (driver recorded `no_oracle` forever) — is
    // now computed in-query and emitted as a 0/1 verdict column, so the
    // driver hash-matches it like any other row. The raw sketch API keeps
    // its own coverage in QueryPropertiesSpec.
    "p2b_percentile_audit" -> (AnalyticsQueries.p2bPercentileAudit _),
    "s2_exact_stats" -> (AnalyticsQueries.s2ExactStats _),
    "s1_set_ops" -> (AnalyticsQueries.s1SetOps _),
    "j1_asof_join" -> (JoinQueries.j1AsofJoin _),
    "j2_range_bucket" -> (JoinQueries.j2RangeBucket _),
    // j3: interval×interval overlap via the 1-hour grid-cell equi-join
    // (complete prefilter + exact re-check = the quadratic answer)
    "j3_interval_overlap" -> (JoinQueries.j3IntervalOverlap _),
    "t1_events_hourly" -> (AnalyticsQueries.t1EventsHourly _),
    // t3: epoch-aligned integer weeks; one user_id exchange serves
    // activity dedup, cohort min, and the join
    "t3_cohort_retention" -> (AnalyticsQueries.t3CohortRetention _),
    "t4_gap_fill" -> (AnalyticsQueries.t4GapFill _),
    "t5_ewma_smooth" -> (AnalyticsQueries.t5EwmaSmooth _),
    "j4_interval_anti" -> (JoinQueries.j4IntervalAntiJoin _),
    "w7_basket_pairs" -> (AnalyticsQueries.w7BasketPairs _),
    "r4_pivot_matrix" -> (AnalyticsQueries.r4PivotMatrix _),
    "m4_frame_sample" -> (operators.MultimodalOps.mm4FrameSample _),
    "p3_cms_topk" -> (AnalyticsQueries.p3CmsTopk _),
    // p5: exact heavy hitters through a wide-CMS prefilter — the sketch
    // prunes the exact agg's exchange, never the answer
    "p5_heavy_hitters" -> (AnalyticsQueries.p5HeavyHitters _),
    // p6: KMV (bottom-k) cross-corpus shingle-overlap estimation with
    // exact audit lanes — deterministic given the md5 hash, so exact-MATCH
    "p6_kmv_overlap" -> (DedupQueries.p6KmvOverlap _),
    "r5_unpivot" -> (AnalyticsQueries.r5Unpivot _),
    "t2_sessionize" -> (AnalyticsQueries.t2Sessionize _),
    // k1: salted join + two-phase agg over a synthesized heavy hitter —
    // salting is output-invariant, so a plain SQL oracle checks it
    "k1_salted_join" -> (SkewOps.k1SaltedJoin _),
    // k2: the same skew, mitigated by AQE's runtime skew-join split
    // instead of manual salting (AqeSkewSpec asserts the split fires)
    "k2_aqe_skew" -> (SkewOps.k2AqeSkewJoin _),
    // t6: trailing-7 rolling anomaly flags, z-test cross-multiplied into
    // exact decimal arithmetic (no sqrt/divide)
    "t6_anomaly_flags" -> (AnalyticsQueries.t6AnomalyFlags _),
    // w8: first/last-touch attribution via lexicographic struct argmin/max
    "w8_attribution" -> (AnalyticsQueries.w8Attribution _),
    // m5: multimodal (text+patch/sample tokens) sequence packing
    "m5_multimodal_pack" -> (operators.MultimodalOps.mm5MultimodalPack _),
    // t7: day-of-week seasonal baseline + residual (one IEEE divide)
    "t7_seasonal_residual" -> (AnalyticsQueries.t7SeasonalResidual _),
    // w9: session event-type transition (bigram) matrix + row shares
    "w9_transition_matrix" -> (AnalyticsQueries.w9TransitionMatrix _),
    // j5: nearest-event join (bidirectional as-of, ±1 day horizon)
    "j5_nearest_join" -> (JoinQueries.j5NearestJoin _),
    // v13: cell-bounded range (radius) search at dot >= 0.15
    "v13_range_search" -> (SimilarityQueries.v13RangeSearch _),
    // p4: equi-width histogram with decimal-exact per-bin mass
    "p4_histogram" -> (AnalyticsQueries.p4Histogram _),
    // x15: LSH bucket-occupancy tuning profile over x6's banding
    "x15_lsh_profile" -> (DedupQueries.x15LshBucketProfile _),
    // z6: per-source output-shard bin-pack manifest (whole-doc units)
    "z6_shard_binpack" -> (LayoutOps.z6ShardBinpack _),
    // t8: CUSUM drift detection — exact integer recursion over the tiny
    // per-day series (t6 catches spikes; CUSUM catches persistent shifts)
    "t8_cusum_drift" -> (AnalyticsQueries.t8CusumDrift _),
    // r6: SCD2 history build — versioned [valid_from, valid_to) runs
    "r6_scd2_history" -> (AnalyticsQueries.r6Scd2History _),
    // y18: BM25 top-50 retrieval scoring (rational idf, libm-free)
    "y18_bm25" -> (TextQueries.y18Bm25 _),
    // m6: media payload dedupe by decode-pass content hash
    "m6_media_dedup" -> (operators.MultimodalOps.mm6MediaDedup _),
    // w10: association rules (support/confidence/lift) over w7's pairs
    "w10_assoc_rules" -> (AnalyticsQueries.w10AssocRules _),
    // v14: quantizer drift audit — centroid divergence + membership churn
    // between the old-slice (v8) and full-corpus (v5) quantizers
    "v14_quantizer_drift" -> (SimilarityQueries.v14QuantizerDrift _),
    // j6: fact-to-SCD2 point-in-time lookup — r6's consumer side
    "j6_scd2_lookup" -> (JoinQueries.j6Scd2Lookup _),
    // n1: PageRank (2 damped power iterations) over the part co-purchase
    // graph — iterative graph analytics beyond x7's components
    "n1_pagerank" -> (GraphOps.n1Pagerank _),
    // t9: weekly OHLC downsampling (open/close via the struct-argmin bridge)
    "t9_weekly_ohlc" -> (AnalyticsQueries.t9WeeklyOhlc _),
    // n2: HITS hubs/authorities over the bipartite customer-part graph
    // (L1-normalized half-steps — sqrt-free, bitwise-portable)
    "n2_hits" -> (GraphOps.n2Hits _),
    // n3: k-hop BFS reachability from the lowest part key (exact set algebra)
    "n3_khop_reach" -> (GraphOps.n3KhopReach _),
    // n4: weighted SSSP — delta-relaxed Bellman-Ford (≤3 edges) over the
    // co-purchase graph; exact integer edge lengths, 20 nearest parts
    "n4_sssp" -> (GraphOps.n4Sssp _),
    // n5: degree-oriented triangle counting (√(2m)-bounded wedge fan-out)
    "n5_triangles" -> (GraphOps.n5Triangles _),
    // n7: exact local triangle counts on a capped deterministic vertex
    // sample — the n-family row whose oracle cost stays FLAT with corpus
    // scale (sample-bounded neighbor-pair probes, not wedge enumeration),
    // built to re-gate the graph lanes at sf1/sf3
    "n7_local_triangles" -> (GraphOps.n7LocalTriangles _),
    // n6: synchronous label-propagation communities (deterministic
    // (mass desc, label asc) tie order), top-20 community sizes
    "n6_label_prop" -> (GraphOps.n6LabelProp _),
    // --- dedupe pipeline (north_star)
    "x1_exact_dup_stats" -> (DedupQueries.x1ExactDupStats _),
    "x2_normalized_dup" -> (DedupQueries.x2NormalizedDup _),
    "x3_ngram_jaccard" -> (DedupQueries.x3NgramJaccardPairs _),
    "x4_minhash_lsh" -> (DedupQueries.x4MinhashLsh _),
    "x5_simhash_pairs" -> (DedupQueries.x5SimhashPairs _),
    "x6_embedding_cosine" -> (DedupQueries.x6EmbeddingCosine _),
    "x7_dup_clusters" -> (DedupQueries.x7DupClusters _),
    "x8_contamination" -> (DedupQueries.x8Contamination _),
    // x12: x8's exact output via a broadcast Bloom prefilter on the
    // bounded eval side — same answer, the map-side-pruned physical plan
    "x12_bloom_decontaminate" -> (DedupQueries.x12BloomDecontamination _),
    // x14: ExactSubstr spans — dup 8-grams merged into maximal ranges
    "x14_substring_spans" -> (DedupQueries.x14SubstringSpans _),
    "x9_common_spans" -> (DedupQueries.x9CommonSpans _),
    "x10_dedup_keep" -> (DedupQueries.x10DedupKeep _),
    // x11: cross-run incremental dedupe — a NEW batch (doc_id % 7 slice)
    // near-dup-checked against the EXISTING remainder via the same banding;
    // keep/drop verdict per new doc with the best verified old match
    "x11_incremental_dedup" -> (DedupQueries.x11IncrementalDedup _),
    // x16: x11 after a standing-corpus RETRACTION (opt-out/takedown) —
    // the dedupe-index F1 verb, masked inside the band join (v23's
    // never-post-verdict rule: second-best evidence must be re-verified,
    // not patched in)
    "x16_index_retract" -> (DedupQueries.x16IndexRetract _),
    // z2: the increment of z1 — today's batch gated by quality + repetition
    // + x11's dedupe-against-the-index verdict, rolled up per source
    "z2_incremental_curation" -> (DedupQueries.z2IncrementalCuration _),
    // z1 composes the y2/y8/x10 filters into the end-to-end curation
    // sign-off table (per-source totals, survivors, surviving tokens)
    "z1_curation_survivors" -> (DedupQueries.z1CurationSurvivors _),
    // --- text analysis (north_star)
    "y1_token_stats" -> (TextQueries.y1TokenStats _),
    "y2_quality_score" -> (TextQueries.y2QualityScore _),
    "y3_langid" -> (TextQueries.y3LangIdHeuristic _),
    "y4_fingerprint" -> (TextQueries.y4Fingerprint _),
    "y5_json_props" -> (TextQueries.y5JsonProps _),
    "y6_bpe_tokens" -> (TextQueries.y6BpeTokens _),
    "y7_hash_sample" -> (TextQueries.y7HashSample _),
    "y8_repetition" -> (TextQueries.y8Repetition _),
    "y9_quality_deciles" -> (TextQueries.y9QualityDeciles _),
    "y10_mixture_resample" -> (TextQueries.y10MixtureResample _),
    "y11_lexical_diversity" -> (TextQueries.y11LexicalDiversity _),
    "y12_pii_scrub" -> (TextQueries.y12PiiScrub _),
    "y16_nfc_clean" -> (TextQueries.y16NfcClean _),
    "y17_markup_strip" -> (TextQueries.y17MarkupStrip _),
    "y13_source_cap" -> (TextQueries.y13SourceCap _),
    // y14: log-free unigram-LM typicality — integer cross-multiplied
    // verdicts, so the flag involves no floating point at all
    "y14_unigram_typicality" -> (TextQueries.y14UnigramTypicality _),
    // y19: y14 extended to the order-2 (bigram) LM — the word-salad catch
    "y19_bigram_typicality" -> (TextQueries.y19BigramTypicality _),
    // y20: token-frequency spectrum (Zipf octaves) per source — exact
    // integer bit-length bucketing, no libm
    "y20_freq_spectrum" -> (TextQueries.y20FreqSpectrum _),
    // y15: per-doc TF-IDF top terms with rational idf (log-free ranking)
    "y15_tfidf_terms" -> (TextQueries.y15TfIdfTerms _),
    // y21: incoming-batch vocabulary drift vs the standing corpus — the
    // ingest-gate distribution check; top-30 per-token probability shifts
    "y21_corpus_drift" -> (TextQueries.y21CorpusDrift _),
    // st16: y21's drift table maintained ON the ingest stream (Complete-
    // mode vocab aggregation); counting is associative, so the streamed
    // result hash-matches the batch oracle verbatim
    "st16_stream_drift" ->
      (graft.streaming.CorpusStreamDrift.st16StreamDrift _),
    // st17: st14's ingest-time rejection on the VISION side — incoming
    // images fingerprinted (real decode + dHash) and admitted/dropped
    // against the standing corpus' band index per micro-batch
    "st17_stream_phash_admit" ->
      (graft.streaming.MediaStreamDedup.st17StreamPhashAdmit _),
    // st18: p6's KMV sketch maintained ON the ingest stream — a running
    // mergeable bottom-k per micro-batch; mergeability makes the streamed
    // sketch equal the batch one, so it shares p6's oracle verbatim
    "st18_stream_kmv" -> (graft.streaming.CorpusStreamKmv.st18StreamKmv _),
    // st19: st17's AUDIO twin — arriving clips decoded through the real
    // WAV parser and gated at ingest (clipping ceiling, loudness floor,
    // content-fingerprint dedupe vs the curated standing store)
    "st19_stream_audio_admit" ->
      (graft.streaming.CorpusStreamAudio.st19StreamAudioAdmit _),
    // st20: the streaming LAKEHOUSE WRITER — micro-batch ingest appending
    // each batch along the Hilbert curve into z10's shard layout; a row's
    // shard is a pure function of the row, so the landed lake is
    // carving-independent and the row shares z10's oracle verbatim
    "st20_stream_hilbert_sink" ->
      (graft.streaming.LakeStreamWriter.st20StreamHilbertSink _),
    "z3_sequence_pack" -> (TextQueries.z3SequencePack _),
    // z4: md5-keyed 80/10/10 split, stratification audited per source
    "z4_stratified_split" -> (TextQueries.z4StratifiedSplit _),
    "z5_zorder_layout" -> (LayoutOps.z5ZorderLayout _),
    // z7: zone-map skip audit — one predicate vs three layouts (z-order /
    // day-sorted / qty-sorted): zones scanned, rows read, true matches
    "z7_zone_skip" -> (LayoutOps.z7ZoneSkip _),
    // z9: Hilbert curve vs z-order head-to-head — per (layout, rectangle)
    // zone-map pruning audit on the shared 8-bit quantization grid
    "z9_hilbert_layout" -> (LayoutOps.z9HilbertLayout _),
    // z10 ships z9's measured winner: a real sharded parquet writer cutting
    // files along the Hilbert curve, audited by reading the landed files
    "z10_hilbert_export" -> (LayoutOps.z10HilbertExport _),
    // z8: the composed export — x10 survivors → z3 packing → fixed-token
    // shards LANDED as partitioned parquet; manifest read back from disk
    "z8_shard_export" -> (ExportOps.z8ShardExport _),
    // --- similarity search (north_star)
    "v1_cosine_topk" -> (SimilarityQueries.v1CosineTopK _),
    "v2_ann_lsh" -> (SimilarityQueries.v2AnnLsh _),
    "v3_label_centroids" -> (SimilarityQueries.v3LabelCentroids _),
    "v4_ivf_search" -> (SimilarityQueries.v4IvfSearch _),
    // v22: filtered vector search — metadata-constrained top-k with the
    // probe list widened to 2 cells to recover filter-thinned recall
    "v22_filtered_ann" -> (SimilarityQueries.v22FilteredAnn _),
    "v5_ivf_kmeans" -> (SimilarityQueries.v5IvfKmeans _),
    "v6_knn_join" -> (SimilarityQueries.v6KnnJoin _),
    // v7: v6's kNN self-join cell-bounded by the k-means quantizer instead
    // of the supervised label — the nlist-scales-with-corpus contract in
    // code (k parameterized; driver runs k=10 to match the unrolled oracle)
    "v7_knn_kmeans" -> ((s: SparkSession, dir: String) =>
      SimilarityQueries.v7KnnKmeans(s, dir)),
    // v8: the index-maintenance increment — new batch assigned to the
    // quantizer trained on the existing remainder only (no retraining)
    "v8_incremental_ivf" -> (SimilarityQueries.v8IncrementalIvf _),
    // v15: the nlist ≈ √N contract executed — k = max(10, ⌊√N⌋) derived
    // from one counted scalar, quantizer built at that k, cell-occupancy
    // table out (the v-family's last prose-only scale claim, now run)
    "v15_auto_nlist" -> (SimilarityQueries.v15AutoNlist _),
    // v16: two-stage ANN serving — IVFADC top-20 shortlist, then exact
    // raw-vector re-rank of the survivors (the production read path)
    "v16_rerank" -> (SimilarityQueries.v16Rerank _),
    // v17: measured recall@5 of the two-stage index vs the exact scan,
    // per nprobe setting — the tuning table for the IVF recall/cost dial
    "v17_recall_audit" -> (SimilarityQueries.v17RecallAudit _),
    // v18: v16's two-stage serve with nprobe=4 — each query probes its 4
    // nearest coarse cells (the knob v17's audit measures)
    "v18_multiprobe" -> (SimilarityQueries.v18Multiprobe _),
    // x13: SemDeDup — within-k-means-cell near-duplicate drop verdicts
    // (registered with the x dedupe family; lives with the quantizer)
    "x13_semantic_dedup" -> (SimilarityQueries.x13SemanticDedup _),
    // v9: product quantization — 4×16-dim subspace codes + additive
    // reconstruction similarity (the PQ compression layer past IVF)
    "v9_product_quantization" -> (SimilarityQueries.v9ProductQuantization _),
    "v10_pq_adc" -> (SimilarityQueries.v10PqAdcSearch _),
    "v11_sq8_search" -> (SimilarityQueries.v11Sq8Search _),
    "v12_ivf_adc" -> (SimilarityQueries.v12IvfAdc _),
    // v19: v12's read path served from the PERSISTED index (VersionedTable
    // centroids/codebooks/codes — train-once/serve-many); same oracle SQL
    // as v12 because persist→reopen→serve must lose nothing
    "v19_persisted_serve" -> (operators.AnnIndexStore.v19PersistedServe _),
    // v20: the IVFADC serve as a pure JOIN dataflow (O(1) expression
    // size — the production-query-volume form; inline path is v12) —
    // same oracle as v12 because the arithmetic must be bitwise-identical
    "v20_adc_join_serve" -> (SimilarityQueries.v20AdcJoinServe _),
    // v21: the index-maintenance lifecycle — old-slice-trained index
    // persisted, the increment encoded FROM STORAGE and appended (an
    // O(new) VersionedTable commit), then served over old+new
    "v21_index_append" -> (operators.AnnIndexStore.v21IndexAppend _),
    // v23: the DELETE verb on the vector index — tombstone-masked serve
    // (the mask anti-joins INSIDE the candidate path, never post-rank)
    "v23_index_delete" -> (operators.AnnIndexStore.v23IndexDelete _),
    // v24: time-travel reads over the index lifecycle — each retained
    // manifest version reads back as exactly the row set it published
    "v24_time_travel" -> (operators.AnnIndexStore.v24TimeTravel _),
    // st21: v23's deletions arriving ON A STREAM — each micro-batch lands
    // as a durable tombstone commit (VersionedTable append); the final
    // serve shares v23's oracle (set union is carving-independent)
    "st21_stream_index_delete" ->
      (graft.streaming.IndexStreamMaintenance.st21StreamIndexDelete _),
    // q6b replaces the r1-11 q6_approx_distinct row (retired r12) — same
    // move as p2b: the HLL++ 3*rsd error contract emitted as data.
    "q6b_distinct_audit" -> (AnalyticsQueries.q6bDistinctAudit _),
    // --- multimodal binary plumbing (north_star; decode step is a
    //     deterministic stub, so the oracle re-derives its sha256 math)
    "m1_media_summary" -> (MultimodalOps.mm1MediaSummary _),
    "m2_frame_stats" -> (MultimodalOps.mm2FrameStats _),
    "m3_resize_summary" -> (MultimodalOps.mm3ResizeSummary _),
    // m7: the REAL javax.imageio codec end-to-end — synthetic PNGs whose
    // pixels are integer functions of doc_id, so the oracle re-derives
    // true decoded geometry + per-band luma features in SQL
    "m7_real_decode" -> (MultimodalOps.m7RealDecode _),
    // m8: perceptual (dHash) near-dup images over real decoded pixels —
    // banded Hamming join, never all-pairs
    "m8_phash_near_dup" -> (MultimodalOps.m8PhashNearDup _),
    // m9: the audio lane — real s16le PCM decode, per-window
    // loudness/peak/zero-crossing features, integer-exact
    "m9_audio_pcm" -> (MultimodalOps.m9AudioPcmFeatures _),
    // m10: the video lane — container walk (magic + length-prefixed
    // frames) + per-frame real decode, per-(doc, frame) brightness table
    "m10_video_frames" -> (MultimodalOps.m10VideoFrames _),
    // --- streaming engine driven end-to-end, ORACLED: the streaming aggs
    //     accumulate in decimal (order-independent), so the finalized
    //     Append-mode output is bit-identical to the batch/DuckDB answer.
    //     Production Append path: incremental emit + bounded state; the
    //     drained finite source's tail windows are flushed by an explicit
    //     watermark advance (see EventStreamOps.runToMemoryAppend). The
    //     post-stream select only reshapes finalized rows for the oracle
    //     (hour string / epoch-µs session start).
    "st1_stream_hourly" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventStreamOps.runToMemoryAppend(s, s"$dir/events.parquet",
        s"st1_${System.nanoTime()}", graft.streaming.EventStreamOps.hourlyByType)
        .select(
          date_format(col("hour_start"), "yyyy-MM-dd HH").as("hour"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour", "event_type")),
    //     st3: streaming exact-dedupe (dropDuplicatesWithinWatermark) under
    //     an at-least-once source that delivers EVERY event twice — the
    //     deduped hourly rollup must collapse to the single-copy batch
    //     answer, so the oracle is st1's exactly-once SQL verbatim. Two
    //     chained stateful operators (dedupe -> windowed agg), bounded
    //     state on both.
    "st3_stream_dedup" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventStreamOps.runToMemoryAppendReplayed(s, s"$dir/events.parquet",
        s"st3_${System.nanoTime()}",
        e => graft.streaming.EventStreamOps.hourlyAgg(
          graft.streaming.EventStreamOps.dedupedEvents(e)),
        copies = 2)
        .select(
          date_format(col("hour_start"), "yyyy-MM-dd HH").as("hour"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour", "event_type")),
    //     st4: watermark-bounded stream-stream interval join (clicks to the
    //     same user's views from the preceding 30 minutes) — inner matches
    //     emit as soon as both rows arrive; the watermark only bounds join
    //     state. Oracle = the equivalent batch interval join; timestamps
    //     surface as integer epoch-µs on BOTH sides (the source is ns
    //     precision, so the oracle compares at the same truncated µs the
    //     stream sees).
    "st4_stream_join" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventStreamOps.runToMemoryAppend(s, s"$dir/events.parquet",
        s"st4_${System.nanoTime()}", graft.streaming.EventStreamOps.clickViewJoin)
        .select(col("click_id"), col("user_id"),
          unix_micros(col("click_ts")).as("click_ts_us"),
          col("view_id"), unix_micros(col("view_ts")).as("view_ts_us"))
        .orderBy("click_id", "view_id")),
    //     st6: SLIDING windows (1 h every 15 min) — each event contributes
    //     to exactly 4 overlapping windows; decimal-exact count/sum, so the
    //     finalized Append output hash-matches the batch SQL that unrolls
    //     the 4 per-event window memberships. Window starts surface as
    //     integer epoch-µs (epoch-aligned 15-min grid in both engines).
    "st6_stream_sliding" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventStreamOps.runToMemoryAppend(s, s"$dir/events.parquet",
        s"st6_${System.nanoTime()}", graft.streaming.EventStreamOps.slidingByType)
        .select(unix_micros(col("win_start")).as("win_start_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start_us", "event_type")),
    //     st5: LEFT-OUTER watermark-bounded stream-stream join — every view
    //     attributed to a same-user click within the NEXT 30 minutes, or
    //     emitted with a NULL click once the click watermark passes its
    //     match window (the heartbeat/flush mechanics that make a finite
    //     replay release the unmatched tail live in viewClickOuterJoin;
    //     their self-matched rows carry negative ids and are dropped after
    //     materialization). Oracle = the equivalent batch LEFT JOIN at
    //     integer epoch-µs, NULLs included — the hash-match proves the
    //     outer side's watermark-driven NULL emission is exactly batch.
    "st5_stream_outer_join" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventStreamOps.runToMemoryAppend(s, s"$dir/events.parquet",
        s"st5_${System.nanoTime()}", graft.streaming.EventStreamOps.viewClickOuterJoin)
        .filter(col("view_id") >= 0)
        .select(col("view_id"), col("user_id"),
          unix_micros(col("view_ts")).as("view_ts_us"),
          col("click_id"), unix_micros(col("click_ts")).as("click_ts_us"))
        .orderBy("view_id", "click_id")),
    //     st7: STREAM-STATIC join — the stateless enrichment shape (vs the
    //     stateful stream-stream st4/st5): purchases joined per micro-batch
    //     to the static customer dim (broadcast at dim size). No watermark,
    //     no state, no flush tail needed; per-row output is deterministic,
    //     so the oracle is the plain batch join.
    "st7_stream_static_join" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventStreamOps.runToMemoryAppend(s, s"$dir/events.parquet",
        s"st7_${System.nanoTime()}",
        e => graft.streaming.EventStreamOps.purchaseEnrich(e,
          graft.operators.Tables.t(e.sparkSession, dir, "customer")),
        flushTail = false)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("value"), col("c_name"), col("c_mktsegment"))
        .orderBy("event_id")),
    //     st9: the vector-index increment as a STREAM — new embeddings
    //     assigned to the batch-trained quantizer (stream-static with a
    //     model static side; stateless, no watermark). Must hash-match
    //     batch v8 (shared oracle).
    //     st10: the curation ADMIT gate as a stream — the doc_id%7
    //     increment replayed one file per micro-batch through z1's quality
    //     formulas + a prefix-digest stream-static check against the
    //     existing corpus; stateless end to end, verdicts emit the batch
    //     they arrive. The oracle is the identical batch SQL.
    "st10_stream_admit" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventStreamOps.runDocAppend(s, dir,
        s"st10_${System.nanoTime()}",
        _.filter(col("doc_id") % 7 === 0),
        docs => graft.operators.TextQueries.st10AdmitGate(docs,
          graft.operators.Tables.t(docs.sparkSession, dir, "documents")
            .filter(col("doc_id") % 7 =!= 0)))
        .orderBy("doc_id")),
    // st11: the CMS built ON THE STREAM (Complete mode, O(1) state — see
    // EventStreamOps.streamUserCms), then p3's calibration report over the
    // batch true counts. The oracle rebuilds the sketch in SQL, so the
    // hash-match proves stream-built cells == batch-derived cells.
    "st11_stream_cms" -> ((s: SparkSession, dir: String) => {
      val sketch = graft.streaming.EventStreamOps.streamUserCms(
        s, s"$dir/events.parquet", s"st11_${System.nanoTime()}")
      AnalyticsQueries.cmsReport(
        graft.operators.Tables.t(s, dir, "events").select(col("user_id").as("key")),
        "user_key", sketch)
    }),
    "st9_stream_ivf_assign" -> ((s: SparkSession, dir: String) =>
      graft.streaming.VectorStreamOps.streamIvfAssign(s, dir,
        s"st9_${System.nanoTime()}")
        .select(col("vec_id"), col("cell"), round(col("s"), 6).as("score"))
        .orderBy("vec_id")),
    //     st2: native session_window sessions (streaming face of t2);
    //     session identity for the oracle is (user_id, start epoch-µs)
    "st2_stream_sessions" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventStreamOps.runToMemoryAppend(s, s"$dir/events.parquet",
        s"st2_${System.nanoTime()}", graft.streaming.EventStreamOps.sessionizeByUser)
        .filter(org.apache.spark.sql.functions.col("user_id") >= 0)
        .select(col("user_id"), unix_micros(col("session_start")).as("session_start_us"),
          col("n_events"), col("session_value"))
        .orderBy("user_id", "session_start_us")),
    //     st8: the SAME sessions via the hand-rolled custom-state machine
    //     (flatMapGroupsWithState + EventTimeTimeout + Append, emitting only
    //     watermark-finalized sessions) — shares st2's oracle VERBATIM, so
    //     the hash-match proves the state machine reproduces the native
    //     session_window operator exactly, micro-batch carving and all.
    "st8_stream_custom_sessions" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventStreamOps.runToMemoryAppend(s, s"$dir/events.parquet",
        s"st8_${System.nanoTime()}", graft.streaming.EventStreamOps.customSessions)
        .orderBy("user_id", "session_start_us")),
    // st12: SCD2 maintained on the stream — closed runs emit the moment
    //     the watermark proves the boundary; the open run is exactly what
    //     an unbounded stream cannot finalize, so the oracle is the batch
    //     SCD2 (r6) restricted to valid_to IS NOT NULL. The hash-match
    //     proves the incremental dimension equals the nightly rebuild.
    "st12_stream_scd2" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventStreamOps.runToMemoryAppend(s, s"$dir/events.parquet",
        s"st12_${System.nanoTime()}", graft.streaming.EventStreamOps.streamScd2)
        .orderBy("user_id", "version")),
    // st13: streaming JSONL corpus ingest with quarantine — the batch
    // source contract (explicit schema, PERMISSIVE + quarantine) proven
    // micro-batch by micro-batch; deterministic torn-line evidence
    "st13_stream_jsonl_ingest" ->
      (graft.streaming.CorpusStreamIngest.st13StreamJsonlIngest _),
    // st14: ingest-time near-dup rejection — x11's verdict computed per
    // micro-batch against the static old-corpus LSH index (foreachBatch;
    // stateless across batches, so the batch oracle is exact)
    "st14_stream_ingest_dedup" ->
      (graft.streaming.CorpusStreamDedup.st14StreamIngestDedup _),
    // st15: watermark late-data ACCOUNTING — an injected 2h-late slice
    // replays after the main snapshot; output = per-hour admitted rows +
    // the engine's own numRowsDroppedByWatermark counter as a
    // `__dropped__` row; the oracle recomputes both from the closed-form
    // watermark predicate (floored-ms max − 30 min, drop iff window end ≤ wm)
    "st15_late_audit" -> (graft.streaming.LateDataAudit.st15LateAudit _),
  )

  /** DuckDB-equivalent SQL per query (omitted => driver does rows-only check).
    * Omitted: only q6 (HyperLogLog++) and p2 (quantile summary) — Spark's
    * engine-internal sketch algorithms, which no external engine can
    * replay cell-for-cell. y4/x5/v2/x6 all LEFT this list in round 7:
    * their hashes/hyperplanes moved to 60-bit md5, which both engines
    * compute exactly. x4 IS oracled: its
    * verified pair set is hash-independent (x3's SQL). v3/v4 are pure
    * decimal-mean + IEEE dot arithmetic and ARE oracled below. st1/st2 ARE
    * oracled: the streaming aggs accumulate in decimal, so the finalized
    * Append output is bit-identical to the equivalent batch SQL. a3 IS
    * oracled: DuckDB has md5, and the CDC window scan is SQL-expressible
    * (see the a3 entry's comment).
    */
  /** The near-dup cluster derivation shared VERBATIM by the x7 and x10
    * oracles (DuckDB): x3's shingle/Jaccard pair graph, the recursive
    * transitive closure, and the min-label clusters — ending in
    * `cl(doc_id, cluster_id)`. One constant, two consumers, so the two
    * oracles can never disagree about the same cluster graph. */
  /** Shared by x8 and x12 (same output by construction — x12's bloom
    * prefilter only changes the physical plan). */
  private val contaminationOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
      |  for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS sh FROM t),
      |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
      |ev AS (SELECT doc_id AS eval_id, g FROM e WHERE doc_id % 50 = 0),
      |tr AS (SELECT doc_id AS train_id, g FROM e WHERE doc_id % 50 <> 0)
      |SELECT train_id, eval_id, count(*) AS n_shared
      |FROM tr JOIN ev ON tr.g = ev.g
      |GROUP BY 1, 2 HAVING count(*) >= 3
      |ORDER BY train_id, eval_id""".stripMargin

  /** x6's md5 hyperplane banding re-derivation, up through the per-doc
    * (band, band_key) table — shared verbatim by the x6 candidate join and
    * x15's bucket-occupancy profile so the profiled structure IS the
    * joined structure. */
  private val hyperplaneKeysCte: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh AS (SELECT doc_id, list_distinct([('0x' || substr(md5(g), 1, 15))::BIGINT
      |    for g in [array_to_string(toks[i:i+2], ' ')
      |              for i in generate_series(1, greatest(len(toks) - 2, 1))]]) AS hs FROM t),
      |e AS (SELECT doc_id, unnest(hs) AS h FROM sh),
      |sp AS (SELECT doc_id, CAST(h % 64 AS INT) AS d,
      |    CAST(sum(CASE WHEN (h >> 17) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
      |  FROM e GROUP BY 1, 2),
      |gd AS (SELECT sh.doc_id, dd.d FROM sh
      |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS d) dd),
      |vl AS (SELECT gd.doc_id, list(coalesce(sp.v, 0) ORDER BY gd.d) AS vec
      |  FROM gd LEFT JOIN sp ON sp.doc_id = gd.doc_id AND sp.d = gd.d
      |  GROUP BY gd.doc_id),
      |nn AS (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS nn FROM sp GROUP BY 1),
      |pl AS (SELECT p, list(w ORDER BY i) AS w FROM (
      |    SELECT p, i, (('0x' || substr(md5(p || ':' || i), 1, 15))::BIGINT
      |      - 576460752303423488) / 576460752303423488.0 AS w
      |    FROM (SELECT unnest(generate_series(0, 31)) AS p)
      |    CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)) GROUP BY p),
      |sg AS (SELECT vl.doc_id, pl.p,
      |    CASE WHEN list_dot_product(vl.vec::DOUBLE[], pl.w) > 0
      |      THEN 1::BIGINT ELSE 0 END AS bit
      |  FROM vl CROSS JOIN pl),
      |keys AS (SELECT sg.doc_id, p // 16 AS band,
      |    CAST(sum(bit << (p % 16)) AS BIGINT) AS band_key
      |  FROM sg JOIN nn ON nn.doc_id = sg.doc_id AND nn.nn > 0 GROUP BY 1, 2)""".stripMargin

  /** The md5-affine MinHash banding, shared VERBATIM by the x4, x11 and
    * z2 oracles (mirroring the Scala side's one memoized `minhashBands`
    * pass): per shingle one md5 yields lanes m1 (hex 1–15) / m2 (hex
    * 17–31 >> 2), signature j = min of (m1 + j·m2) mod 2^61−1 — nonneg
    * long arithmetic that cannot overflow on either engine — and the
    * band key is the comma-joined 4-signature string. Ends in
    * `bk(doc_id, band, bkey)` plus the shingle-set CTEs (e, sizes) the
    * verification legs reuse. */
  private val minhashBandCte: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
      |  for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS sh FROM t),
      |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
      |sizes AS (SELECT doc_id, len(sh) AS n FROM s),
      |hh AS (SELECT doc_id,
      |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS m1,
      |    (('0x' || substr(md5(g), 17, 15))::BIGINT >> 2) AS m2
      |  FROM e),
      |mh AS (SELECT doc_id, j, min((m1 + j * m2) % 2305843009213693951) AS sg
      |  FROM hh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j)
      |  GROUP BY 1, 2),
      |bk AS (SELECT doc_id, j // 4 AS band,
      |    string_agg(sg::VARCHAR, ',' ORDER BY j) AS bkey
      |  FROM mh GROUP BY 1, 2)""".stripMargin

  /** x11's full incremental-dedupe oracle — shared VERBATIM by
    * st14_stream_ingest_dedup: the streamed admission table is the same
    * computation run micro-batch by micro-batch against the static old
    * index, and per-doc verdict independence makes the batch answer the
    * exact streaming contract. */
  /** x11's oracle parameterized on the LIVE standing side (x16 masks the
    * retracted slice out of the band join, exactly like the Spark side). */
  private def incrementalDedupOracleFor(oldExtra: String): String =
    minhashBandCte + s""",
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bk a JOIN bk b ON a.band = b.band AND a.bkey = b.bkey
      |    AND a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0$oldExtra),""".stripMargin + """
      |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
      |  FROM cand c JOIN e a ON a.doc_id = c.doc_a
      |  JOIN e b ON b.doc_id = c.doc_b AND b.g = a.g
      |  GROUP BY 1, 2),
      |j AS (SELECT doc_a, doc_b,
      |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 4) AS jaccard
      |  FROM inter JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b),
      |p AS (SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5),
      |best AS (SELECT doc_a, doc_b, jaccard FROM
      |  (SELECT *, row_number() OVER (PARTITION BY doc_a ORDER BY jaccard DESC, doc_b) AS rk
      |   FROM p) WHERE rk = 1)
      |SELECT d.doc_id,
      |  CAST(CASE WHEN best.doc_b IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep,
      |  CAST(best.doc_b AS BIGINT) AS dup_of, best.jaccard
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 7 = 0) d
      |LEFT JOIN best ON best.doc_a = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  private val incrementalDedupOracle: String = incrementalDedupOracleFor("")

  private val dupClusterCte: String =
    """WITH RECURSIVE
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
      |  for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS sh FROM t),
      |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
      |sizes AS (SELECT doc_id, len(sh) AS n FROM s),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |j AS (SELECT doc_a, doc_b,
      |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 4) AS jaccard
      |  FROM inter JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b),
      |p AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
      |und AS (SELECT doc_a AS src, doc_b AS dst FROM p
      |  UNION ALL SELECT doc_b, doc_a FROM p),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM und
      |  UNION
      |  SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src),
      |cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      |  FROM reach GROUP BY src)""".stripMargin

  /** The 3-iteration unrolled Lloyd's loop + final cell assignment (init =
    * the 10 lowest vec_ids of the source slice) shared VERBATIM by the
    * v5, v7, and v8 oracles — one template, three consumers, so the
    * oracles can never disagree about the same quantizer. `pred` narrows
    * the training slice (empty = whole table; v8 trains on the old slice
    * only); `kSql` is the nlist expression seeding c0 (default the fixed
    * 10; v15 passes the √N scalar subquery so the SAME template carries
    * the auto-scaled quantizer). Ends in `af(vec_id, embedding, cell)`
    * over the slice. */
  private def kmeansCteFor(pred: String, kSql: String = "10"): String =
    s"""WITH src AS (SELECT vec_id, embedding FROM embeddings $pred),
      |c0 AS (SELECT CAST(vec_id AS INT) AS cell, embedding::DOUBLE[] AS centroid
      |  FROM src WHERE vec_id < ($kSql)),
      |a0 AS (SELECT vec_id, embedding, cell FROM (
      |  SELECT e.vec_id, e.embedding, c.cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_dot_product(e.embedding::DOUBLE[], c.centroid)
      |        - 0.5 * list_dot_product(c.centroid, c.centroid) DESC, c.cell) AS rk
      |  FROM src e CROSS JOIN c0 c) WHERE rk = 1),
      |c1 AS (SELECT cell, list(c ORDER BY pos) AS centroid FROM (
      |  SELECT cell, pos, CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c FROM (
      |    SELECT cell, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos FROM a0)
      |  GROUP BY 1, 2) GROUP BY 1),
      |a1 AS (SELECT vec_id, embedding, cell FROM (
      |  SELECT e.vec_id, e.embedding, c.cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_dot_product(e.embedding::DOUBLE[], c.centroid)
      |        - 0.5 * list_dot_product(c.centroid, c.centroid) DESC, c.cell) AS rk
      |  FROM src e CROSS JOIN c1 c) WHERE rk = 1),
      |c2 AS (SELECT cell, list(c ORDER BY pos) AS centroid FROM (
      |  SELECT cell, pos, CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c FROM (
      |    SELECT cell, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos FROM a1)
      |  GROUP BY 1, 2) GROUP BY 1),
      |a2 AS (SELECT vec_id, embedding, cell FROM (
      |  SELECT e.vec_id, e.embedding, c.cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_dot_product(e.embedding::DOUBLE[], c.centroid)
      |        - 0.5 * list_dot_product(c.centroid, c.centroid) DESC, c.cell) AS rk
      |  FROM src e CROSS JOIN c2 c) WHERE rk = 1),
      |c3 AS (SELECT cell, list(c ORDER BY pos) AS centroid FROM (
      |  SELECT cell, pos, CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c FROM (
      |    SELECT cell, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos FROM a2)
      |  GROUP BY 1, 2) GROUP BY 1),
      |af AS (SELECT vec_id, embedding, cell FROM (
      |  SELECT e.vec_id, e.embedding, c.cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_dot_product(e.embedding::DOUBLE[], c.centroid)
      |        - 0.5 * list_dot_product(c.centroid, c.centroid) DESC, c.cell) AS rk
      |  FROM src e CROSS JOIN c3 c) WHERE rk = 1)""".stripMargin

  private val kmeansAssignCte: String = kmeansCteFor("")

  /** One subspace's unrolled Lloyd chain for the v9 PQ oracle — the
    * v5/v7/v8 template re-instantiated per 16-dim slice with k=4 (init =
    * the 4 lowest vec_ids' slices). Ends in `af_<s>(vec_id, cell, sim)`
    * where sim is the RAW dot against the winning subspace centroid. */
  private def pqSubspaceCte(s: Int): String = pqSubspaceCteFor(s, "")

  /** The subspace-s PQ training chain with the TRAINING slice narrowed by
    * `pred` (empty = whole table — byte-compatible with the historical
    * template via `tsrc == src`): training assignments/means read
    * `tsrc_s`, while the final `af_s` assignment always covers the FULL
    * table — the index-maintenance shape (v21) where old-trained
    * codebooks encode everything including the increment. */
  private def pqSubspaceCteFor(s: Int, pred: String): String = {
    val lo = s * 16 + 1; val hi = (s + 1) * 16
    def assign(out: String, from: String, cents: String): String =
      s"""$out AS (SELECT vec_id, emb, cell FROM (
         |  SELECT e.vec_id, e.emb, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(e.emb::DOUBLE[], c.centroid)
         |        - 0.5 * list_dot_product(c.centroid, c.centroid) DESC, c.cell) AS rk
         |  FROM $from e CROSS JOIN $cents c) WHERE rk = 1)""".stripMargin
    def centroids(out: String, from: String): String =
      s"""$out AS (SELECT cell, list(c ORDER BY pos) AS centroid FROM (
         |  SELECT cell, pos, CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c FROM (
         |    SELECT cell, unnest(emb) AS v, generate_subscripts(emb, 1) AS pos FROM $from)
         |  GROUP BY 1, 2) GROUP BY 1)""".stripMargin
    // with an empty pred, train straight off src_s — a pass-through
    // tsrc_s CTE would get force-materialized into 4 redundant full-table
    // slice copies per PQ oracle (the fence cuts re-evaluation, but only
    // if we don't hand it useless layers to pin)
    val train = if (pred.isEmpty) s"src_$s" else s"tsrc_$s"
    val trainCte =
      if (pred.isEmpty) Nil
      else Seq(s"tsrc_$s AS (SELECT vec_id, emb FROM src_$s $pred)")
    (Seq(
      s"src_$s AS (SELECT vec_id, embedding[$lo:$hi] AS emb FROM embeddings)") ++
    trainCte ++ Seq(
      s"""c0_$s AS (SELECT CAST(vec_id AS INT) AS cell, emb::DOUBLE[] AS centroid
         |  FROM $train WHERE vec_id < 4)""".stripMargin,
      assign(s"a0_$s", train, s"c0_$s"),
      centroids(s"c1_$s", s"a0_$s"),
      assign(s"a1_$s", train, s"c1_$s"),
      centroids(s"c2_$s", s"a1_$s"),
      assign(s"a2_$s", train, s"c2_$s"),
      centroids(s"c3_$s", s"a2_$s"),
      s"""af_$s AS (SELECT vec_id, cell, sim FROM (
         |  SELECT e.vec_id, c.cell,
         |    list_dot_product(e.emb::DOUBLE[], c.centroid) AS sim,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(e.emb::DOUBLE[], c.centroid)
         |        - 0.5 * list_dot_product(c.centroid, c.centroid) DESC, c.cell) AS rk
         |  FROM src_$s e CROSS JOIN c3_$s c) WHERE rk = 1)""".stripMargin
    )).mkString(",\n")
  }

  /** v9: 4 independent subspace quantizers + the subspace-additive
    * reconstruction similarity (terms sum in subspace order — each
    * bitwise-reproducible, so the total is too). */
  private val pqOracle: String =
    "WITH " + (0 until 4).map(pqSubspaceCte).mkString(",\n") + """
      |SELECT a.vec_id, a.cell AS code_0, b.cell AS code_1,
      |  c.cell AS code_2, d.cell AS code_3,
      |  round(a.sim + b.sim + c.sim + d.sim, 6) AS recon_sim
      |FROM af_0 a JOIN af_1 b USING (vec_id)
      |JOIN af_2 c USING (vec_id) JOIN af_3 d USING (vec_id)
      |ORDER BY vec_id""".stripMargin

  /** v10: the ADC search re-derived in SQL — the same subspace-training
    * CTEs as v9's oracle, plus per-query distance tables (`qd_s`) joined
    * onto the corpus codes. The sum `q0.d + q1.d + q2.d + q3.d` is the
    * Spark side's subspace-ordered left-associated fold bitwise, so even
    * the EXACT score ties PQ creates between same-code candidates rank
    * identically under the (s DESC, neighbor_id) tiebreak. */
  private val pqAdcOracle: String =
    "WITH " + (0 until 4).map(pqSubspaceCte).mkString(",\n") + ",\n" +
    (0 until 4).map(s =>
      s"""qd_$s AS (SELECT q.vec_id AS query_id, c.cell,
         |  list_dot_product(q.emb::DOUBLE[], c.centroid) AS d
         |  FROM src_$s q CROSS JOIN c3_$s c WHERE q.vec_id < 10)""".stripMargin
    ).mkString(",\n") + """,
      |scored AS (SELECT q0.query_id, n0.vec_id AS neighbor_id,
      |    q0.d + q1.d + q2.d + q3.d AS s
      |  FROM af_0 n0 JOIN af_1 n1 ON n1.vec_id = n0.vec_id
      |    JOIN af_2 n2 ON n2.vec_id = n0.vec_id
      |    JOIN af_3 n3 ON n3.vec_id = n0.vec_id
      |  JOIN qd_0 q0 ON q0.cell = n0.cell
      |  JOIN qd_1 q1 ON q1.query_id = q0.query_id AND q1.cell = n1.cell
      |  JOIN qd_2 q2 ON q2.query_id = q0.query_id AND q2.cell = n2.cell
      |  JOIN qd_3 q3 ON q3.query_id = q0.query_id AND q3.cell = n3.cell
      |  WHERE n0.vec_id <> q0.query_id),
      |r AS (SELECT query_id, neighbor_id, s,
      |  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(s, 6) AS adc_sim, rank
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** v12: the IVFADC composition — the SAME two SQL templates the
    * components use (kmeansCteFor's Lloyd chain for the coarse cells,
    * pqSubspaceCte + qd tables for ADC), joined so each query scores only
    * its own coarse cell. One composition, zero new derivations — the
    * oracles can never disagree with v5/v10's. */
  /** Everything through the `scored` CTE — shared VERBATIM by the v12
    * oracle (rank on the ADC score) and the v16 oracle (shortlist then
    * exact re-rank), matching the Scala side's shared `ivfAdcScored`. */
  private val ivfAdcScoredCtes: String =
    "WITH " + kmeansCteFor("").stripPrefix("WITH ") + ",\n" +
    (0 until 4).map(pqSubspaceCte).mkString(",\n") + ",\n" +
    (0 until 4).map(s =>
      s"""qd_$s AS (SELECT q.vec_id AS query_id, c.cell,
         |  list_dot_product(q.emb::DOUBLE[], c.centroid) AS d
         |  FROM src_$s q CROSS JOIN c3_$s c WHERE q.vec_id < 10)""".stripMargin
    ).mkString(",\n") + """,
      |qc AS (SELECT vec_id AS query_id, cell AS qcell FROM af WHERE vec_id < 10),
      |scored AS (SELECT qc.query_id, n.vec_id AS neighbor_id,
      |    q0.d + q1.d + q2.d + q3.d AS s
      |  FROM af n JOIN qc ON n.cell = qc.qcell AND n.vec_id <> qc.query_id
      |  JOIN af_0 n0 ON n0.vec_id = n.vec_id
      |  JOIN af_1 n1 ON n1.vec_id = n.vec_id
      |  JOIN af_2 n2 ON n2.vec_id = n.vec_id
      |  JOIN af_3 n3 ON n3.vec_id = n.vec_id
      |  JOIN qd_0 q0 ON q0.query_id = qc.query_id AND q0.cell = n0.cell
      |  JOIN qd_1 q1 ON q1.query_id = qc.query_id AND q1.cell = n1.cell
      |  JOIN qd_2 q2 ON q2.query_id = qc.query_id AND q2.cell = n2.cell
      |  JOIN qd_3 q3 ON q3.query_id = qc.query_id AND q3.cell = n3.cell)""".stripMargin

  /** [[ivfAdcScoredCtes]] with the probe window PARAMETERIZED by nprobe:
    * `qp` keeps each query's nprobe top cells under the SAME objective
    * window `af` assigns with (identical expression, identical tiebreak),
    * so rank 1 is exactly the assignment cell and the nprobe=1
    * instantiation derives the same candidate set as the `qc` form
    * above — the multi-probe oracles extend the proven template rather
    * than forking it. */
  private def ivfAdcScoredCtesFor(nprobe: Int): String =
    "WITH " + kmeansCteFor("").stripPrefix("WITH ") + ",\n" +
    (0 until 4).map(pqSubspaceCte).mkString(",\n") + ",\n" +
    (0 until 4).map(s =>
      s"""qd_$s AS (SELECT q.vec_id AS query_id, c.cell,
         |  list_dot_product(q.emb::DOUBLE[], c.centroid) AS d
         |  FROM src_$s q CROSS JOIN c3_$s c WHERE q.vec_id < 10)""".stripMargin
    ).mkString(",\n") + s""",
      |qp AS (SELECT query_id, cell FROM (
      |  SELECT e.vec_id AS query_id, c.cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_dot_product(e.embedding::DOUBLE[], c.centroid)
      |        - 0.5 * list_dot_product(c.centroid, c.centroid) DESC, c.cell) AS rk
      |  FROM src e CROSS JOIN c3 c WHERE e.vec_id < 10) WHERE rk <= $nprobe),
      |scored AS (SELECT qp.query_id, n.vec_id AS neighbor_id,
      |    q0.d + q1.d + q2.d + q3.d AS s
      |  FROM af n JOIN qp ON n.cell = qp.cell AND n.vec_id <> qp.query_id
      |  JOIN af_0 n0 ON n0.vec_id = n.vec_id
      |  JOIN af_1 n1 ON n1.vec_id = n.vec_id
      |  JOIN af_2 n2 ON n2.vec_id = n.vec_id
      |  JOIN af_3 n3 ON n3.vec_id = n.vec_id
      |  JOIN qd_0 q0 ON q0.query_id = qp.query_id AND q0.cell = n0.cell
      |  JOIN qd_1 q1 ON q1.query_id = qp.query_id AND q1.cell = n1.cell
      |  JOIN qd_2 q2 ON q2.query_id = qp.query_id AND q2.cell = n2.cell
      |  JOIN qd_3 q3 ON q3.query_id = qp.query_id AND q3.cell = n3.cell)""".stripMargin

  /** v17: the exact top-5 (v1's CTEs) LEFT-joined against the two-stage
    * approx top-5 — both templates reused verbatim, so the recall numbers
    * derive from the already-proven answers. r9: one audit block per
    * nprobe setting (1 = v16's own-cell serve, 4 = v18's multi-probe),
    * UNION ALL'd into the recall-vs-nprobe table. */
  private def recallAuditFor(np: Int): String =
    ivfAdcScoredCtesFor(np) + s""",
      |short AS (SELECT query_id, neighbor_id FROM (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS srank
      |  FROM scored) WHERE srank <= ${20 * np}),
      |ex AS (SELECT sh.query_id, sh.neighbor_id,
      |    list_dot_product(n.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim
      |  FROM short sh JOIN embeddings n ON n.vec_id = sh.neighbor_id
      |  JOIN embeddings q ON q.vec_id = sh.query_id),
      |appr AS (SELECT query_id, neighbor_id FROM (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM ex) WHERE rank <= 5),
      |xj AS (SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id,
      |    list_dot_product(e2.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS s
      |  FROM embeddings e2 CROSS JOIN embeddings q
      |  WHERE q.vec_id < 10 AND e2.vec_id <> q.vec_id),
      |xr AS (SELECT query_id, neighbor_id FROM (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rk
      |  FROM xj) WHERE rk <= 5)
      |SELECT CAST($np AS BIGINT) AS nprobe, x.query_id,
      |  count(a.neighbor_id) AS hits,
      |  round(count(a.neighbor_id) / 5.0, 4) AS recall_at_5
      |FROM xr x LEFT JOIN appr a
      |  ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
      |GROUP BY 1, 2""".stripMargin

  /** y21 + st16 (the streamed form is carving-independent, so one SQL
    * serves both): exact integer token counts per side, length-arithmetic
    * totals, two-divide ppm shift, top-30 with token tie-break. */
  private val corpusDriftOracle: String =
    """WITH tok AS (SELECT (doc_id % 7 = 0) AS is_new,
      |    unnest(string_split(text, ' ')) AS tk FROM documents),
      |cf AS (SELECT tk,
      |  CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS cf_old,
      |  CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS cf_new
      |  FROM tok GROUP BY 1),
      |tt AS (SELECT
      |  CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE
      |    length(text) - length(replace(text, ' ', '')) + 1 END) AS BIGINT) AS t_old,
      |  CAST(sum(CASE WHEN doc_id % 7 = 0 THEN
      |    length(text) - length(replace(text, ' ', '')) + 1 ELSE 0 END) AS BIGINT) AS t_new
      |  FROM documents)
      |SELECT tk, cf_old, cf_new,
      |  round(abs(CAST(cf_new AS DOUBLE) / t_new -
      |    CAST(cf_old AS DOUBLE) / t_old) * 1e6, 4) AS drift_ppm
      |FROM cf CROSS JOIN tt
      |ORDER BY drift_ppm DESC, tk LIMIT 30""".stripMargin

  private val recallAuditOracle: String =
    s"""SELECT * FROM (
       |${recallAuditFor(1)}
       |) UNION ALL SELECT * FROM (
       |${recallAuditFor(4)}
       |) ORDER BY nprobe, query_id""".stripMargin

  private val ivfAdcOracle: String =
    ivfAdcScoredCtes + """,
      |r AS (SELECT query_id, neighbor_id, s,
      |  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(s, 6) AS adc_sim, rank
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** v23/st21: v12's chain minus the deleted slice
    * (AnnIndexStore.V23DeleteSql, vec_id % 11 = 3) on BOTH sides of the
    * candidate join — neighbors and stored probes — re-ranked over the
    * survivors: the answer an index built WITHOUT those vectors gives,
    * which is exactly what the tombstone mask must reproduce (batch
    * delete in v23; the same set arriving as streamed per-batch
    * tombstone commits in st21). */
  private val indexDeleteOracle: String =
    ivfAdcScoredCtes + """,
      |live AS (SELECT query_id, neighbor_id, s FROM scored
      |  WHERE neighbor_id % 11 <> 3 AND query_id % 11 <> 3),
      |r AS (SELECT query_id, neighbor_id, s,
      |  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank
      |  FROM live)
      |SELECT query_id, neighbor_id, round(s, 6) AS adc_sim, rank
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** v21: the index-append lifecycle's answer in closed form — the Lloyd
    * chain AND the four PQ chains train on the OLD slice only
    * (`vec_id % 7 <> 0`), then the FULL corpus (old + the appended
    * increment) assigns/encodes/scores against those frozen codebooks:
    * `af2` is everyone's coarse cell under the old-trained quantizer,
    * the `af_s` subspace assignments already cover the full table
    * (pqSubspaceCteFor trains narrow, assigns wide), and the scoring /
    * ranking tail is v12's verbatim. */
  private val indexAppendOracle: String =
    "WITH " + kmeansCteFor("WHERE vec_id % 7 <> 0").stripPrefix("WITH ") + ",\n" +
    (0 until 4).map(s => pqSubspaceCteFor(s, "WHERE vec_id % 7 <> 0")).mkString(",\n") + ",\n" +
    (0 until 4).map(s =>
      s"""qd_$s AS (SELECT q.vec_id AS query_id, c.cell,
         |  list_dot_product(q.emb::DOUBLE[], c.centroid) AS d
         |  FROM src_$s q CROSS JOIN c3_$s c WHERE q.vec_id < 10)""".stripMargin
    ).mkString(",\n") + """,
      |allv AS (SELECT vec_id, embedding FROM embeddings),
      |af2 AS (SELECT vec_id, cell FROM (
      |  SELECT e.vec_id, c.cell,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_dot_product(e.embedding::DOUBLE[], c.centroid)
      |        - 0.5 * list_dot_product(c.centroid, c.centroid) DESC, c.cell) AS rk
      |  FROM allv e CROSS JOIN c3 c) WHERE rk = 1),
      |qp AS (SELECT vec_id AS query_id, cell FROM af2 WHERE vec_id < 10),
      |scored AS (SELECT qp.query_id, n.vec_id AS neighbor_id,
      |    q0.d + q1.d + q2.d + q3.d AS s
      |  FROM af2 n JOIN qp ON n.cell = qp.cell AND n.vec_id <> qp.query_id
      |  JOIN af_0 n0 ON n0.vec_id = n.vec_id
      |  JOIN af_1 n1 ON n1.vec_id = n.vec_id
      |  JOIN af_2 n2 ON n2.vec_id = n.vec_id
      |  JOIN af_3 n3 ON n3.vec_id = n.vec_id
      |  JOIN qd_0 q0 ON q0.query_id = qp.query_id AND q0.cell = n0.cell
      |  JOIN qd_1 q1 ON q1.query_id = qp.query_id AND q1.cell = n1.cell
      |  JOIN qd_2 q2 ON q2.query_id = qp.query_id AND q2.cell = n2.cell
      |  JOIN qd_3 q3 ON q3.query_id = qp.query_id AND q3.cell = n3.cell),
      |r AS (SELECT query_id, neighbor_id, s,
      |  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(s, 6) AS adc_sim, rank
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** v16: the same `scored` stream, but the quantized score only SELECTS
    * the top-20 shortlist; the emitted top-5 re-rank by the exact raw
    * dot (the bitwise list_dot_product fold v1's oracle proves). */
  /** The stage-2 tail shared by the v16 (nprobe=1, budget 20) and v18
    * (nprobe=4, budget 80) oracles: top-`shortlistK` ADC shortlist from
    * `scored`, exact top-5 out. The budget scales with nprobe because a
    * fixed one measurably throttles what probing buys (v18's scaladoc
    * records the measured recall DROP under a fixed 20). */
  private def rerankTailFor(shortlistK: Int): String = s""",
      |short AS (SELECT query_id, neighbor_id FROM (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS srank
      |  FROM scored) WHERE srank <= $shortlistK),
      |ex AS (SELECT sh.query_id, sh.neighbor_id,
      |    list_dot_product(n.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim
      |  FROM short sh JOIN embeddings n ON n.vec_id = sh.neighbor_id
      |  JOIN embeddings q ON q.vec_id = sh.query_id),
      |r2 AS (SELECT query_id, neighbor_id, sim,
      |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM ex)
      |SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank
      |FROM r2 WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val rerankOracle: String = ivfAdcScoredCtes + rerankTailFor(20)

  /** v18: the identical two stages over the nprobe=4 candidate window. */
  private val multiprobeOracle: String = ivfAdcScoredCtesFor(4) + rerankTailFor(80)

  /** Shared by v8 (batch) and st9 (streaming): the quantizer trains on the
    * OLD slice only, the new slice gets the same rank-1 cell assignment —
    * stream vs batch must hash-match because the op is stateless and the
    * argmax fold is arithmetic-identical. */
  private val incrementalIvfOracle: String =
    kmeansCteFor("WHERE vec_id % 7 <> 0") + """,
      |nw AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 = 0),
      |asg AS (SELECT vec_id, cell, s FROM (
      |  SELECT n.vec_id, c.cell,
      |    list_dot_product(n.embedding::DOUBLE[], c.centroid)
      |      - 0.5 * list_dot_product(c.centroid, c.centroid) AS s,
      |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |      list_dot_product(n.embedding::DOUBLE[], c.centroid)
      |        - 0.5 * list_dot_product(c.centroid, c.centroid) DESC, c.cell) AS rk
      |  FROM nw n CROSS JOIN c3 c) WHERE rk = 1)
      |SELECT vec_id, cell, round(s, 6) AS score FROM asg ORDER BY vec_id""".stripMargin

  /** v14: the old-slice Lloyd chain (kmeansCteFor, CTE names src/c0..c3)
    * plus an `n`-prefixed full-corpus chain, then BOTH quantizers assign
    * the FULL corpus for the churn count and the shared cells' centroids
    * compare via list_dot_product (the same ascending fold as dot_f). */
  private val quantizerDriftOracle: String = {
    def assign(out: String, src: String, cents: String): String =
      s"""$out AS (SELECT vec_id, embedding, cell FROM (
         |  SELECT e.vec_id, e.embedding, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(e.embedding::DOUBLE[], c.centroid)
         |        - 0.5 * list_dot_product(c.centroid, c.centroid) DESC, c.cell) AS rk
         |  FROM $src e CROSS JOIN $cents c) WHERE rk = 1)""".stripMargin
    def centroids(out: String, from: String): String =
      s"""$out AS (SELECT cell, list(c ORDER BY pos) AS centroid FROM (
         |  SELECT cell, pos, CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c FROM (
         |    SELECT cell, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos FROM $from)
         |  GROUP BY 1, 2) GROUP BY 1)""".stripMargin
    kmeansCteFor("WHERE vec_id % 7 <> 0") + ",\n" + Seq(
      "nsrc AS (SELECT vec_id, embedding FROM embeddings)",
      """nc0 AS (SELECT CAST(vec_id AS INT) AS cell, embedding::DOUBLE[] AS centroid
        |  FROM nsrc WHERE vec_id < 10)""".stripMargin,
      assign("na0", "nsrc", "nc0"), centroids("nc1", "na0"),
      assign("na1", "nsrc", "nc1"), centroids("nc2", "na1"),
      assign("na2", "nsrc", "nc2"), centroids("nc3", "na2"),
      assign("aold", "embeddings", "c3"),
      assign("anew", "embeddings", "nc3"),
      """ch AS (SELECT o.cell, count(*) AS n_vectors,
        |    sum(CASE WHEN n.cell <> o.cell THEN 1 ELSE 0 END) AS n_moved
        |  FROM aold o JOIN anew n USING (vec_id) GROUP BY 1)""".stripMargin
    ).mkString(",\n") + """
      |SELECT ch.cell, CAST(n_vectors AS BIGINT) AS n_vectors,
      |  CAST(n_moved AS BIGINT) AS n_moved,
      |  round(list_dot_product(a.centroid, b.centroid), 6) AS centroid_sim
      |FROM ch JOIN c3 a ON ch.cell = a.cell JOIN nc3 b ON ch.cell = b.cell
      |ORDER BY ch.cell""".stripMargin
  }

  /** The 30-min-gap session derivation shared VERBATIM by the st2 (native
    * session_window) and st8 (flatMapGroupsWithState custom state machine)
    * oracles: one constant, two consumers, so the two operators are
    * hash-checked against the SAME batch answer. */
  private val sessionOracleSql: String =
    """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
      |w AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
      |n AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev >= 1800000000 THEN 1 ELSE 0 END AS ns FROM w),
      |s AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM n)
      |SELECT user_id, CAST(min(ts_us) AS BIGINT) AS session_start_us, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin

  /** Force every CTE in an oracle to single evaluation (`AS MATERIALIZED`
    * — a DuckDB optimization fence, result-identical by definition).
    * Without it DuckDB inlines chained CTEs at each reference site, and
    * the v-family's unrolled Lloyd chains / the n-family's edge CTEs blow
    * up EXPONENTIALLY across iterations: the v12 oracle alone measured
    * 38.9 s plain vs 0.3 s materialized at sf0.001 (identical rows) —
    * which is how an external checker with a time budget can zero out a
    * whole round (the r9 CORRECTNESS artifact came back `{}`; its DuckDB
    * pass ran ~15 min at sf0.01, ~40 s materialized). Recursive CTEs
    * cannot take the keyword, so those oracles pass through untouched. */
  private def materializeCtes(sql: String): String =
    // The `(\s*SELECT` guard keeps named-window clauses (`WINDOW fr AS
    // (PARTITION BY ...)`) untouched — only CTE bodies open with SELECT.
    // RECURSIVE members cannot take the keyword, so every one of them is
    // authored with a COLUMN LIST (`reach(src, dst) AS`, `walk(doc_id,
    // len, c) AS`, `r(event_type, …) AS`), which the regex cannot match
    // — the non-recursive members of a WITH RECURSIVE (the heavy
    // shingle/self-join CTEs of the x7 cluster family included) get the
    // fence like everyone else.
    sql.replaceAll("(\\w+) AS \\((\\s*SELECT)", "$1 AS MATERIALIZED ($2")

  def oracleSql: Map[String, String] =
    oracleSqlPlain.map { case (k, v) => (k, materializeCtes(v)) }

  private def oracleSqlPlain: Map[String, String] = Map(
    // a3: the chunker's boundary rule, re-derived relationally. Settings
    // (min=256, max=2048, shift=8, boundary=1B): chunk starts and window
    // starts stay multiples of 8 (0 starts a doc; fires land at p+256 and
    // max-cuts at c+2048, both ≡ 0 mod 8), so a per-position fire table
    // (md5 of the 256-byte window starting at p begins with byte 0) plus a
    // reverse-cumulative-min gives next_fire(p), and a recursive walk over
    // chunk starts reproduces the chunker EXACTLY: the next cut is the
    // earlier of next-fire-window-end and the max-size cut, and any cut
    // past EOF is the tail flush. Text is ASCII (asserted by the driver
    // corpus), so VARCHAR substring = byte slicing and md5(substr) hashes
    // the same bytes the chunker sees. n_distinct counts distinct chunk
    // CONTENT (the engine keys chunks by sha256, DuckDB by the bytes
    // themselves — identical partitioning barring hash collisions).
    // BOUND: range(0, 8192) enumerates window starts up to byte 65,528 —
    // documents beyond ~64 KiB would silently lose late fire positions
    // and the oracle would FALSELY mismatch. The driver corpus caps at
    // ~600 bytes/doc; raise the constant if the corpus is ever
    // regenerated with larger documents (DuckDB's range() only accepts
    // constants, so it cannot derive the bound from max(len)).
    "a3_cdc_chunks" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |pos AS (
        |  SELECT d.doc_id, 8*t.k AS p,
        |    CASE WHEN substring(md5(substring(d.text, 8*t.k + 1, 256)), 1, 2) = '00'
        |         THEN 8*t.k END AS fire_p
        |  FROM d, range(0, 8192) t(k)
        |  WHERE 8*t.k + 256 < d.len
        |),
        |nf AS (
        |  SELECT doc_id, p,
        |    min(fire_p) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_fire
        |  FROM pos
        |),
        |walk(doc_id, len, c) AS (
        |  SELECT doc_id, len, CAST(0 AS BIGINT) AS c FROM d WHERE len > 256
        |  UNION ALL
        |  SELECT w.doc_id, w.len,
        |    CASE WHEN LEAST(COALESCE(n.next_fire + 256, w.c + 2048), w.c + 2048) < w.len
        |         THEN LEAST(COALESCE(n.next_fire + 256, w.c + 2048), w.c + 2048)
        |         ELSE w.len END
        |  FROM walk w LEFT JOIN nf n ON n.doc_id = w.doc_id AND n.p = w.c
        |  WHERE w.c < w.len
        |),
        |tiles AS (
        |  SELECT doc_id, c, lead(c) OVER (PARTITION BY doc_id ORDER BY c) AS nxt
        |  FROM walk
        |),
        |allc AS (
        |  SELECT doc_id, c, nxt FROM tiles WHERE nxt IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, 0, len FROM d WHERE len <= 256
        |)
        |SELECT a.doc_id, count(*) AS n_chunks,
        |  CAST(sum(a.nxt - a.c) AS BIGINT) AS total_len,
        |  count(DISTINCT substring(d.text, CAST(a.c AS INT) + 1, CAST(a.nxt - a.c AS INT))) AS n_distinct
        |FROM allc a JOIN d USING (doc_id)
        |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,
    "a6_refcounts" ->
      """SELECT md5(text) AS chunk_key, count(*) AS ref_count, max(n_chars) AS length
        |FROM documents GROUP BY 1 ORDER BY chunk_key""".stripMargin,
    "b1_exists" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "b2_point_lookup" ->
      "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42",
    "b4_semi_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,
    "c1_position_lookup" ->
      """WITH m AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |  coalesce(sum(l_quantity) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_extendedprice, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS addr,
        |  sum(l_quantity) OVER (PARTITION BY l_orderkey) AS total
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, addr, l_quantity FROM m
        |WHERE addr <= total/2 AND addr + l_quantity > total/2
        |ORDER BY l_orderkey, l_linenumber, addr""".stripMargin,
    "d1_list_prefix" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_name LIKE 'Customer#00000001%' AND c_name > 'Customer#000000012'
        |ORDER BY c_name LIMIT 10""".stripMargin,
    "e1_index_stats" ->
      """WITH c AS (SELECT md5(text) AS h, max(n_chars) AS len FROM documents GROUP BY 1),
        |l AS (SELECT count(*) AS object_count, CAST(sum(n_chars) AS BIGINT) AS logical_chars FROM documents),
        |p AS (SELECT count(*) AS chunk_count, CAST(sum(len) AS BIGINT) AS physical_chars FROM c)
        |SELECT object_count, chunk_count, logical_chars, physical_chars,
        |  CASE WHEN physical_chars = 0 OR logical_chars = 0 THEN 0.0
        |       ELSE round(CAST(logical_chars AS DOUBLE) / physical_chars, 4) END AS ratio_x
        |FROM l, p""".stripMargin,
    "e3_object_rollup" ->
      """SELECT l_orderkey, count(*) AS chunk_count,
        |  CAST(sum(l_quantity) AS DOUBLE) AS original_length,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem GROUP BY 1 ORDER BY l_orderkey""".stripMargin,
    "f1_gc_orphans" ->
      """SELECT c_custkey, c_name, c_acctbal AS acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "g1_reconstruct" ->
      """SELECT l_orderkey,
        |  string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey) AS chunk_seq
        |FROM lineitem GROUP BY 1 ORDER BY l_orderkey""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  o_totalprice, CAST(sum(l_quantity) AS DOUBLE) AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2, 3, 4, 5 HAVING sum(l_quantity) > 250
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,
    "q14_promo_share" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
        |  CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE) AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue,
        |  round(100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY ship_month""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    // q22: average in decimal to match Spark's exact accumulate; the
    // comparison value is then one double, identical in both engines
    "q22_dormant_balance" ->
      """WITH a AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n_custs,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer, a
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY 1 ORDER BY nationkey""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS mkt_total,
        |  CAST(sum(CAST(CASE WHEN sn.n_name = 'NATION_0'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE) AS nation_rev,
        |  round(CAST(sum(CAST(CASE WHEN sn.n_name = 'NATION_0'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 6) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "w4_trailing_revenue" ->
      """WITH daily AS (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_date,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS day_revenue
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, ship_date, day_revenue,
        |  CAST(sum(CAST(day_revenue AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey ORDER BY ship_date
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_7d
        |FROM daily ORDER BY l_suppkey, ship_date""".stripMargin,
    "q15_top_supplier" ->
      """WITH r AS (SELECT l_suppkey,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM r JOIN supplier ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM r)
        |ORDER BY s_suppkey""".stripMargin,
    // q17: the threshold is decimal-sum -> ONE cast -> IEEE divide/multiply,
    // mirrored exactly on the Spark side, so the boundary compare is bitwise
    "q17_small_quantity" ->
      """WITH lim AS (SELECT l_partkey,
        |  0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS qty_limit
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN lim USING (l_partkey)
        |JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < qty_limit AND p_size <= 5""".stripMargin,
    "q19_disjunctive" ->
      """SELECT count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_size BETWEEN 25 AND 50 AND l_quantity BETWEEN 20 AND 36)""".stripMargin,
    // q2: min over stored doubles is arithmetic-free, so the equality
    // join-back and the order-by are exact in both engines
    "q2_min_cost_supplier" ->
      """WITH e AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |eur AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |cand AS (SELECT p.p_partkey, p.p_name, eur.*
        |  FROM e JOIN part p ON e.l_partkey = p.p_partkey AND p.p_size = 15
        |  JOIN eur ON e.l_suppkey = eur.s_suppkey),
        |m AS (SELECT p_partkey AS mk, min(s_acctbal) AS min_bal FROM cand GROUP BY 1)
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal AS supplier_bal
        |FROM cand JOIN m ON p_partkey = mk AND s_acctbal = min_bal
        |ORDER BY supplier_bal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    // q9: the profit expression evaluates in the same operand order
    // (ep*(1-d)) - ((rp*0.1)*q) on both sides before the decimal accumulate
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    - p_retailprice * 0.1 * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q12_late_priority" ->
      """WITH d AS (SELECT
        |  date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS delay_days,
        |  o_orderpriority IN ('1-URGENT', '2-HIGH') AS crit
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT CASE WHEN delay_days <= 30 THEN 'a_0_30'
        |            WHEN delay_days <= 60 THEN 'b_31_60'
        |            WHEN delay_days <= 90 THEN 'c_61_90'
        |            ELSE 'd_over_90' END AS delay_bucket,
        |  CAST(sum(CASE WHEN crit THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN crit THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM d GROUP BY 1 ORDER BY delay_bucket""".stripMargin,
    // q20: quantities accumulate decimal-exact; 0.5 is a power of two, so
    // the dominance comparison cannot flip between engines
    "q20_excess_supply" ->
      """WITH yr AS (SELECT * FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'),
        |ps AS (SELECT l_partkey, l_suppkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS supp_qty
        |  FROM yr GROUP BY 1, 2),
        |p AS (SELECT l_partkey AS pk,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM yr GROUP BY 1),
        |dom AS (SELECT l_suppkey, count(*) AS n_dominant_parts
        |  FROM ps JOIN p ON l_partkey = pk
        |  WHERE supp_qty > 0.5 * total_qty GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name, n_dominant_parts
        |FROM dom JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin,
    "q13_order_distribution" ->
      """WITH pc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM pc GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "w1_top_per_brand" ->
      """WITH rev AS (SELECT p_brand, p_partkey,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rank FROM rev)
        |SELECT p_brand, p_partkey, revenue, rank FROM r WHERE rank <= 3
        |ORDER BY p_brand, rank""".stripMargin,
    "w3_topk_agg" ->
      """WITH rev AS (SELECT p_brand, p_partkey,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rank FROM rev)
        |SELECT p_brand, p_partkey, revenue, rank FROM r WHERE rank <= 3
        |ORDER BY p_brand, rank""".stripMargin,
    "w2_running_revenue" ->
      """WITH daily AS (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_date,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS day_revenue
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, ship_date, day_revenue,
        |  CAST(sum(CAST(day_revenue AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey ORDER BY ship_date
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
        |FROM daily ORDER BY l_suppkey, ship_date""".stripMargin,
    "r1_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "r2_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    // r3: grouping flags as separate 0/1 columns (combined grouping_id bit
    // orders are engine-specific; GROUPING(col) is portable)
    "r3_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_stat,
        |  count(*) AS n, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY g_flag, g_stat, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "s3_bag_set_ops" ->
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |  EXCEPT ALL
        |  SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |ORDER BY o_custkey""".stripMargin,
    "w5_window_suite" ->
      """WITH daily AS (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_date,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS day_revenue
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, ship_date, day_revenue,
        |  lag(day_revenue) OVER w AS prev_rev,
        |  lead(day_revenue) OVER w AS next_rev,
        |  first_value(day_revenue) OVER w AS first_rev,
        |  round(percent_rank() OVER w, 6) AS pr
        |FROM daily WINDOW w AS (PARTITION BY l_suppkey ORDER BY ship_date)
        |ORDER BY l_suppkey, ship_date""".stripMargin,
    // w6: the stage qualifications are the SAME stacked strictly-prior
    // ROWS-frame running mins (deterministic under us ties via event_id)
    "w6_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fv_prior FROM e),
        |s2 AS (SELECT *, CASE WHEN event_type = 'click' AND us - fv_prior <= 259200000000 THEN us END AS qc_us FROM s1),
        |s3 AS (SELECT *, min(qc_us)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fc_prior FROM s2),
        |s4 AS (SELECT *, CASE WHEN event_type = 'purchase' AND us - fc_prior <= 259200000000 THEN us END AS qp_us FROM s3),
        |u AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END) AS fv,
        |        min(qc_us) AS fc, min(qp_us) AS fp FROM s4 GROUP BY 1)
        |SELECT count(*) AS users_total,
        |  CAST(count(fv) AS BIGINT) AS users_viewed,
        |  CAST(count(fc) AS BIGINT) AS users_clicked,
        |  CAST(count(fp) AS BIGINT) AS users_purchased,
        |  round(CAST(sum(fc - fv) AS DOUBLE) / count(fc), 4) AS avg_view_to_click_us,
        |  round(CAST(sum(fp - fc) AS DOUBLE) / count(fp), 4) AS avg_click_to_purchase_us
        |FROM u""".stripMargin,
    "p1_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS q25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS q50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS q75,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS price_median
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    // The audit twins (p2b/q6b): the oracle re-derives the EXACT lanes and
    // asserts the verdict columns literally — the Spark side computed the
    // sketch's error contract in-query, so a sketch drifting past its bound
    // flips the verdict to 0 and breaks the hash.
    "p2b_percentile_audit" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS exact_q25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS exact_q50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS exact_q75,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_price_median,
        |  CAST(1 AS BIGINT) AS within_envelope
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q6b_distinct_audit" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  CAST(1 AS BIGINT) AS parts_within_bound,
        |  CAST(1 AS BIGINT) AS orders_within_bound
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "s2_exact_stats" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
        |  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sqq,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
        |  CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS spp,
        |  CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sqp
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  round(sq / n, 6) AS mean_qty,
        |  round((sqq - sq * sq / n) / n, 6) AS var_qty,
        |  round((n * sqp - sq * sp) / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 6)
        |    AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "j1_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |w AS (SELECT *, max(CASE WHEN event_type = 'view' THEN ts_us END) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_us FROM e)
        |SELECT event_id, user_id, ts_us, prior_view_us, ts_us - prior_view_us AS gap_us
        |FROM w WHERE event_type = 'click' AND prior_view_us IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "j2_range_bucket" ->
      """SELECT bucket, count(*) AS n,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN (VALUES (0.0, 10.0, 'small'), (10.0, 25.0, 'mid'),
        |  (25.0, 40.0, 'large'), (40.0, 1000000000.0, 'huge')) v(lo, hi, bucket)
        |  ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    // j3: the oracle is the QUADRATIC overlap join (fine at oracle scale);
    // the grid-cell prefilter is complete, so the answers must hash-match
    "j3_interval_overlap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |s AS (SELECT user_id, us, event_id,
        |  us - coalesce(lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id), us) AS gap
        |  FROM e),
        |m AS (SELECT user_id, us,
        |  sum(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM s),
        |sess AS (SELECT user_id, sid, min(us) AS st, max(us) AS en FROM m GROUP BY 1, 2)
        |SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS n_overlaps,
        |  CAST(sum(least(a.en, b.en) - greatest(a.st, b.st)) AS BIGINT) AS total_overlap_us
        |FROM sess a JOIN sess b
        |  ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
        |GROUP BY 1, 2 ORDER BY ua, ub""".stripMargin,
    "y5_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  round(avg(CAST(props->>'k' AS BIGINT)), 4) AS avg_k,
        |  CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "s1_set_ops" ->
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |ORDER BY c_custkey""".stripMargin,
    // t3: integer epoch-week via //, matching Spark's DIV exactly
    "t3_cohort_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |  epoch_us(ts) // 604800000000 AS wk FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM wk GROUP BY 1)
        |SELECT c.cohort_wk, wk.wk - c.cohort_wk AS week_offset,
        |  count(*) AS n_active
        |FROM wk JOIN c ON wk.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_wk, week_offset""".stripMargin,
    "t1_events_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // t4: generate_series rebuilds the dense hour grid; last_value IGNORE
    // NULLS is the LOCF carry; hv sums in DECIMAL so the carried double is
    // partition-order-independent on the Spark side
    "t4_gap_fill" ->
      """WITH a AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
        |    count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS hv
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM a GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(lo, hi)) AS hr FROM b),
        |j AS (SELECT g.event_type, g.hr, coalesce(a.n, 0) AS n_events, a.hv
        |  FROM g LEFT JOIN a ON a.event_type = g.event_type AND a.hr = g.hr)
        |SELECT event_type, hr, CAST(n_events AS BIGINT) AS n_events,
        |  last_value(hv IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
        |FROM j ORDER BY event_type, hr""".stripMargin,
    // t5: every EWMA weight is 1/2^(k+1) — dyadic, so each contribution
    // and every partial sum is EXACT in double: order-independent, no
    // decimal machinery needed (why alpha is a power of two)
    "t5_ewma_smooth" ->
      """WITH a AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM a GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(lo, hi)) AS hr FROM b),
        |c AS (SELECT event_type, hr + k AS thr, n / CAST(1 << (k + 1) AS DOUBLE) AS w
        |  FROM a CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS k)),
        |e AS (SELECT event_type, thr, sum(w) AS ewma FROM c GROUP BY 1, 2)
        |SELECT g.event_type, g.hr, CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
        |  coalesce(e.ewma, 0.0) AS ewma_value
        |FROM g LEFT JOIN a ON a.event_type = g.event_type AND a.hr = g.hr
        |LEFT JOIN e ON e.event_type = g.event_type AND e.thr = g.hr
        |ORDER BY g.event_type, g.hr""".stripMargin,
    "j4_interval_anti" ->
      """WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |    WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'),
        |u AS (SELECT v.user_id, v.event_id, v.us FROM v
        |  WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = v.user_id
        |    AND c.us > v.us AND c.us <= v.us + 259200000000)),
        |t AS (SELECT us // 604800000000 AS wk, count(*) AS n_views FROM v GROUP BY 1),
        |n AS (SELECT us // 604800000000 AS wk, count(*) AS n_unconverted FROM u GROUP BY 1)
        |SELECT t.wk, t.n_views, CAST(coalesce(n.n_unconverted, 0) AS BIGINT) AS n_unconverted
        |FROM t LEFT JOIN n ON n.wk = t.wk ORDER BY t.wk""".stripMargin,
    "w7_basket_pairs" ->
      """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        |  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        |SELECT part_a, part_b, count(*) AS n_orders
        |FROM p GROUP BY 1, 2 ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,
    // m4: the sampling schedule re-derived from the stub's sha256
    // durations; generate_series is end-inclusive in both engines
    "m4_frame_sample" ->
      """WITH d AS (SELECT doc_id, sha256(text) AS h FROM documents),
        |m AS (SELECT doc_id,
        |  CASE (('0x' || substr(h, 1, 2))::INT % 3)
        |    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CASE WHEN (('0x' || substr(h, 1, 2))::INT % 3) = 0 THEN 0
        |       ELSE 1000 + 100 * ('0x' || substr(h, 7, 2))::INT END AS duration_ms
        |  FROM d),
        |t AS (SELECT doc_id, media_type,
        |    unnest(generate_series(0, duration_ms - 1, 500)) AS t_ms
        |  FROM m WHERE duration_ms > 0)
        |SELECT media_type, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_media,
        |  count(*) AS total_samples,
        |  CAST(count(DISTINCT (doc_id, t_ms // 1000)) AS BIGINT) AS total_chunks
        |FROM t GROUP BY 1 ORDER BY media_type""".stripMargin,
    // p3: every sketch cell rebuilt in SQL from the same md5 row hash, so
    // estimates (and the CMS >= true invariant) hash-match exactly
    "p3_cms_topk" ->
      """WITH k AS (SELECT l_partkey AS key, count(*) AS true_count FROM lineitem GROUP BY 1),
        |h AS (SELECT key, true_count, r,
        |    ('0x' || substr(md5(r || ':' || key), 1, 4))::INT % 256 AS b
        |  FROM k CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r)),
        |cms AS (SELECT r, b, CAST(sum(true_count) AS BIGINT) AS cell FROM h GROUP BY 1, 2),
        |est AS (SELECT h.key, min(cms.cell) AS est_count
        |  FROM h JOIN cms ON cms.r = h.r AND cms.b = h.b GROUP BY 1),
        |top AS (SELECT key, true_count FROM k ORDER BY true_count DESC, key LIMIT 20)
        |SELECT t.key AS part_key, t.true_count, e.est_count,
        |  CAST(e.est_count - t.true_count AS BIGINT) AS overcount
        |FROM top t JOIN est e ON e.key = t.key
        |ORDER BY t.true_count DESC, t.key""".stripMargin,
    // st13: every real doc admits under its source; exactly the %97
    // docs (the staged torn 20-byte prefixes) quarantine — good +
    // corrupt reconcile to staged lines by construction. HAVING guards
    // the corrupt leg: a corpus whose doc_ids avoid multiples of 97
    // stages no torn lines, so the stream lands no __corrupt__ group
    // and the oracle must not emit a count-0 row for it (r8 ADVICE).
    "st13_stream_jsonl_ingest" ->
      """SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
        |UNION ALL
        |SELECT '__corrupt__' AS source, count(*) AS n_docs
        |FROM documents WHERE doc_id % 97 = 0
        |HAVING count(*) > 0
        |ORDER BY source""".stripMargin,
    // y20: the same exact octave (binary-format length − 1) in SQL
    "y20_freq_spectrum" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |f AS (SELECT source, tok, count(*) AS f FROM tok GROUP BY 1, 2),
        |c AS (SELECT source, length(format('{:b}', f)) - 1 AS k, f FROM f)
        |SELECT source, CAST(k AS BIGINT) AS k, count(*) AS n_types,
        |  CAST(sum(f) AS BIGINT) AS n_occurrences
        |FROM c GROUP BY 1, 2 ORDER BY source, k""".stripMargin,
    "p6_kmv_overlap" -> DedupQueries.p6OracleSql,
    "st18_stream_kmv" -> DedupQueries.p6OracleSql,
    // p5: the oracle is the PLAIN exact query — the sketch prefilter is
    // a plan optimization whose correctness claim is precisely that it
    // cannot change this answer (CMS never undercounts)
    "p5_heavy_hitters" ->
      """SELECT l_partkey AS part_key, count(*) AS n_rows
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 40
        |ORDER BY n_rows DESC, part_key""".stripMargin,
    "r5_unpivot" ->
      """WITH m AS (SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1)
        |SELECT hour, event_type, n FROM m
        |UNPIVOT (n FOR event_type IN (click, error, purchase, signup, view))
        |ORDER BY hour, event_type""".stripMargin,
    "r4_pivot_matrix" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    // NOTE session_id is CAST to BIGINT: DuckDB types sum(INTEGER) as
    // HUGEINT (int128), and a pandas materialization of a HUGEINT column
    // degrades to float64 — hashing "3.0" against Spark's "3" on every row
    // (rows/schema match, hash doesn't; the exact r1/r2 gate signature).
    // This was the only uncast integer-sum OUTPUT column in the oracle map.
    "t2_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) // 1000000 AS ts_s FROM events),
        |w AS (SELECT *, lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS prev FROM e),
        |n AS (SELECT *, CASE WHEN prev IS NULL OR ts_s - prev > 1800 THEN 1 ELSE 0 END AS new_session FROM w),
        |s AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM n)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  CAST(min(ts_s) AS BIGINT) AS session_start,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    "q11_revenue_share" ->
      """WITH pr AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS part_revenue
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT CAST(sum(CAST(part_revenue AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS mean_rev FROM pr)
        |SELECT l_partkey, part_revenue,
        |  round(part_revenue / mean_rev, 4) AS ratio_to_mean
        |FROM pr, g WHERE part_revenue > 1.4 * mean_rev
        |ORDER BY l_partkey""".stripMargin,
    "q21_waiting_supplier" ->
      """WITH edges AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |late AS (SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
        |multi AS (SELECT l_orderkey FROM edges GROUP BY 1 HAVING count(*) > 1)
        |SELECT s.s_name, count(*) AS numwait
        |FROM late t
        |JOIN multi USING (l_orderkey)
        |JOIN supplier s ON t.l_suppkey = s.s_suppkey
        |WHERE NOT EXISTS (SELECT 1 FROM late t2
        |  WHERE t2.l_orderkey = t.l_orderkey AND t2.l_suppkey <> t.l_suppkey)
        |GROUP BY 1 ORDER BY numwait DESC, s_name""".stripMargin,
    // k1: salting is output-invariant — the oracle is the PLAIN join+agg
    // (decimal-accumulated sum, so partition order cannot drift the double)
    "k1_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM (SELECT CASE WHEN user_id % 4 = 0 THEN 1 ELSE user_id END AS c_custkey, value
        |      FROM events) e
        |JOIN customer USING (c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // k2: AQE's skew split is output-invariant like k1's salting — the
    // oracle is the plain join with the hot key exposed in the rollup
    "k2_aqe_skew" ->
      """SELECT c_mktsegment, (c_custkey = 1) AS is_hot, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM (SELECT CASE WHEN user_id % 4 = 0 THEN 1 ELSE user_id END AS c_custkey, value
        |      FROM events) e
        |JOIN customer USING (c_custkey)
        |GROUP BY 1, 2 ORDER BY c_mktsegment, is_hot""".stripMargin,
    // t6: trailing-7-observation z-test, cross-multiplied to decimal
    // integer-scaled arithmetic — identical formula on both engines
    "t6_anomaly_flags" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    sum(CAST(value AS DECIMAL(18,6))) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, x,
        |  count(*) OVER fr AS window_n,
        |  sum(x) OVER fr AS s,
        |  sum(x * x) OVER fr AS ss
        |  FROM d
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |  CAST(x AS DOUBLE) AS day_value,
        |  CAST(window_n AS BIGINT) AS window_n,
        |  (window_n = 7 AND
        |   (x * 7 - s) * (x * 7 - s) * 3 > (ss * 7 - s * s) * 14) AS is_anomaly
        |FROM w ORDER BY event_type, day""".stripMargin,
    // w8: per-purchase argmin/argmax touch via min/max over the ordered
    // (ts, event_id, channel) row — DuckDB min/max on a STRUCT compare
    // lexicographically, same as Spark's struct ordering
    "w8_attribution" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS pus, value
        |    FROM events WHERE event_type = 'purchase'),
        |tc AS (SELECT user_id, epoch_us(ts) AS tus, event_id AS tid, event_type AS ch
        |    FROM events WHERE event_type IN ('click', 'view')),
        |a AS (SELECT p.event_id, any_value(p.value) AS value,
        |    min({'tus': tc.tus, 'tid': tc.tid, 'ch': tc.ch}).ch AS first_ch,
        |    max({'tus': tc.tus, 'tid': tc.tid, 'ch': tc.ch}).ch AS last_ch
        |  FROM p LEFT JOIN tc ON p.user_id = tc.user_id
        |    AND tc.tus < p.pus AND tc.tus >= p.pus - 259200000000
        |  GROUP BY p.event_id),
        |u AS (SELECT value, 'first' AS role, coalesce(first_ch, 'direct') AS channel FROM a
        |  UNION ALL
        |  SELECT value, 'last' AS role, coalesce(last_ch, 'direct') AS channel FROM a)
        |SELECT channel,
        |  CAST(sum(CASE WHEN role = 'first' THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        |  CAST(sum(CASE WHEN role = 'first' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
        |    AS rev_first,
        |  CAST(sum(CASE WHEN role = 'last' THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
        |  CAST(sum(CASE WHEN role = 'last' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
        |    AS rev_last
        |FROM u GROUP BY 1 ORDER BY channel""".stripMargin,
    // m5: z3's cumsum-and-chop schedule over text+media token budgets, the
    // media side re-derived from the sha256 stub geometry (m1/m4's bridge)
    "m5_multimodal_pack" ->
      """WITH d AS (SELECT doc_id, sha256(text) AS h,
        |    length(text) - length(replace(text, ' ', '')) + 1 AS text_toks
        |  FROM documents),
        |m AS (SELECT doc_id, text_toks,
        |  CASE WHEN (('0x' || substr(h, 1, 2))::INT % 3) = 0
        |    THEN ((64 + 8 * (('0x' || substr(h, 3, 2))::INT % 32) + 15) // 16)
        |       * ((64 + 8 * (('0x' || substr(h, 5, 2))::INT % 32) + 15) // 16)
        |    ELSE (1000 + 100 * ('0x' || substr(h, 7, 2))::INT - 1) // 500 + 1
        |  END AS media_toks FROM d),
        |c AS (SELECT doc_id, text_toks, media_toks,
        |  sum(text_toks + media_toks) OVER
        |    (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fin
        |  FROM m),
        |x AS (SELECT fin - text_toks - media_toks AS strt,
        |  fin - media_toks AS tmid, fin,
        |  unnest(generate_series(CAST((fin - text_toks - media_toks) // 4096 AS BIGINT),
        |    CAST((fin - 1) // 4096 AS BIGINT))) AS seq_id FROM c)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN strt < seq_id * 4096 THEN 1 ELSE 0 END) AS BIGINT) AS n_carried,
        |  CAST(sum(greatest(least(tmid, (seq_id + 1) * 4096) - greatest(strt, seq_id * 4096), 0))
        |    AS BIGINT) AS text_fill,
        |  CAST(sum(greatest(least(fin, (seq_id + 1) * 4096) - greatest(tmid, seq_id * 4096), 0))
        |    AS BIGINT) AS media_fill,
        |  CAST(sum(least(fin, (seq_id + 1) * 4096) - greatest(strt, seq_id * 4096))
        |    AS BIGINT) AS fill_tokens
        |FROM x GROUP BY seq_id ORDER BY seq_id""".stripMargin,
    // t7: decimal-exact daily sums; baseline = one double divide; residual
    // subtracts two bit-identical doubles — no rounding anywhere
    "t7_seasonal_residual" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    sum(CAST(value AS DECIMAL(18,6))) AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, day % 7 AS dow,
        |    CAST(sum(x) AS DOUBLE) / count(*) AS dow_baseline
        |  FROM d GROUP BY 1, 2)
        |SELECT d.event_type, CAST(d.day AS BIGINT) AS day,
        |  CAST(d.x AS DOUBLE) AS day_value, b.dow_baseline,
        |  CAST(d.x AS DOUBLE) - b.dow_baseline AS residual
        |FROM d JOIN b ON d.event_type = b.event_type AND d.day % 7 = b.dow
        |ORDER BY d.event_type, day""".stripMargin,
    // w9: lag window per user; share = exact count / exact count, one IEEE op
    "w9_transition_matrix" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |    AS prev_type,
        |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |    AS prev_us
        |  FROM events),
        |m AS (SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
        |  FROM e WHERE prev_type IS NOT NULL AND us - prev_us <= 1800000000
        |  GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    // j5: the same lexicographic min(struct) pick as w8's argmin bridge
    "j5_nearest_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS pus FROM events
        |    WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS cu, event_id AS click_id, epoch_us(ts) AS cus
        |    FROM events WHERE event_type = 'click'),
        |a AS (SELECT p.event_id, any_value(p.user_id) AS user_id,
        |    min({'adus': abs(c.cus - p.pus), 'cid': c.click_id,
        |         'dus': c.cus - p.pus}) AS m
        |  FROM p JOIN c ON p.user_id = c.cu
        |    AND abs(c.cus - p.pus) <= 86400000000
        |  GROUP BY p.event_id)
        |SELECT event_id, user_id, m.cid AS nearest_click_id, m.dus AS delta_us
        |FROM a ORDER BY event_id""".stripMargin,
    // v13: threshold on the RAW double dot (bit-identical per the dot_f
    // contract), round only the output — v1/v6's oracle discipline
    "v13_range_search" ->
      """WITH q AS (SELECT label, vec_id AS query_id, embedding AS qv
        |    FROM embeddings WHERE vec_id < 10)
        |SELECT query_id, e.vec_id AS neighbor_id,
        |  round(list_dot_product(e.embedding::DOUBLE[], qv::DOUBLE[]), 6) AS sim
        |FROM embeddings e JOIN q USING (label)
        |WHERE e.vec_id <> q.query_id
        |  AND list_dot_product(e.embedding::DOUBLE[], qv::DOUBLE[]) >= 0.15
        |ORDER BY query_id, neighbor_id""".stripMargin,
    // p4: floor(value/50) is one IEEE divide + floor — identical on both
    // engines; bin mass sums in decimal
    "p4_histogram" ->
      """SELECT event_type,
        |  CAST(least(floor(value / 50), 9) AS BIGINT) AS bucket,
        |  CAST(least(floor(value / 50), 9) AS BIGINT) * 50 AS lo,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS mass
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    // x15: the shared hyperplane-keys CTE + the two-level occupancy rollup
    "x15_lsh_profile" -> (hyperplaneKeysCte +
      """,
        |bs AS (SELECT band, band_key, count(*) AS bucket_size
        |  FROM keys GROUP BY 1, 2)
        |SELECT CAST(band AS BIGINT) AS band,
        |  CAST(bucket_size AS BIGINT) AS bucket_size,
        |  count(*) AS n_buckets,
        |  CAST(count(*) * bucket_size * (bucket_size - 1) // 2 AS BIGINT) AS cand_pairs
        |FROM bs GROUP BY band, bucket_size ORDER BY band, bucket_size""".stripMargin),
    // z6: same start-offset shard rule via a per-source window cumsum
    "z6_shard_binpack" ->
      """WITH c AS (SELECT doc_id, source, n_chars,
        |  sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fin
        |  FROM documents)
        |SELECT source, CAST((fin - n_chars) // 50000 AS BIGINT) AS shard,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS shard_chars,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc, CAST(max(doc_id) AS BIGINT) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY source, shard""".stripMargin,
    // st1's streamed answer is the batch hourly rollup (decimal-exact sums,
    // Append mode finalizes every window on the staged one-batch replay) —
    // the oracle is t1's SQL
    "st1_stream_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // st3: the doubled at-least-once stream dedupes back to EXACTLY the
    // single-copy batch rollup — st1's SQL verbatim is the oracle
    "st3_stream_dedup" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // st2 oracle replicates session_window MERGE semantics at µs precision:
    // an event's [ts, ts+30min) window merges with the previous one only if
    // they OVERLAP, so a gap of exactly 30 minutes starts a NEW session
    // (>=, where t2's gap rule is >) — and boundaries are on raw µs, not
    // t2's second-truncated ts
    "st2_stream_sessions" -> sessionOracleSql,
    // st8 runs the hand-rolled flatMapGroupsWithState session machine
    // against the SAME oracle — a hash-match here is the proof the custom
    // state machine and the native session_window operator agree exactly
    "st8_stream_custom_sessions" -> sessionOracleSql,
    // st6: unroll each event's 4 sliding-window memberships on the
    // epoch-aligned 15-minute grid (t lands in windows grid-k*15min,
    // k=0..3 — always exactly 4, since t - grid < 15 min)
    "st6_stream_sliding" ->
      """WITH e AS (SELECT event_type, value,
        |  epoch_us(ts) - epoch_us(ts) % 900000000 AS grid FROM events),
        |w AS (SELECT event_type, value, grid - CAST(k.k AS BIGINT) * 900000000 AS ws
        |  FROM e, (SELECT unnest([0, 1, 2, 3]) AS k) k)
        |SELECT CAST(ws AS BIGINT) AS win_start_us, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY win_start_us, event_type""".stripMargin,
    // st5: the outer join's batch equivalent — NULL click rows included,
    // so the hash-match proves the streaming outer side's watermark-driven
    // NULL emission reproduces batch LEFT JOIN semantics exactly.
    "st5_stream_outer_join" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS view_ts_us, event_id AS view_id
        |  FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(ts) AS click_ts_us, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT v.view_id, v.user_id, v.view_ts_us, c.click_id, c.click_ts_us
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |  AND c.click_ts_us >= v.view_ts_us
        |  AND c.click_ts_us <= v.view_ts_us + 1800000000
        |ORDER BY view_id, click_id""".stripMargin,
    // st7: the stream-static join emits rows verbatim (no aggregation), so
    // the oracle is the batch join at integer epoch-µs; `value` is carried
    // per-row (no sum — no partition-order risk)
    "st7_stream_static_join" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, value, c_name, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    // st4: the stream-stream join's batch equivalent. Both engines compare
    // INTEGER epoch-µs (the stream truncates the ns source to µs at read;
    // epoch_us floors the same way), so the 30-minute boundary is exact.
    "st4_stream_join" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS view_ts_us, event_id AS view_id
        |  FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(ts) AS click_ts_us, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT c.click_id, c.user_id, c.click_ts_us, v.view_id, v.view_ts_us
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND v.view_ts_us <= c.click_ts_us
        |  AND v.view_ts_us >= c.click_ts_us - 1800000000
        |ORDER BY click_id, view_id""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_size <= 3
        |  AND NOT EXISTS (SELECT 1 FROM supplier
        |    WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "x1_exact_dup_stats" ->
      """SELECT count(*) AS total_docs, count(DISTINCT sha256(text)) AS distinct_docs,
        |  count(*) - count(DISTINCT sha256(text)) AS duplicate_docs
        |FROM documents""".stripMargin,
    "x2_normalized_dup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_key,
        |  count(*) AS n_docs, min(doc_id) AS keep_doc_id
        |FROM documents GROUP BY 1 ORDER BY norm_key""".stripMargin,
    "x3_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
        |  for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS sh FROM t),
        |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |sizes AS (SELECT doc_id, len(sh) AS n FROM s),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b,
        |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 4) AS jaccard
        |  FROM inter JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b)
        |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // x4's OUTPUT is oracle-able even though MinHash itself is not: the
    // emitted rows are the exact-Jaccard-VERIFIED pair set (doc_a, doc_b,
    // jaccard), which is hash-independent — banding only generates
    // candidates, and on near-identical dup clusters (jaccard >= 0.5 with
    // 4x4 banding) every true pair collides in some band, so the verified
    // set equals x3's exact set; DedupQueriesSpec pins that equality.
    // x4: the oracle re-derives the SAME md5-affine minhash banding (r8
    // migration — the old oracle was the exact all-pairs answer, which
    // only matches while LSH recall is accidentally total; the sf0.1
    // full-surface gate caught a J=0.8 pair missing all 4 bands), then
    // exact-Jaccard-verifies exactly the banded candidates
    "x4_minhash_lsh" ->
      (minhashBandCte + """,
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.bkey = b.bkey
        |    AND a.doc_id < b.doc_id),
        |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
        |  FROM cand c JOIN e a ON a.doc_id = c.doc_a
        |  JOIN e b ON b.doc_id = c.doc_b AND b.g = a.g
        |  GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b,
        |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 4) AS jaccard
        |  FROM inter JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b)
        |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin),
    "x7_dup_clusters" -> (dupClusterCte +
      """
        |SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id
        |FROM cl ORDER BY doc_id""".stripMargin),
    // x10: x7's transitive-closure CTE extended with the per-cluster
    // keep/drop rollup; sums cast to BIGINT (HUGEINT degrades under the
    // driver's pandas materialization)
    "x10_dedup_keep" -> (dupClusterCte +
      """
        |SELECT CAST(cl.cluster_id AS BIGINT) AS cluster_id, count(*) AS n_members,
        |  CAST(min(cl.doc_id) AS BIGINT) AS keep_doc_id,
        |  count(*) - 1 AS n_removed,
        |  CAST(sum(CASE WHEN cl.doc_id <> cl.cluster_id THEN d.n_chars ELSE 0 END) AS BIGINT)
        |    AS chars_removed
        |FROM cl JOIN documents d USING (doc_id)
        |GROUP BY 1 ORDER BY cluster_id""".stripMargin),
    // z8: the composed export manifest — x10's survivors (docs that are
    // not non-keeper cluster members) run z3's token cumsum, then chop at
    // shard granularity (64 sequences × 2048 tokens = 131072); per
    // (shard, source) doc count + token fill must equal what the landed
    // parquet reads back
    "z8_shard_export" -> (dupClusterCte + """,
        |surv AS (SELECT d.doc_id, d.source,
        |  length(d.text) - length(replace(d.text, ' ', '')) + 1 AS toks
        |  FROM documents d
        |  WHERE d.doc_id NOT IN (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)),
        |soff AS (SELECT doc_id, source, toks,
        |  sum(toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fin
        |  FROM surv WHERE toks > 0),
        |sx AS (SELECT source, fin - toks AS strt, fin,
        |  unnest(generate_series(CAST((fin - toks) // 131072 AS BIGINT),
        |    CAST((fin - 1) // 131072 AS BIGINT))) AS shard_id FROM soff)
        |SELECT CAST(shard_id AS BIGINT) AS shard_id, source, count(*) AS n_docs,
        |  CAST(sum(least(fin, (shard_id + 1) * 131072) - greatest(strt, shard_id * 131072))
        |    AS BIGINT) AS fill_tokens
        |FROM sx GROUP BY 1, 2 ORDER BY shard_id, source""".stripMargin),
    // z1: the three-filter composition over the shared cluster CTE — the
    // text gates re-derive y2/y8's arithmetic, the dup gate is cl's
    // non-keeper members, all per-doc flags AND'd before the rollup.
    // dupClusterCte exposes t(doc_id, toks) for the repetition gate's
    // full (non-distinct) shingle list.
    "z1_curation_survivors" -> (dupClusterCte +
      """,
        |dropped AS (SELECT doc_id FROM cl WHERE doc_id <> cluster_id),
        |rep AS (SELECT doc_id,
        |  [array_to_string(toks[i:i+2], ' ')
        |   for i in generate_series(1, greatest(len(toks) - 2, 1))] AS shall
        |  FROM t),
        |rr AS (SELECT doc_id,
        |  round(CAST(len(shall) - len(list_distinct(shall)) AS DOUBLE) / len(shall), 4)
        |    AS rep_ratio FROM rep),
        |d AS (SELECT doc_id, source,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |  (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ' '))) / 4
        |    + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ' '))) / 2
        |    AS stop_hits
        |  FROM documents),
        |k AS (SELECT d.doc_id, d.source, d.n_tokens,
        |  CASE WHEN round(CAST(d.stop_hits AS DOUBLE) / d.n_tokens, 4) >= 0.05
        |        AND rr.rep_ratio <= 0.2 AND dr.doc_id IS NULL
        |       THEN 1 ELSE 0 END AS kept
        |  FROM d JOIN rr ON rr.doc_id = d.doc_id
        |  LEFT JOIN dropped dr ON dr.doc_id = d.doc_id)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(kept) AS BIGINT) AS kept_docs,
        |  CAST(sum(CASE WHEN kept = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM k GROUP BY 1 ORDER BY source""".stripMargin),
    // x11: x3's exact shingle/Jaccard SQL restricted to new x old pairs
    // (new = doc_id % 7 = 0), best match by (jaccard DESC, doc_b), then a
    // LEFT join from the full new slice so kept docs surface with NULLs.
    // Emitted values are the verified exact pairs, so banding on the Spark
    // side is output-invariant (same argument as x4's oracle).
    // x11: same r8 banding migration as x4 — candidates come from the
    // shared md5-affine band CTE (new x old only), then exact verify
    "x11_incremental_dedup" -> incrementalDedupOracle,
    // x16: the same chain with the retracted slice masked out of the
    // band join's standing side (DedupQueries.X16RetractSql)
    "x16_index_retract" -> incrementalDedupOracleFor(" AND b.doc_id % 5 <> 2"),
    // st14: the streamed admission table must hash-match x11's BATCH
    // oracle verbatim — verdicts are independent per new doc (static
    // index side), so micro-batch boundaries provably cannot change them
    "st14_stream_ingest_dedup" -> incrementalDedupOracle,
    // st15: the watermark's drop arithmetic in closed form — wm =
    // (floor-ms of max ts − 30 min) µs; a late row (the last 6 h of the
    // corpus, shifted −1 h — straddles the cutoff so both outcomes occur)
    // is dropped iff its hour-window END ≤ wm (boundary pinned by
    // LateDataAuditSpec); `__dropped__` counts DISTINCT expired windows
    // because numRowsDroppedByWatermark meters post-partial-agg rows
    "st15_late_audit" ->
      """WITH ev AS (SELECT event_id, ts, value FROM events),
        |mx AS (SELECT max(epoch_us(ts)) AS mu FROM ev),
        |wm AS (SELECT ((mu // 1000) - 1800000) * 1000 AS wmu FROM mx),
        |late AS (SELECT ts - INTERVAL 1 HOUR AS ts, value FROM ev, mx
        |  WHERE epoch_us(ts) > mu - 21600000000),
        |kept AS (SELECT l.ts, l.value FROM late l, wm
        |  WHERE epoch_us(date_trunc('hour', l.ts) + INTERVAL 1 HOUR) > wmu),
        |dropped AS (SELECT count(DISTINCT date_trunc('hour', l.ts)) AS n
        |  FROM late l, wm
        |  WHERE epoch_us(date_trunc('hour', l.ts) + INTERVAL 1 HOUR) <= wmu),
        |allrows AS (SELECT ts, value FROM ev UNION ALL SELECT ts, value FROM kept)
        |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM allrows GROUP BY 1
        |UNION ALL
        |SELECT '__dropped__' AS bucket, n, CAST(NULL AS DOUBLE) AS sum_value
        |FROM dropped
        |ORDER BY bucket""".stripMargin,
    // z2: x11's new x old dedupe gate (dropped = has ANY verified old
    // match among the BANDED candidates — the r8 migration, so the gate
    // composes x11's actual verdicts at every scale) with y2/y8's
    // text-gate arithmetic, restricted to the new slice
    "z2_incremental_curation" ->
      (minhashBandCte + """,
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.bkey = b.bkey
        |    AND a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0),
        |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
        |  FROM cand c JOIN e a ON a.doc_id = c.doc_a
        |  JOIN e b ON b.doc_id = c.doc_b AND b.g = a.g
        |  GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b,
        |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 4) AS jaccard
        |  FROM inter JOIN sizes na ON na.doc_id = doc_a JOIN sizes nb ON nb.doc_id = doc_b),
        |dropped AS (SELECT DISTINCT doc_a AS doc_id FROM j WHERE jaccard >= 0.5),
        |rep AS (SELECT doc_id,
        |  [array_to_string(toks[i:i+2], ' ')
        |   for i in generate_series(1, greatest(len(toks) - 2, 1))] AS shall
        |  FROM t WHERE doc_id % 7 = 0),
        |rr AS (SELECT doc_id,
        |  round(CAST(len(shall) - len(list_distinct(shall)) AS DOUBLE) / len(shall), 4)
        |    AS rep_ratio FROM rep),
        |d AS (SELECT doc_id, source,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |  (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ' '))) / 4
        |    + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ' '))) / 2
        |    AS stop_hits
        |  FROM documents WHERE doc_id % 7 = 0),
        |k AS (SELECT d.doc_id, d.source, d.n_tokens,
        |  CASE WHEN round(CAST(d.stop_hits AS DOUBLE) / d.n_tokens, 4) >= 0.05
        |        AND rr.rep_ratio <= 0.2 AND dr.doc_id IS NULL
        |       THEN 1 ELSE 0 END AS admitted
        |  FROM d JOIN rr ON rr.doc_id = d.doc_id
        |  LEFT JOIN dropped dr ON dr.doc_id = d.doc_id)
        |SELECT source, count(*) AS n_new_docs,
        |  CAST(sum(admitted) AS BIGINT) AS admitted_docs,
        |  CAST(sum(CASE WHEN admitted = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
        |    AS admitted_tokens
        |FROM k GROUP BY 1 ORDER BY source""".stripMargin),
    // x8: shingle formula matches x3's (hashing preserves set identity, so
    // shared-gram counts agree); eval slice = every 50th doc_id
    "x8_contamination" -> contaminationOracle,
    // x12: the bloom prefilter is semantically transparent (no false
    // negatives + exact confirm join), so the oracle is x8's, verbatim
    "x12_bloom_decontaminate" -> contaminationOracle,
    // x14: positional 8-gram (truncating tail, 0-based pos) -> global
    // occurrence count -> per-doc interval merge via running max-end
    "x14_substring_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, len(toks) AS total_words,
        |    unnest([{'pos': i - 1, 'g': md5(array_to_string(toks[i:i+7], ' '))}
        |      for i in generate_series(1, greatest(len(toks) - 7, 1))]) AS u
        |  FROM t),
        |o AS (SELECT doc_id, total_words, u.pos AS pos, u.g AS g FROM s),
        |f AS (SELECT *, count(*) OVER (PARTITION BY g) AS cnt FROM o),
        |d AS (SELECT doc_id, total_words, pos, pos + 7 AS e FROM f WHERE cnt >= 2),
        |m AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM d),
        |r AS (SELECT doc_id, total_words,
        |    CASE WHEN pm IS NULL OR pos > pm THEN 1 ELSE 0 END AS ns,
        |    greatest(0, e - greatest(pos - 1, coalesce(pm, -1))) AS contrib FROM m)
        |SELECT doc_id, CAST(sum(ns) AS BIGINT) AS n_dup_spans,
        |  CAST(sum(contrib) AS BIGINT) AS dup_words,
        |  CAST(max(total_words) AS BIGINT) AS total_words,
        |  round(CAST(sum(contrib) AS DOUBLE) / max(total_words), 4) AS dup_frac
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "y7_hash_sample" ->
      """SELECT doc_id, lang,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 10 AS BIGINT) AS bucket
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 10 < 2
        |ORDER BY doc_id""".stripMargin,
    // y10: integer-exact acceptance test (h * n_lang < target_n * 2^32),
    // so the md5-keyed threshold has no floating-point boundary risk in
    // either engine. DuckDB parses '0x…'-prefixed hex into BIGINT the same
    // way y7's 4-char variant parses into INT.
    "y10_mixture_resample" ->
      """WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
        |t AS (SELECT min(n_lang) AS target_n FROM c),
        |d AS (SELECT doc_id, lang,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT d.doc_id, d.lang, c.n_lang, t.target_n
        |FROM d JOIN c USING (lang), t
        |WHERE d.h * c.n_lang < t.target_n * 4294967296
        |ORDER BY d.doc_id""".stripMargin,
    "y11_lexical_diversity" ->
      """WITH tot AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS total_tokens
        |  FROM documents GROUP BY 1),
        |u AS (SELECT source, count(DISTINCT tok) AS distinct_tokens
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1)
        |SELECT source, n_docs, total_tokens, distinct_tokens,
        |  round(CAST(distinct_tokens AS DOUBLE) / total_tokens, 6) AS ttr
        |FROM tot JOIN u USING (source) ORDER BY source""".stripMargin,
    // y12: the injected-PII scrub. Same deterministic doc_id-sliced
    // injection on both sides; regexes stay in the Java-regex/RE2 common
    // subset (plain classes + \b, no lookaround). DuckDB regexp_replace
    // needs the explicit 'g' flag to match Spark's replace-all semantics.
    "y12_pii_scrub" ->
      """WITH p AS (SELECT source, doc_id,
        |  text ||
        |  CASE WHEN doc_id % 7 = 0
        |    THEN ' contact user' || doc_id || '@example.com now' ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0
        |    THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
        |    ELSE '' END AS pii_text
        |  FROM documents),
        |m AS (SELECT source, pii_text,
        |  len(regexp_extract_all(pii_text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(pii_text, '\b555-[0-9]{4}\b')) AS n_phones,
        |  regexp_replace(regexp_replace(pii_text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS clean
        |  FROM p)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs,
        |  CAST(sum(n_emails) AS BIGINT) AS n_emails,
        |  CAST(sum(n_phones) AS BIGINT) AS n_phones,
        |  CAST(sum(length(pii_text) - length(clean)) AS BIGINT) AS chars_delta
        |FROM m GROUP BY source ORDER BY source""".stripMargin,
    // y16: chr(769) = U+0301 combining acute (decomposed, NFC composes it
    // away), chr(233) = precomposed é (NFC-stable). Both engines implement
    // the same Unicode NFC and length() counts codepoints in both.
    "y16_nfc_clean" ->
      """WITH a AS (SELECT lang,
        |  text || CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769)
        |    WHEN doc_id % 3 = 1 THEN ' caf' || chr(233) ELSE '' END AS aug
        |  FROM documents),
        |n AS (SELECT lang, aug, nfc_normalize(aug) AS nrm FROM a)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN nrm <> aug THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(sum(length(aug)) AS BIGINT) AS chars_raw,
        |  CAST(sum(length(nrm)) AS BIGINT) AS chars_nfc
        |FROM n GROUP BY 1 ORDER BY lang""".stripMargin,
    // y17: tag regex in the Java/RE2 common subset; entity decode is plain
    // replace (identical left-to-right non-overlap semantics both engines)
    "y17_markup_strip" ->
      """WITH a AS (SELECT source, text ||
        |    CASE WHEN doc_id % 7 = 0
        |      THEN ' <b>bold</b> &amp; <a href="x">link</a>' ELSE '' END AS aug
        |  FROM documents),
        |s AS (SELECT source, aug,
        |  replace(regexp_replace(aug, '<[^>]*>', '', 'g'), '&amp;', '&') AS clean FROM a)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN regexp_matches(aug, '<[^>]*>') THEN 1 ELSE 0 END) AS BIGINT) AS marked_docs,
        |  CAST(sum(length(aug) - length(clean)) AS BIGINT) AS chars_removed
        |FROM s GROUP BY 1 ORDER BY source""".stripMargin,
    "z5_zorder_layout" -> LayoutOps.z5OracleSql,
    "z7_zone_skip" -> LayoutOps.z7OracleSql,
    "z9_hilbert_layout" -> LayoutOps.z9OracleSql,
    "z10_hilbert_export" -> LayoutOps.z10OracleSql,
    // st20 shares z10's oracle verbatim (the st14/st18 pattern): the
    // streamed lake must hold exactly the batch writer's cut
    "st20_stream_hilbert_sink" -> LayoutOps.z10OracleSql,
    // y13: y2's exact stop-hit arithmetic + row_number over the same
    // deterministic (score desc, doc_id) order; integer-only rollup
    "y13_source_cap" ->
      """WITH d AS (SELECT doc_id, source,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |  (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ' '))) / 4
        |    + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ' '))) / 2 AS stop_hits
        |  FROM documents),
        |s AS (SELECT doc_id, source, n_tokens,
        |  round(CAST(stop_hits AS DOUBLE) / n_tokens, 4) AS score FROM d),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |  ORDER BY score DESC, doc_id) AS rk FROM s)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN rk > 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(sum(CASE WHEN rk <= 15 THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    // z3: concat-and-chop packing re-derived with one global window cumsum
    // (fine for the oracle; the Spark side computes the SAME offsets with
    // the two-pass range-partitioned pattern). `//` = DuckDB integer
    // division, matching Spark's DIV; outputs cast to BIGINT (HUGEINT sums
    // degrade under the driver's pandas materialization)
    "z3_sequence_pack" ->
      """WITH d AS (SELECT doc_id,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |  sum(toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fin
        |  FROM d WHERE toks > 0),
        |x AS (SELECT fin - toks AS strt, fin,
        |  unnest(generate_series(CAST((fin - toks) // 2048 AS BIGINT),
        |    CAST((fin - 1) // 2048 AS BIGINT))) AS seq_id FROM c)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN strt < seq_id * 2048 THEN 1 ELSE 0 END) AS BIGINT) AS n_carried,
        |  CAST(sum(least(fin, (seq_id + 1) * 2048) - greatest(strt, seq_id * 2048)) AS BIGINT) AS fill_tokens
        |FROM x GROUP BY seq_id ORDER BY seq_id""".stripMargin,
    // z4: y7's md5 hex-prefix bridge, mod 100 -> 80/10/10
    "z4_stratified_split" ->
      """WITH b AS (SELECT source, n_chars,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100 AS bkt
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM b GROUP BY 1, 2 ORDER BY source, split""".stripMargin,
    // x9: same truncating-tail shingle formula as x3/y4/y8's oracles;
    // list_distinct before the unnest = one vote per doc per span
    "x9_common_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |  for i in generate_series(1, greatest(len(toks) - 2, 1))])) AS span FROM t)
        |SELECT span, count(*) AS doc_freq FROM s GROUP BY 1
        |ORDER BY doc_freq DESC, span LIMIT 20""".stripMargin,
    // x6: the whole feature-hash embedding pipeline re-derived — integer
    // count vectors, md5 planes, sign bits via the ordered list fold,
    // rerank cosine from exact integer dots + IEEE sqrt
    "x6_embedding_cosine" -> (hyperplaneKeysCte +
      """,
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |r AS (SELECT c.doc_a, c.doc_b,
        |    round(list_dot_product(va.vec::DOUBLE[], vb.vec::DOUBLE[])
        |      / (sqrt(na.nn) * sqrt(nb.nn)), 4) AS cosine
        |  FROM cand c JOIN vl va ON va.doc_id = c.doc_a JOIN vl vb ON vb.doc_id = c.doc_b
        |    JOIN nn na ON na.doc_id = c.doc_a JOIN nn nb ON nb.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, cosine FROM r WHERE cosine >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin),
    // v2: hyperplanes rebuilt from the same centered 60-bit md5; sign
    // bits via the shared ascending-index double fold (list_dot_product)
    "v2_ann_lsh" ->
      """WITH pl AS (SELECT p, list(w ORDER BY i) AS w FROM (
        |    SELECT p, i, (('0x' || substr(md5(p || ':' || i), 1, 15))::BIGINT
        |      - 576460752303423488) / 576460752303423488.0 AS w
        |    FROM (SELECT unnest(generate_series(0, 63)) AS p)
        |    CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)) GROUP BY p),
        |sg AS (SELECT e.vec_id, pl.p,
        |    CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.w) > 0
        |      THEN 1::BIGINT ELSE 0 END AS bit
        |  FROM embeddings e CROSS JOIN pl),
        |keys AS (SELECT vec_id, p // 16 AS band,
        |    CAST(sum(bit << (p % 16)) AS BIGINT) AS band_key
        |  FROM sg GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.band_key = b.band_key
        |    AND a.vec_id < b.vec_id),
        |r AS (SELECT c.vec_a, c.vec_b,
        |    round(list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS sim
        |  FROM cand c JOIN embeddings ea ON ea.vec_id = c.vec_a
        |    JOIN embeddings eb ON eb.vec_id = c.vec_b)
        |SELECT vec_a, vec_b, sim FROM r ORDER BY sim DESC, vec_a, vec_b
        |LIMIT 50""".stripMargin,
    // x5: every simhash bit, band key and Hamming distance re-derived
    // from the same 60-bit md5 shingle hashes
    "x5_simhash_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, list_distinct([('0x' || substr(md5(g), 1, 15))::BIGINT
        |    for g in [array_to_string(toks[i:i+2], ' ')
        |              for i in generate_series(1, greatest(len(toks) - 2, 1))]]) AS hs FROM t),
        |e AS (SELECT doc_id, unnest(hs) AS h FROM sh),
        |bits AS (SELECT doc_id, b,
        |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) GROUP BY 1, 2),
        |sim AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY 1),
        |bd AS (SELECT doc_id, simhash, band, (simhash >> (band * 16)) & 65535 AS band_key
        |  FROM sim CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band)),
        |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |  FROM bd a JOIN bd b ON a.band = b.band AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 12
        |ORDER BY doc_a, doc_b""".stripMargin,
    // y4: the winnowing signature end to end — same truncating-tail
    // shingle formula as x3/y8; hashes are the first 60 md5 bits in both
    // engines, so min-selection and the final key hash-match exactly
    "y4_fingerprint" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, [('0x' || substr(md5(g), 1, 15))::BIGINT
        |    for g in [array_to_string(toks[i:i+2], ' ')
        |              for i in generate_series(1, greatest(len(toks) - 2, 1))]] AS hs FROM t),
        |fp AS (SELECT doc_id, (list_sort(list_distinct(hs)))[1:8] AS f FROM sh)
        |SELECT doc_id, ('0x' || substr(md5(array_to_string(f, ',')), 1, 15))::BIGINT AS fp_key
        |FROM fp ORDER BY doc_id""".stripMargin,
    // y8: same truncating-tail shingle formula as x3/y4's oracles
    "y8_repetition" ->
      """WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT lang, [array_to_string(toks[i:i+2], ' ')
        |  for i in generate_series(1, greatest(len(toks) - 2, 1))] AS sh FROM t),
        |m AS (SELECT lang, len(sh) AS n_grams, len(list_distinct(sh)) AS n_distinct FROM s),
        |r AS (SELECT lang, round(CAST(n_grams - n_distinct AS DOUBLE) / n_grams, 4) AS rep_ratio FROM m)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN rep_ratio > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
        |  round(avg(rep_ratio), 4) AS avg_rep_ratio,
        |  round(max(rep_ratio), 4) AS max_rep_ratio
        |FROM r GROUP BY 1 ORDER BY lang""".stripMargin,
    "y14_unigram_typicality" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tk FROM documents),
        |f AS (SELECT tk, count(*) AS cf FROM tok GROUP BY 1),
        |d AS (SELECT doc_id, lang, count(*) AS n, sum(cf) AS s
        |  FROM tok JOIN f USING (tk) GROUP BY 1, 2),
        |g AS (SELECT sum(s) AS gs, sum(n) AS gn FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN 100*s*gn < 97*gs*n THEN 1 ELSE 0 END) AS BIGINT) AS atypical_docs,
        |  round(CAST(sum(s) AS DOUBLE) / sum(n), 4) AS avg_token_freq
        |FROM d, g GROUP BY 1 ORDER BY lang""".stripMargin,
    // y15: score = CAST(tf AS DOUBLE) * n_docs / df in both engines (one
    // multiply, one divide over exact integers — bitwise-identical ranks)
    "y15_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, term, tf, df,
        |  CAST(tf AS DOUBLE) * n_docs / df AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        |  FROM s)
        |SELECT doc_id, term, tf, df, round(score, 4) AS tfidf, rank
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // y21: both sides aggregate exact integer counts per token, then the
    // p-shift is two single IEEE divides + one subtract in the same
    // evaluation order as the Spark expression — bit-identical DOUBLEs;
    // the top-30 cut breaks (post-round) ties on the unique token. The
    // totals mirror the Spark plan's length-arithmetic pass (tokens per
    // doc = spaces + 1 = string_split cardinality, empties included).
    "y21_corpus_drift" -> corpusDriftOracle,
    // st16: counting is associative, so the streamed drift table equals
    // the batch rebuild exactly — the oracle is y21's, verbatim
    "st16_stream_drift" -> corpusDriftOracle,
    "st17_stream_phash_admit" -> graft.streaming.MediaStreamDedup.st17OracleSql,
    "st19_stream_audio_admit" -> graft.streaming.CorpusStreamAudio.st19OracleSql,
    "y1_token_stats" ->
      """WITH d AS (SELECT lang, n_chars,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens FROM documents)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  round(avg(n_tokens), 4) AS avg_tokens, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM d GROUP BY 1 ORDER BY lang""".stripMargin,
    "y2_quality_score" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |  (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ' '))) / 4
        |    + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ' '))) / 2 AS stop_hits
        |  FROM documents),
        |q AS (SELECT doc_id, n_tokens,
        |  round(CAST(stop_hits AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
        |  round(CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens, 4) AS avg_token_len
        |  FROM d)
        |SELECT doc_id, n_tokens, stopword_ratio, avg_token_len,
        |  CASE WHEN stopword_ratio >= 0.12 THEN 'high'
        |       WHEN stopword_ratio >= 0.05 THEN 'medium' ELSE 'low' END AS quality_band
        |FROM q ORDER BY doc_id""".stripMargin,
    // y9: ntile is deterministic given the (score, doc_id) total order,
    // so the decile table is exactly reproducible
    "y9_quality_deciles" ->
      """WITH d AS (SELECT doc_id,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |  (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ' '))) / 4
        |    + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ' '))) / 2 AS stop_hits
        |  FROM documents),
        |q AS (SELECT doc_id, n_tokens,
        |  round(CAST(stop_hits AS DOUBLE) / n_tokens, 4) AS score FROM d),
        |b AS (SELECT *, ntile(10) OVER (ORDER BY score, doc_id) AS decile FROM q)
        |SELECT decile, count(*) AS n_docs,
        |  round(min(score), 4) AS min_score, round(max(score), 4) AS max_score,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM b GROUP BY 1 ORDER BY decile""".stripMargin,
    "y3_langid" ->
      """WITH d AS (SELECT lang,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |  (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ' '))) / 4
        |    + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ' '))) / 2 AS hits
        |  FROM documents),
        |s AS (SELECT lang, round(CAST(hits AS DOUBLE) / n_tokens, 4) AS en_score FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN en_score >= 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS pred_en_docs,
        |  round(avg(en_score), 4) AS avg_en_score
        |FROM s GROUP BY 1 ORDER BY lang""".stripMargin,
    "m1_media_summary" ->
      """WITH d AS (SELECT sha256(text) AS h, octet_length(encode(text)) AS blen FROM documents),
        |m AS (SELECT
        |  CASE (('0x' || substr(h, 1, 2))::INT % 3)
        |    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  blen,
        |  64 + 8 * (('0x' || substr(h, 3, 2))::INT % 32) AS width,
        |  64 + 8 * (('0x' || substr(h, 5, 2))::INT % 32) AS height,
        |  CASE WHEN (('0x' || substr(h, 1, 2))::INT % 3) = 0 THEN 0
        |       ELSE 1000 + 100 * ('0x' || substr(h, 7, 2))::INT END AS duration_ms
        |  FROM d)
        |SELECT media_type, count(*) AS n, CAST(sum(blen) AS BIGINT) AS total_bytes,
        |  round(avg(width * height), 2) AS avg_pixels,
        |  CAST(sum(CASE WHEN duration_ms > 0 THEN 1 ELSE 0 END) AS BIGINT) AS timed_media
        |FROM m GROUP BY 1 ORDER BY media_type""".stripMargin,
    // m3: aspect-preserving integer downscale re-derived from the sha256
    // geometry; // is floor division (operands positive, same as the JVM's
    // truncating /)
    "m3_resize_summary" ->
      """WITH d AS (SELECT sha256(text) AS h FROM documents),
        |m AS (SELECT
        |  CASE (('0x' || substr(h, 1, 2))::INT % 3)
        |    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  64 + 8 * (('0x' || substr(h, 3, 2))::INT % 32) AS w,
        |  64 + 8 * (('0x' || substr(h, 5, 2))::INT % 32) AS hh
        |  FROM d),
        |r AS (SELECT media_type, w, hh,
        |  CASE WHEN greatest(w, hh) <= 128 THEN w ELSE (w * 128) // greatest(w, hh) END AS nw,
        |  CASE WHEN greatest(w, hh) <= 128 THEN hh ELSE (hh * 128) // greatest(w, hh) END AS nh
        |  FROM m)
        |SELECT media_type, count(*) AS n,
        |  CAST(sum(CASE WHEN nw < w OR nh < hh THEN 1 ELSE 0 END) AS BIGINT) AS n_downscaled,
        |  CAST(sum(CAST(nw AS BIGINT) * nh * 3) AS BIGINT) AS out_bytes,
        |  CAST(sum(CAST(w AS BIGINT) * hh * 3 - CAST(nw AS BIGINT) * nh * 3) AS BIGINT)
        |    AS saved_bytes
        |FROM r GROUP BY 1 ORDER BY media_type""".stripMargin,
    "m2_frame_stats" ->
      """WITH d AS (SELECT doc_id, sha256(text) AS h FROM documents),
        |f AS (SELECT doc_id, h, unnest(generate_series(0, 2)) AS frame_idx FROM d),
        |b AS (SELECT doc_id, frame_idx,
        |  unnest([('0x' || substr(h, 2 * ((frame_idx * 8 + i) % 32) + 1, 2))::INT
        |          for i in generate_series(0, 7)]) AS byte
        |  FROM f)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(sum(CASE WHEN byte >= 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(sum(byte) AS BIGINT) AS byte_sum
        |FROM b GROUP BY 1, 2 ORDER BY doc_id, frame_idx""".stripMargin,
    // m7: REAL imageio decode over synthetic PNGs — pixels are a pure
    // integer function of doc_id (3-band × 8-strip solid-color grid on an
    // 8|width, 3|height raster), so the decoded geometry and per-band
    // features re-derive exactly: block luma = (299r+587g+114b) // 1000,
    // n_pos counts strips with luma >= 128 (x > 0 through the float
    // feature), byte_sum recovers the luma mass (rint((x+1)/2·255))
    "m7_real_decode" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
        |dims AS (SELECT doc_id,
        |  CAST(8 * (2 + doc_id % 13) AS INT) AS width,
        |  CAST(3 * (2 + doc_id % 7) AS INT) AS height FROM ids),
        |g AS (SELECT doc_id, width, height,
        |  unnest(generate_series(0, 2)) AS band FROM dims),
        |b AS (SELECT doc_id, width, height, band,
        |  unnest(generate_series(0, 7)) AS strip FROM g),
        |l AS (SELECT doc_id, width, height, band,
        |  (299 * ((7 * doc_id + 31 * band + 13 * strip) % 256)
        |   + 587 * ((11 * doc_id + 37 * band + 17 * strip) % 256)
        |   + 114 * ((13 * doc_id + 41 * band + 19 * strip) % 256)) // 1000 AS luma
        |  FROM b)
        |SELECT doc_id, width, height, CAST(band AS INT) AS frame_idx,
        |  CAST(sum(CASE WHEN luma >= 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(sum(luma) AS BIGINT) AS byte_sum
        |FROM l GROUP BY 1, 2, 3, 4 ORDER BY doc_id, frame_idx""".stripMargin,
    "m8_phash_near_dup" -> MultimodalOps.m8OracleSql,
    "m9_audio_pcm" -> MultimodalOps.m9OracleSql,
    "m10_video_frames" -> MultimodalOps.m10OracleSql,
    "y6_bpe_tokens" ->
      """WITH d AS (SELECT lang,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(ws_tokens) AS BIGINT) AS ws_total,
        |  CAST(sum(bpe_tokens) AS BIGINT) AS bpe_total,
        |  round(avg(CAST(bpe_tokens AS DOUBLE) / ws_tokens), 4) AS subwords_per_word
        |FROM d GROUP BY 1 ORDER BY lang""".stripMargin,
    "v3_label_centroids" ->
      """WITH u AS (
        |  SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |cm AS (SELECT label, pos, CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c
        |  FROM u GROUP BY 1, 2),
        |cent AS (SELECT label, list(c ORDER BY pos) AS centroid FROM cm GROUP BY 1),
        |s AS (SELECT e.label, round(list_dot_product(e.embedding::DOUBLE[], cent.centroid), 6) AS sim
        |  FROM embeddings e JOIN cent ON e.label = cent.label)
        |SELECT label, count(*) AS n_vectors,
        |  round(CAST(sum(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_sim_to_centroid
        |FROM s GROUP BY 1 ORDER BY label""".stripMargin,
    "v4_ivf_search" ->
      """WITH u AS (
        |  SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |cm AS (SELECT label, pos, CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c
        |  FROM u GROUP BY 1, 2),
        |cent AS (SELECT label, list(c ORDER BY pos) AS centroid FROM cm GROUP BY 1),
        |norm AS (SELECT label AS cl,
        |  list_transform(centroid, x -> CAST(CAST(x / sqrt(list_dot_product(centroid, centroid)) AS FLOAT) AS DOUBLE)) AS nc
        |  FROM cent),
        |a AS (SELECT e.vec_id, e.embedding, norm.cl,
        |        list_dot_product(e.embedding::DOUBLE[], norm.nc) AS d
        |      FROM embeddings e CROSS JOIN norm),
        |asg AS (SELECT vec_id, embedding, cl AS cell FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cl) AS rk FROM a)
        |  WHERE rk = 1),
        |q AS (SELECT vec_id AS query_id, embedding AS qv, cell FROM asg WHERE vec_id < 10),
        |cand AS (SELECT q.query_id, asg.vec_id AS neighbor_id, asg.cell,
        |    list_dot_product(asg.embedding::DOUBLE[], q.qv::DOUBLE[]) AS s
        |  FROM asg JOIN q ON asg.cell = q.cell AND asg.vec_id <> q.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank FROM cand)
        |SELECT query_id, neighbor_id, cell, round(s, 6) AS sim, rank FROM r WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,
    "v22_filtered_ann" -> SimilarityQueries.v22OracleSql,
    // Lloyd's iterations unrolled (3 passes, matching the Spark
    // broadcast-loop exactly): init = k lowest vec_ids, assignment =
    // argmax dot - ||c||^2/2 with (score DESC, cell) ties, centroid =
    // decimal-sum/count per element. Same decimal+IEEE building blocks as
    // v3/v4, so the hash must match. The quantizer CTE (through `af`) is
    // shared VERBATIM with v7's oracle via kmeansAssignCte.
    "v5_ivf_kmeans" -> (kmeansAssignCte + """,
        |q AS (SELECT vec_id AS query_id, embedding AS qv, cell FROM af WHERE vec_id < 10),
        |cand AS (SELECT q.query_id, a.vec_id AS neighbor_id, a.cell,
        |    list_dot_product(a.embedding::DOUBLE[], q.qv::DOUBLE[]) AS s
        |  FROM af a JOIN q ON a.cell = q.cell AND a.vec_id <> q.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank FROM cand)
        |SELECT query_id, neighbor_id, cell, round(s, 6) AS sim, rank FROM r WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin),
    // v7: the kNN self-join cell-bounded by the SAME unrolled k-means
    // quantizer (af) — rank on the raw dot, tie to neighbor_id, round only
    // the output (v6's contract, over kmeans cells instead of labels)
    "v7_knn_kmeans" -> (kmeansAssignCte + """,
        |p AS (SELECT a.vec_id, a.cell, b.vec_id AS neighbor_id,
        |  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS s
        |  FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, cell, neighbor_id, s,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, neighbor_id) AS rn FROM p)
        |SELECT vec_id, cell, neighbor_id, round(s, 6) AS sim
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin),
    // v15: the SAME Lloyd template, but c0 seeds from the √N scalar
    // subquery instead of the fixed 10 — ⌊√N⌋ agrees across engines
    // (IEEE sqrt is correctly rounded; exact on perfect squares), so the
    // auto-scaled quantizer and its occupancy rollup hash-match
    "v15_auto_nlist" -> (kmeansCteFor("",
      "SELECT GREATEST(10, CAST(FLOOR(SQRT(count(*))) AS BIGINT)) FROM embeddings") + """,
        |k AS (SELECT GREATEST(10, CAST(FLOOR(SQRT(count(*))) AS BIGINT)) AS nlist
        |  FROM embeddings)
        |SELECT cell, count(*) AS n_vecs, k.nlist AS nlist
        |FROM af, k GROUP BY cell, k.nlist ORDER BY cell""".stripMargin),
    // v8: the quantizer CTE trains on the OLD slice only (pred narrows
    // src); the new slice then gets the same rank-1 cell assignment —
    // score arithmetic identical to the Spark side's broadcast pass
    "v8_incremental_ivf" -> incrementalIvfOracle,
    // st9: stateless stream => the finalized memory-sink rows must equal
    // the batch v8 answer exactly (shared oracle)
    "st9_stream_ivf_assign" -> incrementalIvfOracle,
    "st11_stream_cms" ->
      """WITH k AS (SELECT user_id AS key, count(*) AS true_count FROM events GROUP BY 1),
        |h AS (SELECT key, true_count, r,
        |    ('0x' || substr(md5(r || ':' || key), 1, 4))::INT % 256 AS b
        |  FROM k CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r)),
        |cms AS (SELECT r, b, CAST(sum(true_count) AS BIGINT) AS cell FROM h GROUP BY 1, 2),
        |est AS (SELECT h.key, min(cms.cell) AS est_count
        |  FROM h JOIN cms ON cms.r = h.r AND cms.b = h.b GROUP BY 1),
        |top AS (SELECT key, true_count FROM k ORDER BY true_count DESC, key LIMIT 20)
        |SELECT t.key AS user_key, t.true_count, e.est_count,
        |  CAST(e.est_count - t.true_count AS BIGINT) AS overcount
        |FROM top t JOIN est e ON e.key = t.key
        |ORDER BY t.true_count DESC, t.key""".stripMargin,
    // st10: z1's quality formulas verbatim + first-8-word prefix digest
    // against the non-increment corpus; the stream is stateless so the
    // batch SQL is the exact semantics, not an approximation
    "st10_stream_admit" ->
      """WITH t AS (SELECT doc_id, source, text, string_split(text, ' ') AS toks FROM documents),
        |f AS (SELECT doc_id, source,
        |  md5(array_to_string(toks[1:8], ' ')) AS g,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |  (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ' '))) / 4
        |    + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ' '))) / 2
        |    AS stop_hits,
        |  [array_to_string(toks[i:i+2], ' ')
        |   for i in generate_series(1, greatest(len(toks) - 2, 1))] AS sh
        |  FROM t),
        |q AS (SELECT doc_id, source, g, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(CAST(stop_hits AS DOUBLE) / n_tokens, 4) AS stop_ratio,
        |  round(CAST(len(sh) - len(list_distinct(sh)) AS DOUBLE) / len(sh), 4) AS rep_ratio
        |  FROM f),
        |corp AS (SELECT DISTINCT g FROM q WHERE doc_id % 7 <> 0)
        |SELECT n.doc_id, n.source, n.n_tokens, n.stop_ratio, n.rep_ratio,
        |  CAST(CASE WHEN corp.g IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_prefix_dup,
        |  CAST(CASE WHEN n.stop_ratio >= 0.05 AND n.rep_ratio <= 0.2 AND corp.g IS NULL
        |       THEN 1 ELSE 0 END AS BIGINT) AS admitted
        |FROM q n LEFT JOIN corp ON n.g = corp.g
        |WHERE n.doc_id % 7 = 0
        |ORDER BY doc_id""".stripMargin,
    // x13: same quantizer CTE; the keep verdict compares the RAW dot to
    // τ=0.35 (identical fold both sides), rounding only the output
    "x13_semantic_dedup" -> (kmeansAssignCte + """,
        |p AS (SELECT a.vec_id, b.vec_id AS prior_id,
        |  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS s
        |  FROM af a JOIN af b ON a.cell = b.cell AND b.vec_id < a.vec_id),
        |r AS (SELECT vec_id, prior_id, s,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, prior_id) AS rk FROM p),
        |best AS (SELECT vec_id, prior_id, s FROM r WHERE rk = 1)
        |SELECT af.vec_id, af.cell,
        |  CAST(CASE WHEN best.s IS NULL OR best.s <= 0.35 THEN 1 ELSE 0 END AS BIGINT) AS keep,
        |  CASE WHEN best.s > 0.35 THEN best.prior_id END AS dup_of,
        |  CASE WHEN best.s > 0.35 THEN round(best.s, 6) END AS sim
        |FROM af LEFT JOIN best ON af.vec_id = best.vec_id
        |ORDER BY af.vec_id""".stripMargin),
    "v9_product_quantization" -> pqOracle,
    "v10_pq_adc" -> pqAdcOracle,
    "v12_ivf_adc" -> ivfAdcOracle,
    // v19 serves v12's query from the persisted index: the oracle is
    // v12's VERBATIM — any loss in persist→reopen→serve breaks the hash
    "v19_persisted_serve" -> ivfAdcOracle,
    // v24: per-version totals + slice splits of the coded table — version
    // 0 is the standing (vec_id % 7 <> 0) encode, version 1 the full
    // corpus; the oracle re-derives both row sets from embeddings
    "v24_time_travel" ->
      """WITH s AS (SELECT count(*) FILTER (WHERE vec_id % 7 <> 0) AS old_n,
        |    count(*) FILTER (WHERE vec_id % 7 = 0) AS new_n
        |  FROM embeddings)
        |SELECT CAST(0 AS BIGINT) AS version, CAST(old_n AS BIGINT) AS n_rows,
        |  CAST(old_n AS BIGINT) AS n_standing, CAST(0 AS BIGINT) AS n_increment
        |FROM s
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), CAST(old_n + new_n AS BIGINT),
        |  CAST(old_n AS BIGINT), CAST(new_n AS BIGINT)
        |FROM s
        |ORDER BY version""".stripMargin,
    // v23: v12's chain minus the deleted slice (AnnIndexStore.V23DeleteSql,
    // vec_id % 11 = 3) on BOTH sides of the candidate join — neighbors and
    // stored probes — re-ranked over the survivors: the answer an index
    // built WITHOUT those vectors gives, which is exactly what the
    // tombstone mask must reproduce.
    "v23_index_delete" -> indexDeleteOracle,
    // st21 shares v23's oracle verbatim: the final tombstone set is the
    // UNION of the streamed batches however the retraction queue is
    // carved, and the serve is a pure function of (index, tombstones)
    "st21_stream_index_delete" -> indexDeleteOracle,
    // v20's join dataflow must reproduce the inline path bit for bit
    "v20_adc_join_serve" -> ivfAdcOracle,
    "v21_index_append" -> indexAppendOracle,
    "v16_rerank" -> rerankOracle,
    "v17_recall_audit" -> recallAuditOracle,
    "v18_multiprobe" -> multiprobeOracle,
    // g2: the chunk-level ranged read must equal reading the source
    // directly (corpus is ASCII: char offsets ARE byte offsets)
    "g2_ranged_read" ->
      """SELECT doc_id,
        |  substr(text, octet_length(encode(text)) // 3 + 1, 200) AS slice_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // v11: SQ8 — per-dimension max-abs scale, signed-byte floor quantize,
    // INTEGER code dot (exact longs, so ranking carries no float risk)
    "v11_sq8_search" ->
      """WITH u AS (SELECT vec_id, unnest(embedding) AS v,
        |    generate_subscripts(embedding, 1) AS pos FROM embeddings),
        |mx AS (SELECT pos, CAST(max(abs(v)) AS DOUBLE) AS m FROM u GROUP BY 1),
        |c AS (SELECT u.vec_id, u.pos,
        |  CAST(least(127, greatest(-127, floor(CAST(u.v AS DOUBLE) * 127 / mx.m))) AS BIGINT) AS code
        |  FROM u JOIN mx USING (pos)),
        |q AS (SELECT vec_id AS query_id, pos, code FROM c WHERE vec_id < 10),
        |d AS (SELECT q.query_id, c.vec_id AS neighbor_id, CAST(sum(q.code * c.code) AS BIGINT) AS qdot
        |  FROM c JOIN q ON c.pos = q.pos AND c.vec_id <> q.query_id GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, qdot,
        |  row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id) AS rank FROM d)
        |SELECT query_id, neighbor_id, qdot, rank FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "v1_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |j AS (SELECT query_id, e.vec_id AS neighbor_id,
        |  list_dot_product(e.embedding::DOUBLE[], qv::DOUBLE[]) AS s
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |r AS (SELECT query_id, neighbor_id, s,
        |  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank FROM j)
        |SELECT query_id, neighbor_id, round(s, 6) AS sim, rank FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // v6: rank on the RAW dot (bitwise identical across engines per the
    // Tables.dot contract), round only the output
    "v6_knn_join" ->
      """WITH p AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        |  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS s
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, neighbor_id, s,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, neighbor_id) AS rn FROM p)
        |SELECT vec_id, neighbor_id, round(s, 6) AS sim FROM r WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,
    // t8: the scaled CUSUM recursion T_t = max(0, T_{t-1} + 4n·x − 5s +
    // inj·2s) in exact micro-scaled BIGINTs (slack μ/4, injected +μ/2
    // purchase shift from day 19743), as a recursive CTE
    "t8_cusum_drift" ->
      """WITH RECURSIVE d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS xl
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, count(*) AS n, CAST(sum(xl) AS BIGINT) AS s
        |  FROM d GROUP BY 1),
        |o AS (SELECT d.event_type, d.day, d.xl, tot.n, tot.s,
        |    CASE WHEN d.event_type = 'purchase' AND d.day >= 19743 THEN 2 ELSE 0 END AS inj,
        |    row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn
        |  FROM d JOIN tot USING (event_type)),
        |r(event_type, day, xl, n, s, rn, t) AS (
        |  SELECT event_type, day, xl, n, s, rn,
        |    greatest(4 * n * xl - 5 * s + inj * s, 0) AS t FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.event_type, o.day, o.xl, o.n, o.s, o.rn,
        |    greatest(r.t + 4 * o.n * o.xl - 5 * o.s + o.inj * o.s, 0) AS t
        |  FROM o JOIN r ON o.event_type = r.event_type AND o.rn = r.rn + 1)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |  CAST(xl AS DOUBLE) / 1000000.0 AS day_value,
        |  CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * 4000000.0) AS cusum,
        |  t > 4 * s AS is_drift
        |FROM r ORDER BY event_type, day""".stripMargin,
    // r6: lag change-points, then lead/row_number over the change-points
    // only — the same two-window shape as the Spark plan
    "r6_scd2_history" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |      AS prev_type
        |  FROM events),
        |c AS (SELECT user_id, event_id, us, event_type FROM e
        |  WHERE prev_type IS NULL OR prev_type <> event_type),
        |v AS (SELECT user_id, event_type AS state, us AS valid_from,
        |    lead(us) OVER w AS valid_to,
        |    row_number() OVER w AS version
        |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, state, valid_from, valid_to,
        |  CAST(version AS BIGINT) AS version, valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,
    // y18: the SAME fixed IEEE expression tree as the Spark score — the
    // (k1+1)/(1-b) factors are written unfolded so both engines fold the
    // identical double constants; ranking is on the raw double, round on
    // output only (v1's discipline)
    "y18_bm25" ->
      """WITH d AS (SELECT doc_id,
        |    length(text) - length(replace(text, ' ', '')) + 1 AS dl,
        |    (length(' ' || replace(text, ' ', '  ') || ' ') -
        |     length(replace(' ' || replace(text, ' ', '  ') || ' ', ' spark ', ''))) // 7
        |      AS tf_spark,
        |    (length(' ' || replace(text, ' ', '  ') || ' ') -
        |     length(replace(' ' || replace(text, ' ', '  ') || ' ', ' join ', ''))) // 6
        |      AS tf_join,
        |    (length(' ' || replace(text, ' ', '  ') || ' ') -
        |     length(replace(' ' || replace(text, ' ', '  ') || ' ', ' filter ', ''))) // 8
        |      AS tf_filter
        |  FROM documents),
        |s AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sdl,
        |    sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
        |    sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join,
        |    sum(CASE WHEN tf_filter > 0 THEN 1 ELSE 0 END) AS df_filter
        |  FROM d),
        |sc AS (SELECT doc_id, dl,
        |    (CAST(n AS DOUBLE) - df_spark + 0.5) / (CAST(df_spark AS DOUBLE) + 0.5)
        |      * (CAST(tf_spark AS DOUBLE) * (1.2 + 1.0))
        |      / (CAST(tf_spark AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
        |          (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / n))))
        |  + (CAST(n AS DOUBLE) - df_join + 0.5) / (CAST(df_join AS DOUBLE) + 0.5)
        |      * (CAST(tf_join AS DOUBLE) * (1.2 + 1.0))
        |      / (CAST(tf_join AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
        |          (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / n))))
        |  + (CAST(n AS DOUBLE) - df_filter + 0.5) / (CAST(df_filter AS DOUBLE) + 0.5)
        |      * (CAST(tf_filter AS DOUBLE) * (1.2 + 1.0))
        |      / (CAST(tf_filter AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
        |          (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / n))))
        |  AS raw
        |  FROM d CROSS JOIN s)
        |SELECT doc_id, dl, round(raw, 6) AS bm25
        |FROM sc ORDER BY raw DESC, doc_id LIMIT 50""".stripMargin,
    // m6: the stub's sha256 grouping re-derived in SQL — payloads with
    // equal bytes collapse to one CAS entry; rollup per decoded type.
    // Every 11th doc's payload is one of 3 canonical blobs (the injection
    // pattern), so collisions exist at every SF
    "m6_media_dedup" ->
      """WITH p AS (SELECT CASE WHEN doc_id % 11 = 0
        |      THEN 'dup payload ' || (doc_id % 3) ELSE text END AS payload
        |    FROM documents),
        |d AS (SELECT sha256(payload) AS h, octet_length(encode(payload)) AS blen
        |    FROM p),
        |g AS (SELECT h,
        |    max(CASE (('0x' || substr(h, 1, 2))::INT % 3)
        |      WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END) AS media_type,
        |    count(*) AS n, max(blen) AS blen
        |  FROM d GROUP BY h)
        |SELECT media_type, CAST(count(*) AS BIGINT) AS uniq_payloads,
        |  CAST(sum(n) AS BIGINT) AS n_payloads,
        |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
        |  CAST(sum(n - 1) AS BIGINT) AS dup_copies,
        |  CAST(sum((n - 1) * blen) AS BIGINT) AS reclaimable_bytes
        |FROM g GROUP BY 1 ORDER BY media_type""".stripMargin,
    // w10: ratios of exact counts — each one fixed IEEE division, the
    // same expression tree as the Spark plan; ranking on the exact count
    "w10_assoc_rules" ->
      """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
        |  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2
        |  ORDER BY n_orders DESC, part_a, part_b LIMIT 20),
        |c AS (SELECT l_partkey, count(*) AS cnt FROM i GROUP BY 1),
        |nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM i)
        |SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders,
        |  CAST(n_orders AS DOUBLE) / n_baskets AS support,
        |  CAST(n_orders AS DOUBLE) / ca.cnt AS conf_a_b,
        |  CAST(n_orders AS DOUBLE) / cb.cnt AS conf_b_a,
        |  (CAST(n_orders AS DOUBLE) * n_baskets) / (CAST(ca.cnt AS DOUBLE) * cb.cnt) AS lift
        |FROM p JOIN c ca ON p.part_a = ca.l_partkey
        |  JOIN c cb ON p.part_b = cb.l_partkey
        |CROSS JOIN nb
        |ORDER BY n_orders DESC, part_a, part_b""".stripMargin,
    "v14_quantizer_drift" -> quantizerDriftOracle,
    // j6: browsing-mode SCD2 runs (click/view only) consumed by purchase
    // facts via half-open containment; unmatched purchases roll up as
    // 'none'
    "j6_scd2_lookup" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |      AS prev_type
        |  FROM events WHERE event_type IN ('click', 'view')),
        |c AS (SELECT user_id, event_id, us, event_type FROM e
        |  WHERE prev_type IS NULL OR prev_type <> event_type),
        |v AS (SELECT user_id, event_type AS mode, us AS valid_from,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to
        |  FROM c),
        |p AS (SELECT user_id, epoch_us(ts) AS pus, value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT coalesce(v.mode, 'none') AS mode, count(*) AS n_purchases,
        |  CAST(sum(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM p LEFT JOIN v ON p.user_id = v.user_id AND p.pus >= v.valid_from
        |  AND (v.valid_to IS NULL OR p.pus < v.valid_to)
        |GROUP BY 1 ORDER BY mode""".stripMargin,
    // n1: two unrolled power iterations; per-edge contributions quantize
    // to decimal(38,12) before the sum so accumulation is exact and
    // order-free on both engines (|term| <= 1 keeps the rounding digit
    // inside the shortest-repr/binary agreement zone)
    "n1_pagerank" ->
      """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
        |  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  GROUP BY 1, 2),
        |o AS (SELECT src, CAST(sum(w) AS BIGINT) AS s FROM e GROUP BY 1),
        |ed AS (SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.s AS p
        |  FROM e JOIN o USING (src)),
        |nn AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n FROM e),
        |r1 AS (SELECT ed.dst AS part,
        |    0.15 / nn.n + CAST(sum(CAST((1.0 / nn.n) * ed.p * 0.85
        |      AS DECIMAL(38,12))) AS DOUBLE) AS r
        |  FROM ed CROSS JOIN nn GROUP BY ed.dst, nn.n),
        |r2 AS (SELECT ed.dst AS part,
        |    0.15 / nn.n + CAST(sum(CAST(r1.r * ed.p * 0.85
        |      AS DECIMAL(38,12))) AS DOUBLE) AS r
        |  FROM ed JOIN r1 ON ed.src = r1.part CROSS JOIN nn
        |  GROUP BY ed.dst, nn.n)
        |SELECT part, round(r, 8) AS pagerank
        |FROM r2 ORDER BY r DESC, part LIMIT 20""".stripMargin,
    // t9: open/close = lexicographic struct min/max (w8's bridge);
    // high/low plain extremes; mass sums in decimal
    "t9_weekly_ohlc" ->
      """SELECT event_type, epoch_us(ts) // 604800000000 AS week,
        |  min({'us': epoch_us(ts), 'id': event_id, 'v': value}).v AS open,
        |  max(value) AS high, min(value) AS low,
        |  max({'us': epoch_us(ts), 'id': event_id, 'v': value}).v AS close,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS mass
        |FROM events GROUP BY 1, 2 ORDER BY event_type, week""".stripMargin,
    // n2: two unrolled HITS rounds; contributions quantize to
    // decimal(38,12) pre-sum (all scores <= 1 after L1 normalization,
    // inside the rounding agreement zone), mass is an exact decimal sum,
    // one IEEE divide per node per half-step
    "n2_hits" ->
      """WITH e AS (SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |h1r AS (SELECT cust, sum(CAST(1.0 AS DECIMAL(38,12))) AS rawd
        |  FROM e GROUP BY 1),
        |h1m AS (SELECT sum(rawd) AS m FROM h1r),
        |h1 AS (SELECT cust, CAST(rawd AS DOUBLE) / CAST(m AS DOUBLE) AS score
        |  FROM h1r CROSS JOIN h1m),
        |a1r AS (SELECT part, sum(CAST(h1.score AS DECIMAL(38,12))) AS rawd
        |  FROM e JOIN h1 USING (cust) GROUP BY 1),
        |a1m AS (SELECT sum(rawd) AS m FROM a1r),
        |a1 AS (SELECT part, CAST(rawd AS DOUBLE) / CAST(m AS DOUBLE) AS score
        |  FROM a1r CROSS JOIN a1m),
        |h2r AS (SELECT cust, sum(CAST(a1.score AS DECIMAL(38,12))) AS rawd
        |  FROM e JOIN a1 USING (part) GROUP BY 1),
        |h2m AS (SELECT sum(rawd) AS m FROM h2r),
        |h2 AS (SELECT cust, CAST(rawd AS DOUBLE) / CAST(m AS DOUBLE) AS score
        |  FROM h2r CROSS JOIN h2m),
        |a2r AS (SELECT part, sum(CAST(h2.score AS DECIMAL(38,12))) AS rawd
        |  FROM e JOIN h2 USING (cust) GROUP BY 1),
        |a2m AS (SELECT sum(rawd) AS m FROM a2r),
        |a2 AS (SELECT part, CAST(rawd AS DOUBLE) / CAST(m AS DOUBLE) AS score
        |  FROM a2r CROSS JOIN a2m)
        |SELECT part, round(score, 8) AS authority
        |FROM a2 ORDER BY score DESC, part LIMIT 20""".stripMargin,
    // n3: three unrolled BFS frontiers as exact set algebra (EXCEPT
    // against the union of earlier hops)
    "n3_khop_reach" ->
      """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |f0 AS (SELECT min(src) AS part FROM e),
        |f1 AS (SELECT DISTINCT e.dst AS part FROM e JOIN f0 ON e.src = f0.part
        |  EXCEPT SELECT part FROM f0),
        |f2 AS (SELECT DISTINCT e.dst AS part FROM e JOIN f1 ON e.src = f1.part
        |  EXCEPT (SELECT part FROM f0 UNION SELECT part FROM f1)),
        |f3 AS (SELECT DISTINCT e.dst AS part FROM e JOIN f2 ON e.src = f2.part
        |  EXCEPT (SELECT part FROM f0 UNION SELECT part FROM f1 UNION SELECT part FROM f2))
        |SELECT CAST(0 AS INT) AS hop, count(*) AS n_parts FROM f0
        |UNION ALL SELECT CAST(1 AS INT), count(*) FROM f1
        |UNION ALL SELECT CAST(2 AS INT), count(*) FROM f2
        |UNION ALL SELECT CAST(3 AS INT), count(*) FROM f3
        |ORDER BY hop""".stripMargin,
    // n4: three unrolled Bellman-Ford relaxation rounds (the classical
    // full-relax form — equivalent to the shipped delta-relaxation by
    // induction); edge length 1000000 // w is exact integer floor
    // division on both engines, so the walk never touches a float
    "n4_sssp" ->
      """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
        |  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  GROUP BY 1, 2),
        |ec AS (SELECT src, dst, 1000000 // w AS cost FROM e),
        |d0 AS (SELECT min(src) AS part, CAST(0 AS BIGINT) AS dist FROM ec),
        |d1 AS (SELECT part, min(dist) AS dist FROM (
        |    SELECT part, dist FROM d0
        |    UNION ALL
        |    SELECT ec.dst, d0.dist + ec.cost FROM d0 JOIN ec ON ec.src = d0.part
        |  ) GROUP BY 1),
        |d2 AS (SELECT part, min(dist) AS dist FROM (
        |    SELECT part, dist FROM d1
        |    UNION ALL
        |    SELECT ec.dst, d1.dist + ec.cost FROM d1 JOIN ec ON ec.src = d1.part
        |  ) GROUP BY 1),
        |d3 AS (SELECT part, min(dist) AS dist FROM (
        |    SELECT part, dist FROM d2
        |    UNION ALL
        |    SELECT ec.dst, d2.dist + ec.cost FROM d2 JOIN ec ON ec.src = d2.part
        |  ) GROUP BY 1)
        |SELECT part, CAST(dist AS BIGINT) AS dist FROM d3
        |ORDER BY dist, part LIMIT 20""".stripMargin,
    // n5: the same degree-orientation in SQL — each triangle a≺b≺c
    // (≺ = (degree, id) order) counted once as a closed oriented wedge
    // n5's oracle mirrors the Spark plan's EDGE-ITERATOR form (r14): per
    // oriented edge (u,v) the closing vertices are the in-row
    // list_intersect of the two endpoints' out-neighbor arrays — never a
    // materialized wedge stream (the oriented wedge join was the oracle's
    // sf1 price: ~9 min; this form gates in ~1 min). Per triangle the
    // canonical edge credits u and v by |W| and each w once — the same
    // multiset of credits the wedge-join oracle produced row by row.
    "n5_triangles" ->
      """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
        |ed AS (SELECT e.src, e.dst FROM e
        |  JOIN deg ds ON ds.node = e.src JOIN deg dd ON dd.node = e.dst
        |  WHERE ds.d < dd.d OR (ds.d = dd.d AND e.src < e.dst)),
        |adj AS (SELECT src, list(dst ORDER BY dst) AS nb FROM ed GROUP BY 1),
        |tedge AS (SELECT ed.src AS u, ed.dst AS v,
        |    list_intersect(au.nb, COALESCE(av.nb, [])) AS ws
        |  FROM ed
        |  JOIN adj au ON au.src = ed.src
        |  LEFT JOIN adj av ON av.src = ed.dst),
        |cnt AS (SELECT part, CAST(sum(c) AS BIGINT) AS triangles FROM (
        |    SELECT u AS part, len(ws) AS c FROM tedge
        |    UNION ALL SELECT v, len(ws) FROM tedge
        |    UNION ALL SELECT unnest(ws), 1 FROM tedge
        |  ) GROUP BY 1 HAVING sum(c) > 0)
        |SELECT part, triangles FROM cnt
        |ORDER BY triangles DESC, part LIMIT 20""".stripMargin,
    // n7: local counts for the capped sample — the neighbor-pair probe
    // replaces wedge enumeration, so this oracle stays minutes-cheap at
    // 30x where n5's is hours (the sample is GraphOps.N7SampleSql/Cap)
    "n7_local_triangles" ->
      """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
        |ed AS (SELECT e.src, e.dst FROM e
        |  JOIN deg ds ON ds.node = e.src JOIN deg dd ON dd.node = e.dst
        |  WHERE ds.d < dd.d OR (ds.d = dd.d AND e.src < e.dst)),
        |sm AS (SELECT CAST(p_partkey AS BIGINT) AS p FROM part
        |  WHERE p_partkey % 13 = 7 ORDER BY p_partkey LIMIT 25),
        |np AS (SELECT sm.p, ed.dst AS nbr FROM ed JOIN sm ON ed.src = sm.p
        |  UNION ALL SELECT sm.p, ed.src AS nbr FROM ed JOIN sm ON ed.dst = sm.p),
        |tr AS (SELECT a.p AS part, count(*) AS t
        |  FROM np a JOIN ed ON ed.src = a.nbr
        |  JOIN np b ON b.p = a.p AND b.nbr = ed.dst
        |  GROUP BY 1)
        |SELECT sm.p AS part, CAST(coalesce(tr.t, 0) AS BIGINT) AS triangles
        |FROM sm LEFT JOIN tr ON tr.part = sm.p ORDER BY part""".stripMargin,
    // n6: two unrolled synchronous LPA rounds; the row_number
    // (mass desc, label asc) tie-break is the same total order as the
    // Spark side's max(struct(mass, -label)) fold — exact integers only
    "n6_label_prop" ->
      """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
        |  FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  GROUP BY 1, 2),
        |l0 AS (SELECT DISTINCT src AS part, src AS lbl FROM e),
        |s1 AS (SELECT e.src, l0.lbl, CAST(sum(e.w) AS BIGINT) AS s
        |  FROM e JOIN l0 ON l0.part = e.dst GROUP BY 1, 2),
        |l1 AS (SELECT src AS part, lbl FROM (
        |  SELECT src, lbl, row_number() OVER (PARTITION BY src ORDER BY s DESC, lbl) AS rn
        |  FROM s1) WHERE rn = 1),
        |s2 AS (SELECT e.src, l1.lbl, CAST(sum(e.w) AS BIGINT) AS s
        |  FROM e JOIN l1 ON l1.part = e.dst GROUP BY 1, 2),
        |l2 AS (SELECT src AS part, lbl FROM (
        |  SELECT src, lbl, row_number() OVER (PARTITION BY src ORDER BY s DESC, lbl) AS rn
        |  FROM s2) WHERE rn = 1)
        |SELECT lbl AS community, count(*) AS n_members FROM l2
        |GROUP BY 1 ORDER BY n_members DESC, community LIMIT 20""".stripMargin,
    // st12: r6's SCD2 derivation restricted to CLOSED rows — the stream
    // can only finalize a run whose successor is behind the watermark
    "st12_stream_scd2" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |      AS prev_type
        |  FROM events),
        |c AS (SELECT user_id, event_id, us, event_type FROM e
        |  WHERE prev_type IS NULL OR prev_type <> event_type),
        |v AS (SELECT user_id, event_type AS state, us AS valid_from,
        |    lead(us) OVER w AS valid_to,
        |    row_number() OVER w AS version
        |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, state, valid_from, valid_to,
        |  CAST(version AS BIGINT) AS version
        |FROM v WHERE valid_to IS NOT NULL
        |ORDER BY user_id, version""".stripMargin,
    // y19: y14's shape over bigrams; list_transform(generate_series)
    // builds each row's adjacent pairs, unnest of an empty list drops
    // sub-2-token docs on both engines
    "y19_bigram_typicality" ->
      """WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS sp FROM documents),
        |bgs AS (SELECT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(sp) - 1),
        |      i -> sp[i] || ' ' || sp[i + 1])) AS bg
        |  FROM tok),
        |f AS (SELECT bg, count(*) AS cf FROM bgs GROUP BY 1),
        |d AS (SELECT doc_id, lang, count(*) AS n, sum(cf) AS s
        |  FROM bgs JOIN f USING (bg) GROUP BY 1, 2),
        |g AS (SELECT sum(s) AS gs, sum(n) AS gn FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN 100*s*gn < 97*gs*n THEN 1 ELSE 0 END) AS BIGINT) AS atypical_docs,
        |  round(CAST(sum(s) AS DOUBLE) / sum(n), 4) AS avg_bigram_freq
        |FROM d, g GROUP BY 1 ORDER BY lang""".stripMargin,
  )
}
