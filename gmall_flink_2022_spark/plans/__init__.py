from .registry import REGISTRY, QueryDef, register, queries, oracle_sql  # noqa: F401
from . import warehouse  # noqa: F401  (registers warehouse queries)
from . import analytics  # noqa: F401  (registers completeness/scale queries)
from . import scale_plans  # noqa: F401  (registers salted/windowed/UDF queries)
from . import llm_plans  # noqa: F401  (registers LLM-pipeline queries)
from . import streaming_plans  # noqa: F401  (registers streaming-mode queries)
from . import tpch_more  # noqa: F401  (registers TPC-H batch-2 queries)
from . import tpch_shapes  # noqa: F401  (registers TPC-H batch-3 shape queries)

# ---------------------------------------------------------------------------
# Driver-window priority. The round driver's correctness gate checks the
# FIRST 50 registry entries in iteration order. Standing policy since r3:
# front (a) everything born or semantically changed this round, (b)
# anything never driver-checked, (c) the stalest green cohort, oldest
# first, prioritizing entries whose SHARED code churned since their last
# green row; rows-only ANN originals stay below slot 50 (their recall
# contracts are the checkable surface); slips are named explicitly.
# ---------------------------------------------------------------------------
_DRIVER_WINDOW_FIRST = [
    # =====================================================================
    # ROUND-15 WINDOW (r14 VERDICT ask #1, standing policy: births ->
    # never-checked -> stalest cohort; the ledger test enforces the
    # rotation mechanically — since r15 with a SECOND, driver-row-only
    # bound K_driver=12 (r14 VERDICT ask #2) so sweep credit can never
    # let an entry evade the driver window indefinitely).
    #   (a') changed in r15 (no births): llm_semdedup_contract +
    #       llm_dedup_embed_lsh_contract — their exact ground-truth side
    #       (similarity.exact_cosine_pairs) replaced the positional
    #       tril_indices diagonal mask with an id-comparison mask (r14
    #       ADVICE high: collect_list order is not guaranteed across the
    #       two join sides; positions could drop/duplicate/self-pair)
    #       plus a distinct() insurance shuffle. Output-identical on
    #       aligned orders, but a semantic-risk change -> fronted. The
    #       other exact_cosine_pairs consumers are these two entries
    #       only (grep-verified). _cell_self_join gained a symmetric
    #       flag defaulting to the r14 plan (byte-identical default
    #       path); its riders were all r14-driver-green and both r15
    #       sweeps re-verify them.
    #   (b) the 14 r8-green slips named in the r14 window comment (they
    #       are the stalest driver cohort, 7 rounds by r15 — the K=6
    #       sweep-credited bound is satisfied by SWEEP_r14* but the
    #       rotation policy fronts them regardless, and K_driver makes
    #       a future such slip finite by construction);
    #   (c) 34 of the 48-entry r9-green cohort (next-stalest), registry
    #       order (oldest-first within the cohort).
    # Named slips (14 — the r9-green cohort's tail, all stream twins
    # with their batch/stream siblings in-window or recently green, and
    # all sweep-green at sf0.01 AND sf0.1 in the committed r14+r15
    # artifacts; they front r16 with the rest of the r9 cohort):
    #   stats_store_idempotent_upsert (stream_stats_upsert_sink
    #   r14-green, same idempotent stats store),
    #   stream_order_enrich_scale (stream_order_enrich r13-green, same
    #   topology; dwm_order_wide r12-green is the batch core),
    #   stream_session_window_scale (stream_session_window r13-green;
    #   dws_session_window_native in-window r15),
    #   stream_two_hop_scale (stream_two_hop_eos r12-green, same
    #   two-hop EOS topology),
    #   stream_keyword_stats_cjk_scale (dws_keyword_stats_cjk r14-green
    #   + stream_keyword_stats_cjk r13-green, same FMM segmentation),
    #   stream_db_route (dwd_db_route in-window r15, same routed
    #   split live),
    #   stream_cdc_materialize (dwd_cdc_materialize r14-green, same
    #   changelog materialization),
    #   stream_brand_price_quantiles (ads_brand_price_quantiles
    #   r14-green, same quantile sketch),
    #   stream_attribution_linear (ads_attribution_linear r14-green),
    #   stream_llm_contamination_report (llm_contamination_report
    #   r14-green, same 13-gram core),
    #   stream_events_value_outliers (events_value_outliers in-window
    #   r15),
    #   llm_url_dedup_stream (llm_url_dedup in-window r15),
    #   stream_domain_mix (llm_domain_mix in-window r15),
    #   stream_retention_cohorts (ads_retention_cohorts in-window r15).
    # --- (a') changed in r15 ---
    "llm_semdedup_contract",
    "llm_dedup_embed_lsh_contract",
    # --- (b) the 14 r8-green slips (stalest driver cohort) ---
    "dwd_db_route",
    "ads_rollup_revenue",
    "ads_pivot_linestatus",
    "dwd_anti_idle_customers",
    "dws_session_window_native",
    "ads_user_decay_score",
    "dq_check_rules_lineitem",
    "dws_keyword_stats_windowed",
    "llm_substring_dedup",
    "llm_fingerprint",
    "llm_lm_perplexity",
    "llm_pii_redact",
    "llm_dsir_select_gumbel",
    "llm_shuffle_order",
    # --- (c) 34 of the 48-entry r9-green cohort, registry order ---
    "dq_referential_orphans",
    "dq_profile_orders_approx",
    "ads_grouping_sets_revenue",
    "events_trailing_24h",
    "ads_brand_price_trend",
    "events_value_outliers",
    "ads_qty_discount_corr",
    "ads_revenue_gini",
    "dws_top_daily_paths",
    "ads_funnel_conversion",
    "ads_retention_cohorts",
    "llm_knn_lsh",
    "llm_knn_ivf",
    "llm_lang_id",
    "llm_dup_graph_triangles",
    "mm_media_features",
    "mm_frame_sample",
    "llm_lm_perplexity_sampled",
    "llm_dedup_paragraph",
    "llm_gopher_filter",
    "llm_bm25_topk",
    "llm_training_shards",
    "llm_curation_ccnet",
    "llm_dup_graph_kcore",
    "llm_lm_ppl_buckets",
    "llm_dup_cluster_audit",
    "ads_price_winsorized",
    "llm_host_extract",
    "llm_url_dedup",
    "llm_domain_mix",
    "llm_domain_balanced_sample",
    "llm_stage1_pipeline",
    "llm_domain_quality",
    "llm_training_shards_full",
]

_R14_WINDOW = [
    # =====================================================================
    # ROUND-14 WINDOW (cleared 50/50 green in CORRECTNESS_r14.json;
    # kept for the ledger). Original rationale:
    # (r13 VERDICT ask #1, standing policy: births ->
    # never-checked -> stalest cohort; the staleness ledger test
    # enforces the rotation mechanically, and as of r14 it also credits
    # committed SWEEP_r*.json artifacts at >= the driver's gate scale).
    #   (a') changed in r14 (no births this round), fronted per policy:
    #       llm_dedup_embed_lsh — the VERDICT's named front (its bucket
    #       join moved to the shared de-skew AFTER the r13 window
    #       filled) AND r14 exposed bucket_block_cap + routed it through
    #       the factored _cell_self_join helper.
    #       llm_dedup_minhash — its band-bucket join changed in r13
    #       after its last driver row (r12-green) and again in r14
    #       (helper factoring).
    #       llm_dedup_simhash64 — the 2-chunk signature payload through
    #       the new helper (the widest payload shape the factoring
    #       carries). The OTHER factoring/ADVICE riders are sibling-
    #       covered in-window and hand-verified green at sf0.01 this
    #       round (tools/check_entries, all 11 riders OK): llm_dedup_
    #       simhash rides the identical 1-chunk path as simhash64;
    #       llm_dedup_embed + llm_dedup_embed_planted +
    #       llm_dedup_embed_lsh_contract ride embedding cell joins
    #       (planted + contract ARE in-window below via the r8 cohort);
    #       llm_dedup_editdist rides simhash-blocked candidates;
    #       llm_knn_ivf_contract's floor arithmetic change is
    #       value-identical at the current query count (20 == 20) and
    #       the entry was r13-green; llm_token_cms_heavy(_scale) ride
    #       the sketch.py exact-partition-count fix (_scale is
    #       in-window below).
    #       LATE-r14 changes, all fronted or already in-window:
    #       llm_repetition — its engine side kept the O(distinct x
    #       total) interpreted modal-gram lambda the r12 ORACLE fix
    #       removed (measured 317.6 s Spark vs 0.5 s oracle at sf0.1);
    #       restructured to the same explode -> (doc, gram) count ->
    #       per-doc agg shape, 325 -> 13.8 s, hash-green at sf0.001 +
    #       sf0.01 + sf0.1 post-change. Swapped in for llm_shuffle_order
    #       (slip #14 below).
    #       llm_semdedup_contract + llm_dedup_embed_lsh_contract
    #       (both ALREADY in the (c) block below) — their exact
    #       all-pairs ground-truth side moved to
    #       similarity.exact_cosine_pairs (blocked-GEMM candidates +
    #       exact expression verify, output-identical by construction
    #       and gate-tested): 662 -> 150.6 s and 240 -> 56.7 s at
    #       sf0.1, hash-green at all three SFs post-change.
    #   (b) the 12 r7-green slips named in the r13 window (they hit the
    #       staleness wall K=6 at r14 — the ledger test makes a miss a
    #       suite failure);
    #   (c) 34 of the 48-entry r8-green cohort (the stalest after (b)),
    #       oldest-first policy, prioritizing the two entries that ride
    #       r14-changed code (llm_dedup_embed_planted,
    #       llm_token_cms_heavy_scale) and dws_uv_hll (VERDICT ask #6
    #       sf1 cell).
    # Named slips (14, all sibling-covered; they front r15 and the
    # registry-wide SWEEP_r14 artifacts re-verify them this round):
    #   dwd_db_route (stream_db_route r9-green is the same routed-split
    #   path live; dwd_cdc_materialize in-window shares sources/cdc.py),
    #   ads_rollup_revenue (ads_cube_revenue r11-green, same
    #   grouping-sets rendering family),
    #   ads_pivot_linestatus (ads_tm_reshape r12-green, same pivot),
    #   dwd_anti_idle_customers (dwd_semi_active_customers r13-green,
    #   same anti/semi-join rendering),
    #   dws_session_window_native (stream_session_window r13-green,
    #   same session_window),
    #   ads_user_decay_score (stream_user_decay_score in-window, same
    #   decay math),
    #   dq_check_rules_lineitem (dq_profile_orders in-window, same dq
    #   module),
    #   dws_keyword_stats_windowed (dws_keyword_stats r13-green +
    #   dws_keywords_sql_lateral r13-green share the tokenize+agg),
    #   llm_substring_dedup (llm_substring_dedup_removal r12-green,
    #   same positional k-gram spans core),
    #   llm_fingerprint (llm_fingerprint_rolling + _winnow r11-green),
    #   llm_lm_perplexity (stream_llm_lm_perplexity in-window, same
    #   quantized-log2 LM scoring),
    #   llm_pii_redact (stream_llm_pii_redact in-window, same regexes;
    #   llm_pii_flags r12-green),
    #   llm_dsir_select_gumbel (llm_dsir_weights in-window +
    #   llm_dsir_select r13-green share the weight path),
    #   llm_shuffle_order (displaced by the late-r14-changed
    #   llm_repetition; llm_sample_hash r11-green rides the same
    #   deterministic _u32 hash-order machinery, and the entry is
    #   sweep-green at sf0.01 AND sf0.1 this round).
    # --- (a') changed in r14 / late r13 ---
    "llm_dedup_embed_lsh",
    "llm_dedup_minhash",
    "llm_dedup_simhash64",
    "llm_repetition",
    # --- (b) the 12 r7-green slips (ledger-enforced) ---
    "dws_keyword_stats_cjk",
    "llm_corpus_curation",
    "llm_decontaminate_bloom",
    "llm_dup_clusters",
    "llm_dup_clusters_vacuum",
    "llm_pq_codes",
    "llm_rare_token_score",
    "llm_sequence_pack",
    "set_intersect_all_buyers",
    "stream_payment_wide_outer",
    "stream_stats_upsert_sink",
    "stream_uv_dropdup_ttl",
    # --- (c) 34 of the 48-entry r8-green cohort ---
    "dwd_cdc_materialize",
    "ads_attribution_linear",
    "dq_profile_orders",
    "udf_surface_token_count",
    "llm_dedup_prefix_jaccard",
    "llm_dedup_embed_planted",
    "llm_token_stats",
    "llm_quality_score",
    "llm_dsir_weights",
    "llm_knn_lsh_contract",
    "llm_dedup_embed_lsh_contract",
    "llm_chunk_overlap",
    "llm_mixture_sample",
    "llm_semdedup_contract",
    "llm_boilerplate_strip",
    "llm_token_cms_heavy_scale",
    "llm_bpe_apply",
    "llm_bpe_train_sampled",
    "dws_uv_hll",
    "dws_uv_hll_estimate",
    "dws_daily_uv_hll",
    "dws_daily_uv_hll_estimate",
    "ads_price_quantile_sketch",
    "ads_brand_price_quantiles",
    "llm_contamination_report",
    "stream_mm_features",
    "stream_llm_rare_token_score",
    "stream_llm_dsir_score",
    "stream_uv_hll",
    "stream_value_histogram",
    "stream_daily_uv_hll",
    "stream_llm_pii_redact",
    "stream_llm_lm_perplexity",
    "stream_user_decay_score",
]

_R13_WINDOW = [
    # =====================================================================
    # ROUND-13 WINDOW (cleared 50/50 green in CORRECTNESS_r13.json;
    # kept for the ledger). Original rationale:
    # (r12 VERDICT ask #1, standing policy: births ->
    # never-checked -> stalest cohort; staleness ledger now enforced
    # MECHANICALLY by tests/test_oracle_parity.py::
    # test_staleness_ledger_bounded — r12 VERDICT ask #5).
    #   (a) the one r13 birth: stream_llm_stage1_psl_norm (VERDICT ask
    #       #3 — the composed normalize+PSL stage-1 chain live, checked
    #       against llm_stage1_psl_norm's oracle verbatim);
    #   (a') changed in r13, fronted per policy:
    #       stream_funnel_conversion — the data branch now
    #       emits-and-evicts settled days (r12 ADVICE medium: hot users
    #       deferred/lost settled rows); oracle untouched, behavior
    #       test pins the emitting batch, hand-verified hash-green at
    #       sf0.01.
    #       llm_dedup_simhash / llm_dedup_simhash64 — the bucket
    #       self-join now runs on block-matrix cells (r12 VERDICT ask
    #       #2, the one `weak`): no join key carries more than
    #       cap^2 candidate pairs regardless of bucket heat;
    #       output-identical by construction, gate-tested, both
    #       hand-verified hash-green at sf0.001 + sf0.01 (+ sf0.1/sf1
    #       row-identity spot checks).
    #       llm_dedup_editdist — rides the de-skewed candidates AND its
    #       oracle was restructured into ;-separated temp-table
    #       statements (sf0.1 oracle wall 641.6 -> 137.5 s, VERDICT ask
    #       #4; prune literals now derive from _ED_MAX per ADVICE);
    #       hand-verified hash-green at sf0.001 + sf0.01 + sf0.1.
    #       llm_knn_ivf_contract — the first registry-wide sf0.1 sweep
    #       caught its per-query >=2/5 recall bar failing at 10x (a
    #       query's true top-5 straddles IVF cells on near-orthogonal
    #       data); reshaped to the standard corpus-level mean-recall@5
    #       >= 40% contract, hand-verified green at sf0.001 + sf0.01 +
    #       sf0.1. Displaces llm_dup_clusters_vacuum from the (c)
    #       block (slip #12 below).
    #   (b) the NINE perennial r6-green slips, six rounds
    #       sibling-covered, now cleared first (VERDICT ask #1 names
    #       them; the new ledger test makes a seventh slip a suite
    #       failure);
    #   (c) 35 of the 47-entry r7-green cohort (the stalest after (b);
    #       llm_dedup_simhash left it via (a')).
    # Named slips (12, all sibling-covered, clear in r14 by the ledger
    # invariant):
    #   dws_keyword_stats_cjk (stream_keyword_stats_cjk in-window rides
    #   the same FMM segmentation + agg; _scale twin r9-green),
    #   llm_pq_codes (llm_knn_pq_adc + llm_knn_ivf_pq in-window ride
    #   the same codebook/codes path),
    #   set_intersect_all_buyers (set_intersect_buyers in-window, same
    #   INTERSECT rendering; set_except_all_buyers in-window covers the
    #   ALL semantics),
    #   llm_dup_clusters (llm_dup_clusters_incremental +
    #   stream_llm_dup_clusters_incremental in-window ride the same
    #   star-CC),
    #   llm_corpus_curation (llm_curation_pipeline_full r11-green
    #   composes the same chain),
    #   llm_decontaminate_bloom (llm_decontaminate r12-green +
    #   stream_llm_decontaminate in-window share the 13-gram core),
    #   llm_rare_token_score (stream_llm_rare_token_score r8-green is
    #   the same scoring over the same sketch),
    #   llm_sequence_pack (llm_sequence_pack_bpe r11-green composes it;
    #   llm_length_buckets in-window shares packing.py),
    #   stream_uv_dropdup_ttl (stream_unique_visit in-window exercises
    #   the UV state path; stream_uv_dropdup r11-green),
    #   stream_payment_wide_outer (stream_payment_wide in-window, same
    #   interval join modulo outer-ness),
    #   stream_stats_upsert_sink (the keyed upsert store runs inside
    #   every in-window _run_update_upsert entry, e.g.
    #   stream_llm_token_cms, stream_product_stats),
    #   llm_dup_clusters_vacuum (displaced by the changed
    #   llm_knn_ivf_contract; llm_dup_clusters_incremental +
    #   stream_llm_dup_clusters_incremental in-window ride the same
    #   star-CC + index lifecycle, and the entry was voluntarily
    #   verified green at sf0.01 AND sf0.1 this round).
    # Late-r13 non-fronted change (front in r14): llm_dedup_embed_lsh's
    # bucket self-join moved to the shared block-cell de-skew after the
    # window filled; hand-verified hash-green at sf0.01 AND sf0.1
    # post-change (both exceed the driver's gate scale), and
    # llm_dedup_embed in-window rides the same _bucket_block_cells.
    # --- (a) r13 birth ---
    "stream_llm_stage1_psl_norm",
    # --- (a') changed in r13 ---
    "stream_funnel_conversion",
    "llm_dedup_simhash",
    "llm_dedup_simhash64",
    "llm_dedup_editdist",
    "llm_knn_ivf_contract",
    # --- (b) the nine perennial r6-green slips ---
    "ads_gmv_month",
    "ads_topn_per_brand",
    "dws_funnel_conversion",
    "dws_keyword_stats",
    "dws_product_stats",
    "dws_province_stats",
    "dws_visitor_stats",
    "set_intersect_buyers",
    "stream_events_sliding",
    # --- (c) 35 of the r7-green cohort ---
    "dwd_semi_active_customers",
    "dws_keywords_sql_lateral",
    "dws_union_stats",
    "llm_bpe_encode",
    "llm_corpus_diff",
    "llm_dedup_embed",
    "llm_dedup_index_lifecycle",
    "llm_dedup_ngram",
    "llm_dedup_within_doc",
    "llm_dsir_select",
    "llm_dup_clusters_incremental",
    "llm_knn_bruteforce",
    "llm_knn_ivf_pq",
    "llm_knn_pq_adc",
    "llm_length_buckets",
    "llm_split_leakage",
    "llm_tfidf_keywords",
    "llm_token_cms_heavy",
    "set_except_all_buyers",
    "set_except_buyers",
    "stream_keyword_stats_cjk",
    "stream_llm_decontaminate",
    "stream_llm_dedup_exact",
    "stream_llm_dup_clusters_incremental",
    "stream_llm_embed_dedup_incremental",
    "stream_llm_quality_classifier",
    "stream_llm_token_cms",
    "stream_order_enrich",
    "stream_payment_wide",
    "stream_product_stats",
    "stream_session_window",
    "stream_two_hop_pipeline",
    "stream_unique_visit",
    "stream_user_jump",
    "stream_visitor_stats",
]

_R12_WINDOW = [
    # =====================================================================
    # ROUND-12 WINDOW (cleared 50/50 green in CORRECTNESS_r12.json;
    # kept for the ledger). Original rationale:
    # (r11 VERDICT ask #1, standing policy: births ->
    # never-driver-checked -> stalest cohort).
    #   (a) the three r12 births: the normalized stage-1 chain (batch,
    #       PSL twin, streaming ingest twin) — VERDICT asks #2+#3;
    #   (a') changed-this-round, fronted per policy:
    #       llm_pagerank_centrality — ENGINE unchanged, but its ORACLE
    #       was rewritten in r12 (VERDICT ask #5: iterative temp-table
    #       statements replace the unrolled CTE chain so the oracle is
    #       feasible at sf0.1); hand-verified hash-green at sf0.001 +
    #       sf0.01 + sf0.1.
    #       stream_funnel_conversion — r12 changed its implementation
    #       twice (vectorized fold, then per-USER keying with a
    #       day-state map, VERDICT ask #4); oracle untouched,
    #       hand-verified hash-green at sf0.001 + sf0.01 after each.
    #       llm_dedup_simhash64 — r12 rewrote simhash_near_pairs'
    #       hamming from interpreted zip_with to codegen chunked
    #       bit_count (value-identical; the sf0.1 sweep exposed a
    #       >25-min interpreted-expression grind) and thresholded the
    #       editdist DP; this entry is the only 2-chunk (64-bit)
    #       exerciser — the 1-chunk path rides in-window via
    #       llm_dedup_editdist (slot below), and llm_dedup_simhash
    #       shares THAT exact 16-bit path. All three hand-verified
    #       hash-green at sf0.001 + sf0.01;
    #   (b) the three late r11 births that sat below the full r11
    #       window, never driver-checked (judge-verified green at
    #       sf0.01 in the r11 session): llm_normalize_dedup,
    #       llm_domain_blocklist_filter, stream_domain_blocklist;
    #   (c) 41 of the 50-entry r6-green cohort (7 rounds stale — the
    #       stalest; CORRECTNESS_r11 cleared the r5 cohort).
    # Named slips (9, all sibling-covered, as VERDICT prescribes):
    #   ads_gmv_month / ads_topn_per_brand (ads_gmv_by_date +
    #   ads_top_brand twins in-window), dws_product_stats /
    #   dws_province_stats (their _approx twins are r11-green),
    #   dws_visitor_stats (judge-verified green at sf0.01 this r11
    #   session; stream_visitor_stats_scale r11-green),
    #   dws_keyword_stats (dws_keywords_sql_lateral r7-green +
    #   stream_keyword_stats_cjk_scale r9-green ride the same code),
    #   stream_events_sliding (both twins dws_events_sliding +
    #   stream_events_sliding_scale are r11-green on the same plan),
    #   dws_funnel_conversion (the ordered min-ts chain rides in-window
    #   via stream_funnel_conversion; ads_funnel_conversion — the per-day
    #   grain this entry globalizes — is r9-green and IS the streaming
    #   twin's oracle),
    #   set_intersect_buyers (set_intersect_all_buyers +
    #   set_except_all_buyers are r7-green on the same INTERSECT/EXCEPT
    #   rendering; set_except_buyers r7-green).
    # --- (a) r12 births ---
    "llm_stage1_pipeline_norm",
    "llm_stage1_psl_norm",
    "stream_llm_training_ingest_norm",
    # --- (a') changed in r12 ---
    "llm_pagerank_centrality",
    "stream_funnel_conversion",
    "llm_dedup_simhash64",
    # --- (b) never-driver-checked late r11 births ---
    "llm_normalize_dedup",
    "llm_domain_blocklist_filter",
    "stream_domain_blocklist",
    # --- (c) the r6-green cohort, minus the 9 named slips ---
    "dws_pricing_summary",
    "dwd_log_split_page",
    "dwm_unique_visit",
    "dwm_user_jump",
    "dwm_sessionize",
    "dwm_order_wide",
    "dwm_payment_wide",
    "ads_gmv_by_date",
    "ads_top_brand",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_items",
    "tpch_q4_order_priority",
    "tpch_q13_cust_distribution",
    "events_value_delta",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q22_global_sales_opportunity",
    "ads_tm_reshape",
    "events_asof_join",
    "orders_range_band_join",
    "dim_scd2_asof",
    "scale_salted_agg",
    "scale_salted_join",
    "scalar_function_surface",
    "llm_dedup_exact",
    "llm_dedup_minhash",
    "llm_decontaminate",
    "llm_repetition",
    "llm_pii_flags",
    "llm_dedup_ngram_exact",
    "stream_two_hop_eos",
    "llm_dedup_incremental",
    "stream_llm_dedup_incremental",
    "llm_embed_dedup_incremental",
    "llm_bpe_train",
    "llm_quality_classifier",
    "dws_retention_cohorts",
    "llm_dedup_editdist",
    "llm_substring_dedup_removal",
    "stream_llm_gopher_filter",
]

_R11_WINDOW = [
    # =====================================================================
    # ROUND-11 WINDOW (cleared 50/50 green in CORRECTNESS_r11.json;
    # kept for the ledger). The round-10 driver gate NEVER RAN — no
    # CORRECTNESS_r10.json / BENCH_r10.json / VERDICT r10 were delivered
    # (verified at r11 open: the newest driver artifacts are the r9 set).
    # So the r10 window (git: 4321d3a) was never driver-checked: the six
    # r10 births have no driver row at all, and the 39-entry r5-green
    # cohort it fronted is still r5-green, now 6 rounds stale. Standing
    # policy ranks (a) this round's births/changes, then (b) anything
    # never driver-checked, then (c) the stalest green cohort — which
    # makes the correct r11 window essentially the r10 window re-issued,
    # with the r11 births at the head:
    #   (a) r11 births (added as built);
    #   (b) the six never-checked r10 births;
    #   (c) the ENTIRE 39-entry r5-green cohort (names and intra-cohort
    #       order unchanged from the r10 rotation, r9 slips first).
    # Displaced relative to the r10 list, all named: the five r10-changed
    # url-family entries (llm_url_dedup, llm_url_dedup_stream,
    # llm_stage1_pipeline, llm_training_shards_full, llm_training_shards)
    # — they are r9-green (the youngest cohort), their r10 change is
    # unit- and parity-covered every pytest run, and the r11 births
    # llm_url_dedup_corpus / llm_domain_quality_psl ride the same
    # urls.py/psl.py code in-window. The 50-entry r6-green cohort
    # (PLAN_r11's original target, pre-verified ALL GREEN at sf0.01 at
    # r10 close) moves to r12 — the r5 cohort is strictly staler and
    # must clear first.
    # --- (a) r11 births ---
    "llm_text_normalize",
    "llm_url_dedup_corpus",
    "llm_domain_quality_psl",
    "stream_domain_mix_psl",
    "llm_minhash_dup_rate",
    # --- (b) never-driver-checked r10 births ---
    "stream_funnel_conversion",
    "stream_domain_capped_topk",
    "llm_stage1_psl_topk",
    "stream_llm_training_ingest",
    "llm_domain_mix_psl",
    "llm_domain_capped_topk",
    # --- (c) the 39-entry r5-green cohort, named r9 slips first ---
    "llm_pagerank_centrality",
    "events_zorder_key",
    "llm_curation_pipeline_full",
    "llm_sequence_pack_bpe",
    "llm_sample_hash",
    "llm_mixture_temperature",
    # the 13 TPC-H batch-2/3 renderings
    "tpch_q2_min_cost_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "tpch_q12_priority_shipping",
    "tpch_q14_promo_effect",
    "tpch_q16_supplier_part_types",
    "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_supplier",
    # the 5 approx/percentile/cube analytics twins
    "dws_product_stats_approx",
    "dws_province_stats_approx",
    "ads_price_percentiles",
    "ads_cube_revenue",
    "ads_customer_quartiles",
    # knob/_scale event twins
    "dws_events_sliding",
    "stream_events_sliding_scale",
    "stream_visitor_stats_scale",
    "stream_product_stats_scale",
    "stream_uv_dropdup",
    # multimodal
    "mm_frame_dedup",
    "mm_image_resize",
    "mm_audio_frames",
    # fingerprint / familiarity family
    "llm_ngram_familiarity",
    "llm_fingerprint_rolling",
    "llm_fingerprint_winnow",
    # sampling family
    "llm_sample_stratified",
    "llm_train_val_split",
    # cluster/BPE thin surfaces
    "llm_dup_cluster_keep_best",
    "llm_bpe_pair_counts",
]


def _prioritize() -> None:
    front = {n: REGISTRY.pop(n) for n in _DRIVER_WINDOW_FIRST if n in REGISTRY}
    rest = dict(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(rest)


_prioritize()
