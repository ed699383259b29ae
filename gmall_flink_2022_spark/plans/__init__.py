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
    # ROUND-7 WINDOW (VERDICT r6 ask #1: explicit triage, 59->50).
    # Slots: (a) 19 never-driver-checked entries — the 10 born this
    # round (llm_bpe_apply, llm_dedup_index_lifecycle,
    # llm_dup_clusters_incremental + its streaming twin +
    # llm_dup_clusters_vacuum, llm_knn_pq_adc + llm_knn_ivf_pq,
    # llm_token_cms_heavy + its streaming twin + llm_rare_token_score)
    # plus the 9 born after the r6 window froze; (b) the 4
    # four-round-stale r3-green entries; (c) 27 of the
    # 46 r4-green entries (3 rounds stale), prioritizing paths whose
    # shared code churned in r5-r7: the ENTIRE non-_scale streaming
    # suite (DimStore gained compact/delete/auto-compaction THIS round;
    # every streaming sink rides it or foreachBatch), the llm near-dup
    # family (llm/dedup.py estimator + probe-cache changes this round),
    # and the tokenizer-sharing keyword/CJK entries.
    # NINETEEN slip to r8, each with a fronted sibling on the identical
    # code path and no r5-r7 churn of its own:
    #   stream_order_enrich_scale / stream_session_window_scale /
    #   stream_two_hop_scale / stream_keyword_stats_cjk_scale
    #     (knob-only _scale twins; originals fronted),
    #   llm_knn_lsh_contract / llm_dedup_embed_lsh_contract /
    #   llm_semdedup_contract / llm_dedup_embed_planted
    #     (similarity.py untouched since the r6-green zero-vector fix;
    #     llm_dedup_embed + llm_knn_bruteforce fronted cover the
    #     cosine/bucket machinery),
    #   llm_mixture_sample / llm_shuffle_order
    #     (sampling.py untouched since r5; hash/stratified/split twins
    #     were r5-green),
    #   llm_chunk_overlap (packing.py untouched; llm_sequence_pack
    #     fronted),
    #   udf_surface_token_count (thin tokenize_col surface; the
    #     tokenizer is exercised by fronted dws_keyword_stats_cjk),
    #   dws_keyword_stats_windowed (displaced late by the r7-born
    #     stream_llm_dup_clusters_incremental; its tumbling-window
    #     keyword pipeline is covered by fronted dws_keyword_stats_cjk
    #     + the r6-green dws_keyword_stats),
    #   dwd_anti_idle_customers (displaced by the r7-born
    #     llm_knn_pq_adc; sibling dwd_semi_active_customers stays
    #     fronted over the identical frames — only the join type
    #     differs, code untouched since r4),
    #   ads_rollup_revenue / ads_pivot_linestatus (displaced by the
    #     r7-born CMS pair; thin single-operator ROLLUP/PIVOT
    #     renderings over analytics.py untouched since r4, riding the
    #     r6-green serving aggregations' frames),
    #   llm_token_stats (displaced by the r7-born
    #     llm_dup_clusters_vacuum; thin tokenize+agg surface — the
    #     tokenizer rides fronted dws_keyword_stats_cjk and token
    #     counting rides fronted llm_token_cms_heavy's exact column),
    #   llm_fingerprint (displaced by the r7-born llm_knn_ivf_pq; the
    #     r7 text.py churn was confined to gopher/classifier — the
    #     fingerprint path is untouched since r4 and its
    #     rolling/winnow siblings were r5-green),
    #   llm_quality_score (displaced by the r7-born
    #     llm_rare_token_score; same argument — untouched thin feature
    #     map, while the two text.py functions that DID change carry
    #     r6-green rows and ride the parity sweep),
    #   dws_session_window_native (displaced by the r7-born
    #     stream_llm_rare_token_score; fronted stream_session_window
    #     runs the IDENTICAL F.session_window('1800 seconds') groupBy
    #     over the same events frame — only the endpoints differ, and
    #     the batch rendering rides the parity sweep),
    #   dwd_db_route (displaced by the r7-born llm_decontaminate_bloom;
    #     the broadcast-config router is the SAME code path as the
    #     r5-green stream_db_route — operators/dwd.py:51 untouched
    #     since r5, batch twin rides the parity sweep),
    #   stream_mm_features (displaced by the r7-born llm_dsir_select;
    #     multimodal.py untouched since r5, and its runner/foreachBatch
    #     machinery is exercised by a dozen fronted stream entries —
    #     llm_dsir_weights also stays below 50: llm_dsir_select runs
    #     the identical weights->score chain end-to-end and both ride
    #     the parity sweep).
    # The 3 rows-only ANN originals stay below slot 50 as every round —
    # their driver-checkable recall contracts rotate (2 of 3 slip with
    # the similarity family above).
    # --- (a) never driver-checked: r7-born ---
    "llm_bpe_apply",
    "llm_dedup_index_lifecycle",
    "llm_dup_clusters_incremental",
    "stream_llm_dup_clusters_incremental",
    "llm_dup_clusters_vacuum",
    "llm_knn_pq_adc",
    "llm_knn_ivf_pq",
    "llm_token_cms_heavy",
    "stream_llm_token_cms",
    "llm_rare_token_score",
    "stream_llm_rare_token_score",
    "llm_decontaminate_bloom",
    "llm_dsir_select",
    # --- (a) never driver-checked: born after the r6 window froze ---
    "llm_bpe_encode",
    "llm_tfidf_keywords",
    "llm_pq_codes",
    "llm_split_leakage",
    "llm_length_buckets",
    "llm_dedup_within_doc",
    "llm_corpus_diff",
    "stream_llm_quality_classifier",
    "stream_llm_embed_dedup_incremental",
    # --- (b) four-round-stale r3-green ---
    "set_except_buyers",
    "set_intersect_all_buyers",
    "set_except_all_buyers",
    "dws_keywords_sql_lateral",
    # --- (c) r4-green rotation: streaming suite (DimStore/foreachBatch
    #     churned this round) ---
    "stream_visitor_stats",
    "stream_payment_wide",
    "stream_payment_wide_outer",
    "stream_product_stats",
    "stream_user_jump",
    "stream_unique_visit",
    "stream_uv_dropdup_ttl",
    "stream_order_enrich",
    "stream_stats_upsert_sink",
    "stream_session_window",
    "stream_two_hop_pipeline",
    "stream_keyword_stats_cjk",
    "stream_llm_dedup_exact",
    "stream_llm_decontaminate",
    # --- (c) r4-green rotation: llm family (dedup.py churned) ---
    "llm_dedup_ngram",
    "llm_dedup_simhash",
    "llm_dedup_embed",
    "llm_knn_bruteforce",
    "llm_corpus_curation",
    "llm_dup_clusters",
    "llm_sequence_pack",
    # --- (c) r4-green rotation: warehouse/batch spine ---
    "dws_union_stats",
    "dwd_semi_active_customers",
    "dws_keyword_stats_cjk",
]

# (the round-6 window list lives in git history: d6f96dc)

# r8 window candidates, in priority order: the 19 named r7 slips above
# (4 rounds stale by r8 — they go FIRST), then the r5-green cohort
# (50 entries, 3 rounds stale at r8: the approx/percentile/cube batch,
# the multimodal family, the sampling/fingerprint family, TPC-H
# batches 2-3, the r5 streaming rotations), then whatever r7 itself
# leaves unchecked.


def _prioritize() -> None:
    front = {n: REGISTRY.pop(n) for n in _DRIVER_WINDOW_FIRST if n in REGISTRY}
    rest = dict(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(rest)


_prioritize()
