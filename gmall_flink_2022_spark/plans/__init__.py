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
    # ROUND-10 WINDOW (VERDICT r9 ask #1 executed verbatim; the r9 list
    # lives in git history: a5c4a48).
    # Slots: (a) the four r10 births, then the five entries semantically
    # or materially changed in r10 (url_normalize gained the
    # query-string guard -> the whole normalize-consuming family
    # re-fronts; llm_training_shards moved its stage path to the
    # configurable scratch helper); (b) the ENTIRE 39-entry r5-green
    # cohort (5 rounds stale — the VERDICT named it in full, including
    # the six r9 slips llm_pagerank_centrality / events_zorder_key /
    # llm_curation_pipeline_full / llm_sequence_pack_bpe /
    # llm_sample_hash / llm_mixture_temperature, which lead it); (c)
    # the two remaining slots start on the r6 cohort (r11's target),
    # picking the two entries that ride THIS round's dedup.py churn
    # (the persist()->shared-cache-registry rewrite):
    # llm_dedup_minhash (minhash_lsh_pairs + _from_shingles) and
    # llm_substring_dedup_removal (substring_match_spans) — but the
    # late r10 births stream_domain_capped_topk and llm_stage1_psl_topk
    # took both head-start slots, so those two r6-green entries are the
    # named slips. Justification: they are r6-green (not r5-stale),
    # their only r10 churn is the mechanical persist->cachereg rewrite
    # (covered by dedicated release/equivalence unit tests every pytest
    # run), and both ride the per-session 243-entry parity sweep.
    # Everything r5-stale is in the window; the r6 cohort is r11's
    # standing target.
    # --- (a) r10 births ---
    "stream_funnel_conversion",
    "stream_domain_capped_topk",
    "llm_stage1_psl_topk",
    "stream_llm_training_ingest",
    "llm_domain_mix_psl",
    "llm_domain_capped_topk",
    # --- (a) r10-changed (url_normalize query guard; scratch path) ---
    "llm_url_dedup",
    "llm_url_dedup_stream",
    "llm_stage1_pipeline",
    "llm_training_shards_full",
    "llm_training_shards",
    # --- (b) the 39-entry r5-green cohort, named r9 slips first ---
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
