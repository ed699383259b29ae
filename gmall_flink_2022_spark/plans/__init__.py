from .registry import REGISTRY, QueryDef, register, queries, oracle_sql  # noqa: F401
from . import warehouse  # noqa: F401  (registers warehouse queries)
from . import analytics  # noqa: F401  (registers completeness/scale queries)
from . import scale_plans  # noqa: F401  (registers salted/windowed/UDF queries)
from . import llm_plans  # noqa: F401  (registers LLM-pipeline queries)
from . import streaming_plans  # noqa: F401  (registers streaming-mode queries)
from . import tpch_more  # noqa: F401  (registers TPC-H batch-2 queries)

# ---------------------------------------------------------------------------
# Driver-window priority. The round driver's correctness gate checks the
# FIRST 50 registry entries in iteration order. Round 1 verified the first
# 50 in registration order (CORRECTNESS_r01.json: 48 green, 2 no_oracle);
# entries 51-82 — every stream_*/mm_* query and most llm_* — got no driver
# row. Round 2 therefore fronts (a) the 32 then-unwindowed entries and
# (b) every query added or semantically changed this round, so each gets a
# hard driver correctness signal; the round-1-green remainder follows in
# its original order and simply re-verifies as window slots allow.
# ---------------------------------------------------------------------------
_DRIVER_WINDOW_FIRST = [
    # changed this round (tolerance-contract redesign)
    "dws_product_stats_approx",
    "dws_province_stats_approx",
    # new this round (registered in their modules; missing names are skipped)
    "dws_keyword_stats_cjk",
    "stream_visitor_stats_scale",
    # (llm_dedup_ngram_exact is deliberately NOT fronted: it is the
    # round-1 llm_dedup_ngram semantics verbatim, hash-green in
    # CORRECTNESS_r01 under that name, so it yields its window slot)
    "llm_dedup_ngram",  # semantics changed: df-capped candidate gen default
    "stats_store_idempotent_upsert",
    "llm_dedup_embed_planted",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q14_promo_effect",
    "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive_revenue",
    "llm_sample_hash",
    "llm_sample_stratified",
    "llm_train_val_split",
    "ads_price_percentiles",
    "stream_keyword_stats_cjk",
    # round-1 positions 51-82: no CORRECTNESS_r01 row
    "llm_dedup_simhash",
    "llm_dedup_embed",
    "llm_knn_bruteforce",
    "llm_knn_lsh",
    "llm_knn_ivf",
    "llm_dedup_embed_lsh",
    "llm_token_stats",
    "llm_quality_score",
    "llm_lang_id",
    "llm_fingerprint",
    "llm_corpus_curation",
    "llm_dup_clusters",
    "mm_media_features",
    "mm_frame_sample",
    "mm_frame_dedup",
    "llm_dedup_simhash64",
    "llm_ngram_familiarity",
    "llm_fingerprint_rolling",
    "mm_image_resize",
    "mm_audio_frames",
    "llm_fingerprint_winnow",
    "stream_visitor_stats",
    "stream_payment_wide",
    "stream_product_stats",
    "stream_user_jump",
    "stream_unique_visit",
    "stream_order_enrich",
    "stream_payment_wide_outer",
    "stream_stats_upsert_sink",
    "stream_uv_dropdup",
    "stream_session_window",
    "stream_two_hop_pipeline",
]


def _prioritize() -> None:
    front = {n: REGISTRY.pop(n) for n in _DRIVER_WINDOW_FIRST if n in REGISTRY}
    rest = dict(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(rest)


_prioritize()
