"""Data Selection via Importance Resampling (DSIR; Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") —
select raw-corpus documents that look like a small target domain, by
scoring each document under hashed n-gram bag-of-features importance
weights log(p_target[f] / p_raw[f]).

Spark-first rendering and its 100 TB posture:

- The feature space is HASHED to ``n_buckets`` cells (the paper uses
  10k), so the two "distributions" are bounded B-row aggregates with
  map-side combine — nothing vocabulary-shaped is ever shuffled, and
  the weight table broadcasts no matter how large either corpus is
  (the same bounded-state discipline as the count-min sketch).
- Scoring is a narrow gram explode + a broadcast join against the
  B-row weight table + one per-doc aggregation: a single doc-keyed
  shuffle for any corpus size.
- Selection is deterministic top-k: rank by (score desc, md5(id)) via
  TakeOrderedAndProject-friendly ordering. The paper perturbs scores
  with Gumbel noise to SAMPLE rather than truncate; a seeded md5-based
  jitter drops in here if sampling semantics are wanted — the
  deterministic variant keeps the driver's hash-based correctness gate
  meaningful.

Engine-exact determinism (repo oracle convention: no transcendentals
in outputs): the per-feature log-ratio is rendered as the INTEGER
log2 magnitude ``ilog2(x) = length(bin(x)) - 1`` over add-one-smoothed
counts — exact integer arithmetic both engines compute identically
(`bin()` exists verbatim in Spark and DuckDB), preserving DSIR's
structure (per-feature target/raw frequency ratio in log space,
doc score = sum over feature occurrences) with a quantized magnitude.
The same closed-form-integer-weights precedent as the md5-weight
quality classifier (llm/text.py:401).

Reference analog: per-key config-driven routing/weighting applied to a
corpus-scale stream (function/TableProcessFunction.java:62-80 — a
small control table steering a big stream; here the control table is
the learned weight vector).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import _toks_or_empty, _u32

DSIR_BUCKETS = 1024
DSIR_SEED = "dsir"


def _ilog2(x: Column) -> Column:
    """Integer log2 magnitude of a POSITIVE integer column:
    length(bin(x)) - 1. Exact in both Spark and DuckDB."""
    return (F.length(F.bin(x)) - 1).cast("long")


def _grams_of(toks: Column) -> Column:
    """Unigram + bigram feature grams as one array<string> (the paper's
    hashed n-gram features) over a MATERIALIZED token-array column —
    capturing a raw tokenizer expression inside the slice lambda
    re-tokenizes per gram position (the shingles()/lm._bigrams r16
    inlining trap), so callers go through :func:`_with_grams`."""
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _with_grams(df: DataFrame, text_col: str, *keep: Column) -> DataFrame:
    """(keep..., gram) rows: tokenize ONCE into a bound column, then
    explode the unigram+bigram grams (r16 — the pre-projection keeps the
    tokenizer out of the interpreted gram lambda). NULL/empty text ->
    no rows (explode of the empty array)."""
    pre = df.select(*keep, _toks_or_empty(text_col).alias("__toks"))
    return pre.select(
        *[c for c in pre.columns if c != "__toks"],
        F.explode(_grams_of(F.col("__toks"))).alias("gram"),
    )


def _bucket(gram: Column, n_buckets: int, seed: str) -> Column:
    return _u32(F.concat(F.lit(seed + "|"), gram)) % n_buckets


def feature_counts(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    seed: str = DSIR_SEED,
) -> DataFrame:
    """Hashed-feature occurrence counts: (bucket, cnt) — at most
    ``n_buckets`` rows regardless of corpus size (map-side combine
    collapses each task to B rows before the tiny shuffle)."""
    g = _with_grams(df, text_col)
    return (
        g.select(_bucket(F.col("gram"), n_buckets, seed).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    seed: str = DSIR_SEED,
) -> DataFrame:
    """Per-bucket integer importance weight
    ``w[f] = ilog2(t[f] + 1) - ilog2(r[f] + 1)`` (add-one smoothing) —
    the quantized log(p_target/p_raw) up to the per-occurrence-constant
    normalizer ilog2(T_tot) - ilog2(R_tot), which shifts every
    occurrence equally and is folded into the documented score
    semantics rather than the table. Output (bucket, t_cnt, r_cnt, w):
    every bucket 0..B-1 present (absent features carry the smoothed
    weight), so the scorer's join is against a DENSE B-row table."""
    t = feature_counts(target, text_col, n_buckets, seed)
    r = feature_counts(raw, text_col, n_buckets, seed)
    dense = raw.sparkSession.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    return (
        dense.join(t.withColumnRenamed("cnt", "t_cnt"), "bucket", "left")
        .join(r.withColumnRenamed("cnt", "r_cnt"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).cast("long").alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).cast("long").alias("r_cnt"),
        )
        .withColumn(
            "w",
            _ilog2(F.col("t_cnt") + 1) - _ilog2(F.col("r_cnt") + 1),
        )
    )


def dsir_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    seed: str = DSIR_SEED,
) -> DataFrame:
    """Per-document importance score: sum of w[bucket] over every gram
    occurrence -> (id, n_feats, score). The weight table is B rows and
    BROADCASTS; the only doc-sized shuffle is the per-id aggregation.
    Docs with no grams (NULL/empty/one-token-only text still yields its
    unigrams; truly empty -> none) score (0, 0) — fail-closed."""
    occ = _with_grams(docs, text_col, F.col(id_col).alias("id")).select(
        "id", _bucket(F.col("gram"), n_buckets, seed).alias("bucket")
    )
    scored = (
        occ.join(F.broadcast(weights.select("bucket", "w")), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("w").cast("long").alias("score"),
        )
    )
    all_ids = docs.select(F.col(id_col).alias("id")).distinct()
    return all_ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("score", F.lit(0)).cast("long").alias("score"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    seed: str = DSIR_SEED,
) -> DataFrame:
    """The full DSIR selection: learn weights target-vs-raw, score every
    raw doc, keep the top ``k`` by (score desc, md5-hash asc — the
    deterministic stand-in for the paper's Gumbel resampling). Output
    (id, n_feats, score, keep) for EVERY raw doc, so the selection
    boundary is auditable. Feature-less docs (NULL/empty text) are never
    selected — their score of 0 could otherwise outrank genuinely
    negative-evidence docs, and a doc with no evidence fails closed.
    Ranking is a global top-k (orderBy + limit = per-partition heaps +
    driver merge of k rows), never a single-partition full sort."""
    w = dsir_weights(raw, target, text_col, n_buckets, seed)
    s = dsir_score(raw, w, id_col, text_col, n_buckets, seed)
    kept = (
        s.filter(F.col("n_feats") > 0)
        .orderBy(
            F.desc("score"), F.asc(_u32(F.concat(F.lit("tie|"), F.col("id").cast("string")))), F.asc("id")
        )
        .limit(k)
        .select(F.col("id").alias("__keep_id"))
    )
    return s.join(
        F.broadcast(kept), s["id"] == F.col("__keep_id"), "left"
    ).select(
        "id",
        "n_feats",
        "score",
        F.col("__keep_id").isNotNull().alias("keep"),
    )


# ---------------------------------------------------------------------------
# Gumbel-top-k resampling (the paper's actual selection semantics).
# Engine-exact rendering: Gumbel noise needs -ln(-ln(u)), and ln() is
# not correctly-rounded identically across engines — so the noise is
# QUANTIZED to GUMBEL_LEVELS inverse-CDF values precomputed in Python
# and embedded as an integer array literal on BOTH sides (the same
# shared-literal discipline as the Bloom bitmap, llm/decontam.py): the
# doc's hash picks a level, the level indexes the table, and the
# perturbed key is pure integer arithmetic both engines compute
# bit-identically. The md5 level hash is seeded 'gum|' to decorrelate
# from the md5 tiebreak and the sampling family's unsalted hash.
# ---------------------------------------------------------------------------

GUMBEL_LEVELS = 1024
GUMBEL_SCALE = 1 << 16


def gumbel_table(
    levels: int = GUMBEL_LEVELS, scale: int = GUMBEL_SCALE
) -> list[int]:
    """The quantized standard-Gumbel inverse CDF: level l (a hash-
    uniform in [0, levels)) maps to round(G((l+0.5)/levels) * scale)
    with G(u) = -ln(-ln(u)) — mid-quantile evaluation so the table is
    symmetric-ish and every level is interior. Computed once in Python
    (math.log is the ONLY transcendental, and it never runs inside
    either engine), shipped as a literal."""
    import math

    return [
        round(-math.log(-math.log((l + 0.5) / levels)) * scale)
        for l in range(levels)
    ]


def dsir_select_gumbel(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    temperature: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    seed: str = DSIR_SEED,
    levels: int = GUMBEL_LEVELS,
) -> DataFrame:
    """DSIR selection with the paper's Gumbel-top-k resampling instead
    of deterministic truncation: keep the top ``k`` docs by
    ``log w_i / T + G_i`` (Gumbel-max: equivalent to sampling k docs
    without replacement with probability proportional to
    ``w_i^(1/T)``). The integer score is the quantized log2 importance
    weight, so ``log w = score * ln2``; the perturbed key is rendered as

        perturbed = score * round(ln2 * SCALE / T) + gumbel_int[lvl]

    — all integer arithmetic (see gumbel_table for why). Temperature
    interpolates between pure sampling-by-weight (T=1) and the
    deterministic top-k of dsir_select (T -> 0, noise negligible).

    Output (id, n_feats, score, perturbed, keep) for EVERY raw doc —
    same auditable-boundary contract as dsir_select; feature-less docs
    are never selected (no evidence fails closed). Top-k is
    TakeOrderedAndProject, never a single-partition sort; the noise
    table is ``levels`` integers, a literal in the plan."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0 (use dsir_select for T->0)")
    import math

    table = gumbel_table(levels)
    ln2_scale = round(math.log(2.0) * GUMBEL_SCALE / temperature)
    w = dsir_weights(raw, target, text_col, n_buckets, seed)
    s = dsir_score(raw, w, id_col, text_col, n_buckets, seed)
    lvl = _u32(F.concat(F.lit("gum|"), F.col("id").cast("string"))) % levels
    g = F.element_at(F.lit(table), (lvl + 1).cast("int"))
    s = s.withColumn(
        "perturbed",
        (F.col("score") * F.lit(ln2_scale) + g).cast("long"),
    )
    kept = (
        s.filter(F.col("n_feats") > 0)
        .orderBy(
            F.desc("perturbed"),
            F.asc(_u32(F.concat(F.lit("tie|"), F.col("id").cast("string")))),
            F.asc("id"),
        )
        .limit(k)
        .select(F.col("id").alias("__keep_id"))
    )
    return s.join(
        F.broadcast(kept), s["id"] == F.col("__keep_id"), "left"
    ).select(
        "id",
        "n_feats",
        "score",
        "perturbed",
        F.col("__keep_id").isNotNull().alias("keep"),
    )
