"""N-gram language-model perplexity scoring — the CCNet quality signal
(Wenzek et al. 2020): train a bigram LM on a reference corpus, score
every candidate document by its bits-per-token under that LM, and let
the curation pipeline keep the low-perplexity (fluent) tail. The
KenLM-over-Wikipedia stage of CCNet / RedPajama, re-expressed as two
aggregations and two hash joins.

Engine-exact arithmetic (the same playbook as llm/dsir.py): all log2
values are PIECEWISE-LINEAR QUANTIZED to 1/256-bit resolution in pure
integer arithmetic —

    qlog2(x) = 256*e + ((x * 256) >> e) - 256,   e = length(bin(x)) - 1

for positive integer x (exact at powers of two, linear interpolation of
the mantissa between them, max error < 0.09 bits). No transcendental
ever runs in either engine, so Spark and the DuckDB oracle agree bit
for bit; the single float op is the final bits-per-token division of
two exact integers.

Model: add-one smoothing over the reference vocabulary,

    cost(w1 w2) = qlog2(c(w1) + V) - qlog2(c(w1 w2) + 1)   [q256 bits]

with c(w1) the count of w1 AS A BIGRAM CONTEXT in the reference and V
the reference vocabulary size. Unseen contexts cost qlog2(V) exactly
(uniform over the vocab) — the model is proper for OOV by construction.

100 TB posture: the LM is two count aggregations with map-side combine
(one shuffle each, keys = bigram / context token). Scoring is one hash
join per table on the same natural keys followed by a per-doc sum.
The hot keys of the bigram join are exactly the corpus's most frequent
bigrams — classic AQE-skew-split territory, and the LM side of each hot
key is a single pre-reduced row, so the skew is probe-volume only
(never a pair expansion). Nothing vocabulary-shaped touches the driver;
V travels as a broadcast one-row frame.

Reference analog: per-event config/dim lookup enriching a fact stream
(dwm/OrderWideApp.java's dim joins) — here the "dim" is the learned
count table and the enrichment is an additive cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import _toks_or_empty


def _qlog2(x: Column) -> Column:
    """1/256-bit piecewise-linear log2 of a positive integer column,
    pure integer arithmetic (see module docstring)."""
    e = (F.length(F.bin(x)) - 1).cast("long")
    return (
        256 * e
        + F.call_function("shiftright", (x * 256).cast("long"), e.cast("int"))
        - 256
    )


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) rows — one per adjacent token pair, document order
    irrelevant (the cost model is position-free).

    r16: the token array is materialized in its own projection BEFORE
    the pair-building lambda. ``element_at(toks, i)`` with ``toks`` the
    raw tokenizer EXPRESSION inlines that expression into the lambda
    body, and higher-order lambdas evaluate interpreted with no common-
    subexpression elimination — the full tokenizer regex re-ran per
    element, twice per bigram (O(len^2) regex work per document;
    measured 9.2 s -> 0.5 s at sf0.1 for this explode alone, guide §1
    empirical loop). Projecting first makes ``toks`` a bound attribute,
    evaluated once per row."""
    pre = df.select(
        F.col(id_col).alias("id"), _toks_or_empty(text_col).alias("_toks")
    )
    toks = F.col("_toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return pre.select("id", F.explode(pairs).alias("bg")).select(
        "id", "bg.w1", "bg.w2"
    )


def train_bigram_lm(ref: DataFrame, id_col: str, text_col: str) -> tuple[
    DataFrame, DataFrame, DataFrame
]:
    """Learn the count tables from the reference corpus: returns
    (bigram_counts(w1, w2, c12), context_counts(w1, c1), vocab_v) where
    vocab_v is a one-row frame (v: long) counting DISTINCT tokens in the
    reference (all positions, so every context is inside the smoothing
    universe). All three are pre-reduced aggregates — the whole model is
    O(unique bigrams), never O(corpus)."""
    bg = _bigrams(ref, id_col, text_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # c(w1) = sum over w2 of c(w1,w2) EXACTLY, so the context counts
    # re-aggregate the (much smaller) bigram table instead of scanning
    # the corpus again — Catalyst reuses c12's exchange for both readers
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    toks = ref.select(F.explode(_toks_or_empty(text_col)).alias("t"))
    v = toks.agg(F.countDistinct("t").alias("v"))
    return c12, c1, v


def lm_perplexity(
    score: DataFrame, ref: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Bits-per-token of every document in ``score`` under the bigram LM
    trained on ``ref``: (id, n_bigrams, cost_q256, bits_per_token).
    ``cost_q256`` is the exact integer total (1/256-bit units);
    ``bits_per_token`` is the single-division double both engines
    compute identically. Documents with fewer than two tokens have no
    bigrams and are absent (they carry no LM evidence either way)."""
    c12, c1, v = train_bigram_lm(ref, id_col, text_col)
    bg = _bigrams(score, id_col, text_col)
    # r17 note (r16 VERDICT #5 — implemented, measured, REJECTED at
    # bench scale): a `groupBy(id, w1, w2)` pre-aggregation so the count
    # tables join unique-per-doc bigrams (cost * n_occ summed after) was
    # measured interleaved same-session at sf0.1: 1.26 s (this shape)
    # vs 1.90 s (pre-agg), outputs byte-identical. Mechanism: at any
    # scale where c12/c1 broadcast, this shape's ONLY exchange is the
    # final groupBy(id), which partial-aggregates map-side to ~one row
    # per id per partition — near-minimal shuffle bytes — while the
    # pre-agg adds a full exchange of (id, w1, w2) rows that short
    # documents barely reduce. The pre-agg only pays once c12 outgrows a
    # broadcast AND occurrence/unique ratios are Zipf-heavy; an eager
    # ratio probe can't be used to switch because lm_perplexity must
    # stay buildable as ONE lazy plan (curate_ccnet embeds it).
    joined = (
        bg.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "id",
            (
                _qlog2(F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                - _qlog2(F.coalesce(F.col("c12"), F.lit(0)) + 1)
            ).alias("cost"),
        )
    )
    agg = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("cost").alias("cost_q256"),
    )
    return agg.select(
        "id",
        "n_bigrams",
        "cost_q256",
        (
            F.col("cost_q256").cast("double")
            / (256 * F.col("n_bigrams")).cast("double")
        ).alias("bits_per_token"),
    )
