"""Text-analysis operators for training-data pipelines.

All JVM-side expressions (whole-stage codegen; no Python UDFs):
language-ID (marker-word heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.tokenize import tokenize_col

# Tiny marker lexicons for the n-gram/stopword language-ID heuristic.
# (Real pipelines use fastText/CLD3; the heuristic keeps the operator
# deterministic and oracle-expressible.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
    "zh": ("de", "shi", "le", "wo", "zai"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")

# BPE-ish token: letter runs, digit runs, or single punctuation marks.
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_bpe_tokens, n_chars): whitespace tokens vs
    BPE-ish regex tokens vs raw length."""
    toks = tokenize_col(text_col)
    bpe = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), 0)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: token count, distinct-token ratio,
    stopword ratio, mean token length. Ratios are single double
    divisions of exact integer counts (deterministic, oracle-portable)."""
    toks = tokenize_col(text_col)
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda s, x: s + x
    )
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_tokens"),
        (n_uniq.cast("double") / n.cast("double")).alias("uniq_ratio"),
        (n_stop.cast("double") / n.cast("double")).alias("stopword_ratio"),
        (total_len.cast("double") / n.cast("double")).alias("mean_token_len"),
    ).filter(F.col("n_tokens") > 0)


def _lang_score(toks: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language ID: score each language by marker hits,
    predict the argmax (ties broken by language code order, 'und' when
    no marker hits at all)."""
    toks = tokenize_col(text_col)
    out = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    for lang in sorted(LANG_MARKERS):
        out = out.withColumn(
            f"score_{lang}", _lang_score(F.col("_toks"), lang).cast("long")
        )
    best = F.greatest(*[F.col(f"score_{l}") for l in sorted(LANG_MARKERS)])
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):  # first max wins -> code-order tiebreak
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return out.select(
        "id",
        *[F.col(f"score_{l}") for l in sorted(LANG_MARKERS)],
        pred.alias("pred_lang"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonical document fingerprint: md5 over the normalized token
    stream (lowercased, punctuation stripped, single-space joined) plus
    a locality-insensitive variant over the sorted distinct tokens
    (catches shuffled near-identical docs)."""
    toks = tokenize_col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.concat_ws(" ", toks)).alias("fp_exact"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fp_bag"),
    )
