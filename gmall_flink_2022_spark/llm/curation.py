"""Corpus curation: the composed training-data pipeline — quality filter
-> exact dedup -> near-dup removal -> clean corpus. Each stage is one of
the engine's operators; the composition is itself an operator (and, being
pure DataFrame algebra, fully SQL-expressible for the oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import exact_dedup, minhash_lsh_pairs
from .text import quality_score


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.5,
    min_uniq_ratio: float = 0.2,
    jaccard_threshold: float = 0.4,
) -> DataFrame:
    """Returns the surviving (id) set with a `drop_reason`-free contract:
    a doc survives iff it (1) passes quality gates, (2) is the minimum-id
    representative of its exact-content group, and (3) is not the
    higher id of any near-dup pair among quality survivors.

    Near-dup removal by pairwise min-keep (not full clustering) — the
    conventional MinHash-dedup policy: every surviving pair has
    Jaccard < threshold.
    """
    quality = quality_score(docs, id_col, text_col).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
        & (F.col("uniq_ratio") >= min_uniq_ratio)
    )
    qdocs = docs.join(
        quality.select(F.col("id").alias(id_col)), id_col, "left_semi"
    )
    keep_exact = exact_dedup(qdocs, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    edocs = qdocs.join(keep_exact, id_col, "left_semi")
    pairs = minhash_lsh_pairs(
        edocs, id_col, text_col, threshold=jaccard_threshold
    )
    drop_near = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return edocs.join(drop_near, id_col, "left_anti").select(
        F.col(id_col).alias("id")
    )
