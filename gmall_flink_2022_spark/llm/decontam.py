"""Benchmark decontamination (training-data hygiene).

Every LLM data pipeline must remove training documents that overlap the
evaluation benchmarks (the GPT-3 paper's 13-gram filter, The Pile's /
Gopher's variants). Rendering: shingle both corpora with the SAME
n-gram shingler the dedup family uses, then a left-semi join on the
shingle marks contaminated training docs — the inverted-index shape:
one shuffle per side, candidates linear in shared-shingle count, never
a doc x benchmark cross product. At 100 TB the benchmark side is tiny
(thousands of eval docs) so its shingle set broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles


def contaminated_ids(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Distinct ids of ``docs`` sharing at least one n-gram shingle with
    ``bench`` -> one column ``id``."""
    # dedupe=False: the semi join + id-distinct below dedup anyway, so
    # the per-(id, shingle) distinct would be a wasted full shuffle of
    # the training-corpus shingle table (the big side)
    doc_sh = shingles(docs, id_col, text_col, n, dedupe=False)
    bench_sh = shingles(bench, id_col, text_col, n).select("shingle").distinct()
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select("id")
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """``docs`` minus contaminated rows (the pipeline-facing op)."""
    bad = contaminated_ids(docs, bench, id_col, text_col, n)
    return docs.join(
        F.broadcast(bad.withColumnRenamed("id", "__bad_id")),
        docs[id_col] == F.col("__bad_id"),
        "left_anti",
    )
