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

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import shingles
from .text import _u32

# Bloom-filter prefilter sizing: 2^16 bits = 1,024 int64 words (8 KiB)
# holds ~6.5k benchmark shingles at ~1% false-positive rate with k=3;
# real deployments scale m_bits with the benchmark suite (2^27 bits =
# 16 MiB covers ~13M shingles), still broadcast-trivial next to the
# raw shingle strings it replaces (~50 bytes each -> ~650 MB).
BLOOM_BITS = 1 << 16
BLOOM_K = 3
BLOOM_SEED = "bloom"


def _bloom_pos(shingle: Column, j: int, m_bits: int, seed: str) -> Column:
    """Bit position j for a shingle: u32(md5(seed+j|shingle)) % m —
    md5-derived like every repo hash, so Spark and the DuckDB oracle
    (and a unit test) agree bit-for-bit."""
    return _u32(F.concat(F.lit(f"{seed}{j}|"), shingle)) % m_bits


def shingle_bloom_words(
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    seed: str = BLOOM_SEED,
) -> list[int]:
    """The benchmark shingle set as a dense Bloom bitmap: a Python list
    of ``m_bits / 64`` int64 words. The ONLY driver-side materialization
    in the bloom path, and it is bounded BY CONSTRUCTION at the bitmap
    size (1,024 rows here) regardless of benchmark size — the same
    bounded-collect discipline as the 8-row PQ codebook. The dense list
    embeds as an array literal so the membership probe compiles to a
    pure expression (no join, no Python)."""
    assert m_bits % 64 == 0, "m_bits must be a multiple of 64"
    sh = shingles(bench, id_col, text_col, n).select("shingle").distinct()
    pos = sh.select(
        F.explode(
            F.array(
                *[_bloom_pos(F.col("shingle"), j, m_bits, seed) for j in range(k)]
            )
        ).alias("pos")
    )
    rows = (
        pos.select(
            F.expr("pos DIV 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["word_idx"]] = r["bits"]
    return words


def _shift_one(pos: Column) -> Column:
    """(1 << (pos % 64)) with a COLUMN shift amount — pyspark's
    F.shiftleft only takes a literal count, but the underlying SQL
    builtin accepts an expression, so call it directly."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def _bloom_might_contain(
    shingle: Column, words: list[int], m_bits: int, k: int, seed: str
) -> Column:
    """True iff all k probe bits are set — a pure narrow expression over
    the embedded bitmap literal: stays inside whole-stage codegen, no
    join, no shuffle, which is the entire point of the prefilter."""
    bitmap = F.lit(words)
    out = None
    for j in range(k):
        pos = _bloom_pos(shingle, j, m_bits, seed)
        word = F.element_at(bitmap, (pos / F.lit(64)).cast("int") + 1)
        t = word.bitwiseAND(_shift_one(pos)) != 0
        out = t if out is None else (out & t)
    return out


def contaminated_ids_bloom(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    seed: str = BLOOM_SEED,
) -> DataFrame:
    """Exact-equivalent decontamination with a Bloom PREFILTER: the
    benchmark shingle set is summarized into an ``m_bits``-bit bitmap
    (8 KiB here) embedded as an array literal, so the corpus-side
    shingle table is reduced by a NARROW filter — no join, no shuffle,
    whole-stage codegen — before the exact semi-join verifies the
    survivors. Bloom filters have no false negatives by construction,
    so the result is BIT-IDENTICAL to ``contaminated_ids``; false
    positives only admit extra candidates for the verify join to
    discard.

    The 100 TB posture: broadcasting millions of raw benchmark shingle
    strings costs ~hundreds of MB per executor; the bitmap costs KBs-MBs
    and the verify join runs over the prefiltered candidates only (a
    ~99% reduction at a 1% FP rate), which is the same
    build-small/probe-big discipline as Spark's own runtime bloom-join
    pruning (`spark.sql.optimizer.runtime.bloomFilter.enabled`), made
    explicit so it composes with the dedup family."""
    words = shingle_bloom_words(bench, id_col, text_col, n, m_bits, k, seed)
    doc_sh = shingles(docs, id_col, text_col, n, dedupe=False)
    cand = doc_sh.filter(
        _bloom_might_contain(F.col("shingle"), words, m_bits, k, seed)
    )
    bench_sh = shingles(bench, id_col, text_col, n).select("shingle").distinct()
    return (
        cand.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select("id")
        .distinct()
    )


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


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document contamination accounting — not just WHO overlaps the
    benchmark but HOW MUCH: (id, n_shingles, n_contaminated,
    contamination_frac) over DISTINCT shingles per doc, docs with zero
    overlap included (frac 0.0), zero-shingle docs absent. The report
    the GPT-3 appendix actually publishes (overlap percentages), where
    contaminated_ids is only its thresholded form.

    Scale shape: identical to contaminated_ids — benchmark shingles
    broadcast into a semi-probe; here the probe is an aggregate join
    (per-doc counts) instead of a distinct. frac is one division of two
    exact integers, engine-exact."""
    doc_sh = shingles(docs, id_col, text_col, n)  # distinct per (id, shingle)
    bench_sh = shingles(bench, id_col, text_col, n).select("shingle").distinct()
    hit = F.when(
        F.col("__hit").isNotNull(), F.lit(1)
    ).otherwise(F.lit(0))
    marked = doc_sh.join(
        F.broadcast(bench_sh.withColumn("__hit", F.lit(1))), "shingle", "left"
    )
    agg = marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(hit).cast("long").alias("n_contaminated"),
    )
    return agg.select(
        "id",
        "n_shingles",
        "n_contaminated",
        (
            F.col("n_contaminated").cast("double")
            / F.col("n_shingles").cast("double")
        ).alias("contamination_frac"),
    )
