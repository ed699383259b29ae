"""Streaming raw-to-shards ingestion (r9 VERDICT ask #3) — the live
twin of the batch ``llm_training_shards_full`` chain: each arrival
micro-batch flows

    stage-1 URL dedup (within batch, keep-first by normalized URL)
    -> incremental content dedup against the PERSISTED index
       (exact digest + banded MinHash; llm/incremental.py — the corpus
       is never re-scanned, and 'new' docs advance the index so the
       NEXT batch dedupes against them)
    -> Gopher quality gate (row-local rules, fail-closed)
    -> benchmark decontamination (shared-shingle semi-join; the bench
       side is batch-independent and broadcasts)
    -> shard assignment
    -> idempotent shard store (streaming/eos.py: batch-keyed overwrite
       + commit markers, so replays can never duplicate a shard row)

This is the shape a continuously-crawling pipeline actually runs: the
corpus-sized state lives in the dedup index (DimStore, bucket-pruned)
and the shard store; per-trigger work is arrival-sized — the arrival
batch broadcasts into every probe (plan-gated by
tests/test_incremental.py and test_chained_streaming.py), and the only
non-arrival inputs are the index parquet and the broadcast benchmark
shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenize import tokenize_col
from ..sources.dim_store import DimStore
from ..streaming.eos import IdempotentBatchStore
from .urls import url_normalize


def stage1_batch(
    batch: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """Within-batch keep-first URL dedup: survivors of the batch's own
    normalized-URL groups (min id). Cross-batch URL replicas are caught
    one stage later as exact-content hits on the persisted index —
    stage 1's job here is only to collapse the intra-batch mirror
    burst before any content work."""
    keep = (
        batch.select(
            url_normalize(F.col(url_col)).alias("__norm"),
            F.col(id_col).alias("__id"),
        )
        .groupBy("__norm")
        .agg(F.min("__id").alias(id_col))
        .select(id_col)
    )
    return batch.join(keep, id_col, "left_semi")


def training_ingest_batch(
    store: DimStore,
    batch_s1: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_contam: int = 6,
    n_shards: int = 8,
    **dedup_kw,
) -> DataFrame:
    """One micro-batch's content pass AFTER stage 1: incremental dedup
    (index advances), Gopher gate, decontamination, shard assignment.
    Returns surviving (doc_id, shard, n_tokens) — arrival-sized, ready
    for the shard store. The decisions frame is materialized inside
    ``ingest_with_dedup`` (foreachBatch discipline), so everything
    downstream reads the checkpoint, not the streaming source."""
    from .decontam import contaminated_ids
    from .incremental import ingest_with_dedup
    from .text import gopher_filter

    decisions = ingest_with_dedup(
        store, batch_s1, id_col, text_col, **dedup_kw
    )
    new_ids = decisions.filter(F.col("dup_kind") == "new").select(
        F.col("doc_id").alias(id_col)
    )
    # the semi-join sides below are all ARRIVAL-bounded (decisions,
    # gate verdicts, contaminated ids): broadcast them explicitly — the
    # checkpoint-backed frames carry no size stats, so without the hint
    # the static plan sort-merges what AQE would only fix at runtime
    kept = batch_s1.select(id_col, text_col).join(
        F.broadcast(new_ids), id_col, "left_semi"
    )
    gkeep = (
        gopher_filter(kept, id_col, text_col)
        .filter(F.col("keep"))
        .select(F.col("id").alias(id_col))
    )
    q = kept.join(F.broadcast(gkeep), id_col, "left_semi")
    bad = contaminated_ids(
        q.select(F.col(id_col).alias("id"), F.col(text_col).alias("ctext")),
        bench.select(F.col(id_col).alias("id"), F.col(text_col).alias("ctext")),
        "id",
        "ctext",
        n=n_contam,
    )
    out = q.join(
        F.broadcast(bad.withColumnRenamed("id", "__bad")),
        q[id_col] == F.col("__bad"),
        "left_anti",
    )
    return out.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        F.size(tokenize_col(text_col)).cast("long").alias("n_tokens"),
    )


def foreach_batch_training_ingest(
    store: DimStore,
    shard_store: IdempotentBatchStore,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str = "url",
    n_contam: int = 6,
    n_shards: int = 8,
    **dedup_kw,
):
    """The foreachBatch function composing the whole chain. Bench is a
    static frame (broadcast per batch — the sketch-as-dim posture);
    the shard store write is idempotent under micro-batch replay."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        s1 = stage1_batch(batch, id_col, url_col)
        out = training_ingest_batch(
            store, s1, bench, id_col, text_col,
            n_contam=n_contam, n_shards=n_shards, **dedup_kw,
        )
        shard_store.write_batch(out, batch_id)

    return fn
