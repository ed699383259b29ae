"""Training-sequence layout operators: sequence packing and overlapped
context chunking.

Two ops every LM data pipeline runs between "curated documents" and
"training batches":

- :func:`sequence_pack` — the concatenate-then-split layout: documents
  are laid end-to-end within a shard and cut into fixed ``seq_len``
  token sequences; each document is assigned the sequence its first
  token lands in. Shard-local (one window per shard, no global sort) so
  the layout parallelizes: at 100 TB each shard's running offset is an
  independent partition of a single window shuffle, and adding shards
  scales out with no coordination. Deterministic: shard = doc_id mod
  n_shards, order by doc_id within shard — integer arithmetic only,
  exactly mirrored by the SQL oracle.

- :func:`chunk_overlap` — sliding context windows over each document's
  token sequence: chunks of ``chunk_size`` tokens advancing by
  ``chunk_size - overlap`` (the RAG / long-context preprocessing
  shape). A narrow map + explode per document — no shuffle at all; the
  chunk count per document is ceil(n/stride), bounded, and the op is
  embarrassingly parallel at any scale.

Token counts are pluggable (``counter=``): the default "ws" counter is
the whitespace/alnum tokenizer shared with llm.text
(functions.tokenize.tokenize_col); "bpe" counts the BPE-ish regex tokens
(llm.text.BPE_RE) — the same accounting llm.text.token_stats reports as
``n_bpe_tokens`` — so packing boundaries line up with the token budgets
used for mixture weighting and corpus stats. Real pipelines drop in a
true tokenizer the same way: any Column-valued counter keeps the layout
integer-exact and hash-checkable against DuckDB.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from ..functions.tokenize import tokenize_col


def _token_count(text_col: str, counter: str | Callable[[str], Column]) -> Column:
    """Resolve a token-counter spec to a long Column. "ws" = whitespace/
    alnum tokens; "bpe" = BPE-ish regex tokens (letter runs / digit runs /
    single punctuation, llm.text.BPE_RE); a callable receives the column
    name and returns any integer Column (e.g. a real-tokenizer pandas
    UDF)."""
    if callable(counter):
        return counter(text_col).cast("long")
    if counter == "ws":
        return F.size(tokenize_col(text_col)).cast("long")
    if counter == "bpe":
        from .text import BPE_RE

        return F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), 0)
        ).cast("long")
    raise ValueError(f"unknown token counter {counter!r} (want 'ws'|'bpe'|callable)")


def sequence_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 512,
    n_shards: int = 8,
    counter: str | Callable[[str], Column] = "ws",
) -> DataFrame:
    """(id, shard, seq_id, tok_offset, n_tokens): lay documents end-to-end
    per shard (ordered by id) and cut every ``seq_len`` tokens; a document
    belongs to the sequence containing its first token. Empty documents
    are dropped (they occupy no tokens). ``counter`` picks the token
    accounting (see :func:`_token_count`)."""
    n = _token_count(text_col, counter)
    w = W.partitionBy("shard").orderBy("id")
    return (
        df.select(
            F.col(id_col).alias("id"),
            (F.col(id_col) % n_shards).cast("long").alias("shard"),
            n.alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "tok_offset",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .select(
            "id",
            "shard",
            F.floor(F.col("tok_offset") / seq_len).alias("seq_id"),
            "tok_offset",
            "n_tokens",
        )
    )


def chunk_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 128,
    overlap: int = 32,
    counter: str | Callable[[str], Column] = "ws",
) -> DataFrame:
    """(id, chunk_id, tok_start, tok_end): sliding windows of
    ``chunk_size`` tokens advancing by ``chunk_size - overlap``; the last
    chunk is truncated at the document end. Every chunk start is a valid
    token index, so consecutive chunks share exactly ``overlap`` tokens
    except possibly the final one. ``counter`` picks the token accounting
    (see :func:`_token_count`)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("require 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    n = _token_count(text_col, counter)
    base = df.select(
        F.col(id_col).alias("id"), n.alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    starts = F.sequence(
        F.lit(0).cast("long"),
        F.col("n_tokens") - 1,
        F.lit(stride).cast("long"),
    )
    return base.select(
        "id",
        F.posexplode(starts).alias("chunk_id", "tok_start"),
        "n_tokens",
    ).select(
        "id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "tok_start",
        F.least(F.col("tok_start") + chunk_size, F.col("n_tokens")).alias("tok_end"),
    )


LENGTH_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def length_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    counter: str | Callable[[str], Column] = "ws",
    buckets: tuple[int, ...] = LENGTH_BUCKETS,
) -> DataFrame:
    """Inference-batching length histogram: assign each document to the
    smallest power-of-two token bucket that holds it (the standard
    pad-to-bucket batching scheme) and report per-bucket padding
    economics: (bucket_len, n_docs, sum_tokens, pad_waste, fill_ratio).
    pad_waste = n_docs * bucket_len - sum_tokens is the token budget a
    padded batch burns; fill_ratio is the complement. Drives bucket-set
    design for batched inference/scoring over the corpus.

    Bucket assignment is a CASE chain over integer counts (no float
    log2 — exact at power-of-two boundaries on every engine); documents
    longer than the top bucket land in bucket -1 ("overflow", i.e. must
    be chunked first — see chunk_overlap). One narrow map + one
    aggregation on the bucket key."""
    n = _token_count(text_col, counter)
    b = F.lit(-1)
    for cap in reversed(buckets):
        b = F.when(n <= cap, F.lit(cap)).otherwise(b)
    base = df.select(
        F.col(id_col).alias("id"), n.alias("n_tokens"), b.alias("bucket_len")
    )
    agg = base.groupBy("bucket_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    waste = F.when(
        F.col("bucket_len") > 0,
        F.col("n_docs") * F.col("bucket_len") - F.col("sum_tokens"),
    ).cast("long")
    fill = F.when(
        F.col("bucket_len") > 0,
        F.col("sum_tokens").cast("double")
        / (F.col("n_docs") * F.col("bucket_len")).cast("double"),
    )
    return agg.select(
        "bucket_len", "n_docs", "sum_tokens",
        waste.alias("pad_waste"), fill.alias("fill_ratio"),
    )
