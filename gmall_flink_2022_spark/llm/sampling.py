"""Deterministic sampling / splitting for training-data pipelines.

Every op here is a pure function of the row's id (md5-based), never of
partitioning, task order, or a seed-stateful RNG:

- re-runs, retries and cluster re-shards produce byte-identical samples
  (rand()-based sampling breaks all three);
- samples are join-stable: the same doc lands in the same split on every
  table that carries its id, so features/labels/embeddings sampled
  independently still line up;
- the whole family is expressible in ANSI SQL, so the driver hash-checks
  sampling like any exact operator.

The hash uniformity argument: the first 8 hex chars of md5(id) are a
uniform 32-bit integer; `u32 < fraction * 2^32` is an exact Bernoulli(p)
over a fixed universe. At 100 TB all three ops are narrow maps or a
single per-group top-n window — no extra shuffle beyond the grouping
they ask for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

_U32_MAX = float(1 << 32)


def _u32(id_col: Column) -> Column:
    """Uniform 32-bit integer from an id: first 8 hex chars of md5."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on ``id_col``."""
    thresh = int(fraction * _U32_MAX)
    return df.filter(_u32(F.col(id_col)) < F.lit(thresh))


def stratified_fixed_n(
    df: DataFrame, group_col: str, id_col: str, n: int
) -> DataFrame:
    """Exactly min(n, group size) rows per group, chosen by hash order —
    the deterministic replacement for per-group reservoir sampling.
    One shuffle on the group key; ties impossible (hash + id order)."""
    w = W.partitionBy(group_col).orderBy(
        _u32(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
) -> DataFrame:
    """Adds a ``split`` column ('train'/'val'/'test') as a pure function
    of the id: u32 in [0, val*2^32) -> val, [val*2^32, (val+test)*2^32)
    -> test, rest train. Stable across tables and re-runs."""
    u = _u32(F.col(id_col))
    val_hi = int(val_fraction * _U32_MAX)
    test_hi = int((val_fraction + test_fraction) * _U32_MAX)
    return df.withColumn(
        "split",
        F.when(u < val_hi, "val")
        .when(u < test_hi, "test")
        .otherwise("train"),
    )
