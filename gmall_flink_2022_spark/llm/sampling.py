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


def mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
) -> DataFrame:
    """Dataset-mixture weighting: an independent deterministic
    Bernoulli(rate) per source/group (upsample-by-repetition is the
    consumer's job; this is the downsample step every mixture recipe
    needs). Same hash universe as hash_sample, so mixture membership is
    retry- and join-stable. Narrow map, zero shuffles."""
    u = _u32(F.col(id_col))
    chain = None
    for k in sorted(fractions):
        t = F.lit(int(fractions[k] * _U32_MAX))
        cond = F.col(group_col) == k
        chain = F.when(cond, t) if chain is None else chain.when(cond, t)
    thresh = (
        chain.otherwise(F.lit(int(default * _U32_MAX)))
        if chain is not None
        else F.lit(int(default * _U32_MAX))
    )
    return df.filter(u < thresh)


def shuffle_order(df: DataFrame, id_col: str, salt: str = "shuffle|") -> DataFrame:
    """Deterministic global shuffle rank WITHOUT a single-partition sort:
    the TeraSort ranking shape. The salted hash's high byte is the range
    bucket (hash order == (bucket, rest) order), so global rank =
    bucket offset (a 256-row side computation) + row_number within the
    bucket — the big window is hash-partitioned 256 ways and scales out.
    The salt decorrelates shuffle order from the sampling family's
    unsalted hash (otherwise "sampled" would equal "first in shuffle
    order")."""
    u = _u32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    d = df.withColumn("_u", u).withColumn("_b", F.shiftright(F.col("_u"), 24))
    counts = d.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    # the offset window runs over <=256 bucket-count rows — single
    # partition by construction, and deliberately so (tiny data)
    woff = W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select("_b", "_off")
    win = W.partitionBy("_b").orderBy(F.col("_u").asc(), F.col(id_col).asc())
    return (
        d.join(F.broadcast(offs), "_b")
        .withColumn(
            "shuffle_rank",
            (F.col("_off") + F.row_number().over(win)).cast("long"),
        )
        .drop("_u", "_b", "_off")
    )


def mixture_temperature_sqrt(
    df: DataFrame, group_col: str, id_col: str, target_fraction: float = 0.5
) -> DataFrame:
    """Temperature-weighted mixture resampling at alpha = 0.5 (the
    multilingual-LM "square-root temperature": target share of group s
    proportional to sqrt(n_s), so large sources are downweighted and
    small ones upweighted relative to natural frequency). Keeps an
    expected ``target_fraction`` of the corpus via a per-group
    deterministic Bernoulli in the same hash universe as hash_sample;
    rates above 1 clamp (upsample-by-repetition is the consumer's job,
    as in mixture_sample).

    alpha is fixed at 0.5 on purpose: sqrt is IEEE-correctly-rounded on
    both engines, so the rates — and therefore membership — are
    engine-exact and oracle-checkable. A general alpha needs pow(),
    whose libm results differ across engines in the last ulp. The
    cross-group sqrt sum folds in sorted group order (same convention
    as retrieval.bm25_topk) so it is partition-order independent.

    One tiny aggregate (group counts) + broadcast back: the corpus scan
    itself stays a narrow filter.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    tot = counts.agg(
        F.sum("_n").alias("_total"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(group_col).alias("g"),
                            F.sqrt(F.col("_n").cast("double")).alias("sq"),
                        )
                    )
                ),
                lambda s: s["sq"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_sqsum"),
    )
    rate = F.least(
        F.lit(1.0),
        (
            F.lit(target_fraction)
            * F.col("_total").cast("double")
            * F.sqrt(F.col("_n").cast("double"))
        )
        / (F.col("_sqsum") * F.col("_n").cast("double")),
    )
    rates = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            F.floor(rate * F.lit(float(1 << 32))).cast("long").alias("_thresh"),
        )
    )
    return df.join(F.broadcast(rates), group_col).filter(
        _u32(F.col(id_col)) < F.col("_thresh")
    ).drop("_thresh")


def split_leakage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    **minhash_kw,
) -> DataFrame:
    """Cross-split contamination audit: near-duplicate pairs that
    STRADDLE a train/val/test boundary — the leakage a hash split
    cannot prevent (identical or near-identical documents land in
    different splits whenever their ids hash differently). Returns
    (id_a, id_b, jaccard, split_a, split_b), split_a != split_b.

    Composition of two oracle-verified operators: MinHash+LSH near-dup
    pairs (llm.dedup.minhash_lsh_pairs) joined to the id-keyed split
    assignment (train_val_test_split). The split frames are one narrow
    expression each, so the audit costs exactly one near-dup pass plus
    two broadcast-sized joins on the (pair-bounded) result — at 100 TB
    the pair table is the small side and the split columns are computed,
    not stored."""
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(df, id_col, text_col, **minhash_kw)
    splits = train_val_test_split(
        df.select(F.col(id_col).alias("_sid")), "_sid", val_fraction, test_fraction
    )
    sa = splits.select(F.col("_sid").alias("id_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("_sid").alias("id_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "jaccard", "split_a", "split_b")
    )
