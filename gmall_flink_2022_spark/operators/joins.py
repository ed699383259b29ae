"""Join operators Spark lacks as primitives, composed from DataFrame ops.

The reference's only temporal joins are the bounded interval joins
(SURVEY §2.3 J1/J2, dwm/OrderWideApp.java:84-92,
dwm/PaymentWideApp.java:67-75). Two generalizations a warehouse on Spark
needs beyond that surface:

- **as-of join** (latest right row at-or-before each left row per key):
  the unbounded "most recent state" lookup an interval join cannot
  express. Rendered as the merge-join shape: union both sides tagged,
  ONE shuffle on the key, a running `last(..., ignorenulls)` carries the
  latest right payload forward — no pair blowup, no per-row subquery.
- **range join** (value-in-interval): rendered as a bucketed equi-join —
  each interval explodes to the fixed-width buckets it overlaps, the
  probe side hashes into its bucket, then an exact residual filter.
  Catalyst would otherwise plan BroadcastNestedLoopJoin (O(n*m) at
  scale); bucketing turns it into a hash join whose cost scales with
  bucket occupancy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key (backward
    as-of, inclusive). Right rows must be unique per (on, right_ts) —
    pre-aggregate ties upstream to keep the match deterministic.

    One shuffle (by ``on``), sort within partitions, linear carry —
    the same plan shape at 100 TB, with state bounded per key.
    """
    lt = left.withColumn("__m", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__rts"),
            *[F.col(c) for c in right_payload],
        )
        .withColumn("__m", F.lit(0))
        .withColumn("__ts", F.col("__rts"))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows (__m=0) sort before left rows at equal ts -> inclusive
    w = (
        W.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__m"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("__m") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in ["__rts", *right_payload]
        ],
    )
    out = carried.filter(F.col("__m") == 1)
    if how == "inner":
        out = out.filter(F.col("__asof___rts").isNotNull())
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        F.col("__asof___rts").alias(f"asof_{right_ts}"),
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in right_payload],
    )


def range_bucket_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to interval rows with lo <= value < hi via
    fixed-width bucketing: bands explode to every bucket they overlap,
    facts hash to their single bucket, the equi-join on bucket replaces
    the nested loop, and the exact inequality runs as a residual filter.

    Choose ``bucket_width`` near the typical band width: each band then
    lands in O(1) buckets and each fact meets only bands sharing its
    bucket. Skewed value distributions fall back to AQE skew splitting
    on the bucket key.

    ``how`` is 'inner' or 'left'. A post-join residual filter would
    silently turn 'left' into 'inner' (unmatched fact rows have null
    lo/hi and fail the inequality), so the left variant runs the inner
    join and unions back the facts that matched no band, null-padded.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_bucket_join supports how='inner'|'left', got {how!r}: "
            "a residual range predicate cannot be applied post-join for "
            "right/full without dropping unmatched band rows"
        )
    b = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor((F.col(hi_col) - 1e-9) / bucket_width),
            )
        ),
    )
    f = fact.withColumn("__bucket", F.floor(F.col(value_col) / bucket_width))
    if how == "left":
        f = f.withColumn("__fid", F.monotonically_increasing_id())
    inner = (
        f.join(b, "__bucket", "inner")
        .filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        )
        .drop("__bucket")
    )
    if how == "inner":
        return inner
    unmatched = f.drop("__bucket").join(
        inner.select("__fid").distinct(), "__fid", "left_anti"
    )
    return inner.unionByName(unmatched, allowMissingColumns=True).drop("__fid")
