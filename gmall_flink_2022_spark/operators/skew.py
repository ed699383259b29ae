"""Skew-mitigation utilities for the 100 TB posture.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) which splits oversized shuffle partitions at runtime. These
helpers are the manual fallback for the cases AQE can't fix:

- ``salted_agg``: two-phase aggregation for hot grouping keys whose
  per-key state is itself large (collect_set/exact distinct): phase 1
  aggregates on (key, salt) spreading one hot key over N reducers,
  phase 2 merges the partials. Only algebraic aggregates (sum/count/
  min/max and distinct-sets via set-union) compose across phases.
- ``salted_join``: replicate the small side N× with an explicit salt,
  spread the big side's hot keys by a deterministic hash salt. Trades
  N× broadcast of the small side for an even shuffle of the big side.

Both are pure DataFrame rewrites — deterministic (no rand()), so results
are reproducible and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, buckets: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, buckets): hash of ``cols`` (default: all
    columns). Deterministic beats rand() — re-runs and retries of a failed
    task must land rows in the same bucket."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("_salt", F.pmod(F.xxhash64(*basis), F.lit(buckets)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: str | None = None,
    buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase (key,salt)->key aggregation for algebraic sums/counts.

    ``sum_cols``: {input_col: output_alias}. Result identical to a direct
    groupBy(keys).agg(sum...) — verified by tests — but the first shuffle
    spreads each hot key across ``buckets`` reducers.
    """
    salted = with_salt(df, buckets, salt_cols)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(f"_p_{a}") for c, a in sum_cols.items()],
        F.count(F.lit(1)).alias("_p_cnt"),
    )
    aggs = [F.sum(f"_p_{a}").alias(a) for a in sum_cols.values()]
    if count_alias:
        aggs.append(F.sum("_p_cnt").alias(count_alias))
    return phase1.groupBy(*keys).agg(*aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    buckets: int = 8,
    how: str = "inner",
    big_salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: small side exploded ``buckets``×, big side
    salted deterministically; the join key becomes (key, salt) so one hot
    key spreads over ``buckets`` tasks.

    Only 'inner' and 'left' are correct: with 'right'/'full', small-side
    rows that match nothing were already replicated ``buckets``× before
    the join and would surface as ``buckets`` null-padded duplicates."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            f"exploded small side would emit {buckets} duplicate rows per "
            "unmatched key under right/full outer joins"
        )
    salted_big = with_salt(big, buckets, big_salt_cols)
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = salted_big.join(
        exploded_small,
        (salted_big[big_key] == exploded_small[small_key])
        & (salted_big["_salt"] == exploded_small["_salt"]),
        how,
    )
    return out.drop("_salt")
