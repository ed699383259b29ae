"""DWM layer: stateful dedup, CEP bounce, interval joins, dim enrichment.

All operators are generic DataFrame->DataFrame functions; the gmall-shaped
bindings live in ``plans/`` and the streaming-exact variants in
``streaming/``. Batch formulations double as the semantic oracle for the
stateful streaming versions (SURVEY §7.3 #1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def first_event_per_key_per_day(
    df: DataFrame, key: str, ts_col: str, keep_cols: list[str] | None = None
) -> DataFrame:
    """UV dedup (SURVEY A5) — reference keeps a per-mid ValueState of the
    last-seen date and emits only the first visit of each day
    (dwm/UniqueVisitApp.java:35-71, 24 h TTL). Batch/micro-batch rendering:
    min-ts row per (key, day). Scale note: single hash-shuffle on
    (key, day); no window function, so partial aggregation is map-side.
    """
    keep = keep_cols or []
    day = F.to_date(F.col(ts_col)).alias("dt")
    aggs = [F.min(ts_col).alias("first_ts")] + [
        F.min_by(c, ts_col).alias(c) for c in keep
    ]
    return df.groupBy(F.col(key), day).agg(*aggs)


def bounce_detect_batch(
    df: DataFrame,
    key: str,
    ts_col: str,
    entry_pred: Column,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Bounce/jump detection (SURVEY W6) — the reference uses a Flink CEP
    pattern per mid: an entry-page event followed (strictly next) by another
    entry-page event within 10 s is a bounce; an entry-page event with no
    successor within 10 s times out and also counts
    (dwm/UserJumpDetailApp.java:54-104).

    Batch formulation (the semantic oracle for streaming/bounce_state):
    an entry event E of key k is a bounce iff the next event of k either
    does not exist, or is itself an entry event, or starts more than
    ``gap_seconds`` later.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(key).orderBy(*order)
    nxt_ts = F.lead(ts_col).over(w)
    nxt_entry = F.lead(entry_pred.cast("boolean")).over(w)
    gap = F.expr(f"INTERVAL {gap_seconds} SECONDS")
    flagged = df.withColumn("_is_entry", entry_pred).withColumn(
        "_bounce",
        F.col("_is_entry")
        & (
            nxt_ts.isNull()
            | F.coalesce(nxt_entry, F.lit(False))
            | (nxt_ts > F.col(ts_col) + gap)
        ),
    )
    return flagged.filter(F.col("_bounce")).drop("_is_entry", "_bounce")


def sessionize_batch(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Session assignment by inactivity gap (the generalization of W6's
    10 s window; also the batch oracle for streaming session windows).
    Classic lag+cumsum formulation: a new session starts when the gap to
    the previous event of the same key exceeds ``gap_seconds``.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.expr(f"INTERVAL {gap_seconds} SECONDS")
    new_sess = (prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap)).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: Column,
    right_ts: Column,
    lower_seconds: int,
    upper_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Event-time interval equi-join (SURVEY J1/J2) — the reference's
    `intervalJoin(...).between(-5s, +5s)` (dwm/OrderWideApp.java:84-92) and
    `[-15 min, +5 s]` payment join (dwm/PaymentWideApp.java:67-75).

    Batch rendering: equi-join + range predicate — Catalyst plans the equi
    part as a hash/sort-merge join and evaluates the band as a post-filter,
    so there is exactly ONE shuffle on the join key. In streaming mode the
    same expression (plus watermarks on both sides) becomes a
    StreamingSymmetricHashJoin with state pruned by the band. Bounds use
    exact interval arithmetic (integer micros), never float epoch casts.
    """
    lo = F.expr(f"INTERVAL {lower_seconds} SECONDS")
    hi = F.expr(f"INTERVAL {upper_seconds} SECONDS")
    band = (right_ts >= left_ts + lo) & (right_ts <= left_ts + hi)
    return left.join(right, on & band, how)


def enrich_dims(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str, str]],
    how: str = "left",
) -> DataFrame:
    """Chained broadcast dim-lookup joins (SURVEY J3/J4) — replaces the
    reference's async Phoenix+Redis lookup machinery
    (dwm/OrderWideApp.java:98-195, function/DimAsyncFunction.java:18-62)
    with explicit broadcast hash joins: each dim ships to every executor
    once per micro-batch, lookups are local hash probes, misses become
    left-join nulls (the reference prints-and-continues on miss).

    ``dims``: list of (dim_df, fact_key, dim_key). Dims must be the small
    side; for dims too large to broadcast, drop the hint and let AQE pick
    a shuffled hash join.
    """
    out = fact
    for dim, fact_key, dim_key in dims:
        out = out.join(
            F.broadcast(dim), out[fact_key] == dim[dim_key], how
        ).drop(dim[dim_key])
    return out
