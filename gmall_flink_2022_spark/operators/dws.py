"""DWS layer: tumbling-window aggregations (SURVEY §2.4 A1-A4).

The reference's ReduceFunction+WindowFunction pairs
(dws/VisitorStatsApp.java:116-152, dws/ProductStatsApp.java:209-252) map to
one declarative ``groupBy(window(...), *dims).agg(...)`` — Spark's hash
aggregate does the partial (map-side combine) / final split automatically, so
the incremental-reduce optimization the reference hand-codes is free.

Window-bucket convention: buckets are computed as
``floor(epoch_seconds / w) * w`` — identical to Spark's epoch-aligned
``window()`` for integer-second sizes, and expressible verbatim in the DuckDB
oracle (no TIMESTAMP-origin ambiguity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def window_bucket(ts_col: str, seconds: int) -> Column:
    """Epoch-aligned tumbling-window start as a timestamp column."""
    bucket = F.floor(F.col(ts_col).cast("double") / seconds) * seconds
    return F.timestamp_seconds(bucket.cast("long"))


def window_bounds(ts_col: str, seconds: int) -> tuple[Column, Column]:
    """(stt, edt) formatted strings exactly as the reference stamps them
    (dws/VisitorStatsApp.java:140-145: yyyy-MM-dd HH:mm:ss)."""
    start = window_bucket(ts_col, seconds)
    end = F.timestamp_seconds(
        (F.floor(F.col(ts_col).cast("double") / seconds) * seconds + seconds).cast(
            "long"
        )
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return F.date_format(start, fmt), F.date_format(end, fmt)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    window_seconds: int,
    dims: list[str],
    aggs: list[Column],
    stamp_bounds: bool = True,
) -> DataFrame:
    """Keyed tumbling event-time aggregation (A1/A2 shape). One shuffle on
    (window, dims); exact distincts inside ``aggs`` are fine at test scale —
    the 100 TB variant swaps them for approx_count_distinct (see
    plans/analytics.py for both renderings)."""
    bucket = window_bucket(ts_col, window_seconds).alias("w_start")
    out = df.groupBy(bucket, *[F.col(d) for d in dims]).agg(*aggs)
    if stamp_bounds:
        fmt = "yyyy-MM-dd HH:mm:ss"
        out = (
            out.withColumn("stt", F.date_format(F.col("w_start"), fmt))
            .withColumn(
                "edt",
                F.date_format(
                    F.col("w_start") + F.expr(f"INTERVAL {window_seconds} SECONDS"),
                    fmt,
                ),
            )
        )
    return out
