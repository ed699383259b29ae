"""End-to-end layered pipelines — the reference's job topology as composable
DataFrame->DataFrame functions (SURVEY §3.1/§3.2 collapsed Spark-first).

Where the reference runs five separate Flink jobs wired through Kafka
(BaseLogApp -> UniqueVisitApp/UserJumpDetailApp -> VisitorStatsApp), the
Spark rendering is a function composition over one lineage per layer; in
streaming mode each layer can still be its own query over a topic/dir
boundary (the runner supports both), but nothing forces the hop.

The batch composition doubles as the golden-output oracle for the
streaming runs (Structured Streaming's batch/stream parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .operators.dwd import split_log_streams
from .operators.dwm import bounce_detect_batch, first_event_per_key_per_day
from .operators.dws import tumbling_agg
from .sources.logs import clean_logs, parse_logs


def dwd_layer(raw_lines: DataFrame) -> dict[str, DataFrame]:
    """ODS raw JSON lines -> DWD: parse, dirty-split, 3-way fan-out
    (BaseLogApp). Returns {'start','page','display'} streams plus the
    parsed clean stream under 'clean'."""
    parsed = parse_logs(raw_lines)
    clean = clean_logs(parsed)
    streams = split_log_streams(clean)
    streams["clean"] = clean
    return streams


_DIMS = ["vc", "ch", "ar", "is_new"]


def _flat_page(page: DataFrame) -> DataFrame:
    return page.select(
        F.col("common.mid").alias("mid"),
        *[F.col(f"common.{d}").alias(d) for d in _DIMS],
        (F.col("page.last_page_id").isNull() | (F.col("page.last_page_id") == "")).alias(
            "is_entry"
        ),
        F.coalesce(F.col("page.during_time"), F.lit(0)).alias("during_time"),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
    )


def dwm_unique_visit(page: DataFrame) -> DataFrame:
    """DWM UV (UniqueVisitApp): entry pages only (last_page_id empty),
    first visit per mid per day, carrying the visit's dims downstream
    (the reference forwards the whole log JSON)."""
    entries = _flat_page(page).filter(F.col("is_entry"))
    out = first_event_per_key_per_day(
        entries, "mid", "event_time", keep_cols=_DIMS
    )
    return out.withColumnRenamed("first_ts", "event_time")


def dwm_user_jump(page: DataFrame, gap_seconds: int = 10) -> DataFrame:
    """DWM bounce (UserJumpDetailApp): entry-page events whose strict next
    event is another entry page or absent within the gap."""
    ev = _flat_page(page).withColumn("seq", F.monotonically_increasing_id())
    return bounce_detect_batch(
        ev, "mid", "event_time", F.col("is_entry"), gap_seconds, tiebreak="seq"
    ).select("mid", "event_time", *_DIMS)


def dws_visitor_stats(
    page: DataFrame,
    uv: DataFrame,
    uj: DataFrame,
    window_seconds: int = 11,
) -> DataFrame:
    """DWS VisitorStats (VisitorStatsApp): 3-stream union onto the common
    stats bean, 11 s tumbling window keyed by (vc, ch, ar, is_new) —
    bean/VisitorStats.java:10-32, window per dws/VisitorStatsApp.java:121."""
    pv = page.select(
        F.col("common.vc").alias("vc"),
        F.col("common.ch").alias("ch"),
        F.col("common.ar").alias("ar"),
        F.col("common.is_new").alias("is_new"),
        F.lit(0).alias("uv_ct"),
        F.lit(1).alias("pv_ct"),
        F.when(
            F.col("page.last_page_id").isNull() | (F.col("page.last_page_id") == ""), 1
        )
        .otherwise(0)
        .alias("sv_ct"),
        F.lit(0).alias("uj_ct"),
        F.coalesce(F.col("page.during_time"), F.lit(0)).alias("dur_sum"),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
    )
    uv_s = uv.select(
        F.col("vc"),
        F.col("ch"),
        F.col("ar"),
        F.col("is_new"),
        F.lit(1).alias("uv_ct"),
        F.lit(0).alias("pv_ct"),
        F.lit(0).alias("sv_ct"),
        F.lit(0).alias("uj_ct"),
        F.lit(0).cast("long").alias("dur_sum"),
        F.col("event_time"),
    )
    uj_s = uj.select(
        F.col("vc"),
        F.col("ch"),
        F.col("ar"),
        F.col("is_new"),
        F.lit(0).alias("uv_ct"),
        F.lit(0).alias("pv_ct"),
        F.lit(0).alias("sv_ct"),
        F.lit(1).alias("uj_ct"),
        F.lit(0).cast("long").alias("dur_sum"),
        F.col("event_time"),
    )
    u = pv.unionByName(uv_s).unionByName(uj_s)
    return tumbling_agg(
        u,
        "event_time",
        window_seconds,
        dims=["vc", "ch", "ar", "is_new"],
        aggs=[
            F.sum("uv_ct").alias("uv_ct"),
            F.sum("pv_ct").alias("pv_ct"),
            F.sum("sv_ct").alias("sv_ct"),
            F.sum("uj_ct").alias("uj_ct"),
            F.sum("dur_sum").alias("dur_sum"),
        ],
    ).drop("w_start")
