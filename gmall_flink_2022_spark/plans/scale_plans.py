"""Scale-path queries: salted rewrites (same result, skew-proof shuffle),
windowed tokenization, the scalar-function surface, and the registered-UDF
path. Salted queries share the plain SQL oracle of their unsalted twin —
the rewrite must be semantically invisible."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.skew import salted_agg, salted_join
from ..sources.io import read_table
from .registry import register

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Salted two-phase aggregation — identical result to the direct groupBy
# (the oracle is the plain SQL), hot keys spread over 16 reducers.
# --------------------------------------------------------------------------
@register(
    "scale_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="§4 partitioning/skew (salting; AQE fallback)",
    tags=("scale", "skew"),
)
def scale_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "price_dec", F.col("l_extendedprice").cast(DEC)
    )
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        sum_cols={"price_dec": "revenue_dec"},
        count_alias="n",
        buckets=16,
    )
    return out.select(
        "l_returnflag", F.col("revenue_dec").cast("double").alias("revenue"), "n"
    )


# --------------------------------------------------------------------------
# Salted join — same rows as the plain equi-join.
# --------------------------------------------------------------------------
@register(
    "scale_salted_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    survey_ref="§4 skew-safe join rewrite",
    tags=("scale", "skew", "join"),
)
def scale_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    out = salted_join(li, part, "l_partkey", "p_partkey", buckets=8)
    return out.select("l_orderkey", "l_linenumber", "p_brand")


# --------------------------------------------------------------------------
# A4 + F5/F3 — windowed word count with TUMBLE bounds: documents get a
# deterministic event time (doc_id seconds past a fixed origin) so the
# KeywordStats tumble+DATE_FORMAT path is exercised end-to-end.
# --------------------------------------------------------------------------
@register(
    "dws_keyword_stats_windowed",
    oracle="""
    WITH d AS (
        SELECT TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id) AS rt, text
        FROM documents
    ),
    w AS (
        SELECT strftime(to_timestamp(CAST(floor(epoch(rt) / 600) * 600 AS BIGINT)),
                        '%Y-%m-%d %H:%M:%S') AS stt,
               strftime(to_timestamp(CAST(floor(epoch(rt) / 600) * 600 + 600 AS BIGINT)),
                        '%Y-%m-%d %H:%M:%S') AS edt,
               UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  t -> t <> '')) AS word
        FROM d
    )
    SELECT stt, edt, word, COUNT(*) AS ct
    FROM w GROUP BY stt, edt, word
    """,
    survey_ref="§2.4 A4 (TUMBLE word count), §2.7 F3/F5 (window bounds)",
    tags=("dws", "window", "udtf"),
)
def dws_keyword_stats_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn(
        "rt",
        F.lit("2024-01-01 00:00:00").cast("timestamp")
        + F.make_interval(secs=F.col("doc_id").cast("double")),
    )
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != "")
    fmt = "yyyy-MM-dd HH:mm:ss"
    win = F.window("rt", "600 seconds")
    return (
        docs.select(win.alias("w"), F.explode(toks).alias("word"))
        .groupBy("w", "word")
        .agg(F.count(F.lit(1)).alias("ct"))
        .select(
            F.date_format("w.start", fmt).alias("stt"),
            F.date_format("w.end", fmt).alias("edt"),
            "word",
            "ct",
        )
    )


# --------------------------------------------------------------------------
# F1-F10 scalar-function surface in one query over orders.
# --------------------------------------------------------------------------
@register(
    "scalar_function_surface",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS dt_str,
           CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS yyyymmdd,
           CAST(epoch(o_orderdate) AS BIGINT) * 1000 AS ts_millis,
           CAST(floor(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) / 365.25) AS INTEGER) AS years_since_epoch,
           upper(substr(o_orderpriority, 1, 1)) AS prio_initial,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_merged
    FROM orders WHERE o_orderkey % 100 = 0
    """,
    survey_ref="§2.7 F1-F10 (scalar surface: formats, epoch, age, merge)",
    tags=("functions",),
)
def scalar_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("dt_str"),
        F.date_format("o_orderdate", "yyyyMMdd").cast("int").alias("yyyymmdd"),
        (F.unix_timestamp("o_orderdate") * 1000).alias("ts_millis"),
        F.floor(
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
            / F.lit(365.25)
        )
        .cast("int")
        .alias("years_since_epoch"),
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_initial"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_merged"
        ),
    )


# --------------------------------------------------------------------------
# Registered-UDF surface (U1 family): a pandas UDF registered for SQL use —
# the slow-path escape hatch, Arrow-batched, used from SQL text. The
# computation (whitespace token count) is deterministic and SQL-mirrored.
# --------------------------------------------------------------------------
@register(
    "udf_surface_token_count",
    oracle="""
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           t -> t <> '')) AS n_tokens
    FROM documents
    """,
    survey_ref="§2.7 UDF surface (pandas UDF registered for SQL)",
    tags=("functions", "udf"),
)
def udf_surface_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def pd_token_count(s: pd.Series) -> pd.Series:
        pat = re.compile(r"[^a-z0-9]+")
        return s.map(lambda x: sum(1 for t in pat.split((x or "").lower()) if t))

    spark.udf.register("pd_token_count", pd_token_count)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT doc_id, pd_token_count(text) AS n_tokens FROM documents"
    )


# --------------------------------------------------------------------------
# Z-order layout — multi-dimensional clustering for parquet skipping.
# The Morton key is integer-exact, so it oracle-checks; the layout
# (range shuffle + in-partition sort) is covered by the skipping test
# (tests/test_plan_quality.py::test_zorder_layout_improves_skipping).
# --------------------------------------------------------------------------
@register(
    "events_zorder_key",
    oracle="""
    WITH b AS (SELECT MIN(user_id) AS lo_u, MAX(user_id) AS hi_u,
                      MIN(value) AS lo_v, MAX(value) AS hi_v FROM events),
    s AS (
        SELECT e.event_id,
               COALESCE(LEAST(CAST(floor(
                   (CASE WHEN CAST(b.hi_u AS DOUBLE) > CAST(b.lo_u AS DOUBLE)
                         THEN (CAST(e.user_id AS DOUBLE) - CAST(b.lo_u AS DOUBLE))
                              / (CAST(b.hi_u AS DOUBLE) - CAST(b.lo_u AS DOUBLE))
                         ELSE 0.0 END) * 65536.0) AS BIGINT), 65535), 0) AS bu,
               COALESCE(LEAST(CAST(floor(
                   (CASE WHEN CAST(b.hi_v AS DOUBLE) > CAST(b.lo_v AS DOUBLE)
                         THEN (CAST(e.value AS DOUBLE) - CAST(b.lo_v AS DOUBLE))
                              / (CAST(b.hi_v AS DOUBLE) - CAST(b.lo_v AS DOUBLE))
                         ELSE 0.0 END) * 65536.0) AS BIGINT), 65535), 0) AS bv
        FROM events e CROSS JOIN b
    )
    SELECT event_id,
           CAST(list_sum(list_transform(generate_series(0, 15), i ->
               (((bu >> i) & 1) << (2*i)) + (((bv >> i) & 1) << (2*i + 1))))
             AS BIGINT) AS zval
    FROM s
    """,
    survey_ref="extension: Z-order (Morton) clustering key for "
    "multi-dimensional file skipping (Delta OPTIMIZE ZORDER shape; "
    "operators/layout.py)",
    tags=("scale", "layout"),
    bench=True,
)
def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zorder_layout

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return zorder_layout(ev, ["user_id", "value"]).select(
        "event_id", F.col("_zval").alias("zval")
    )
