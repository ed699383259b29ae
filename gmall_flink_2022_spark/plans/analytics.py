"""Engine-completeness queries beyond the reference's literal surface:
multi-stream union normalization (P8), analytic window functions, rollup,
pivot, semi/anti joins, the SQL-text UDTF path, and approx-distinct scale
variants. The reference has none of these as first-class ops (SURVEY §2.5),
but a complete analytics engine at 100 TB does — Catalyst gives them all
natively; we pin semantics with oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.io import read_table
from .registry import register

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# P8 — per-stream normalize-to-stats + unionByName + aggregate: the
# ProductStatsApp pattern (7 source streams each mapped to one measure set,
# dws/ProductStatsApp.java:104-193) rendered over event types.
# --------------------------------------------------------------------------
@register(
    "dws_union_stats",
    oracle="""
    WITH u AS (
        SELECT user_id, 1 AS click_ct, 0 AS view_ct,
               CAST(0 AS DECIMAL(18,2)) AS amount
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, 0, 1, CAST(0 AS DECIMAL(18,2))
        FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, 0, 0, CAST(value AS DECIMAL(18,2))
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(SUM(click_ct) AS BIGINT) AS click_ct,
           CAST(SUM(view_ct) AS BIGINT) AS view_ct,
           CAST(SUM(amount) AS DOUBLE) AS order_amount
    FROM u GROUP BY user_id
    """,
    survey_ref="§2.2 P8 (normalize-to-stats maps), §2.5 union",
    tags=("dws", "union", "agg"),
)
def dws_union_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    zero_amt = F.lit(0).cast(DEC)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.lit(1).alias("click_ct"),
        F.lit(0).alias("view_ct"),
        zero_amt.alias("amount"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.lit(0).alias("click_ct"),
        F.lit(1).alias("view_ct"),
        zero_amt.alias("amount"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.lit(0).alias("click_ct"),
        F.lit(0).alias("view_ct"),
        F.col("value").cast(DEC).alias("amount"),
    )
    u = clicks.unionByName(views).unionByName(buys)
    return u.groupBy("user_id").agg(
        F.sum("click_ct").alias("click_ct"),
        F.sum("view_ct").alias("view_ct"),
        F.sum("amount").cast("double").alias("order_amount"),
    )


# --------------------------------------------------------------------------
# Analytic window function: top-N per group (serving-layer generalization
# of A7; ranking ties broken deterministically).
# --------------------------------------------------------------------------
@register(
    "ads_topn_per_brand",
    oracle="""
    WITH rev AS (
        SELECT p.p_brand, l.l_partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev_dec
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, l.l_partkey
    ),
    ranked AS (
        SELECT p_brand, l_partkey, rev_dec,
               CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY rev_dec DESC, l_partkey) AS BIGINT) AS rnk
        FROM rev
    )
    SELECT p_brand, l_partkey, CAST(rev_dec AS DOUBLE) AS revenue, rnk
    FROM ranked WHERE rnk <= 3
    """,
    survey_ref="§2.5 (ranking window fn; engine completeness)",
    tags=("ads", "window_fn"),
)
def ads_topn_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("rev_dec"))
    )
    w = W.partitionBy("p_brand").orderBy(F.desc("rev_dec"), F.asc("l_partkey"))
    return (
        rev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(
            "p_brand", "l_partkey", F.col("rev_dec").cast("double").alias("revenue"), "rnk"
        )
    )


# --------------------------------------------------------------------------
# ROLLUP (subtotal hierarchy) — Catalyst-native grouping sets.
# --------------------------------------------------------------------------
@register(
    "ads_rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey_ref="engine completeness: grouping sets / rollup",
    tags=("ads", "rollup"),
)
def ads_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# PIVOT — wide-format conditional aggregation.
# --------------------------------------------------------------------------
@register(
    "ads_pivot_linestatus",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ref="engine completeness: pivot",
    tags=("ads", "pivot"),
)
def ads_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
    )
    return out.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


# --------------------------------------------------------------------------
# Semi / anti joins — EXISTS / NOT EXISTS surface.
# --------------------------------------------------------------------------
@register(
    "dwd_semi_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00')
    """,
    survey_ref="engine completeness: left-semi join (EXISTS)",
    tags=("join", "semi"),
)
def dwd_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    )
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "dwd_anti_idle_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
    survey_ref="engine completeness: left-anti join (NOT EXISTS)",
    tags=("join", "anti"),
)
def dwd_anti_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value order (non-empty at every sf, so the
    hash gate exercises real rows rather than an empty set)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# U1 via SQL text — the LATERAL TABLE(split_words(...)) declarative path
# (dws/KeywordStatsApp.java:40-45) as Spark SQL LATERAL VIEW explode.
# --------------------------------------------------------------------------
@register(
    "dws_keywords_sql_lateral",
    oracle="""
    SELECT lang, word, COUNT(*) AS ct
    FROM (SELECT lang, UNNEST(list_filter(
                 regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 t -> t <> '')) AS word
          FROM documents)
    GROUP BY lang, word
    """,
    survey_ref="§2.7 U1 (UDTF via SQL LATERAL), §3.3 declarative path",
    tags=("dws", "sql", "udtf"),
)
def dws_keywords_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT lang, word, COUNT(*) AS ct
        FROM documents
        LATERAL VIEW explode(
            filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')) w AS word
        GROUP BY lang, word
        """
    )


# --------------------------------------------------------------------------
# Scale variants — approx_count_distinct (HLL) replacing exact distinct
# sets, per SURVEY §4 "distinct-count strategy" (the 100 TB posture).
#
# Driver-checkable TOLERANCE CONTRACT: an HLL estimate can never
# hash-match an exact oracle, so the registered query emits the group
# keys + exact aggregates + a boolean `approx_ok` asserting the HLL
# estimate is within its documented error bound for EVERY group; the
# oracle emits the same exact values + literal TRUE. The hash matches
# iff (a) the exact content matches and (b) the approximation held its
# bound everywhere — a hard driver signal for an approximate operator.
# Bounds are 3-5x the empirically observed max error at sf0.01/sf0.1
# (product groups are tiny -> absolute bound; province groups are
# thousands of orders -> relative bound with rsd=0.02).
# --------------------------------------------------------------------------
@register(
    "dws_product_stats_approx",
    oracle="""
    SELECT date_trunc('day', l_shipdate) AS dt, l_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount,
           COUNT(DISTINCT l_orderkey) AS order_ct,
           TRUE AS approx_ok
    FROM lineitem
    GROUP BY date_trunc('day', l_shipdate), l_partkey
    """,
    survey_ref="§2.4 A2 scale path (HLL distinct), §4 distinct-count strategy",
    tags=("dws", "agg", "approx"),
)
def dws_product_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.date_trunc("day", F.col("l_shipdate")).alias("dt"), "l_partkey"
    ).agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("order_amount"),
        F.countDistinct("l_orderkey").alias("order_ct"),
        # abs-or-rel bound: groups here hold 1-3 distinct orders, where
        # HLL(rsd=.05) is off by at most 1 (observed); bound = max(2, 15%)
        (
            F.abs(
                F.approx_count_distinct("l_orderkey")
                - F.countDistinct("l_orderkey")
            )
            <= F.greatest(
                F.lit(2.0), F.countDistinct("l_orderkey") * F.lit(0.15)
            )
        ).alias("approx_ok"),
    )


@register(
    "dws_province_stats_approx",
    oracle="""
    SELECT n.n_name AS province_name,
           COUNT(DISTINCT o.o_orderkey) AS order_count,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount,
           TRUE AS approx_ok
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    survey_ref="§2.4 A3 scale path (streaming-safe approx distinct)",
    tags=("dws", "agg", "approx"),
)
def dws_province_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("province_name"))
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("order_amount"),
            # rel bound 10% with rsd=0.02 (observed max 0.037 at sf0.1)
            (
                F.abs(
                    F.approx_count_distinct("o_orderkey", 0.02)
                    - F.countDistinct("o_orderkey")
                )
                <= F.countDistinct("o_orderkey") * F.lit(0.10)
            ).alias("approx_ok"),
        )
    )


# --------------------------------------------------------------------------
# A6 exact serving shape: scalar GMV for one month (the /api/sugar/gmv
# query with its date filter, SugarController.java:23-36).
# --------------------------------------------------------------------------
@register(
    "ads_gmv_month",
    oracle="""
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
           COUNT(*) AS order_ct
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'
    """,
    survey_ref="§2.4 A6 (scalar serving GMV), §2.8",
    tags=("ads", "serving"),
)
def ads_gmv_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.date_format("o_orderdate", "yyyy-MM") == "1995-03").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("gmv"),
        F.count(F.lit(1)).alias("order_ct"),
    )


# --------------------------------------------------------------------------
# Set operations — INTERSECT / EXCEPT (engine completeness; absent from the
# reference per SURVEY §2.5).
# --------------------------------------------------------------------------
@register(
    "set_intersect_buyers",
    oracle="""
    SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    survey_ref="engine completeness: INTERSECT",
    tags=("setop",),
)
def set_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("c")
    )
    return urgent.intersect(low)


@register(
    "set_except_buyers",
    oracle="""
    SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    survey_ref="engine completeness: EXCEPT",
    tags=("setop",),
)
def set_except_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("c")
    )
    return urgent.subtract(low)  # EXCEPT (set semantics), not EXCEPT ALL


# --------------------------------------------------------------------------
# §2.8 — the /api/sugar/tm reshape: top-N trademark GMV pivoted into
# parallel ordered arrays (categories/series), exactly the dashboard JSON
# the reference's SugarController builds (SugarController.java:38-68).
# --------------------------------------------------------------------------
@register(
    "ads_tm_reshape",
    oracle="""
    WITH top AS (
        SELECT p.p_brand,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS amt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
        ORDER BY amt DESC, p.p_brand LIMIT 5
    )
    SELECT array_to_string(list(p_brand ORDER BY amt DESC, p_brand), ',') AS categories,
           array_to_string(list(CAST(amt AS VARCHAR) ORDER BY amt DESC, p_brand), ',') AS series
    FROM top
    """,
    survey_ref="§2.8 serving reshape (SugarController categories/series)",
    tags=("ads", "serving"),
)
def ads_tm_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    top = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC))
            .cast("decimal(28,2)")
            .alias("amt")
        )
        .orderBy(F.desc("amt"), F.asc("p_brand"))
        .limit(5)
    )
    pairs = top.agg(
        F.sort_array(
            F.collect_list(F.struct((-F.col("amt")).alias("neg"), "p_brand", "amt"))
        ).alias("s")
    )
    return pairs.select(
        F.concat_ws(",", F.transform("s", lambda x: x["p_brand"])).alias("categories"),
        F.concat_ws(
            ",", F.transform("s", lambda x: x["amt"].cast("string"))
        ).alias("series"),
    )


# --------------------------------------------------------------------------
# Native session windows — F.session_window (gap-merged, streaming-capable)
# vs the lag+cumsum SQL formulation: same sessions, proven by oracle.
# Spark's session end = last event + gap; the oracle mirrors that.
# --------------------------------------------------------------------------
@register(
    "dws_session_window_native",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts > LAG(ts) OVER w + INTERVAL 1800 SECOND
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS sess_start,
           MAX(ts) + INTERVAL 1800 SECOND AS sess_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
    survey_ref="§2.6 W3 extension: session windows (native session_window "
    "== batch lag+cumsum oracle)",
    tags=("dws", "window", "session"),
)
def dws_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "1800 seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
        )
    )


@register(
    "set_intersect_all_buyers",
    oracle="""
    SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    survey_ref="engine completeness: INTERSECT ALL (multiset semantics — "
    "each custkey kept min(urgent_ct, low_ct) times)",
    tags=("setop",),
)
def set_intersect_all_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("c")
    )
    return urgent.intersectAll(low)


@register(
    "set_except_all_buyers",
    oracle="""
    SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    survey_ref="engine completeness: EXCEPT ALL (multiset semantics — "
    "urgent_ct - low_ct surviving copies per custkey)",
    tags=("setop",),
)
def set_except_all_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("c")
    )
    return urgent.exceptAll(low)


@register(
    "events_asof_join",
    oracle="""
    WITH v AS (
        SELECT user_id, ts, MAX(event_id) AS view_id
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           v.ts AS asof_ts, v.view_id AS asof_view_id
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    survey_ref="§2.3 J1/J2 generalization: AS-OF join (latest state "
    "at-or-before event time; merge-join rendering, one shuffle) — "
    "oracle is DuckDB's native ASOF JOIN",
    tags=("join", "asof"),
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    return asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["view_id"],
    )


@register(
    "orders_range_band_join",
    oracle="""
    WITH bands AS (
        SELECT CAST(i AS BIGINT) AS band_id,
               i * 25000.0 AS lo, i * 25000.0 + 50000.0 AS hi
        FROM (SELECT UNNEST(generate_series(0, 19)) AS i)
    )
    SELECT band_id,
           COUNT(*) AS order_ct,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN bands
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_id
    """,
    survey_ref="§2.3 extension: RANGE join via fixed-width bucketing — "
    "interval containment becomes an equi-join on bucket + residual "
    "filter instead of Catalyst's BroadcastNestedLoopJoin",
    tags=("join", "range"),
)
def orders_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import range_bucket_join

    o = read_table(spark, sf_dir, "orders")
    bands = spark.range(20).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 25000.0).alias("lo"),
        (F.col("id") * 25000.0 + 50000.0).alias("hi"),
    )
    joined = range_bucket_join(
        o, bands, value_col="o_totalprice", lo_col="lo", hi_col="hi",
        bucket_width=25000,
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("order_ct"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
    )


@register(
    "dim_scd2_asof",
    oracle="""
    WITH cl AS (
        SELECT user_id, ts, max_by(value, event_id) AS profile_v
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    hist AS (
        SELECT user_id, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
               profile_v
        FROM cl
    ),
    p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           h.valid_from AS asof_valid_from, h.profile_v AS asof_profile_v
    FROM p LEFT JOIN hist h
      ON p.user_id = h.user_id AND h.valid_from <= p.ts
     AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    """,
    survey_ref="S7 extension: SCD2 dim history (valid_from/valid_to from "
    "a changelog) + point-in-time lookup via the as-of merge join — "
    "the warehouse-grade upgrade of the reference's overwrite-only "
    "Phoenix dims",
    tags=("dim", "scd2", "asof"),
)
def dim_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join
    from ..sources.dim_store import scd2_history

    ev = read_table(spark, sf_dir, "events")
    changelog = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.expr("max_by(value, event_id)").alias("profile_v"))
    )
    hist = scd2_history(changelog, "user_id", "ts", ["profile_v"])
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        hist.select("user_id", "valid_from", "profile_v"),
        on="user_id",
        left_ts="ts",
        right_ts="valid_from",
        right_payload=["profile_v"],
    )


# --------------------------------------------------------------------------
# U1 with REAL dictionary segmentation — the reference's KeywordStats is
# Chinese word segmentation (IK analyzer, utils/KeywordUtil.java:11-14,
# consumed in dws/KeywordStatsApp.java:40-45). jieba is absent in this
# container, so the executed path is the deterministic FMM fallback
# (functions/tokenize.py); the oracle runs the IDENTICAL longest-match
# algorithm as a DuckDB recursive CTE over the same bundled lexicon, so
# the driver hash-checks dictionary segmentation like any exact operator.
# The CJK input is derived deterministically from doc_id on both sides
# (testdata carries no Chinese text; same-derivation keeps the fixture
# inside the driver's parquet tables).
# --------------------------------------------------------------------------
_CJK_BRANDS = ["小米", "华为", "苹果", "联想", "荣耀"]
_CJK_PRODS = ["智能手机", "平板电脑", "笔记本电脑", "洗衣机"]
_CJK_SUFS = ["壳", "膜", ""]  # 壳/膜 are NOT in the lexicon -> char fallback


def _cjk_oracle() -> str:
    from ..functions.tokenize import CJK_LEXICON

    lex_values = ", ".join(f"('{w}')" for w in sorted(CJK_LEXICON))
    brands = ", ".join(f"'{w}'" for w in _CJK_BRANDS)
    prods = ", ".join(f"'{w}'" for w in _CJK_PRODS)
    sufs = ", ".join(f"'{w}'" for w in _CJK_SUFS)
    return f"""
    WITH RECURSIVE lex(w) AS (SELECT * FROM (VALUES {lex_values}) t(w)),
    base AS (
        SELECT doc_id,
               list_extract([{brands}], CAST(doc_id % 5 AS INT) + 1)
               || list_extract([{prods}], CAST((doc_id // 5) % 4 AS INT) + 1)
               || list_extract([{sufs}], CAST((doc_id // 20) % 3 AS INT) + 1)
               AS kw
        FROM documents WHERE doc_id < 200
    ),
    -- forward maximum matching: at each step strip the LONGEST lexicon
    -- word prefixing the remainder, else one character (same algorithm
    -- as functions/tokenize.py::fmm_segment)
    seg(doc_id, rest, tok) AS (
        SELECT doc_id, kw, CAST(NULL AS VARCHAR) FROM base
        UNION ALL
        SELECT doc_id, substr(rest, length(tok2) + 1), tok2
        FROM (
            SELECT doc_id, rest,
                   coalesce(
                       (SELECT w FROM lex
                        WHERE rest LIKE w || '%'
                        ORDER BY length(w) DESC, w LIMIT 1),
                       substr(rest, 1, 1)) AS tok2
            FROM seg WHERE length(rest) > 0
        )
    )
    SELECT tok AS word, COUNT(*) AS ct
    FROM seg WHERE tok IS NOT NULL
    GROUP BY tok
    """


@register(
    "dws_keyword_stats_cjk",
    oracle=_cjk_oracle(),
    survey_ref="§2.7 U1 with dictionary segmentation (KeywordUtil.java:11-14 "
    "intended behavior; FMM longest-match fallback when jieba absent)",
    tags=("dws", "udtf", "cjk"),
)
def dws_keyword_stats_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.tokenize import cjk_tokens_udf

    def pick(options: list[str], idx):
        return F.element_at(
            F.array(*[F.lit(o) for o in options]), (idx + 1).cast("int")
        )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    kw = F.concat(
        pick(_CJK_BRANDS, F.col("doc_id") % 5),
        pick(_CJK_PRODS, F.floor(F.col("doc_id") / 5) % 4),
        pick(_CJK_SUFS, F.floor(F.col("doc_id") / 20) % 3),
    )
    toks = cjk_tokens_udf()(kw)
    return (
        d.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("ct"))
    )


# --------------------------------------------------------------------------
# Percentiles — exact interpolated quantiles hash-match across engines
# (same linear interpolation in Spark's percentile() and DuckDB's
# quantile_cont); approx_percentile gets the same tolerance-boolean
# contract as the HLL queries (within 1% of exact per group; observed
# ~0.02% on this data).
# --------------------------------------------------------------------------
@register(
    "ads_price_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.9) AS p90,
           TRUE AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="engine completeness: exact interpolated percentiles + "
    "approx_percentile tolerance contract (the t-digest scale path)",
    tags=("ads", "agg", "percentile", "approx"),
)
def ads_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        (
            F.abs(
                F.expr("percentile_approx(l_extendedprice, 0.5, 10000)")
                - F.expr("percentile(l_extendedprice, 0.5)")
            )
            <= F.expr("percentile(l_extendedprice, 0.5)") * F.lit(0.01)
        ).alias("approx_ok"),
    )


# --------------------------------------------------------------------------
# CUBE + GROUPING — the remaining grouping-sets surface beyond ROLLUP.
# --------------------------------------------------------------------------
@register(
    "ads_cube_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    survey_ref="engine completeness: CUBE grouping sets + GROUPING "
    "indicator (distinguishes a real NULL group from a cube subtotal)",
    tags=("ads", "rollup"),
)
def ads_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "revenue", "n")


# --------------------------------------------------------------------------
# Ranking-function breadth: ntile / percent_rank / cume_dist over a TOTAL
# order (acctbal, custkey) — ties broken by key so quartile assignment is
# deterministic and engine-identical; the rank ratios are exact integer
# divisions done once in double.
# --------------------------------------------------------------------------
@register(
    "ads_customer_quartiles",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    survey_ref="engine completeness: ntile / percent_rank / cume_dist "
    "window functions (§2.5 ranking surface beyond row_number/rank)",
    tags=("ads", "window"),
)
def ads_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


# --------------------------------------------------------------------------
# Sliding (hopping) event-time windows — each event lands in
# size/slide = 2 overlapping windows; the oracle replays the hop
# arithmetic by unnesting both containing window starts.
# --------------------------------------------------------------------------
@register(
    "dws_events_sliding",
    oracle="""
    WITH hop AS (
        SELECT e.value,
               to_timestamp(s) AS wstart
        FROM events e,
        UNNEST(generate_series(
            CAST(floor(epoch(e.ts) / 300) * 300 AS BIGINT) - 300,
            CAST(floor(epoch(e.ts) / 300) * 300 AS BIGINT),
            300)) AS t(s)
        WHERE epoch(e.ts) >= s AND epoch(e.ts) < s + 600
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS stt,
           strftime(wstart + INTERVAL 600 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM hop GROUP BY wstart
    """,
    survey_ref="§2.4 window family: sliding/hopping event-time windows "
    "(10-minute size, 5-minute slide — the Flink HOP window surface; "
    "tumbling covered by A1-A4)",
    tags=("dws", "window"),
)
def dws_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (
        ev.groupBy(F.window("ts", "600 seconds", "300 seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", fmt).alias("stt"),
            F.date_format("w.end", fmt).alias("edt"),
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# Ordered funnel conversion — multi-step sequential semantics (view ->
# click within 24h of first view -> purchase within 24h of that click).
# Distinct from the interval join (pairwise) and CEP bounce (absence):
# each step's anchor is the MIN qualifying timestamp of the previous
# step, so the steps are genuinely ordered, not just co-windowed.
# --------------------------------------------------------------------------
@register(
    "dws_funnel_conversion",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'click'
          AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_viewed,
           (SELECT COUNT(*) FROM s2) AS n_clicked,
           (SELECT COUNT(*) FROM s3) AS n_purchased,
           CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE) AS view_to_click,
           CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM s2) AS DOUBLE) AS click_to_purchase
    """,
    survey_ref="extension: ordered funnel conversion (anchored min-per-step "
    "sequential windows; complements the pairwise interval join J1/J2 and "
    "the CEP absence pattern W6)",
    tags=("dws", "funnel", "agg"),
)
def dws_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).alias("n_viewed"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_clicked"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_purchased"))
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .select(
            "n_viewed",
            "n_clicked",
            "n_purchased",
            (F.col("n_clicked").cast("double") / F.col("n_viewed").cast("double")).alias(
                "view_to_click"
            ),
            (
                F.col("n_purchased").cast("double")
                / F.col("n_clicked").cast("double")
            ).alias("click_to_purchase"),
        )
    )


# --------------------------------------------------------------------------
# Retention cohorts — users grouped by first-activity week, counted again
# in each of the following k weeks. The remaining classic analytics
# shape: self-join of an entity's FIRST event against all its activity.
# --------------------------------------------------------------------------
@register(
    "dws_retention_cohorts",
    oracle="""
    WITH first AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cw
        FROM events GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
    ),
    j AS (
        SELECT f.cw,
               CAST(date_diff('day', f.cw, a.aw) // 7 AS BIGINT) AS k,
               a.user_id
        FROM first f JOIN act a USING (user_id)
    )
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, k,
           COUNT(DISTINCT user_id) AS n_users
    FROM j WHERE k BETWEEN 0 AND 3
    GROUP BY cw, k
    """,
    survey_ref="extension: weekly retention cohorts (first-activity week "
    "x weeks-since-cohort matrix; both engines truncate weeks to Monday "
    "so the day-difference is an exact multiple of 7)",
    tags=("dws", "cohort", "agg"),
)
def dws_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("aw")
    ).distinct()
    j = act.join(first, "user_id").select(
        "cw",
        (F.datediff(F.col("aw"), F.col("cw")) / 7).cast("long").alias("k"),
        "user_id",
    )
    return (
        j.filter(F.col("k").between(0, 3))
        .groupBy(F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"), "k")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ------------------------------------------------- time-decayed user score
@register(
    "ads_user_decay_score",
    # Exponentially time-decayed activity score per user: weight 1 for a
    # user's most recent event, 1/2 for the one before, ... over the last
    # K=16 events. ENGINE-EXACT EWMA: the decay base is a POWER OF TWO,
    # so every weighted term cents * 2^(16-rn) is exact bigint arithmetic
    # and the only float op is the final division of two exact integers
    # (num < 2^53, so the double rendering is itself exact). cents =
    # floor(value * 100) — floor of the identical IEEE product, never
    # round() (engines disagree on ties-away vs half-even).
    oracle="""
    WITH r AS (
        SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, COUNT(*) AS n_scored,
           CAST(SUM(cents * (1::BIGINT << (16 - rn))) AS BIGINT) AS num_q,
           CAST(SUM(cents * (1::BIGINT << (16 - rn))) AS DOUBLE)
               / CAST(100 * (1::BIGINT << 15) AS DOUBLE) AS decay_score
    FROM r WHERE rn <= 16 GROUP BY user_id
    """,
    survey_ref="§2.4 A-family extension: per-key exponentially decayed "
    "activity score (recency-weighted EWMA, the feature-store staple) — "
    "one shuffle on user_id; the rank<=16 filter is pushed into the "
    "window sort as a per-key group limit, so no key's full history "
    "sorts through the exchange",
    tags=("ads", "agg", "window"),
)
def ads_user_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    r = ev.select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number()
        .over(
            W.partitionBy("user_id").orderBy(
                F.col("ts").desc(), F.col("event_id").desc()
            )
        )
        .alias("rn"),
    ).filter(F.col("rn") <= 16)
    num = F.sum(
        F.col("cents") * F.call_function("shiftleft", F.lit(1).cast("long"),
                                         (16 - F.col("rn")).cast("int"))
    )
    return r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_scored"),
        num.cast("long").alias("num_q"),
        (num.cast("double") / F.lit(float(100 * (1 << 15)))).alias("decay_score"),
    )


# ------------------------------------------------ multi-touch attribution
@register(
    "ads_attribution_linear",
    # Linear (equal-credit) multi-touch attribution: each purchase's
    # revenue splits evenly across the user's view/click touchpoints in
    # the 24 h before it. Output grain = (conversion, channel), so the
    # attributed amount is ONE division of two exact integers per row
    # (cents * k_channel / (100 * n_touches)) — no float accumulation
    # anywhere, engine-exact by construction. Purchases with no prior
    # touch have nothing to attribute and are absent (inner join).
    oracle="""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, ts,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id, ts, event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ),
    tp AS (
        SELECT p.purchase_id, p.user_id, p.cents, t.channel
        FROM p JOIN t ON p.user_id = t.user_id
         AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 24 HOUR
    ),
    per_chan AS (
        SELECT purchase_id, user_id, cents, channel,
               COUNT(*) AS channel_touches
        FROM tp GROUP BY purchase_id, user_id, cents, channel
    )
    SELECT purchase_id, user_id, channel,
           CAST(SUM(channel_touches) OVER (PARTITION BY purchase_id)
                AS BIGINT) AS n_touches,
           channel_touches,
           CAST(cents * channel_touches AS DOUBLE)
             / CAST(100 * SUM(channel_touches) OVER (PARTITION BY purchase_id)
                    AS DOUBLE) AS attributed_revenue
    FROM per_chan
    """,
    survey_ref="§2.3 J2 application: marketing attribution over the "
    "interval join (equi-join on user_id + residual time band, so "
    "per-key fan-out is the user's own touch count — never a time-"
    "bucket cross product); the analytics-serving shape of the "
    "reference's OrderWide enrichment chain",
    tags=("ads", "join", "window"),
)
def ads_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("t_ts"), F.col("event_type").alias("channel")
    )
    tp = p.join(t, "user_id").filter(
        (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
    )
    per_chan = tp.groupBy("purchase_id", "user_id", "cents", "channel").agg(
        F.count(F.lit(1)).alias("channel_touches")
    )
    n = F.sum("channel_touches").over(W.partitionBy("purchase_id"))
    return per_chan.select(
        "purchase_id",
        "user_id",
        "channel",
        n.cast("long").alias("n_touches"),
        "channel_touches",
        (
            (F.col("cents") * F.col("channel_touches")).cast("double")
            / (100 * n).cast("double")
        ).alias("attributed_revenue"),
    )


# --------------------------------------------------- data-quality audits
@register(
    "dq_profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_custkey)
    FROM orders
    """,
    survey_ref="extension: column profiling (completeness + cardinality "
    "— the Deequ/Great-Expectations analyzer surface) as map-side-"
    "combined aggregates; the dirty-data accounting of "
    "dwd/BaseLogApp.java generalized to a declarative audit",
    tags=("dq", "agg"),
)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import profile_columns

    return profile_columns(
        read_table(spark, sf_dir, "orders"),
        ["o_orderkey", "o_orderstatus", "o_custkey"],
    )


@register(
    "dq_referential_orphans",
    # planted orphans: check against a DELIBERATELY restricted dim (even
    # custkeys only / first half of orders), so both branches are
    # non-vacuous on clean TPC-H-ish data.
    oracle="""
    SELECT 'orders_missing_even_customer' AS check_name,
           COUNT(*) AS orphan_ct
    FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM customer
                      WHERE c_custkey = o_custkey AND c_custkey % 2 = 0)
    UNION ALL
    SELECT 'lineitem_missing_first_half_order', COUNT(*)
    FROM lineitem
    WHERE NOT EXISTS (
        SELECT 1 FROM (SELECT o_orderkey FROM orders
                       WHERE o_orderkey <= (SELECT MAX(o_orderkey) / 2
                                            FROM orders)) o
        WHERE o.o_orderkey = l_orderkey)
    """,
    survey_ref="extension: referential-integrity audit (orphaned fact "
    "keys) via LEFT ANTI hash joins — the dim side ships one key column "
    "into the build; the J3 dim-lookup chain's miss path made a "
    "first-class count",
    tags=("dq", "join"),
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import referential_orphans

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 2 == 0)
    li = read_table(spark, sf_dir, "lineitem")
    # the half-way cut travels as a broadcast one-row frame (lazy plan,
    # nothing collects on the driver)
    half = o.agg((F.max("o_orderkey") / 2).alias("h"))
    o_half = (
        o.select("o_orderkey")
        .crossJoin(F.broadcast(half))
        .filter(F.col("o_orderkey") <= F.col("h"))
    )
    return referential_orphans(
        [
            ("orders_missing_even_customer", o, "o_custkey", c, "c_custkey"),
            ("lineitem_missing_first_half_order", li, "l_orderkey",
             o_half, "o_orderkey"),
        ]
    )


@register(
    "dq_check_rules_lineitem",
    oracle="""
    SELECT 'quantity_in_1_50' AS rule_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l_quantity IS NULL
                          OR l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'discount_in_0_0q1', COUNT(*),
           CAST(SUM(CASE WHEN l_discount IS NULL
                          OR l_discount < 0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'tax_in_0_0q08', COUNT(*),
           CAST(SUM(CASE WHEN l_tax IS NULL
                          OR l_tax < 0 OR l_tax > 0.08
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    """,
    survey_ref="extension: rule-based constraint verification (the "
    "Deequ check suite shape) — every rule folds into ONE map-side-"
    "combined aggregate pass; adding a rule adds a column, not a scan; "
    "NULLs fail closed",
    tags=("dq", "agg"),
)
def dq_check_rules_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import check_rules

    li = read_table(spark, sf_dir, "lineitem")
    return check_rules(
        li,
        [
            (
                "quantity_in_1_50",
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            ),
            (
                "discount_in_0_0q1",
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
            ),
            (
                "tax_in_0_0q08",
                (F.col("l_tax") < 0) | (F.col("l_tax") > 0.08),
            ),
        ],
    )


@register(
    "dq_profile_orders_approx",
    # 100 TB profile posture: exact multi-distinct needs Expand (rows x
    # n_cols through the pipeline); the scale variant swaps in
    # approx_count_distinct — one plain aggregate, no Expand — and the
    # driver-checkable contract is the established tolerance-boolean
    # shape: exact values + a per-column bound the HLL must hold.
    oracle="""
    SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           TRUE AS distinct_approx_ok
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           TRUE
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           TRUE
    FROM orders
    """,
    survey_ref="extension: the DQ profile's scale path — HLL cardinality "
    "per column (production shape: one plain aggregate, NO Expand; this "
    "contract entry carries the exact distinct alongside purely to make "
    "the 5%-relative tolerance boolean driver-checkable, same as the "
    "dws_*_approx family)",
    tags=("dq", "agg", "approx"),
)
def dq_profile_orders_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_custkey"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nn_{i}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{i}"))
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd=0.02).alias(f"na_{i}")
        )
    wide = o.agg(*aggs)
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"nn_{i}").alias("n_nulls"),
                        (
                            F.abs(F.col(f"na_{i}") - F.col(f"nd_{i}"))
                            <= F.greatest(
                                F.lit(2.0), F.col(f"nd_{i}") * F.lit(0.05)
                            )
                        ).alias("distinct_approx_ok"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("r")
    ).select("r.column_name", "r.n_rows", "r.n_nulls", "r.distinct_approx_ok")


@register(
    "ads_grouping_sets_revenue",
    # arbitrary (non-hierarchical) grouping sets — ROLLUP and CUBE's
    # general form: per-returnflag totals and per-linestatus totals in
    # one pass, neither a superset of the other.
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    survey_ref="engine completeness: arbitrary GROUPING SETS (the "
    "general form behind the rollup/cube entries) — one scan, Expand "
    "fans each row into its member sets with map-side partials",
    tags=("ads", "rollup"),
)
def ads_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return li.sparkSession.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# ----------------------------------------------- trailing RANGE-frame window
@register(
    "events_trailing_24h",
    # RANGE frame over event time: per event, the user's activity count
    # and cents-sum over the trailing 24 h INCLUDING the current row —
    # the value-based frame (rowsBetween everywhere else in the repo is
    # the row-based one). Engine-exact: integer cents, integer counts.
    # Frame bounds are on epoch seconds (micros div 1_000_000) so both
    # engines cut the window at identical integers.
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS cents_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY epoch_us(ts) // 1000000
                 RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
    """,
    survey_ref="§2.5 window-function breadth: the RANGE (value-based) "
    "frame — trailing 24 h per-user activity; one shuffle on user_id, "
    "one ordered pass per key (no self-join rendering of the trailing "
    "window)",
    tags=("ads", "window_fn", "events"),
)
def events_trailing_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    sec = (F.unix_micros(F.col("ts")) / F.lit(1_000_000)).cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-86399, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).over(w)
        .cast("long")
        .alias("cents_24h"),
    )


# ------------------------------------------------- per-group OLS trend
@register(
    "ads_brand_price_trend",
    # Least-squares slope of price vs ship-day per brand, CLOSED FORM
    # from four exact integer sums: slope = (n*Sxy - Sx*Sy) /
    # (n*Sxx - Sx^2). x = days since 1992-01-01 (integer), y = cents
    # (floor, integer) — every sum is exact bigint, the slope is one
    # division of two exact integers. No UDF, no window, one shuffle:
    # the regression everyone reaches for a grouped-map pandas UDF to
    # write is four map-side-combining aggregates.
    oracle="""
    WITH p AS (
        SELECT p_brand,
               CAST(date_diff('day', TIMESTAMP '1992-01-01 00:00:00',
                              l_shipdate) AS BIGINT) AS x,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    s AS (SELECT p_brand, COUNT(*) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x*y) AS BIGINT) AS sxy,
                 CAST(SUM(x*x) AS BIGINT) AS sxx
          FROM p GROUP BY p_brand)
    SELECT p_brand, n,
           CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
               AS slope_cents_per_day
    FROM s WHERE n*sxx - sx*sx <> 0
    """,
    survey_ref="§2.4 extension: grouped least-squares trend as four "
    "exact-integer aggregates (closed-form OLS) — the per-group "
    "regression without a grouped-map UDF; one shuffle, map-side "
    "partials",
    tags=("ads", "agg"),
)
def ads_brand_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    pt = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = F.datediff(
        F.col("l_shipdate"), F.lit("1992-01-01").cast("date")
    ).cast("long")
    y = F.floor(F.col("l_extendedprice") * 100).cast("long")
    p = li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"]).select(
        "p_brand", x.alias("x"), y.alias("y")
    )
    s = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.filter(den != 0).select(
        "p_brand",
        "n",
        (num.cast("double") / den.cast("double")).alias("slope_cents_per_day"),
    )


# --------------------------------------------- per-user 3-sigma outliers
@register(
    "events_value_outliers",
    # Flag events more than 3 population-sigma from their user's mean —
    # WITHOUT sqrt or float variance: (y - Sy/n)^2 > 9*var cross-
    # multiplies to the pure-integer test (n*y - Sy)^2 > 9*(n*Syy - Sy^2),
    # so the flag can never straddle a float rounding boundary. One
    # aggregate per user + one equi-join back on user_id.
    oracle="""
    WITH y AS (SELECT event_id, user_id,
                      CAST(floor(value * 100) AS BIGINT) AS cents
               FROM events),
    s AS (SELECT user_id, COUNT(*) AS n,
                 CAST(SUM(cents) AS BIGINT) AS sy,
                 CAST(SUM(cents*cents) AS BIGINT) AS syy
          FROM y GROUP BY user_id)
    SELECT y.event_id, y.user_id, y.cents, s.n
    FROM y JOIN s ON y.user_id = s.user_id
    WHERE (s.n*y.cents - s.sy)*(s.n*y.cents - s.sy)
          > 9*(s.n*s.syy - s.sy*s.sy)
    """,
    survey_ref="§2.4 extension: per-key 3-sigma outlier flags in pure "
    "integer arithmetic (cross-multiplied variance test, no sqrt) — "
    "the anomaly gate of a data-quality pipeline; one map-side-combined "
    "aggregate + one natural-key join back",
    tags=("dq", "events", "agg"),
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    y = ev.select(
        "event_id", "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = y.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("cents") * F.col("cents")).alias("syy"),
    )
    j = y.join(s, "user_id")
    dev = F.col("n") * F.col("cents") - F.col("sy")
    return j.filter(
        dev * dev > 9 * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    ).select("event_id", "user_id", "cents", "n")


# --------------------------------------------- grouped correlation (r^2)
@register(
    "ads_qty_discount_corr",
    # Pearson correlation between quantity and discount per return flag
    # WITHOUT sqrt: r^2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2) *
    # (n*Syy - Sy^2)) — numerator and denominator are exact integers
    # (discount scaled to integer basis points), so r^2 is ONE division
    # and the sign is the integer sign of the covariance. The five-sum
    # closed form that usually gets a grouped-map UDF.
    oracle="""
    WITH p AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_discount * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    s AS (SELECT l_returnflag, COUNT(*) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x*y) AS BIGINT) AS sxy,
                 CAST(SUM(x*x) AS BIGINT) AS sxx,
                 CAST(SUM(y*y) AS BIGINT) AS syy
          FROM p GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           CAST(CASE WHEN n*sxy - sx*sy > 0 THEN 1
                     WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 0 END AS BIGINT)
               AS corr_sign,
           CAST(CAST(n*sxy - sx*sy AS HUGEINT)
                * CAST(n*sxy - sx*sy AS HUGEINT) AS DOUBLE)
             / CAST(CAST(n*sxx - sx*sx AS HUGEINT)
                    * CAST(n*syy - sy*sy AS HUGEINT) AS DOUBLE) AS r2
    FROM s
    WHERE (n*sxx - sx*sx) <> 0 AND (n*syy - sy*sy) <> 0
    """,
    survey_ref="§2.4 extension: grouped Pearson correlation as five "
    "exact-integer sums — r^2 is one exact division and the sign is an "
    "integer, so no sqrt or float accumulation decides anything; "
    "completes the no-UDF statistics family with the OLS trend",
    tags=("ads", "agg"),
)
def ads_qty_discount_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("y"),
    )
    s = p.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # the squares exceed bigint at scale — cast each OPERAND to
    # decimal(19,0) (lossless from bigint) so Spark types the product
    # decimal(19,0)*decimal(19,0) as decimal(38,0) (DuckDB: HUGEINT).
    # Do NOT cast the operands to decimal(38,0): 38*38 multiplies cap at
    # precision 38 and overflow to NULL. Both engines' int->double
    # conversions are correctly rounded, so the single division stays
    # engine-exact.
    covd = cov.cast("decimal(19,0)")
    vxd, vyd = vx.cast("decimal(19,0)"), vy.cast("decimal(19,0)")
    return s.filter((vx != 0) & (vy != 0)).select(
        "l_returnflag",
        "n",
        F.signum(cov).cast("long").alias("corr_sign"),
        ((covd * covd).cast("double") / (vxd * vyd).cast("double")).alias("r2"),
    )


# --------------------------------------------------- revenue concentration
@register(
    "ads_revenue_gini",
    # Gini coefficient of order revenue per priority class — the
    # concentration diagnostic, rank-form: G = (2*S_ranked - (n+1)*S)
    # / (n*S) with S_ranked = sum(rank_i * x_i) over cents ranked
    # ascending (total order via the orderkey tiebreak, so both engines
    # rank identically). All sums exact bigint; ONE final division.
    oracle="""
    WITH x AS (
        SELECT o_orderpriority,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY CAST(floor(o_totalprice * 100)
                                                AS BIGINT), o_orderkey)
                   AS rnk
        FROM orders
    ),
    s AS (SELECT o_orderpriority, COUNT(*) AS n,
                 CAST(SUM(cents) AS BIGINT) AS tot,
                 CAST(SUM(rnk * cents) AS BIGINT) AS rtot
          FROM x GROUP BY o_orderpriority)
    SELECT o_orderpriority, n,
           CAST(2*rtot - (n+1)*tot AS DOUBLE) / CAST(n*tot AS DOUBLE)
               AS gini
    FROM s WHERE tot <> 0
    """,
    survey_ref="§2.4 extension: per-group Gini concentration in the "
    "rank form — one ranking window (per-key ordered pass), exact "
    "integer sums, one division; the inequality diagnostic without a "
    "single float accumulation",
    tags=("ads", "agg", "window_fn"),
)
def ads_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    x = o.select(
        "o_orderpriority",
        cents.alias("cents"),
        F.row_number()
        .over(
            W.partitionBy("o_orderpriority").orderBy(
                cents.asc(), F.col("o_orderkey").asc()
            )
        )
        .alias("rnk"),
    )
    s = x.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("tot"),
        F.sum(F.col("rnk") * F.col("cents")).alias("rtot"),
    )
    num = 2 * F.col("rtot") - (F.col("n") + 1) * F.col("tot")
    den = F.col("n") * F.col("tot")
    return s.filter(F.col("tot") != 0).select(
        "o_orderpriority",
        "n",
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


# ------------------------------------------------------- path analysis
@register(
    "dws_top_daily_paths",
    # Clickstream path mining lite: each (user, day)'s ordered
    # event-type sequence becomes a path string; output the 10 most
    # common paths (count desc, path asc — fully deterministic: the
    # per-day ordering is (ts, event_id), a total order). The funnel
    # entry asks "did steps happen in order"; this asks "WHAT orders
    # actually happen".
    oracle="""
    WITH p AS (
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS dt,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
    ),
    c AS (SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path)
    SELECT path, n_sessions FROM c
    ORDER BY n_sessions DESC, path LIMIT 10
    """,
    survey_ref="§2.4/§2.5 extension: ordered path extraction per "
    "(user, day) + top-N path frequencies — sort_array over the "
    "per-key collected (ts, event_id, type) structs (bounded by the "
    "key's own event count), then TakeOrderedAndProject for the top-10",
    tags=("dws", "events", "window_fn"),
)
def dws_top_daily_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    p = (
        ev.groupBy(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("dt")
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    c = p.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    return c.orderBy(F.desc("n_sessions"), F.asc("path")).limit(10)


# ------------------------------------------------------ funnel conversion
@register(
    "ads_funnel_conversion",
    # Ordered-step funnel per day: a user converts a step only with an
    # event STRICTLY AFTER their entry into the previous step
    # (min-timestamp chaining — the standard strictly-ordered funnel
    # semantics). Three filtered min-aggregates + two equi-joins on
    # (user, day), all natural keys with map-side combine; the serving
    # row is one tiny per-day aggregate. No window function and no
    # per-user event array ever materializes — at 100 TB each stage is
    # a pre-reduced one-row-per-user frame.
    oracle="""
    WITH v AS (SELECT user_id, CAST(ts AS DATE) AS dt, MIN(ts) AS tv
               FROM events WHERE event_type = 'view'
               GROUP BY user_id, CAST(ts AS DATE)),
    c AS (SELECT e.user_id, v.dt, MIN(e.ts) AS tc
          FROM events e JOIN v ON e.user_id = v.user_id
                       AND CAST(e.ts AS DATE) = v.dt AND e.ts > v.tv
          WHERE e.event_type = 'click'
          GROUP BY e.user_id, v.dt),
    p AS (SELECT e.user_id, c.dt
          FROM events e JOIN c ON e.user_id = c.user_id
                       AND CAST(e.ts AS DATE) = c.dt AND e.ts > c.tc
          WHERE e.event_type = 'purchase'
          GROUP BY e.user_id, c.dt)
    SELECT CAST(v.dt AS VARCHAR) AS dt,
           COUNT(*) AS n_view,
           CAST(COUNT(c.user_id) AS BIGINT) AS n_click_after_view,
           CAST(COUNT(p.user_id) AS BIGINT) AS n_purchase_after_click
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id AND c.dt = v.dt
    LEFT JOIN p ON p.user_id = v.user_id AND p.dt = v.dt
    GROUP BY v.dt
    """,
    survey_ref="extension: strictly-ordered funnel analysis "
    "(view -> click -> purchase per user-day via min-timestamp "
    "chaining) — the e-commerce conversion report the reference's ADS "
    "layer serves dashboards from; three pre-reduced per-user frames, "
    "joins on natural keys only",
    tags=("ads", "events", "serving"),
)
def ads_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    dt = F.col("ts").cast("date")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", dt.alias("dt"))
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .alias("e")
        .join(
            v.alias("v"),
            (F.col("e.user_id") == F.col("v.user_id"))
            & (F.col("e.ts").cast("date") == F.col("v.dt"))
            & (F.col("e.ts") > F.col("v.tv")),
        )
        .groupBy(F.col("e.user_id").alias("user_id"), F.col("v.dt").alias("dt"))
        .agg(F.min("e.ts").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .alias("e")
        .join(
            c.alias("c"),
            (F.col("e.user_id") == F.col("c.user_id"))
            & (F.col("e.ts").cast("date") == F.col("c.dt"))
            & (F.col("e.ts") > F.col("c.tc")),
        )
        .groupBy(F.col("e.user_id").alias("user_id"), F.col("c.dt").alias("dt"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("user_id", "dt")
    )
    joined = (
        v.select("user_id", "dt")
        .join(c.select("user_id", F.col("dt").alias("dt"), F.lit(1).alias("_c")),
              ["user_id", "dt"], "left")
        .join(p.withColumn("_p", F.lit(1)), ["user_id", "dt"], "left")
    )
    return joined.groupBy(F.col("dt").cast("string").alias("dt")).agg(
        F.count(F.lit(1)).alias("n_view"),
        F.count("_c").cast("long").alias("n_click_after_view"),
        F.count("_p").cast("long").alias("n_purchase_after_click"),
    )


# ------------------------------------------------------- cohort retention
@register(
    "ads_retention_cohorts",
    # Classic cohort-retention triangle: users grouped by first-seen day
    # (the cohort), counted on each later activity day with the offset
    # in days. Two aggregates (first-seen per user; distinct activity
    # days per user) + one join on user_id — the cohort frame is one row
    # per user, so the join probe is user-grain, never event-grain.
    oracle="""
    WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_dt
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_dt FROM events)
    SELECT CAST(f.cohort_dt AS VARCHAR) AS cohort_dt,
           CAST(a.act_dt - f.cohort_dt AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY f.cohort_dt, a.act_dt - f.cohort_dt
    """,
    survey_ref="extension: cohort retention triangle (first-seen day x "
    "day offset x active users) — the serving-layer engagement report; "
    "user-grain frames only, event-grain work is the two initial "
    "aggregates with map-side combine",
    tags=("ads", "events", "serving"),
)
def ads_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    dt = F.col("ts").cast("date")
    f = ev.groupBy("user_id").agg(F.min(dt).alias("cohort_dt"))
    a = ev.select("user_id", dt.alias("act_dt")).distinct()
    j = a.join(f, "user_id")
    return j.groupBy(
        F.col("cohort_dt").cast("string").alias("cohort_dt"),
        F.datediff("act_dt", "cohort_dt").cast("long").alias("day_offset"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_active"))
