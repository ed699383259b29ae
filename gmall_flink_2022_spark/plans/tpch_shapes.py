"""TPC-H relational-completeness batch 3 — the seven query SHAPES the
reduced schema forced batch 2 to skip (Q2/Q9/Q11/Q12/Q16/Q20/Q21).

The testdata has no partsupp table and no commitdate/receiptdate/
shipmode/container columns, so these are ADAPTED shapes, not verbatim
TPC-H: each keeps the defining relational pattern and swaps the missing
columns for present ones (documented per query). What this batch adds
that batches 1-2 don't have:

- Q2  correlated scalar-MIN subquery (min-cost supplier per part)
- Q9  expression profit (rev - cost) over a 6-way join, LIKE filter
- Q11 HAVING against a GLOBAL scalar subquery (fraction-of-total)
- Q12 conditional CASE counts under a cross-table date-arithmetic
      predicate (shipdate vs orderdate + interval)
- Q16 NOT IN (subquery) exclusion + COUNT DISTINCT multi-group
- Q20 nested semi-joins (IN over an agg-derived inner IN)
- Q21 multi-correlated EXISTS / NOT EXISTS on the same fact table

Column swaps: ps_supplycost -> p_retailprice * 0.1 (Q9 cost proxy);
l_receiptdate/l_commitdate lateness -> l_shipdate > o_orderdate + N days
(Q12/Q21); part-supplier relation -> DISTINCT (l_partkey, l_suppkey)
pairs from lineitem (Q2/Q16/Q20); s_comment '%Complaints%' ->
s_acctbal < 0 (Q16).

Scale notes: every dim (part/supplier/nation/region and every agg-derived
candidate set) is broadcast; lineitem shuffles at most once per query, on
its natural key. Q21 deliberately avoids the textbook double-correlated
self-join: per-order supplier stats are ONE aggregation on l_orderkey,
then the late lines join those stats on the same key — AQE reuses the
exchange instead of scanning lineitem three times.

Reference parity: the reference's SQL surface (FlinkSQL DDL + group/join
jobs, e.g. gmall-realtime/.../app/dws/ProvinceStatsSqlApp.java) never
exercises correlated subqueries; this batch exists for engine
completeness per SURVEY.md §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.io import read_table
from .registry import register

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast(DEC)
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH offer AS (
        SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
               MIN(l.l_extendedprice / l.l_quantity) AS unit_price
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY 1, 2
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           o.unit_price AS best_price
    FROM part p
    JOIN offer o ON o.partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = o.suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'SMALL' AND p.p_size BETWEEN 10 AND 20
      AND o.unit_price = (SELECT MIN(o2.unit_price) FROM offer o2
                          WHERE o2.partkey = p.p_partkey)
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    survey_ref="§2.5 TPC-H Q2 shape (correlated scalar-MIN subquery: "
    "cheapest in-region supplier per part; part-supplier relation derived "
    "from lineitem in lieu of partsupp)",
    tags=("sql", "tpch", "subquery", "join"),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-min subquery, Spark-first: the per-part MIN is a
    window over the offer aggregate (one shuffle on partkey, reused by
    the equality filter) instead of a re-scan per outer row. unit_price
    is a double/double division computed identically on both engines, so
    the MIN-equality predicate compares bit-identical values."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & F.col("p_size").between(10, 20)
    )
    offer = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    best = offer.withColumn(
        "best", F.min("unit_price").over(Window.partitionBy("partkey"))
    ).filter(F.col("unit_price") == F.col("best"))
    return (
        best.join(F.broadcast(p), F.col("partkey") == p["p_partkey"])
        .join(F.broadcast(s), F.col("suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("unit_price").alias("best_price"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2))
                      * CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    """,
    survey_ref="§2.5 TPC-H Q9 shape (profit by nation x year; "
    "ps_supplycost -> p_retailprice*0.1 cost proxy, LIKE name filter)",
    tags=("sql", "tpch", "join", "agg"),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit = _rev() - (
        F.col("p_retailprice").cast(DEC)
        * F.col("l_quantity").cast(DEC)
        * F.lit(0.1).cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH val AS (
        SELECT l.l_partkey AS partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS value_dec
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_7', 'NATION_8')
        GROUP BY 1
    )
    SELECT partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM val
    WHERE value_dec > (SELECT SUM(value_dec) * 0.001 FROM val)
    """,
    survey_ref="§2.5 TPC-H Q11 shape (fraction-of-total HAVING: per-part "
    "value vs a global scalar subquery; lineitem value in lieu of "
    "partsupp stock value)",
    tags=("sql", "tpch", "subquery", "agg"),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-scalar HAVING, Spark-first: the per-part aggregate is
    persisted and reused by BOTH the threshold (1-row re-aggregate,
    broadcast-cross-joined) and the filter — one lineitem scan total,
    no driver collect. Threshold comparison happens on exact decimals
    (sum * 0.001), double cast only in the output column."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_8")
    )
    val = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_rev()).alias("value_dec"))
    ).persist()
    total = val.agg(
        (F.sum("value_dec") * F.lit(0.001).cast("decimal(4,3)")).alias("thresh")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("thresh"))
        .select("partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@register(
    "tpch_q12_priority_shipping",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
    survey_ref="§2.5 TPC-H Q12 shape (conditional priority CASE counts "
    "under a cross-table date-arithmetic predicate; l_returnflag stands "
    "in for the absent l_shipmode, shipdate-vs-orderdate lag for the "
    "absent receipt/commit comparison)",
    tags=("sql", "tpch", "join", "agg"),
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q16_supplier_part_types",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type NOT LIKE 'ECONOMY%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    survey_ref="§2.5 TPC-H Q16 shape (NOT IN subquery exclusion + "
    "COUNT DISTINCT multi-group; supplier relation via lineitem, "
    "complaints list -> negative-balance suppliers)",
    tags=("sql", "tpch", "subquery", "agg"),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-null key = broadcast left_anti join (no
    null-semantics trap: s_suppkey is non-null by construction)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & ~F.col("p_type").like("ECONOMY%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    li = _t(spark, sf_dir, "lineitem")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == F.col("bad_key"), "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_excess_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey AS suppkey, l_partkey AS partkey,
               SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    )
    SELECT s.s_name, s.s_suppkey
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
      AND s.s_suppkey IN (
          SELECT sh.suppkey FROM shipped sh
          WHERE sh.partkey IN (SELECT p_partkey FROM part
                               WHERE p_name LIKE 'small%')
            AND sh.qty > 50)
    ORDER BY s.s_name
    """,
    survey_ref="§2.5 TPC-H Q20 shape (nested semi-joins: suppliers whose "
    "1996 shipments of small-named parts exceed a volume threshold; "
    "partsupp availqty -> shipped-quantity aggregate)",
    tags=("sql", "tpch", "subquery", "join"),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    small = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select(F.col("p_partkey").alias("small_key"))
    )
    shipped = (
        li.join(F.broadcast(small), li["l_partkey"] == F.col("small_key"), "left_semi")
        .groupBy(F.col("l_suppkey").alias("suppkey"), F.col("l_partkey").alias("partkey"))
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"], "left_semi")
        .join(F.broadcast(shipped), s["s_suppkey"] == F.col("suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND n.n_name IN ('NATION_2', 'NATION_3')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    survey_ref="§2.5 TPC-H Q21 shape (multi-correlated EXISTS/NOT EXISTS: "
    "the only-late supplier in multi-supplier failed orders; lateness = "
    "shipdate > orderdate + 90 days in lieu of receipt/commit dates)",
    tags=("sql", "tpch", "subquery", "join", "topn"),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT-EXISTS without correlated re-scans: per-order supplier
    stats (distinct suppliers, distinct LATE suppliers) are ONE
    aggregation on l_orderkey; a late line qualifies iff its order has
    >= 2 suppliers and exactly 1 late supplier (which is then necessarily
    the line's own). Lineitem is scanned once and shuffled once — the
    textbook plan scans it three times."""
    o_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lx = li.join(o_f, li["l_orderkey"] == o_f["o_orderkey"]).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    stats = lx.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    qualified = stats.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select(F.col("l_orderkey").alias("q_orderkey"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_3")
    )
    sn = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"], "left_semi")
    return (
        lx.filter(F.col("is_late"))
        .join(qualified, F.col("l_orderkey") == F.col("q_orderkey"), "left_semi")
        .join(F.broadcast(sn), F.col("l_suppkey") == sn["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
