"""SQL DDL surface (SURVEY §2.1 S6/S8, §3.3): the Flink
`CREATE TABLE ... WITH (connector...)` declarative path as Spark SQL DDL
over parquet locations — table created by DDL text, queried by SQL text."""

from __future__ import annotations


def test_create_table_using_parquet(spark, sf_dir):
    spark.sql("DROP VIEW IF EXISTS orders_ddl")
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY VIEW orders_ddl
        USING parquet
        OPTIONS (path '{sf_dir}/orders.parquet')
        """
    )
    out = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders_ddl GROUP BY o_orderpriority
        """
    ).collect()
    assert sum(r["n"] for r in out) == spark.sql(
        "SELECT count(*) AS c FROM orders_ddl"
    ).collect()[0]["c"]
    assert len(out) == 5


def test_ddl_with_computed_column_and_watermark_equiv(spark, sf_dir):
    """The reference DDL adds a computed column `rt AS TO_TIMESTAMP(...)`
    and a WATERMARK clause (ProvinceStatsSqlApp.java:29-30). Spark's
    equivalent: a view with the computed column; the watermark is a
    streaming-DF property (withWatermark), applied in streaming_plans."""
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY VIEW lineitem_rt AS
        SELECT *, date_trunc('day', l_shipdate) AS rt
        FROM parquet.`{sf_dir}/lineitem.parquet`
        """
    )
    row = spark.sql(
        "SELECT count(*) AS n FROM lineitem_rt WHERE rt IS NOT NULL"
    ).collect()[0]
    assert row["n"] > 0