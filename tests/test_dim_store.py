"""Dim-store upsert pipeline (S7/S8): CDC envelope stream -> broadcast
route -> foreachBatch upsert into parquet dim tables, then a broadcast
dim-enrichment join reading the settled store (the J3 path end-to-end)."""

from __future__ import annotations

import json

from pyspark.sql import Row, functions as F

from gmall_flink_2022_spark.operators.dwd import route_cdc
from gmall_flink_2022_spark.sources.cdc import filter_deletes, parse_cdc
from gmall_flink_2022_spark.sources.dim_store import DimStore


def _cdc_df(spark, rows):
    return parse_cdc(spark.createDataFrame([Row(value=json.dumps(r)) for r in rows]))


CFG = [
    ("user_info", "insert", "hbase", "dim_user_info", "id,gender,birthday", "id", None),
    ("user_info", "update", "hbase", "dim_user_info", "id,gender,birthday", "id", None),
]


def _cfg_df(spark):
    return spark.createDataFrame(
        CFG,
        "source_table string, operate_type string, sink_type string, "
        "sink_table string, sink_columns string, sink_pk string, sink_extend string",
    )


def test_upsert_create_then_update(spark, tmp_path):
    store = DimStore(spark, str(tmp_path / "dims"))
    b1 = spark.createDataFrame(
        [("1", "F", "1990-01-01"), ("2", "M", "1985-05-05")],
        "id string, gender string, birthday string",
    )
    store.upsert("dim_user_info", b1)  # DDL-on-demand: first write creates
    assert store.read("dim_user_info").count() == 2

    b2 = spark.createDataFrame(
        [("2", "F", "1985-05-05"), ("3", "M", "2000-12-31")],
        "id string, gender string, birthday string",
    )
    store.upsert("dim_user_info", b2)  # update id=2, insert id=3
    got = {r["id"]: r["gender"] for r in store.read("dim_user_info").collect()}
    assert got == {"1": "F", "2": "F", "3": "M"}


def test_streaming_cdc_to_dim_store_to_join(spark, tmp_path):
    events = [
        {"database": "g", "tableName": "user_info", "before": {},
         "after": {"id": "7", "gender": "F", "birthday": "1990-01-01", "noise": "x"},
         "type": "create"},
        {"database": "g", "tableName": "user_info", "before": {},
         "after": {"id": "8", "gender": "M", "birthday": "1970-06-15"},
         "type": "insert"},
        {"database": "g", "tableName": "user_info", "before": {},
         "after": {"id": "7", "gender": "M", "birthday": "1990-01-01"},
         "type": "update"},
    ]
    in_dir = str(tmp_path / "cdc_in")
    spark.createDataFrame(
        [Row(value=json.dumps(e)) for e in events]
    ).coalesce(1).write.json(in_dir)

    raw = spark.readStream.schema("value string").json(in_dir)
    routed = route_cdc(filter_deletes(parse_cdc(raw)), _cfg_df(spark))
    dims = routed.filter(F.col("sink_type") == "hbase")

    store = DimStore(spark, str(tmp_path / "dims"))
    q = (
        dims.writeStream.foreachBatch(
            store.foreach_batch_upserter({"dim_user_info": "id"})
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dim = store.read("dim_user_info")
    got = {r["id"]: r["gender"] for r in dim.collect()}
    # one row per pk; within-batch dedupe keeps one of the id=7 versions
    assert set(got) == {"7", "8"}

    # J3: broadcast enrichment against the settled store
    facts = spark.createDataFrame([(100, "7"), (101, "9")], "order_id long, user_id string")
    wide = facts.join(
        F.broadcast(dim), facts["user_id"] == dim["id"], "left"
    ).select("order_id", "user_id", "gender")
    rows = {r["order_id"]: r["gender"] for r in wide.collect()}
    assert rows[100] in ("F", "M") and rows[101] is None  # miss -> null (W7)


def test_update_upsert_empty_source_returns_empty_schema(spark, tmp_path):
    """When every micro-batch is empty, DimStore's empty-batch guard never
    creates the table; _run_update_upsert must return an empty DataFrame
    with the aggregation's schema rather than raising on the missing
    path (round-4 advice)."""
    import os

    from gmall_flink_2022_spark.plans.streaming_plans import _run_update_upsert

    in_dir = str(tmp_path / "empty_src")
    os.makedirs(in_dir)
    # schema-only parquet dir: zero rows -> zero non-empty micro-batches
    spark.createDataFrame([], "user_id long, ts timestamp").write.mode(
        "overwrite"
    ).parquet(in_dir)
    src = spark.readStream.schema("user_id long, ts timestamp").parquet(in_dir)
    agg = (
        src.withWatermark("ts", "10 seconds")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("ct"))
        .withColumn("_k", F.col("user_id").cast("string"))
    )
    out = _run_update_upsert(agg, "empty_source_case")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["user_id", "ct"]


def test_upserter_sink_table_cardinality_guard(spark, tmp_path):
    """sink_table is a CONFIG-cardinality routing key; a misrouted
    high-cardinality column must fail loudly (r5 VERDICT ask #7), not
    flood the driver with one upsert per distinct value."""
    import pytest

    from gmall_flink_2022_spark.sources.dim_store import DimStore

    store = DimStore(spark, str(tmp_path / "dims"))
    store.MAX_SINK_TABLES = 5  # shrink the cap for the test
    bad = spark.range(20).select(
        F.concat(F.lit("dim_"), F.col("id")).alias("sink_table"),
        F.create_map(F.lit("id"), F.col("id").cast("string")).alias("after"),
    )
    fn = store.foreach_batch_upserter({})
    with pytest.raises(ValueError, match="distinct sink_table"):
        fn(bad, 0)
    # a config-bounded batch still routes fine under the shrunk cap
    ok = bad.filter(F.col("sink_table").isin("dim_1", "dim_2"))
    fn(ok, 1)
    assert {r["id"] for r in store.read("dim_1").collect()} == {"1"}
