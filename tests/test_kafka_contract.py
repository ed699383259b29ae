"""Kafka endpoint option-contract tests (SURVEY §2.1 S3-S6; VERDICT r2
ask #7). No broker exists in this container, so these pin the config
assembly and the per-row sink projection — the parts that are code, not
connectivity. Reference: utils/MyKafkaUtil.java:18-58."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_2022_spark.sources.kafka import (
    sink_options,
    sink_projection,
    source_options,
)


def test_source_options_contract():
    opts = source_options("b1:9092,b2:9092", "ods_base_log")
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "ods_base_log"
    # latest-offset default mirrors the reference's scan.startup.mode
    assert opts["startingOffsets"] == "latest"
    assert opts["failOnDataLoss"] == "true"
    # explicit replay start (the backfill path)
    assert source_options("b", "t", "earliest")["startingOffsets"] == "earliest"


def test_sink_options_fixed_vs_dynamic_topic():
    fixed = sink_options("b:9092", "/ck", topic="dwd_page_log")
    assert fixed["topic"] == "dwd_page_log"
    assert fixed["checkpointLocation"] == "/ck"
    # dynamic routing: NO topic option — the sink must read the per-row
    # topic column instead (S5 contract)
    dyn = sink_options("b:9092", "/ck")
    assert "topic" not in dyn
    assert dyn["kafka.bootstrap.servers"] == "b:9092"


def test_sink_projection_value_cast_and_topic_column(spark):
    df = spark.createDataFrame(
        [(1, '{"id":1}', "dwd_order_info"), (2, '{"id":2}', "dwd_payment_info")],
        "k long, payload string, sink_table string",
    )
    # fixed-topic shape: value only, already-string cast is stable
    out = sink_projection(df, value_col="payload")
    assert out.columns == ["value"]
    assert out.schema["value"].dataType.simpleString() == "string"
    # dynamic shape: per-row topic column carried through verbatim
    routed = sink_projection(df, value_col="payload", topic_col="sink_table")
    assert set(routed.columns) == {"value", "topic"}
    got = {r["topic"] for r in routed.collect()}
    assert got == {"dwd_order_info", "dwd_payment_info"}
    # non-string value columns are cast, not rejected (the reference
    # serializes every payload to bytes the same way)
    nums = sink_projection(df.select(F.col("k").alias("v")), value_col="v")
    assert nums.schema["value"].dataType.simpleString() == "string"
    assert {r["value"] for r in nums.collect()} == {"1", "2"}


def test_kafka_sink_builds_writer_without_broker(spark):
    """Assembling the writer (format/options) must not require a broker —
    only .start() touches the network."""
    from gmall_flink_2022_spark.sources.kafka import kafka_sink

    sdf = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    writer = kafka_sink(
        sdf.select(F.col("value").cast("string").alias("value")),
        brokers="unreachable:9092",
        checkpoint="/tmp/never-used",
        topic="t",
    )
    assert writer is not None  # no connection attempted at build time
