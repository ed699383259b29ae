"""Kafka endpoints (SURVEY §2.1 S3-S6) — the production wiring.

The reference consumes/produces every layer through Kafka
(utils/MyKafkaUtil.java:18-58). These helpers build the equivalent
Structured Streaming sources/sinks. No broker exists in the test
container, so tests exercise the same transformations over file sources
(sources/io.py) — the only difference is this module's `format("kafka")`
endpoints, kept thin precisely so that swap is config, not code.

Semantics notes (documented deltas, SURVEY §7.3 #5):
- consumer: `startingOffsets=latest` mirrors the reference's
  `scan.startup.mode=latest-offset`; groupId is not a Spark concept
  (offsets live in the checkpoint, which is stronger).
- producer: Spark's Kafka sink is at-least-once per micro-batch; the
  reference's one EXACTLY_ONCE producer (MyKafkaUtil.java:26-35) has no
  OSS-Spark equivalent — idempotent/transactional downstream reads are
  the substitute. The reference itself runs with checkpointing disabled,
  so its effective guarantee is also at-least-once.
- dynamic topic per row (S5): the sink honors a `topic` column when no
  fixed topic option is set — same contract as the reference's
  KafkaSerializationSchema choosing a topic per record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """readStream from a topic; value cast to string (the reference's
    SimpleStringSchema)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def kafka_sink(
    df: DataFrame,
    brokers: str,
    checkpoint: str,
    topic: str | None = None,
    value_col: str = "value",
    topic_col: str | None = None,
):
    """writeStream to Kafka. Fixed ``topic``, or per-row ``topic_col``
    (S5 dynamic routing: one query fans out to many topics)."""
    out = df.select(F.col(value_col).cast("string").alias("value"))
    if topic_col is not None:
        out = out.withColumn("topic", df[topic_col])
    writer = (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
    )
    if topic is not None:
        writer = writer.option("topic", topic)
    return writer
