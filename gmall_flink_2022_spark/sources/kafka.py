"""Kafka endpoints (SURVEY §2.1 S3-S6) — the production wiring.

The reference consumes/produces every layer through Kafka
(utils/MyKafkaUtil.java:18-58). These helpers build the equivalent
Structured Streaming sources/sinks. No broker exists in the test
container, so tests exercise the same transformations over file sources
(sources/io.py) — the only difference is this module's `format("kafka")`
endpoints, kept thin precisely so that swap is config, not code. The
option assembly and the per-row projection are factored into pure
functions (`source_options` / `sink_options` / `sink_projection`) so
the config surface is pinned by broker-free unit tests
(tests/test_kafka_contract.py).

Semantics notes (documented deltas, SURVEY §7.3 #5):
- consumer: `startingOffsets=latest` mirrors the reference's
  `scan.startup.mode=latest-offset`; groupId is not a Spark concept
  (offsets live in the checkpoint, which is stronger).
- producer: Spark's Kafka sink is at-least-once per micro-batch; the
  reference's one EXACTLY_ONCE producer (MyKafkaUtil.java:26-35) has no
  OSS-Spark equivalent — idempotent/transactional downstream reads are
  the substitute (streaming/eos.py proves the pattern). The reference
  itself runs with checkpointing disabled, so its effective guarantee
  is also at-least-once.
- dynamic topic per row (S5): the sink honors a `topic` column when no
  fixed topic option is set — same contract as the reference's
  KafkaSerializationSchema choosing a topic per record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def source_options(
    brokers: str, topic: str, starting_offsets: str = "latest"
) -> dict[str, str]:
    """Reader option map (MyKafkaUtil.getKafkaConsumer analog): which
    broker set, which subscription, where to start when there is no
    checkpoint yet. Offsets after the first trigger always come from the
    checkpoint, which supersedes startingOffsets."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # fail fast on topic deletion/offset loss instead of silently
        # re-reading from earliest (data duplication at the sink)
        "failOnDataLoss": "true",
    }


def sink_options(
    brokers: str, checkpoint: str, topic: str | None = None
) -> dict[str, str]:
    """Writer option map. A fixed ``topic`` option wins over any topic
    column; omit it (None) for S5 per-row dynamic routing."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "checkpointLocation": checkpoint,
    }
    if topic is not None:
        opts["topic"] = topic
    return opts


def sink_projection(
    df: DataFrame, value_col: str = "value", topic_col: str | None = None
) -> DataFrame:
    """The exact frame handed to the Kafka writer: a string ``value``
    column, plus a ``topic`` column when per-row routing is requested
    (the KafkaSerializationSchema-chooses-a-topic contract). Pure
    DataFrame transform — unit-testable without a broker."""
    cols = [F.col(value_col).cast("string").alias("value")]
    if topic_col is not None:
        cols.append(F.col(topic_col).alias("topic"))
    return df.select(*cols)


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
        .options(**source_options(brokers, topic, starting_offsets))
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
    return (
        sink_projection(df, value_col, topic_col)
        .writeStream.format("kafka")
        .options(**sink_options(brokers, checkpoint, topic))
    )
