"""Streaming execution helpers.

The reference wires layers through Kafka and runs each as a forever-job;
our tests (and the driver's batch-shaped correctness gate) run the same
streaming plans to completion with ``availableNow`` triggers and a memory
sink — identical code path to production (Kafka source, real trigger),
different endpoints. Multi-sink fan-out (SURVEY §7.3 #3) = one query per
sink over the shared source; with Kafka/files the replay is free, no
persist() needed.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession


def run_stream_to_table(
    sdf: DataFrame,
    name: str,
    output_mode: str = "append",
    checkpoint: str | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into an
    in-memory table; returns the batch DataFrame of the result."""
    spark: SparkSession = sdf.sparkSession
    ckpt = checkpoint or tempfile.mkdtemp(prefix="gmall_ckpt_")
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
