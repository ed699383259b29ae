"""Streaming execution helpers.

The reference wires layers through Kafka and runs each as a forever-job;
our tests (and the driver's batch-shaped correctness gate) run the same
streaming plans to completion with ``availableNow`` triggers and a memory
sink — identical code path to production (Kafka source, real trigger),
different endpoints. Multi-sink fan-out (SURVEY §7.3 #3) = one query per
sink over the shared source; with Kafka/files the replay is free, no
persist() needed.

State partitioning: a stateful streaming query materializes ONE state
store instance per shuffle partition, each committing a delta file to
the checkpoint every micro-batch — so the partition count must be sized
to STATE VOLUME, not inherited from the batch-oriented session default.
At bench SFs the keyed state is a few MB: 32 partitions means 32 ×
(stores + commit files) per stateful operator per batch, and the commit
overhead dominates wall time ~3×. In production with 10^8+ keys you
raise it (it is fixed at the query's FIRST start and persisted in the
checkpoint — choose for peak state, it cannot change across restarts
without a new checkpoint). ``state_partitions`` below pins
``spark.sql.shuffle.partitions`` for the lifetime of the query and
restores the session value afterwards.
"""

from __future__ import annotations

import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

#: Local-mode default sized for bench/driver SFs (state ≪ 1 GB). A real
#: deployment passes an explicit value sized to keys × state row width.
DEFAULT_STATE_PARTITIONS = 8


@contextmanager
def _pinned_shuffle_partitions(spark: SparkSession, n: int | None):
    if n is None:
        yield
        return
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def run_stream_to_table(
    sdf: DataFrame,
    name: str,
    output_mode: str = "append",
    checkpoint: str | None = None,
    state_partitions: int | None = DEFAULT_STATE_PARTITIONS,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into an
    in-memory table; returns the batch DataFrame of the result.

    ``state_partitions`` sizes the stateful operators' shuffle (see
    module docstring); ``None`` inherits the session setting."""
    spark: SparkSession = sdf.sparkSession
    ckpt = checkpoint or tempfile.mkdtemp(prefix="gmall_ckpt_")
    with _pinned_shuffle_partitions(spark, state_partitions):
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
