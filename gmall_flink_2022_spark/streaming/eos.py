"""Effective exactly-once foreachBatch sink (SURVEY §2.6 W8).

The reference's only EOS machinery is a transactional Kafka producer
(utils/MyKafkaUtil.java:26-35, Semantic.EXACTLY_ONCE, used by
dwd/BaseDBApp.java:67-75). Structured Streaming's contract is different:
sources replay and sinks must be idempotent — a micro-batch that failed
before its checkpoint commit is re-delivered WITH THE SAME batch_id. This
sink turns that at-least-once delivery into effective exactly-once with
the standard two-phase pattern:

1. data for batch N goes to its own partition directory ``batch=N`` in
   OVERWRITE mode — a replay of batch N rewrites the same files, it can
   never append duplicates;
2. a commit marker ``_commits/N`` is written only after the data lands —
   readers union exclusively committed batch dirs, so a crash between
   write and mark leaves invisible (and replay-overwritten) garbage,
   never partial output.

Readers resolve per-key versions with max_by(batch) — last writer wins
across micro-batches, which is exactly the update-mode aggregate
contract (each trigger re-emits changed keys with their new totals).

At 100 TB this is the Delta/Iceberg ``txnAppId/txnVersion`` idempotent-
write pattern with the commit log rendered as marker files; per-batch
work is one partition-dir write, readers prune to committed partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F


class IdempotentBatchStore:
    """Batch-id-keyed idempotent store for foreachBatch sinks."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.commit_dir = os.path.join(root, "_commits")
        os.makedirs(self.commit_dir, exist_ok=True)

    # ------------------------------------------------------------- write side
    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """The foreachBatch function. Safe under replay: same batch_id
        -> same directory, overwrite mode -> no duplicates possible."""
        if self.is_committed(batch_id):
            # replay of a fully committed batch: pure no-op (the Kafka
            # transactional-producer equivalent of an aborted duplicate txn)
            return
        out = os.path.join(self.data_dir, f"batch={batch_id}")
        df.write.mode("overwrite").parquet(out)
        with open(os.path.join(self.commit_dir, str(batch_id)), "w") as fh:
            fh.write("ok")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self.commit_dir, str(batch_id)))

    def committed_ids(self) -> list[int]:
        return sorted(int(n) for n in os.listdir(self.commit_dir))

    # -------------------------------------------------------------- read side
    def read_committed(self) -> DataFrame:
        """Union of committed batch partitions (append-mode contract)."""
        ids = self.committed_ids()
        if not ids:
            raise ValueError(
                f"IdempotentBatchStore at {self.root!r} has no committed "
                "batches (empty-input stream commits zero); guard with "
                "committed_ids() before reading"
            )
        df = self.spark.read.option("basePath", self.data_dir).parquet(
            *[os.path.join(self.data_dir, f"batch={i}") for i in ids]
        )
        return df

    def read_latest(self, key_cols: list[str]) -> DataFrame:
        """Last-writer-wins view (update-mode contract): one row per key,
        from the highest committed batch that wrote it."""
        df = self.read_committed()
        payload = [c for c in df.columns if c not in (*key_cols, "batch")]
        w = W.partitionBy(*key_cols).orderBy(F.desc("batch"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*key_cols, *payload)
        )
