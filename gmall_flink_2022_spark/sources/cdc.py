"""CDC envelope parsing + normalization (SURVEY §2.1 S1/S2).

Reference: function/CustomerDeserialization.java:19-69 turns a Debezium
SourceRecord into ``{database, tableName, before, after, type}`` and
normalizes ``create`` -> ``insert`` (:56-58). OSS Spark has no built-in CDC
source, so the engine consumes the same envelope from any feed (Kafka topic /
changelog files) and parses it declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

ENVELOPE = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("tableName", T.StringType()),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("type", T.StringType()),
    ]
)


def parse_cdc(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON envelope lines -> typed columns; ``create`` normalized to
    ``insert`` exactly as CustomerDeserialization.java:56-58 does."""
    parsed = raw.select(F.from_json(F.col(value_col), ENVELOPE).alias("e"))
    return parsed.select(
        F.col("e.database").alias("database"),
        F.col("e.tableName").alias("tableName"),
        F.col("e.before").alias("before"),
        F.col("e.after").alias("after"),
        F.when(F.col("e.type") == "create", F.lit("insert"))
        .otherwise(F.col("e.type"))
        .alias("type"),
    )


def filter_deletes(cdc: DataFrame) -> DataFrame:
    """Drop delete ops before routing — dwd/BaseDBApp.java:32-33 (P2)."""
    return cdc.filter(F.col("type") != "delete")


def materialize_latest(
    cdc: DataFrame, key_field: str, seq_field: str, payload_fields: list[str]
) -> DataFrame:
    """Changelog compaction: collapse a parsed CDC envelope stream to the
    LATEST ROW IMAGE per (tableName, key), with deletes applied as
    tombstones — the ods->dwd materialization the reference performs by
    replaying the binlog into Phoenix upserts (dwd/BaseDBApp.java sink
    path; DimSinkFunction.java upsert-per-change). Here it is one
    declarative aggregation instead of row-at-a-time upserts.

    ``key_field``/``seq_field`` name entries of the envelope's row-image
    map (``after`` for upserts, ``before`` for deletes — a Debezium
    delete carries only the old image, so its seq EQUALS the last
    upsert's seq). ``payload_fields`` are the image columns to surface.

    Spark-first shape: max(struct(seq, op_rank, ...)) per key — an
    order-independent argmax that map-side PARTIAL-aggregates, so the
    single shuffle moves one pre-reduced row per key per input partition
    (a window row_number() would sort every version of every key through
    the exchange instead). ``op_rank`` (delete=1, upsert=0) is the
    second struct field so a delete beats the upsert it tombstones when
    their seqs tie — the realistic Debezium shape above; a plain
    lexicographic op comparison would rank 'delete' < 'insert'/'update'
    and silently resurrect the deleted row. Keys whose winning op is a
    delete drop out after the aggregate. This is exactly the
    log-structured compaction merge (Delta/Hudi snapshot read),
    expressed as a groupBy.
    """
    img = F.coalesce(F.col("after"), F.col("before"))
    keyed = cdc.select(
        "tableName",
        img[key_field].alias("pk"),
        F.struct(
            img[seq_field].cast("long").alias("seq"),
            F.when(F.col("type") == "delete", F.lit(1))
            .otherwise(F.lit(0))
            .alias("op_rank"),
            F.col("type").alias("op"),
            *[F.col("after")[f].alias(f) for f in payload_fields],
        ).alias("ver"),
    )
    top = keyed.groupBy("tableName", "pk").agg(F.max("ver").alias("ver"))
    return top.filter(F.col("ver.op") != "delete").select(
        "tableName",
        "pk",
        F.col("ver.seq").alias("last_seq"),
        *[F.col(f"ver.{f}").alias(f) for f in payload_fields],
    )
