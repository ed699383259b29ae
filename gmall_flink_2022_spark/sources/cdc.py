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
