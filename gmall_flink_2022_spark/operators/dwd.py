"""DWD layer: row-level routing / splitting / pruning (SURVEY §2.2).

Spark-first rendering of:
- P3 log splitter (dwd/BaseLogApp.java:74-104): one parsed stream -> three
  filtered derivatives (start / page / display). In Spark the "side outputs"
  are simply independent filters over one shared plan; Catalyst reuses the
  scan, and in streaming mode each sink is its own query over the shared
  source (replay is cheap for Kafka/files).
- P5 dynamic router (function/TableProcessFunction.java:62-80): the broadcast
  MapState keyed `sourceTable-operateType` becomes a **broadcast hash join**
  against the routing-config DataFrame — re-evaluated every micro-batch, which
  subsumes the reference's config-refresh machinery.
- P4 column pruning by config (function/TableProcessFunction.java:133-139):
  `sink_columns` csv -> map_filter over the generic `after` map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def split_streams(df: DataFrame, routes: dict[str, Column]) -> dict[str, DataFrame]:
    """Multiplex one stream into named derivatives by predicate.

    Equivalent of Flink side-outputs (dwd/BaseLogApp.java:77-100): each
    derivative is a filter over the same lineage, no materialization here.
    """
    return {name: df.filter(pred) for name, pred in routes.items()}


def split_log_streams(logs: DataFrame) -> dict[str, DataFrame]:
    """The reference's exact 3-way log split + display explode
    (dwd/BaseLogApp.java:74-104): `start` present -> start stream; else page
    stream; page rows with displays -> one row per display item, enriched
    with the page_id (display enrichment at :91)."""
    start = logs.filter(F.col("start").isNotNull())
    page = logs.filter(F.col("start").isNull())
    display = (
        page.filter(F.col("displays").isNotNull())
        .select(
            F.col("common"),
            F.col("ts"),
            F.col("page.page_id").alias("page_id"),
            F.explode("displays").alias("display"),
        )
        .select("common", "ts", "page_id", "display.*")
    )
    return {"start": start, "page": page, "display": display}


def route_cdc(cdc: DataFrame, config: DataFrame) -> DataFrame:
    """Broadcast-join the CDC stream with the routing config on
    (tableName, type) — the Spark-native form of J5/P5 broadcast state
    (dwd/BaseDBApp.java:50-61). Rows with no route are dropped, matching
    the reference's "filtered out" branch (TableProcessFunction.java:74-78).

    Output keeps the envelope plus sink_type / sink_table / sink_columns so a
    downstream fan-out can write Kafka facts vs dim-store upserts per row
    (per-row dynamic topic = the reference's S5 KafkaSerializationSchema).
    """
    return cdc.join(
        F.broadcast(config),
        on=[
            cdc["tableName"] == config["source_table"],
            cdc["type"] == config["operate_type"],
        ],
        how="inner",
    ).drop("source_table", "operate_type")


def prune_columns(routed: DataFrame, after_col: str = "after") -> DataFrame:
    """Keep only the configured sink_columns keys inside the `after` map —
    function/TableProcessFunction.java:133-139 rendered as a map_filter
    (JVM-side, no Python round-trip)."""
    cols = F.split(F.col("sink_columns"), ",")
    return routed.withColumn(
        after_col,
        F.map_filter(F.col(after_col), lambda k, _v: F.array_contains(cols, k)),
    )
