"""Multi-sink fan-out (SURVEY §7.3 #3, P3/S5): one source, several sinks —
each sink is its own streaming query over the shared source (replay is free
for file/Kafka sources); the per-row dynamic-topic sink (S5) becomes a
partitioned write on the routed `sink_table` column."""

from __future__ import annotations

import json
import os

from pyspark.sql import Row, functions as F

from gmall_flink_2022_spark.operators.dwd import route_cdc
from gmall_flink_2022_spark.sources.cdc import filter_deletes, parse_cdc
from gmall_flink_2022_spark.sources.logs import parse_logs


def test_three_sinks_one_source(spark, tmp_path):
    lines = [
        json.dumps({"common": {"mid": "m1"}, "start": {"entry": "icon"}, "ts": 1}),
        json.dumps({"common": {"mid": "m1"},
                    "page": {"page_id": "home", "during_time": 5},
                    "displays": [{"item": "3", "order": 1}], "ts": 2}),
    ]
    in_dir = str(tmp_path / "in")
    spark.createDataFrame([Row(value=s) for s in lines]).coalesce(1).write.json(in_dir)
    raw = spark.readStream.schema("value string").json(in_dir)
    parsed = parse_logs(raw)
    clean = parsed.filter(~F.col("_dirty"))

    sinks = {
        "start": clean.filter(F.col("start").isNotNull()),
        "page": clean.filter(F.col("start").isNull()),
        "display": clean.filter(F.col("start").isNull())
        .select(F.col("ts"), F.explode("displays").alias("d")),
    }
    queries = []
    for name, df in sinks.items():
        out = str(tmp_path / f"out_{name}")
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        queries.append((name, out, q))
    for _, _, q in queries:
        q.awaitTermination()
    counts = {n: spark.read.parquet(o).count() for n, o, _ in queries}
    assert counts == {"start": 1, "page": 1, "display": 1}


def test_dynamic_topic_partitioned_write(spark, tmp_path):
    """S5: the exactly-once dynamic-topic producer becomes a write
    partitioned by the routed sink_table — one directory (≙ topic) per
    route, written from a single query."""
    events = [
        {"database": "g", "tableName": "order_info", "before": {},
         "after": {"id": "1"}, "type": "insert"},
        {"database": "g", "tableName": "payment_info", "before": {},
         "after": {"id": "2"}, "type": "insert"},
        {"database": "g", "tableName": "order_info", "before": {},
         "after": {"id": "3"}, "type": "insert"},
    ]
    cfg = spark.createDataFrame(
        [("order_info", "insert", "kafka", "dwd_order_info", "id", "id", None),
         ("payment_info", "insert", "kafka", "dwd_payment_info", "id", "id", None)],
        "source_table string, operate_type string, sink_type string, "
        "sink_table string, sink_columns string, sink_pk string, sink_extend string",
    )
    raw = spark.createDataFrame([Row(value=json.dumps(e)) for e in events])
    routed = route_cdc(filter_deletes(parse_cdc(raw)), cfg)
    out = str(tmp_path / "topics")
    routed.withColumn("payload", F.to_json(F.col("after"))).select(
        "sink_table", "payload"
    ).write.partitionBy("sink_table").parquet(out)

    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("sink_table=")
    )
    assert dirs == ["sink_table=dwd_order_info", "sink_table=dwd_payment_info"]
    oi = spark.read.parquet(os.path.join(out, "sink_table=dwd_order_info"))
    assert oi.count() == 2


def test_lsh_knn_recall(spark, sf_dir):
    """The ANN scale path must find most of the true neighbors on this
    data (recall vs brute force); exactness is not expected."""
    from gmall_flink_2022_spark.llm.similarity import knn_bruteforce, knn_lsh

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(embs, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_lsh(embs, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"LSH recall too low: {recall:.2f}"