"""Salting rewrites must be semantically invisible: salted results equal
direct results exactly (determinism: hash-salt, no rand())."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_2022_spark.operators.skew import salted_agg, salted_join, with_salt
from gmall_flink_2022_spark.sources.io import read_table


def test_salted_agg_equals_direct(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").withColumn(
        "price_dec", F.col("l_extendedprice").cast("decimal(18,2)")
    )
    direct = (
        li.groupBy("l_returnflag")
        .agg(F.sum("price_dec").alias("revenue_dec"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    salted = salted_agg(
        li, ["l_returnflag"], {"price_dec": "revenue_dec"}, count_alias="n", buckets=16
    ).collect()
    d = sorted((r["l_returnflag"], str(r["revenue_dec"]), r["n"]) for r in direct)
    s = sorted((r["l_returnflag"], str(r["revenue_dec"]), r["n"]) for r in salted)
    assert d == s


def test_salted_join_equals_direct(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    direct = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "l_linenumber", "p_brand")
        .collect()
    )
    salted = salted_join(li, part, "l_partkey", "p_partkey", buckets=8).select(
        "l_orderkey", "l_linenumber", "p_brand"
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, salted))


def test_salt_is_deterministic(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    a = with_salt(li, 8).select("_salt").groupBy("_salt").count().collect()
    b = with_salt(li, 8).select("_salt").groupBy("_salt").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r["_salt"] < 8 for r in a)

def test_prune_rare_is_result_identical(spark, sf_dir):
    from gmall_flink_2022_spark.llm.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = sorted(
        (r["id_a"], r["id_b"], r["common"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    )
    pruned = sorted(
        (r["id_a"], r["id_b"], r["common"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, prune_rare=True
        ).collect()
    )
    assert base == pruned
