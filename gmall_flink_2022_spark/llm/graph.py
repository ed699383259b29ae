"""Iterative graph analytics over document-similarity graphs.

dup_clusters (llm/dedup.py) covers connected components; this module
adds PageRank — the other canonical iterative bulk-synchronous
algorithm — rendered Spark-first: each iteration is one join + one
aggregation on the edge list, lineage truncated per round, no driver
loops over data (the only driver-side state is the iteration counter).

Exactness design: textbook PageRank accumulates doubles, whose sum
order varies with partitioning — unusable for hash-checked oracles.
Here ranks are FIXED-POINT integers (scale 10^12) and every step uses
floor integer division:

    contrib(u)  = pr(u) div deg(u)
    pr'(v)      = (15 * S) div (100 * N)  +  (85 * sum contribs) div 100

Integer sums are order-independent and `div` floors identically on the
JVM and DuckDB (non-negative operands), so after any fixed number of
iterations the ranks are bit-identical across engines and partitionings.
The floor truncation loses < 1 fixed-point ulp per step versus real
PageRank — irrelevant at scale 10^12 — and total mass leakage is
bounded by N ulps per iteration.

At 100 TB: per iteration ONE shuffle on dst (the contribution
aggregation; the rank-side join rides the src partitioning), state is
one long per node, and the round count is a fixed parameter, not
data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 1_000_000_000_000  # fixed-point scale (10^12)


def pagerank(
    pairs: DataFrame, iterations: int = 5, damping_pct: int = 85
) -> DataFrame:
    """Fixed-point PageRank over an undirected pair list (id_a, id_b).

    Returns (id, pr) with pr the scale-10^12 integer rank after
    ``iterations`` synchronous updates from a uniform start. Isolated
    nodes never appear (they carry no edges); dangling nodes cannot
    occur (both directions of every pair are materialized).
    """
    e = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("id"), "deg")
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
    pr = (
        nodes.crossJoin(F.broadcast(n_df))
        .select("id", "deg", "n", F.expr(f"{PR_SCALE} div n").alias("pr"))
        .localCheckpoint(eager=True)
    )
    teleport = f"({(100 - damping_pct) * PR_SCALE} div (100 * n))"
    spread = f"(({damping_pct} * coalesce(sumc, 0)) div 100)"
    for _ in range(iterations):
        contrib = (
            e.join(pr, e["src"] == pr["id"])
            .select("dst", F.expr("pr div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("sumc"))
        )
        pr = (
            pr.join(contrib, pr["id"] == contrib["dst"], "left")
            .select(
                "id",
                "deg",
                "n",
                F.expr(f"{teleport} + {spread}").cast("long").alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select("id", "pr")
