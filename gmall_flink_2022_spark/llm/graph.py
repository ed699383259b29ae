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


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected pair
    list (id_a, id_b): (id, n_triangles) for every node that closes at
    least one triangle. Triangle density over the near-dup graph is the
    standard cluster-cohesion diagnostic (a dup "cluster" whose members
    are chained by transitivity but share no triangles is usually
    template drift, not true duplication).

    Algorithm: the degree-ordered wedge join (the MapReduce triangle
    classic, Suri & Vassilvitskii 2011). Canonicalize edges to a < b,
    then ORIENT each edge from its lower-(degree, id) endpoint to the
    higher one. Every triangle has exactly one node whose two incident
    edges both point AWAY (its minimum-(degree, id) corner), so counting
    closed wedges src -> {v, w} with an edge v—w counts each triangle
    exactly once. Orientation bounds wedge fan-out by each node's
    OUT-degree, which the ordering caps at O(sqrt(m)) — the hub that
    breaks the naive wedge join generates almost no wedges because its
    edges point INTO it.

    100 TB posture: two self-joins on node keys (wedge build, closure
    probe) plus degree aggregation — all shuffles on natural keys, no
    driver iteration, no Python. Intermediate wedge volume is
    O(m^{3/2}) worst case, the known lower bound for exact triangle
    enumeration.
    """
    # materialize the edge list once: it re-appears ~8x in the wedge plan
    # (degrees, both orientation sides, closure probe), and each copy would
    # otherwise replay the full candidate-generation lineage that produced
    # the pairs — same lineage-truncation move as pagerank above
    und = (
        pairs.select(
            F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (
        und.join(da, F.col("a") == F.col("da.id"))
        .join(db, F.col("b") == F.col("db.id"))
        .select(
            F.when(
                (F.col("da.deg") < F.col("db.deg"))
                | ((F.col("da.deg") == F.col("db.deg")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            )
            .otherwise(F.struct(F.col("b").alias("src"), F.col("a").alias("dst")))
            .alias("e")
        )
        .select("e.src", "e.dst")
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(o2, F.col("o1.src") == F.col("o2.src")).filter(
        F.col("o1.dst") < F.col("o2.dst")
    )
    tri = wedges.join(
        und.alias("cl"),
        (F.col("o1.dst") == F.col("cl.a")) & (F.col("o2.dst") == F.col("cl.b")),
    ).select(
        F.col("o1.src").alias("u"), F.col("o1.dst").alias("v"), F.col("o2.dst").alias("w")
    )
    corners = (
        tri.select(F.col("u").alias("id"))
        .unionAll(tri.select(F.col("v").alias("id")))
        .unionAll(tri.select(F.col("w").alias("id")))
    )
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))


def k_core(pairs: DataFrame, k: int = 2, max_rounds: int = 12) -> DataFrame:
    """The k-core of the undirected near-dup graph: iteratively peel
    nodes of degree < k until fixpoint; return (id, deg) for survivors
    with deg = degree WITHIN the core. The third cluster-cohesion
    diagnostic next to triangle counts and PageRank — a dup cluster
    whose members survive the 2-core is held together by cycles, not a
    fragile transitive chain.

    Each round is one degree aggregation + one semi-join pair (all on
    node keys, map-side combining); lineage is truncated per round with
    localCheckpoint exactly like pagerank above, so the plan does not
    grow with rounds. Peeling converges in <= the graph's degeneracy
    ordering depth; raises if ``max_rounds`` is exceeded (same
    non-convergence contract as dedup.dup_clusters).
    """
    edges = (
        pairs.select(
            F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = (
            edges.select(F.col("a").alias("id"))
            .unionAll(edges.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("id").localCheckpoint(eager=True)
        nxt = (
            edges.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == edges.count():
            core_deg = (
                nxt.select(F.col("a").alias("id"))
                .unionAll(nxt.select(F.col("b").alias("id")))
                .groupBy("id")
                .agg(F.count(F.lit(1)).alias("deg"))
            )
            return core_deg
        edges = nxt
    raise RuntimeError(f"k_core did not converge within {max_rounds} rounds")
