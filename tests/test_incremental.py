"""Incremental dedup against the persisted DimStore index (r5 VERDICT
ask #2): decisions, cross-batch index advancement, and the defining
plan property — the corpus side is served by the index, never by a
corpus text scan."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from gmall_flink_2022_spark.llm import incremental as inc
from gmall_flink_2022_spark.sources.dim_store import DimStore


def _store(spark):
    return DimStore(spark, tempfile.mkdtemp(prefix="inc_idx_test_"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "pack my box with five dozen liquor jugs for the party tonight"),
    (3, "sphinx of black quartz judge my vow said the old man slowly"),
]


def test_incremental_decisions(spark):
    store = _store(spark)
    inc.build_dedup_index(store, _df(spark, CORPUS))
    arrivals = _df(
        spark,
        [
            (10, CORPUS[0][1]),  # exact copy of doc 1
            (11, CORPUS[1][1] + " extra"),  # near variant of doc 2
            (12, "completely different content about spark query planning"),
            (13, "xy"),  # too short for any shingle -> new
        ],
    )
    out = {r["doc_id"]: r for r in inc.incremental_dedup(store, arrivals).collect()}
    assert out[10]["dup_kind"] == "exact" and out[10]["match_id"] == 1
    assert out[10]["agree_n"] == 8
    assert out[11]["dup_kind"] == "near" and out[11]["match_id"] == 2
    assert out[11]["agree_n"] >= 4
    assert out[12]["dup_kind"] == "new" and out[12]["match_id"] is None
    assert out[13]["dup_kind"] == "new"


def test_incremental_index_advances_between_batches(spark):
    """batch 2 must dedupe against batch 1's additions — the property
    that distinguishes incremental ingest from two independent runs."""
    store = _store(spark)
    inc.build_dedup_index(store, _df(spark, CORPUS))
    b1 = _df(spark, [(20, "a brand new document about window functions in sql")])
    d1 = {r["doc_id"]: r for r in inc.ingest_with_dedup(store, b1).collect()}
    assert d1[20]["dup_kind"] == "new"
    b2 = _df(
        spark,
        [
            (30, "a brand new document about window functions in sql"),  # = 20
            (31, "a brand new document about window functions in rust"),  # near 20
        ],
    )
    d2 = {r["doc_id"]: r for r in inc.ingest_with_dedup(store, b2).collect()}
    assert d2[30]["dup_kind"] == "exact" and d2[30]["match_id"] == 20
    assert d2[31]["dup_kind"] == "near" and d2[31]["match_id"] == 20
    # exact/near arrivals must NOT have been added to the index
    sig_ids = {r["doc_id"] for r in store.read(inc.SIG_TABLE).collect()}
    assert 20 in sig_ids and 30 not in sig_ids and 31 not in sig_ids


def test_incremental_within_batch_dups_are_both_new(spark):
    """Contract: arrivals compare against the INDEX only; two identical
    arrivals in one batch are both 'new', and the index keeps one
    digest row with the smaller id as canonical."""
    store = _store(spark)
    inc.build_dedup_index(store, _df(spark, CORPUS))
    twins = _df(
        spark,
        [(40, "twin content never seen before in this corpus at all"),
         (41, "twin content never seen before in this corpus at all")],
    )
    d = {r["doc_id"]: r["dup_kind"] for r in inc.ingest_with_dedup(store, twins).collect()}
    assert d == {40: "new", 41: "new"}
    dig = {r["keep_id"] for r in store.read(inc.DIGEST_TABLE).collect()}
    assert 40 in dig and 41 not in dig
    # and the NEXT batch sees the canonical copy
    d3 = inc.incremental_dedup(
        store, _df(spark, [(50, "twin content never seen before in this corpus at all")])
    ).collect()[0]
    assert d3["dup_kind"] == "exact" and d3["match_id"] == 40


def test_incremental_plan_reads_index_not_corpus_text(spark, sf_dir):
    """THE defining scale property (r5 VERDICT ask #2 'done' bar): the
    decision plan's corpus side is the index parquet — no scan of the
    corpus documents table appears anywhere in the plan."""
    from gmall_flink_2022_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = _store(spark)
    inc.build_dedup_index(store, docs)
    # arrivals live in their OWN parquet dir, so any 'documents' scan in
    # the plan could only be a corpus re-read
    arr_dir = tempfile.mkdtemp(prefix="inc_arrivals_")
    docs.limit(20).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    ).write.mode("overwrite").parquet(arr_dir)
    arrivals = spark.read.parquet(arr_dir)
    decisions = inc.incremental_dedup(store, arrivals)
    plan = decisions._jdf.queryExecution().toString()
    assert "documents" not in plan
    assert store.root in plan  # corpus side = the index store
    files = decisions.inputFiles()
    assert files and all("documents" not in f for f in files)
    assert any(store.root in f for f in files)


def test_incremental_broadcasts_arrival_side(spark, sf_dir):
    """At 100 TB the index is corpus-sized and the arrival batch is
    small: the bucket probe and the verification must broadcast the
    ARRIVAL side so the index never shuffles, and no Python appears."""
    from gmall_flink_2022_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = _store(spark)
    inc.build_dedup_index(store, docs)
    arrivals = docs.limit(25).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    p = inc.incremental_dedup(store, arrivals)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in p
    # EVERY join broadcasts its arrival-bounded side — the corpus-sized
    # index is never the build side of anything and never shuffles (the
    # plan's only exchanges are aggregations of arrival-sized frames)
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_embed_incremental_decisions_and_advance(spark):
    """Vector twin: exact = identical vector, near = scaled copy
    (cosine 1.0), new otherwise; batch 2 sees batch 1's additions; the
    index is never on the shuffle/build side of a join."""
    store = _store(spark)
    rows = [(i, [float(i + d) for d in range(8)]) for i in range(1, 4)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(dim=8, n_planes=4, n_tables=2, threshold=0.9)
    inc.build_embed_index(store, embs, **{k: kw[k] for k in ("dim", "n_planes", "n_tables")})
    arrivals = spark.createDataFrame(
        [
            (10, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]),  # = vec 1
            (11, [2.5, 5.0, 7.5, 10.0, 12.5, 15.0, 17.5, 20.0]),  # 2.5x vec 1
            (12, [5.0, -3.0, 2.0, -8.0, 1.0, 0.5, -2.0, 4.0]),  # unrelated
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in inc.ingest_embed_with_dedup(
        store, arrivals, **kw
    ).collect()}
    assert out[10]["dup_kind"] == "exact" and out[10]["match_id"] == 1
    assert out[11]["dup_kind"] == "near" and out[11]["match_id"] == 1
    assert abs(out[11]["sim"] - 1.0) < 1e-9
    assert out[12]["dup_kind"] == "new"
    # batch 2: an exact copy of the batch-1 NEW vector must hit it
    b2 = spark.createDataFrame(
        [(20, [5.0, -3.0, 2.0, -8.0, 1.0, 0.5, -2.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    d2 = inc.incremental_embed_dedup(store, b2, **kw).collect()[0]
    assert d2["dup_kind"] == "exact" and d2["match_id"] == 12
    # plan discipline, same as the text path
    p = inc.incremental_embed_dedup(store, b2, **kw)._jdf.queryExecution().toString()
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_incremental_null_text_converges(spark):
    """r6 review: md5(NULL) is NULL and a NULL digest never joins, so
    un-coalesced NULL-text arrivals re-classified as 'new' every batch
    and churned the index. Coalesced to '', a NULL doc behaves like any
    identical content: first one is 'new', every later NULL/empty doc is
    an 'exact' hit, and the index holds exactly one digest row for it."""
    store = _store(spark)
    inc.build_dedup_index(store, _df(spark, CORPUS))
    b1 = spark.createDataFrame([(60, None)], "doc_id long, text string")
    d1 = inc.ingest_with_dedup(store, b1).collect()[0]
    assert d1["dup_kind"] == "new"
    # NULL-text again AND empty-string text: both exact-match doc 60
    b2 = spark.createDataFrame(
        [(61, None), (62, "")], "doc_id long, text string"
    )
    d2 = {r["doc_id"]: r for r in inc.ingest_with_dedup(store, b2).collect()}
    assert d2[61]["dup_kind"] == "exact" and d2[61]["match_id"] == 60
    assert d2[62]["dup_kind"] == "exact" and d2[62]["match_id"] == 60
    # index converged: one digest row, no NULL digests, no churn
    dig = store.read(inc.DIGEST_TABLE).filter(F.col("keep_id") >= 60).collect()
    assert len(dig) == 1 and dig[0]["keep_id"] == 60
    assert dig[0]["digest"] is not None


def test_incremental_clusters_equal_batch_cc_on_union(spark):
    """r6 VERDICT ask #4 'done' bar: after every incremental batch the
    persisted map equals dup_clusters over the UNION of all edges seen,
    including attach-only batches, chain attachments, cluster merges,
    and a smaller-id arrival that steals a cluster's canonical label."""
    from gmall_flink_2022_spark.llm.dedup import dup_clusters

    def pairs(rows):
        return spark.createDataFrame(rows, "id_a long, id_b long")

    b0 = [(10, 11), (20, 21), (30, 31), (40, 41)]
    b1 = [(11, 50), (50, 51), (21, 60)]          # attach + chain
    b2 = [(11, 21), (31, 41), (3, 30)]           # merges + smaller-id steal
    store = _store(spark)
    inc.build_cluster_map(store, pairs(b0))
    seen = list(b0)
    for batch in (b1, b2):
        inc.update_dup_clusters(store, pairs(batch))
        seen += batch
        got = sorted(map(tuple, inc.read_cluster_map(store).collect()))
        want = sorted(map(tuple, dup_clusters(pairs(seen)).collect()))
        assert got == want, batch
    # final labels: {10,11,20,21,50,51,60} -> 10; {3,30,31,40,41} -> 3
    final = dict(sorted(inc.read_cluster_map(store).collect()))
    assert final[60] == 10 and final[51] == 10
    assert final[41] == 3 and final[30] == 3


def test_incremental_clusters_attach_only_no_relabel_writes(spark):
    """The fast path: a batch that only attaches new nodes to existing
    clusters writes exactly those nodes' rows — no existing member row
    is rewritten (the written frame is the API contract for that)."""

    def pairs(rows):
        return spark.createDataFrame(rows, "id_a long, id_b long")

    store = _store(spark)
    inc.build_cluster_map(store, pairs([(10, 11), (20, 21)]))
    written = inc.update_dup_clusters(store, pairs([(11, 90), (21, 91)]))
    rows = sorted(map(tuple, written.collect()))
    assert rows == [(90, 10), (91, 20)]


def test_vacuum_embed_index(spark):
    """Vector-twin retention: removed vec_ids leave the index; removed
    vectors re-register as new, survivors still exact-hit."""
    store = _store(spark)
    rows = [(i, [float(i + d) for d in range(8)]) for i in range(1, 5)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(dim=8, n_planes=4, n_tables=2)
    inc.build_embed_index(store, embs, **kw)
    inc.vacuum_embed_index(store, spark.createDataFrame([(2,)], "vec_id long"))
    assert {r["vec_id"] for r in store.read(inc.EMB_TABLE).collect()} == {1, 3, 4}
    arr = spark.createDataFrame(
        [(20, [float(2 + d) for d in range(8)]),
         (30, [float(3 + d) for d in range(8)])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in inc.incremental_embed_dedup(
        store, arr, threshold=0.9, **kw
    ).collect()}
    assert out[20]["dup_kind"] != "exact"
    assert out[30]["dup_kind"] == "exact" and out[30]["match_id"] == 3


def test_vacuum_entire_corpus_keeps_index_usable(spark):
    """Review r7: retention that removes EVERY doc must leave the index
    readable/ingestable — decisions on the next batch are all 'new'."""
    store = _store(spark)
    inc.build_dedup_index(store, _df(spark, CORPUS))
    inc.vacuum_dedup_index(
        store, spark.createDataFrame([(i,) for i, _ in CORPUS], "doc_id long")
    )
    assert store.read(inc.SIG_TABLE).count() == 0
    d = {r["doc_id"]: r["dup_kind"]
         for r in inc.ingest_with_dedup(store, _df(spark, CORPUS)).collect()}
    assert set(d.values()) == {"new"}
    # and they are indexed again
    assert store.read(inc.SIG_TABLE).count() == len(CORPUS)


def test_vacuum_cluster_map_reelects_labels(spark):
    """Cluster-map retention: removed members drop; a cluster whose
    MINIMUM was removed re-elects min(survivors) as its label; untouched
    clusters keep their rows byte-identically; later updates still hold
    the min-label invariant."""

    def pairs(rows):
        return spark.createDataFrame(rows, "id_a long, id_b long")

    store = _store(spark)
    inc.build_cluster_map(store, pairs([(10, 11), (10, 12), (20, 21), (30, 31)]))
    written = inc.vacuum_cluster_map(
        store, spark.createDataFrame([(10,), (21,), (99,)], "doc_id long")
    )
    got = dict(sorted(inc.read_cluster_map(store).collect()))
    # cluster {10,11,12}: min removed -> re-elected to 11
    # cluster {20,21}: member removed, label kept
    # cluster {30,31}: untouched; 99 never existed
    assert got == {11: 11, 12: 11, 20: 20, 30: 30, 31: 30}
    assert sorted(map(tuple, written.collect())) == [(11, 11), (12, 11)]
    # invariant survives a later incremental update
    inc.update_dup_clusters(store, pairs([(12, 31)]))
    got2 = dict(sorted(inc.read_cluster_map(store).collect()))
    assert got2 == {11: 11, 12: 11, 20: 20, 30: 11, 31: 11}


# --------------------------------------------------- r10: training ingest
# (the composed streaming raw-to-shards chain, llm/ingest.py)

_GOOD = (
    "the quick brown fox jumps over a lazy dog and then it runs down "
    "to the quiet river of dreams which is calm tonight for everyone"
)
_GOOD2 = (
    "pack my box with five dozen liquor jugs and bring the party to "
    "a joyful end because everyone is tired of waiting in the cold"
)


def test_training_ingest_index_advances_and_stage1(spark):
    """The composed per-batch fn: (a) stage 1 collapses same-URL docs
    within a batch; (b) batch 2's exact replica of a batch-1 'new' doc
    is rejected by the ADVANCED index (never reaches the shard store);
    (c) gate failures (short doc) are filtered."""
    from gmall_flink_2022_spark.llm.ingest import foreach_batch_training_ingest
    from gmall_flink_2022_spark.streaming.eos import IdempotentBatchStore

    store = _store(spark)
    inc.build_dedup_index(store, _df(spark, CORPUS))
    shard_root = tempfile.mkdtemp(prefix="ingest_shards_")
    shards = IdempotentBatchStore(spark, shard_root)
    bench = _df(spark, [(999, "zz yy xx ww vv uu tt ss rr qq pp oo")])
    fn = foreach_batch_training_ingest(store, shards, bench)

    schema = "doc_id long, text string, url string"
    b1 = spark.createDataFrame(
        [
            (10, _GOOD, "https://a.com/x"),
            (11, _GOOD2, "https://a.com/x"),   # same URL: stage-1 drops it
            (12, "too short", "https://b.com/y"),  # Gopher gate drops it
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [(20, _GOOD, "https://c.com/z")],  # exact replica of batch-1 doc 10
        schema,
    )
    fn(b1, 0)
    fn(b2, 1)
    got = {r["doc_id"] for r in shards.read_committed().collect()}
    assert got == {10}
    # the replica WAS decided against the advanced index (exact), not
    # silently lost: its digest maps to doc 10, which is in the index
    dec = inc.incremental_dedup(
        store, spark.createDataFrame([(30, _GOOD)], "doc_id long, text string")
    ).collect()
    assert dec[0]["dup_kind"] == "exact" and dec[0]["match_id"] == 10


def test_training_ingest_plan_no_corpus_scan_and_broadcasts(spark, sf_dir):
    """r9 VERDICT ask #3's plan gates on the composed content pass: the
    corpus side is the INDEX parquet (no documents-table scan anywhere),
    and every join broadcasts its arrival/bench-bounded side — no
    sort-merge, no shuffled hash join, no Python."""
    from gmall_flink_2022_spark.llm.ingest import training_ingest_batch
    from gmall_flink_2022_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = _store(spark)
    inc.build_dedup_index(store, docs)
    arr_dir = tempfile.mkdtemp(prefix="ingest_arr_")
    docs.limit(20).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    ).write.mode("overwrite").parquet(arr_dir)
    bench_dir = tempfile.mkdtemp(prefix="ingest_bench_")
    docs.filter(F.col("doc_id") % 13 == 0).write.mode("overwrite").parquet(
        bench_dir
    )
    arrivals = spark.read.parquet(arr_dir)
    bench = spark.read.parquet(bench_dir)
    out = training_ingest_batch(store, arrivals, bench)
    # the decision phase is materialized inside ingest_with_dedup
    # (foreachBatch discipline truncates its lineage); ITS no-corpus-scan
    # + arrivals-broadcast gates are test_incremental_plan_reads_index_
    # not_corpus_text / test_incremental_broadcasts_arrival_side above.
    # This gate covers the composed TAIL (gates + decontam + shard):
    plan = out._jdf.queryExecution().toString()
    assert "documents" not in plan           # no corpus re-scan anywhere
    assert arr_dir in plan and bench_dir in plan
    assert "BroadcastHashJoin" in plan       # gate/decontam semi-joins
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_training_ingest_batch_order_independent(spark):
    """The entry documents that the surviving SET is independent of
    micro-batch arrival order when batches contain no cross-batch dups
    — prove it: two fresh index/store pairs fed the same two batches in
    opposite orders commit identical shard sets."""
    from gmall_flink_2022_spark.llm.ingest import foreach_batch_training_ingest
    from gmall_flink_2022_spark.streaming.eos import IdempotentBatchStore

    schema = "doc_id long, text string, url string"
    b1 = spark.createDataFrame(
        [(10, _GOOD, "https://a.com/x"), (12, "too short", "https://b.com/y")],
        schema,
    )
    b2 = spark.createDataFrame([(20, _GOOD2, "https://c.com/z")], schema)
    bench = _df(spark, [(999, "zz yy xx ww vv uu tt ss rr qq pp oo")])

    def run(order):
        store = _store(spark)
        inc.build_dedup_index(store, _df(spark, CORPUS))
        shards = IdempotentBatchStore(
            spark, tempfile.mkdtemp(prefix="ingest_order_")
        )
        fn = foreach_batch_training_ingest(store, shards, bench)
        for bid, batch in enumerate(order):
            fn(batch, bid)
        return {
            (r["doc_id"], r["shard"], r["n_tokens"])
            for r in shards.read_committed().collect()
        }

    assert run([b1, b2]) == run([b2, b1]) != set()


def test_normalized_ingest_exact_hits_need_stage0(spark):
    """r12: WHY stream_llm_training_ingest_norm fronts stage-0 — the
    corpus is indexed with an NBSP-separated prefix, arrivals carry a
    tab+BEL variant of the same canonical prefix. Raw bytes differ, so
    WITHOUT normalization the replica is NOT an exact index hit; after
    normalize_text both sides canonicalize to 'Intro: ...' and the
    exact digest hit returns."""
    from gmall_flink_2022_spark.llm import text as T

    def dirty(rows, prefix):
        return [(i, prefix + t) for i, t in rows]

    raw_store = _store(spark)
    inc.build_dedup_index(raw_store, _df(spark, dirty(CORPUS, "Intro:\u00a0")))
    arrivals_raw = _df(spark, dirty([(10, CORPUS[0][1])], "Intro:\t\x07 "))
    out = {
        r["doc_id"]: r
        for r in inc.incremental_dedup(raw_store, arrivals_raw).collect()
    }
    assert out[10]["dup_kind"] != "exact"  # byte-variant defeats raw digest

    norm_store = _store(spark)
    corpus_n = T.normalize_text(
        _df(spark, dirty(CORPUS, "Intro:\u00a0")).withColumnRenamed(
            "text", "vtext"
        ),
        "vtext",
        out_col="text",
    ).select("doc_id", "text")
    inc.build_dedup_index(norm_store, corpus_n)
    arrivals_n = T.normalize_text(
        arrivals_raw.withColumnRenamed("text", "vtext"), "vtext",
        out_col="text",
    ).select("doc_id", "text")
    out = {
        r["doc_id"]: r
        for r in inc.incremental_dedup(norm_store, arrivals_n).collect()
    }
    assert out[10]["dup_kind"] == "exact" and out[10]["match_id"] == 1
