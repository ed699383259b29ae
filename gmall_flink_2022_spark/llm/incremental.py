"""Incremental deduplication against a PERSISTED index — the
continuous-ingest hygiene shape at 100 TB: new arrivals are deduped
against the existing corpus WITHOUT re-reading or re-tokenizing the
corpus text. The corpus side of every comparison is the index
(content digests + MinHash signatures, persisted via
sources.dim_store.DimStore — the same bucketed-upsert machinery as the
S7 Phoenix dim store, reference function/DimSinkFunction.java:29-66);
only the (small) arrival batch is ever shingled.

Index tables:
- ``dedup_digest_idx`` (pk digest): content digest -> canonical keep_id.
  Exact-dup membership is one broadcast/hash join on the digest.
- ``dedup_sig_idx`` (pk doc_id): doc -> MinHash signature (mh0..mh{k-1},
  the same md5-seeded minima as llm.dedup.minhash_signatures). Near-dup
  candidates come from LSH band-bucket collisions between arrival
  signatures and INDEX signatures; candidates are verified by SIGNATURE
  AGREEMENT (matching components / num_hashes >= threshold) — the
  documented incremental trade: exact-Jaccard verification would need
  corpus shingles, which is precisely the re-tokenization this operator
  exists to avoid. Signature agreement is the standard estimator
  (E[agreement] = Jaccard) and is fully deterministic.

Decision contract per arrival: ``exact`` (digest hit, match_id = the
index's canonical keep_id), else ``near`` (best agreeing index doc:
max agreement, ties to the smallest doc_id), else ``new``. Arrivals are
compared against the INDEX only, not against each other — within-batch
duplicates are a preceding exact_dedup/minhash pass (already in the
family); after ingest the index contains the batch's new docs, so the
NEXT batch dedupes against them (proven in tests by chaining batches).

Scale shape: exact path = one join on digest; near path = arrival-side
shingle/signature work sized by the BATCH, one band-bucket join against
the signature index (linear candidates, same LSH bound as the batch
operator), agreement verify on candidates only. Index updates ride
DimStore's partition-pruned bucket merge — O(touched buckets), not
O(index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources.dim_store import DimStore
from .dedup import minhash_signatures

DIGEST_TABLE = "dedup_digest_idx"
SIG_TABLE = "dedup_sig_idx"


def _text_or_empty(text_col: str):
    """NULL text coalesced to '' — md5(NULL) is NULL and a NULL digest
    never joins, so un-coalesced NULL-text arrivals would re-classify as
    'new' every batch and churn a NULL-digest index row instead of
    converging. With the coalesce, NULL and empty documents share one
    digest and dedupe exactly like any other identical content."""
    return F.coalesce(F.col(text_col), F.lit(""))


def _digest_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        docs.select(
            F.md5(_text_or_empty(text_col)).alias("digest"),
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_id"))
    )


def _band_buckets(
    sig: DataFrame, id_name: str, num_hashes: int, bands: int
) -> DataFrame:
    rows = num_hashes // bands
    band_cols = [
        F.concat_ws(
            "_", F.lit(str(b)), *[F.col(f"mh{b * rows + r}") for r in range(rows)]
        ).alias("bucket")
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_name), F.explode(F.array(*band_cols)).alias("bucket")
    ).distinct()


def build_dedup_index(
    store: DimStore,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
) -> None:
    """Bootstrap the index from an existing corpus — the ONE corpus-sized
    pass; every later arrival batch touches only the index."""
    docs = docs.withColumn(text_col, _text_or_empty(text_col))
    store.upsert(DIGEST_TABLE, _digest_rows(docs, id_col, text_col), pk="digest")
    sigs = minhash_signatures(docs, id_col, text_col, n, num_hashes)
    store.upsert(SIG_TABLE, sigs.withColumnRenamed("id", "doc_id"), pk="doc_id")


def incremental_dedup(
    store: DimStore,
    arrivals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    min_agree: int = 4,
) -> DataFrame:
    """Read-only decision pass: (doc_id, dup_kind, match_id, agree_n).
    dup_kind in ('exact', 'near', 'new'); agree_n = num_hashes for exact
    hits, matching-signature-component count for near hits, NULL for new
    docs. The corpus side reads ONLY the two index tables — no corpus
    text scan appears in this plan (asserted in tests)."""
    decisions, _ = _decide(
        store, arrivals, id_col, text_col, n, num_hashes, bands, min_agree
    )
    return decisions


def _decide(
    store: DimStore,
    arrivals: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    min_agree: int,
) -> tuple[DataFrame, DataFrame]:
    """(decisions, arrival signatures) — the signatures are exposed so
    ingest can index new docs without re-tokenizing them."""
    idx_dig = store.read(DIGEST_TABLE)
    idx_sig = store.read(SIG_TABLE)
    arr = arrivals.select(
        F.col(id_col).alias("doc_id"), _text_or_empty(text_col).alias("text")
    ).withColumn("digest", F.md5("text"))
    # exact membership as two arrival-side broadcasts: the corpus-sized
    # digest index STREAMS against the broadcast arrival digests (inner
    # probe, hits are arrival-bounded), then the hits broadcast back
    # onto the arrivals — a naive `arr LEFT JOIN idx` would make the
    # index the build side (or shuffle it); this never moves the index
    hits = idx_dig.join(
        F.broadcast(arr.select("doc_id", "digest")), "digest"
    ).select("doc_id", "keep_id")
    with_exact = arr.join(F.broadcast(hits), "doc_id", "left").select(
        "doc_id", "text", F.col("keep_id").alias("exact_match")
    )
    non_exact = with_exact.filter(F.col("exact_match").isNull()).select(
        "doc_id", "text"
    )
    arr_sig = minhash_signatures(non_exact, "doc_id", "text", n, num_hashes)
    a_bk = _band_buckets(
        arr_sig.withColumnRenamed("id", "a_id"), "a_id", num_hashes, bands
    )
    c_bk = _band_buckets(
        idx_sig.withColumnRenamed("doc_id", "c_id"), "c_id", num_hashes, bands
    )
    # the arrival side is BATCH-sized while the index is CORPUS-sized:
    # broadcast the arrival buckets/signatures so the index side never
    # shuffles (at 100 TB the signature index streams through the
    # bucket probe; only collisions surface)
    cands = (
        F.broadcast(a_bk).join(c_bk, "bucket").select("a_id", "c_id").distinct()
    )
    s_a = arr_sig.select(
        F.col("id").alias("a_id"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(num_hashes)],
    )
    s_c = idx_sig.select(
        F.col("doc_id").alias("c_id"),
        *[F.col(f"mh{i}").alias(f"c{i}") for i in range(num_hashes)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"c{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    # a self-arrived doc can never match itself: the index has no row
    # for it yet (that is the whole point of the incremental contract)
    # candidate pairs carry the arrival signature (both batch-sized) and
    # broadcast INTO the index-side signature scan: the corpus-sized
    # index is never shuffled anywhere in this plan — it streams through
    # two broadcast probes (buckets above, verification here)
    ver = (
        s_c.join(F.broadcast(cands.join(F.broadcast(s_a), "a_id")), "c_id")
        .select("a_id", "c_id", agree.alias("agree"))
        .filter(F.col("agree") >= min_agree)
    )
    # best match: max agreement, ties to smallest corpus id — encoded as
    # min(struct(misses, c_id)) so one aggregation decides both
    best = ver.groupBy("a_id").agg(
        F.min(
            F.struct(
                (F.lit(num_hashes) - F.col("agree")).alias("miss"),
                F.col("c_id").alias("cid"),
            )
        ).alias("b")
    )
    decisions = (
        with_exact.join(F.broadcast(best), with_exact["doc_id"] == best["a_id"], "left")
        .select(
            "doc_id",
            F.when(F.col("exact_match").isNotNull(), F.lit("exact"))
            .when(F.col("b").isNotNull(), F.lit("near"))
            .otherwise(F.lit("new"))
            .alias("dup_kind"),
            F.coalesce(F.col("exact_match"), F.col("b.cid")).alias("match_id"),
            F.when(F.col("exact_match").isNotNull(), F.lit(num_hashes))
            .otherwise(F.lit(num_hashes) - F.col("b.miss"))
            .cast("long")
            .alias("agree_n"),
        )
    )
    return decisions, arr_sig


def ingest_with_dedup(
    store: DimStore,
    arrivals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    min_agree: int = 4,
) -> DataFrame:
    """Decide + UPDATE: runs :func:`incremental_dedup`, then adds the
    batch's ``new`` docs (digest + signature) to the index so the next
    batch dedupes against them. The ARRIVAL batch is materialized once
    at entry (foreachBatch discipline: the decision pass, the signature
    reuse and the index upserts all consume the checkpoint, so a
    streaming micro-batch's upstream plan executes exactly once); the
    decision/signature frames are materialized BEFORE the index update —
    a lazy decision plan re-read after the upsert would see the
    arrivals' own rows and misclassify them as exact self-matches."""
    arr = arrivals.select(
        F.col(id_col).alias("doc_id"), _text_or_empty(text_col).alias("text")
    ).localCheckpoint(eager=True)
    decisions, arr_sig = _decide(
        store, arr, "doc_id", "text", n, num_hashes, bands, min_agree
    )
    # materialize BOTH before touching the index: the signature frame is
    # reused below (saves re-tokenizing the new docs), and both plans
    # read the PRE-update index state
    decisions = decisions.localCheckpoint(eager=True)
    arr_sig = arr_sig.localCheckpoint(eager=True)
    new_ids = decisions.filter(F.col("dup_kind") == "new").select("doc_id")
    new_docs = arr.join(new_ids, "doc_id")
    store.upsert(DIGEST_TABLE, _digest_rows(new_docs, "doc_id", "text"), pk="digest")
    new_sigs = arr_sig.withColumnRenamed("id", "doc_id").join(new_ids, "doc_id")
    store.upsert(SIG_TABLE, new_sigs, pk="doc_id")
    return decisions


CLUSTER_TABLE = "dup_cluster_map"


def build_cluster_map(store: DimStore, pairs: DataFrame) -> None:
    """Bootstrap the persisted cluster map from a batch pair set: one
    full star-CC (llm/dedup.py::dup_clusters), rows (id, cluster_id)
    upserted into DimStore. Singleton docs (no pairs) stay implicit —
    same contract as the batch operator's output."""
    from .dedup import dup_clusters

    store.upsert(CLUSTER_TABLE, dup_clusters(pairs), pk="id")


def update_dup_clusters(store: DimStore, new_pairs: DataFrame) -> DataFrame:
    """INCREMENTAL connected-component maintenance (r6 VERDICT ask #4):
    fold a batch of new near-dup edges into the persisted (id,
    cluster_id) map without recomputing CC over the corpus.

    Invariant maintained: after every call the map equals
    ``dup_clusters`` run over the UNION of all edges ever seen
    (min-id canonical labels) — proven by the equivalence test.

    How: each batch edge endpoint is translated to its CURRENT label
    (its cluster_id if mapped, else itself — labels are cluster minima,
    so this is quotient-graph contraction); star-CC then runs on the
    CONTRACTED graph only, which is BATCH-sized, not corpus-sized — the
    'full CC only when the batch merges clusters' discipline, made
    uniform: an attach-only batch contracts to arrival->label stars and
    converges in one round, a cluster-merging batch unifies the labels
    themselves. Relabels (an existing cluster's min changed: merged
    with a smaller-min cluster or an arrival with a smaller id) rewrite
    only the touched clusters' member rows — the corpus-sized map
    streams through one broadcast relabel probe and only matching rows
    are upserted (bucket-pruned by id). Reference analog: keyed-state
    accumulation, dwm/UniqueVisitApp.java:44-50 — per-key state
    advances in place, no global recompute.

    Returns the (id, cluster_id) assignment rows written this batch
    (newly-mapped nodes + relabeled members)."""
    from .dedup import dup_clusters

    edges = (
        new_pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("a").alias("id"))
        .union(edges.select(F.col("b").alias("id")))
        .distinct()
    )
    if store.exists(CLUSTER_TABLE):
        m = store.read(CLUSTER_TABLE)
        # batch-bounded: the corpus-sized map streams against the
        # broadcast batch node set
        existing = m.join(F.broadcast(nodes), "id").localCheckpoint(eager=True)
    else:
        m = None
        existing = nodes.filter(F.lit(False)).withColumn(
            "cluster_id", F.col("id")
        )
    la = existing.select(F.col("id").alias("a"), F.col("cluster_id").alias("la"))
    lb = existing.select(F.col("id").alias("b"), F.col("cluster_id").alias("lb"))
    contracted = (
        edges.join(F.broadcast(la), "a", "left")
        .join(F.broadcast(lb), "b", "left")
        .select(
            F.coalesce("la", "a").alias("id_a"),
            F.coalesce("lb", "b").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    comp = dup_clusters(contracted).localCheckpoint(eager=True)
    # nodes seen for the first time get their component's label
    newcomers = nodes.join(existing.select("id"), "id", "left_anti")
    rows_new = comp.join(F.broadcast(newcomers), "id")
    # labels that moved = existing clusters whose canonical min changed
    relabels = (
        comp.filter(F.col("id") != F.col("cluster_id"))
        .join(
            F.broadcast(
                existing.select(F.col("cluster_id").alias("id")).distinct()
            ),
            "id",
        )
        .select(F.col("id").alias("_old"), F.col("cluster_id").alias("_new"))
        .localCheckpoint(eager=True)
    )
    if m is not None and relabels.take(1):
        moved = m.join(
            F.broadcast(relabels), m["cluster_id"] == relabels["_old"]
        ).select("id", F.col("_new").alias("cluster_id"))
    else:
        moved = rows_new.filter(F.lit(False))
    written = rows_new.unionByName(moved).localCheckpoint(eager=True)
    store.upsert(CLUSTER_TABLE, written, pk="id")
    return written


def read_cluster_map(store: DimStore) -> DataFrame:
    """The current (id, cluster_id) map (non-singleton docs)."""
    return store.read(CLUSTER_TABLE)


def vacuum_cluster_map(store: DimStore, removed_ids: DataFrame) -> DataFrame:
    """Retention for the cluster map: drop removed docs' member rows
    and RE-ELECT the canonical label of any cluster whose minimum was
    removed (new label = min surviving member id), keeping the map's
    invariant that every cluster_id is the min id of its cluster.

    Documented contract: the surviving partition is preserved — a
    removed doc never SPLITS a cluster, because the map stores the
    quotient, not the edges; exact decremental connectivity needs the
    pair set (keep the pairs table and recompute the touched component
    if splits matter — at 100 TB that is the storage-vs-recompute trade
    this family already documents). Scale shape: the map streams
    through broadcast probes of the (small) removal list and the
    touched-label list; deletes/upserts ride the bucket-pruned store.

    Returns the relabel rows written (id, cluster_id)."""
    id_c = removed_ids.columns[0]
    ids = (
        removed_ids.select(F.col(id_c).alias("id"))
        .dropDuplicates(["id"])
        .localCheckpoint(eager=True)
    )
    m = store.read(CLUSTER_TABLE)
    # labels being removed — their clusters need re-election (bounded
    # by the removal list)
    dead_labels = (
        m.join(F.broadcast(ids), m["cluster_id"] == ids["id"])
        .select("cluster_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    store.delete(CLUSTER_TABLE, ids, pk="id")
    if not dead_labels.take(1):
        return m.filter(F.lit(False)).select("id", "cluster_id")
    m2 = store.read(CLUSTER_TABLE)
    touched = m2.join(F.broadcast(dead_labels), "cluster_id")
    new_lbl = touched.groupBy("cluster_id").agg(F.min("id").alias("_new"))
    relabeled = (
        touched.join(F.broadcast(new_lbl), "cluster_id")
        .select("id", F.col("_new").alias("cluster_id"))
        .localCheckpoint(eager=True)
    )
    store.upsert(CLUSTER_TABLE, relabeled, pk="id")
    return relabeled


def foreach_batch_cluster_updater(store: DimStore):
    """Streaming twin: fold each micro-batch of (id_a, id_b) near-dup
    edges into the persisted cluster map. Because every fold maintains
    map == dup_clusters(all edges seen) and edge-set union commutes,
    the SETTLED map is independent of how the stream chopped the edges
    into micro-batches — the same replay-safety argument as the
    reference's keyed-state accumulation (dwm/UniqueVisitApp.java:44-50)."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        update_dup_clusters(store, batch)

    return fn


def vacuum_dedup_index(store: DimStore, removed_ids: DataFrame) -> None:
    """Retention: drop index entries for documents REMOVED from the
    corpus (``removed_ids``: one column of doc ids — e.g. the
    right-only side of llm/sampling.py::corpus_diff reconciliation).
    Signature rows are keyed by doc_id directly; digest rows are
    dropped when their CANONICAL holder (keep_id) was removed — the
    content re-registers as 'new' on next arrival, the honest behavior
    when the canonical copy is gone. Both deletes ride DimStore's
    partition-pruned bucket rewrite; the doomed-digest probe broadcasts
    the (small) removal list so the digest index never shuffles."""
    id_c = removed_ids.columns[0]
    ids = removed_ids.select(F.col(id_c).alias("doc_id")).dropDuplicates(["doc_id"])
    store.delete(SIG_TABLE, ids, pk="doc_id")
    doomed = (
        store.read(DIGEST_TABLE)
        .join(F.broadcast(ids), F.col("keep_id") == F.col("doc_id"))
        .select("digest")
    )
    store.delete(DIGEST_TABLE, doomed, pk="digest")


def vacuum_embed_index(store: DimStore, removed_ids: DataFrame) -> None:
    """Vector-twin retention: the embedding index is keyed by vec_id,
    so removal is one pruned delete."""
    id_c = removed_ids.columns[0]
    store.delete(
        EMB_TABLE,
        removed_ids.select(F.col(id_c).alias("vec_id")),
        pk="vec_id",
    )


def foreach_batch_ingester(
    store: DimStore,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
):
    """Streaming twin: a foreachBatch function that runs
    :func:`ingest_with_dedup` per micro-batch and appends the decisions
    to ``out_dir`` — continuous-ingest dedup where batch N+1's arrivals
    dedupe against everything batch N added to the index (the streaming
    analog of the reference's first-per-key keyed state,
    dwm/UniqueVisitApp.java:44-50, with the 'key' being content
    identity)."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        # no pre-flight emptiness action: ingest checkpoints the batch
        # once and every downstream step (incl. DimStore's empty guard
        # and an empty decisions append) is empty-safe
        decisions = ingest_with_dedup(store, batch, id_col, text_col, **kw)
        decisions.write.mode("append").parquet(out_dir)

    return fn


# ---------------------------------------------------------------------------
# Incremental EMBEDDING dedup — the vector-modality twin of the text
# index above: corpus vectors + their LSH bucket keys persist once;
# arrival batches probe by bucket collision and verify by cosine. The
# index stores the vectors themselves (cosine verification needs them —
# unlike text, there is no cheaper sketch with the same decision), so
# the win over the batch operator is (a) no corpus re-bucketing and
# (b) the index never shuffles: buckets explode narrowly and every join
# broadcasts the arrival side.
#
# Bucketing uses the EXPRESSION rendering (similarity.lsh_bucket:
# sequential-fold dot products) on both sides, not the numpy-gemm
# pandas UDF the batch LSH uses — numpy's pairwise summation rounds
# differently in the last ulp, which could flip a sign on a near-zero
# dot and break oracle hashing. Arrival batches are small and the
# corpus side pays the expression cost once at build time.
# ---------------------------------------------------------------------------

EMB_TABLE = "embdedup_vec_idx"


def _emb_buckets_col(vec_col, dim: int, n_planes: int, n_tables: int, seed: int):
    from .similarity import _hyperplanes, lsh_bucket

    tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    return F.array(
        *[
            F.concat(F.lit(f"{t}:"), lsh_bucket(vec_col, tables[t]))
            for t in range(n_tables)
        ]
    )


def build_embed_index(
    store: DimStore,
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 2,
    seed: int = 42,
) -> None:
    """Bootstrap: one corpus pass stores (vec_id, vec, bucket keys)."""
    rows = embs.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _emb_buckets_col(F.col(vec_col), dim, n_planes, n_tables, seed).alias(
            "buckets"
        ),
    )
    store.upsert(EMB_TABLE, rows, pk="vec_id")


def incremental_embed_dedup(
    store: DimStore,
    arrivals: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    threshold: float = 0.9,
) -> DataFrame:
    """Decisions (vec_id, dup_kind, match_id, sim) for an arrival batch
    against the persisted vector index: ``exact`` = identical vector
    already indexed (array-equality probe, match = smallest holder id),
    ``near`` = best cosine >= threshold among LSH bucket collisions,
    else ``new``. Same arrival-broadcast discipline as the text path —
    the index streams, never shuffles."""
    from .similarity import gated_exact_sim

    idx = store.read(EMB_TABLE)
    arr = arrivals.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec")
    ).withColumn(
        "a_buckets", _emb_buckets_col(F.col("a_vec"), dim, n_planes, n_tables, seed)
    )
    hits = (
        idx.join(F.broadcast(arr.select("a_id", "a_vec")), idx["vec"] == F.col("a_vec"))
        .groupBy("a_id")
        .agg(F.min("vec_id").alias("exact_match"))
    )
    with_exact = arr.join(F.broadcast(hits), "a_id", "left")
    ne = with_exact.filter(F.col("exact_match").isNull()).select(
        "a_id", "a_vec", "a_buckets"
    )
    a_bk = ne.select("a_id", F.explode("a_buckets").alias("bucket")).distinct()
    c_bk = idx.select(
        F.col("vec_id").alias("c_id"), F.explode("buckets").alias("bucket")
    )
    cands = (
        c_bk.join(F.broadcast(a_bk), "bucket").select("a_id", "c_id").distinct()
    )
    pairs = idx.select(F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec")).join(
        F.broadcast(
            cands.join(
                F.broadcast(ne.select("a_id", "a_vec")), "a_id"
            )
        ),
        "c_id",
    )
    # r16: vectorized one-sided prefilter gating the exact fold — same
    # candidates+verify discipline as embedding_near_dups (see
    # similarity.gated_exact_sim for the bound AND for why the gate must
    # be one expression: a separate exact filter gets pushed below the
    # Python node into the join); the emitted sim stays the oracle-exact
    # sequential fold, evaluated on survivors only
    scored = pairs.select(
        "a_id",
        "c_id",
        gated_exact_sim(F.col("a_vec"), F.col("c_vec"), threshold).alias("sim"),
    ).filter(F.col("sim") >= threshold)
    # max sim, ties to smallest corpus id — min(struct(-sim, c_id)) so
    # the id column stays type-generic (negating the id would break
    # string/uuid ids; only sim, always a double, is negated)
    best = scored.groupBy("a_id").agg(
        F.min(
            F.struct((-F.col("sim")).alias("negsim"), F.col("c_id").alias("cid"))
        ).alias("b")
    )
    return (
        with_exact.join(F.broadcast(best), "a_id", "left")
        .select(
            F.col("a_id").alias("vec_id"),
            F.when(F.col("exact_match").isNotNull(), F.lit("exact"))
            .when(F.col("b").isNotNull(), F.lit("near"))
            .otherwise(F.lit("new"))
            .alias("dup_kind"),
            F.coalesce(F.col("exact_match"), F.col("b").getField("cid")).alias(
                "match_id"
            ),
            F.when(F.col("exact_match").isNotNull(), F.lit(1.0))
            .otherwise(-F.col("b").getField("negsim"))
            .alias("sim"),
        )
    )


def ingest_embed_with_dedup(
    store: DimStore,
    arrivals: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kw,
) -> DataFrame:
    """Decide + add the batch's ``new`` vectors (with their bucket keys)
    to the index; the arrival batch materializes once at entry and the
    decisions before the index update (same foreachBatch discipline as
    the text twin)."""
    arr = arrivals.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias(vec_col)
    ).localCheckpoint(eager=True)
    decisions = incremental_embed_dedup(
        store, arr, "vec_id", vec_col, **kw
    ).localCheckpoint(eager=True)
    new_ids = decisions.filter(F.col("dup_kind") == "new").select("vec_id")
    new_rows = arr.join(new_ids, "vec_id")
    build_embed_index(store, new_rows, "vec_id", vec_col, **{
        k: v for k, v in kw.items() if k in ("dim", "n_planes", "n_tables", "seed")
    })
    return decisions


def foreach_batch_embed_ingester(
    store: DimStore,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kw,
):
    """Streaming twin for the vector index: ingest_embed_with_dedup per
    micro-batch, decisions appended to ``out_dir`` — continuous vector
    ingest where batch N+1 dedupes against batch N's additions."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        # empty-safe end to end; the batch materializes once inside
        # ingest_embed_with_dedup
        decisions = ingest_embed_with_dedup(store, batch, id_col, vec_col, **kw)
        decisions.write.mode("append").parquet(out_dir)

    return fn
