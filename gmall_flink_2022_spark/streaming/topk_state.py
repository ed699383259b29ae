"""Bounded-state streaming per-key top-k (r10) — the live twin of
``urls.domain_capped_topk``'s exact per-domain cap.

Batch-side, the rank-filter compiles to WindowGroupLimit: a partial
top-cap heap per map task, a final top-cap after the exchange. The
streaming form makes that partial heap PERSISTENT state: per key the
operator keeps only the cap smallest (hash, id) pairs ever seen —
merging a micro-batch is heap-merge + truncate, so state is exactly
``cap`` rows per key no matter how many documents stream through
(state = O(keys x cap), the bounded-state posture of the whole _scale
family). Selection is by the same stable md5-derived u32 as the batch
operator, so membership is retry- and join-stable and the settled
result is bit-identical to the batch ranking.

Emission contract: update mode — each trigger re-emits the FULL
current ranking (rank 1..n, n <= cap) for every key the batch touched;
a keyed-upsert sink on (key, rank) keeps last-writer-wins, so the
settled table IS the final top-cap (ranks only ever improve: the kept
set per rank position is monotonically non-increasing in (hash, id)
order, and the row count per key never shrinks)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("rk", T.LongType()),
        T.StructField("id", T.LongType()),
    ]
)

# parallel arrays sorted by (u, id), length <= cap
STATE_SCHEMA = T.StructType(
    [
        T.StructField("us", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
    ]
)


def _merge_topk(
    pairs: list[tuple[int, int]],
    new: list[tuple[int, int]],
    cap: int,
) -> list[tuple[int, int]]:
    """Pure heap-merge + truncate. The partition-invariance theorem the
    property test drives: folding ANY partition of a (u, id) multiset
    through this function, in any order, equals one global
    sorted-set-truncate — truncation is lossless because an element
    outside the current top-cap can never re-enter (the kept set only
    improves element-wise)."""
    return sorted(set(pairs) | set(new))[:cap]


def _make_apply(cap: int):
    def apply(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        (k,) = key
        pairs: list[tuple[int, int]] = []
        if state.exists:
            us, ids = state.get
            pairs = list(zip(list(us or ()), list(ids or ())))
        new = []
        for pdf in pdf_iter:
            new.extend(
                zip((int(u) for u in pdf["_u"]), (int(i) for i in pdf["id"]))
            )
        pairs = _merge_topk(pairs, new, cap)
        state.update(([u for u, _ in pairs], [i for _, i in pairs]))
        yield pd.DataFrame(
            [(k, r + 1, i) for r, (_, i) in enumerate(pairs)],
            columns=["key", "rk", "id"],
        )

    return apply


def keyed_topk_stateful(
    rows: DataFrame, key_col: str, id_col: str, u_col: str, cap: int
) -> DataFrame:
    """rows(key, id, u) -> update-mode stream of (key, rk, id): the
    current top-cap per key by (u, id), re-emitted per touched key per
    trigger. Pair with a (key, rk)-keyed upsert sink."""
    src = rows.select(
        F.col(key_col).alias("key").cast("string"),
        F.col(id_col).alias("id").cast("long"),
        F.col(u_col).alias("_u").cast("long"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _make_apply(cap),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
