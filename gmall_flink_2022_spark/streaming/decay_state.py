"""Time-decayed activity score as a stateful streaming operator — the
feature-store freshness pattern: every user's score is maintained live
with BOUNDED per-key state (the last K=16 events, three parallel arrays
of longs), so state size is O(users * K) regardless of stream length.

The arithmetic contract is ads_user_decay_score's (plans/analytics.py):
cents = floor(value * 100) exact, weight 2^(K-1-j) for the j-th newest
event — every term exact bigint, the final division happens outside the
state machine. A late-arriving event slots into its time position (the
state keeps (ts, event_id) order, not arrival order), so the settled
answer equals the batch window rendering exactly.

Reference analog: dwm/UniqueVisitApp.java's per-key ValueState (W4),
holding a small fixed struct instead of a date string.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

K = 16

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_scored", T.LongType()),
        T.StructField("num_q", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_ns", T.ArrayType(T.LongType())),
        T.StructField("eid", T.ArrayType(T.LongType())),
        T.StructField("cents", T.ArrayType(T.LongType())),
    ]
)


def _apply(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        ts_ns, eid, cents = (list(x) for x in state.get)
    else:
        ts_ns, eid, cents = [], [], []
    rows = list(zip(ts_ns, eid, cents))
    for pdf in pdf_iter:
        for _, r in pdf.iterrows():
            rows.append(
                (int(r["ts"].value), int(r["event_id"]), int(r["cents"]))
            )
    # newest first by (ts, event_id); keep the top K — bounded state
    rows.sort(key=lambda t: (t[0], t[1]), reverse=True)
    rows = rows[:K]
    state.update(
        ([r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows])
    )
    num = sum(c << (K - 1 - j) for j, (_, _, c) in enumerate(rows))
    yield pd.DataFrame(
        [(user_id, len(rows), num)], columns=["user_id", "n_scored", "num_q"]
    )


def decay_score_stateful(events: DataFrame) -> DataFrame:
    """events(user_id, ts, event_id, cents) streaming frame -> one
    updated (user_id, n_scored, num_q) row per key per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _apply,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
