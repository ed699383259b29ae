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

import numpy as np
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
        s_ts, s_eid, s_cents = state.get
    else:
        s_ts, s_eid, s_cents = (), (), ()
    # vectorized merge (r11 VERDICT ask: drop the iterrows fold): state
    # arrays ++ batch columns, one lexsort, keep the newest K
    batch = pd.concat(list(pdf_iter))
    ts = np.concatenate(
        [
            np.asarray(list(s_ts), dtype=np.int64),
            batch["ts"].to_numpy().astype("int64"),
        ]
    )
    eid = np.concatenate(
        [
            np.asarray(list(s_eid), dtype=np.int64),
            batch["event_id"].to_numpy().astype("int64"),
        ]
    )
    cents = np.concatenate(
        [
            np.asarray(list(s_cents), dtype=np.int64),
            batch["cents"].to_numpy().astype("int64"),
        ]
    )
    # newest first by (ts, event_id); keep the top K — bounded state
    order = np.lexsort((eid, ts))[::-1][:K]
    ts, eid, cents = ts[order], eid[order], cents[order]
    state.update((ts.tolist(), eid.tolist(), cents.tolist()))
    # exact bigint arithmetic: weight 2^(K-1-j) for the j-th newest —
    # Python ints (the cents are bounded, but keep the old exactness)
    num = sum(int(c) << (K - 1 - j) for j, c in enumerate(cents))
    yield pd.DataFrame(
        [(user_id, len(cents), num)],
        columns=["user_id", "n_scored", "num_q"],
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
