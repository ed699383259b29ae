"""Exact-TTL UV dedup as a stateful streaming operator (SURVEY A5/W4).

Reference: dwm/UniqueVisitApp.java:35-71 — per-mid ValueState holding the
last-seen date (24 h TTL, OnCreateAndWrite); an event is emitted only when
its date differs from the stored one. The watermarked ``dropDuplicates``
rendering is simpler but has watermark-granular TTL; this operator keeps
the reference's exact per-key semantics via ``applyInPandasWithState``.

State: (last_date: str). Rows within a micro-batch are sorted by event
time before applying, so the emitted row per (key, day) is the earliest —
matching the batch oracle ``first_event_per_key_per_day``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("dt", T.DateType()),
        T.StructField("first_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("last_date", T.StringType())])


def _apply(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    last_date = state.get[0] if state.exists else None
    # one global sort over the key's batch (chunks are unordered), then
    # a vectorized date-transition mask — no per-row Python (r11 VERDICT
    # ask: the stateful folds' iterrows loops were the residual constant)
    rows = pd.concat(list(pdf_iter)).sort_values("ts")
    if len(rows):
        d = rows["ts"].dt.strftime("%Y-%m-%d").to_numpy(dtype=object)
        prev = np.empty_like(d)
        prev[0] = last_date if last_date is not None else "\0"
        prev[1:] = d[:-1]
        sel = rows.loc[d != prev]
        last_date = str(d[-1])
        state.update((last_date,))
        if len(sel):
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(sel), user_id, dtype="int64"),
                    "dt": sel["ts"].dt.date,
                    "first_ts": sel["ts"],
                }
            )
    else:
        state.update((last_date,))


def unique_visit_stateful(events: DataFrame, key: str = "user_id") -> DataFrame:
    """events(user_id, ts, ...) -> first event per key per day, emitted
    incrementally with per-key state (streaming DFs only; the batch
    equivalent is operators.dwm.first_event_per_key_per_day)."""
    return events.groupBy(key).applyInPandasWithState(
        _apply,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
