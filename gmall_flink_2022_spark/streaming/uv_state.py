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
    out_rows = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("ts")
        for _, row in pdf.iterrows():
            d = row["ts"].strftime("%Y-%m-%d")
            if d != last_date:
                out_rows.append((user_id, row["ts"].date(), row["ts"]))
                last_date = d
    state.update((last_date,))
    if out_rows:
        yield pd.DataFrame(out_rows, columns=["user_id", "dt", "first_ts"])


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
