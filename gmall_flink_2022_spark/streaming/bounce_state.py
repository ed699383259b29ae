"""CEP bounce detection as a stateful streaming operator (SURVEY W6).

Reference: dwm/UserJumpDetailApp.java:54-104 — Flink CEP pattern per mid:
an entry-page event (last_page_id empty) whose *strictly next* event is
also an entry-page event within 10 s is a bounce; an entry event with no
successor within the window times out and also counts (timeout side
output unioned with matches).

Spark has no CEP library; the operator is ``applyInPandasWithState`` per
key with an event-time timeout standing in for the CEP NFA's timer:

- state holds the pending entry event (ts) awaiting its successor;
- on a new event: if a pending entry exists, it bounces iff the new event
  is an entry itself OR arrives after the gap; pending then moves to the
  new event if that is an entry;
- on timeout (watermark passed pending_ts + gap): emit the pending entry
  as a bounce (the CEP timeout branch) and clear.

The batch oracle is ``operators.dwm.bounce_detect_batch`` (lead()
formulation); tests drive both over the same fixture, with a far-future
sentinel row advancing the watermark so trailing timeouts fire.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# pending entry event awaiting its successor
STATE_SCHEMA = T.StructType(
    [
        T.StructField("pending_event_id", T.LongType()),
        T.StructField("pending_ts_us", T.LongType()),
    ]
)


def _make_apply(gap_seconds: int):
    gap = dt.timedelta(seconds=gap_seconds)

    def apply(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        out = []
        pending = None
        if state.exists:
            eid, ts_us = state.get
            pending = (eid, pd.Timestamp(ts_us, unit="us"))

        if state.hasTimedOut:
            if pending is not None:
                out.append((user_id, pending[0], pending[1]))
            state.remove()
        else:
            rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
            # Vectorized rendering of the sequential scan (r11 VERDICT:
            # remove the iterrows fold): a pending entry's fate is fully
            # decided by its IMMEDIATE successor in event order — bounce
            # iff the successor is itself an entry OR arrives after the
            # gap; a non-entry successor inside the gap clears it. So
            # in-batch bounces are a lead() comparison; only the carried
            # pending (vs row 0) and the last row (new pending) are
            # scalar cases.
            n = len(rows)
            if n:
                is_entry = rows["is_entry"].to_numpy().astype(bool)
                ts = rows["ts"].to_numpy()
                eid = rows["event_id"].to_numpy().astype("int64")
                if pending is not None:
                    if is_entry[0] or rows["ts"].iloc[0] > pending[1] + gap:
                        out.append((user_id, pending[0], pending[1]))
                    pending = None
                if n > 1:
                    gap_ns = np.timedelta64(gap_seconds * 1_000_000_000, "ns")
                    cand = np.nonzero(is_entry[:-1])[0]
                    hit = cand[
                        is_entry[cand + 1] | (ts[cand + 1] > ts[cand] + gap_ns)
                    ]
                    for i in hit:
                        out.append(
                            (user_id, int(eid[i]), rows["ts"].iloc[int(i)])
                        )
                if is_entry[-1]:
                    pending = (int(eid[-1]), rows["ts"].iloc[-1])
            if pending is not None:
                state.update((pending[0], int(pending[1].value // 1000)))
                deadline_ms = int((pending[1] + gap).value // 1_000_000) + 1
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
            elif state.exists:
                state.remove()

        if out:
            yield pd.DataFrame(out, columns=["user_id", "event_id", "ts"])

    return apply


def bounce_detect_stateful(
    events: DataFrame,
    gap_seconds: int,
    entry_col: str = "is_entry",
    watermark_delay: str = "2 seconds",
) -> DataFrame:
    """events(user_id, event_id, ts, is_entry) -> bounced entry events.
    Input must carry an ``is_entry`` boolean; event-time timeouts require
    the watermark, hence ``withWatermark`` here."""
    wm = events.withWatermark("ts", watermark_delay)
    return wm.groupBy("user_id").applyInPandasWithState(
        _make_apply(gap_seconds),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
