"""UV dedup on the transformWithStateInPandas API (Spark 4's successor to
applyInPandasWithState) — same semantics as streaming/uv_state.py, showing
the engine tracks the modern stateful surface. The reference semantics:
per-key last-seen-date ValueState, emit only on date rollover
(dwm/UniqueVisitApp.java:35-71)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # the API is new in Spark 4; gate for older runtimes
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False


def tws_runtime_available() -> bool:
    """The TWS Python runner needs a working protobuf install; this
    container ships a broken one (`cannot import name 'descriptor'`), so
    the operator is gated — applyInPandasWithState (uv_state.py) is the
    production path until the environment provides protobuf."""
    if not HAS_TWS:
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("dt", T.StringType()),
        T.StructField("first_ts", T.TimestampType()),
    ]
)


class UVProcessor(StatefulProcessor):
    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._last = handle.getValueState(
            "last_date", T.StructType([T.StructField("d", T.StringType())])
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last = self._last.get()[0] if self._last.exists() else None
        pdf = pd.concat(list(rows)).sort_values("ts")
        if not len(pdf):
            self._last.update((last,))
            return
        # vectorized date-transition mask, mirroring uv_state._apply
        import numpy as np

        d = pdf["ts"].dt.strftime("%Y-%m-%d").to_numpy(dtype=object)
        prev = np.empty_like(d)
        prev[0] = last if last is not None else "\0"
        prev[1:] = d[:-1]
        sel = pdf.loc[d != prev]
        self._last.update((str(d[-1]),))
        if len(sel):
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(sel), int(user_id), dtype="int64"),
                    "dt": sel["ts"].dt.strftime("%Y-%m-%d"),
                    "first_ts": sel["ts"],
                }
            )

    def close(self) -> None:
        pass


def unique_visit_tws(events: DataFrame, key: str = "user_id") -> DataFrame:
    """events(user_id, ts) -> first visit per key per day via
    transformWithStateInPandas (streaming only)."""
    if not tws_runtime_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs Spark >= 4 AND a working "
            "protobuf install (absent in this container); use "
            "streaming.uv_state.unique_visit_stateful instead"
        )
    return events.groupBy(key).transformWithStateInPandas(
        statefulProcessor=UVProcessor(),
        outputStructType=OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
