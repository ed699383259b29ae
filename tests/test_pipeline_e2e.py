"""End-to-end layer test (SURVEY §5 item 2): raw log JSON -> DWD split ->
DWM UV/bounce -> DWS visitor_stats, asserted against hand-computed goldens
on a 6-event fixture."""

from __future__ import annotations

import json

from pyspark.sql import Row

from gmall_flink_2022_spark import pipelines

BASE = 1718000000000  # 2024-06-10 06:13:20 UTC


def _line(mid, ts, page_id, last=None, dur=1000, vc="v2", ch="web", ar="110000", new="0"):
    return json.dumps(
        {
            "common": {"mid": mid, "vc": vc, "ch": ch, "ar": ar, "is_new": new},
            "page": {"page_id": page_id, "last_page_id": last, "during_time": dur},
            "ts": ts,
        }
    )


LINES = [
    # m1: entry at t+0 (uv + sv), next page 3s later (no bounce), same day
    _line("m1", BASE, "home"),
    _line("m1", BASE + 3000, "good_detail", last="home"),
    # m2: entry at t+0, next event is ANOTHER entry 5s later -> first bounces;
    # second entry has no successor within 10s -> also bounces (timeout)
    _line("m2", BASE, "home"),
    _line("m2", BASE + 5000, "home"),
    # m3: single entry, no successor -> bounce; also a uv
    _line("m3", BASE + 1000, "home"),
    # dirty line
    "{nope",
]


def test_full_log_pipeline(spark):
    raw = spark.createDataFrame([Row(value=s) for s in LINES])
    dwd = pipelines.dwd_layer(raw)
    page = dwd["page"]
    assert page.count() == 5  # dirty line dropped at the DWD gate

    uv = pipelines.dwm_unique_visit(page)
    # one UV per mid (all same day): m1, m2, m3
    assert sorted(r["mid"] for r in uv.collect()) == ["m1", "m2", "m3"]

    uj = pipelines.dwm_user_jump(page, gap_seconds=10)
    uj_rows = sorted((r["mid"], r["event_time"].isoformat()) for r in uj.collect())
    # m2 bounces twice, m3 once; m1 does not bounce
    assert [m for m, _ in uj_rows] == ["m2", "m2", "m3"]

    stats = pipelines.dws_visitor_stats(page, uv, uj, window_seconds=11)
    # single dim combo (v2, web, 110000, 0): all events within one or two
    # 11s windows starting at BASE; aggregate over all windows:
    total = (
        stats.groupBy("vc", "ch", "ar", "is_new")
        .sum("uv_ct", "pv_ct", "sv_ct", "uj_ct", "dur_sum")
        .collect()
    )
    assert len(total) == 1
    r = total[0]
    assert r["sum(pv_ct)"] == 5
    assert r["sum(uv_ct)"] == 3
    assert r["sum(sv_ct)"] == 4  # four entry pages (m1, m2 x2, m3)
    assert r["sum(uj_ct)"] == 3
    assert r["sum(dur_sum)"] == 5000
    # window bounds stamped in the reference's format
    one = stats.limit(1).collect()[0]
    assert len(one["stt"]) == 19 and len(one["edt"]) == 19