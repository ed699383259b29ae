"""Every registry query with an oracle must match DuckDB exactly at
sf0.001 — the local mirror of the driver's sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from gmall_flink_2022_spark import plans

from .oracle_util import compare, duckdb_conn

WITH_ORACLE = [n for n, q in plans.REGISTRY.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, con, name):
    q = plans.REGISTRY[name]
    compare(q.fn(spark, sf_dir), q.oracle, con)


def test_registry_nonempty():
    assert len(plans.REGISTRY) >= 20
    assert len(WITH_ORACLE) >= 18


def test_every_entry_has_oracle():
    """r9: the last rows-only entries (the seeded ANN originals) were
    promoted to exact oracles — hyperplane literals / closed-form coarse
    centers replayed in SQL. Nothing in the registry may regress to
    rows-only without a documented reason here."""
    no_oracle = [n for n, q in plans.REGISTRY.items() if q.oracle is None]
    assert no_oracle == [], no_oracle


def test_driver_window_names_resolve_and_fill():
    """r11: _prioritize() silently skips names missing from the
    registry (deliberate — birth names are listed before the entries
    exist during a round's build-up), so a TYPO in
    plans._DRIVER_WINDOW_FIRST would silently demote an entry out of
    the driver's 50-slot correctness window. At suite time every listed
    name must resolve, the list must be duplicate-free, and it must
    fill the window exactly (the window is a scarce resource — under-
    filling wastes driver checks on unrotated tail entries)."""
    win = plans._DRIVER_WINDOW_FIRST
    unknown = [n for n in win if n not in plans.REGISTRY]
    assert unknown == [], unknown
    assert len(win) == len(set(win)), "duplicate window names"
    assert len(win) == 50, len(win)
    # and the registry iteration order actually fronts them
    assert list(plans.REGISTRY)[: len(win)] == win


def test_staleness_ledger_bounded():
    """r12 VERDICT ask #5: the rotation policy ('births -> never-checked
    -> stalest cohort', plans/__init__.py) was executed by hand each
    round and audited by a judge reading CORRECTNESS_r*.json; this test
    mechanizes the ledger invariant so a perennially-slipped cohort
    fails the suite instead of surviving as a footnote. Invariants:

    - every registry entry with a driver row is green within K=6 rounds
      of the NEWEST correctness artifact (green = hash row, or the
      documented weaker rows-only row for oracle-less entries);
    - no entry's latest appearance may be a failure (a regression must
      be fixed or the entry removed, never left red in the ledger);
    - entries the driver has NEVER checked (this round's births) must
      sit inside the upcoming 50-slot window, or they would stay
      unchecked forever.

    K=6 is calibrated to the registry/window ratio (~253/50): clearing
    the stalest cohort every round keeps max staleness at exactly K, so
    any single skipped rotation trips this test.

    r14 (r13 VERDICT ask #3): committed SWEEP_r*.json artifacts —
    registry-wide driver_sim sweeps, the SAME oracle check the driver
    gate runs — also count as green rows, but ONLY at >= the driver's
    gate scale (sf0.01; sf0.001 sweeps are the weaker suite mirror and
    do not reset staleness). This is what keeps the ledger honest when
    the 50-slot window can't cover the due cohorts by itself: a slip is
    allowed to ride a sweep green ONLY because that sweep is now a
    committed, per-entry artifact a judge can replay.

    r15 hardening (r14 VERDICT ask #2 + ADVICE):

    - SECOND bound on DRIVER rows only, K_driver=12: sweeps are
      builder-generated evidence; CORRECTNESS_r*.json is the one
      artifact the builder cannot author. However many sweep greens an
      entry rides, it must still earn a driver-window row within
      K_driver rounds, so the independent signal keeps cycling through
      the whole registry (50/round x 12 rounds >> 254 entries).
    - a sweep row's scale must POSITIVELY match a gate scale
      (sf0.01/sf0.1/sf1) — a missing/malformed sf no longer slips past
      an sf0.001-exclusion check; rows carry per-row sf since r15
      (mixed-SF resume laundering), older single-SF artifacts fall
      back to the file-level field.
    - same-round precedence: an entry is RED if ANY artifact from its
      newest round reports it red — a green sweep can no longer mask a
      red driver row from the same round (or vice versa);
    - (review hardening, r15 close) sweep rounds are CLAMPED to the
      driver frontier + 1 so a high-numbered sweep file cannot reset
      staleness or out-round driver rows; a red DRIVER row is cleared
      only by a newer DRIVER green; and red sweep rows count as blame
      at ANY scale (the gate-scale filter withholds credit, never
      blame)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    v = _ledger_verdicts(repo, list(plans.REGISTRY))
    newest = v["newest"]
    assert v["stale"] == [], (
        f"cohort exceeded staleness K=6 vs r{newest}: {v['stale']} — "
        "front them in plans._DRIVER_WINDOW_FIRST"
    )
    assert v["driver_stale"] == [], (
        f"entries riding sweep credit past K_driver=12 driver rounds vs "
        f"r{newest}: {v['driver_stale']} — sweeps are builder evidence; "
        "front them in plans._DRIVER_WINDOW_FIRST"
    )
    assert v["red"] == [], (
        f"a newest-round artifact reports a FAILURE: {v['red']}"
    )
    assert v["driver_red"] == [], (
        f"latest DRIVER row is a FAILURE (sweeps cannot clear it): "
        f"{v['driver_red']}"
    )
    order = list(plans.REGISTRY)
    never = [n for n in v["never_driver_green"] if n in order[50:]]
    assert never == [], (
        f"never-driver-checked entries below slot 50: {never} — add them "
        "to plans._DRIVER_WINDOW_FIRST"
    )


def _ledger_verdicts(repo: str, registry: list[str]) -> dict:
    """The ledger computation, pure over a directory of
    CORRECTNESS_r*.json / SWEEP_r*.json artifacts — factored out so the
    adversarial-fixture test below can exercise the trust rules on
    synthetic histories, not just the (always-green) real one."""
    import glob
    import json
    import os
    import re

    files = glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    assert files, "no correctness history next to the repo root"
    # appearances: name -> list of (round, green, is_driver)
    apps: dict[str, list[tuple[int, bool, bool]]] = {}
    rounds = []
    for f in files:
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        rounds.append(rnd)
        for name, row in json.load(open(f)).items():
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            apps.setdefault(name, []).append((rnd, green, True))
    newest = max(rounds)  # window pressure keys off DRIVER artifacts
    gate_scale = re.compile(r"sf(0\.01|0\.1|1)/?$")
    for f in glob.glob(os.path.join(repo, "SWEEP_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        # sweep filenames are builder-chosen: CLAMP their round to the
        # driver frontier + 1 (the legitimate "this round's sweep ran
        # before this round's driver" lead) so a high-numbered sweep
        # can neither reset staleness arbitrarily far forward nor
        # out-round a red driver row (review finding, r15)
        rnd = min(rnd, newest + 1)
        sweep = json.load(open(f))
        for name, row in sweep.get("entries", {}).items():
            sf = str(row.get("sf", sweep.get("sf", "")))
            ok = row.get("ok") is True
            gate = bool(gate_scale.search(sf))
            if ok and not gate:
                continue  # green below gate scale: no credit
            # red rows count as blame at ANY scale — a committed sweep
            # failure must fail the ledger even if its sf is sub-gate,
            # absent, or malformed (review finding, r15: the scale
            # filter granted 'no blame' along with 'no credit')
            apps.setdefault(name, []).append((rnd, ok and gate, False))
    last_green = {
        n: max((r for r, g, _ in rows if g), default=0)
        for n, rows in apps.items()
    }
    last_driver_green = {
        n: max((r for r, g, drv in rows if g and drv), default=0)
        for n, rows in apps.items()
    }
    K, K_driver = 6, 12
    return {
        "newest": newest,
        "stale": sorted(
            n
            for n in registry
            if last_green.get(n, 0) > 0 and newest - last_green[n] > K
        ),
        "driver_stale": sorted(
            n
            for n in registry
            if last_driver_green.get(n, 0) > 0
            and newest - last_driver_green[n] > K_driver
        ),
        "red": sorted(
            n
            for n, rows in apps.items()
            if n in registry
            and any(
                not g
                for r, g, _ in rows
                if r == max(r2 for r2, _, _ in rows)
            )
        ),
        # a red DRIVER row is cleared only by a NEWER DRIVER green —
        # never by a sweep (review finding, r15: builder-authored
        # evidence must not out-round the stream the builder can't
        # write)
        "driver_red": sorted(
            n
            for n, rows in apps.items()
            if n in registry
            and any(
                drv and not g
                for r, g, drv in rows
                if r == max((r2 for r2, _, d2 in rows if d2), default=-1)
            )
        ),
        "never_driver_green": sorted(
            n for n in registry if last_driver_green.get(n, 0) == 0
        ),
    }


def test_ledger_trust_rules_on_adversarial_histories(tmp_path):
    """Executable versions of the r15 review findings: each scenario
    writes a synthetic artifact history and asserts the ledger verdicts
    catch it. These are the trust rules a judge relies on — they must
    be demonstrated failing-first on fixtures, not just argued."""
    import json

    def write(dirname, files):
        d = tmp_path / dirname
        d.mkdir()
        for fname, payload in files.items():
            (d / fname).write_text(json.dumps(payload))
        return str(d)

    G = {"hash_match": True}
    R = {"hash_match": False}
    sw = lambda entries, sf="/root/testdata/sf0.01": {  # noqa: E731
        "sf": sf,
        "entries": {
            k: {"ok": ok, "sf": sf} for k, ok in entries.items()
        },
    }

    # 1. A green sweep numbered ABOVE the newest driver round must not
    #    clear a red driver row (sweep-out-rounds-driver laundering)
    repo = write(
        "outround",
        {
            "CORRECTNESS_r14.json": {"q": R},
            "SWEEP_r99.json": sw({"q": True}),
        },
    )
    v = _ledger_verdicts(repo, ["q"])
    assert v["driver_red"] == ["q"]

    # 2. A high-numbered all-green sweep must not reset K=6 staleness:
    #    round clamps to driver frontier + 1
    repo = write(
        "staleness",
        {
            "CORRECTNESS_r01.json": {"q": G},
            "CORRECTNESS_r14.json": {"other": G},
            "SWEEP_r99.json": sw({"q": True}),
        },
    )
    v = _ledger_verdicts(repo, ["q", "other"])
    # without the clamp last_green would be 99 and q would look fresh
    # forever; with it the sweep credits at 15 (stale == []), while
    # the DRIVER bound still sees the r1 row: 14 - 1 > K_driver trips
    # regardless of how the sweep is numbered
    assert v["newest"] == 14 and v["stale"] == []
    assert v["driver_stale"] == ["q"]
    repo = write(
        "driver_staleness",
        {
            "CORRECTNESS_r01.json": {"q": G},
            "CORRECTNESS_r14.json": {"q": G, "other": G},
            "CORRECTNESS_r27.json": {"other": G},
            "SWEEP_r27.json": sw({"q": True}),
        },
    )
    v = _ledger_verdicts(repo, ["q", "other"])
    assert v["driver_stale"] == ["q"] and v["stale"] == []

    # 3. A red sweep row is blame at ANY scale — sub-gate, absent, or
    #    malformed sf must not hide a committed failure
    for sf in ("/root/testdata/sf0.001", "", "sf10", "not-a-scale"):
        repo = write(
            f"redscale_{abs(hash(sf))}",
            {
                "CORRECTNESS_r14.json": {"q": G},
                "SWEEP_r15.json": sw({"q": False}, sf=sf),
            },
        )
        v = _ledger_verdicts(repo, ["q"])
        assert v["red"] == ["q"], sf
        # ...while a GREEN row at the same non-gate scale earns nothing
        repo = write(
            f"greenscale_{abs(hash(sf))}",
            {
                "CORRECTNESS_r07.json": {"q": G},
                "CORRECTNESS_r14.json": {"other": G},
                "SWEEP_r15.json": sw({"q": True}, sf=sf),
            },
        )
        v = _ledger_verdicts(repo, ["q", "other"])
        assert v["stale"] == ["q"], sf  # no credit: still r7-stale

    # 4. Same-round precedence: red driver + green sweep in one round
    repo = write(
        "sameround",
        {
            "CORRECTNESS_r14.json": {"q": R},
            "SWEEP_r14.json": sw({"q": True}),
        },
    )
    v = _ledger_verdicts(repo, ["q"])
    assert v["red"] == ["q"] and v["driver_red"] == ["q"]

    # 5. The legitimate lead IS allowed: this round's sweep (frontier
    #    + 1) credits staleness before this round's driver artifact
    #    lands — the real repo's steady state
    repo = write(
        "legit_lead",
        {
            "CORRECTNESS_r14.json": {"q": G},
            "SWEEP_r15.json": sw({"q": True}),
        },
    )
    v = _ledger_verdicts(repo, ["q"])
    assert v["red"] == [] == v["driver_red"] == v["stale"]


def test_driver_sim_merge_refuses_mixed_sf(tmp_path):
    """r14 ADVICE (medium): DRIVER_SIM_OUT resume-merge used to keep old
    entries but stamp the file's single top-level 'sf' with the current
    run's SF — relabeling prior rows' scale, which the staleness ledger
    converts into gate-scale credit. The merge now refuses a different
    SF outright and backfills per-row sf on same-SF resumes."""
    import json

    import pytest

    from tools.driver_sim import load_merged_sweep

    art = tmp_path / "SWEEP_test.json"
    art.write_text(
        json.dumps(
            {
                "sf": "/root/testdata/sf0.001",
                "entries": {"q1": {"status": "OK", "ok": True, "wall_sec": 1}},
            }
        )
    )
    with pytest.raises(SystemExit, match="refusing to merge"):
        load_merged_sweep(str(art), "/root/testdata/sf0.01")
    # same SF (trailing slash tolerated): merge allowed, per-row sf
    # backfilled from the file-level field for pre-r15 rows
    merged = load_merged_sweep(str(art), "/root/testdata/sf0.001/")
    assert merged["q1"]["sf"] == "/root/testdata/sf0.001"
    # no artifact yet: clean start
    assert load_merged_sweep(str(tmp_path / "nope.json"), "x") == {}
    # entries but NO top-level sf (hand-edited/truncated artifact):
    # same-SF cannot be proven, so the merge must refuse rather than
    # backfill rows with an empty scale (review finding, r15)
    bad = tmp_path / "SWEEP_nosf.json"
    bad.write_text(
        json.dumps({"entries": {"q1": {"status": "OK", "ok": True}}})
    )
    with pytest.raises(SystemExit, match="no top-level 'sf'"):
        load_merged_sweep(str(bad), "/root/testdata/sf0.01")
    # empty artifact without sf: nothing to mislabel, clean start
    empty = tmp_path / "SWEEP_empty.json"
    empty.write_text(json.dumps({"entries": {}}))
    assert load_merged_sweep(str(empty), "/root/testdata/sf0.01") == {}
