#!/usr/bin/env python
"""Driver-gate simulation: run the FIRST-50 registry window the way the
round driver does (vanilla session, sf0.01, DuckDB oracle side-by-side,
sorted-column value hash) and report per-entry status. De-risks the
round's CORRECTNESS artifact before the real driver runs.

``DRIVER_SIM_OUT=SWEEP_r14.json`` (r13 VERDICT ask #3) additionally
writes the sweep as a committable artifact — per-entry status + wall +
scale — so registry-wide sweeps (``DRIVER_SIM_N=254``) leave a
verifiable record instead of commit-message prose, and oracle walls
(editdist, simhash) can be tracked across rounds. With DRIVER_SIM_SKIP
resume, an existing artifact is MERGED (re-run entries overwrite their
rows; others are kept) so a multi-run sweep accumulates one file —
but only at the SAME SF (see :func:`load_merged_sweep`)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
N = int(os.environ.get("DRIVER_SIM_N", "50"))
SKIP = int(os.environ.get("DRIVER_SIM_SKIP", "0"))
OUT = os.environ.get("DRIVER_SIM_OUT", "")


def load_merged_sweep(out_path: str, sf: str) -> dict[str, dict]:
    """Resume-merge guard (r14 ADVICE, medium): the old merge kept prior
    entries but stamped the file's single top-level ``sf`` with the
    CURRENT run's SF — silently relabeling prior rows' scale, and the
    staleness ledger grants gate-scale credit from exactly that field.
    Now (a) every row carries its own ``sf`` (the ledger filters
    per-row) and (b) resuming into an artifact recorded at a DIFFERENT
    SF is refused outright instead of laundering mixed-scale rows."""
    if not (out_path and os.path.exists(out_path)):
        return {}
    prev = json.load(open(out_path))
    prev_sf = prev.get("sf", "")
    entries = prev.get("entries", {})
    if entries and not prev_sf:
        # unknown prior scale (hand-edited/truncated artifact): same-SF
        # cannot be proven, so refusing is the only non-laundering move
        raise SystemExit(
            f"refusing to merge into {out_path}: it has entries but no "
            "top-level 'sf', so the prior rows' scale is unknown; use a "
            "new DRIVER_SIM_OUT path"
        )
    if prev_sf and prev_sf.rstrip("/") != sf.rstrip("/"):
        raise SystemExit(
            f"refusing to merge into {out_path}: it was recorded at "
            f"sf={prev_sf!r} but this run is sf={sf!r} — a mixed-SF "
            "artifact would mislabel prior rows' scale; use a new "
            "DRIVER_SIM_OUT path"
        )
    for row in entries.values():  # pre-r15 rows: backfill from top-level
        row.setdefault("sf", prev_sf)
    return entries


def _release_session_state(spark) -> None:
    """Drop per-entry session residue between entries (r13): a long
    sweep accumulates persisted frames + localCheckpoint blocks from
    every prior entry in the ONE local-mode JVM — at sf0.1 the
    registry-wide sweep OOMed a default-heap driver at entry ~172 on
    residue alone. The real driver gate runs 50 entries and never hits
    this; the tool clears anyway so sweeps measure entries, not
    accumulation. (localCheckpoint RDDs are unreferenced after each
    toPandas — clearing the cache and asking for a GC cycle lets the
    ContextCleaner drop their blocks.)"""
    try:
        spark.catalog.clearCache()
        from gmall_flink_2022_spark.llm import cachereg

        cachereg.release_all()
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 — cleanup is best-effort
        pass


def canon_rows(pdf) -> list[tuple]:
    """Canonical sorted row tuples for comparison (r7 ADVICE: dtype-aware,
    not astype(str) — float32-vs-float64 promotion, -0.0 and NaN repr
    differences must not flip the verdict). Numeric float columns are
    widened to float64, -0.0 normalized, and rendered at 12 significant
    digits (the repo's oracles avoid order-dependent float accumulation,
    so agreement far beyond 12 digits is the contract; 12 absorbs the
    last-ulp-ish noise a widening cast introduces). Everything else
    compares as str, with datetimes ISO-formatted by pandas."""
    import numpy as np

    cols = sorted(pdf.columns)
    out = []
    for c in cols:
        s = pdf[c]
        if s.dtype.kind == "f":
            v = s.astype("float64").to_numpy(copy=True)
            v[v == 0.0] = 0.0  # -0.0 -> 0.0
            out.append(["NaN" if np.isnan(x) else f"{x:.12g}" for x in v])
        elif s.dtype.kind in "iu":
            out.append([str(int(x)) for x in s.to_numpy()])
        else:
            out.append(s.astype(str).tolist())
    return sorted(zip(*out)) if out else []


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as mod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # a real heap for 10x sweeps (r13): at sf0.1 the HLL-per-group
        # entries (stream_product_stats_scale: ~600k (day, partkey)
        # groups x a ~4 KB sketch) legitimately need multi-GB streaming
        # state — the documented bounded-per-group trade, sized for real
        # executors, not the 1g JVM default this tool inherited
        .config(
            "spark.driver.memory",
            os.environ.get("DRIVER_SIM_MEM", "16g"),
        )
        .getOrCreate()
    )
    qs, osql = mod.queries(), mod.oracle_sql()
    from tests.oracle_util import apply_duckdb_limits

    con = duckdb.connect()
    # bound the oracle side so a scale-exploding oracle fails ITS row,
    # not the host — limits shared with tests/oracle_util.py (r11 ADVICE)
    apply_duckdb_limits(con)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    names = list(qs)[SKIP : SKIP + N]
    bad = []
    sweep = load_merged_sweep(OUT, SF)
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            g = qs[name](spark, SF).toPandas()
            _release_session_state(spark)
            if name in osql:
                w = con.execute(osql[name]).fetchdf()
                ok = sorted(g.columns) == sorted(w.columns) and canon_rows(
                    g
                ) == canon_rows(w)
                status = "OK" if ok else "MISMATCH"
            else:
                status = f"rows-only({len(g)})"
                ok = True
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            status, ok = f"ERR {type(e).__name__}: {e}", False
            _release_session_state(spark)
        dt = time.perf_counter() - t0
        print(f"[{i:2d}/{len(names)}] {name}: {status} ({dt:.1f}s)", flush=True)
        if not ok:
            bad.append(name)
        sweep[name] = {
            "status": status,
            "ok": ok,
            "wall_sec": round(dt, 2),
            "sf": SF,  # per-row scale: merge-proof ledger credit (r14 ADVICE)
        }
        if OUT:  # write-through so a crash/OOM keeps the partial sweep
            json.dump(
                {"sf": SF, "skip": SKIP, "n": N, "entries": sweep},
                open(OUT, "w"),
                indent=1,
            )
    print("\nFAILED:" if bad else "\nALL GREEN", bad if bad else "")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
