#!/usr/bin/env python
"""Oracle-check NAMED registry entries (driver_sim's harness, but for an
explicit entry list instead of the first-50 window) — the per-fix
verification loop: ``python tools/check_entries.py entry1 entry2 ...``.
Honors SPARK_GRAFT_TEST_SF like driver_sim."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.driver_sim import (  # noqa: E402
    SF,
    _release_session_state,
    canon_rows,
)


def main(names: list[str]) -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as mod
    from tests.oracle_util import apply_duckdb_limits

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # same heap + per-entry residue release as driver_sim (r13
        # ADVICE: a long explicit list at SPARK_GRAFT_TEST_SF=sf0.1 hit
        # the same cached-frame/localCheckpoint OOM driver_sim fixed)
        .config(
            "spark.driver.memory",
            os.environ.get("DRIVER_SIM_MEM", "16g"),
        )
        .getOrCreate()
    )
    qs, osql = mod.queries(), mod.oracle_sql()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown entries:", unknown)
        sys.exit(2)
    con = duckdb.connect()
    apply_duckdb_limits(con)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    bad = []
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
    print("\nFAILED:" if bad else "\nALL GREEN", bad if bad else "")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
