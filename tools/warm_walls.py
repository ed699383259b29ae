#!/usr/bin/env python
"""Warm standalone ENGINE walls for named entries — the r16
optimization round's per-entry evidence harness (guide §1.4): each
entry's DataFrame runs to the noop sink (computes every column, no
driver collect) ``SPARK_GRAFT_BENCH_REPS`` times (default 3) after one
sf0.001 warmup, reporting all samples + the median. Timing excludes the
DuckDB oracle entirely, unlike sweep/check_entries walls.

    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
        python tools/warm_walls.py entry1 entry2 ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_2022_spark import plans  # noqa: E402
from gmall_flink_2022_spark.session import get_spark  # noqa: E402


def main(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("gmall_warm_walls")
    out: dict[str, dict] = {}
    for name in names:
        q = plans.REGISTRY[name]
        try:
            q.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 — warmup best-effort
            pass
        spark.catalog.clearCache()
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 2))
        spark.catalog.clearCache()
        out[name] = {"samples": samples, "median": round(statistics.median(samples), 2)}
        print(f"{name}: median {out[name]['median']}s {samples}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
