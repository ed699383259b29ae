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


def test_rows_only_queries_run(spark, sf_dir):
    """The rows-only entries are the seeded ANN originals (top-k per
    query): beyond merely running, they must return a NON-EMPTY result
    with the contracted top-k shape — k rows per probed query — so a
    silently-broken candidate generator can't pass as 'ran fine'. Their
    QUALITY is covered by the hash-checked recall-contract twins."""
    for name, q in plans.REGISTRY.items():
        if q.oracle is None:
            df = q.fn(spark, sf_dir)
            if "query_id" in df.columns:  # ANN top-k shape
                per_query = df.groupBy("query_id").count().collect()
                assert len(per_query) > 0, f"{name} returned no rows"
                ks = {r["count"] for r in per_query}
                assert len(ks) == 1, f"{name} returned ragged top-k: {ks}"
            else:  # near-dup pair shape (can be legitimately sparse)
                rows = df.collect()
                assert {"id_a", "id_b"} <= set(df.columns), name
                assert all(r["id_a"] < r["id_b"] for r in rows), (
                    f"{name} emitted non-canonical pairs"
                )
