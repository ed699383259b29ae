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
    for name, q in plans.REGISTRY.items():
        if q.oracle is None:
            assert q.fn(spark, sf_dir).count() >= 0, name
