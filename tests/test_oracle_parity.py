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
