"""Query registry — the engine's public query surface.

Every implemented operator from SURVEY.md §2 (and every LLM-pipeline
extension) registers here as a (spark, sf_dir) -> DataFrame callable plus,
where SQL-expressible, a DuckDB oracle SQL string computing the identical
result on the same parquet tables. The driver's correctness gate runs both
sides and hash-compares values, so:

- every computed column is ALIASED THE SAME on both sides;
- money/measure accumulations go through DECIMAL (exact, order-independent)
  rather than floating sums (order-dependent across partitions);
- any final floating-point op is a single deterministic expression applied
  to identical inputs on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    survey_ref: str = ""  # SURVEY.md §2 row(s) this covers
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None,
    survey_ref: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QueryDef(name, fn, oracle, survey_ref, tags, bench)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
