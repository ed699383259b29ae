"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``gmall_flink_2022_spark.plans`` — the engine's query
registry. Each registry entry is one implemented operator from
SURVEY.md §2 (or an LLM-pipeline extension), paired where
SQL-expressible with a DuckDB oracle computing the identical result.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmall_flink_2022_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary over lineitem) at sf0.001."""
    return plans.REGISTRY["dws_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()
