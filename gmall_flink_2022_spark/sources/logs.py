"""Behavior-log parsing with dirty-split (SURVEY §2.2 P1).

Reference: gmall-realtime/.../dwd/BaseLogApp.java:32-44 — try-parse each JSON
line, route parse failures to a `Dirty` side output. Spark-native rendering:
``from_json`` with PERMISSIVE mode + a corrupt-record column; one declarative
plan, two filtered derivatives (clean / dirty) — Catalyst shares the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..schemas import LOG_EVENT


def parse_logs(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """raw JSON-line DataFrame -> parsed struct columns + ``_corrupt``.

    ``clean = out.filter(col('_corrupt').isNull())`` and
    ``dirty = out.filter(col('_corrupt').isNotNull())`` are the two
    side-outputs of the reference's ProcessFunction.
    """
    parsed = raw.withColumn(
        "j",
        F.from_json(
            F.col(value_col),
            LOG_EVENT,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    out = parsed.select(
        F.col(value_col).alias("_raw"),
        F.col("j.common").alias("common"),
        F.col("j.page").alias("page"),
        F.col("j.displays").alias("displays"),
        F.col("j.start").alias("start"),
        F.col("j.ts").alias("ts"),
        F.col("j._corrupt").alias("_corrupt"),
    )
    # PERMISSIVE quirk: empty/whitespace input parses to an all-null row
    # with NO corrupt marker — the reference's JSON.parseObject would throw
    # (dirty). Flag whole-null parses as dirty too.
    null_parse = (
        F.col("common").isNull()
        & F.col("page").isNull()
        & F.col("start").isNull()
        & F.col("ts").isNull()
    )
    return out.withColumn(
        "_dirty", F.col("_corrupt").isNotNull() | null_parse
    )


def clean_logs(parsed: DataFrame) -> DataFrame:
    return parsed.filter(~F.col("_dirty")).drop("_raw", "_corrupt", "_dirty")


def dirty_logs(parsed: DataFrame) -> DataFrame:
    """The dirty side-output, carrying the original raw line
    (BaseLogApp routes the unparsed string, :43)."""
    return parsed.filter(F.col("_dirty")).select(F.col("_raw").alias("value"))
