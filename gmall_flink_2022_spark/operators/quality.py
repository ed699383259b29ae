"""Data-quality audit operators — the Deequ / Great Expectations shape:
constraint verification and profiling as DECLARATIVE AGGREGATIONS over
the fact tables, one scan per table, so a 100 TB quality gate costs one
pass with map-side partial aggregation and a few-row result.

Reference analog: the dirty-data side-output path (dwd/BaseLogApp.java's
dirty-tag try/catch) generalized from "count the unparseable" to a full
rule surface.

Three surfaces:
- ``profile_columns``: per-column null / distinct counts (the schema
  drift + completeness signal). One job; n_distinct via one aggregation
  per column UNION'd — each is its own map-side-combined pass, all over
  the same cached scan at 100 TB you'd use approx_count_distinct (the
  exact form is the oracle-checkable contract here).
- ``referential_orphans``: anti-join cardinalities for declared foreign
  keys (fact rows whose dim row is missing) — LEFT ANTI hash joins, the
  build side is the key projection only.
- ``check_rules``: row-level predicates folded into ONE aggregate pass
  (sum(when(violated,1)) per rule) — zero extra scans per added rule.

All outputs are engine-exact (counts only, no floats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct) per requested column.
    n_distinct excludes NULL (count(distinct col) semantics, identical
    in Spark and ANSI SQL).

    ONE scan for the whole profile: all columns fold into a single wide
    aggregate (Catalyst plans the multi-distinct via Expand — rows
    multiply by n_cols inside the pipeline, but the table is read once
    and each expanded stream partial-aggregates map-side), then the
    one-row result explodes to the per-column report."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nn_{i}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{i}"))
    wide = df.agg(*aggs)
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"nn_{i}").alias("n_nulls"),
                        F.col(f"nd_{i}").alias("n_distinct"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("r")
    ).select("r.column_name", "r.n_rows", "r.n_nulls", "r.n_distinct")


def referential_orphans(
    checks: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Each check = (name, fact, fact_key, dim, dim_key); output one row
    (check_name, orphan_ct) counting fact rows with no matching dim row.
    LEFT ANTI join on the key projection — the dim side carries one
    column into the build."""
    parts = []
    for name, fact, fk, dim, dk in checks:
        orphans = fact.select(F.col(fk).alias("k")).join(
            dim.select(F.col(dk).alias("k")).distinct(), "k", "left_anti"
        )
        parts.append(
            orphans.agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).alias("orphan_ct"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def check_rules(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Rule surface: each rule = (name, violation_predicate). ONE
    aggregate pass produces (rule_name, n_rows, n_violations) for every
    rule — adding a rule adds a column to the partial aggregate, not a
    scan. NULL predicate results count as violations (fail closed)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0))
        .cast("long")
        .alias(f"v_{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule_name"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"v_{i}").alias("n_violations"),
                    )
                    for i, (name, _) in enumerate(rules)
                ]
            )
        ).alias("r")
    )
    return stacked.select("r.rule_name", "r.n_rows", "r.n_violations")
