"""Data-layout operators: Z-order (Morton) multi-dimensional clustering.

The 100 TB problem this solves: parquet row-group / file skipping works
off per-file min/max stats, which a single-column sort only makes tight
for ONE predicate column. Interleaving the bits of several columns into
one Morton key and range-partitioning + sorting by it keeps EVERY
participating column's min/max range narrow per file, so selective
multi-dimensional predicates (user X in time range Y) skip most of the
data — the technique behind Delta Lake's OPTIMIZE ZORDER and the
classic UB-tree layout.

All integer bit arithmetic (shift/and/or folds), whole-stage codegen,
engine-exact — so the key itself is oracle-checkable. The layout step
is repartitionByRange + sortWithinPartitions on the key: ONE range
shuffle (sampled boundaries, no global sort bottleneck), the same
write shape as llm/sampling.py's TeraSort-style shuffle_order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each column into one long.

    Columns must already be non-negative integers in [0, 2^bits); callers
    bucket/rank real values first (see ``zorder_layout``). Bit i of
    column j lands at position i * n_cols + j — the standard Morton
    layout generalized to n columns. 64-bit budget: n_cols * bits <= 63.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds the 63-bit budget")
    # statically unrolled (shift amounts must be Python ints): n*bits
    # exact integer adds, one whole-stage-codegen expression
    expr = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            expr = expr + F.shiftleft(
                F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * n + j
            )
    return expr


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 16, num_files: int | None = None
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional skipping: bucket each layout
    column into [0, 2^bits) by value scaled against its (min, max), build
    the Morton key, and range-partition + sort by it. Returns the
    re-laid-out frame (write it with ``write_sink`` to materialize the
    clustered files).

    The min/max pass is a single cheap columnar aggregate broadcast back
    into the bucketing expression — no collect of data rows. NULLs
    bucket to 0 (cluster together at the low corner).
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    bounds = df.agg(*aggs)
    scaled = df.crossJoin(F.broadcast(bounds))
    top = F.lit((1 << bits) - 1)
    bucket_cols = []
    for c in cols:
        lo = F.col(f"_min_{c}").cast("double")
        hi = F.col(f"_max_{c}").cast("double")
        frac = F.when(hi > lo, (F.col(c).cast("double") - lo) / (hi - lo)).otherwise(
            F.lit(0.0)
        )
        b = F.coalesce(
            F.least(F.floor(frac * (top + 1).cast("double")).cast("long"), top),
            F.lit(0),
        )
        bucket_cols.append(b.alias(f"_zb_{c}"))
    keyed = scaled.select(
        *df.columns, zorder_key(bucket_cols, bits=bits).alias("_zval")
    )
    out = keyed.repartitionByRange(
        *([num_files, "_zval"] if num_files else ["_zval"])
    ).sortWithinPartitions("_zval")
    return out
