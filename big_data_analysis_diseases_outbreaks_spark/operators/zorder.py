"""Z-order (Morton-curve) clustering for multi-column data skipping.

Parquet/lakehouse readers prune files (and row groups) by min/max
statistics. Sorting by one column gives perfect skipping on that column
and none on any other; interleaving the bits of several columns' codes
gives every clustered column a span of roughly extent/files^(1/d) per
file, so selective predicates on ANY of them skip most files. This is
the standard layout step before large immutable writes (the same idea
as Delta/Iceberg OPTIMIZE ZORDER BY, built here from first principles
with plain DataFrame expressions — no table format required).

Everything is JVM-side integer bit arithmetic inside whole-stage
codegen; the only extra pass is a 1-row global-extent aggregate that is
broadcast to the scan (same shape as order_price_histogram).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def _quantized(col: str, bits: int) -> Column:
    """Map ``col`` into [0, 2^bits) using the broadcast global extent
    columns ``<col>__min`` / ``<col>__max`` — integer DIV throughout, so
    code assignment is deterministic and monotone."""
    span = F.col(f"{col}__max") - F.col(f"{col}__min")
    code = F.expr(
        f"(CAST(`{col}` AS BIGINT) - `{col}__min`) * {(1 << bits) - 1}"
        f" DIV (`{col}__max` - `{col}__min`)"
    )
    return F.when(span <= 0, F.lit(0)).otherwise(code)


def zorder_value(cols: list[str], bits: int = DEFAULT_BITS) -> Column:
    """Morton code: bit i of column j lands at position i*len(cols)+j.

    Requires the ``<col>__min``/``<col>__max`` extent columns added by
    :func:`zorder_repartition`. ``bits * len(cols)`` must be ≤ 63.
    """
    n = len(cols)
    terms = [
        F.shiftleft(
            F.shiftright(_quantized(c, bits), i).bitwiseAND(F.lit(1)),
            i * n + j,
        )
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return reduce(lambda a, b: a + b, terms)


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Cluster ``df`` into ``n_partitions`` output partitions along the
    Z-curve of ``cols`` (numeric columns), ready for a parquet write
    where each file covers a compact hyper-rectangle of the key space.

    ``repartitionByRange`` samples the z values to build balanced range
    bounds (one extra pass at scale — the price of even file sizes), and
    the within-partition sort keeps row groups aligned to the curve so
    row-group-level stats prune too.
    """
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed 64-bit z value")
    extent = df.agg(
        *[
            agg(F.col(c).cast("bigint")).alias(f"{c}__{suffix}")
            for c in cols
            for agg, suffix in ((F.min, "min"), (F.max, "max"))
        ]
    )
    z = df.crossJoin(F.broadcast(extent)).withColumn(
        "_z", zorder_value(cols, bits)
    )
    out = (
        z.repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"{c}__{s}" for c in cols for s in ("min", "max")])
    )
    return out
