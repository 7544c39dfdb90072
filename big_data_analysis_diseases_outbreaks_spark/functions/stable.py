"""Cross-engine bit-stable aggregation helpers.

Problem: floating-point SUM/AVG/STDDEV are association-order dependent.
Spark accumulates per partition then merges; DuckDB uses segment trees
for windows — the two can differ in the last ulp. That is harmless for
"arbitrary real" data, but our pipeline values are *decimal-aligned*
(2-dp inputs, 4-dp rounded intermediates), so true means/averages land
EXACTLY on round(…, 4) boundaries all the time (e.g. a 2-dp sum divided
by 8 ends in …5 at the 5th decimal) and one-ulp differences flip the
rounded output.

Fix: scale the (exactly-decimal) values to integers, aggregate the
integers (exact, associative, order-independent), and apply one final
float division — identical IEEE ops on identical operands on both
engines ⇒ identical doubles ⇒ identical rounding. The DuckDB twins in
this module mirror the Spark expressions *operation by operation*.

This is also the numerically-right choice at 100 TB: long sums don't
lose precision across millions of partial aggregates the way float sums
do.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled_long(col: Column, scale: int) -> Column:
    """Exact integer representation of a decimal-aligned double."""
    return F.round(col * scale, 0).cast("long")


def scaled_long_sql(expr: str, scale: int) -> str:
    return f"CAST(ROUND(({expr}) * {scale}) AS BIGINT)"


# --- grouped-aggregation context (use inside .agg / GROUP BY) -------------


def stable_mean(vs: Column, scale: int) -> Column:
    return F.sum(vs).cast("double") / (F.count(F.lit(1)) * F.lit(float(scale)))


def stable_mean_sql(vs: str, scale: int) -> str:
    return f"CAST(SUM({vs}) AS DOUBLE) / (COUNT(*) * {float(scale)})"


def stable_std(vs: Column, scale: int) -> Column:
    """Sample stddev from exact integer sums (guarding n=1 → NULL and
    negative cancellation → 0), mirrored by :func:`stable_std_sql`."""
    s1 = F.sum(vs).cast("double")
    s2 = F.sum(vs * vs).cast("double")
    n = F.count(F.lit(1))
    var = (s2 - s1 * s1 / n) / F.nullif(n - F.lit(1), F.lit(0))
    return F.sqrt(F.greatest(var, F.lit(0.0))) / F.lit(float(scale))


def stable_std_sql(vs: str, scale: int) -> str:
    s1 = f"CAST(SUM({vs}) AS DOUBLE)"
    s2 = f"CAST(SUM(({vs}) * ({vs})) AS DOUBLE)"
    return (
        f"SQRT(GREATEST(({s2} - {s1} * {s1} / COUNT(*))"
        f" / NULLIF(COUNT(*) - 1, 0), 0.0)) / {float(scale)}"
    )


# --- window context (pass a WindowSpec) -----------------------------------


def stable_mean_over(vs: Column, scale: int, w) -> Column:
    return F.sum(vs).over(w).cast("double") / (
        F.count(F.lit(1)).over(w) * F.lit(float(scale))
    )


def stable_std_over(vs: Column, scale: int, w) -> Column:
    s1 = F.sum(vs).over(w).cast("double")
    s2 = F.sum(vs * vs).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    var = (s2 - s1 * s1 / n) / F.nullif(n - F.lit(1), F.lit(0))
    return F.sqrt(F.greatest(var, F.lit(0.0))) / F.lit(float(scale))
