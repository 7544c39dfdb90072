"""Deterministic wide pivot (reference ``Main.scala:212-216``:
``groupBy(date, region).pivot("kw").agg(first(value))``).

Differences from the reference, deliberate (SURVEY.md §2.F2, §7):

- **Explicit ``values=`` list** — the reference's bare ``pivot("kw")``
  triggers an eager plan-time distinct job over the fact table and makes
  the output schema data-dependent. Passing the known keyword set skips
  that scan entirely and fixes the schema (mandatory for a 100 TB scan:
  a schema-discovery pass over the full table would double the I/O).
- **``sum`` instead of ``first``** — ``first`` is order-nondeterministic
  in Spark; post-daily-aggregation the (date, region, kw) key is unique,
  so ``sum`` returns the same value deterministically and is
  oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND_DP = 4

# The 20 pseudo-keywords of the testdata mapping (FIXTURES.md), standing in
# for the reference's 20 symptoms (procucer/master/symptoms.json).
KW_VALUES = [f"kw_{i}" for i in range(20)]


def pivot_wide(
    daily: DataFrame,
    kw_values: Sequence[str] = tuple(KW_VALUES),
    keys: tuple[str, ...] = ("date", "region"),
    pivot_col: str = "kw",
    value_col: str = "value",
) -> DataFrame:
    """(date, region, kw, value) → (date, region, kw_0..kw_19), null→0."""
    wide = (
        daily.groupBy(*keys)
        .pivot(pivot_col, list(kw_values))
        .agg(F.round(F.sum(value_col), ROUND_DP))
    )
    return wide.na.fill(0.0, subset=list(kw_values))


def pivot_wide_sql(
    kw_values: Sequence[str] = tuple(KW_VALUES),
    source: str = "daily",
    keys: str = "date, region",
) -> str:
    """DuckDB twin as conditional aggregation (same column names/order)."""
    cols = ",\n         ".join(
        f"ROUND(COALESCE(SUM(CASE WHEN kw = '{v}' THEN value END), 0), 4)"
        f" AS \"{v}\""
        for v in kw_values
    )
    return (
        f"SELECT {keys},\n         {cols}\n"
        f"  FROM {source}\n  GROUP BY {keys}"
    )
