"""Scalar column expressions (SURVEY.md §2.D) — all JVM-side builtins,
no Python UDFs, so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sanitize_kw(col: Column | str) -> Column:
    """Keyword → legal column name (reference ``Main.scala:62``:
    ``regexp_replace($"kw", " ", "_")``)."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, " ", "_")


def safe_div(num: Column, denom: Column) -> Column:
    """ANSI-safe division: NULL when the denominator is 0 (matches both
    DuckDB NULLIF idiom and Spark non-ANSI semantics)."""
    return num / F.nullif(denom, F.lit(0))


def nan_repair(col: Column, default: float = 1.0) -> Column:
    """Reference NaN/null repair after detrending (``Main.scala:193-195``):
    ``when(value.isNull || value === NaN, 1).otherwise(value)``."""
    return F.when(col.isNull() | F.isnan(col), F.lit(default)).otherwise(col)


def month_onehot_cols(date_col: str = "date") -> list[Column]:
    """Deterministic month one-hot (replaces reference UDF + pivot(count),
    ``Main.scala:230-238``): 12 indicator columns ``is_January..is_December``.

    A `when` chain needs no shuffle and no plan-time distinct scan, unlike
    the reference's second pivot — identical output, strictly cheaper.
    """
    names = [
        "January", "February", "March", "April", "May", "June",
        "July", "August", "September", "October", "November", "December",
    ]
    return [
        F.when(F.month(F.col(date_col)) == i + 1, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias(f"is_{name}")
        for i, name in enumerate(names)
    ]


def month_onehot_sql(date_expr: str = "date") -> str:
    """DuckDB twin of :func:`month_onehot_cols` (column list fragment)."""
    names = [
        "January", "February", "March", "April", "May", "June",
        "July", "August", "September", "October", "November", "December",
    ]
    return ", ".join(
        f"CAST(CASE WHEN MONTH({date_expr}) = {i + 1} THEN 1 ELSE 0 END AS BIGINT)"
        f" AS is_{name}"
        for i, name in enumerate(names)
    )
