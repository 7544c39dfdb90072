"""Daily aggregation + expanding-moving-average detrending.

Rebuilds the spine of the reference batch pipeline
(``Main.scala:65-79`` daily agg; ``Main.scala:168-195`` cumulative moving
average + detrend + NaN repair) as stateless DataFrame operators.

Scale notes: the expanding average is a single window over
(region, kw) — one shuffle, partitioned by the series key, which is the
minimal possible data movement for this computation. Series count
(~3,500 in the reference: 20 kw × 175 regions) is far below partition
granularity, so skew is bounded by the longest single series; at 100 TB
the per-series history still fits a partition (daily grain: ~10k rows
per series per 30 years).

All aggregates round to 4 decimals so results are bit-stable across
partition orderings and engines (oracle parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import nan_repair, safe_div
from ..functions.stable import scaled_long, stable_mean_over

ROUND_DP = 4
# Raw event values are 2-dp decimals, so daily sums are exactly 2-dp:
# scale 100 turns them into exact integers for order-independent window
# sums (functions/stable.py).
VALUE_SCALE = 100


def daily_aggregate(trends: DataFrame) -> DataFrame:
    """(datetime, kw, region, value) → (date, region, kw, value=sum).

    Twin of the streaming tumbling-day aggregation (``Main.scala:65-68``)
    run in batch: partial (map-side) + final hash aggregation.
    """
    return (
        trends.groupBy(
            F.to_date("datetime").alias("date"),
            F.col("region"),
            F.col("kw"),
        )
        .agg(F.round(F.sum("value"), ROUND_DP).alias("value"))
    )


def expanding_mean(
    df: DataFrame,
    keys: tuple[str, ...] = ("region", "kw"),
    order: str = "date",
    value: str = "value",
    out: str = "moving_avg",
) -> DataFrame:
    """Cumulative moving average per series (``Main.scala:168-171``):
    AVG(value) OVER (PARTITION BY keys ORDER BY date ROWS UNBOUNDED
    PRECEDING → CURRENT ROW)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vs = scaled_long(F.col(value), VALUE_SCALE)
    # Deliberately NOT rounded: the exact-integer-sum mean is bit-identical
    # across engines, while rounding a rational (sum/n often ties at the
    # 4th decimal, e.g. …375) diverges between Spark (shortest-repr
    # HALF_UP) and DuckDB (binary-value rounding).
    return df.withColumn(out, stable_mean_over(vs, VALUE_SCALE, w))


def detrend(df: DataFrame, value: str = "value", ma: str = "moving_avg") -> DataFrame:
    """value / moving_avg with null/NaN→1 repair (``Main.scala:191-195``)."""
    return df.withColumn(
        "detrended",
        F.round(nan_repair(safe_div(F.col(value), F.col(ma))), ROUND_DP),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle CTE twins. Each builds on the `trends` CTE
# (sources.tables.TRENDS_ORACLE_CTE).
# ---------------------------------------------------------------------------

DAILY_CTE = """
daily AS (
  SELECT CAST(datetime AS DATE) AS date, region, kw,
         ROUND(SUM(value), 4) AS value
  FROM trends
  GROUP BY 1, 2, 3
)
""".strip()

MA_CTE = """
ma AS (
  SELECT date, region, kw, value,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE)
           / (COUNT(*) OVER w * 100.0) AS moving_avg
  FROM daily
  WINDOW w AS (PARTITION BY region, kw ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
""".strip()

DETRENDED_CTE = """
det AS (
  SELECT date, region, kw, value, moving_avg,
         ROUND(COALESCE(value / NULLIF(moving_avg, 0), 1.0), 4) AS detrended
  FROM ma
)
""".strip()
