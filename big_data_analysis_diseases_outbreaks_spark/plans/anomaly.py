"""Flagship anomaly plan (SURVEY.md §7 Phase 1).

The reference's core question — *"which (region, keyword, day) search
volumes are anomalous once the long-term trend is removed?"* — composed
from the engine's operators:

  trends → daily agg (Main.scala:65-79)
         → expanding moving average (Main.scala:168-171)
         → detrend + NaN repair (Main.scala:191-195)
         → per-series z-score + |z|>2 flag (notebook cells 13-15,
           SparkBatchProcessKmeanPCA.ipynb:826-979)

Single plan, two shuffles total (one hash agg, one window partitioned by
the same (region, kw) series key), no collect, no UDFs: every expression
is a JVM builtin inside whole-stage codegen. Mean/stddev use the
integer-scaled exact-sum formulation (functions/stable.py) so results
are bit-stable across engines and partition orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import scaled_long, stable_mean_over, stable_std_over
from ..operators.detrend import (
    DAILY_CTE,
    DETRENDED_CTE,
    MA_CTE,
    daily_aggregate,
    detrend,
    expanding_mean,
)
from ..sources.tables import TRENDS_ORACLE_CTE, trends_view

ROUND_DP = 4
DET_SCALE = 10_000  # detrended is rounded to 4 dp → exact at scale 1e4


def anomaly_scores(trends: DataFrame) -> DataFrame:
    """Full pipeline → (date, region, kw, value, detrended, z, is_anomaly)."""
    det = detrend(expanding_mean(daily_aggregate(trends)))
    series = Window.partitionBy("region", "kw")
    ds = scaled_long(F.col("detrended"), DET_SCALE)
    mu = stable_mean_over(ds, DET_SCALE, series)
    sigma = stable_std_over(ds, DET_SCALE, series)
    z = F.round((F.col("detrended") - mu) / F.nullif(sigma, F.lit(0.0)), ROUND_DP)
    return (
        det.withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.when(F.abs(F.col("z")) > 2.0, F.lit(1)).otherwise(F.lit(0)).cast("int"),
        )
        .select("date", "region", "kw", "value", "detrended", "z", "is_anomaly")
    )


def anomaly_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anomaly_scores(trends_view(spark, sf_dir))


# Published-artifact shape (reference `anomaly map.ipynb` cells 3-6): the
# choropleth input is sum(|score|) per region over a date window. The
# date filter sits UNDER the agg but the z-score itself must still be
# computed over the full series (the notebook scores first, then slices),
# so the filter applies post-scoring — at scale the heavy lifting is the
# same two shuffles as anomaly_scores plus one tiny region-level hash agg.
MAP_DATE_LO = "2024-01-10"
MAP_DATE_HI = "2024-01-25"


def anomaly_region_map(trends: DataFrame) -> DataFrame:
    """(region, total_score) — the choropleth feed."""
    scored = anomaly_scores(trends)
    return (
        scored.where(F.col("date").between(MAP_DATE_LO, MAP_DATE_HI))
        .groupBy("region")
        .agg(F.round(F.sum(F.abs(F.col("z"))), ROUND_DP).alias("total_score"))
    )


def anomaly_region_map_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anomaly_region_map(trends_view(spark, sf_dir))


# The reference's second published artifact (README anim_2020.gif) is a
# time SERIES of choropleths: per (date, region) total |z|. Same scoring
# plan, grouped by (date, region) instead of region-over-a-window.
def anomaly_map_series(trends: DataFrame) -> DataFrame:
    """(date, region, total_score) — the animation-frame feed."""
    return (
        anomaly_scores(trends)
        .groupBy("date", "region")
        .agg(F.round(F.sum(F.abs(F.col("z"))), ROUND_DP).alias("total_score"))
    )


def anomaly_map_series_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anomaly_map_series(trends_view(spark, sf_dir))


ANOMALY_ORACLE_SQL = f"""
WITH {TRENDS_ORACLE_CTE},
{DAILY_CTE},
{MA_CTE},
{DETRENDED_CTE},
ds_t AS (
  SELECT *, CAST(ROUND(detrended * 10000) AS BIGINT) AS ds FROM det),
stats AS (
  SELECT date, region, kw, value, detrended,
         CAST(SUM(ds) OVER p AS DOUBLE) / ((COUNT(*) OVER p) * 10000.0) AS mu,
         SQRT(GREATEST(
           (CAST(SUM(ds * ds) OVER p AS DOUBLE)
              - CAST(SUM(ds) OVER p AS DOUBLE) * CAST(SUM(ds) OVER p AS DOUBLE)
                / (COUNT(*) OVER p))
           / NULLIF((COUNT(*) OVER p) - 1, 0), 0.0)) / 10000.0 AS sigma
  FROM ds_t
  WINDOW p AS (PARTITION BY region, kw))
SELECT date, region, kw, value, detrended,
       ROUND((detrended - mu) / NULLIF(sigma, 0), 4) AS z,
       CAST(CASE WHEN ABS(ROUND((detrended - mu) / NULLIF(sigma, 0), 4)) > 2.0
                 THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
FROM stats
""".strip()

ANOMALY_MAP_ORACLE_SQL = f"""
WITH scored AS ({ANOMALY_ORACLE_SQL})
SELECT region, ROUND(SUM(ABS(z)), 4) AS total_score
FROM scored
WHERE date BETWEEN '{MAP_DATE_LO}' AND '{MAP_DATE_HI}'
GROUP BY region
""".strip()

ANOMALY_MAP_SERIES_ORACLE_SQL = f"""
WITH scored AS ({ANOMALY_ORACLE_SQL})
SELECT date, region, ROUND(SUM(ABS(z)), 4) AS total_score
FROM scored
GROUP BY date, region
""".strip()
