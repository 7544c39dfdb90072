"""ML anomaly-pipeline queries (rows-only driver checks — model fits are
not SQL-expressible; determinism is asserted in tests/test_ml.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..ml.iforest import iforest_by_region
from ..ml.kmeans_track import kmeans_anomalies
from ..operators.detrend import daily_aggregate
from ..operators.pivot import KW_VALUES, pivot_wide
from ..sources.tables import trends_view
from . import register


def _features_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = daily_aggregate(trends_view(spark, sf_dir))
    return pivot_wide(daily)


@register("kmeans_anomaly", oracle=None)
def kmeans_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = _features_wide(spark, sf_dir)
    return kmeans_anomalies(wide, feature_cols=list(KW_VALUES))


@register("iforest_anomaly", oracle=None)
def iforest_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = _features_wide(spark, sf_dir)
    return iforest_by_region(wide, feature_cols=list(KW_VALUES))
