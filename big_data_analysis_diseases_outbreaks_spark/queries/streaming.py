"""Streaming queries surfaced to the driver. The complete-mode bounded
replay is deterministic and equals the batch daily aggregate, so it gets
a full SQL oracle; watermark/append timing semantics are covered in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.detrend import DAILY_CTE
from ..sources.tables import TRENDS_ORACLE_CTE
from ..streaming.pipeline import stream_daily_agg_complete
from . import register


@register(
    "stream_daily_agg",
    oracle=f"WITH {TRENDS_ORACLE_CTE},\n{DAILY_CTE}\n"
    "SELECT date, region, kw, value FROM daily",
)
def stream_daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_daily_agg_complete(spark, sf_dir)
