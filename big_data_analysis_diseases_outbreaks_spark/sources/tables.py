"""Loaders for the driver's parquet testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

The reference's domain table (Google-Trends search volume records,
``Main.scala:38-43``: datetime/kw/region/value) is re-expressed on the
``events`` table via :func:`trends_view` per FIXTURES.md §"Mapping".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_runtime

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing physical-type quirks.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark 4
    refuses to read; with ``spark.sql.legacy.parquet.nanosAsLong`` we get
    the raw int64 nanos and convert to a proper timestamp via *integer*
    division (a double division would lose precision: ns-since-epoch
    ~1.7e18 exceeds the 53-bit double mantissa).
    """
    configure_runtime(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def trends_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project ``events`` into the reference's raw-trends shape.

    Reference record schema (``Main.scala:38-43``):
    (datetime: timestamp, kw: string, region: string, value: double).
    Mapping (FIXTURES.md): ts→datetime, event_type→region,
    ``concat('kw_', user_id % 20)``→kw (20 stable pseudo-keywords, like
    the 20 symptoms of ``procucer/master/symptoms.json``), value→value.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("ts").alias("datetime"),
        F.concat(F.lit("kw_"), F.pmod(F.col("user_id"), F.lit(20))).alias("kw"),
        F.col("event_type").alias("region"),
        F.col("value"),
    )


# DuckDB twin of trends_view, used as a CTE prefix by oracle SQL strings.
TRENDS_ORACLE_CTE = """
trends AS (
  SELECT CAST(ts AS TIMESTAMP) AS datetime,
         'kw_' || CAST(user_id % 20 AS VARCHAR) AS kw,
         event_type AS region,
         value
  FROM events
)
""".strip()
