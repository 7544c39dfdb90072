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

    ``events.ts`` is the one column queries do *instant* arithmetic on
    (``unix_micros``, windows, watermarks), and its physical type has
    varied across driver testdata generations; both forms are normalized
    here to a plain (UTC-instant) TIMESTAMP:

    - TIMESTAMP(NANOS): Spark 4 refuses to read it natively; with
      ``spark.sql.legacy.parquet.nanosAsLong`` we get the raw int64 nanos
      and convert via *integer* division (a double division would lose
      precision: ns-since-epoch ~1.7e18 exceeds the 53-bit double
      mantissa).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ
      (the oracle, DuckDB, reads plain TIMESTAMP). ``unix_micros`` /
      ``unix_timestamp`` reject NTZ, so convert the naive wall-clock to
      the UTC instant with the same digits via ``to_utc_timestamp(c,
      'UTC')``. NOTE: this is NOT session-timezone-independent — Spark
      first implicitly casts NTZ→TIMESTAMP *through the session
      timezone*, so under e.g. America/New_York the instant would shift
      by the tz offset. Correctness relies on ``configure_runtime``
      pinning ``spark.sql.session.timeZone=UTC`` before this conversion
      (asserted below); the same invariant applies to the twin branch in
      ``streaming/pipeline.events_stream``.

    Other tables' timestamp columns (``o_orderdate``, ``l_shipdate``…)
    are deliberately left as the scan produced them: wrapping a scan
    column in a conversion expression defeats parquet predicate pushdown
    on it (filters would sit above a projection), and date-granularity
    queries only ever compare/truncate those columns — NTZ handles that
    identically. Queries needing instant semantics cast locally, after
    any pushable filter.
    """
    configure_runtime(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and ts_type == "timestamp_ntz":
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":  # real exception, not assert: survives python -O
            raise RuntimeError(
                f"NTZ→instant conversion requires session tz UTC, got {tz!r} "
                "(configure_runtime above should have pinned it)"
            )
        df = df.withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table as a temp view (with the same
    physical-type normalization as :func:`load_table`) so users can
    ``spark.sql(...)`` over the catalog directly — the engine's ad-hoc
    SQL entry point. Returns the view names."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    return list(TABLE_NAMES)


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
