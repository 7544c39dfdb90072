"""JDBC source/sink (SURVEY.md §2.A2/A4; reference
``spark_scala_impl/src/main/scala/Main.scala:99-109`` append sink,
``Main.scala:131-137`` history source with a ``date < lit(thisDate)``
filter that Spark pushes into the database as a WHERE clause).

The reference points these at MySQL. The engine keeps the exact surface
— ``format("jdbc")`` with url/driver/dbtable options, append-mode write,
filter-pushed read — with the connection parameterized, so the same code
runs against MySQL/Postgres in production and embedded Derby (bundled
with Spark for the Hive metastore) in tests.

Scale notes (100 TB posture):
- Reads accept ``partition_column``/``num_partitions`` bounds so the
  scan is issued as N parallel range queries instead of one giant
  cursor on a single task — without them Spark reads any JDBC table
  through exactly one connection.
- ``pushDownPredicate`` is on by default in Spark; the history filter
  reaches the database (asserted by plan test) so only the needed date
  range crosses the wire.
- Writes use ``batchsize`` to amortize round-trips. The JDBC sink is
  for *dimension-scale* results (anomaly feeds, rollups); corpus-scale
  output belongs in parquet (sources/tables.py), as SURVEY §2.A4 maps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    mode: str = "append",
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """Append-mode JDBC write (reference ``persistBatchAtSql``)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("driver", driver)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**options)
        .mode(mode)
        .save()
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """JDBC read (reference history fetch). With ``partition_column``
    (+ bounds), the table is read as ``num_partitions`` parallel range
    queries; otherwise a single-partition read (only acceptable for
    dimension-sized tables)."""
    reader: DataFrameReader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", driver)
        .option("dbtable", table)
        .options(**options)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
