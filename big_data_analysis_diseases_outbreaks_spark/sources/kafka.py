"""Kafka source/sink builders (SURVEY.md §2.A1/A5/A8).

Reference: ``Main.scala:29-35`` (stream source, earliest offsets,
maxOffsetsPerTrigger), ``spark_main.py:90-98`` (batch sink serializing
every column through ``to_json(struct(*))``).

These build the exact production plans; they need the
``spark-sql-kafka-0-10`` connector on the classpath, which this container
does not ship, so everything is import-safe and only the ``.load()`` /
``.save()`` call would fail here. ``payload_to_records`` /
``records_to_payload`` — the JSON (un)marshalling halves — are plain
column expressions, fully exercised by the ``json_roundtrip`` query and
the file-source streaming twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference record payload (Main.scala:38-43).
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("datetime", T.TimestampType()),
        T.StructField("kw", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def kafka_stream_reader(
    spark: SparkSession,
    brokers: str,
    topic: str,
    max_offsets_per_trigger: int = 1000,
):
    """Streaming Kafka reader, configured like the reference dev setup
    (earliest offsets for replay, per-trigger rate limit). Returns the
    unstarted reader; caller chains ``.load()`` when a broker exists."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    )


# Default JSON timestamp formatting truncates to milliseconds; event
# times are microsecond-grained, so pin a µs format on both halves.
_TS_FMT = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def payload_to_records(raw: DataFrame) -> DataFrame:
    """Kafka binary (key, value) → typed record rows.

    One ``from_json`` + star-expand — NOT the per-field re-parse of
    ``spark_main.py:42-48``, which runs the JSON parser five times per
    row."""
    return (
        raw.selectExpr("CAST(value AS STRING) AS json")
        .select(F.from_json("json", RECORD_SCHEMA, _TS_FMT).alias("r"))
        .select("r.*")
    )


def records_to_payload(df: DataFrame) -> DataFrame:
    """Record rows → single JSON ``value`` column for a Kafka sink
    (``to_json(struct(*cols))``, spark_main.py:90)."""
    return df.select(F.to_json(F.struct(*df.columns), _TS_FMT).alias("value"))


def kafka_batch_writer(df: DataFrame, brokers: str, topic: str):
    """Batch Kafka sink writer (unstarted; caller chains ``.save()``)."""
    return (
        records_to_payload(df)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
    )
