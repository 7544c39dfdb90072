"""The reference's producer fleet as a Spark-native Python DataSource
(SURVEY.md §2.A10 — previously out-of-engine: >300 cloud lambdas fetch
Google-Trends CSVs and push to Kafka, ``procucer/master/fetch_client.py``,
``README.md:64-87``). Spark 4's Python DataSource API lets the engine own
that surface instead: ``spark.read.format("trends_producer")`` yields the
same (date, kw, region, value) record shape (``fetch_client.py`` CSV keys
``['date','kw','region','value']``), generated deterministically so tests
and oracles can value-check it.

Scale shape: the source reports one ``InputPartition`` per day, so a
1000-executor cluster reads 1000 days in parallel — the DataSource twin
of the fleet's per-day fan-out. The value function is pure integer
arithmetic on (day, kw, region) indices, division by 10 at the end:
exactly the same IEEE double in any engine, so the generator itself is
oracle-checkable (DuckDB ``generate_series`` cross joins).
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

PRODUCER_SCHEMA = "date DATE, kw STRING, region STRING, value DOUBLE"
DEFAULT_REGIONS = "US,CN,IT,IL,UK"
DEFAULT_N_KW = 20
DEFAULT_DAYS = 30
DEFAULT_START = "2020-01-01"


def _value(day_i: int, kw_i: int, region_i: int) -> float:
    """Deterministic pseudo-trend: integer mix mod 1000, one decimal."""
    return ((day_i * 31 + kw_i * 17 + region_i * 7) % 1000) / 10.0


class TrendsProducerDataSource(DataSource):
    """``format("trends_producer")`` — options: start (ISO date), days,
    n_kw, regions (comma-separated)."""

    @classmethod
    def name(cls) -> str:
        return "trends_producer"

    def schema(self) -> str:
        return PRODUCER_SCHEMA

    def reader(self, schema) -> "TrendsProducerReader":
        return TrendsProducerReader(self.options)

    def streamReader(self, schema) -> "TrendsProducerStreamReader":
        return TrendsProducerStreamReader(self.options)


class TrendsProducerReader(DataSourceReader):
    def __init__(self, options):
        self.start = date.fromisoformat(
            options.get("start", DEFAULT_START)
        )
        self.days = int(options.get("days", DEFAULT_DAYS))
        self.n_kw = int(options.get("n_kw", DEFAULT_N_KW))
        self.regions = [
            r for r in options.get("regions", DEFAULT_REGIONS).split(",") if r
        ]

    def partitions(self):
        # one partition per day — the fleet's per-day fan-out unit
        return [InputPartition(i) for i in range(self.days)]

    def read(self, partition: InputPartition):
        day_i = partition.value
        d = self.start + timedelta(days=day_i)
        for kw_i in range(self.n_kw):
            kw = f"kw_{kw_i}"
            for region_i, region in enumerate(self.regions):
                yield (d, kw, region, _value(day_i, kw_i, region_i))


def register_producer_source(spark) -> None:
    """Idempotent registration of the format with a session."""
    spark.dataSource.register(TrendsProducerDataSource)


class TrendsProducerStreamReader(DataSourceStreamReader):
    """Streaming twin: offsets are day indices, each micro-batch covers
    the days between the last committed offset and ``latestOffset`` —
    one InputPartition per day, exactly the batch reader's fan-out.
    ``maxDaysPerBatch`` plays the reference's ``maxOffsetsPerTrigger``
    role (``Main.scala:33``): it caps how far ``latestOffset`` advances
    per trigger, bounding micro-batch size."""

    def __init__(self, options):
        self._inner = TrendsProducerReader(options)
        self.max_days = int(options.get("maxDaysPerBatch", "7"))
        self._last = 0

    def initialOffset(self):
        return {"day": 0}

    def latestOffset(self):
        self._last = min(self._last + self.max_days, self._inner.days)
        return {"day": self._last}

    def partitions(self, start, end):
        return [InputPartition(i) for i in range(start["day"], end["day"])]

    def read(self, partition: InputPartition):
        return self._inner.read(partition)

    def commit(self, end):
        pass
