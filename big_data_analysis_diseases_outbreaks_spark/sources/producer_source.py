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
    """Idempotent registration of the format with a session.

    The streaming offset runner is a separate Python process spawned by
    the JVM; it inherits neither the driver's ``sys.path`` hacks nor
    its cwd, so a by-reference pickle of this module's classes raises
    ModuleNotFoundError there whenever the package isn't on the
    worker's import path (observed: driver launched from a foreign cwd
    with the repo added via ``sys.path.insert``). Register the module
    for BY-VALUE pickling so the serialized DataSource is
    self-contained — it only needs ``pyspark`` and the stdlib on the
    receiving side."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(TrendsProducerDataSource)



def _dbg(msg):
    """Env-gated callback trace (SPARK_GRAFT_STREAM_DEBUG=<path>): the
    offset runner is a separate long-lived Python process, so a file is
    the only practical way to observe its callback sequence."""
    import os

    path = os.environ.get("SPARK_GRAFT_STREAM_DEBUG")
    if path:
        with open(path, "a") as f:
            f.write(f"pid={os.getpid()} {msg}\n")


class TrendsProducerStreamReader(DataSourceStreamReader):
    """Streaming twin: offsets are day indices, each micro-batch covers
    the days between Spark's current offset and ``latestOffset`` — one
    InputPartition per day, exactly the batch reader's fan-out.
    ``maxDaysPerBatch`` plays the reference's ``maxOffsetsPerTrigger``
    role (``Main.scala:33``): each planned batch admits at most that
    many days past the admission frontier. It defaults to the FULL day
    range (unthrottled) because that is the only setting under which
    ``Trigger.AvailableNow`` has correct semantics: the available-now
    wrapper snapshots the FIRST ``latestOffset()`` poll as the run's
    target, so a throttled first poll caps the run at one window.
    Throttled catch-up (the bounded multi-micro-batch demo) needs a
    continuous trigger (``processingTime``).

    Offset-state protocol (empirically verified against Spark 4.1's
    ``python_streaming_source_runner``): ``latestOffset()`` is polled
    continuously — ~100 calls/second while idle — and ``commit(end)``
    is forwarded only LAZILY, when the *next* batch is planned, so a
    frontier that advances on commit deadlocks (the commit waits on the
    next batch, which waits on the frontier). The only prompt
    once-per-batch signal is ``partitions(start, end)``; the admission
    frontier advances there. Driver state resets on checkpoint restart;
    every callback re-seeds the frontier with max() so offsets never
    rewind and committed days are never re-emitted (exactly-once at the
    source). A small idle-poll watchdog in ``latestOffset`` restores
    liveness in the one state the frontier cannot see: a restarted
    throttled query whose checkpointed offset is exactly at the fresh
    instance's first admission window (latest == committed ⇒ Spark
    plans nothing ⇒ ``partitions`` never fires ⇒ permanent stall
    without the watchdog)."""

    # Idle polls (latestOffset calls that admitted nothing new) before
    # the watchdog opens the next window. While batches flow, Spark
    # plans a batch right after any poll that advances the offset, so
    # steady-state never accumulates this many idle polls; when the
    # source is fully drained the watchdog target is capped at `days`
    # and stays a no-op.
    _WATCHDOG_IDLE_POLLS = 5

    def __init__(self, options):
        self._inner = TrendsProducerReader(options)
        self.max_days = int(
            options.get("maxDaysPerBatch", str(self._inner.days))
        )
        # Highest day index this instance knows Spark has planned a
        # batch through. A planned batch's START is always previously
        # committed work (Spark plans batch N only after batch N-1
        # committed), its END is admitted-but-possibly-in-flight.
        self._frontier = 0
        # Highest offset this instance has returned from latestOffset
        # (monotone), and polls since the last admission/plan.
        self._admitted = 0
        self._idle_polls = 0

    def initialOffset(self):
        _dbg("initialOffset")
        return {"day": 0}

    def latestOffset(self):
        target = min(self._frontier + self.max_days, self._inner.days)
        if target <= self._admitted and (
            self._idle_polls >= self._WATCHDOG_IDLE_POLLS
        ):
            # Liveness watchdog (class docstring): nothing newly
            # admitted for several consecutive polls and no batch
            # planned — open the next window so a stalled restart
            # re-converges. Exactly-once is unaffected: re-emission is
            # prevented by the partitions() clamp, not by admission.
            target = min(self._admitted + self.max_days, self._inner.days)
        if target > self._admitted:
            self._admitted = target
            self._idle_polls = 0
        else:
            self._idle_polls += 1
        _dbg(
            f"latestOffset frontier={self._frontier} "
            f"idle={self._idle_polls} -> {self._admitted}"
        )
        return {"day": self._admitted}

    def partitions(self, start, end):
        # Seed from start BEFORE computing the clamp, from end AFTER:
        # a restart-replay of an in-flight batch (start == its original
        # start <= frontier) must re-emit in full, while a stale range
        # planned after restart (Spark's recovered offset ahead of this
        # fresh instance's frontier) must not re-emit committed days.
        self._frontier = max(self._frontier, start["day"])
        lo = max(start["day"], min(self._frontier, end["day"]))
        self._frontier = max(self._frontier, end["day"])
        self._idle_polls = 0
        _dbg(f"partitions({start},{end}) frontier={self._frontier} lo={lo}")
        return [InputPartition(i) for i in range(lo, end["day"])]

    def read(self, partition: InputPartition):
        return self._inner.read(partition)

    def commit(self, end):
        # Arrives lazily with the next batch's planning (see docstring)
        # — harmless extra ratchet.
        self._frontier = max(self._frontier, end["day"])
        _dbg(f"commit({end}) frontier={self._frontier}")
