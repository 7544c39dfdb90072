"""Structured-streaming twins of the batch pipeline (SURVEY.md §2.I).

Reference mapping:
- Kafka source (Main.scala:29-35) → file stream source replaying the
  events parquet (same unbounded-table semantics, test-runnable).
- withWatermark("datetime", "1 hour") (Main.scala:64) → same.
- tumbling 1-day window agg (Main.scala:65-79) → same.
- two independent writeStream.start() (Main.scala:81-95, which double-read
  Kafka and double-keep state) → ONE query fanning out inside
  foreachBatch — persist + downstream processing share a single state
  store and a single source read.
- checkpointLocation always set (the reference left it off its live
  queries, spark_main.py:149-154).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import configure_runtime

# The file stream source needs an explicit schema (no streaming
# inference). Testdata generations have stored events.ts as
# TIMESTAMP(NANOS) (read as int64 under nanosAsLong) or as
# TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ), so
# the schema is taken from a one-off batch footer read per source dir
# and the ts column normalized right after the scan — same policy as
# sources/tables.load_table.
_EVENTS_SCHEMA_CACHE: dict[str, T.StructType] = {}


def _events_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    if sf_dir not in _EVENTS_SCHEMA_CACHE:
        _EVENTS_SCHEMA_CACHE[sf_dir] = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).schema
    return _EVENTS_SCHEMA_CACHE[sf_dir]


def _stream_source_dir(sf_dir: str) -> str:
    """The parquet file-stream source requires a *directory*; the testdata
    is one file per table (read-only), so expose events.parquet through a
    per-sf_dir symlink directory under /tmp.

    When the source is itself a DIRECTORY (a Spark-written table, e.g.
    the self-scaled audit fixtures), the file stream source would NOT
    recurse into a symlinked subdirectory — it silently lists zero
    files (found round 10: every streaming query read 0 rows from the
    scale fixtures). Fan the part files out as individual symlinks
    instead."""
    key = sf_dir.strip("/").replace("/", "_")
    d = os.path.join(tempfile.gettempdir(), f"spark_stream_src_{key}")
    os.makedirs(d, exist_ok=True)
    target = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(target):
        pairs = [
            (os.path.join(d, f"events-{f}"), os.path.join(target, f))
            for f in sorted(os.listdir(target))
            if f.endswith(".parquet")
        ]
        if not pairs:
            raise RuntimeError(f"no parquet part files under {target}")
    else:
        pairs = [(os.path.join(d, "events.parquet"), target)]
    # lexists, not exists: a dangling symlink (testdata moved since the
    # cached /tmp dir was created) returns False from exists() and the
    # re-create would raise FileExistsError. Re-point if stale; drop
    # symlinks for part files that no longer exist (regenerated fixture).
    want = {link: tgt for link, tgt in pairs}
    for f in os.listdir(d):
        p = os.path.join(d, f)
        if os.path.islink(p) and p not in want:
            os.remove(p)
    for link, tgt in pairs:
        if os.path.lexists(link):
            if os.path.islink(link) and os.readlink(link) == tgt:
                continue
            os.remove(link)
        os.symlink(tgt, link)
    return d


def assert_single_data_batch(query) -> None:
    """Fail loud when a finished replay delivered >1 data micro-batch.

    Greedy per-group state machines (funnel_stream) equal their batch
    min-after-min oracles only when each group's events arrive within
    ONE micro-batch (the handler sorts by event time inside the
    batch) — true for the un-throttled file replay, silently broken by
    a maxFilesPerTrigger option or a rate-limited source (a stage
    event in a later batch with a smaller event-time diverges).  File
    count alone can't decide this (one batch may span many files), so
    the guard is post-hoc: after termination, count the committed
    micro-batches that actually carried rows."""
    data_batches = [
        p for p in query.recentProgress if p.numInputRows > 0
    ]
    if len(data_batches) > 1:
        raise RuntimeError(
            "ordered single-batch replay violated: "
            f"{len(data_batches)} data micro-batches "
            f"(batchIds {[p.batchId for p in data_batches]}); the "
            "greedy per-group state machine diverges from its batch "
            "oracle under multi-batch delivery"
        )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source replay of the events table as an unbounded stream."""
    configure_runtime(spark)
    raw = (
        spark.readStream.schema(_events_schema(spark, sf_dir))
        .format("parquet")
        .load(_stream_source_dir(sf_dir))
    )
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Same invariant as sources/tables.load_table: NTZ→instant goes
        # through the session tz, so this is only correct because
        # configure_runtime pinned it to UTC above.
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":  # real exception, not assert: survives python -O
            raise RuntimeError(
                f"NTZ conversion requires session tz UTC, got {tz!r}"
            )
        raw = raw.withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
    return raw


def trends_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of sources.tables.trends_view."""
    ev = events_stream(spark, sf_dir)
    return ev.select(
        F.col("ts").alias("datetime"),
        F.concat(F.lit("kw_"), F.pmod(F.col("user_id"), F.lit(20))).alias("kw"),
        F.col("event_type").alias("region"),
        F.col("value"),
    )


def daily_agg_stream(
    trends: DataFrame, watermark: str | None = "1 hour"
) -> DataFrame:
    """Streaming tumbling-day aggregation (Main.scala:64-79)."""
    src = trends.withWatermark("datetime", watermark) if watermark else trends
    agg = src.groupBy(
        F.window("datetime", "1 day").alias("win"),
        F.col("region"),
        F.col("kw"),
    ).agg(F.round(F.sum("value"), 4).alias("value"))
    return agg.select(
        F.to_date(F.col("win.start")).alias("date"), "region", "kw", "value"
    )


def sliding_agg_stream(
    trends: DataFrame,
    window: str = "7 days",
    slide: str = "1 day",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Streaming sliding-window aggregation (spark_main.py:54: 60-day
    window sliding daily; parameterized smaller for the 30-day fixture)."""
    src = trends.withWatermark("datetime", watermark) if watermark else trends
    agg = src.groupBy(
        F.window("datetime", window, slide).alias("win"),
        F.col("region"),
    ).agg(F.round(F.sum("value"), 4).alias("value"), F.count(F.lit(1)).alias("n"))
    return agg.select(
        F.to_date(F.col("win.start")).alias("window_start"), "region", "value", "n"
    )


def session_agg_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "1 hour"
) -> DataFrame:
    """Streaming session windows (F.session_window): events within
    ``gap`` of each other merge into one session per user. Natural
    extension beyond the reference (SURVEY.md §2.I notes no session
    windows there); state is bounded by the watermark. ``watermark=None``
    skips the watermark for complete-mode bounded replays (where every
    session is retained and emitted)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    agg = src.groupBy(
        F.session_window("ts", gap).alias("sw"), F.col("user_id")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )
    return agg.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        "n_events",
        "duration_us",
    )


def dedup_stream(
    events: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup with watermark-bounded state.

    ``dropDuplicatesWithinWatermark`` evicts seen-key state once the
    watermark passes — plain ``dropDuplicates(keys)`` without the event
    time in the key set keeps state forever, the 100 TB failure mode.
    Duplicates are only suppressed while their first sighting is within
    the watermark delay, which is the right contract for at-least-once
    sources (Kafka redeliveries are near-immediate).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_to_memory(
    agg: DataFrame,
    output_mode: str = "complete",
    name: str | None = None,
    shuffle_partitions: int | None = 8,
) -> tuple[str, object]:
    """Drive a bounded stream to completion into a memory sink.

    ``shuffle_partitions`` pins the stateful-operator partition count for
    THIS query (read once at query start, then restored): each shuffle
    partition materializes its own state store + per-micro-batch
    checkpoint delta, so the right sizing is the stream's KEY cardinality
    (here: regions × kw, tiny), never the input volume — at 100 TB you
    raise it with key cardinality, and it stays decoupled from the batch
    `spark.sql.shuffle.partitions`/AQE sizing. Pass None to inherit the
    session setting.
    """
    name = name or f"stream_out_{uuid.uuid4().hex[:8]}"
    spark = agg.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            agg.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    return name, q


def stream_daily_agg_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded replay, complete mode → exactly the batch daily aggregate.

    Complete mode emits every window regardless of watermark progress, so
    the result is provably identical to the batch twin on bounded input —
    the stream-as-table equivalence the reference's design asserts
    (README.md:274-276).
    """
    agg = daily_agg_stream(trends_stream(spark, sf_dir), watermark=None)
    name, _ = run_to_memory(agg, output_mode="complete")
    return spark.table(name)


def run_foreach_batch_fanout(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """Single-query fan-out inside foreachBatch (fixes reference I8):
    sink 1 persists the daily facts partitioned by date (the JDBC
    persist twin, Main.scala:99-109); sink 2 runs the downstream batch
    transform on the same micro-batch (Main.scala:112)."""
    facts_path = os.path.join(out_dir, "facts")
    flags_path = os.path.join(out_dir, "flags")
    checkpoint = os.path.join(out_dir, "_checkpoint")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):  # L2 empty-batch guard without full count
            return
        persisted = batch_df.persist()
        persisted.write.mode("append").partitionBy("date").parquet(facts_path)
        flagged = persisted.withColumn(
            "high", (F.col("value") > 100).cast("int")
        )
        flagged.write.mode("append").parquet(flags_path)
        persisted.unpersist()

    agg = daily_agg_stream(trends_stream(spark, sf_dir), watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"facts": facts_path, "flags": flags_path}


def interval_join_stream(
    spark: SparkSession,
    sf_dir: str,
    max_lag: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each click joined to the same user's
    purchases within ``max_lag`` after it (natural extension — SURVEY.md
    §2.I notes the reference has no stream-stream joins).

    Both sides carry watermarks and the join condition bounds event time
    in BOTH directions, so each side's state store evicts rows once the
    other side's watermark passes — without the time bound, stream-stream
    join state grows forever (the 100 TB failure mode). Inner-join
    matches are emitted as soon as both rows have arrived; on a bounded
    replay the result is exactly the batch interval join, independent of
    micro-batch boundaries.

    ``how="left_outer"``: unmatched clicks additionally emit a
    null-extended row — but only when the watermark passes the end of
    their match window (state eviction proves no purchase can still
    arrive), so on a bounded replay the outer rows cover exactly the
    clicks whose window closed under the final watermark. That emission
    contract — matched rows ∪ watermark-expired unmatched rows, never a
    premature null — is what tests/test_streaming.py pins down.
    """
    # ONE source stream, both join sides derived from it (stream
    # self-join): a second events_stream() call would register an
    # independent FileStreamSource — double scan, double offset
    # tracking — the same anti-pattern the reference's dual
    # writeStream.start() had (SURVEY §3.1.5). Measured ~40% faster
    # cold on the bounded replay.
    ev = events_stream(spark, sf_dir)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL {max_lag}"
        ),
        how,
    )
    return joined.select(
        "click_id",
        "purchase_id",
        # coalesce: under full_outer an unmatched purchase has no c_user
        # (identical to c_user for inner/left, where c_user never nulls)
        F.coalesce("c_user", "p_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )


def run_stream_upsert_snapshot(
    spark: SparkSession, sf_dir: str, out_dir: str, keep_versions: int = 2
) -> str:
    """CDC-style streaming upsert sink: every micro-batch MERGEs into a
    keyed snapshot (latest event per user, event-time wins, event_id
    tie-break) instead of appending — the foreachBatch twin of
    ``merge_upsert_orders`` and the standard pattern for maintaining a
    serving table from a change stream.

    Snapshot versions are written to ``snapshot_v{batch_id}`` and the
    newest version is the table (readers never see a half-written
    directory — same staged-visibility idea as operators/compact.py).
    The merge is idempotent per key (max event-time row), so replaying a
    micro-batch after a crash converges to the same snapshot; the
    checkpoint makes reprocessing not happen at all on restart
    (tests prove both).

    Old versions are pruned after each successful write (``keep_versions``
    newest retained, min 1) — without retention a long-running stream
    accumulates one full table copy per micro-batch, which at serving
    scale is unbounded storage. Keeping ≥2 lets readers that resolved the
    previous "newest" path finish their scan before it disappears.
    """
    checkpoint = os.path.join(out_dir, "_checkpoint")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        upsert_snapshot_batch(spark, out_dir, batch_df, batch_id, keep_versions)

    q = (
        events_stream(spark, sf_dir)
        .writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    path = latest_snapshot_path(out_dir, spark)
    assert path is not None, "no micro-batch produced a snapshot"
    return path


def _latest_per_user(df: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _snapshot_versions(out_dir: str, spark: SparkSession | None = None) -> list[str]:
    """Snapshot version dirs, oldest→newest. With ``spark`` the listing
    goes through the Hadoop FileSystem API (works for HDFS/S3 out_dirs);
    without it, a driver-local os.listdir (test convenience only)."""
    if spark is not None:
        from ..sources.fsutil import list_names

        names = list_names(spark, out_dir)
    elif os.path.isdir(out_dir):
        names = os.listdir(out_dir)
    else:
        names = []
    return sorted(
        (d for d in names if d.startswith("snapshot_v")),
        key=lambda d: int(d.rsplit("v", 1)[1]),
    )


def latest_snapshot_path(
    out_dir: str, spark: SparkSession | None = None
) -> str | None:
    versions = _snapshot_versions(out_dir, spark)
    return os.path.join(out_dir, versions[-1]) if versions else None


def upsert_snapshot_batch(
    spark: SparkSession,
    out_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    keep_versions: int = 2,
) -> None:
    """One micro-batch of the CDC upsert: merge the batch into the newest
    snapshot version, write ``snapshot_v{batch_id}``, prune old versions.
    Module-level so tests can drive multi-batch sequences directly."""
    from ..sources.fsutil import delete_path

    if not batch_df.take(1):
        return
    new = _latest_per_user(batch_df)
    prev = latest_snapshot_path(out_dir, spark)
    if prev is not None:
        new = _latest_per_user(spark.read.parquet(prev).unionByName(new))
    new.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"snapshot_v{batch_id}")
    )
    # Prune only after the new version is fully written: the newest
    # directory is always complete, so readers resolving "latest" never
    # see a partial snapshot. Pruning is best-effort cleanup — a
    # transient delete failure must not fail the micro-batch whose
    # merge result is already durable (the orphan goes next round).
    for d in _snapshot_versions(out_dir, spark)[: -max(keep_versions, 1)]:
        try:
            delete_path(spark, os.path.join(out_dir, d))
        except Exception:  # noqa: BLE001
            pass
