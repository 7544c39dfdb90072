"""Streaming semantics tests (SURVEY.md §2.I, §5):

- stream-as-table equivalence: a bounded replay through the streaming
  pipeline must equal the batch twin (complete mode: exactly; append
  mode with watermark: minus the windows the watermark never closed).
- foreachBatch single-query fan-out writes both sinks consistently.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.detrend import daily_aggregate
from big_data_analysis_diseases_outbreaks_spark.sources.tables import trends_view
from big_data_analysis_diseases_outbreaks_spark.streaming.pipeline import (
    daily_agg_stream,
    events_stream,
    run_foreach_batch_fanout,
    run_to_memory,
    sliding_agg_stream,
    trends_stream,
)

from .conftest import SF_SMALL


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_complete_equals_batch(spark):
    agg = daily_agg_stream(trends_stream(spark, SF_SMALL), watermark=None)
    name, _ = run_to_memory(agg, output_mode="complete")
    stream_rows = _sorted_rows(spark.table(name), ["date", "region", "kw", "value"])
    batch_rows = _sorted_rows(
        daily_aggregate(trends_view(spark, SF_SMALL)),
        ["date", "region", "kw", "value"],
    )
    assert stream_rows == batch_rows


def test_stream_append_watermark_drops_open_windows(spark):
    """Append mode emits only windows closed by the watermark: on a
    bounded replay the final (still-open) day windows must be absent,
    everything else identical to batch."""
    agg = daily_agg_stream(trends_stream(spark, SF_SMALL), watermark="1 hour")
    name, _ = run_to_memory(agg, output_mode="append")
    stream_df = spark.table(name)

    batch = daily_aggregate(trends_view(spark, SF_SMALL))
    max_ts = trends_view(spark, SF_SMALL).agg(F.max("datetime")).collect()[0][0]
    # A day-window [d, d+1) is closed once watermark (max_ts - 1h) >= d+1.
    closed = batch.where(
        F.date_add(F.col("date"), 1).cast("timestamp")
        <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
    )
    stream_rows = _sorted_rows(stream_df, ["date", "region", "kw", "value"])
    closed_rows = _sorted_rows(closed, ["date", "region", "kw", "value"])
    assert stream_rows == closed_rows
    # sanity: something was actually dropped vs batch
    assert len(stream_rows) < batch.count()


def test_sliding_window_stream_equals_batch(spark):
    """Sliding windows (I3): streaming complete-mode result equals the
    same F.window aggregation run in batch."""
    agg = sliding_agg_stream(trends_stream(spark, SF_SMALL), watermark=None)
    name, _ = run_to_memory(agg, output_mode="complete")
    stream_rows = _sorted_rows(
        spark.table(name), ["window_start", "region", "value", "n"]
    )

    t = trends_view(spark, SF_SMALL)
    batch = (
        t.groupBy(F.window("datetime", "7 days", "1 day").alias("win"), "region")
        .agg(F.round(F.sum("value"), 4).alias("value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.to_date("win.start").alias("window_start"), "region", "value", "n"
        )
    )
    assert stream_rows == _sorted_rows(batch, ["window_start", "region", "value", "n"])
    # each event lands in exactly 7 sliding windows
    assert sum(r[3] for r in stream_rows) == 7 * t.count()


def test_stateful_running_zscore_equals_batch_twin(spark):
    """applyInPandasWithState operator ≡ batch prior-window z-score: the
    exact-integer state arithmetic must reproduce the window-function
    result bit-for-bit (same IEEE ops)."""
    from pyspark.sql import Window

    from big_data_analysis_diseases_outbreaks_spark.functions.stable import (
        scaled_long,
        stable_mean_over,
        stable_std_over,
    )
    from big_data_analysis_diseases_outbreaks_spark.operators.detrend import (
        daily_aggregate,
    )
    from big_data_analysis_diseases_outbreaks_spark.streaming.stateful import (
        running_zscore_stream,
    )

    out = running_zscore_stream(trends_stream(spark, SF_SMALL))
    name, _ = run_to_memory(out, output_mode="append")
    stream_rows = _sorted_rows(
        spark.table(name), ["region", "kw", "date", "value", "z", "n_prior"]
    )

    daily = daily_aggregate(trends_view(spark, SF_SMALL))
    wp = (
        Window.partitionBy("region", "kw")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vs = scaled_long(F.col("value"), 100)
    pmean = stable_mean_over(vs, 100, wp)
    pstd = stable_std_over(vs, 100, wp)
    n_prior = F.count(F.lit(1)).over(wp)
    batch = daily.select(
        "region",
        "kw",
        "date",
        "value",
        F.when(
            n_prior >= 2, (F.col("value") - pmean) / F.nullif(pstd, F.lit(0.0))
        ).alias("z"),
        n_prior.cast("long").alias("n_prior"),
    )
    batch_rows = _sorted_rows(batch, ["region", "kw", "date", "value", "z", "n_prior"])
    assert stream_rows == batch_rows
    assert any(r[4] is not None for r in stream_rows)


def test_stream_session_agg_subset_of_batch_sessions(spark):
    """Append-mode session windows emit only watermark-closed sessions;
    each emitted session must exist (same user, size, duration) in the
    batch gap-sessionization, and most closed sessions must be emitted."""
    from collections import Counter

    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
    from big_data_analysis_diseases_outbreaks_spark.streaming.pipeline import (
        session_agg_stream,
    )

    agg = session_agg_stream(events_stream(spark, SF_SMALL))
    name, _ = run_to_memory(agg, output_mode="append")
    emitted = Counter(
        (r["user_id"], r["n_events"], r["duration_us"])
        for r in spark.table(name).collect()
    )
    assert emitted, "no sessions emitted"

    batch = all_queries()["sessionize_events"].fn(spark, SF_SMALL)
    batch_sessions = Counter(
        (r["user_id"], r["n_events"], r["duration_us"]) for r in batch.collect()
    )
    missing = emitted - batch_sessions
    assert not missing, f"emitted sessions absent from batch twin: {list(missing)[:3]}"
    assert sum(emitted.values()) >= 0.5 * sum(batch_sessions.values())


def test_stream_dedup_within_watermark(spark):
    """A doubled bounded source must come out exactly once per event_id."""
    from big_data_analysis_diseases_outbreaks_spark.streaming.pipeline import (
        dedup_stream,
    )

    ev = events_stream(spark, SF_SMALL)
    doubled = ev.union(events_stream(spark, SF_SMALL))
    out = dedup_stream(doubled, ["event_id"]).select("event_id")
    name, _ = run_to_memory(out, output_mode="append")
    got = spark.table(name)
    n_events = trends_view(spark, SF_SMALL).count()
    assert got.count() == n_events
    assert got.distinct().count() == n_events


def test_foreach_batch_fanout_two_sinks(spark):
    with tempfile.TemporaryDirectory() as tmp:
        paths = run_foreach_batch_fanout(spark, SF_SMALL, tmp)
        facts = spark.read.parquet(paths["facts"])
        flags = spark.read.parquet(paths["flags"])
        # both sinks see the same micro-batch rows (one query, one state)
        assert facts.count() == flags.count() > 0
        assert facts.select("date").distinct().count() > 1
        # facts are hive-partitioned by date for partition-pruned reads
        assert any(
            d.startswith("date=") for d in os.listdir(paths["facts"])
        )
        # flags derived column is consistent
        bad = flags.where(
            (F.col("value") > 100) != (F.col("high") == 1)
        ).count()
        assert bad == 0


def test_checkpoint_recovery_no_reprocessing(spark):
    """Restarting a query on the same checkpoint must be exactly-once:
    the second run sees no new input and appends nothing (the reference
    ran its live queries WITHOUT checkpoints — spark_main.py:149-154 —
    and relied on startingOffsets=earliest, which double-processes on
    every restart)."""
    from big_data_analysis_diseases_outbreaks_spark.streaming.pipeline import (
        daily_agg_stream,
        trends_stream,
    )

    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "facts")
        cp = os.path.join(tmp, "_cp")

        def run_once():
            q = (
                daily_agg_stream(trends_stream(spark, SF_SMALL), watermark="1 hour")
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", cp)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        n1 = spark.read.parquet(out).count()
        assert n1 > 0, "first run must emit watermark-closed windows"
        run_once()
        n2 = spark.read.parquet(out).count()
        assert n2 == n1, f"restart reprocessed data: {n1} -> {n2} rows"


def test_session_agg_independent_of_batch_boundaries(spark):
    """Complete-mode session windows must produce the SAME sessions
    whether the bounded input arrives as one micro-batch or many: split
    the events into 4 files and replay with maxFilesPerTrigger=1 (4
    triggers, sessions merged incrementally in the state store), then
    compare against the single-batch replay."""
    import uuid

    from big_data_analysis_diseases_outbreaks_spark.streaming.pipeline import (
        session_agg_stream,
    )

    src = os.path.join(
        tempfile.gettempdir(), f"multi_batch_events_{uuid.uuid4().hex[:8]}"
    )
    # ts-ordered split so each file is a contiguous time slice (the
    # realistic arrival order; complete mode is order-independent anyway)
    (
        spark.read.parquet(os.path.join(SF_SMALL, "events.parquet"))
        .orderBy("ts")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(src)
    )
    # re-split the single sorted file into 4 row-range files
    one = spark.read.parquet(src)
    one.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src + "_4")

    # Schema comes from the file we just wrote (the same footer-read
    # policy as pipeline._events_schema — no hardcoded constant).
    split_schema = spark.read.parquet(src + "_4").schema
    raw = (
        spark.readStream.schema(split_schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src + "_4")
    )
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        ev = raw.withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
    else:
        ev = raw
    multi = session_agg_stream(ev, watermark=None)
    name, q = run_to_memory(multi, output_mode="complete")
    n_batches = len(q.recentProgress)
    assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"
    got = _sorted_rows(
        spark.table(name),
        ["user_id", "session_start", "n_events", "duration_us"],
    )

    single = session_agg_stream(events_stream(spark, SF_SMALL), watermark=None)
    name1, _ = run_to_memory(single, output_mode="complete")
    want = _sorted_rows(
        spark.table(name1),
        ["user_id", "session_start", "n_events", "duration_us"],
    )
    assert got == want


def test_stream_upsert_snapshot_matches_batch_and_is_idempotent(spark, tmp_path):
    """The streamed snapshot must equal the batch per-user-latest answer,
    and restarting on the same checkpoint must not produce a new version
    (exactly-once: nothing left to process)."""
    import os

    from pyspark.sql import functions as F

    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table
    from big_data_analysis_diseases_outbreaks_spark.streaming.pipeline import (
        run_stream_upsert_snapshot,
    )

    out = str(tmp_path / "upsert")
    snap_path = run_stream_upsert_snapshot(spark, SF_SMALL, out)
    snap = {
        r.user_id: (r.event_id, r.ts)
        for r in spark.read.parquet(snap_path).collect()
    }
    ev = load_table(spark, SF_SMALL, "events")
    batch = {
        r.user_id: (r.event_id, r.ts)
        for r in ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_id", "ts"), F.struct("ts", "event_id")
            ).alias("m")
        )
        .select("user_id", F.col("m.event_id"), F.col("m.ts"))
        .collect()
    }
    assert snap == batch
    versions_before = sorted(os.listdir(out))
    snap_path2 = run_stream_upsert_snapshot(spark, SF_SMALL, out)
    assert snap_path2 == snap_path
    assert sorted(os.listdir(out)) == versions_before


def test_stream_cusum_matches_batch_twin(spark):
    """The stateful CUSUM stream must be bit-identical to a serial replay
    of the shared cusum_step over each series' ordered daily values —
    same float ops in the same order, so exact equality, not tolerance."""
    from big_data_analysis_diseases_outbreaks_spark.operators.detrend import (
        daily_aggregate,
    )
    from big_data_analysis_diseases_outbreaks_spark.streaming.stateful import (
        SCALE,
        cusum_step,
        cusum_stream,
    )

    out = cusum_stream(trends_stream(spark, SF_SMALL))
    name, _ = run_to_memory(out, output_mode="append")
    cols = [
        "region", "kw", "date", "value",
        "cusum_pos", "cusum_neg", "is_change", "n_prior",
    ]
    stream_rows = _sorted_rows(spark.table(name), cols)

    daily = daily_aggregate(trends_view(spark, SF_SMALL)).collect()
    series: dict[tuple, list] = {}
    for r in daily:
        series.setdefault((r.region, r.kw), []).append((r.date, r.value))
    expected = []
    for (region, kw), days in series.items():
        n, s1, s2, cp, cn = 0, 0, 0, 0.0, 0.0
        for d, value in sorted(days):
            sv = int(round(value * SCALE))
            v, cp, cn, is_change = cusum_step(n, s1, s2, cp, cn, sv)
            expected.append((region, kw, d, v, cp, cn, is_change, n))
            n += 1
            s1 += sv
            s2 += sv * sv
    assert stream_rows == sorted(expected)
    assert len(stream_rows) > 0


def test_cusum_detects_injected_drift():
    """Sensitivity: a +1.5-sigma sustained shift (too small for a |z|>2
    per-day rule to flag reliably) must raise a CUSUM alarm within a few
    days of onset; a stable series must stay silent."""
    from big_data_analysis_diseases_outbreaks_spark.streaming.stateful import (
        SCALE,
        cusum_step,
    )

    # stable baseline: alternating 10.0 / 12.0 (mean 11, sigma ~1)
    base = [10.0, 12.0] * 15
    drifted = base + [12.5] * 10  # +1.5 sigma sustained
    for series, expect_alarm in [(base, False), (drifted, True)]:
        n, s1, s2, cp, cn = 0, 0, 0, 0.0, 0.0
        alarms = []
        for i, value in enumerate(series):
            sv = int(round(value * SCALE))
            _, cp, cn, is_change = cusum_step(n, s1, s2, cp, cn, sv)
            if is_change:
                alarms.append(i)
            n += 1
            s1 += sv
            s2 += sv * sv
        if expect_alarm:
            assert alarms and alarms[0] >= len(base), alarms
        else:
            assert not alarms, alarms


def test_stream_left_interval_join_contract(spark):
    """Left-outer stream-stream interval join emission contract on a
    bounded replay:
      1. every batch inner-join match is emitted exactly once;
      2. every emitted null-extended row is genuinely unmatched;
      3. an unmatched click emits iff its match window closed under the
         final watermark — wm = min(max click ts, max purchase ts) - 1h,
         each side's watermark tracking its own filtered substream (the
         global watermark is the MIN across watermark nodes, so the
         sparser side gates eviction). Boundary rows within the
         watermark's ms truncation are allowed either way."""
    import datetime

    from pyspark.sql import functions as F

    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    out = all_queries()["stream_left_interval_join"].fn(spark, SF_SMALL)
    matched = {
        (r.click_id, r.purchase_id)
        for r in out.where(F.col("purchase_id").isNotNull()).collect()
    }
    outer = {r.click_id for r in out.where(F.col("purchase_id").isNull()).collect()}

    ev = load_table(spark, SF_SMALL, "events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    cond = F.expr(
        "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 minutes"
    )
    batch = c.join(p, cond, "left")
    want_matched = {
        (r.click_id, r.purchase_id)
        for r in batch.where(F.col("purchase_id").isNotNull()).collect()
    }
    unmatched = {
        r.click_id: r.c_ts
        for r in batch.where(F.col("purchase_id").isNull()).collect()
    }
    assert matched == want_matched
    assert outer <= set(unmatched)

    max_c = c.agg(F.max("c_ts")).collect()[0][0]
    max_p = p.agg(F.max("p_ts")).collect()[0][0]
    wm = min(max_c, max_p) - datetime.timedelta(hours=1)
    window = datetime.timedelta(minutes=30)
    eps = datetime.timedelta(milliseconds=1)
    must_emit = {k for k, ts in unmatched.items() if ts + window < wm - eps}
    may_emit = {k for k, ts in unmatched.items() if ts + window <= wm + eps}
    assert must_emit <= outer <= may_emit


def test_stream_upsert_snapshot_prunes_old_versions(spark, tmp_path):
    """Retention: after N micro-batches only the newest keep_versions
    snapshot dirs remain, and the newest one is the complete merged
    answer (not just the last batch's rows)."""
    import os

    from big_data_analysis_diseases_outbreaks_spark.streaming.pipeline import (
        latest_snapshot_path,
        upsert_snapshot_batch,
    )

    out = str(tmp_path / "upsert_prune")
    # 4 batches, overlapping users: user 1 updated every batch.
    for batch_id in range(4):
        batch = spark.createDataFrame(
            [
                (1, 100 * batch_id + 1, batch_id * 1000),
                (batch_id + 2, 100 * batch_id + 2, batch_id * 1000 + 1),
            ],
            "user_id INT, event_id INT, ts LONG",
        )
        upsert_snapshot_batch(spark, out, batch, batch_id, keep_versions=2)

    versions = sorted(d for d in os.listdir(out) if d.startswith("snapshot_v"))
    assert versions == ["snapshot_v2", "snapshot_v3"], versions
    latest = latest_snapshot_path(out)
    assert latest.endswith("snapshot_v3")
    rows = {
        r.user_id: r.event_id for r in spark.read.parquet(latest).collect()
    }
    # Complete merged state: user 1 has its batch-3 event; users from
    # pruned-batch epochs (2, 3 from batches 0-1) survive the pruning.
    assert rows == {1: 301, 2: 2, 3: 102, 4: 202, 5: 302}, rows


def test_interval_join_checkpoint_recovery(spark, tmp_path):
    """Stream-stream join state must survive a restart exactly-once:
    rerunning the joined stream on the same checkpoint (no new input)
    must not re-emit any pair."""
    from big_data_analysis_diseases_outbreaks_spark.streaming.pipeline import (
        interval_join_stream,
    )

    out = str(tmp_path / "join_out")
    checkpoint = str(tmp_path / "join_ckpt")

    def run_once():
        q = (
            interval_join_stream(spark, SF_SMALL)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 > 0, "bounded replay must emit at least one joined pair"
    run_once()
    n2 = spark.read.parquet(out).count()
    assert n2 == n1, f"restart re-emitted join results: {n1} -> {n2}"
    # and the emitted pairs equal the batch interval join exactly
    rows = {
        (r.click_id, r.purchase_id)
        for r in spark.read.parquet(out).collect()
    }
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMALL, "events")
    c = ev.where(F.col("event_type") == "click").selectExpr(
        "event_id AS click_id", "user_id AS cu", "ts AS cts"
    )
    p = ev.where(F.col("event_type") == "purchase").selectExpr(
        "event_id AS purchase_id", "user_id AS pu", "ts AS pts"
    )
    want = {
        (r.click_id, r.purchase_id)
        for r in c.join(
            p,
            F.expr(
                "cu = pu AND pts >= cts AND pts <= cts + INTERVAL 30 minutes"
            ),
        ).collect()
    }
    assert rows == want


def test_producer_stream_source_converges_to_batch(spark):
    """The producer DataSource's streaming twin must deliver the exact
    batch result through bounded micro-batches: offsets are day indices,
    maxDaysPerBatch caps each trigger's admission (the reference's
    maxOffsetsPerTrigger role, Main.scala:33), and after catch-up the
    complete-mode aggregate equals the batch aggregate cell-for-cell."""
    import time

    from pyspark.sql import functions as F

    from big_data_analysis_diseases_outbreaks_spark.sources.producer_source import (
        register_producer_source,
    )

    register_producer_source(spark)
    agg = lambda df: df.groupBy("date", "region").agg(  # noqa: E731
        F.sum(F.round(F.col("value") * 10).cast("long")).alias("sum_v10")
    )
    stream = agg(
        spark.readStream.format("trends_producer")
        .option("days", "30").option("maxDaysPerBatch", "7").load()
    )
    name = "producer_stream_sink"
    q = (
        stream.writeStream.outputMode("complete").format("memory")
        .queryName(name).trigger(processingTime="0 seconds").start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql(f"SELECT COUNT(*) n FROM {name}").collect()[0]["n"] >= 150:
                break
            time.sleep(0.5)
        assert q.lastProgress is not None and q.lastProgress["batchId"] >= 3, (
            "catch-up must span multiple bounded micro-batches (30d / 7d ≥ 5)"
        )
    finally:
        q.stop()
    got = {
        (r["date"], r["region"]): r["sum_v10"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r["date"], r["region"]): r["sum_v10"]
        for r in agg(
            spark.read.format("trends_producer").option("days", "30").load()
        ).collect()
    }
    assert got == want


def test_producer_stream_restart_is_exactly_once(spark, tmp_path):
    """Checkpoint restart with a FRESH reader instance: the restarted
    query's driver-side frontier resets to 0 while the checkpointed
    offset is ahead. The reader must neither rewind (re-emitting
    committed days) nor stall — run 2 extends the day range and must
    append exactly the new days, once each. Default (unthrottled)
    admission, the mode with full availableNow semantics."""
    import os

    from big_data_analysis_diseases_outbreaks_spark.sources.producer_source import (
        register_producer_source,
    )

    register_producer_source(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(days: int) -> None:
        q = (
            spark.readStream.format("trends_producer")
            .option("days", str(days))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(14)
    assert spark.read.parquet(out).count() == 14 * 20 * 5
    # Restart against a longer range: only days 14..29 may be appended.
    run(30)
    got = spark.read.parquet(out)
    assert got.count() == 30 * 20 * 5
    assert got.select("date").distinct().count() == 30
    # No day delivered twice (exactly-once), none skipped (no stall).
    per_day = {r["date"]: r["n"] for r in got.groupBy("date").count().withColumnRenamed("count", "n").collect()}
    assert all(n == 100 for n in per_day.values()), per_day
    assert os.path.isdir(ckpt)


def test_producer_stream_throttled_restart_watchdog(spark, tmp_path):
    """Throttled-admission restart at the stall point: the checkpointed
    offset (7) exactly equals a fresh reader's first admission window
    (frontier 0 + maxDaysPerBatch 7), so latest == committed and Spark
    plans nothing — partitions() never fires and only the idle-poll
    watchdog can re-open admission. The restarted query must converge
    to the full extended range, each day delivered exactly once."""
    import time

    from big_data_analysis_diseases_outbreaks_spark.sources.producer_source import (
        register_producer_source,
    )

    register_producer_source(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def reader(days: int):
        return (
            spark.readStream.format("trends_producer")
            .option("days", str(days))
            .option("maxDaysPerBatch", "7")
            .load()
        )

    q = (
        reader(7)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 7 * 100

    q = (
        reader(21)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.read.parquet(out).count() >= 21 * 100:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 21 * 100
    per_day = {
        r["date"]: r["count"] for r in got.groupBy("date").count().collect()
    }
    assert len(per_day) == 21 and all(n == 100 for n in per_day.values())


def test_stream_curation_exactly_once_and_boundary_independent(spark, tmp_path):
    """Streaming incremental curation (streaming/curation.py):

    1. Restart idempotency: re-running the stream over the same source
       with the same checkpoint processes nothing new and leaves the
       curated corpus byte-identical (exactly-once across restarts).
    2. Chunk-boundary independence: replaying the corpus as 5 micro-
       batches instead of 3 yields the same curated rows — the
       first-seen-wins canonicalization and seen-store anti-join do not
       depend on where micro-batch boundaries fall (chunks are
       ascending doc_id ranges in both layouts).
    """
    from big_data_analysis_diseases_outbreaks_spark.queries.streaming import (
        _docs_chunk_dir,
    )
    from big_data_analysis_diseases_outbreaks_spark.streaming.curation import (
        curated_corpus,
        run_stream_curation,
    )

    def run(n_chunks: int, out: str) -> list[tuple]:
        src = _docs_chunk_dir(spark, SF_SMALL, n_chunks=n_chunks)
        schema = spark.read.parquet(src).schema
        docs = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        run_stream_curation(spark, docs, out)
        return _sorted_rows(
            curated_corpus(spark, out), ["doc_id", "fp", "quality"]
        )

    out3 = str(tmp_path / "out3")
    rows3 = run(3, out3)
    assert len(rows3) > 0
    # batches landed as separate partitions (not one monolithic rewrite)
    parts = [
        e for e in os.listdir(os.path.join(out3, "corpus"))
        if e.startswith("batch_id=")
    ]
    assert len(parts) >= 2, parts
    # restart over the same source + checkpoint: nothing reprocessed
    rows3_again = run(3, out3)
    assert rows3_again == rows3
    # different micro-batch layout, same curated corpus
    out5 = str(tmp_path / "out5")
    rows5 = run(5, out5)
    assert rows5 == rows3


def test_stream_curation_partial_failure_retry(spark, tmp_path):
    """Retry of a batch that died BETWEEN its seen-store append and its
    corpus write must not lose the batch: the anti-join excludes the
    batch's own seen partition, so re-processing yields the same
    survivors, and the partition overwrite replaces (not duplicates)
    both sinks."""
    from big_data_analysis_diseases_outbreaks_spark.queries.streaming import (
        _docs_chunk_dir,
    )
    from big_data_analysis_diseases_outbreaks_spark.streaming.curation import (
        curated_corpus,
        process_curation_batch,
    )

    src = _docs_chunk_dir(spark, SF_SMALL, n_chunks=3)
    chunks = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    out = str(tmp_path / "out")
    for i, chunk in enumerate(chunks):
        process_curation_batch(spark, spark.read.parquet(chunk), i, out)
    baseline = _sorted_rows(
        curated_corpus(spark, out), ["doc_id", "fp", "quality"]
    )
    # Simulate the worst retry: the LAST batch re-runs after its seen
    # append already succeeded (its partition is in the store).
    last = len(chunks) - 1
    process_curation_batch(spark, spark.read.parquet(chunks[last]), last, out)
    retried = _sorted_rows(
        curated_corpus(spark, out), ["doc_id", "fp", "quality"]
    )
    assert retried == baseline
    # And a mid-stream batch retry is equally idempotent.
    process_curation_batch(spark, spark.read.parquet(chunks[1]), 1, out)
    assert _sorted_rows(
        curated_corpus(spark, out), ["doc_id", "fp", "quality"]
    ) == baseline


def test_stream_curation_zero_survivors_reads_empty(spark, tmp_path):
    """A run whose quality gate rejects every document leaves corpus/
    with no parquet data files; curated_corpus must return an empty
    frame (stable schema), not raise UNABLE_TO_INFER_SCHEMA — and an
    out_dir where no batch ever ran behaves the same."""
    from big_data_analysis_diseases_outbreaks_spark.queries.streaming import (
        _docs_chunk_dir,
    )
    from big_data_analysis_diseases_outbreaks_spark.streaming.curation import (
        curated_corpus,
        process_curation_batch,
    )

    src = _docs_chunk_dir(spark, SF_SMALL, n_chunks=3)
    chunk = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )[0]
    out = str(tmp_path / "out")
    process_curation_batch(
        spark, spark.read.parquet(chunk), 0, out, quality_min=2.0
    )
    got = curated_corpus(spark, out)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["doc_id", "fp", "quality"]
    # No run at all: same contract.
    virgin = curated_corpus(spark, str(tmp_path / "never_ran"))
    assert virgin.count() == 0
    assert [f.name for f in virgin.schema.fields] == ["doc_id", "fp", "quality"]


def test_observed_metrics_batch_and_stream(spark, tmp_path):
    """In-plan observability (operators/observe.py): batch Observation
    and per-micro-batch observedMetrics must report exact counts without
    any extra scan of the input."""
    import time

    from pyspark.sql import functions as F

    from big_data_analysis_diseases_outbreaks_spark.operators.observe import (
        MetricsListener,
        observed,
        observed_stream,
    )
    from big_data_analysis_diseases_outbreaks_spark.queries.streaming import (
        _docs_chunk_dir,
    )

    src = _docs_chunk_dir(spark, SF_SMALL, n_chunks=3)
    batch_docs = spark.read.parquet(src)
    expected = batch_docs.count()

    # Batch: metrics ride the noop write's own plan.
    obs, odf = observed(batch_docs.select("doc_id", "text"), "batch_check")
    odf.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_rows"] == expected
    assert m["n_null_doc_id"] == 0 and m["n_null_text"] == 0

    # Streaming: one metrics row per micro-batch, summing to the corpus.
    listener = MetricsListener("stream_check")
    spark.streams.addListener(listener)
    try:
        sdf = (
            spark.readStream.schema(batch_docs.schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        osdf = observed_stream(sdf.select("doc_id", "text"), "stream_check")
        q = (
            osdf.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously post-termination
        deadline = time.time() + 20
        while time.time() < deadline and listener.totals("n_rows") < expected:
            time.sleep(0.5)
        assert listener.totals("n_rows") == expected
        assert len(listener.rows) >= 2, "expected per-micro-batch metrics"
        assert all(int(r["n_null_doc_id"]) == 0 for r in listener.rows)
    finally:
        spark.streams.removeListener(listener)


def test_transform_with_state_running_total(spark, tmp_path):
    """Spark 4's typed-state API (transformWithStateInPandas): per-key
    running totals with a ValueState, RocksDB provider. The API's Python
    driver worker needs the `protobuf` package, which this container
    does not ship — skip (not fail) there; applyInPandasWithState
    carries the custom-stateful surface either way
    (streaming/stateful.py)."""
    import pytest

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas requires the protobuf package",
    )
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )

    class RunningTotal(StatefulProcessor):
        def init(self, handle):
            self._st = handle.getValueState(
                "agg",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("total", DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timer_values):
            n, total = self._st.get() if self._st.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._st.update((n, total))
            yield pd.DataFrame(
                {"key": [key[0]], "n": [n], "total": [total]}
            )

        def close(self):
            pass

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src_dir = tmp_path / "src"
        spark.range(300).selectExpr(
            "CAST(id % 3 AS STRING) AS key", "CAST(id AS DOUBLE) AS value"
        ).write.parquet(str(src_dir))
        src = (
            spark.readStream.schema("key string, value double")
            .format("parquet")
            .load(str(src_dir))
        )
        out = src.groupBy("key").transformWithStateInPandas(
            RunningTotal(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        name = "tws_running_total"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r["key"]: (r["n"], r["total"])
            for r in spark.table(name).collect()
        }
        expect = {
            str(k): (100, float(sum(range(k, 300, 3))))
            for k in range(3)
        }
        assert got == expect
    finally:
        if saved is not None:
            spark.conf.set(provider_key, saved)
        else:
            spark.conf.unset(provider_key)


def test_watermark_late_drop_fires_and_is_repeatable(spark):
    """The late filter must actually DROP displaced rows (the injected
    lateness is not a no-op), emitted windows end before the final
    watermark, and a second replay in the same session is identical."""
    from big_data_analysis_diseases_outbreaks_spark.queries.streaming import (
        stream_watermark_late_drop,
    )
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import (
        load_table,
    )

    sf = SF_SMALL
    a = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in stream_watermark_late_drop(spark, sf).collect()
    }
    b = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in stream_watermark_late_drop(spark, sf).collect()
    }
    assert a == b and a
    ev = load_table(spark, sf, "events").select("ts", "event_type").collect()
    import datetime

    wm_final = max(r["ts"] for r in ev) - datetime.timedelta(days=2)
    batch = {}
    for r in ev:
        ws = r["ts"].date()
        if datetime.datetime.combine(ws, datetime.time()) + datetime.timedelta(
            days=1
        ) <= wm_final:
            batch[(ws, r["event_type"])] = (
                batch.get((ws, r["event_type"]), 0) + 1
            )
    # same window set as the closed-window batch aggregate…
    assert set(a) == set(batch)
    # …but strictly fewer rows overall: the displaced late rows dropped
    assert sum(a.values()) < sum(batch.values())
