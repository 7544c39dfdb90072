"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.I extension — the reference has no arbitrary-state operator;
this is the Structured-Streaming-native replacement for its
recompute-history-every-batch anomaly loop, ``Main.scala:131-151``).

Per (region, kw) series the operator keeps exact integer running sums
(n, Σv·100, Σ(v·100)²) as group state, aggregates each micro-batch's raw
events into daily values, and emits every day with a z-score against the
*prior* days only — O(1) state per series instead of the reference's
full-history rescan per batch, which is the difference between a 100 TB
re-read and a few bytes of state.

Determinism contract: each day's events must arrive within one
micro-batch (true for daily file/partition drops and for the bounded
``availableNow`` replay used in tests; a production deployment would set
the watermark to the drop cadence). The z arithmetic mirrors
functions/stable.py op-for-op so the emitted doubles are bit-identical
to the SQL-window oracle.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "region STRING, kw STRING, date DATE, value DOUBLE, z DOUBLE, n_prior BIGINT"
)
STATE_SCHEMA = "n BIGINT, s1 BIGINT, s2 BIGINT"
SCALE = 100  # raw event values are 2-dp decimals → exact at ×100


def _running_zscore(key, pdf_iter, state):
    import numpy as np

    region, kw = key
    frames = [p for p in pdf_iter]
    pdf = pd.concat(frames) if len(frames) > 1 else frames[0]

    days = pdf["datetime"].dt.normalize()
    vs = np.rint(pdf["value"].to_numpy() * SCALE).astype("int64")
    daily = (
        pd.DataFrame({"d": days, "sv": vs})
        .groupby("d", sort=True)["sv"]
        .sum()
    )

    n, s1, s2 = state.get if state.exists else (0, 0, 0)
    rows = []
    for d, sv in daily.items():
        sv = int(sv)
        v = sv / float(SCALE)
        z = None
        if n >= 2:
            s1f, s2f = float(s1), float(s2)
            pmean = s1f / (n * float(SCALE))
            var = (s2f - s1f * s1f / n) / (n - 1)
            pstd = math.sqrt(max(var, 0.0)) / float(SCALE)
            if pstd != 0.0:
                z = (v - pmean) / pstd
        rows.append((region, kw, d.date(), v, z, n))
        n += 1
        s1 += sv
        s2 += sv * sv
    state.update((n, s1, s2))
    yield pd.DataFrame(rows, columns=["region", "kw", "date", "value", "z", "n_prior"])


def running_zscore_stream(trends: DataFrame) -> DataFrame:
    """(datetime, kw, region, value) stream → stateful daily z-score."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return trends.groupBy("region", "kw").applyInPandasWithState(
        _running_zscore,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- self-starting CUSUM change-point detector ----------------------------
# Second arbitrary-state exemplar: where the z-score op scores each day
# against the prior distribution, CUSUM accumulates small persistent
# shifts (S+ = max(0, S+ + (x - mu - k*sigma)); alarm at S > h*sigma) —
# the standard detector for slow drifts a per-day z-score never flags.
# Baseline mu/sigma are the running prior stats from the SAME exact
# integer sums as the z-score op; the accumulator is float but every
# operation is replayed identically by the batch twin (one group = one
# ordered series), so tests assert bit-equality, not approximation.

CUSUM_OUTPUT_SCHEMA = (
    "region STRING, kw STRING, date DATE, value DOUBLE, "
    "cusum_pos DOUBLE, cusum_neg DOUBLE, is_change INT, n_prior BIGINT"
)
CUSUM_STATE_SCHEMA = (
    "n BIGINT, s1 BIGINT, s2 BIGINT, cp DOUBLE, cn DOUBLE"
)
CUSUM_K = 0.5  # slack, in prior-sigma units
CUSUM_H = 4.0  # alarm threshold, in prior-sigma units
CUSUM_MIN_PRIOR = 5  # no alarms before the baseline has 5 days


def cusum_step(n, s1, s2, cp, cn, sv):
    """One CUSUM update on the scaled daily value ``sv`` (int). Shared by
    the streaming operator and the batch/test twin so both run the exact
    same float ops in the same order → bit-identical outputs."""
    v = sv / float(SCALE)
    is_change = 0
    if n >= CUSUM_MIN_PRIOR:
        s1f, s2f = float(s1), float(s2)
        mu = s1f / (n * float(SCALE))
        var = (s2f - s1f * s1f / n) / (n - 1)
        sigma = math.sqrt(max(var, 0.0)) / float(SCALE)
        if sigma != 0.0:
            cp = max(0.0, cp + (v - mu - CUSUM_K * sigma) / sigma)
            cn = max(0.0, cn + (mu - v - CUSUM_K * sigma) / sigma)
            if cp > CUSUM_H or cn > CUSUM_H:
                is_change = 1
                cp, cn = 0.0, 0.0  # restart after alarm
    return v, cp, cn, is_change


def _cusum(key, pdf_iter, state):
    import numpy as np

    region, kw = key
    frames = [p for p in pdf_iter]
    pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
    days = pdf["datetime"].dt.normalize()
    vs = np.rint(pdf["value"].to_numpy() * SCALE).astype("int64")
    daily = (
        pd.DataFrame({"d": days, "sv": vs}).groupby("d", sort=True)["sv"].sum()
    )
    n, s1, s2, cp, cn = (
        state.get if state.exists else (0, 0, 0, 0.0, 0.0)
    )
    rows = []
    for d, sv in daily.items():
        sv = int(sv)
        v, cp, cn, is_change = cusum_step(n, s1, s2, cp, cn, sv)
        rows.append((region, kw, d.date(), v, cp, cn, is_change, n))
        n += 1
        s1 += sv
        s2 += sv * sv
    state.update((n, s1, s2, cp, cn))
    yield pd.DataFrame(
        rows,
        columns=[
            "region", "kw", "date", "value",
            "cusum_pos", "cusum_neg", "is_change", "n_prior",
        ],
    )


def cusum_stream(trends: DataFrame) -> DataFrame:
    """(datetime, kw, region, value) stream → stateful CUSUM change flags."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return trends.groupBy("region", "kw").applyInPandasWithState(
        _cusum,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- exact recursive EWMA (third arbitrary-state exemplar) ----------------
# The TRUE recursive exponentially-weighted average s_t = (v_t +
# 3·s_{t-1}) div 4 on exact cents — a statistic NO single SQL window
# can express (each output depends on the previous OUTPUT, not the
# previous input; series_ewma16 is its finite-window approximation).
# Streaming state is the natural home for recursion: O(1) integer
# state per series, each batch folds its days in order. Integer floor
# division keeps every step exact, so the DuckDB RECURSIVE-CTE oracle
# matches bit-for-bit — a full value oracle for a recursive stateful
# operator. Same determinism contract as the z-score op above (a
# day's events arrive within one micro-batch, batches arrive in day
# order — true for the bounded chunk replay and for daily drops).

EWMA_OUTPUT_SCHEMA = (
    "region STRING, kw STRING, date DATE, v_cents BIGINT, "
    "ewma_scaled BIGINT, ewma DOUBLE"
)
EWMA_STATE_SCHEMA = "s BIGINT, started BIGINT"


def _recursive_ewma(key, pdf_iter, state):
    import numpy as np

    region, kw = key
    frames = [p for p in pdf_iter]
    pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
    days = pdf["datetime"].dt.normalize()
    vs = np.rint(pdf["value"].to_numpy() * SCALE).astype("int64")
    daily = (
        pd.DataFrame({"d": days, "sv": vs})
        .groupby("d", sort=True)["sv"]
        .sum()
    )
    s, started = state.get if state.exists else (0, 0)
    rows = []
    for d, sv in daily.items():
        sv = int(sv)
        s = sv if not started else (sv + 3 * s) // 4
        started = 1
        rows.append((region, kw, d.date(), sv, s, s / 100.0))
    state.update((s, started))
    yield pd.DataFrame(
        rows,
        columns=["region", "kw", "date", "v_cents", "ewma_scaled", "ewma"],
    )


def recursive_ewma_stream(trends: DataFrame) -> DataFrame:
    """(datetime, kw, region, value) stream → exact recursive EWMA."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return trends.groupBy("region", "kw").applyInPandasWithState(
        _recursive_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- stateful ordered funnel (view -> click -> purchase) -------------------
# Third arbitrary-state exemplar: a MONOTONE per-user state machine.
# State is the trio of conversion instants (micros; 0 = not reached);
# a stage converts only on an event STRICTLY AFTER the previous
# stage's instant, and each transition is emitted EXACTLY ONCE, in the
# micro-batch where it happens — the transition-only emission pattern
# (downstream consumers see an insert-only conversion log, never a
# retraction). Because the replay source is event-time-ordered, the
# greedy first-qualifying event IS the min-after-min of the batch
# definition, so the appended transitions equal the batch
# events_funnel unpivoted — a full SQL oracle for a stateful stream.

FUNNEL_OUTPUT_SCHEMA = "user_id BIGINT, stage BIGINT, us BIGINT"
FUNNEL_STATE_SCHEMA = "t1 BIGINT, t2 BIGINT, t3 BIGINT"


def _funnel(key, pdf_iter, state):
    (user_id,) = key
    frames = [p for p in pdf_iter]
    pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
    pdf = pdf.sort_values(["us", "event_id"])
    t1, t2, t3 = state.get if state.exists else (0, 0, 0)
    rows = []
    for etype, us in zip(pdf["event_type"], pdf["us"]):
        us = int(us)
        if t1 == 0:
            if etype == "view":
                t1 = us
                rows.append((user_id, 1, us))
        elif t2 == 0:
            if etype == "click" and us > t1:
                t2 = us
                rows.append((user_id, 2, us))
        elif t3 == 0:
            if etype == "purchase" and us > t2:
                t3 = us
                rows.append((user_id, 3, us))
    state.update((t1, t2, t3))
    if rows:
        yield pd.DataFrame(rows, columns=["user_id", "stage", "us"])


def funnel_stream(events: DataFrame) -> DataFrame:
    """(user_id, event_type, us) stream → appended stage transitions."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- per-key gap alerting (round 11) ----------------------------------------
# Fourth arbitrary-state exemplar: INACTIVITY detection, the monitoring
# primitive behind "user went quiet" / "sensor stopped reporting"
# alerts. State is the key's last-seen event instant; each arriving
# event emits an alert row iff the gap from the previous event exceeds
# the threshold, exactly once, in the micro-batch where the gap closes.
# Unlike the funnel this operator is BATCH-BOUNDARY ROBUST under any
# event-time-ordered replay: the state carries (last_us) across
# batches, so an N-chunk time-ordered source yields bit-identical
# alerts to the single-batch run (and to the batch LAG window) — the
# oracle needs no single-batch precondition, only ordered replay.

GAP_OUTPUT_SCHEMA = (
    "user_id BIGINT, prev_us BIGINT, at_us BIGINT, gap_us BIGINT"
)
GAP_STATE_SCHEMA = "last_us BIGINT"


def _gap_alerts(threshold_us: int):
    def handler(key, pdf_iter, state):
        (user_id,) = key
        frames = [p for p in pdf_iter]
        pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
        pdf = pdf.sort_values(["us", "event_id"])
        (last,) = state.get if state.exists else (-1,)
        rows = []
        for us in pdf["us"]:
            us = int(us)
            if last >= 0 and us - last > threshold_us:
                rows.append((user_id, last, us, us - last))
            last = us
        state.update((last,))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "prev_us", "at_us", "gap_us"]
            )

    return handler


def gap_alert_stream(events: DataFrame, threshold_us: int) -> DataFrame:
    """(user_id, event_id, us) stream → appended inactivity alerts."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _gap_alerts(threshold_us),
        outputStructType=GAP_OUTPUT_SCHEMA,
        stateStructType=GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
