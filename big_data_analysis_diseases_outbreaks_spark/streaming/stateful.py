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
