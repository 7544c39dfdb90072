"""In-plan observability: row/null/domain metrics collected DURING a
write, not by re-running the query.

At 100 TB a post-hoc `count()` or validation query re-reads the whole
input; `df.observe(...)` accumulates aggregates inside the very same
physical plan that produces the output — zero extra scans, exact
numbers, available the moment the action finishes. The streaming twin
surfaces the same metrics per micro-batch through the progress events.

Batch:    obs, df2 = observed(df, "curation");  df2.write...;  obs.get
Streaming: attach `observe` before writeStream; metrics arrive in every
           `StreamingQueryProgress.observedMetrics["curation"]` row —
           collected here by a QueryListener so operators (admission
           control, alerting) can react per batch.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def standard_metrics(df: DataFrame, cols: list[str] | None = None) -> list[Column]:
    """The default ingest health metrics: total rows + per-column null
    counts (cheap, associative — they ride the existing aggregation
    machinery map-side)."""
    cols = cols if cols is not None else df.columns
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        for c in cols
    ]
    return metrics


def observed(
    df: DataFrame, name: str, metrics: list[Column] | None = None
) -> tuple[Observation, DataFrame]:
    """Attach an Observation to a batch DataFrame. Returns (observation,
    observed_df); read ``observation.get`` after the first action."""
    obs = Observation(name)
    ms = metrics if metrics is not None else standard_metrics(df)
    return obs, df.observe(obs, *ms)


def observed_stream(
    df: DataFrame, name: str, metrics: list[Column] | None = None
) -> DataFrame:
    """Streaming variant: named observe node; metrics surface in each
    progress event's ``observedMetrics[name]``."""
    ms = metrics if metrics is not None else standard_metrics(df)
    return df.observe(name, *ms)


class MetricsListener(StreamingQueryListener):
    """Collects ``observedMetrics[name]`` rows per micro-batch.

    Thread-safe append-only log: progress events fire on the stream
    execution thread. ``rows`` preserves batch order; use
    ``totals(key)`` for an across-batches sum.
    """

    def __init__(self, name: str) -> None:
        self._name = name
        self._lock = threading.Lock()
        self.rows: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        m = event.progress.observedMetrics.get(self._name)
        if m is not None:
            with self._lock:
                self.rows.append(m.asDict())

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def totals(self, key: str) -> int:
        with self._lock:
            return sum(int(r[key]) for r in self.rows)
