"""Lineage truncation policy for iterative operators.

PageRank and connected components MUST truncate lineage every round
(the loop body references its own output; without truncation the plan
nests per iteration and Catalyst analysis goes superlinear). HOW to
truncate is a deployment decision:

* ``localCheckpoint(eager=True)`` — fast (executor-memory/disk blocks,
  no distributed-FS write), the right default for local runs and short
  jobs. BUT the blocks live only on their executor and lineage is gone:
  losing one executor mid-loop kills the whole job with no recompute
  path. At 100 TB an 8-round iterative job WILL see executor churn.
* ``checkpoint(eager=True)`` into a reliable directory (HDFS/S3) — each
  round's state survives any executor loss; the job replays from the
  last materialized round instead of dying. This is the cluster mode.

``truncator(df, checkpoint_dir)`` returns the per-round truncation
function for the chosen mode. ``setCheckpointDir`` is SparkContext-wide
(shared by all jobs on the session) — callers pass a job-scoped subdir
when isolation matters. Reliable checkpoint files are NOT auto-deleted
unless ``spark.cleaner.referenceTracking.cleanCheckpoints=true``;
operators here are bounded loops, so callers clean the dir after the
result is consumed (or run with that conf).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def _strip_origin_stats(df: DataFrame) -> DataFrame:
    """Rebuild a just-checkpointed frame's LogicalRDD leaf WITHOUT the
    origin plan's statistics/constraints.

    Spark 3.4+ carries the checkpointed plan's estimated stats into the
    LogicalRDD leaf (SPARK-39834). In an iterative loop whose round
    joins two same-generation checkpoint leaves (the pointer-jump
    self-join in connected_components), the carried ``sizeInBytes``
    SQUARES every round — after k rounds the estimate is a ~2^k-bit
    BigInteger and every optimizer stats lookup (join selection,
    runtime-filter injection) grinds through multi-megabit BigInt
    multiplications. Observed: 0.5 s jump rounds degrading to 270+ s
    (driver pegged in SizeInBytesOnlyStatsPlanVisitor /
    BigInteger.multiplyToomCook3); even plain propagate loops grow the
    estimate linearly in bits per round. Stripping restores the
    pre-3.4 checkpoint behavior — the leaf reports
    ``spark.sql.defaultSizeInBytes`` — which is safe here: the loop
    operators pin their shuffle widths explicitly and AQE plans from
    RUNTIME sizes, so nothing downstream depends on the carried
    estimate. Best-effort: any reflection failure (future Spark
    internals drift) returns the frame unchanged."""
    try:
        lp = df._jdf.queryExecution().logical()
        if lp.getClass().getSimpleName() != "LogicalRDD":
            return df
        spark = df.sparkSession
        jvm = spark._jvm  # type: ignore[attr-defined]
        none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        new_lp = jvm.org.apache.spark.sql.execution.LogicalRDD(
            lp.output(),
            lp.rdd(),
            lp.outputPartitioning(),
            lp.outputOrdering(),
            lp.isStreaming(),
            lp.stream(),
            spark._jsparkSession,  # type: ignore[attr-defined]
            none,
            none,
        )
        jds = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession,  # type: ignore[attr-defined]
            new_lp,
        )
        return DataFrame(jds, spark)
    except Exception:  # pragma: no cover — internals drift fallback
        return df


def truncator(
    df: DataFrame, checkpoint_dir: str | None
) -> Callable[[DataFrame], DataFrame]:
    """Per-round lineage truncation fn: localCheckpoint when
    ``checkpoint_dir`` is None, reliable checkpoint() into it otherwise.
    Both are eager — the round materializes before the next plans."""
    if checkpoint_dir is None:
        return lambda d: _strip_origin_stats(d.localCheckpoint(eager=True))
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return lambda d: _strip_origin_stats(d.checkpoint(eager=True))


def counted_truncator(
    df: DataFrame, checkpoint_dir: str | None
) -> Callable[[DataFrame], DataFrame]:
    """Truncation fn for a frame whose NEXT operation is an action that
    forces every row (a convergence/size ``count()``): lazy
    ``localCheckpoint(eager=False)`` lets that count BE the
    materializing job — one action per loop round instead of two
    (checkpoint job + count job), which at node-sized per-round data is
    pure scheduling overhead (guide §1.2 "per-task work" / VERDICT r14
    fixed-cost finding).

    Use ONLY when the caller immediately runs a full-scan action on the
    returned frame before any other subtree references it: a lazily
    checkpointed frame that first materializes under two concurrent
    consumers can double-compute (the ANF warm-session 5x-spike lesson).

    Reliable-checkpoint mode stays EAGER: a non-eager ``checkpoint()``
    re-executes its whole lineage a second time when the checkpoint job
    finally runs (Spark recomputes unless the RDD is also persisted),
    which is far worse than one extra scheduling round-trip."""
    if checkpoint_dir is None:
        return lambda d: _strip_origin_stats(d.localCheckpoint(eager=False))
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return lambda d: _strip_origin_stats(d.checkpoint(eager=True))
