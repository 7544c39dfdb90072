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


def truncator(
    df: DataFrame, checkpoint_dir: str | None
) -> Callable[[DataFrame], DataFrame]:
    """Per-round lineage truncation fn: localCheckpoint when
    ``checkpoint_dir`` is None, reliable checkpoint() into it otherwise.
    Both are eager — the round materializes before the next plans."""
    if checkpoint_dir is None:
        return lambda d: d.localCheckpoint(eager=True)
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return lambda d: d.checkpoint(eager=True)


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
        return lambda d: d.localCheckpoint(eager=False)
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return lambda d: d.checkpoint(eager=True)
