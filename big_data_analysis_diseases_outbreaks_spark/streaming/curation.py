"""Streaming incremental corpus curation — the continuous-ingest twin of
the batch curation pipeline (queries/text.py:curation_pipeline_v2 /
dedup_incremental).

Documents arrive as an unbounded stream; every micro-batch is
deduplicated batch-internally, anti-joined against the accumulated
seen-fingerprint store, quality-gated, and appended to the curated
corpus — with exactly-once output across retries and restarts.

Design for 100 TB continuous ingest:

- **State lives in tables, not executor memory.** The seen-fingerprint
  store is a parquet table of (fp, canonical_doc_id) — per-batch work is
  a shuffled ANTI join against it, never a broadcast (the seen side is
  corpus-sized) and never `dropDuplicates` state (which would pin every
  fingerprint ever seen in the state store with no watermark to evict
  by — a corpus dedup key set never expires).
- **Exactly-once by partition overwrite, not append.** Each batch writes
  to its own `batch_id=N` partition with dynamic partition overwrite; a
  retried batch REPLACES its own partition instead of appending a
  second copy. Sink idempotency + the checkpointed source offset log =
  end-to-end exactly-once, the same recipe as
  pipeline.run_stream_upsert_snapshot.
- **Dedup-before-gate ordering.** A document's fingerprint enters the
  seen store even when the quality gate rejects the document, so a
  later duplicate of a rejected doc is dropped as a duplicate (one
  store probe) instead of re-scored every time it reappears.
- At real scale the per-batch anti-join is the pipeline's only
  corpus-sized read; the deployment levers are the usual ones — bucket
  the seen store by fingerprint so the join co-locates without a
  shuffle, and let AQE's runtime bloom filter prune the probe side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, quality_score
from ..sources.fsutil import dir_has_data, path_exists

CURATION_QUALITY_MIN = 0.35

# Test hook: when set to a list, each micro-batch appends the planned
# survivors plan string (the batch-canonical window + seen-store
# anti-join — the pipeline's heavy plan). foreachBatch bodies run as
# ordinary batch jobs that StreamExecution.explainInternal never sees,
# so the plan gate (tests/test_plans.py) captures them here instead.
PLAN_CAPTURE: list[str] | None = None


def _batch_canonical(batch: DataFrame) -> DataFrame:
    """Batch-internal keep-first: one row per fingerprint (min doc_id).

    A window keyed by fp over a single micro-batch — bounded by the
    admission control (maxFilesPerTrigger / maxOffsetsPerTrigger), so
    the per-fp partitions are micro-batch-sized, never corpus-sized.
    """
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def process_curation_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    quality_min: float = CURATION_QUALITY_MIN,
) -> None:
    """One micro-batch of the curation pipeline (the foreachBatch body).

    Module-level (not a closure) so retry semantics are directly
    testable: re-invoking with the same batch_id must leave the output
    tables exactly as a single successful invocation would.
    """
    corpus_dir = os.path.join(out_dir, "corpus")
    seen_dir = os.path.join(out_dir, "seen")
    b = _batch_canonical(
        batch_df.select(
            "doc_id",
            "text",
            fingerprint(F.col("text")).alias("fp"),
            quality_score(F.col("text")).alias("quality"),
        )
    )
    # Probe through the Hadoop FileSystem API, not os.path: with an
    # HDFS/S3 out_dir a driver-local isdir() is always False, and every
    # batch would silently skip cross-batch dedup (ADVICE r5).
    if dir_has_data(spark, seen_dir):
        # Exclude THIS batch's own partition: a retry that died between
        # the seen append and the corpus write would otherwise anti-join
        # the batch against its own fingerprints and silently drop it.
        # The != predicate is a partition filter — the excluded data is
        # pruned, not scanned.
        seen = (
            spark.read.parquet(seen_dir)
            .where(F.col("batch_id") != batch_id)
            .select("fp")
        )
        # Shuffled anti join — the seen side is corpus-sized, never
        # broadcast it.
        survivors = b.join(seen, "fp", "left_anti")
    else:
        survivors = b
    if PLAN_CAPTURE is not None:
        PLAN_CAPTURE.append(
            survivors._jdf.queryExecution().executedPlan().toString()
        )
    # localCheckpoint: `survivors` feeds BOTH sinks; without it the
    # second write re-runs the anti-join lineage, and the corpus write
    # below must not observe the seen-store append (its own fps would
    # anti-join themselves away on a lineage re-read).
    survivors = survivors.localCheckpoint(eager=True)
    # partitionOverwriteMode as a WRITER option, not session conf:
    # foreachBatch hands the batch an isolated session clone, so a conf
    # set on the driver session does not reach this write — static
    # overwrite would then wipe every earlier batch's partition
    # (observed: only the final batch survived).
    (
        survivors.select("fp", F.col("doc_id").alias("canonical_doc_id"))
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(seen_dir)
    )
    (
        survivors.where(F.col("quality") >= quality_min)
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(corpus_dir)
    )


def run_stream_curation(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    quality_min: float = CURATION_QUALITY_MIN,
    checkpoint_dir: str | None = None,
) -> None:
    """Run the curation stream to completion (availableNow trigger).

    ``docs`` is a streaming DataFrame with at least (doc_id, text).
    Writes two partitioned parquet tables under ``out_dir``:
    ``corpus/`` (curated survivors) and ``seen/`` (fingerprint store).
    """
    checkpoint = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        process_curation_batch(
            spark, batch_df, int(batch_id), out_dir, quality_min
        )

    (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# Written by process_curation_batch: survivors' columns + the batch_id
# partition column. Declared so post-run reads never depend on schema
# inference — a run whose batches all quality-gate to zero survivors
# leaves corpus/ with no data files (only _SUCCESS + empty partition
# dirs), where inference raises UNABLE_TO_INFER_SCHEMA.
CORPUS_SCHEMA = (
    "doc_id BIGINT, text STRING, fp STRING, quality DOUBLE, batch_id BIGINT"
)


def curated_corpus(spark: SparkSession, out_dir: str) -> DataFrame:
    """The curated corpus as a DataFrame (post-run read). Empty (not an
    error) when no batch produced a survivor — or none ran at all."""
    corpus_dir = os.path.join(out_dir, "corpus")
    if not path_exists(spark, corpus_dir):
        return spark.createDataFrame([], CORPUS_SCHEMA).select(
            "doc_id", "fp", "quality"
        )
    return (
        spark.read.schema(CORPUS_SCHEMA)
        .parquet(corpus_dir)
        .select("doc_id", "fp", "quality")
    )
