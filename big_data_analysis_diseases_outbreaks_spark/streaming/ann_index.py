"""Persistent, incrementally-maintained IVF similarity index over a
vector stream.

The batch ANN operators (``operators/similarity.py``) refit their
coarse codebook per invocation — right for ad-hoc analysis, wrong for a
serving index over a growing corpus. At 100 TB the codebook is fit ONCE
on a bounded bootstrap sample and persisted beside the index; every
ingest micro-batch only ASSIGNS its new vectors to the existing cells
(one numpy matmul per Arrow batch — a narrow map, no shuffle) and
appends them to a cell-partitioned table. Codebook drift is handled by
an offline rebuild, exactly as FAISS/Milvus treat IVF retraining.

Query path: each query ranks the persisted centroids, probes its
``n_probe`` nearest cells, and joins the cell-partitioned vector table
on the partition column — so the scan reads only the probed cells'
files (partition pruning), never the rest of the corpus.

Exactly-once ingest: each micro-batch writes through dynamic partition
overwrite into its own ``batch_id`` partitions, so a retried batch
replaces its previous output instead of appending a second copy — the
same recipe as ``streaming/curation.py`` and
``pipeline.run_stream_upsert_snapshot``.

Layout under ``index_dir``:
  centroids/   (cell INT, centroid ARRAY<DOUBLE>)   — n_cells rows
  vectors/     (vec_id, embedding) partitioned by (cell, batch_id)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    _fit_coarse_codebook,
    _make_cell_ranks_udf,
    probe_queries,
    probe_score_topk,
)

BOOTSTRAP_BATCH_ID = -1


def init_index(
    spark: SparkSession,
    bootstrap: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    emb_col: str = "embedding",
) -> None:
    """Fit the coarse codebook on the bootstrap corpus (bounded sample,
    seeded numpy Lloyd — deterministic) and write centroids + the
    bootstrap vectors themselves (as ``batch_id=-1``)."""
    C, c_norm2, _ = _fit_coarse_codebook(bootstrap, emb_col, n_cells)
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(C)],
        "cell INT, centroid ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids")
    )
    append_batch(
        spark,
        bootstrap,
        BOOTSTRAP_BATCH_ID,
        index_dir,
        emb_col,
        centroids=(C, c_norm2),
    )


def load_centroids(spark: SparkSession, index_dir: str):
    """Centroid matrix + row norms² from the persisted codebook —
    n_cells rows, the one sanctioned bounded collect on this path."""
    import numpy as np

    rows = (
        spark.read.parquet(os.path.join(index_dir, "centroids"))
        .orderBy("cell")
        .collect()
    )
    C = np.array([r["centroid"] for r in rows])
    return C, (C * C).sum(axis=1)


def append_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    emb_col: str = "embedding",
    centroids=None,
) -> None:
    """One ingest micro-batch: assign each vector its nearest existing
    cell and write into (cell, batch_id) partitions. Narrow map + a
    partitioned write — no shuffle, no codebook refit. Idempotent per
    batch_id (dynamic partition overwrite). ``centroids``: pass a
    pre-loaded (C, norms²) to skip the codebook read — they are
    immutable for an index lifetime, so callers driving many batches
    (the stream loop) load once."""
    C, c_norm2 = centroids or load_centroids(spark, index_dir)
    cell_ranks = _make_cell_ranks_udf(C, c_norm2)
    (
        batch_df.select(
            "vec_id",
            F.col(emb_col).alias("embedding"),
            cell_ranks(F.col(emb_col))[0].alias("cell"),
        )
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell", "batch_id")
        .parquet(os.path.join(index_dir, "vectors"))
    )


def run_stream_index_maintenance(
    spark: SparkSession,
    vec_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str | None = None,
    emb_col: str = "embedding",
) -> None:
    """Drive the ingest stream to completion (availableNow): one
    append_batch per micro-batch, exactly-once across retries and
    restarts (checkpointed offsets + idempotent partition writes)."""
    checkpoint = checkpoint_dir or os.path.join(index_dir, "_checkpoint")
    centroids = load_centroids(spark, index_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(
            spark,
            batch_df,
            int(batch_id),
            index_dir,
            emb_col,
            centroids=centroids,
        )

    (
        vec_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def query_index(
    spark: SparkSession,
    queries: DataFrame,
    index_dir: str,
    k: int = 3,
    n_probe: int = 4,
    emb_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors from the persisted index. Each query probes its
    ``n_probe`` nearest cells; the broadcast join on the partition
    column lets Spark prune the vector table to the probed cells' files
    (plan-asserted in tests/test_ann_index.py). Scoring and ranking are
    identical to ``brute_force_topk`` — with n_probe = n_cells the
    result is exactly the exact answer, which is how the registry query
    value-oracles this whole pipeline."""
    C, c_norm2 = load_centroids(spark, index_dir)
    cell_ranks = _make_cell_ranks_udf(C, c_norm2)
    q = probe_queries(queries, cell_ranks, n_probe, emb_col)
    cand = spark.read.parquet(os.path.join(index_dir, "vectors")).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        "cell",
    )
    # dedup_pairs: a vector ingested by several batches would appear
    # once per copy; the index write is idempotent per batch so this is
    # belt-and-braces.
    return probe_score_topk(q, cand, k, dedup_pairs=True)
