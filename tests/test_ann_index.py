"""Streaming IVF index maintenance (streaming/ann_index.py): persisted
codebook, incremental cell-assignment appends, exactly-once across
retries/restarts, partition-pruned probe reads, recall of the
approximate serving path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.similarity import (
    brute_force_topk,
)
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table
from big_data_analysis_diseases_outbreaks_spark.streaming.ann_index import (
    append_batch,
    init_index,
    load_centroids,
    query_index,
    run_stream_index_maintenance,
)

SF_SMALL = "/root/testdata/sf0.001"


def _index_rows(spark, index_dir):
    return sorted(
        (r["vec_id"], r["cell"], r["batch_id"])
        for r in spark.read.parquet(os.path.join(index_dir, "vectors")).collect()
    )


@pytest.fixture()
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


def test_stream_ingest_equals_exact_when_all_cells_probed(
    spark, emb, tmp_path
):
    """Bootstrap on the first half, stream the second half in as
    micro-batches; with every cell probed, the index answer must be
    cell-for-cell the exact brute-force answer over the FULL corpus —
    proving no vector was lost, duplicated, or mis-assigned."""
    mid = emb.agg(F.max("vec_id")).collect()[0][0] // 2
    first, rest = emb.where(F.col("vec_id") <= mid), emb.where(
        F.col("vec_id") > mid
    )
    d = str(tmp_path / "idx")
    init_index(spark, first, d, n_cells=8)

    src = str(tmp_path / "src")
    rest.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    run_stream_index_maintenance(
        spark, stream, d, checkpoint_dir=str(tmp_path / "ckpt")
    )

    queries = emb.where(F.col("vec_id") < 5)
    got = sorted(
        map(tuple, query_index(spark, queries, d, k=3, n_probe=8).collect())
    )
    want = sorted(map(tuple, brute_force_topk(queries, emb, k=3).collect()))
    assert got == want


def test_append_batch_is_idempotent(spark, emb, tmp_path):
    """A retried micro-batch (same batch_id) must REPLACE its previous
    output, leaving the index identical — the exactly-once contract."""
    half = emb.where(F.col("vec_id") < 250)
    more = emb.where(F.col("vec_id") >= 250)
    d = str(tmp_path / "idx")
    init_index(spark, half, d, n_cells=8)
    append_batch(spark, more, 0, d)
    baseline = _index_rows(spark, d)
    append_batch(spark, more, 0, d)  # retry
    assert _index_rows(spark, d) == baseline


def test_stream_restart_processes_nothing_new(spark, emb, tmp_path):
    """Re-running the ingest stream over the same source with the same
    checkpoint appends nothing (offsets committed) — index unchanged."""
    first = emb.where(F.col("vec_id") < 250)
    rest = emb.where(F.col("vec_id") >= 250)
    d = str(tmp_path / "idx")
    init_index(spark, first, d, n_cells=8)
    src = str(tmp_path / "src")
    rest.repartition(2).write.parquet(src)

    def run():
        stream = (
            spark.readStream.schema(emb.schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        run_stream_index_maintenance(
            spark, stream, d, checkpoint_dir=str(tmp_path / "ckpt")
        )

    run()
    baseline = _index_rows(spark, d)
    assert len(baseline) == emb.count()
    run()  # restart: everything already committed
    assert _index_rows(spark, d) == baseline


def test_probe_join_prunes_partitions_dynamically(spark, emb, tmp_path):
    """The query path must NOT scan the whole vector table: the probe
    join on the `cell` partition column is eligible for dynamic
    partition pruning, and the executed plan must show the pruning
    subquery feeding the vector-table scan."""
    d = str(tmp_path / "idx")
    init_index(spark, emb, d, n_cells=8)
    q = query_index(
        spark, emb.where(F.col("vec_id") < 3), d, k=1, n_probe=1
    )
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan


def test_codebook_is_persisted_and_deterministic(spark, emb, tmp_path):
    """Two inits from the same bootstrap produce identical centroids
    (seeded Lloyd), and load_centroids round-trips them exactly."""
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    init_index(spark, emb, d1, n_cells=8)
    init_index(spark, emb, d2, n_cells=8)
    C1, n1 = load_centroids(spark, d1)
    C2, _ = load_centroids(spark, d2)
    assert C1.shape == (8, 64) and (C1 == C2).all()
    assert ((C1 * C1).sum(axis=1) == n1).all()


def test_approximate_probe_recall(spark, emb, tmp_path):
    """The serving configuration (n_probe < n_cells) keeps useful
    recall: top-1 agreement with exact brute force on a decent fraction
    of queries — same bar as the batch ivf_topk test."""
    d = str(tmp_path / "idx")
    init_index(spark, emb, d, n_cells=8)
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        r["query_id"]: r["cand_id"]
        for r in brute_force_topk(queries, emb, k=1).collect()
    }
    approx = {
        r["query_id"]: r["cand_id"]
        for r in query_index(spark, queries, d, k=1, n_probe=2).collect()
    }
    hits = sum(1 for q, c in approx.items() if exact.get(q) == c)
    assert hits / len(exact) >= 0.3
