"""Similarity-search tests: brute-force correctness properties + LSH
recall against the exact baseline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_brute_force_topk_properties(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    topk = brute_force_topk(emb.where(F.col("vec_id") < 5), emb, k=3)
    rows = topk.collect()
    assert len(rows) == 5 * 3
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
        assert -1.0001 <= r["cos_sim"] <= 1.0001
        assert r["cand_id"] != r["query_id"]
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3]
        scores = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)


def test_lsh_topk_recall(spark):
    """LSH candidates are bucket-restricted; its top-1 should agree with
    brute force on a decent fraction of queries (same-bucket nearest
    neighbors — with 8 hyperplanes on clustered data, bucket collisions
    keep true neighbors together)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        r["query_id"]: r["cand_id"]
        for r in brute_force_topk(queries, emb, k=1).collect()
    }
    approx = {
        r["query_id"]: r["cand_id"]
        for r in lsh_topk(queries, emb, k=1).collect()
    }
    assert approx, "LSH returned nothing — buckets degenerate"
    hits = sum(1 for q, c in approx.items() if exact.get(q) == c)
    recall = hits / len(exact)
    assert recall >= 0.3, f"LSH top-1 recall vs brute force too low: {recall:.2f}"
