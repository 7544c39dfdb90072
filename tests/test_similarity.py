"""Similarity-search tests: brute-force correctness properties + LSH
recall against the exact baseline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
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


def test_ivf_topk_recall(spark):
    """IVF with n_probe of n_cells probed: top-1 should agree with brute
    force on a decent fraction of queries, and be deterministic
    (seed=1 codebook)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        r["query_id"]: r["cand_id"]
        for r in brute_force_topk(queries, emb, k=1).collect()
    }
    rows1 = ivf_topk(queries, emb, k=1).collect()
    rows2 = ivf_topk(queries, emb, k=1).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))
    approx = {r["query_id"]: r["cand_id"] for r in rows1}
    hits = sum(1 for q, c in approx.items() if exact.get(q) == c)
    recall = hits / len(exact)
    assert recall >= 0.3, f"IVF top-1 recall vs brute force too low: {recall:.2f}"


def test_ivf_topk_corpus_smaller_than_n_cells(spark):
    """A candidate set smaller than n_cells (tiny tenant corpus /
    filtered subset) fits fewer cells instead of crashing the seeded
    Lloyd init, and with every cell probed the result degenerates to
    the exact answer."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    tiny = emb.where(F.col("vec_id") < 5)  # < default n_cells=16
    queries = emb.where(F.col("vec_id") < 3)
    got = {
        r["query_id"]: r["cand_id"]
        for r in ivf_topk(queries, tiny, k=1, n_probe=16).collect()
    }
    exact = {
        r["query_id"]: r["cand_id"]
        for r in brute_force_topk(queries, tiny, k=1).collect()
    }
    assert got == exact


def test_dedup_embedding_cosine_finds_planted_pairs(spark):
    """Every original vector must pair with its perturbed copy (cosine
    ≈ 0.999 ≥ 0.98), and nothing else at this threshold."""
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

    q = all_queries()["dedup_embedding_cosine"]
    rows = q.fn(spark, SF_SMALL).collect()
    n_emb = load_table(spark, SF_SMALL, "embeddings").count()
    assert len(rows) == n_emb
    for r in rows:
        assert r["vec_id_2"] == r["vec_id_1"] + 100_000
        assert r["cos_sim"] >= 0.98


def test_lsh_near_dup_recall_vs_exact(spark):
    """The bucketed near-dup path must find ≥95% of the pairs the exact
    all-pairs verifier finds (planted perturbed copies, cosine ≈ 0.999),
    with no pair below the threshold."""
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

    exact_pairs = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in all_queries()["dedup_embedding_cosine"].fn(spark, SF_SMALL).collect()
    }
    lsh_rows = all_queries()["dedup_embedding_lsh"].fn(spark, SF_SMALL).collect()
    lsh_pairs = {(r["vec_id_1"], r["vec_id_2"]) for r in lsh_rows}
    assert all(r["cos_sim"] >= 0.98 for r in lsh_rows)
    assert lsh_pairs <= exact_pairs, "LSH found a pair the exact path did not"
    recall = len(lsh_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.95, f"LSH near-dup recall too low: {recall:.2f}"


def test_ivf_pq_topk_recall(spark):
    """IVF-PQ with exact refinement: the shortlist is cell-restricted
    (same coverage bound as plain IVF) but the refine pass rescores with
    full-precision cosine, so top-1 must agree with brute force at least
    as often as the unrefined quantized ranking would — and be
    deterministic (seeded coarse + subspace codebooks)."""
    from big_data_analysis_diseases_outbreaks_spark.operators.similarity import (
        ivf_pq_topk,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        r["query_id"]: r["cand_id"]
        for r in brute_force_topk(queries, emb, k=1).collect()
    }
    rows1 = ivf_pq_topk(queries, emb, k=1).collect()
    rows2 = ivf_pq_topk(queries, emb, k=1).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))
    approx = {r["query_id"]: r["cand_id"] for r in rows1}
    assert len(approx) == len(exact)
    hits = sum(1 for q, c in approx.items() if exact.get(q) == c)
    recall = hits / len(exact)
    assert recall >= 0.3, f"IVF-PQ top-1 recall too low: {recall:.2f}"


def test_semdedup_recall_vs_exact(spark):
    """SemDeDup's cell blocking must recover ≥95% of the exact all-pairs
    near-dup set (each planted pair is a 1.05× first-coordinate
    perturbation — the quantizer should map both copies to the same
    cell), and must never invent a pair the exact path lacks."""
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

    from .conftest import SF_ORACLE

    qs = all_queries()
    exact = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in qs["dedup_embedding_cosine"].fn(spark, SF_ORACLE).collect()
    }
    sem_rows = qs["dedup_semdedup"].fn(spark, SF_ORACLE).collect()
    sem = {(r["vec_id_1"], r["vec_id_2"]) for r in sem_rows}
    assert all(r["cos_sim"] >= 0.98 for r in sem_rows)
    assert sem <= exact, "semdedup found a pair the exact verifier did not"
    recall = len(sem & exact) / len(exact)
    assert recall >= 0.95, f"semdedup recall too low: {recall:.2f}"


def test_maxsim_matches_numpy_reference(spark):
    """colbert_maxsim_topk must equal an independent numpy MaxSim
    computation (split → per-query-subvec max dot → sum) at sf0.001."""
    import numpy as np
    import pandas as pd

    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

    sf = SF_SMALL
    got = (
        all_queries()["colbert_maxsim_topk"]
        .fn(spark, sf)
        .orderBy("query_id", "rank")
        .collect()
    )
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }
    subs = {k: v.reshape(4, 16) for k, v in vecs.items()}

    def maxsim(q, c):
        sims = subs[q] @ subs[c].T  # (4 q-subvecs) x (4 c-subvecs)
        return round(float(sims.max(axis=1).sum()), 4)

    for qid in range(5):
        scored = sorted(
            ((maxsim(qid, c), c) for c in subs if c != qid),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        rows = [r for r in got if r["query_id"] == qid]
        assert [(r["maxsim"], r["cand_id"]) for r in rows] == scored, qid
        assert [r["rank"] for r in rows] == [1, 2, 3]


def test_rag_chunk_retrieval_contract(spark):
    """Structural contract of the composed RAG pipeline: exactly k
    ranked rows per query, never a chunk of the query's own document,
    ranks dense from 1, scores within [-1, 1] and non-increasing.
    (Exact values are oracle-pinned in test_oracle_parity.)"""
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

    rows = (
        all_queries()["rag_chunk_retrieval"]
        .fn(spark, SF_SMALL)
        .orderBy("query_doc_id", "rank")
        .collect()
    )
    by_q = {}
    for r in rows:
        assert r["cand_doc_id"] != r["query_doc_id"], "retrieved own doc"
        assert -1.0001 <= r["cos_sim"] <= 1.0001
        by_q.setdefault(r["query_doc_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        assert [r["rank"] for r in rs] == [1, 2, 3], q
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True), q


def test_matryoshka_recall_full_dim_is_one(spark):
    """The full-dimension row is its own baseline (recall exactly 1.0),
    every configured prefix length appears, and hit counts are bounded
    by k x n_queries."""
    from big_data_analysis_diseases_outbreaks_spark.queries.embeddings import (
        _MAT_DIMS,
        _MAT_K,
        _N_QUERIES,
        embedding_matryoshka_recall,
    )

    rows = {
        r["trunc_dim"]: r
        for r in embedding_matryoshka_recall(spark, SF_SMALL).collect()
    }
    assert set(rows) == set(_MAT_DIMS)
    full = rows[_MAT_DIMS[-1]]
    assert full["n_expected"] == _MAT_K * _N_QUERIES
    assert full["hits"] == full["n_expected"] and full["recall"] == 1.0
    for r in rows.values():
        assert 0 <= r["hits"] <= r["n_expected"]
        assert r["recall"] == r["hits"] / r["n_expected"]
