"""k-core peel exactness (SURVEY.md §5 strategy: iterative operators
with no SQL oracle get a pure-Python reference + property tests)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.kcore import kcore_nodes

from .conftest import SF_SMALL


def _py_kcore(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Reference peel: sequential, order-independent result."""
    adj: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    while True:
        drop = [n for n, s in adj.items() if len(s) < k]
        if not drop:
            break
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return {n: len(s) for n, s in adj.items() if s}


def _copurchase_edges(spark):
    # The SAME builder the registered graph queries use — the reference
    # peel below must validate kcore_nodes on the edge set the query
    # actually runs on, not a copy that can drift.
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        copurchase_edges,
    )

    return copurchase_edges(spark, SF_SMALL)


def test_kcore_matches_reference_on_fixture(spark):
    edges_df = _copurchase_edges(spark)
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    for k in (12, 22, 24):  # survivors, partial peel, full collapse
        want = _py_kcore(edges, k)
        got = {
            r["node"]: r["core_deg"]
            for r in kcore_nodes(edges_df, k=k).collect()
        }
        assert got == want, f"k={k}: {len(got)} vs {len(want)} nodes"


def test_kcore_random_graph_parity(spark):
    """Seeded pseudo-random graphs: hash-derived edges so Spark and the
    reference see the identical edge list without RNG in the test."""
    n_nodes, n_edges = 60, 400
    rows = spark.range(n_edges).select(
        (F.xxhash64("id") % n_nodes).alias("src"),
        (F.xxhash64("id", F.lit(1)) % n_nodes).alias("dst"),
    ).select(F.abs("src").alias("src"), F.abs("dst").alias("dst"))
    edges = [(r["src"], r["dst"]) for r in rows.collect()]
    for k in (3, 6, 10):
        want = _py_kcore(edges, k)
        got = {
            r["node"]: r["core_deg"]
            for r in kcore_nodes(rows, k=k).collect()
        }
        assert got == want, f"k={k}"


def test_kcore_deterministic(spark):
    edges_df = _copurchase_edges(spark)
    a = sorted(map(tuple, kcore_nodes(edges_df, k=22).collect()))
    b = sorted(map(tuple, kcore_nodes(edges_df, k=22).collect()))
    assert a == b
    assert a, "k=22 core must be non-empty on the fixture"
    assert all(d >= 22 for _, d in a)


def test_kcore_raises_on_exhausted_round_budget(spark):
    """A truncated peel is wrong, not approximate: survivors may have
    degree < k. A path graph peels only its 2 endpoints per round, so
    a tight round budget must raise instead of returning the
    half-peeled edge set."""
    import pytest

    path = spark.range(29).selectExpr("id AS src", "id + 1 AS dst")
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_nodes(path, k=2, max_iters=3)
    assert kcore_nodes(path, k=2, max_iters=30).count() == 0
