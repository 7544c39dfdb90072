"""k-truss edge peel (operators/ktruss.py) vs a pure-Python reference
peel — fixtures with known trusses plus seeded random graphs."""

from __future__ import annotations

import itertools
import random

import pytest

from big_data_analysis_diseases_outbreaks_spark.operators.ktruss import (
    ktruss_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


def _python_ktruss(pairs, k):
    """Reference batch peel: identical semantics, no Spark."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        nbrs = {}
        for u, v in edges:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        sup = {
            (u, v): len(nbrs[u] & nbrs[v]) for u, v in edges
        }
        keep = {e for e, s in sup.items() if s >= k - 2}
        if keep == edges:
            return {e: sup[e] for e in edges}
        edges = keep
        if not edges:
            return {}


def _collect(df):
    return {(r["u"], r["v"]): r["support"] for r in df.collect()}


def test_k4_is_a_4_truss(spark):
    k4 = list(itertools.combinations(range(4), 2))
    got = _collect(ktruss_edges(_edges(spark, k4), 4))
    assert got == {e: 2 for e in k4}
    # ...but not a 5-truss
    assert ktruss_edges(_edges(spark, k4), 5).count() == 0


def test_pendant_triangle_peels_off(spark):
    """K4 with a pendant triangle hanging off one vertex: the pendant
    survives 3-truss but not 4-truss; K4 survives both."""
    k4 = list(itertools.combinations(range(4), 2))
    pendant = [(3, 10), (3, 11), (10, 11)]
    g = k4 + pendant
    got3 = _collect(ktruss_edges(_edges(spark, g), 3))
    assert set(got3) == {tuple(sorted(e)) for e in g}
    got4 = _collect(ktruss_edges(_edges(spark, g), 4))
    assert set(got4) == set(k4)
    assert got4 == {e: 2 for e in k4}


def test_triangle_free_graph_empty(spark):
    square = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert ktruss_edges(_edges(spark, square), 3).count() == 0


def test_direction_and_duplicates_irrelevant(spark):
    base = list(itertools.combinations(range(4), 2))
    noisy = base + [(b, a) for a, b in base] + [(0, 0), (1, 2)]
    a = _collect(ktruss_edges(_edges(spark, base), 4))
    b = _collect(ktruss_edges(_edges(spark, noisy), 4))
    assert a == b


@pytest.mark.parametrize("seed,k", [(1, 3), (2, 4), (3, 5)])
def test_random_graphs_match_python(spark, seed, k):
    rng = random.Random(seed)
    nodes = list(range(24))
    pairs = [
        (u, v)
        for u, v in itertools.combinations(nodes, 2)
        if rng.random() < 0.25
    ]
    got = _collect(ktruss_edges(_edges(spark, pairs), k))
    assert got == _python_ktruss(pairs, k)


def test_k_below_3_raises(spark):
    with pytest.raises(ValueError):
        ktruss_edges(_edges(spark, [(1, 2)]), 2)


def test_restores_shuffle_partitions(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    ktruss_edges(_edges(spark, [(1, 2), (2, 3), (3, 1)]), 3).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
