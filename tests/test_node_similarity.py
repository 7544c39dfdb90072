"""Hub-capped node-similarity: exactness below the cap, planted-hub
recall through the MinHash-LSH fallback, disjoint-path union."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.node_similarity import (
    node_similarity_pairs,
)

T = 0.5
CAP = 8  # test cap far below the planted hub degrees


def _planted_edges():
    """Two high-overlap hubs (deg 20/21 >> CAP) + exact low-degree
    cliques.  Hub Jaccard = 19/21."""
    edges = set()
    # hub 1000: neighbors 1..20; hub 2000: neighbors 1..19 and 21
    for n in range(1, 21):
        edges.add((n, 1000))
    for n in list(range(1, 20)) + [21]:
        edges.add((n, 2000))
    # low-degree planted pair: 51 and 52 share exactly {61, 62, 63}
    for n in (51, 52):
        for m in (61, 62, 63):
            edges.add((n, m))
    # a low pair below threshold: 70-{81,82,83,84}, 71-{81,85,86,87}
    for m in (81, 82, 83, 84):
        edges.add((70, m))
    for m in (81, 85, 86, 87):
        edges.add((71, m))
    return sorted((min(a, b), max(a, b)) for a, b in edges)


def _brute_force(edges):
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    out = {}
    for u, v in itertools.combinations(sorted(nbrs), 2):
        c = len(nbrs[u] & nbrs[v])
        un = len(nbrs[u] | nbrs[v])
        if un and c / un >= T:
            out[(u, v)] = (c, un)
    return nbrs, out


@pytest.fixture(scope="module")
def result(spark):
    edges = _planted_edges()
    und = spark.createDataFrame(edges, "u long, v long")
    rows = node_similarity_pairs(und, T, deg_cap=CAP).collect()
    return edges, rows


def test_no_duplicate_pairs(result):
    _, rows = result
    pairs = [(r["u"], r["v"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_every_emitted_row_is_exact(result):
    """Hub path may lose recall but must never emit a wrong value."""
    edges, rows = result
    _, want = _brute_force(edges)
    for r in rows:
        key = (r["u"], r["v"])
        assert key in want, key
        c, un = want[key]
        assert (r["n_common"], r["n_union"]) == (c, un)
        assert r["jaccard"] == pytest.approx(c / un)


def test_low_degree_pairs_are_complete(result):
    """Below the cap the prefix path is exact — zero misses."""
    edges, rows = result
    nbrs, want = _brute_force(edges)
    low_want = {
        k
        for k in want
        if len(nbrs[k[0]]) <= CAP and len(nbrs[k[1]]) <= CAP
    }
    got = {(r["u"], r["v"]) for r in rows}
    assert low_want <= got
    assert (51, 52) in low_want  # the planted low pair is non-trivial
    assert (70, 71) not in got  # sub-threshold pair stays out


def test_planted_hub_pair_recalled(result):
    """The deg-20 hubs (Jaccard 19/21 ~ 0.90) must surface through
    the LSH fallback even though both exceed the cap."""
    edges, rows = result
    nbrs, _ = _brute_force(edges)
    assert len(nbrs[1000]) > CAP and len(nbrs[2000]) > CAP
    got = {(r["u"], r["v"]): r for r in rows}
    assert (1000, 2000) in got
    r = got[(1000, 2000)]
    assert (r["n_common"], r["n_union"]) == (19, 21)


def test_registered_query_unchanged_at_test_scale(spark):
    """With the default cap (1024 >> max degree ~84) the registered
    query equals the pure exact formulation."""
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        copurchase_edges,
        part_node_similarity,
    )
    from big_data_analysis_diseases_outbreaks_spark.operators.triangles import (
        undirected_edges,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["u"], r["v"]): (r["n_common"], r["n_union"])
        for r in part_node_similarity(spark, sf).collect()
    }
    und = undirected_edges(copurchase_edges(spark, sf))
    edges = [(r["u"], r["v"]) for r in und.collect()]
    _, want = _brute_force(edges)
    assert got == {k: (c, un) for k, (c, un) in want.items()}
