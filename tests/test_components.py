"""Connected-components operator (operators/components.py)."""

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.components import (
    connected_components,
    dedup_cluster_canonical,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


def test_components_chain_and_island(spark):
    cc = connected_components(_edges(spark, [(1, 2), (2, 3), (4, 5)]))
    got = {r["node"]: r["label"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_components_long_chain_converges(spark):
    # 0-1-2-…-12: min label must propagate the full diameter.
    cc = connected_components(_edges(spark, [(i, i + 1) for i in range(12)]))
    labels = {r["label"] for r in cc.collect()}
    assert labels == {0}


def test_components_edge_direction_irrelevant(spark):
    a = connected_components(_edges(spark, [(2, 1), (3, 2)]))
    b = connected_components(_edges(spark, [(1, 2), (2, 3)]))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_canonical_marks_min_and_singletons(spark):
    cc = connected_components(_edges(spark, [(10, 11)]))
    docs = spark.createDataFrame([(10,), (11,), (12,)], "doc_id LONG")
    out = dedup_cluster_canonical(cc, docs)
    got = {r["doc_id"]: (r["component"], r["is_canonical"]) for r in out.collect()}
    assert got == {10: (10, 1), 11: (10, 0), 12: (12, 1)}


# --- PageRank (operators/pagerank.py) --------------------------------------


def test_pagerank_cycle_is_exact_fixed_point(spark):
    """On a directed cycle every node's rank is a fixed point of the
    integer recurrence: BASE + (85 · SCALE) // 100 == SCALE exactly, so
    all ranks stay at SCALE through every round — a closed-form check
    of the fixed-point arithmetic."""
    from big_data_analysis_diseases_outbreaks_spark.operators.pagerank import (
        SCALE,
        pagerank,
    )

    cycle = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    got = {r["node"]: r["pagerank_scaled"] for r in pagerank(cycle, 4).collect()}
    assert got == {1: SCALE, 2: SCALE, 3: SCALE}


def test_pagerank_star_hub_dominates_and_is_deterministic(spark):
    """Undirected star: the hub must outrank every leaf, leaves tie
    exactly (integer arithmetic — no float jitter), and two runs are
    bit-identical."""
    from big_data_analysis_diseases_outbreaks_spark.operators.pagerank import (
        pagerank,
    )

    pairs = []
    for leaf in range(2, 8):
        pairs += [(1, leaf), (leaf, 1)]
    star = _edges(spark, pairs)
    r1 = {r["node"]: r["pagerank_scaled"] for r in pagerank(star, 6).collect()}
    r2 = {r["node"]: r["pagerank_scaled"] for r in pagerank(star, 6).collect()}
    assert r1 == r2
    leaf_ranks = {r1[n] for n in range(2, 8)}
    assert len(leaf_ranks) == 1
    assert r1[1] > leaf_ranks.pop()


def test_pagerank_restores_shuffle_partitions(spark):
    """The loop pins spark.sql.shuffle.partitions to the graph size and
    MUST restore the session value afterwards."""
    from big_data_analysis_diseases_outbreaks_spark.operators.pagerank import (
        pagerank,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    pagerank(_edges(spark, [(1, 2), (2, 1)]), 2).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_pagerank_reliable_checkpoint_matches_local(spark, tmp_path):
    """Cluster mode (reliable checkpoint() per round) must be
    bit-identical to the localCheckpoint default — only fault-tolerance
    differs, never values."""
    from big_data_analysis_diseases_outbreaks_spark.operators.pagerank import (
        pagerank,
    )

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 3), (5, 1), (1, 5)]
    g = _edges(spark, pairs)
    local = {r["node"]: r["pagerank_scaled"] for r in pagerank(g, 5).collect()}
    reliable = {
        r["node"]: r["pagerank_scaled"]
        for r in pagerank(
            g, 5, checkpoint_dir=str(tmp_path / "pr_ckpt")
        ).collect()
    }
    assert reliable == local
    # The reliable path must actually have written round state there.
    assert any((tmp_path / "pr_ckpt").rglob("*")), "no checkpoint written"


def test_components_reliable_checkpoint_matches_local(spark, tmp_path):
    g = _edges(spark, [(1, 2), (2, 3), (7, 8), (9, 9)])
    local = sorted(map(tuple, connected_components(g).collect()))
    reliable = sorted(
        map(
            tuple,
            connected_components(
                g, checkpoint_dir=str(tmp_path / "cc_ckpt")
            ).collect(),
        )
    )
    assert reliable == local
    assert any((tmp_path / "cc_ckpt").rglob("*")), "no checkpoint written"


# --- Triangle counting (operators/triangles.py) ----------------------------


def test_triangles_known_graphs(spark):
    from big_data_analysis_diseases_outbreaks_spark.operators.triangles import (
        triangle_counts,
    )

    # K4: every vertex sits in C(3,2)=3 triangles.
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, k4)).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # C4 (square): no triangles at all.
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert triangle_counts(_edges(spark, c4)).count() == 0
    # Two disjoint triangles + a pendant edge: each triangle vertex in
    # exactly one; pendant vertices absent.
    g = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (1, 99)]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, g)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 12: 1}


def test_triangles_direction_and_duplicate_invariant(spark):
    """Orientation must canonicalize: reversed/duplicated/self edges
    change nothing."""
    from big_data_analysis_diseases_outbreaks_spark.operators.triangles import (
        triangle_counts,
    )

    base = [(1, 2), (2, 3), (3, 1)]
    noisy = base + [(2, 1), (3, 2), (1, 3), (1, 1), (2, 3), (3, 1)]
    a = sorted(map(tuple, triangle_counts(_edges(spark, base)).collect()))
    b = sorted(map(tuple, triangle_counts(_edges(spark, noisy)).collect()))
    assert a == b == [(1, 1), (2, 1), (3, 1)]


def test_triangles_reliable_checkpoint_matches_local(spark, tmp_path):
    from big_data_analysis_diseases_outbreaks_spark.operators.triangles import (
        triangle_counts,
    )

    g = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (9, 9)])
    local = sorted(map(tuple, triangle_counts(g).collect()))
    reliable = sorted(
        map(
            tuple,
            triangle_counts(
                g, checkpoint_dir=str(tmp_path / "tri_ckpt")
            ).collect(),
        )
    )
    assert reliable == local
    assert any((tmp_path / "tri_ckpt").rglob("*")), "no checkpoint written"


def test_triangles_restore_shuffle_partitions(spark):
    from big_data_analysis_diseases_outbreaks_spark.operators.triangles import (
        triangle_counts,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    triangle_counts(_edges(spark, [(1, 2), (2, 3), (3, 1)])).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


# --- Personalized PageRank (operators/pagerank.py) --------------------------


def _ppr_python(edges, seeds, n_iter, scale):
    """Pure-Python replica of the exact-integer PPR recurrence."""
    from big_data_analysis_diseases_outbreaks_spark.operators.pagerank import (
        DAMP_DEN,
        DAMP_NUM,
    )

    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (scale * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    nodes = sorted(outdeg)
    rank = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(n_iter):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            if d in contrib:
                contrib[d] += rank[s] // outdeg[s]
        rank = {
            n: (base if n in seeds else 0)
            + DAMP_NUM * (contrib[n] // DAMP_DEN)
            + (DAMP_NUM * (contrib[n] % DAMP_DEN)) // DAMP_DEN
            for n in nodes
        }
    return rank


def test_ppr_matches_python_and_decays_from_seed(spark):
    """Two symmetrized chains a-b-c-d and x-y; seed {a}: the far end of
    the seed's chain ranks below the near end, the x-y component gets
    ZERO mass, and every value matches the pure-Python integer replica.
    (No strict per-hop monotonicity claim: a degree-1 seed forwards
    ALL its mass to its only neighbor, which can legitimately outrank
    the seed itself.)"""
    from big_data_analysis_diseases_outbreaks_spark.operators.pagerank import (
        SCALE,
        personalized_pagerank,
    )

    pairs = []
    for u, v in [(1, 2), (2, 3), (3, 4), (10, 11)]:
        pairs += [(u, v), (v, u)]
    edges = _edges(spark, pairs)
    seeds = spark.createDataFrame([(1,)], "node LONG")
    got = {
        r["node"]: r["ppr_scaled"]
        for r in personalized_pagerank(edges, seeds, n_iter=6).collect()
    }
    want = _ppr_python(pairs, {1}, 6, SCALE)
    assert got == want
    assert min(got[1], got[2], got[3], got[4]) > 0
    assert got[4] < got[2]
    assert got[10] == got[11] == 0


def test_ppr_uniform_seed_set_equals_pagerank(spark):
    """Seeding EVERY node reduces PPR to ordinary PageRank exactly
    (identical integer recurrences)."""
    from big_data_analysis_diseases_outbreaks_spark.operators.pagerank import (
        pagerank,
        personalized_pagerank,
    )

    pairs = []
    for leaf in range(2, 6):
        pairs += [(1, leaf), (leaf, 1)]
    edges = _edges(spark, pairs)
    seeds = spark.createDataFrame([(n,) for n in range(1, 6)], "node LONG")
    ppr = {
        r["node"]: r["ppr_scaled"]
        for r in personalized_pagerank(edges, seeds, n_iter=4).collect()
    }
    pr = {
        r["node"]: r["pagerank_scaled"]
        for r in pagerank(edges, n_iter=4).collect()
    }
    assert ppr == pr
