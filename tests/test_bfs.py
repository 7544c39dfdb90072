"""Bounded-depth BFS exactness (SURVEY.md §5 strategy: iterative
operators get a pure-Python reference + property tests; the registered
query also carries a recursive-CTE DuckDB oracle)."""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.bfs import bfs_distances

from .conftest import SF_SMALL


def _py_bfs(
    edges: list[tuple[int, int]], seeds: set[int], max_hops: int
) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    dist = {s: 0 for s in seeds}
    frontier = deque(seeds)
    while frontier:
        u = frontier.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                frontier.append(v)
    return dist


def _edges_df(spark, n_nodes=40, n_edges=160):
    # Hash-derived pseudo-random digraph: Spark and the reference see
    # the identical edge list without RNG in the test.
    return (
        spark.range(n_edges)
        .select(
            F.abs(F.xxhash64("id") % n_nodes).alias("src"),
            F.abs(F.xxhash64("id", F.lit(7)) % n_nodes).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )


def test_bfs_matches_reference_on_random_graph(spark):
    edges_df = _edges_df(spark)
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    seeds = {0, 5}
    seeds_df = spark.createDataFrame([(s,) for s in seeds], "node LONG")
    for hops in (0, 1, 2, 4):
        want = _py_bfs(edges, seeds, hops)
        got = {
            r["node"]: r["dist"]
            for r in bfs_distances(edges_df, seeds_df, max_hops=hops).collect()
        }
        assert got == want, f"hops={hops}"


def test_bfs_directedness_and_unreachable(spark):
    # 0→1→2→3 chain plus an untouched island 8→9: direction respected,
    # unreachable nodes absent, distances are hop counts.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (8, 9)], "src LONG, dst LONG"
    )
    seeds = spark.createDataFrame([(0,)], "node LONG")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_hops=2).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}
    # Seeding the sink of the chain reaches nothing new.
    seeds3 = spark.createDataFrame([(3,)], "node LONG")
    got3 = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds3, max_hops=3).collect()
    }
    assert got3 == {3: 0}


def test_bfs_min_distance_not_first_path(spark):
    # Two routes to node 4: direct (1 hop) and via 2→3 (2 hops) — the
    # level-synchronous expansion must record 1.
    edges = spark.createDataFrame(
        [(0, 4), (0, 2), (2, 3), (3, 4)], "src LONG, dst LONG"
    )
    seeds = spark.createDataFrame([(0,)], "node LONG")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_hops=3).collect()
    }
    assert got == {0: 0, 4: 1, 2: 1, 3: 2}


def test_bfs_reliable_checkpoint_identical(spark, tmp_path):
    """Cluster mode (reliable checkpoint()) is bit-identical to the
    localCheckpoint default — same contract as components/pagerank."""
    edges_df = _edges_df(spark)
    seeds_df = spark.createDataFrame([(0,)], "node LONG")
    local = {
        (r["node"], r["dist"])
        for r in bfs_distances(edges_df, seeds_df, max_hops=3).collect()
    }
    reliable = {
        (r["node"], r["dist"])
        for r in bfs_distances(
            edges_df,
            seeds_df,
            max_hops=3,
            checkpoint_dir=str(tmp_path / "ckpt"),
        ).collect()
    }
    assert local == reliable


def test_khop_query_on_copurchase_fixture(spark):
    """The registered query's seeds and distances agree with the
    reference BFS on the sf0.001 co-purchase graph."""
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        _BFS_HOPS,
        _BFS_SEED_MOD,
        copurchase_edges,
        part_copurchase_khop,
    )

    edges_df = copurchase_edges(spark, SF_SMALL).distinct()
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    seeds = {u for u, _ in edges if u % _BFS_SEED_MOD == 0}
    want = _py_bfs(edges, seeds, _BFS_HOPS)
    got = {
        r["part_key"]: r["dist"]
        for r in part_copurchase_khop(spark, SF_SMALL).collect()
    }
    assert got == want
