"""k-truss decomposition by iterative edge peeling.

The k-truss is the maximal subgraph in which every EDGE closes at
least k-2 triangles — the edge-level cohesion criterion (Cohen '08),
strictly stronger than the k-core's node-degree one: a (k)-truss is
always inside the (k-1)-core, and truss edges are the classic
community-backbone / strong-tie extractor. Distributed batch peel
(the k-core loop lifted from nodes to edges):

    repeat: per-edge triangle support → drop edges with support < k-2
    until no edge is dropped.

Per round: one orientation (degree agg + join, the O(√m)-bounded
layout from operators/triangles.py), one wedge self-join, one support
aggregate keyed by the canonical edge, then a support filter — every
triangle side is itself a live edge, so the filtered support table IS
the next live set (no semi-join back), and carrying support through
the round's checkpoint lets the fixpoint round return directly instead
of re-running the triangle pass. Every step keyed and cluster-wide.
Rounds converge in O(peel depth). Same loop hygiene as kcore/pagerank: per-round eager lineage
truncation, shuffle width pinned from the edge count, reliable-
checkpoint option, fail-loud round budget (a truncated peel is wrong,
not approximate).

Not SQL-oracle-able (data-dependent fixpoint, the kcore rationale);
exactness is pinned by tests/test_ktruss.py against a pure-Python
reference peel on fixtures and random graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kcore import _EDGES_PER_PARTITION
from .triangles import _orient, undirected_edges


def _edge_support(live: DataFrame) -> DataFrame:
    """(u, v, support): triangles per canonical live edge (absent =
    zero support)."""
    o = _orient(live)
    o1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    o2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    o3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = o1.join(o2, "y").join(o3, ["x", "z"])
    sides = F.array(
        F.struct(F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")),
        F.struct(F.least("y", "z").alias("u"), F.greatest("y", "z").alias("v")),
        F.struct(F.least("x", "z").alias("u"), F.greatest("x", "z").alias("v")),
    )
    return (
        tri.select(F.explode(sides).alias("e"))
        .select("e.u", "e.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )


def ktruss_edges(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(u, v, support) for every edge of the k-truss (u < v);
    ``support`` is the edge's triangle count WITHIN the truss
    (≥ k-2 by definition). Edges outside the truss are absent.
    Requires k ≥ 3. Deterministic: the batch peel drops the same edge
    set regardless of partitioning."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    from .checkpointing import counted_truncator, truncator

    truncate = truncator(edges, checkpoint_dir)
    truncate_counted = counted_truncator(edges, checkpoint_dir)
    # Lazy checkpoint + count: one materializing job, not two.
    live = truncate_counted(undirected_edges(edges, src, dst))
    n_edges = live.count()
    spark = live.sparkSession
    n_part = min(
        spark.sparkContext.defaultParallelism,
        n_edges // _EDGES_PER_PARTITION + 1,
    )
    live = live.repartition(n_part, "u").transform(truncate)
    prev_edges = n_edges
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    try:
        for _ in range(max_iters):
            # Every triangle side is itself an edge of `live`, so the
            # support table's keys are a SUBSET of the live edges and
            # the filtered support table IS the next live set — no
            # semi-join back against `live` needed. Materializing
            # (u, v, support) per round also means the fixpoint round
            # returns its support directly instead of re-running the
            # whole triangle pass once more (the pre-r14 shape paid the
            # most expensive stage twice on the converged set).
            # Lazy checkpoint: the convergence count below is the one
            # materializing job for the round (no separate checkpoint job).
            keep = (
                _edge_support(live)
                .where(F.col("support") >= k - 2)
                .repartition(n_part, "u")
                .transform(truncate_counted)
            )
            n_next = keep.count()
            if n_next == prev_edges:
                # Fixpoint: nothing dropped, so this round's support IS
                # the within-truss support of every survivor.
                return keep.select("u", "v", "support")
            live, prev_edges = keep.select("u", "v"), n_next
            if n_next == 0:
                return keep.select("u", "v", "support")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    raise RuntimeError(
        f"k-truss peel did not converge within {max_iters} rounds "
        f"({prev_edges} edges still live) — raise max_iters"
    )
