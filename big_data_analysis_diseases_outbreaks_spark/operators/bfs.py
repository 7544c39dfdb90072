"""Bounded-depth BFS (k-hop reachability with hop distance) over an
edge table — the graph-exploration primitive behind "everything within
N hops of these seeds": blast-radius queries on a co-purchase graph,
contamination spread from flagged documents, neighborhood expansion for
graph-sampled training data.

Spark-first design: level-synchronous frontier expansion as DataFrame
joins — each round is one hash join (frontier → out-neighbors) + one
anti-join (drop already-visited), both shuffle-partitioned on the node
key. The visited set and the frontier are node-sized (never edge-sized)
frames; the edge table is truncated once and re-joined per round, so a
100 TB edge set spreads across executors with no driver-side graph.
``max_hops`` bounds the loop: rounds = min(max_hops, eccentricity), and
an emptied frontier short-circuits.

Per-round lineage truncation mirrors the other iterative operators
(components/pagerank/kcore): the loop output feeds the next round
twice (join + union), so without truncation the plan nests per
iteration; ``checkpoint_dir`` switches to reliable ``checkpoint()``
for executor-loss-safe cluster runs (operators/checkpointing.py).

Reference scope note: the reference engine has no graph operators;
this extends the co-purchase analysis family (PageRank / triangles /
k-core) with reachability, oracled against a depth-bounded recursive
CTE in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Same loop-width policy as components.py: one shuffle partition per
# this many edges, capped at session parallelism — keeps the bounded
# loop task-latency-light locally while widening with real edge counts.
_EDGES_PER_PARTITION = 2_000_000


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Directed ``(src, dst)`` edges + seed ``(node)`` frame →
    ``(node, dist)`` for every node reachable within ``max_hops`` hops;
    ``dist`` is the minimum hop count from any seed (seeds → 0).

    Level-synchronous: because expansion proceeds a full frontier per
    round, the first round that reaches a node IS its minimum distance —
    no per-node min-aggregate over rounds is needed, only the
    visited-set anti-join."""
    from .checkpointing import counted_truncator, truncator

    truncate = truncator(edges, checkpoint_dir)
    # Lazy checkpoint + count: one materializing job, not two.
    edges = counted_truncator(edges, checkpoint_dir)(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    spark = edges.sparkSession
    n_part = min(
        spark.sparkContext.defaultParallelism,
        edges.count() // _EDGES_PER_PARTITION + 1,
    )
    # Pre-hash the edge fact on the loop's join key once; every round's
    # frontier join then reuses this partitioning.
    edges = truncate(edges.repartition(n_part, "a"))
    frontier = truncate(
        seeds.select(F.col(node).alias("n"))
        .distinct()
        .repartition(n_part, "n")
    )
    visited = frontier.withColumn("dist", F.lit(0).cast("long"))
    for hop in range(1, max_hops + 1):
        nxt = (
            edges.join(frontier, edges["a"] == frontier["n"])
            .select(F.col("b").alias("n"))
            .distinct()
            .join(visited.select("n"), on="n", how="left_anti")
            .repartition(n_part, "n")
            .transform(truncate)
        )
        if nxt.isEmpty():
            break
        visited = truncate(
            visited.unionByName(
                nxt.withColumn("dist", F.lit(hop).cast("long"))
            )
        )
        frontier = nxt
    return visited.select(F.col("n").alias(node), "dist")
