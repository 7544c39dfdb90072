"""k-core decomposition by iterative peeling — the fourth graph
operator beside connected components, PageRank, and triangle counting.

The k-core is the maximal subgraph in which every node has degree ≥ k —
the standard "dense cohesive region" extractor (community seeds,
spam/bot rings in interaction graphs, head-entity subgraphs in
co-occurrence graphs). The classic sequential algorithm peels minimum-
degree nodes one at a time; the distributed formulation peels ALL
sub-k nodes per round (Montresor et al.'s locality-based batch peel):

    repeat: degrees → drop nodes with deg < k → drop their edges
    until no node is dropped.

Each round is one degree aggregate (shuffle on node) plus two
semi-joins of the live edge set against the surviving-node set — every
step keyed, nothing driver-sided, so a 100 TB edge set peels at
cluster width. Rounds converge in O(peel depth) which is small on
power-law graphs (most nodes fall in the first rounds). Same loop
hygiene as components/pagerank: per-round EAGER lineage truncation
(the loop references its own output; without truncation plan analysis
goes superlinear), pinned shuffle width sized from the edge count, and
an optional reliable-checkpoint mode for cluster runs
(operators/checkpointing.py).

Not SQL-oracle-able: the fixpoint iteration count is data-dependent,
so there is no bounded CTE unrolling that is correct at every scale
(contrast pagerank's fixed 8 rounds). Exactness is pinned instead by
tests/test_kcore.py against a pure-Python reference peel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import undirected_edges

# Same sizing rationale as components.py: loop shuffles are sized by
# the edge set, not the session default, so small graphs don't pay
# full-width task latency per round and huge graphs keep cluster width.
_EDGES_PER_PARTITION = 2_000_000


def kcore_nodes(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, core_deg) for every node of the k-core; ``core_deg`` is
    the node's degree WITHIN the core (≥ k by definition). Nodes
    outside the core are absent. Deterministic: the batch peel drops
    the same node set regardless of partitioning or visit order."""
    from .checkpointing import counted_truncator, truncator

    truncate = truncator(edges, checkpoint_dir)
    truncate_counted = counted_truncator(edges, checkpoint_dir)
    # Lazy checkpoint + count: one materializing job, not two.
    live = truncate_counted(undirected_edges(edges, src, dst))
    n_edges = live.count()  # materializes the lazy checkpoint blocks
    spark = live.sparkSession
    n_part = min(
        spark.sparkContext.defaultParallelism,
        n_edges // _EDGES_PER_PARTITION + 1,
    )
    live = live.repartition(n_part, "u").transform(truncate)
    prev_edges = n_edges
    # Pin the loop's shuffle width to the data: per-round plans execute
    # under localCheckpoint WITHOUT AQE small-partition coalescing, so
    # the degree aggregate and both semi-joins would otherwise run at
    # the session default (e.g. 200 near-empty tasks per shuffle per
    # round on a vanilla session — pure scheduling latency). Same
    # save/restore idiom as pagerank.py.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    try:
        live, prev_edges = _peel_loop(
            live, k, n_part, prev_edges, max_iters, truncate_counted
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return (
        live.select(F.col("u").alias("node"))
        .unionAll(live.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
    )


def _peel_loop(live, k, n_part, prev_edges, max_iters, truncate):
    """Peel to fixpoint; raises on an exhausted round budget (a
    truncated peel is WRONG, not approximate — survivors may have
    degree < k). ``truncate`` is a counted_truncator: each round's
    checkpoint is lazy and the convergence count right after it is the
    ONE materializing job for the round."""
    for _ in range(max_iters):
        deg = (
            live.select(F.col("u").alias("node"))
            .unionAll(live.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node")
        # The survivor set feeds both semi-joins WITHOUT its own
        # materialization: the degree aggregate is evaluated twice
        # inside the one round job, but its input is the checkpointed
        # (edge-sized, shrinking) live set — cheaper than scheduling an
        # extra materialization job per round, which measured ~40% of
        # the loop's wall-clock at bench scale (fixed overhead, not
        # data: the loop is O(small jobs × rounds) until edges are
        # cluster-sized).
        nxt = (
            live.join(
                keep.withColumnRenamed("node", "u"), "u", "left_semi"
            )
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .repartition(n_part, "u")
            .transform(truncate)
        )
        n_next = nxt.count()
        live = nxt
        if n_next == prev_edges:
            return live, prev_edges
        prev_edges = n_next
    # Exhausting the round budget mid-peel would silently return nodes
    # with core_deg < k — fail loud instead (the caller can raise
    # max_iters; the batch peel needs O(peel depth) rounds, which can
    # reach O(n) on pathological path graphs).
    raise RuntimeError(
        f"k-core peel did not converge within {max_iters} rounds "
        f"({prev_edges} edges still live) — raise max_iters"
    )
