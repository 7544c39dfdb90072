"""Iterative PageRank as DataFrame joins — exact-integer arithmetic.

The second iterative graph operator beside connected components
(``operators/components.py``). Power iteration is a per-round
edge-join + destination aggregation; the 100 TB shape is the standard
Pregel-style layout: the edge table (src, dst, outdeg) is the large
fact, hash-partitioned on ``src`` once and reused every round, and each
round shuffles only the (node, rank) vector — never the edges again
(`persist()` pins them). Lineage is truncated at the end with one
``localCheckpoint`` so downstream consumers don't replay all rounds.

Determinism: ranks are scaled BIGINTs (``SCALE`` = 1e12) and every
update uses integer floor division — ``rank // outdeg`` per edge and
``(DAMP_NUM · contrib) // DAMP_DEN`` per node — so the result is
bit-identical in any engine and independent of partial-sum order
(integer addition is associative; double addition is not, which is why
a float PageRank can NOT be value-oracled across engines). Same
exact-integer protocol as ``functions/stable.py`` and the CUSUM oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # rank fixed-point: 1.0 == 10^12
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as a rational
BASE = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN  # (1-d) · SCALE


def pagerank(edges: DataFrame, n_iter: int = 8) -> DataFrame:
    """``edges``: (src, dst) — directed; symmetrize upstream for an
    undirected graph. Every node must have outdeg ≥ 1 (true for any
    symmetrized graph). Returns (node, pagerank_scaled BIGINT): the
    un-normalized per-node rank after ``n_iter`` rounds, fixed-point
    scaled by ``SCALE``."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg): the reused per-round fact — partitioned on
    # src so each round's rank join co-locates without re-shuffling it.
    # Partition count is sized from the edge count, NOT the session's
    # spark.sql.shuffle.partitions: the edge table is scanned once per
    # round, so a default-200 partitioning of a small graph turns every
    # round into pure task-scheduling overhead (measured 12 s/round →
    # 0.8 s at 231k edges), while at scale ~1M edges/partition keeps
    # partitions ~tens of MB. AQE can't help here — it coalesces
    # shuffle reads, not a persisted partitioning.
    n_edges = edges.count()
    n_parts = max(8, n_edges // 1_000_000 + 1)
    spark = edges.sparkSession
    # Pin the shuffle width to the graph size for the whole loop (saved
    # and restored, the run_to_memory pattern): every round's keyed
    # aggregate and rank join shuffles on node-cardinality data, and the
    # per-round checkpoint path executes WITHOUT AQE's small-partition
    # coalescing — under the session default of 200 that made each
    # round ~600 near-empty tasks of pure scheduling overhead (measured
    # 12 s/round at 231k edges; ~1 s once sized). At real scale the
    # caller raises this with key cardinality, exactly like streaming
    # state sizing.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        e = edges.join(deg, "src").repartition(n_parts, "src").persist()
        nodes = deg.select(F.col("src").alias("node")).persist()
        ranks = nodes.select(
            "node", F.lit(SCALE).cast("long").alias("rank")
        )
        for _ in range(n_iter):
            contrib = (
                e.join(ranks, e.src == ranks.node)
                .select("dst", F.expr("rank div outdeg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            ranks = (
                nodes.join(contrib, nodes.node == contrib.dst, "left")
                .select(
                    "node",
                    (
                        F.lit(BASE)
                        + F.expr(
                            f"({DAMP_NUM} * coalesce(contrib, 0L))"
                            f" div {DAMP_DEN}"
                        )
                    ).cast("long").alias("rank"),
                )
                # Truncate lineage EVERY round: without this each
                # round's plan nests all previous rounds and
                # analysis/optimization time grows superlinearly with
                # n_iter. The checkpoint is the node-sized rank vector,
                # never the edges.
                .localCheckpoint(eager=True)
            )
        out = ranks.select("node", F.col("rank").alias("pagerank_scaled"))
        e.unpersist()
        nodes.unpersist()
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
