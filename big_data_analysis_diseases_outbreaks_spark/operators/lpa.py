"""Synchronous label propagation (community detection) — deterministic.

Classic LPA (Raghavan et al. 2007): every node starts in its own
community (label = node id) and each round adopts the label most common
among its neighbors. Async LPA with random tie-breaks is
non-reproducible; this is the SYNCHRONOUS variant with a total-order
tie-break — (vote count DESC, label ASC) — and a FIXED round count, so
the result is a pure function of the graph and both a DuckDB
chained-CTE oracle and a pure-Python reference can replay it exactly.

Scale shape mirrors ``operators/components.py``: the symmetric edge
frame is materialized once, pre-hashed on the vote join key, with a
pinned edge-derived partition width; each round is one join (edges ⋈
labels, co-partitioned on the pinned key) + two hash aggregates — the
per-node argmax is an ``F.max(struct(cnt, -label))`` AGGREGATE, not a
window, so no per-node sort machinery — with per-round lineage
truncation (executor-local by default, reliable ``checkpoint()`` via
``checkpoint_dir`` on clusters). Per-round traffic is one
labels-vector shuffle; the edge side never re-shuffles.

Runtime floor: the per-round argmax uses ``mode(label, true)`` with the
deterministic-tie argument, which exists only in Spark >= 4.0 — on a
3.x runtime the expression fails analysis (AnalysisException) rather
than silently changing tie semantics; re-introduce the two-level
count -> max(struct(cnt, -label)) aggregate if 3.x portability is ever
needed (git history, r14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EDGES_PER_PARTITION = 2_000_000


def label_propagation(
    edges: DataFrame,
    n_rounds: int,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(src, dst) symmetric edges → (node, community) after exactly
    ``n_rounds`` synchronous votes. ``edges`` must already contain both
    directions of every undirected edge (the co-purchase self-join
    emits both by construction); vote weight is 1 per distinct
    neighbor."""
    from .checkpointing import counted_truncator, truncator

    truncate = truncator(edges, checkpoint_dir)
    # Lazy checkpoint + count: one materializing job, not two.
    e = counted_truncator(edges, checkpoint_dir)(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct()
    )
    n_edges = e.count()
    spark = e.sparkSession
    n_part = min(
        spark.sparkContext.defaultParallelism,
        n_edges // _EDGES_PER_PARTITION + 1,
    )
    # Pin the shuffle width for the loop (save/restore — the pagerank/
    # components pattern): checkpointed rounds execute WITHOUT AQE's
    # small-partition coalescing, so at the session default every
    # per-round vote/argmax aggregate would be hundreds of near-empty
    # tasks; the explicit repartition() calls pin only the join inputs,
    # not the two aggregate exchanges inside the loop.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    try:
        e = e.repartition(n_part, "b").transform(truncate)
        labels = (
            e.select(F.col("a").alias("node"))
            .repartition(n_part, "node")
            .distinct()
            .withColumn("label", F.col("node"))
            .transform(truncate)
        )
        for i in range(n_rounds):
            votes = e.join(labels, e["b"] == labels["node"]).select(
                F.col("a").alias("node"), "label"
            )
            # argmax by (cnt DESC, label ASC) as ONE aggregate:
            # mode(label, deterministic=true) returns the LOWEST value
            # among the most frequent — exactly the LPA tie rule — with
            # map-side partial aggregation (per-node count maps), so the
            # former two-level count→argmax pair of exchanges collapses
            # to a single exchange on the node key per round. The agg
            # runs under the pinned shuffle width, so its output is
            # already hash(node, n_part) — co-partitioned with the edge
            # fact for the next round's join, no explicit repartition.
            labels = votes.groupBy("node").agg(
                F.expr("mode(label, true)").alias("label")
            )
            # Lineage truncation every SECOND round (and on the last):
            # one un-truncated intermediate adds a single bounded plan
            # level, while each skipped localCheckpoint saves a full
            # materialization action — at graph sizes where the loop is
            # scheduling-bound this halves the per-round fixed cost.
            # Results are bit-identical (pure dataflow either way).
            if i % 2 == 1 or i == n_rounds - 1:
                labels = labels.transform(truncate)
        return labels.select("node", F.col("label").alias("community"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
