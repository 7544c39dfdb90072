"""Iterative PageRank as DataFrame joins — exact-integer arithmetic.

The second iterative graph operator beside connected components
(``operators/components.py``). Power iteration is a per-round
edge-join + destination aggregation; the 100 TB shape is the standard
Pregel-style layout: the edge table (src, dst, outdeg) is the large
fact, hash-partitioned on ``src`` once and reused every round, and each
round shuffles only the (node, rank) vector — never the edges again
(`persist()` pins them). The rank vector's lineage is truncated with a
``localCheckpoint`` every SECOND round (and on the last) — the rank
vector is referenced once per round, so one un-truncated intermediate
adds a single bounded plan level, while each skipped checkpoint saves
a full materialization action (the components/LPA discipline). Without
any truncation the plan nests all previous rounds and analysis time
grows superlinearly with ``n_iter`` (do not "optimize" it out of the
loop entirely).

Determinism: ranks are scaled BIGINTs (``scale`` fixed-point) and every
update uses integer floor division — ``rank // outdeg`` per edge and a
split-multiply damping step per node — so the result is bit-identical
in any engine and independent of partial-sum order (integer addition is
associative; double addition is not, which is why a float PageRank can
NOT be value-oracled across engines). Same exact-integer protocol as
``functions/stable.py`` and the CUSUM oracle.

Overflow bound: total rank mass is conserved at ~N·scale, so the
per-node contribution sum stays < 2^63 while N·scale < 9.2e18 — about
9M nodes at the default scale of 1e12. For larger graphs pass a
smaller ``scale`` (precision trades off at ~log10(scale) significant
digits). The damping multiply itself is split
(``d·(c div 100) + d·(c mod 100) div 100``, exactly floor(d·c/100) for
c ≥ 0) so it never amplifies the magnitude — important because Spark's
non-ANSI long arithmetic would WRAP silently on overflow rather than
error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # rank fixed-point: 1.0 == 10^12
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as a rational
BASE = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN  # (1-d) · SCALE


def pagerank(
    edges: DataFrame,
    n_iter: int = 8,
    scale: int = SCALE,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """``edges``: (src, dst) — directed; symmetrize upstream for an
    undirected graph. Every node must have outdeg ≥ 1 (true for any
    symmetrized graph). Returns (node, pagerank_scaled BIGINT): the
    un-normalized per-node rank after ``n_iter`` rounds, fixed-point
    scaled by ``scale`` (module docstring: keep N·scale < 2^63).

    ``checkpoint_dir``: cluster mode — truncate each round's lineage
    with a RELIABLE ``checkpoint()`` into this directory instead of
    ``localCheckpoint`` (whose executor-local blocks are unrecoverable
    on executor loss — a multi-round iterative job at scale must survive
    churn; see operators/checkpointing.py). Results are bit-identical
    either way (test-pinned); only fault-tolerance differs."""
    from .checkpointing import truncator
    # Materialize the edge list ONCE: deg, nodes, and the joined fact
    # below would otherwise each re-evaluate the caller's edge plan
    # (Spark has no common-subplan dedup across actions) — for a
    # self-join-derived graph that's the expensive part of the whole
    # operator, executed ~4 times instead of once.
    edges = edges.persist()
    truncate = truncator(edges, checkpoint_dir)
    n_edges = edges.count()
    n_parts = max(8, n_edges // 1_000_000 + 1)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
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
    base = (scale * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    # Split-multiply damping (see module docstring): exactly
    # floor(DAMP_NUM·c / DAMP_DEN) without the DAMP_NUM× intermediate.
    damped = (
        f"{DAMP_NUM} * (coalesce(contrib, 0L) div {DAMP_DEN})"
        f" + ({DAMP_NUM} * (coalesce(contrib, 0L) % {DAMP_DEN}))"
        f" div {DAMP_DEN}"
    )
    try:
        # (src, dst, outdeg): the reused per-round fact — partitioned
        # on src so each round's rank join co-locates without
        # re-shuffling it. Partition count comes from the edge count,
        # NOT the session shuffle default: AQE coalesces shuffle reads,
        # not a persisted partitioning.
        e = edges.join(deg, "src").repartition(n_parts, "src").persist()
        nodes = deg.select(F.col("src").alias("node")).persist()
        ranks = nodes.select(
            "node", F.lit(scale).cast("long").alias("rank")
        )
        for i in range(n_iter):
            contrib = (
                e.join(ranks, e.src == ranks.node)
                .select("dst", F.expr("rank div outdeg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            ranks = nodes.join(
                contrib, nodes.node == contrib.dst, "left"
            ).select(
                "node",
                (F.lit(base) + F.expr(damped)).cast("long").alias("rank"),
            )
            # Lineage truncation every SECOND round (and on the last) —
            # the components/LPA pattern: the rank vector is referenced
            # ONCE per round (contrib join), so one un-truncated
            # intermediate adds a single bounded plan level, while each
            # skipped checkpoint saves a full materialization action.
            # Results are bit-identical (pure dataflow either way).
            if i % 2 == 1 or i == n_iter - 1:
                ranks = truncate(ranks)
        out = ranks.select("node", F.col("rank").alias("pagerank_scaled"))
        e.unpersist()
        nodes.unpersist()
        edges.unpersist()
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 8,
    scale: int = SCALE,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Personalized PageRank: random walks restart at the SEED set
    instead of uniformly — the "related items to this basket"
    recommendation surface [Page et al. '99 §6; Pixie, WWW'18 is the
    modern industrial use].  Same exact-integer protocol, loop hygiene
    and Pregel-style layout as :func:`pagerank`; the only change is the
    restart term: ``(1-d)·scale`` lands on seed nodes only (and the
    initial mass starts there), so rank mass decays with walk distance
    from the seeds.

    ``seeds``: single-column (node) DataFrame, assumed SMALL (a basket,
    a category head) — it is broadcast into the per-node restart term.
    Rows not present in the graph are ignored.  Returns
    (node, ppr_scaled BIGINT), un-normalized.
    """
    from .checkpointing import truncator

    edges = edges.persist()
    truncate = truncator(edges, checkpoint_dir)
    n_edges = edges.count()
    n_parts = max(8, n_edges // 1_000_000 + 1)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    spark = edges.sparkSession
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    base = (scale * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    damped = (
        f"{DAMP_NUM} * (coalesce(contrib, 0L) div {DAMP_DEN})"
        f" + ({DAMP_NUM} * (coalesce(contrib, 0L) % {DAMP_DEN}))"
        f" div {DAMP_DEN}"
    )
    try:
        e = edges.join(deg, "src").repartition(n_parts, "src").persist()
        # per-node restart term, fixed for the whole loop: base for
        # seeds, 0 elsewhere — one broadcast left-join, persisted like
        # `nodes` in pagerank()
        seed_marks = seeds.select(
            F.col(seeds.columns[0]).alias("node"),
            F.lit(True).alias("_is_seed"),
        ).distinct()
        nodes = (
            deg.select(F.col("src").alias("node"))
            .join(F.broadcast(seed_marks), "node", "left")
            .select(
                "node",
                F.when(F.col("_is_seed"), F.lit(base))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("nbase"),
                F.when(F.col("_is_seed"), F.lit(scale))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("r0"),
            )
            .persist()
        )
        ranks = nodes.select("node", F.col("r0").alias("rank"))
        for i in range(n_iter):
            contrib = (
                e.join(ranks, e.src == ranks.node)
                .select("dst", F.expr("rank div outdeg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            ranks = nodes.join(
                contrib, nodes.node == contrib.dst, "left"
            ).select(
                "node",
                (F.col("nbase") + F.expr(damped)).cast("long").alias("rank"),
            )
            # every-second-round truncation — see pagerank() above
            if i % 2 == 1 or i == n_iter - 1:
                ranks = truncate(ranks)
        out = ranks.select("node", F.col("rank").alias("ppr_scaled"))
        e.unpersist()
        nodes.unpersist()
        edges.unpersist()
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def weighted_pagerank(
    edges: DataFrame,
    n_iter: int = 8,
    scale: int = 1_000_000_000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weight-proportional PageRank: ``edges`` is (src, dst, w BIGINT)
    and a walker at ``u`` follows edge (u, v) with probability
    w / Σ_out w — the natural consumer of the maintained weighted edge
    MV (queries: copurchase_edges_mv), where w counts co-purchase
    multiplicity instead of flattening it to 0/1.

    Same exact-integer protocol, per-round lineage truncation and
    Pregel-style persisted-fact layout as :func:`pagerank`; the per-edge
    contribution becomes ``(rank · w) div W(u)``. Overflow bound: the
    per-edge product needs max_rank · w_max < 2^63; total mass stays
    ~N·scale, so keep N·scale·w_max < 9.2e18 — the default scale of
    1e9 leaves 4 orders of magnitude of weight headroom at million-node
    graphs (raise/lower ``scale`` to trade precision).
    """
    from .checkpointing import truncator

    edges = edges.persist()
    truncate = truncator(edges, checkpoint_dir)
    n_edges = edges.count()
    n_parts = max(8, n_edges // 1_000_000 + 1)
    deg = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    spark = edges.sparkSession
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    base = (scale * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    damped = (
        f"{DAMP_NUM} * (coalesce(contrib, 0L) div {DAMP_DEN})"
        f" + ({DAMP_NUM} * (coalesce(contrib, 0L) % {DAMP_DEN}))"
        f" div {DAMP_DEN}"
    )
    try:
        e = edges.join(deg, "src").repartition(n_parts, "src").persist()
        nodes = deg.select(F.col("src").alias("node")).persist()
        ranks = nodes.select(
            "node", F.lit(scale).cast("long").alias("rank")
        )
        for i in range(n_iter):
            contrib = (
                e.join(ranks, e.src == ranks.node)
                .select("dst", F.expr("(rank * w) div outw").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            ranks = nodes.join(
                contrib, nodes.node == contrib.dst, "left"
            ).select(
                "node",
                (F.lit(base) + F.expr(damped)).cast("long").alias("rank"),
            )
            # every-second-round truncation — see pagerank() above
            if i % 2 == 1 or i == n_iter - 1:
                ranks = truncate(ranks)
        out = ranks.select("node", F.col("rank").alias("pagerank_scaled"))
        e.unpersist()
        nodes.unpersist()
        edges.unpersist()
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
