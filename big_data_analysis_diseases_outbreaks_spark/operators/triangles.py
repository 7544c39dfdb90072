"""Triangle counting via degree-ordered edge orientation.

Third graph operator beside connected components and PageRank. The
naive triangle join (edges ⋈ edges ⋈ edges) explodes on high-degree
hubs: a node of degree d contributes d² wedges. The standard
distributed fix (Cohen's MapReduce triangle algorithm; Suri &
Vassilvitskii's MPS) orients every undirected edge from its
lower-(degree, id) endpoint to the higher one — a total order, so each
triangle survives as EXACTLY ONE oriented path a→b, b→c with a→c
closing it, and every node's oriented out-degree is bounded by
O(√m) on any graph (arboricity bound). The wedge join is then
Σ outdeg² ≤ m·√m instead of Σ deg² — the difference between "dies on
the first celebrity node" and "runs at 100 TB".

Plan shape: degree agg (one shuffle on node) → orientation join →
wedge self-join shuffled on the pivot node → closing semi-join shuffled
on (a, c). All exact integers, no floats — per-node triangle counts are
value-oracle-able cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Canonicalize to the undirected-distinct edge set (u < v)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def oriented_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonicalize to undirected-distinct, then orient each edge
    lower-(degree, id) → higher-(degree, id). Returns (a, b)."""
    und = undirected_edges(edges, src, dst)
    return _orient(und)


def _orient(und: DataFrame) -> DataFrame:
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # u < v by construction, so the (deg, id) tie-break resolves to u.
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Per-node triangle participation counts: (node, n_triangles).
    Nodes in no triangle are absent (count 0). ``checkpoint_dir``:
    reliable-checkpoint mode, same contract as pagerank/components
    (operators/checkpointing.py)."""
    from .checkpointing import counted_truncator, truncator

    truncate = truncator(edges, checkpoint_dir)
    truncate_counted = counted_truncator(edges, checkpoint_dir)
    spark = edges.sparkSession
    width = spark.sparkContext.defaultParallelism
    # Pin the shuffle width to the graph for the whole computation
    # (saved/restored — the pagerank/components pattern): the
    # checkpointed stages execute WITHOUT AQE's small-partition
    # coalescing, so at the 200-partition session default every keyed
    # exchange here is hundreds of near-empty tasks of pure scheduling
    # overhead. Start at cluster width (edge count unknown yet), then
    # re-pin with the size-derived width once the edge set is counted —
    # at real scale n_part grows with the edge count.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(8, width)))
    try:
        # Materialize the canonical edge set once: it feeds the degree
        # agg, the orientation join, and (via orientation) three
        # wedge-join sides, so the caller's (possibly expensive) edge
        # lineage must run a single time — and its count sizes the
        # width for the heavy wedge stage (Σ outdeg² work).
        # Lazy checkpoint + count: one materializing job, not two.
        und = truncate_counted(undirected_edges(edges, src, dst))
        n_edges = und.count()  # materializes the lazy checkpoint blocks
        n_part = max(max(8, width), n_edges // 1_000_000 + 1)
        spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
        o = truncate(_orient(und))
        o1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
        o2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
        o3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
        tri = o1.join(o2, "y").join(o3, ["x", "z"])
        # Materialize the (small) per-node counts under the pinned
        # width — returned lazy, the wedge join would execute after the
        # conf restore at full session width.
        return truncate(
            tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def edge_triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
    undirected: DataFrame | None = None,
) -> DataFrame:
    """Per-EDGE triangle counts: (u, v, n_triangles) over the canonical
    undirected edge set (u < v) — the number of common neighbors of u
    and v, i.e. the numerator of the edge Jaccard/link-prediction
    coefficients. Same O(√m)-bounded oriented wedge join as
    :func:`triangle_counts`; each triangle attributes to its three
    canonical edges. Edges in no triangle are absent (count 0).

    ``undirected``: an ALREADY-MATERIALIZED canonical (u, v) edge frame
    (e.g. the caller truncated :func:`undirected_edges` once to also
    feed a degree aggregate) — passing it avoids re-executing the
    possibly-expensive raw edge lineage here."""
    from .checkpointing import counted_truncator, truncator

    truncate = truncator(edges, checkpoint_dir)
    spark = edges.sparkSession
    width = spark.sparkContext.defaultParallelism
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(8, width)))
    try:
        # Lazy checkpoint + count: one materializing job, not two.
        und = (
            undirected
            if undirected is not None
            else counted_truncator(edges, checkpoint_dir)(
                undirected_edges(edges, src, dst)
            )
        )
        n_edges = und.count()
        n_part = max(max(8, width), n_edges // 1_000_000 + 1)
        spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
        o = truncate(_orient(und))
        o1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
        o2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
        o3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
        tri = o1.join(o2, "y").join(o3, ["x", "z"])
        sides = F.array(
            F.struct(
                F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
            ),
            F.struct(
                F.least("y", "z").alias("u"), F.greatest("y", "z").alias("v")
            ),
            F.struct(
                F.least("x", "z").alias("u"), F.greatest("x", "z").alias("v")
            ),
        )
        return truncate(
            tri.select(F.explode(sides).alias("e"))
            .select("e.u", "e.v")
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
