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


def oriented_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonicalize to undirected-distinct, then orient each edge
    lower-(degree, id) → higher-(degree, id). Returns (a, b)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
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
    from .checkpointing import truncator

    o = oriented_edges(edges, src, dst)
    # The oriented edge set feeds three join sides; materialize once so
    # the caller's (possibly expensive) edge lineage runs a single time.
    o = truncator(o, checkpoint_dir)(o)
    o1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    o2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    o3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = o1.join(o2, "y").join(o3, ["x", "z"])
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
