"""Connected components over a pair/edge table — the canonical step
AFTER near-duplicate pair generation in a training-data dedup pipeline:
pairs (from MinHash-LSH / SimHash / exact Jaccard) are grouped into
clusters and each cluster keeps one canonical document.

Spark-first design: iterative min-label propagation expressed as
DataFrame joins — each iteration is one hash join (neighbor labels) +
one groupBy(min), both shuffle-partitioned on the node key, so a
100 TB edge set spreads across executors with no driver-side graph.
The label of every node converges to the minimum node id of its
component in O(graph diameter) iterations; near-dup graphs are
pair/small-clique shaped (diameter ≤ ~3), so the loop terminates in a
handful of rounds. (For adversarially long chains the large-star /
small-star variant [Kiveris et al., "Connected Components in MapReduce
and Beyond"] halves the diameter per round; not needed for dedup
workloads.)

Each iteration's labels are materialized with an EAGER localCheckpoint,
which truncates lineage. This is load-bearing, not an optimization: the
loop body references ``labels`` twice (neighbor join + union), so
without truncation the logical plan doubles per iteration and Catalyst
analysis goes exponential — a 12-hop chain hangs the driver before any
task runs. On a long-lived cluster job pass ``checkpoint_dir`` to
switch to reliable ``checkpoint()`` (localCheckpoint blocks die with an
executor — operators/checkpointing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Loop partition sizing: one shuffle partition per this many edges,
# capped at the session's parallelism. Near-dup edge sets are tiny
# relative to the corpus (O(dup pairs)), so without this every iteration
# of the label loop schedules a full-width shuffle over a few thousand
# rows and the loop cost is pure task latency; with billions of edges the
# quotient takes over and the loop runs at full cluster width.
_EDGES_PER_PARTITION = 2_000_000


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(src, dst) undirected edges → (node, component); ``component`` is
    the minimum node id reachable from ``node``.

    ``checkpoint_dir``: cluster mode — per-round lineage truncation via
    reliable ``checkpoint()`` instead of executor-local blocks (which
    die with an executor and kill the loop); results are bit-identical
    either way. See operators/checkpointing.py."""
    from .checkpointing import counted_truncator, truncator

    truncate = truncator(edges, checkpoint_dir)
    truncate_counted = counted_truncator(edges, checkpoint_dir)
    # Checkpoint the directed edges BEFORE symmetrizing: the union's two
    # branches each reference the (expensive) pair-generation lineage,
    # and exchange reuse is not guaranteed to cover plans whose top isn't
    # an exchange — materializing first makes single-evaluation explicit.
    # Lazy checkpoint + count: the count IS the materializing job (one
    # action, not checkpoint-then-count).
    edges = truncate_counted(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    n_edges = edges.count()  # materializes the lazy checkpoint blocks
    spark = edges.sparkSession
    n_part = min(
        spark.sparkContext.defaultParallelism,
        n_edges // _EDGES_PER_PARTITION + 1,
    )
    sym = (
        edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .repartition(n_part, "b")  # pre-hash on the loop's join key
        .transform(truncate)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .repartition(n_part, "node")
        .distinct()
        .withColumn("label", F.col("node"))
        .transform(truncate)
    )
    # TWO propagation steps per checkpoint+convergence-check: each
    # round's fixed cost is dominated by action/scheduling overhead
    # (the label set is tiny relative to the corpus), so halving the
    # number of checkpoints nearly halves wall-clock. Correctness is
    # unchanged: min-label is monotone non-increasing, so "no change
    # across the second step" certifies the fixed point regardless of
    # what the first step did; at worst one extra propagation runs.
    # The un-truncated intermediate adds one bounded plan level.
    for _ in range((max_iters + 1) // 2):
        mid = (
            labels.unionByName(
                sym.join(labels, sym["b"] == labels["node"]).select(
                    F.col("a").alias("node"), "label"
                )
            )
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        nbr = sym.join(mid, sym["b"] == mid["node"]).select(
            F.col("a").alias("node"), "label", F.lit(0).alias("own")
        )
        # The node's current label rides along (own=1), so one aggregate
        # yields both the new label (min over self + neighbors) and the
        # old one (the own row) — the convergence check needs no second
        # join against the previous iteration.
        # Lazy checkpoint: the convergence count right below is the
        # materializing action (its filter sits ABOVE the checkpoint
        # boundary, so all rows are stored), folding the former
        # checkpoint-job + count-job pair into ONE job per double-step.
        new_labels = (
            mid.withColumn("own", F.lit(1))
            .unionByName(nbr)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("own") == 1, F.col("label"))).alias("_old"),
            )
            .transform(truncate_counted)
        )
        n_changed = new_labels.where(F.col("label") != F.col("_old")).count()
        labels = new_labels.drop("_old")
        if n_changed == 0:
            break
    return labels.select("node", "label")


def dedup_cluster_canonical(
    cc: DataFrame, all_docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Join components back to the full doc table: docs untouched by any
    near-dup pair are their own singleton component; ``is_canonical``
    marks the kept representative (min id per cluster)."""
    joined = all_docs.select(F.col(id_col)).join(
        cc.withColumnRenamed("node", id_col), on=id_col, how="left"
    )
    comp = F.coalesce(F.col("label"), F.col(id_col))
    return joined.select(
        id_col,
        comp.alias("component"),
        (F.col(id_col) == comp).cast("int").alias("is_canonical"),
    )
