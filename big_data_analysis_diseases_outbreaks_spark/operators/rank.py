"""Distributed global ranking — no single-partition window funnel.

A windowless total order: ``Window.orderBy(...)`` with no PARTITION BY is
the one construct in the relational surface that cannot scale — Spark
plans it as ``Exchange SinglePartition`` + one Window task over the whole
input (it even warns: "No Partition Defined for Window operation! Moving
all data to a single partition"). The reference never needs a global
rank, but our NTILE/percentile extensions do, so this operator provides
the scale-correct equivalent:

1. ``repartitionByRange(P, *order)`` — one wide shuffle; partition *i*'s
   keys all sort before partition *i+1*'s (range boundaries from Spark's
   reservoir sample of the sort key).
2. ``sortWithinPartitions(*order)`` — narrow, in-partition sort.
3. ``monotonically_increasing_id()`` — pid in the upper bits, the
   *in-iteration-order* record index in the lower 33 bits; after step 2
   the iteration order IS the sort order, so ``mid & (2^33-1)`` is the
   0-based local rank. No second shuffle (the textbook alternative — a
   window over ``spark_partition_id()`` — re-shuffles the full table by
   pid hash just to compute the same local index).
4. Per-partition row counts (P rows — tiny) → cumulative offsets via a
   triangular self-join over those P rows (not a windowed running sum:
   a global window would put an ``Exchange SinglePartition`` back into
   the plan — harmless on P rows, but it defeats the "no single-
   partition exchange anywhere" plan audit) → broadcast-joined back.

``global rank = offset[pid] + local_rank + 1``. Total cost: one range
shuffle of the input + a P-row side computation, fully parallel at any
scale. Requires the ordering to be *total* (pass a unique tiebreaker as
the last order column) — with ties split across range-partition
boundaries the local index would break ties arbitrarily, which is the
same behavior ``row_number`` has, but NOT what ``rank``/``cume_dist``
tie semantics need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LOCAL_BITS = 33  # monotonically_increasing_id: record index bit width
_PID = "__gr_pid"
_LOCAL = "__gr_local"
_OFFSET = "__gr_offset"
_TOTAL = "__gr_total"


def _ranked_with_total(
    df: DataFrame,
    order_cols: list[Column | str],
    rank_col: str,
    num_partitions: int | None,
) -> DataFrame:
    """Rank + a ``_TOTAL`` (grand row count) column, both shuffle-lean."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    ranged = ranged.sortWithinPartitions(*cols)
    mid = F.monotonically_increasing_id()
    local = ranged.withColumn(_PID, F.shiftrightunsigned(mid, _LOCAL_BITS)).withColumn(
        _LOCAL, mid.bitwiseAND((1 << _LOCAL_BITS) - 1)
    )
    # persist: the rows branch and the P-row counts branch prune
    # different columns, so ReuseExchange does NOT cover them (the
    # repo's documented trap) — without this the caller's input lineage
    # executes twice, and worse, the two executions could in principle
    # range-sample differently and assign INCONSISTENT (pid, local)
    # pairs between branches. One materialization removes both risks.
    local = local.persist()
    # P rows (P = partition count, O(cluster size) not O(data)); the
    # prefix sum AND the grand total come out of one P x P cross join —
    # so no global window and no single-partition exchange (not even the
    # scalar-agg one) anywhere in the plan.
    #
    # Runtime tripwire: the construction assumes monotonically_increasing_id
    # is evaluated in post-sortWithinPartitions iteration order with one
    # contiguous id block per task (true on current Spark; an upgrade or
    # AQE change could silently break it and produce wrong ranks, not an
    # error). Contiguity is checkable for free on these P rows:
    # max(local index) must equal count-1 in every partition. In-partition
    # *order* divergence is not checkable this cheaply — that is what the
    # DuckDB parity tests pin down (tests/test_rank.py).
    counts = local.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("__gr_n"), F.max(_LOCAL).alias("__gr_maxl")
    ).where(
        F.assert_true(
            F.col("__gr_maxl") == F.col("__gr_n") - 1,
            "global rank: non-contiguous id block per partition — "
            "monotonically_increasing_id evaluation order assumption broken",
        ).isNull()
    ).drop("__gr_maxl")
    a, b = counts.alias("__gr_a"), counts.alias("__gr_b")
    offsets = (
        a.crossJoin(F.broadcast(b))
        .groupBy(F.col(f"__gr_a.{_PID}").alias(_PID))
        .agg(
            F.sum(
                F.when(
                    F.col(f"__gr_b.{_PID}") < F.col(f"__gr_a.{_PID}"),
                    F.col("__gr_b.__gr_n"),
                ).otherwise(F.lit(0))
            ).alias(_OFFSET),
            F.sum("__gr_b.__gr_n").alias(_TOTAL),
        )
    )
    out = local.join(F.broadcast(offsets), _PID)
    return out.withColumn(
        rank_col, (F.col(_OFFSET) + F.col(_LOCAL) + F.lit(1)).cast("long")
    ).drop(_PID, _LOCAL, _OFFSET)


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based dense total-order rank without a global window.

    ``order_cols`` must define a total order (unique per row — add a key
    tiebreaker). ``num_partitions`` defaults to the session shuffle
    parallelism.
    """
    return _ranked_with_total(df, order_cols, rank_col, num_partitions).drop(
        _TOTAL
    )


def with_global_rank_and_total(
    df: DataFrame,
    order_cols: list[Column | str],
    rank_col: str = "global_rank",
    total_col: str = "global_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """:func:`with_global_rank` that also keeps the grand row count.

    The total falls out of the same P-row offsets computation for free —
    callers that need ``rank / total`` (quantile bucketing, percentile
    positions) get both from ONE range shuffle instead of adding a
    separate scalar-aggregate + cross join (which would plan an
    ``Exchange SinglePartition`` for the count).
    """
    return _ranked_with_total(
        df, order_cols, rank_col, num_partitions
    ).withColumnRenamed(_TOTAL, total_col)


def with_global_running_sum(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """``SUM(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` at scale.

    Same decomposition as the rank: range-partition on the total order
    (wide shuffle #1), in-partition running sum via a window PARTITIONED
    by the physical partition id (wide shuffle #2 — but hash-partitioned
    P ways, never the single-partition funnel a bare global window
    plans), plus broadcast per-partition prefix offsets from the same
    P x P triangular cross join the rank uses. The post-shuffle frame is
    persisted — the offsets branch prunes different columns than the
    rows branch, so ReuseExchange would NOT cover them and the input
    lineage would otherwise execute twice.

    ``order_cols`` must be a total order; ``value_col`` should be an
    integral column (long) — the point of a distributed running sum is
    usually an exact prefix aggregate (token budgets, bytes, counts),
    and integer addition keeps it associative and oracle-exact.

    ``total_col`` (optional) additionally keeps the grand total of
    ``value_col`` on every row — it falls out of the same P-row
    triangular offsets computation for free, sparing callers that need
    ``prefix / total`` (systematic sampling strata, budget fractions)
    a separate scalar aggregate + cross join.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    ranged = ranged.withColumn(_PID, F.spark_partition_id()).persist()
    # persist: the running-window branch and the per-partition totals
    # branch prune different columns — ReuseExchange does not cover
    # them, so without materialization the input lineage runs twice.
    w = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__gr_lcum", F.sum(value_col).over(w))
    sums = ranged.groupBy(_PID).agg(F.sum(value_col).alias("__gr_n"))
    a, b = sums.alias("__gr_a"), sums.alias("__gr_b")
    aggs = [
        F.sum(
            F.when(
                F.col(f"__gr_b.{_PID}") < F.col(f"__gr_a.{_PID}"),
                F.col("__gr_b.__gr_n"),
            ).otherwise(F.lit(0))
        ).alias(_OFFSET)
    ]
    if total_col:
        aggs.append(F.sum("__gr_b.__gr_n").cast("long").alias(total_col))
    offsets = (
        a.crossJoin(F.broadcast(b))
        .groupBy(F.col(f"__gr_a.{_PID}").alias(_PID))
        .agg(*aggs)
    )
    out = local.join(F.broadcast(offsets), _PID)
    return out.withColumn(
        out_col, (F.col(_OFFSET) + F.col("__gr_lcum")).cast("long")
    ).drop(_PID, "__gr_lcum", _OFFSET)


def with_global_exclusive_running_max(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    out_col: str = "running_max_excl",
    num_partitions: int | None = None,
) -> DataFrame:
    """``MAX(value) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING)`` at scale — the *exclusive* prefix maximum (NULL
    on the globally first row), the primitive behind sort-based skyline
    / Pareto-frontier filters ("is any strictly-earlier row already at
    least this large?").

    Same two-shuffle decomposition as :func:`with_global_running_sum`:
    range partition on the total order, in-partition exclusive cummax
    windowed BY PARTITION ID (never the single-partition funnel), and
    per-partition maxima combined through the P x P triangular cross
    join — ``MAX`` over the strictly-preceding partitions (NULL for the
    first partition, which ``F.greatest``'s null-skipping merge
    handles). ``order_cols`` must be a total order: an exclusive ROWS
    frame under ties would be sort-order-dependent, so callers pass a
    unique key (or pre-aggregate to distinct order values) first.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    ranged = ranged.withColumn(_PID, F.spark_partition_id()).persist()
    # persist: same two-consumer pruning rationale as the running sum.
    w = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("__gr_lmax", F.max(value_col).over(w))
    maxes = ranged.groupBy(_PID).agg(F.max(value_col).alias("__gr_n"))
    a, b = maxes.alias("__gr_a"), maxes.alias("__gr_b")
    offsets = (
        a.crossJoin(F.broadcast(b))
        .groupBy(F.col(f"__gr_a.{_PID}").alias(_PID))
        .agg(
            F.max(
                F.when(
                    F.col(f"__gr_b.{_PID}") < F.col(f"__gr_a.{_PID}"),
                    F.col("__gr_b.__gr_n"),
                )
            ).alias(_OFFSET)
        )
    )
    out = local.join(F.broadcast(offsets), _PID)
    return out.withColumn(
        out_col, F.greatest(F.col(_OFFSET), F.col("__gr_lmax"))
    ).drop(_PID, "__gr_lmax", _OFFSET)


def with_global_ntile(
    df: DataFrame,
    order_cols: list[Column | str],
    n: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL ``NTILE(n) OVER (ORDER BY ...)`` at scale.

    NTILE assigns the first ``N mod n`` buckets ``ceil(N/n)`` rows and
    the remaining buckets ``floor(N/n)``. That is NOT the even-spread
    ``floor((r-1)*n/N)+1`` (which interleaves the big buckets across
    the range — the two differ whenever ``N % n != 0``, e.g. N=7, n=5:
    NTILE gives [1,1,2,2,3,4,5], the even-spread [1,1,2,3,3,4,5]); the
    exact piecewise form for 1-based rank r with q = N div n,
    rem = N mod n, cut = rem*(q+1) is::

        tile(r) = (r-1) div (q+1) + 1                 if r <= cut
                  rem + (r-1-cut) div q + 1           otherwise

    All integer arithmetic (`div` — a double `/` would round at 2^53 on
    petabyte-scale row counts). The total count N rides along from the
    rank computation's per-partition counts (no separate scalar-agg
    pass, whose final merge would plan an Exchange SinglePartition).
    """
    ranked = _ranked_with_total(df, order_cols, "__gr_rank", num_partitions)
    n = int(n)
    # greatest(q, 1): when N < n, q = 0 but every rank falls in the
    # r <= cut branch (cut = N); the guard only keeps the dead branch
    # from dividing by zero.
    tile = F.expr(
        f"CASE WHEN __gr_rank <= ({_TOTAL} % {n}) * (({_TOTAL} div {n}) + 1)"
        f" THEN (__gr_rank - 1) div (({_TOTAL} div {n}) + 1) + 1"
        f" ELSE ({_TOTAL} % {n})"
        f"      + (__gr_rank - 1 - ({_TOTAL} % {n}) * (({_TOTAL} div {n}) + 1))"
        f"        div greatest({_TOTAL} div {n}, 1)"
        f"      + 1 END"
    )
    return ranked.withColumn(tile_col, tile.cast("int")).drop("__gr_rank", _TOTAL)
