"""Distributed global rank / NTILE (operators/rank.py).

Semantics: must be bit-identical to the SQL window forms
(`row_number()/ntile(n) OVER (ORDER BY ...)`) on a total order.
Scale: the plan must NOT contain the single-partition exchange that a
bare global window would introduce.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.rank import (
    with_global_ntile,
    with_global_rank,
)
from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL


def _orders_spend(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    return orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("spend")
    )


def test_global_rank_matches_window_row_number(spark):
    spend = _orders_spend(spark)
    got = {
        (r["o_custkey"], r["global_rank"])
        for r in with_global_rank(
            spend, ["spend", "o_custkey"], num_partitions=7
        ).collect()
    }
    w = Window.orderBy("spend", "o_custkey")
    want = {
        (r["o_custkey"], r["rn"])
        for r in spend.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_ntile_matches_window_ntile(spark):
    spend = _orders_spend(spark)
    for n in (3, 10):
        got = {
            (r["o_custkey"], r["tile"])
            for r in with_global_ntile(
                spend, ["spend", "o_custkey"], n, num_partitions=5
            ).collect()
        }
        w = Window.orderBy("spend", "o_custkey")
        want = {
            (r["o_custkey"], r["t"])
            for r in spend.withColumn("t", F.ntile(n).over(w)).collect()
        }
        assert got == want, f"ntile({n}) mismatch"


def test_ntile_uneven_bucket_sizes(spark):
    # 10 rows, 3 buckets -> sizes 4,3,3 (first N mod n buckets get the
    # extra row) — the part of NTILE the floor formula must reproduce.
    df = spark.range(10).withColumnRenamed("id", "k")
    out = with_global_ntile(df, ["k"], 3, num_partitions=4)
    sizes = {
        r["tile"]: r["n"]
        for r in out.groupBy("tile").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {1: 4, 2: 3, 3: 3}


def test_deciles_query_has_no_single_partition_exchange(spark):
    df = all_queries()["customer_spend_deciles"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, (
        "global NTILE must not funnel the table into one partition"
    )
    assert "rangepartitioning" in plan.lower()


def test_global_running_sum_matches_window(spark):
    from big_data_analysis_diseases_outbreaks_spark.operators.rank import (
        with_global_running_sum,
    )

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 37 + 1).alias("v")
    )
    got = {
        (r["k"], r["running_sum"])
        for r in with_global_running_sum(
            df, ["k"], "v", num_partitions=7
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["k"], r["rs"]) for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_sequence_pack_has_no_single_partition_exchange(spark):
    df = all_queries()["doc_sequence_pack"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()


def test_global_rank_degenerate_inputs(spark):
    """Edge shapes a petabyte run will hit in some partition: empty
    input, a single row, and fewer rows than shuffle partitions (most
    range partitions empty)."""
    empty = spark.createDataFrame([], "k LONG, v LONG")
    assert with_global_rank(empty, ["k"]).count() == 0
    assert with_global_ntile(empty, ["k"], 4).count() == 0

    one = spark.createDataFrame([(7, 1)], "k LONG, v LONG")
    row = with_global_rank(one, ["k"]).collect()[0]
    assert row.global_rank == 1
    trow = with_global_ntile(one, ["k"], 4).collect()[0]
    assert trow.tile == 1

    # 5 rows through 32 shuffle partitions: most partitions hold nothing
    few = spark.createDataFrame([(i, i) for i in (3, 1, 4, 1, 5)][:5],
                                "k LONG, v LONG").withColumn(
        "uid", F.monotonically_increasing_id()
    )
    got = sorted(
        (r.k, r.global_rank)
        for r in with_global_rank(few, ["k", "uid"]).collect()
    )
    assert [g for _, g in got] == [1, 2, 3, 4, 5]
    assert [k for k, _ in got] == [1, 1, 3, 4, 5]


def test_global_running_sum_degenerate_inputs(spark):
    """Running-sum twin of the rank degenerate checks: empty input, one
    row, and fewer rows than partitions must all survive the
    range-partition + offset-join construction."""
    from big_data_analysis_diseases_outbreaks_spark.operators.rank import (
        with_global_running_sum,
    )

    empty = spark.createDataFrame([], "k LONG, v LONG")
    assert with_global_running_sum(empty, ["k"], "v").count() == 0

    one = spark.createDataFrame([(1, 5)], "k LONG, v LONG")
    assert with_global_running_sum(one, ["k"], "v").collect()[0].running_sum == 5

    few = spark.createDataFrame(
        [(3, 30), (1, 10), (2, 20)], "k LONG, v LONG"
    )
    got = sorted(
        (r.k, r.running_sum)
        for r in with_global_running_sum(few, ["k"], "v").collect()
    )
    assert got == [(1, 10), (2, 30), (3, 60)]
