"""Invariants for the temporal/maintenance queries beyond what the
DuckDB oracle already pins down (test_oracle_parity): the interval-join
decomposition's exactly-once property against a naive band join, SCD2
interval integrity, and MERGE key semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

from .conftest import SF_SMALL

_Q = all_queries()


def test_interval_join_matches_naive_band_join(spark):
    """The bucket-decomposed join must equal the naive |Δt| ≤ w join
    exactly (no duplicates, no dropped boundary pairs)."""
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    out = _Q["event_pairs_interval_join"].fn(spark, SF_SMALL)
    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    a, b = ev.alias("a"), ev.alias("b")
    naive = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (F.abs(F.col("b.us") - F.col("a.us")) <= F.lit(600 * 1_000_000)),
    ).select(
        F.col("a.event_id").alias("event_id_1"),
        F.col("b.event_id").alias("event_id_2"),
    )
    got = {(r.event_id_1, r.event_id_2) for r in out.collect()}
    want = {(r.event_id_1, r.event_id_2) for r in naive.collect()}
    assert got == want
    assert len(got) == out.count()  # exactly-once: no dup pair rows


def test_scd2_epochs_partition_history(spark):
    """Per customer: epochs tile the order history — interval starts are
    strictly increasing, valid_to equals the next valid_from (NULL only
    on the last epoch), and n_orders sums to the customer's order count."""
    out = _Q["scd2_priority_epochs"].fn(spark, SF_SMALL).collect()
    by_cust: dict[int, list] = {}
    for r in out:
        by_cust.setdefault(r.o_custkey, []).append(r)
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    counts = {
        r.o_custkey: r.n
        for r in load_table(spark, SF_SMALL, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for cust, rows in by_cust.items():
        rows.sort(key=lambda r: r.epoch)
        for prev, nxt in zip(rows, rows[1:]):
            assert prev.valid_from <= prev.valid_to == nxt.valid_from
        assert rows[-1].valid_to is None
        assert sum(r.n_orders for r in rows) == counts[cust]


def test_merge_upsert_key_semantics(spark):
    """Merged snapshot: unique keys; updated keys carry the bumped price
    and 'U' status; inserted keys are net-new; untouched rows unchanged."""
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    merged = _Q["merge_upsert_orders"].fn(spark, SF_SMALL)
    o = load_table(spark, SF_SMALL, "orders")
    n_orders = o.count()
    n_inserts = o.where(F.col("o_orderkey") % 11 == 5).count()
    assert merged.count() == n_orders + n_inserts
    assert merged.select("o_orderkey").distinct().count() == merged.count()
    upd = merged.where(F.col("o_orderkey") % 7 == 0).where(
        F.col("o_orderkey") < 10_000_000
    )
    assert upd.where(F.col("o_orderstatus") != "U").count() == 0
    assert upd.where(F.col("from_change_batch") != 1).count() == 0
    untouched = merged.where(
        (F.col("o_orderkey") % 7 != 0) & (F.col("o_orderkey") < 10_000_000)
    )
    base = o.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    diff = (
        untouched.select("o_orderkey", "o_totalprice")
        .exceptAll(base)
        .count()
    )
    assert diff == 0


def test_merge_partial_aggregates_all_kinds(spark):
    """sum/count/min/max state columns merge correctly, and an
    unmergeable column name is rejected loudly."""
    import pytest

    from big_data_analysis_diseases_outbreaks_spark.operators.incremental import (
        merge_partial_aggregates,
    )

    a = spark.createDataFrame(
        [("x", 10, 2, 1, 7)], "k string, sum_v long, n long, min_v long, max_v long"
    )
    b = spark.createDataFrame(
        [("x", 5, 1, 0, 9), ("y", 1, 1, 3, 3)],
        "k string, sum_v long, n long, min_v long, max_v long",
    )
    got = {
        r.k: (r.sum_v, r.n, r.min_v, r.max_v)
        for r in merge_partial_aggregates([a, b], keys=["k"]).collect()
    }
    assert got == {"x": (15, 3, 0, 9), "y": (1, 1, 3, 3)}
    bad = spark.createDataFrame([("x", 1.0)], "k string, avg_v double")
    with pytest.raises(ValueError, match="mergeable prefix"):
        merge_partial_aggregates([bad], keys=["k"])
