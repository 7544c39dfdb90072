"""Invariants for the round-8 privacy / attribution / graph batch beyond
the DuckDB parity gate: k-anonymity class arithmetic, HITS on a planted
bipartite graph, business-day counting across weekends, grid-join
equivalence to the naive radius join, and conservation of attributed
cents.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

from .conftest import SF_SMALL

_Q = all_queries()


def test_k_anonymity_classes_cover_table(spark):
    """Class sizes sum to the table count; below_k is size < 5 exactly."""
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    out = _Q["customer_k_anonymity"].fn(spark, SF_SMALL).collect()
    total = load_table(spark, SF_SMALL, "customer").count()
    assert sum(r.class_size for r in out) == total
    for r in out:
        assert r.below_k == (r.class_size < 5)


def test_bipartite_hits_planted_graph(spark):
    """Two exact power-iteration steps on a hand-computable graph."""
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        part_bipartite_hits,
    )
    import tempfile

    # customers c1,c2; parts p1,p2,p3. c1 buys {p1,p2}, c2 buys {p2,p3}.
    # a1 = indeg: p1=1 p2=2 p3=1. h1: c1=a1(p1)+a1(p2)=3, c2=3.
    # a2: p1=h1(c1)=3, p2=h1(c1)+h1(c2)=6, p3=3.
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(10, 1), (11, 1), (20, 2), (21, 2)],
            "o_orderkey long, o_custkey long",
        ).write.parquet(f"{d}/orders.parquet")
        spark.createDataFrame(
            [(10, 101), (11, 102), (20, 102), (21, 103)],
            "l_orderkey long, l_partkey long",
        ).write.parquet(f"{d}/lineitem.parquet")
        rows = {
            r.part_key: (r.indegree, r.authority)
            for r in part_bipartite_hits(spark, d).collect()
        }
    assert rows == {101: (1, 3), 102: (2, 6), 103: (1, 3)}


def test_businessday_lag_weekend_arithmetic(spark):
    """Mon->next Mon is 5 business days; Fri->Mon is 1; Sat->Sun is 0."""
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        order_businessday_lag,
    )
    import tempfile

    cases = [
        (1, "2024-01-01", "2024-01-08", 5),  # Mon -> Mon
        (2, "2024-01-05", "2024-01-08", 1),  # Fri -> Mon
        (3, "2024-01-06", "2024-01-07", 0),  # Sat -> Sun
        (4, "2024-01-08", "2024-01-05", -1),  # Mon -> prev Fri (negative)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(k, datetime.date.fromisoformat(o)) for k, o, _, _ in cases],
            "o_orderkey long, o_orderdate date",
        ).write.parquet(f"{d}/orders.parquet")
        spark.createDataFrame(
            [(k, datetime.date.fromisoformat(s)) for k, _, s, _ in cases],
            "l_orderkey long, l_shipdate date",
        ).write.parquet(f"{d}/lineitem.parquet")
        hist = {
            r.businessday_lag: r.n_orders
            for r in order_businessday_lag(spark, d).collect()
        }
    assert hist == {5: 1, 1: 1, 0: 1, -1: 1}


def test_geo_grid_pairs_match_naive_radius_join(spark):
    """The 3x3-cell probe join equals the all-pairs radius join exactly
    (found-once, none missed across cell boundaries)."""
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        _GEO_R,
        customer_geo_grid_pairs,
    )

    out = _Q["customer_geo_grid_pairs"].fn(spark, SF_SMALL)
    got = {(r.custkey_a, r.custkey_b, r.dist2) for r in out.collect()}
    assert len(got) == out.count()  # exactly-once

    # naive recomputation of the same synthetic coordinates
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    keys = [
        r.c_custkey
        for r in load_table(spark, SF_SMALL, "customer")
        .select("c_custkey")
        .collect()
    ]
    def coords(k):
        hv = (k * 48271) % 2147483647
        mv = (hv % 100003) * (hv // 100003 + 7)
        return mv % 4000, (mv // 4000) % 4000

    pts = {k: coords(k) for k in keys}
    want = set()
    ks = sorted(keys)
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
            if d2 <= _GEO_R * _GEO_R:
                want.add((a, b, d2))
    assert got == want


def test_attribution_conserves_cents(spark):
    """Linear shares of every attributed purchase sum exactly to its
    cents (remainder lands on the last touch), so the per-type linear
    totals sum to the attributed lasttouch totals' purchase pool."""
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    out = {r.touch_type: r for r in _Q["purchase_attribution"].fn(spark, SF_SMALL).collect()}
    assert set(out) <= {"view", "click"}
    # conservation: sum(linear) == sum(lasttouch) == total cents of
    # attributed purchases (each purchase's full value lands once in
    # both schemes)
    lin = sum(r.linear_cents for r in out.values())
    last = sum(r.lasttouch_cents for r in out.values())
    assert lin == last

    ev = load_table(spark, SF_SMALL, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_ev"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
    )
    attributed = (
        p.join(
            t,
            (F.col("t_user") == F.col("user_id"))
            & (F.col("t_ts") < F.col("p_ts"))
            & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAY")),
            "left_semi",
        )
        .agg(F.sum("cents"))
        .collect()[0][0]
    )
    assert last == (attributed or 0)


def test_simhash_hamming_pairs_lossless(spark):
    """Pigeonhole banding must find EVERY pair within Hamming <= 1 —
    verified against the naive all-pairs scan of the signatures."""
    from big_data_analysis_diseases_outbreaks_spark.queries.text import doc_simhash16

    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in _Q["simhash_hamming_pairs"].fn(spark, SF_SMALL).collect()
    }
    sims = {
        r.doc_id: r.simhash16
        for r in doc_simhash16(spark, SF_SMALL).collect()
    }
    ks = sorted(sims)
    want = set()
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= 1:
                want.add((a, b, h))
    assert got == want


def test_weighted_median_is_lower_median(spark):
    """The selected balance must be the smallest value whose cumulative
    weight reaches half the total (lower weighted median)."""
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    out = {
        r.nationkey: r
        for r in _Q["nation_weighted_median_balance"].fn(spark, SF_SMALL).collect()
    }
    cust = load_table(spark, SF_SMALL, "customer").select(
        "c_custkey",
        F.col("c_nationkey").alias("nk"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    orders = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    w = (
        cust.join(orders, "c_custkey")
        .groupBy("nk", "cents", "c_custkey")
        .agg(F.count(F.lit(1)).alias("wt"))
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(list)
    for r in w:
        per[r.nk].append((r.cents, r.c_custkey, r.wt))
    for nk, rows in per.items():
        rows.sort()
        tot = sum(x[2] for x in rows)
        cum = 0
        med = None
        for cents, _, wt in rows:
            cum += wt
            if 2 * cum >= tot:
                med = cents
                break
        assert out[nk].wmedian_cents == med
        assert out[nk].total_weight == tot
