"""Targeted unit tests for the round-12 operators (beyond oracle
parity): eval-decontamination planted-contamination recall, MAD flag
identities, vocab-coverage bounds, ANF sketch monotonicity + the
exact-below-k tier against true 1-hop neighborhoods, SSSP relaxation
invariants against unweighted BFS hops, and journey-path shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL

_Q = all_queries()


def test_decontamination_drops_planted_truncated_copies(spark):
    rows = _Q["doc_eval_decontamination"].fn(spark, SF_SMALL).collect()
    by_id = {r["doc_id"]: r for r in rows}
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tok")
    )
    eval_ids = [
        r["doc_id"]
        for r in docs.where(
            (F.col("doc_id") % 23 == 0) & (F.col("n_tok") >= 20)
        ).collect()
    ]
    assert eval_ids, "fixture must contain eval docs with >=20 tokens"
    for eid in eval_ids:
        twin = eid + 1_000_000  # 80%-prefix copy of an eval doc
        if twin in by_id:
            r = by_id[twin]
            assert r["dropped"], f"planted copy {twin} not dropped"
            assert r["n_contaminated"] > 0
    for r in rows:
        assert 0 <= r["n_contaminated"] <= r["n_grams"]
        assert r["dropped"] == (r["n_contaminated"] > 0)
        assert abs(
            r["contamination_frac"] - r["n_contaminated"] / r["n_grams"]
        ) < 1e-12


def test_mad_outlier_identities(spark):
    rows = _Q["orders_mad_outliers"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["mad_cents"] >= 0
        assert 0 <= r["n_outliers"] <= r["n_orders"]
        # at least half the group lies within one MAD of the median by
        # definition of the median of absolute deviations
        assert r["n_outliers"] <= r["n_orders"] / 2 + 1
        assert abs(r["outlier_rate"] - r["n_outliers"] / r["n_orders"]) < 1e-12


def test_vocab_coverage_bounds(spark):
    rows = _Q["doc_vocab_coverage"].fn(spark, SF_SMALL).collect()
    docs_n = load_table(spark, SF_SMALL, "documents").count()
    assert len(rows) == docs_n  # every doc reports (fixture has no empties)
    assert any(r["n_covered"] < r["n_tokens"] for r in rows), (
        "top-20 vocab should not cover everything"
    )
    for r in rows:
        assert 0 < r["n_tokens"]
        assert 0 <= r["n_covered"] <= r["n_tokens"]
        assert abs(r["coverage_frac"] - r["n_covered"] / r["n_tokens"]) < 1e-12


def test_anf_monotone_and_exact_below_k(spark):
    rows = _Q["part_copurchase_anf"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n1"] <= r["n2"] <= r["n3"]
        assert r["harmonic_3hop"] >= 0.0
    # exact tier: a non-full sketch IS the true closed 1-hop
    # neighborhood size (k = 16)
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        COPURCHASE_SHIPDATE_LO,
    )

    li = (
        load_table(spark, SF_SMALL, "lineitem")
        .where(
            F.to_date("l_shipdate")
            >= F.lit(COPURCHASE_SHIPDATE_LO).cast("date")
        )
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    deg = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("node"),
            F.col("b.l_partkey").alias("nbr"),
        )
        .distinct()
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    true_n1 = {r["node"]: r["deg"] + 1 for r in deg.collect()}
    checked = 0
    for r in rows:
        if true_n1.get(r["part_key"], 1) < 16:
            assert r["n1"] == true_n1[r["part_key"]], r
            checked += 1
    assert checked > 0, "fixture needs nodes below the sketch size"


def test_sssp_invariants_vs_bfs_hops(spark):
    rows = _Q["part_copurchase_sssp"].fn(spark, SF_SMALL).collect()
    assert rows
    costs = {r["part_key"]: r["cost_scaled"] for r in rows}
    seeds = [k for k in costs if k % 500 == 0]
    assert seeds and all(costs[s] == 0 for s in seeds)
    assert all(c >= 0 for c in costs.values())
    # every reached node's weighted cost is at most 1e6 * its hop count
    # (each hop costs at most 1e6 div 1), and positive off the seed set
    khop = {
        r["part_key"]: r["dist"]
        for r in _Q["part_copurchase_khop"].fn(spark, SF_SMALL).collect()
    }
    for k, c in costs.items():
        if k in khop and khop[k] <= 4:
            assert c <= 1_000_000 * max(khop[k], 0), (k, c, khop[k])
        if k % 500 != 0:
            assert c > 0


def test_top_paths_shape(spark):
    rows = _Q["events_top_paths"].fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert 1 <= len(r["path"].split(">")) <= 4
        assert r["n_users"] >= 1
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_curation_v3_subset_of_v2_and_eval_free(spark):
    v2 = {
        r["doc_id"]: r.asDict()
        for r in _Q["curation_pipeline_v2"].fn(spark, SF_SMALL).collect()
    }
    v3 = {
        r["doc_id"]: r.asDict()
        for r in _Q["curation_pipeline_v3"].fn(spark, SF_SMALL).collect()
    }
    assert set(v3) <= set(v2)
    assert all(d % 23 != 0 for d in v3), "eval docs must never train"
    for d, r in v3.items():
        assert r == v2[d]


def test_autocomplete_shape(spark):
    rows = _Q["token_prefix_autocomplete"].fn(spark, SF_SMALL).collect()
    assert rows
    seen: dict[str, list] = {}
    for r in rows:
        assert r["token"].startswith(r["prefix"]) and len(r["prefix"]) == 3
        assert 1 <= r["rank"] <= 3
        seen.setdefault(r["prefix"], []).append((r["rank"], r["n_occ"]))
    for pfx, rs in seen.items():
        rs.sort()
        occ = [n for _, n in rs]
        assert occ == sorted(occ, reverse=True), (pfx, rs)


def test_tile_manifest_identities(spark):
    rows = _Q["multimodal_tile_manifest"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["padded_w"] >= r["width"] and r["padded_w"] - r["width"] < 16
        assert r["padded_h"] >= r["height"] and r["padded_h"] - r["height"] < 16
        assert r["n_tiles"] == r["n_tiles_x"] * r["n_tiles_y"]
        assert r["seq_len"] == r["n_tiles"] + 1


def test_rich_club_monotone_and_bounded(spark):
    rows = sorted(
        _Q["part_rich_club"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["k"],
    )
    assert rows
    n_prev = None
    for r in rows:
        assert 0.0 <= r["phi"] <= 1.0
        if n_prev is not None:
            assert r["n_k"] <= n_prev, "higher threshold, fewer hubs"
        n_prev = r["n_k"]


def test_holiday_event_study_shape(spark):
    rows = _Q["orders_holiday_event_study"].fn(spark, SF_SMALL).collect()
    offs = {r["day_offset"] for r in rows}
    assert offs <= set(range(-3, 4)) and 0 in offs
    for r in rows:
        assert r["n_days"] >= 1 and r["lift"] > 0.0


def test_anf_mv_equals_rebuild(spark):
    a = {
        r["part_key"]: r.asDict()
        for r in _Q["part_copurchase_anf"].fn(spark, SF_SMALL).collect()
    }
    b = {
        r["part_key"]: r.asDict()
        for r in _Q["part_copurchase_anf_mv"].fn(spark, SF_SMALL).collect()
    }
    assert a == b


def test_dow_anomaly_residual_identity(spark):
    rows = _Q["orders_dow_adjusted_anomaly"].fn(spark, SF_SMALL).collect()
    assert rows
    n_anom = sum(1 for r in rows if r["is_anomaly"])
    assert n_anom <= len(rows) / 2
    for r in rows:
        assert r["residual"] == r["c"] - r["dow_median"]
        assert 1 <= r["dow"] <= 7
