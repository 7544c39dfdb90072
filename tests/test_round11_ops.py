"""Targeted unit tests for round-11 operators (beyond oracle parity):
planted-structure and algebraic-identity checks — link-prediction score
consistency, Gini bounds and a closed-form two-value case, assortativity
range, duplicate-ngram coverage on a constructed template pair, the
per-source cap quota, label-separation mass accounting, and the gap
alerts' cross-batch == single-batch equivalence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL

_Q = all_queries()


def test_link_prediction_scores_consistent(spark):
    rows = _Q["part_link_prediction_scores"].fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 50
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        _RA_SCALE,
    )

    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0
        # every common neighbor contributes at most SCALE (deg >= 1)
        # and at least SCALE div max-degree > 0
        assert 0 < r["ra_scaled"] <= r["n_common"] * _RA_SCALE
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    # jaccard non-increasing in rank order
    by_rank = sorted(rows, key=lambda r: r["rank"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert a["jaccard"] >= b["jaccard"]


def test_assortativity_in_range(spark):
    row = _Q["copurchase_degree_assortativity"].fn(spark, SF_SMALL).collect()[0]
    assert -1.0 <= row["assortativity"] <= 1.0
    assert row["m2"] > 0 and row["sum_sq"] >= row["sum_deg"]


def test_gini_bounds_and_two_value_case(spark):
    row = _Q["customer_revenue_gini"].fn(spark, SF_SMALL).collect()[0]
    assert 0.0 <= row["gini"] < 1.0
    # closed form: two customers with revenues 0 and x -> G = 1/2
    from big_data_analysis_diseases_outbreaks_spark.operators.rank import (
        with_global_rank,
    )

    df = spark.createDataFrame(
        [(1, 0), (2, 1000)], "o_custkey LONG, cents LONG"
    )
    ranked = with_global_rank(
        df, [F.col("cents").asc(), F.col("o_custkey").asc()], "r"
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("r") * F.col("cents")).alias("srx"),
    ).collect()[0]
    g = (2.0 * s["srx"] - (s["n"] + 1) * s["sx"]) / (s["n"] * s["sx"])
    assert abs(g - 0.5) < 1e-12


def test_dup_ngram_coverage_planted(spark):
    """Two identical 10-token docs -> every position covered; a doc
    sharing no 5-gram -> coverage 0."""
    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        doc_dup_ngram_coverage,
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="dnc_")
    spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "a b c d e f g h i j"),
            (3, "q r s t u v w x y z"),
        ],
        "doc_id LONG, text STRING",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc_id"]: r for r in doc_dup_ngram_coverage(spark, d).collect()
    }
    assert out[1]["covered_tokens"] == 10 and out[1]["dup_coverage"] == 1.0
    assert out[2]["covered_tokens"] == 10
    assert out[3]["covered_tokens"] == 0 and out[3]["dup_coverage"] == 0.0


def test_source_cap_quota(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.text import _SRC_CAP

    rows = _Q["source_cap_sample"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] == min(_SRC_CAP, r["n_docs"])
        assert r["kept_chars"] >= 0


def test_label_separation_mass_accounting(spark):
    """Σ_c self_dot + Σ_c cross_dot == |T|² : the per-label split must
    conserve the total quantized mass (T = global per-dim sums)."""
    rows = _Q["embedding_label_separation"].fn(spark, SF_SMALL).collect()
    # recompute |T|^2 independently from the same quantization
    emb = load_table(spark, SF_SMALL, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = F.array_max(
        F.transform("embedding", lambda x: F.abs(xd(x)))
    ) / 127.0
    qv = F.when(
        scale == 0, F.transform("embedding", lambda x: F.lit(0).cast("long"))
    ).otherwise(
        F.transform("embedding", lambda x: F.round(xd(x) / scale).cast("long"))
    )
    td = (
        emb.select(F.posexplode(qv).alias("dim", "q"))
        .groupBy("dim")
        .agg(F.sum("q").alias("td"))
        .agg(F.sum(F.col("td") * F.col("td")).alias("t2"))
        .collect()[0]["t2"]
    )
    total = sum(
        (r["within_pair_dot"] + r["diag_dot"]) if "diag_dot" in r else 0
        for r in rows
    )
    # within_pair_dot = self_dot - diag_dot; self_dot = within + diag.
    # The query doesn't emit diag_dot, so reconstruct self+cross mass:
    self_plus_cross = sum(
        r["within_pair_dot"] + r["cross_dot"] for r in rows
    )
    diag = (
        emb.select(
            F.aggregate(
                qv, F.lit(0).cast("long"), lambda a, x: a + x * x
            ).alias("d2")
        )
        .agg(F.sum("d2").alias("s"))
        .collect()[0]["s"]
    )
    assert self_plus_cross + diag == td


def test_stream_gap_alerts_matches_batch_lag(spark):
    """The 3-chunk stateful replay must equal the batch LAG window."""
    from big_data_analysis_diseases_outbreaks_spark.queries.streaming import (
        _GAP_THRESHOLD_US,
    )
    from pyspark.sql import Window

    got = sorted(
        (r["user_id"], r["prev_us"], r["at_us"], r["gap_us"])
        for r in _Q["stream_gap_alerts"].fn(spark, SF_SMALL).collect()
    )
    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    want = sorted(
        (r["user_id"], r["prev_us"], r["at_us"], r["gap_us"])
        for r in ev.withColumn("prev_us", F.lag("us").over(w))
        .where(
            F.col("prev_us").isNotNull()
            & (F.col("us") - F.col("prev_us") > _GAP_THRESHOLD_US)
        )
        .select(
            "user_id",
            "prev_us",
            F.col("us").alias("at_us"),
            (F.col("us") - F.col("prev_us")).alias("gap_us"),
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_community_profile_bounded_and_sorted(spark):
    rows = _Q["part_community_profile"].fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    sizes = [r["n_parts"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert all(r["top_brand"] for r in rows)


def test_recommender_eval_bounds(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        _REC_MRR_SCALE,
    )

    r = _Q["copurchase_recommender_eval"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_eval_customers"] > 0
    assert 0 <= r["n_hit_customers"] <= r["n_eval_customers"]
    assert 0.0 <= r["hit_rate"] <= 1.0
    assert 0 <= r["mrr_scaled"] <= r["n_hit_customers"] * _REC_MRR_SCALE


def test_equidepth_bins_are_equal_depth(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        _EQD_BINS,
    )

    rows = _Q["orders_equidepth_bins"].fn(spark, SF_SMALL).collect()
    assert len(rows) == _EQD_BINS
    counts = [r["n_rows"] for r in rows]
    # the floor formula spreads the remainder: depths differ by <= 1
    assert max(counts) - min(counts) <= 1
    by_bucket = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a["hi_cents"] <= b["lo_cents"]


def test_discount_elasticity_stats_consistent(spark):
    rows = _Q["brand_discount_elasticity"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # Cauchy-Schwarz: n*sxx >= sx^2 (strict unless x constant)
        assert r["n"] * r["sxx"] >= r["sx"] * r["sx"]
        assert r["slope"] == r["slope"]  # not NaN


def test_markov_stationary_sums_and_probs(spark):
    rows = _Q["events_markov_stationary"].fn(spark, SF_SMALL).collect()
    assert len(rows) >= 2
    total = sum(r["stationary_scaled"] for r in rows)
    probs = sum(r["stationary"] for r in rows)
    assert abs(probs - 1.0) < 1e-9
    # floor losses only: total mass <= n_states * SCALE
    from big_data_analysis_diseases_outbreaks_spark.queries.trends import (
        _MKV_SCALE,
    )

    assert 0 < total <= len(rows) * _MKV_SCALE * 2


def test_fiscal_445_period_lengths(spark):
    """Every fiscal period id is 1..12 and quarters are 4+4+5 weeks by
    construction of the step map."""
    rows = _Q["orders_fiscal_445_rollup"].fn(spark, SF_SMALL).collect()
    assert rows
    assert all(1 <= r["fiscal_period"] <= 12 for r in rows)


def test_cume_dist_monotone_and_bounded(spark):
    rows = sorted(
        _Q["orders_price_cume_dist"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["cents"],
    )
    last = 0.0
    for r in rows:
        assert last < r["cume_dist"] <= 1.0
        last = r["cume_dist"]
    assert abs(rows[-1]["cume_dist"] - 1.0) < 1e-12


def test_curriculum_manifest_total_order(spark):
    rows = _Q["curriculum_order_manifest"].fn(spark, SF_SMALL).collect()
    pos = sorted(r["position"] for r in rows)
    assert pos == list(range(1, len(rows) + 1))
    # bands non-increasing along the curriculum
    by_pos = sorted(rows, key=lambda r: r["position"])
    for a, b in zip(by_pos, by_pos[1:]):
        assert a["band"] >= b["band"]


def test_fertility_at_least_one(spark):
    rows = _Q["lang_tokenizer_fertility"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # a whitespace word decomposes into >= 1 subword unit
        assert r["fertility"] >= 1.0
        assert r["n_subwords"] >= r["n_words"]


def test_ann_grid_topk_shape(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.embeddings import (
        _I8_TOPK,
        _N_QUERIES,
    )

    rows = _Q["ann_grid_topk"].fn(spark, SF_SMALL).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r["query_id"] < _N_QUERIES
        assert r["cand_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) <= _I8_TOPK
        rs = sorted(rs, key=lambda r: r["rank"])
        for a, b in zip(rs, rs[1:]):
            assert (a["dot_i8"], -a["cand_id"]) >= (b["dot_i8"], -b["cand_id"])


def test_wilson_bound_properties(spark):
    rows = _Q["supplier_ontime_wilson"].fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        assert 0.0 <= r["wilson_lb"] < r["n_ontime"] / r["n_lines"] + 1e-9
        assert r["n_ontime"] <= r["n_lines"]
    by_rank = sorted(rows, key=lambda r: r["rank"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert a["wilson_lb"] >= b["wilson_lb"]


def test_local_bridges_have_zero_support(spark):
    """A reported bridge's endpoints must share no neighbor (planted
    check: triangle edges can never appear)."""
    rows = _Q["part_copurchase_local_bridges"].fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 25
    # verify support-0 directly against the edge set
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        copurchase_edges,
    )

    und = (
        copurchase_edges(spark, SF_SMALL)
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    adj = {}
    for r in und.collect():
        adj.setdefault(r["u"], set()).add(r["v"])
        adj.setdefault(r["v"], set()).add(r["u"])
    for r in rows:
        common = adj[r["part_key_1"]] & adj[r["part_key_2"]]
        assert not common, (r["part_key_1"], r["part_key_2"], common)
        assert r["deg_u"] == len(adj[r["part_key_1"]])
        assert r["deg_v"] == len(adj[r["part_key_2"]])
