"""Targeted unit tests for round-9 operators (beyond oracle parity):
planted-structure checks that pin SEMANTICS the fixture data may not
exercise — heavy-weight preference in weighted PageRank, MV delta
equivalence on an adversarial append split, funnel ordering rules, and
the quality classifier's bias-only floor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.pagerank import (
    weighted_pagerank,
)


def test_weighted_pagerank_prefers_heavy_edge(spark):
    # Star: center 0 — heavy edge to 1 (w=9), light to 2 (w=1).
    # The walker leaving 0 goes to 1 with prob 0.9 → rank(1) > rank(2).
    edges = spark.createDataFrame(
        [(0, 1, 9), (1, 0, 9), (0, 2, 1), (2, 0, 1)],
        "src LONG, dst LONG, w LONG",
    )
    ranks = {
        r["node"]: r["pagerank_scaled"]
        for r in weighted_pagerank(edges, n_iter=4).collect()
    }
    assert ranks[1] > ranks[2]
    # mass sanity: total stays within integer-truncation slack of 3.0
    total = sum(ranks.values())
    assert 0.97 * 3_000_000_000 < total <= 3_000_000_000


def test_weighted_pagerank_uniform_weights_match_unweighted(spark):
    from big_data_analysis_diseases_outbreaks_spark.operators.pagerank import (
        SCALE,
        pagerank,
    )

    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]
    unw = spark.createDataFrame(edges, "src LONG, dst LONG")
    w = spark.createDataFrame(
        [(s, d, 7) for s, d in edges], "src LONG, dst LONG, w LONG"
    )
    # equal weights cancel: (rank·7) div (7·outdeg) == rank div outdeg
    got = {
        r["node"]: r["pagerank_scaled"]
        for r in weighted_pagerank(w, n_iter=3, scale=SCALE).collect()
    }
    want = {
        r["node"]: r["pagerank_scaled"]
        for r in pagerank(unw, n_iter=3).collect()
    }
    assert got == want


def test_edge_mv_delta_equals_rebuild_adversarial_split(spark):
    """Appends landing INSIDE existing orders (the case a partition
    rebuild can't express): new lines join old lines of the same order."""
    rows = []
    # order 1: old parts 1,2 + new part 3 -> delta pairs (1,3),(2,3)
    rows += [(1, 1, False), (1, 2, False), (1, 3, True)]
    # order 2: all new parts 4,5 -> delta pair (4,5)
    rows += [(2, 4, True), (2, 5, True)]
    # order 3: all old parts 1,2 -> old pair (1,2) again (w=2 total)
    rows += [(3, 1, False), (3, 2, False)]
    li = spark.createDataFrame(
        rows, "l_orderkey LONG, l_partkey LONG, _new BOOLEAN"
    )

    def pair_weights(a, b, strict):
        cond = (
            F.col("a.l_partkey") < F.col("b.l_partkey")
            if strict
            else F.col("a.l_partkey") != F.col("b.l_partkey")
        )
        return (
            a.alias("a")
            .join(b.alias("b"), "l_orderkey")
            .where(cond)
            .groupBy(
                F.least("a.l_partkey", "b.l_partkey").alias("u"),
                F.greatest("a.l_partkey", "b.l_partkey").alias("v"),
            )
            .agg(F.count(F.lit(1)).alias("w"))
        )

    old = li.where(~F.col("_new")).drop("_new")
    new = li.where(F.col("_new")).drop("_new")
    full = pair_weights(li.drop("_new"), li.drop("_new"), strict=True)
    delta = (
        pair_weights(new, old, strict=False)
        .unionByName(pair_weights(new, new, strict=True))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w_d"))
    )
    z = F.lit(0).cast("long")
    merged = (
        pair_weights(old, old, strict=True)
        .join(delta, ["u", "v"], "full")
        .select(
            "u",
            "v",
            (F.coalesce("w", z) + F.coalesce("w_d", z)).alias("w"),
        )
    )
    got = {(r["u"], r["v"]): r["w"] for r in merged.collect()}
    want = {(r["u"], r["v"]): r["w"] for r in full.collect()}
    assert got == want == {(1, 2): 2, (1, 3): 1, (2, 3): 1, (4, 5): 1}


def test_funnel_state_machine_ordering(spark):
    """A purchase BEFORE the first view must not convert stage 3; a
    click at the exact view instant must not convert stage 2 (strict
    after)."""
    import pandas as pd

    from big_data_analysis_diseases_outbreaks_spark.streaming.stateful import (
        _funnel,
    )

    class FakeState:
        exists = False

        def update(self, v):
            self.saved = v

    pdf = pd.DataFrame(
        {
            "event_type": ["purchase", "view", "click", "click", "purchase"],
            "us": [5, 10, 10, 20, 30],
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7] * 5,
        }
    )
    state = FakeState()
    out = list(_funnel((7,), iter([pdf]), state))
    rows = set(map(tuple, out[0][["stage", "us"]].to_numpy().tolist()))
    # view@10 converts; click@10 does NOT (not strictly after); click@20
    # converts stage 2; purchase@30 converts stage 3; purchase@5 ignored.
    assert rows == {(1, 10), (2, 20), (3, 30)}
    assert state.saved == (10, 20, 30)


def test_quality_classifier_empty_doc_scores_bias(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        _QCLF_BIAS,
        _qclf_score_cols,
    )

    df = spark.createDataFrame([("",), ("one",)], "text STRING")
    scored, n_features, score = _qclf_score_cols(F.col("text"))
    rows = (
        df.select("text", scored.alias("_sc"))
        .select("text", n_features.alias("nf"), score.alias("s"))
        .collect()
    )
    by_text = {r["text"]: (r["nf"], r["s"]) for r in rows}
    assert by_text[""] == (0, _QCLF_BIAS)  # no features -> bias only
    nf_one, _ = by_text["one"]
    assert nf_one == 1  # one unigram, no bigram
