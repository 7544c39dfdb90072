"""The local correctness gate: every oracle-backed query must match its
DuckDB twin exactly (same columns, row count, values) — mirroring the
driver's CORRECTNESS check at sf0.01.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

from .conftest import SF_ORACLE
from .oracle_harness import compare_query

_QUERIES = all_queries()
_ORACLE_BACKED = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)


@pytest.mark.parametrize("name", _ORACLE_BACKED)
def test_oracle_parity(spark, name):
    q = _QUERIES[name]
    df = q.fn(spark, SF_ORACLE)
    problems = compare_query(df, q.oracle, SF_ORACLE)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize(
    "name", sorted(n for n, q in _QUERIES.items() if q.oracle is None)
)
def test_rows_only_queries_run(spark, name):
    q = _QUERIES[name]
    df = q.fn(spark, SF_ORACLE)
    assert df.columns, f"{name} returned no schema"
    df.take(1)  # must execute without error


def test_approx_distinct_within_bounds(spark):
    """Sketch answers must land within their configured error of exact."""
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
    from .conftest import SF_ORACLE

    approx = {
        r["event_type"]: r
        for r in all_queries()["approx_distinct_users"]
        .fn(spark, SF_ORACLE)
        .collect()
    }
    exact = {
        r["event_type"]: r
        for r in all_queries()["distinct_users_per_type"]
        .fn(spark, SF_ORACLE)
        .collect()
    }
    assert set(approx) == set(exact)
    for t, e in exact.items():
        a = approx[t]
        assert abs(a["n_users_approx"] - e["n_users"]) <= max(
            3, 0.05 * e["n_users"]
        ), f"{t}: KMV estimate off by >5%"
        assert a["n_events"] == e["n_events"]
    # Hash-sample median rank bound: with a 1/4 deterministic sample of
    # ~2000 events per type (~500 samples), sampled-median rank error
    # has σ ≈ 0.5/√500 ≈ 2.2%; ±4% < 2σ holds deterministically for the
    # fixed md5 sample (measured worst 2.43% at sf0.01).
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    ev = load_table(spark, SF_ORACLE, "events")
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.46)").alias("lo"),
            F.expr("percentile(value, 0.54)").alias("hi"),
        )
        .collect()
    }
    for t in exact:
        lo, hi = bounds[t]
        assert lo <= approx[t]["p50_approx"] <= hi, (
            f"{t}: approx median {approx[t]['p50_approx']} outside "
            f"exact [p49, p51] = [{lo}, {hi}]"
        )


def test_samplby_api_seeded(spark):
    """The engine-RNG sampleBy API (retired from doc_stratified_sample
    in r11 in favor of the md5 protocol) stays covered: a fixed seed is
    deterministic across runs and respects per-stratum fractions."""
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table
    from .conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    fr = {"en": 0.5, "de": 0.25}
    a = sorted(r["doc_id"] for r in docs.sampleBy("lang", fr, seed=7).collect())
    b = sorted(r["doc_id"] for r in docs.sampleBy("lang", fr, seed=7).collect())
    assert a == b and len(a) > 0
    langs = {r["lang"] for r in docs.sampleBy("lang", fr, seed=7)
             .select("lang").distinct().collect()}
    assert langs <= set(fr)


def test_stratified_sample_properties(spark):
    """md5-bucket stratified sample: deterministic across runs, fractions
    within tolerance per stratum, unlisted strata absent."""
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        SAMPLE_FRACTIONS,
    )
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table
    from .conftest import SF_ORACLE

    q = all_queries()["doc_stratified_sample"]
    a = sorted(r["doc_id"] for r in q.fn(spark, SF_ORACLE).collect())
    b = sorted(r["doc_id"] for r in q.fn(spark, SF_ORACLE).collect())
    assert a == b and len(a) > 0
    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    sampled = {
        r["lang"]: r["n"]
        for r in q.fn(spark, SF_ORACLE).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(sampled) <= set(SAMPLE_FRACTIONS)
    for lang, frac in SAMPLE_FRACTIONS.items():
        got = sampled.get(lang, 0) / totals[lang]
        assert abs(got - frac) < 0.15, f"{lang}: sampled {got:.2f} vs {frac}"


@pytest.mark.parametrize(
    "name", sorted(n for n, q in _QUERIES.items() if q.oracle is None)
)
def test_rows_only_queries_deterministic(spark, name):
    """Blanket determinism for every query WITHOUT a value oracle: two
    executions must produce identical sorted rows. (Oracle-backed
    queries get this implicitly from the hash comparison; rows-only ones
    — seeded fits, LSH/IVF/PQ, sketches, samplers, bounded stream
    replays — are exactly where nondeterminism could hide.)"""
    from .conftest import SF_SMALL

    q = _QUERIES[name]
    a = sorted(map(tuple, q.fn(spark, SF_SMALL).collect()))
    b = sorted(map(tuple, q.fn(spark, SF_SMALL).collect()))
    assert a == b, f"{name}: two runs differ"
    assert a, f"{name}: empty result"


def test_harness_is_type_strict_like_the_driver(spark):
    """Regression meta-test for the round-4 driver-red class: DuckDB's
    windowed SUM(BIGINT) yields HUGEINT, which crosses the arrow/pandas
    boundary as decimal→float and hash-mismatches Spark's int64 even
    when every value is numerically equal. The harness must flag it —
    ``4994.0 == 4994`` in Python is exactly the false-green we're
    guarding against."""
    df = spark.range(1).select(F.lit(4994).cast("long").alias("s"))
    uncast = "SELECT SUM(x) OVER () AS s FROM (SELECT CAST(4994 AS BIGINT) AS x)"
    problems = compare_query(df, uncast, SF_ORACLE)
    assert problems, "harness silently equated HUGEINT-float with int"
    cast = ("SELECT CAST(SUM(x) OVER () AS BIGINT) AS s "
            "FROM (SELECT CAST(4994 AS BIGINT) AS x)")
    assert not compare_query(df, cast, SF_ORACLE)


_SF_LARGE = "/root/testdata/sf0.1"
_FLAGSHIP_AT_SCALE = [
    "anomaly_zscore",
    "tpch_q1_pricing",
    "dedup_exact",
    "training_data_pipeline",
    "stream_daily_agg",
    "doc_segment_dedup",
    "corpus_mixture_plan",
    # round-5 continuation: the global-order and curation additions are
    # the ones most sensitive to partition-boundary effects — check at
    # 10x scale too.
    "training_order_shuffle",
    "length_bucketed_batching",
    "corpus_budget_select",
    "doc_dup_ngram_chars",
    "stream_incremental_curation",
]


@pytest.mark.parametrize("name", _FLAGSHIP_AT_SCALE)
def test_flagship_parity_at_sf01(spark, name):
    """The oracle match must hold at 10x the usual check scale — catches
    anything accidentally tuned to the small fixtures (hash collisions,
    window boundaries, sampling caps, watermark edges)."""
    q = _QUERIES[name]
    problems = compare_query(q.fn(spark, _SF_LARGE), q.oracle, _SF_LARGE)
    assert not problems, f"{name}@sf0.1: " + "; ".join(problems)
