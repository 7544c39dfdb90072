"""Round-7 prefix-aggregate operators and their query surfaces:
exclusive running max, running-sum grand total, weighted systematic
sampling, Pareto skyline, exact EWMA, autocorrelation, postings index."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.rank import (
    with_global_exclusive_running_max,
    with_global_running_sum,
)
from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
    _SYS_SAMPLE_K,
    orders_weighted_systematic_sample,
    part_pareto_frontier,
)
from big_data_analysis_diseases_outbreaks_spark.queries.trends import (
    _EWMA_SPAN,
    _EWMA_W,
    _daily,
    series_autocorr,
    series_ewma16,
)
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_exclusive_running_max_matches_naive(spark):
    rows = [(i, (i * 37 + 11) % 100) for i in range(500)]
    df = spark.createDataFrame(rows, "k BIGINT, v BIGINT")
    got = {
        r["k"]: r["m"]
        for r in with_global_exclusive_running_max(
            df, ["k"], "v", out_col="m", num_partitions=8
        ).collect()
    }
    best = None
    for k, v in rows:  # already in k order
        assert got[k] == best
        best = v if best is None else max(best, v)


def test_running_sum_total_col(spark):
    rows = [(i, i % 7 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "k BIGINT, v BIGINT")
    out = with_global_running_sum(
        df, ["k"], "v", out_col="cum", total_col="tot", num_partitions=8
    ).collect()
    want_total = sum(v for _, v in rows)
    cum = 0
    got = {r["k"]: r for r in out}
    for k, v in rows:
        cum += v
        assert got[k]["cum"] == cum
        assert got[k]["tot"] == want_total


def test_systematic_sample_properties(spark):
    out = orders_weighted_systematic_sample(spark, SF_SMALL).collect()
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("w"),
    ).collect()
    total = sum(r["w"] for r in orders)
    # Every boundary crossed exactly once: strata counts sum to K.
    assert sum(r["n_strata"] for r in out) == _SYS_SAMPLE_K
    assert len(out) <= _SYS_SAMPLE_K
    # Certainty selection: any weight >= W/K spans a full stratum.
    heavy = {r["o_orderkey"] for r in orders if r["w"] * _SYS_SAMPLE_K >= total}
    assert heavy <= {r["o_orderkey"] for r in out}


def test_pareto_frontier_matches_bruteforce(spark):
    pts = load_table(spark, SF_SMALL, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("p"),
        F.col("p_size").cast("long").alias("s"),
    ).collect()
    want = set()
    for a in pts:
        dominated = any(
            b["p"] <= a["p"]
            and b["s"] >= a["s"]
            and (b["p"] < a["p"] or b["s"] > a["s"])
            for b in pts
        )
        if not dominated:
            want.add(a["p_partkey"])
    got = {r["p_partkey"] for r in part_pareto_frontier(spark, SF_SMALL).collect()}
    assert got == want
    assert got  # non-degenerate fixture


def test_ewma_matches_python_mirror(spark):
    daily = {
        (r["region"], r["kw"]): []
        for r in _daily(spark, SF_SMALL).collect()
    }
    for r in _daily(spark, SF_SMALL).orderBy("region", "kw", "date").collect():
        daily[(r["region"], r["kw"])].append(
            (r["date"], int(round(r["value"] * 100)))
        )
    got = {
        (r["region"], r["kw"], r["date"]): r
        for r in series_ewma16(spark, SF_SMALL).collect()
    }
    n_checked = 0
    for (region, kw), series in daily.items():
        for i, (date, _v) in enumerate(series):
            lags = series[max(0, i - _EWMA_SPAN + 1) : i + 1][::-1]
            num = sum(v * _EWMA_W[k] for k, (_d, v) in enumerate(lags))
            den = sum(_EWMA_W[k] for k in range(len(lags)))
            r = got[(region, kw, date)]
            assert r["num"] == num and r["den"] == den
            assert r["ewma"] == num / (den * 100)
            n_checked += 1
    assert n_checked == len(got)


def test_ewma_lag_semantics_skip_missing_days(spark):
    """Lags are ROW lags over the irregular series (k-th previous
    observation), not calendar-day lags — missing days drop out of both
    sums rather than zero-filling."""
    out = series_ewma16(spark, SF_SMALL)
    first = out.groupBy("region", "kw").agg(F.min("date").alias("d0"))
    j = out.join(first, ["region", "kw"]).where(F.col("date") == F.col("d0"))
    assert j.where(F.col("den") != 4 ** (_EWMA_SPAN - 1)).count() == 0


def test_autocorr_matches_numpy(spark):
    import numpy as np

    rows = series_autocorr(spark, SF_SMALL).collect()
    assert rows
    daily = {}
    for r in _daily(spark, SF_SMALL).collect():
        daily.setdefault((r["region"], r["kw"]), {})[r["date"]] = int(
            round(r["value"] * 100)
        )
    import datetime

    for r in rows[:50]:
        series = daily[(r["region"], r["kw"])]
        xs, ys = [], []
        for d, v in series.items():
            prev = d - datetime.timedelta(days=int(r["lag"]))
            if prev in series:
                xs.append(series[prev])
                ys.append(v)
        assert r["n"] == len(xs)
        want = np.corrcoef(xs, ys)[0, 1]
        assert math.isclose(r["r"], want, rel_tol=1e-9, abs_tol=1e-9)


def test_postings_index_parity(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        _POSTINGS_HEAD,
        token_postings_index,
        tokens,
    )

    dt = (
        load_table(spark, SF_SMALL, "documents")
        .select(
            "doc_id",
            F.explode_outer(tokens(F.lower(F.col("text")))).alias("t"),
        )
        .where(F.col("t").isNotNull())
        .distinct()
        .collect()
    )
    want: dict[str, set[int]] = {}
    for r in dt:
        want.setdefault(r["t"], set()).add(r["doc_id"])
    got = token_postings_index(spark, SF_SMALL).collect()
    assert {r["token"] for r in got} == set(want)
    for r in got:
        docs = sorted(want[r["token"]])
        assert r["df"] == len(docs)
        assert r["head_postings"] == ",".join(
            str(d) for d in docs[:_POSTINGS_HEAD]
        )


def test_ntile_matches_sql_semantics_at_ragged_sizes(spark):
    """SQL NTILE puts the first N%n buckets at ceil(N/n) rows — NOT the
    even-spread floor((r-1)*n/N)+1 (differs whenever N%n != 0; the
    formula this operator shipped with until round 7)."""
    import duckdb

    from big_data_analysis_diseases_outbreaks_spark.operators.rank import (
        with_global_ntile,
    )

    for n_rows in (3, 7, 13, 100, 101, 104):
        for n in (4, 5, 10):
            df = spark.createDataFrame(
                [(i,) for i in range(n_rows)], "k BIGINT"
            )
            got = {
                r["k"]: r["tile"]
                for r in with_global_ntile(
                    df, ["k"], n, num_partitions=4
                ).collect()
            }
            want = {
                k: t
                for k, t in duckdb.sql(
                    f"SELECT k, NTILE({n}) OVER (ORDER BY k) FROM "
                    f"(SELECT UNNEST(range({n_rows})) AS k)"
                ).fetchall()
            }
            assert got == want, (n_rows, n)
