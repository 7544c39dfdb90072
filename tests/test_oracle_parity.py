"""The local correctness gate: every oracle-backed query must match its
DuckDB twin exactly (same columns, row count, values) — mirroring the
driver's CORRECTNESS check at sf0.01.
"""

from __future__ import annotations

import pytest

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
        ), f"{t}: HLL estimate off by >5%"
        assert a["n_events"] == e["n_events"]
