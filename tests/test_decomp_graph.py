"""Round-7: STL-lite decomposition identities, LPA python parity,
join-skew profiler brute-force parity."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
    _LPA_ROUNDS,
    _SKEW_TOP,
    copurchase_edges,
    join_skew_profile,
    part_copurchase_lpa,
)
from big_data_analysis_diseases_outbreaks_spark.queries.trends import (
    _daily,
    series_stl_decompose,
)
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_stl_reconstruction_identity(spark):
    """trend + seasonal + residual == the original value (the integer
    numerators cancel exactly; the three emitted doubles reconstruct to
    float precision)."""
    rows = series_stl_decompose(spark, SF_SMALL).collect()
    assert rows
    daily = {
        (r["region"], r["kw"], r["date"]): r["value"]
        for r in _daily(spark, SF_SMALL).collect()
    }
    for r in rows:
        v = daily[(r["region"], r["kw"], r["date"])]
        assert math.isclose(
            r["trend"] + r["seasonal"] + r["residual"], v, rel_tol=1e-9
        )


def test_stl_residuals_center_per_dow(spark):
    """Within every (series, dow) group the residuals sum to an exact
    integer zero before the final division — the float sums vanish."""
    out = series_stl_decompose(spark, SF_SMALL)
    sums = (
        out.groupBy("region", "kw", "dow")
        .agg(F.sum("residual").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sums
    for r in sums:
        assert abs(r["s"]) < 1e-9 * max(1, r["n"])


def test_lpa_matches_python_reference(spark):
    edges = [
        (r["src"], r["dst"])
        for r in copurchase_edges(spark, SF_SMALL).distinct().collect()
    ]
    nbrs = defaultdict(list)
    for s, d in edges:
        nbrs[s].append(d)
    label = {n: n for n in nbrs}
    for _ in range(_LPA_ROUNDS):
        new = {}
        for n in nbrs:
            votes = Counter(label[m] for m in nbrs[n])
            # (count DESC, label ASC)
            new[n] = min(votes, key=lambda l: (-votes[l], l))
        label = new
    got = {
        r["part_key"]: r["community"]
        for r in part_copurchase_lpa(spark, SF_SMALL).collect()
    }
    assert got == label
    # Non-degenerate: propagation actually merged some communities.
    assert len(set(label.values())) < len(label)


def test_join_skew_profile_top_key(spark):
    ev = Counter(
        r["user_id"]
        for r in load_table(spark, SF_SMALL, "events")
        .select("user_id")
        .collect()
    )
    od = Counter(
        r["o_custkey"]
        for r in load_table(spark, SF_SMALL, "orders")
        .select("o_custkey")
        .collect()
    )
    prod = {k: ev[k] * od[k] for k in ev.keys() & od.keys()}
    total = sum(prod.values())
    want = sorted(prod.items(), key=lambda kv: (-kv[1], kv[0]))[:_SKEW_TOP]
    got = join_skew_profile(spark, SF_SMALL).collect()
    assert [(r["key"], r["out_rows"]) for r in got] == want
    for r in got:
        assert r["total_out"] == total
        assert r["share"] == r["out_rows"] / total
