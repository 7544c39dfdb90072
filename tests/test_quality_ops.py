"""Round-7: LM OOV-rate filter, robust (median/MAD) z-score, ABC
classification — pure-Python parity on the sf0.001 fixture."""

from __future__ import annotations

from collections import Counter
from statistics import median

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
    part_abc_classification,
)
from big_data_analysis_diseases_outbreaks_spark.queries.text import (
    _LM_VOCAB_M,
    doc_lm_oov_rate,
    tokens,
)
from big_data_analysis_diseases_outbreaks_spark.queries.trends import (
    _ROBUST_Z_CUT,
    _daily,
    events_robust_zscore,
)
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_lm_oov_rate_matches_python(spark):
    tok = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", tokens(F.lower(F.col("text"))).alias("ts"))
        .collect()
    )
    doc_bigrams = {
        r["doc_id"]: [
            f"{a} {b}" for a, b in zip(r["ts"], r["ts"][1:])
        ]
        for r in tok
        if len(r["ts"]) >= 2
    }
    corpus = Counter(b for bs in doc_bigrams.values() for b in bs)
    vocab = {
        b
        for b, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_LM_VOCAB_M
        ]
    }
    got = {r["doc_id"]: r for r in doc_lm_oov_rate(spark, SF_SMALL).collect()}
    assert set(got) == set(doc_bigrams)
    for doc, bs in doc_bigrams.items():
        n_oov = sum(1 for b in bs if b not in vocab)
        r = got[doc]
        assert (r["n_bigrams"], r["n_oov"]) == (len(bs), n_oov)
        assert r["oov_rate"] == n_oov / len(bs)


def test_robust_zscore_matches_python(spark):
    series: dict[tuple, dict] = {}
    for r in _daily(spark, SF_SMALL).collect():
        series.setdefault((r["region"], r["kw"]), {})[r["date"]] = int(
            round(r["value"] * 100)
        )
    got = {
        (r["region"], r["kw"], r["date"]): r
        for r in events_robust_zscore(spark, SF_SMALL).collect()
    }
    n = 0
    for (region, kw), by_date in series.items():
        vs = list(by_date.values())
        med2 = int(2 * median(vs))
        mad4 = int(2 * median(abs(2 * v - med2) for v in vs))
        for date, v in by_date.items():
            if mad4 == 0:
                assert (region, kw, date) not in got
                continue
            r = got[(region, kw, date)]
            z = 0.6745 * ((2 * (2 * v - med2)) / mad4)
            assert (r["med2"], r["mad4"]) == (med2, mad4)
            assert r["z_mod"] == z
            assert r["is_outlier"] == int(abs(z) > _ROBUST_Z_CUT)
            n += 1
    assert n == len(got) and n > 0


def test_abc_classification_matches_python(spark):
    li = (
        load_table(spark, SF_SMALL, "lineitem")
        .select(
            "l_partkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            )
            .cast("long")
            .alias("r"),
        )
        .collect()
    )
    rev = Counter()
    for row in li:
        rev[row["l_partkey"]] += row["r"]
    total = sum(rev.values())
    cum = 0
    want = {}
    for k, v in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        if cum * 5 < total * 4:
            cls = "A"
        elif cum * 20 < total * 19:
            cls = "B"
        else:
            cls = "C"
        cum += v
        want[k] = (v, cum, cls)
    got = part_abc_classification(spark, SF_SMALL).collect()
    assert len(got) == len(want)
    for r in got:
        v, cum_k, cls = want[r["part_key"]]
        assert (r["rev"], r["cum_rev"], r["abc_class"]) == (v, cum_k, cls)
        assert r["total_rev"] == total
    # every A-row outranks every B-row outranks every C-row
    min_a = min(r["rev"] for r in got if r["abc_class"] == "A")
    max_c = max(r["rev"] for r in got if r["abc_class"] == "C")
    assert min_a >= max_c


def test_rfm_segments_match_python(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        customer_rfm_segments,
    )

    orders = (
        load_table(spark, SF_SMALL, "orders")
        .select(
            "o_custkey",
            F.to_date("o_orderdate").alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    agg: dict[int, list] = {}
    for r in orders:
        a = agg.setdefault(r["o_custkey"], [r["d"], 0, 0])
        a[0] = max(a[0], r["d"])
        a[1] += 1
        a[2] += r["c"]
    n = len(agg)

    def ntile5(key):
        order = sorted(agg, key=key)
        return {
            k: ((i * 5) // n) + 1 for i, k in enumerate(order)
        }

    r_s = ntile5(lambda k: (agg[k][0], k))
    f_s = ntile5(lambda k: (agg[k][1], k))
    m_s = ntile5(lambda k: (agg[k][2], k))
    got = customer_rfm_segments(spark, SF_SMALL).collect()
    assert len(got) == n
    for r in got:
        k = r["o_custkey"]
        assert (r["r_score"], r["f_score"], r["m_score"]) == (
            r_s[k],
            f_s[k],
            m_s[k],
        )
        assert r["rfm_segment"] == f"{r_s[k]}{f_s[k]}{m_s[k]}"
        assert (r["recency_date"], r["frequency"], r["monetary_cents"]) == (
            agg[k][0],
            agg[k][1],
            agg[k][2],
        )


def test_twap_matches_python(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        part_twap_price,
    )

    li = (
        load_table(spark, SF_SMALL, "lineitem")
        .select(
            "l_partkey",
            F.to_date("l_shipdate").alias("d"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
        )
        .collect()
    )
    obs: dict[int, dict] = {}
    for r in li:
        by_day = obs.setdefault(r["l_partkey"], {})
        by_day[r["d"]] = min(by_day.get(r["d"], r["p"]), r["p"])
    got = {r["part_key"]: r for r in part_twap_price(spark, SF_SMALL).collect()}
    n_expected = 0
    for part, by_day in obs.items():
        days = sorted(by_day)
        if len(days) < 2:
            assert part not in got
            continue
        n_expected += 1
        num = den = 0
        for a, b in zip(days, days[1:]):
            dt = (b - a).days
            num += by_day[a] * dt
            den += dt
        r = got[part]
        assert (r["n_intervals"], r["pw_num"], r["span_days"]) == (
            len(days) - 1,
            num,
            den,
        )
        assert r["twap"] == num / (den * 100)
    assert len(got) == n_expected


def test_recursive_ewma_matches_python_recursion(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.streaming import (
        stream_ewma_recursive,
    )

    daily: dict[tuple, list] = {}
    for r in (
        _daily(spark, SF_SMALL).orderBy("region", "kw", "date").collect()
    ):
        daily.setdefault((r["region"], r["kw"]), []).append(
            (r["date"], int(round(r["value"] * 100)))
        )
    want = {}
    for (region, kw), series in daily.items():
        s = None
        for d, v in series:
            s = v if s is None else (v + 3 * s) // 4
            want[(region, kw, d)] = (v, s)
    got = {
        (r["region"], r["kw"], r["date"]): (r["v_cents"], r["ewma_scaled"])
        for r in stream_ewma_recursive(spark, SF_SMALL).collect()
    }
    assert got == want
