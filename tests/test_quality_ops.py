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


def test_forecast_backtest_matches_python(spark):
    import datetime

    from big_data_analysis_diseases_outbreaks_spark.queries.trends import (
        series_forecast_backtest,
    )

    daily: dict[tuple, list] = {}
    for r in _daily(spark, SF_SMALL).orderBy("region", "kw", "date").collect():
        daily.setdefault((r["region"], r["kw"]), []).append(
            (r["date"], int(round(r["value"] * 100)))
        )
    anchor = datetime.date(2024, 1, 1)
    got = {
        (r["region"], r["kw"], r["date"]): r
        for r in series_forecast_backtest(spark, SF_SMALL).collect()
    }
    n_checked = 0
    for (region, kw), series in daily.items():
        n = sx = sy = sxy = sxx = 0
        for d, v in series:
            x = (d - anchor).days
            det = n * sxx - sx * sx
            if n >= 2 and det > 0:
                slope = float(n * sxy - sx * sy) / (float(det) * 100.0)
                intercept = float(sy) / (n * 100.0) - slope * (float(sx) / n)
                pred = intercept + slope * float(x)
                r = got[(region, kw, d)]
                assert r["n_prior"] == n
                assert r["predicted"] == pred
                assert r["error"] == v / 100.0 - pred
                n_checked += 1
            n += 1
            sx += x
            sy += v
            sxy += x * v
            sxx += x * x
    assert n_checked == len(got) > 0


def test_eb_shrinkage_orders_small_samples_toward_prior(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        part_return_rate_eb,
    )

    rows = part_return_rate_eb(spark, SF_SMALL).collect()
    assert rows
    ng = sum(r["n_items"] for r in rows)
    xg = sum(r["n_returned"] for r in rows)
    p0 = xg / ng
    for r in rows:
        # shrunk lies strictly between raw and the prior (or equals both)
        lo, hi = sorted((r["raw_rate"], p0))
        assert lo - 1e-12 <= r["shrunk_rate"] <= hi + 1e-12
        # exact formula
        want = (r["n_returned"] * ng + 25 * xg) / (ng * (r["n_items"] + 25))
        assert r["shrunk_rate"] == want


def test_winnowing_matches_python(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        _WINNOW_HEAD,
        _WINNOW_W,
        RH_INIT,
        RH_MOD,
        RH_MULT,
        doc_winnowing_fingerprints,
        tokens,
    )

    toks = {
        r["doc_id"]: r["ts"]
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", tokens(F.lower(F.col("text"))).alias("ts"))
        .collect()
    }

    def polyhash(s: str) -> int:
        acc = RH_INIT
        for ch in s:
            acc = (acc * RH_MULT + ord(ch)) % RH_MOD
        return acc

    got = {r["doc_id"]: r for r in doc_winnowing_fingerprints(spark, SF_SMALL).collect()}
    n_checked = 0
    for doc, ts in toks.items():
        # token-level hash once, then the same polynomial over the 3
        # token hashes per gram (the r8 single-fold reshape)
        th = [polyhash(t) for t in ts]
        gh = []
        for i in range(len(ts) - 2):
            acc = RH_INIT
            for x in th[i : i + 3]:
                acc = (acc * RH_MULT + x) % RH_MOD
            gh.append(acc)
        if len(gh) < _WINNOW_W:
            assert doc not in got
            continue
        wins = sorted(
            {min(gh[i : i + _WINNOW_W]) for i in range(len(gh) - _WINNOW_W + 1)}
        )
        r = got[doc]
        assert (r["n_grams"], r["n_fingerprints"]) == (len(gh), len(wins))
        assert r["head_fps"] == ",".join(str(x) for x in wins[:_WINNOW_HEAD])
        n_checked += 1
    assert n_checked == len(got) > 0


def test_chi2_cells_match_python(spark):
    """Per-cell chi-square contributions equal the exact-rational
    formula evaluated in Python (same IEEE operation order)."""
    from big_data_analysis_diseases_outbreaks_spark.queries.trends import (
        events_chi2_independence,
    )

    rows = events_chi2_independence(spark, SF_SMALL).collect()
    assert rows
    n_total = sum(r["n_obs"] for r in rows)
    for r in rows:
        assert r["n_type"] == sum(
            x["n_obs"] for x in rows if x["event_type"] == r["event_type"]
        )
        assert r["n_dow"] == sum(
            x["n_obs"] for x in rows if x["dow"] == r["dow"]
        )
        dev = float(r["n_obs"] * n_total - r["n_type"] * r["n_dow"])
        want = dev * dev / float(r["n_type"] * r["n_dow"] * n_total)
        assert r["chi2_cell"] == want
        assert r["expected"] == float(r["n_type"] * r["n_dow"]) / n_total
    # margins cover every (type, dow) pair present
    assert 0 <= max(r["dow"] for r in rows) <= 6


def test_sentence_chunks_planted_and_arrow_plan(spark, tmp_path):
    """UDTF expansion: ordered ids, trimmed sentences, token counts —
    and the plan must use the Arrow UDTF node, never row-at-a-time
    BatchEvalPython."""
    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        doc_sentence_chunks,
    )

    spark.createDataFrame(
        [
            (1, "Hello there. How are you?  Fine! "),
            (2, "no terminator at all"),
            (3, "!!!"),
            (4, None),
        ],
        "doc_id BIGINT, text STRING",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    df = doc_sentence_chunks(spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPython(" not in plan
    got = {
        (r["doc_id"], r["sentence_id"]): (r["sentence"], r["n_tokens"])
        for r in df.collect()
    }
    assert got == {
        (1, 1): ("Hello there", 2),
        (1, 2): ("How are you", 3),
        (1, 3): ("Fine", 1),
        (2, 1): ("no terminator at all", 4),
    }


def test_winsorized_stats_match_python(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        orders_winsorized_stats,
    )

    rows = (
        load_table(spark, SF_SMALL, "orders")
        .select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in rows:
        groups.setdefault(r["o_orderpriority"], []).append(r["c"])
    got = {
        r["o_orderpriority"]: r
        for r in orders_winsorized_stats(spark, SF_SMALL).collect()
    }
    assert set(got) == set(groups)
    for prio, cs in groups.items():
        cs.sort()
        n = len(cs)
        import math

        # percentile_disc(f): smallest element with cume_dist >= f
        p05 = cs[max(0, math.ceil(0.05 * n) - 1)]
        p95 = cs[max(0, math.ceil(0.95 * n) - 1)]
        w = [min(max(c, p05), p95) for c in cs]
        r = got[prio]
        assert (r["p05_cents"], r["p95_cents"]) == (p05, p95)
        assert r["n_orders"] == n
        assert r["winsorized_sum_cents"] == sum(w)
        assert r["winsorized_mean_cents"] == sum(w) / n
        # clamping actually engaged (outliers exist in every class)
        assert r["winsorized_sum_cents"] != sum(cs)


def test_heaps_law_planted_growth(spark, tmp_path):
    """Vocabulary must count each token at its FIRST decile only, and
    cumulative totals must be exact."""
    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        corpus_heaps_law,
    )

    # 10 docs -> one per decile; doc i introduces token t{i} and repeats t0
    rows = [(i, f"t0 t{i}") for i in range(10)]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["bucket"]: (r["cum_tokens"], r["cum_vocab"], r["type_token_ratio"])
        for r in corpus_heaps_law(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(range(10))
    for b in range(10):
        ct, cv, ttr = got[b]
        assert ct == 2 * (b + 1)
        assert cv == b + 1  # t0 once (decile 0), t{b} new at decile b
        assert ttr == cv / ct


def test_bitmap_distinct_equals_count_distinct(spark):
    """The bitmap rollup must equal the exact countDistinct per day."""
    from big_data_analysis_diseases_outbreaks_spark.queries.trends import (
        daily_user_bitmap_distinct,
    )

    got = {
        r["date"]: (r["n_distinct_users"], r["n_events"])
        for r in daily_user_bitmap_distinct(spark, SF_SMALL).collect()
    }
    want = {
        r["date"]: (r["nd"], r["n"])
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy(F.to_date("ts").alias("date"))
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == want and got


def test_conformal_intervals_cover_at_least_ninety_pct(spark):
    """Split-conformal guarantee on the calibration set itself: the
    q90 half-width must cover >= 90% of each series' backtest errors
    (percentile_disc picks an actual element, so coverage is >= 0.9 by
    construction) and n_covered must recount exactly."""
    from big_data_analysis_diseases_outbreaks_spark.queries.trends import (
        series_conformal_intervals,
        series_forecast_backtest,
    )

    errs: dict[tuple, list[float]] = {}
    for r in series_forecast_backtest(spark, SF_SMALL).collect():
        errs.setdefault((r["region"], r["kw"]), []).append(abs(r["error"]))
    got = {
        (r["region"], r["kw"]): r
        for r in series_conformal_intervals(spark, SF_SMALL).collect()
    }
    assert set(got) == set(errs)
    for key, es in errs.items():
        r = got[key]
        assert r["n_backtests"] == len(es)
        n_cov = sum(1 for e in es if e <= r["q90_abs_error"])
        assert r["n_covered"] == n_cov
        assert r["coverage"] == n_cov / len(es)
        assert r["coverage"] >= 0.9
        assert r["q90_abs_error"] in es  # an actual element, not interp
