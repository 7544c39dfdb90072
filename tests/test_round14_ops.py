"""Targeted unit tests for the round-14 operators (beyond oracle
parity): bigram-LM perplexity vs a pure-Python scorer, exact substring
dedup vs a pure-Python anchor-protocol replica + a planted-span
fixture, and the deterministic isolation forest vs a pure-Python
LCG/descent replica + a planted-anomaly isolation check.
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd

from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
    _IFD_DEPTH,
    _IFD_LCG_A,
    _IFD_LCG_C,
    _IFD_LCG_M,
    _IFD_TREES,
)
from big_data_analysis_diseases_outbreaks_spark.queries.text import (
    _ESD_DF_CAP,
    _ESD_K,
    _ESD_MIN_SPAN,
    _PPL_TRAIN_LT,
    _PPL_TRAIN_MOD,
)

from .conftest import SF_SMALL

_Q = all_queries()


def _doc_words(sf_dir: str) -> dict[int, list[str]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()
    return {
        int(d): re.findall(r"[a-z]+", t.lower()) for d, t in rows
    }


# --- doc_bigram_perplexity ----------------------------------------------------


def test_bigram_perplexity_matches_pure_python_lm(spark):
    words = _doc_words(SF_SMALL)
    train = {
        d: w
        for d, w in words.items()
        if d % _PPL_TRAIN_MOD < _PPL_TRAIN_LT
    }
    c2: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    vocab = set()
    for w in train.values():
        vocab.update(w)
        for i in range(len(w) - 1):
            c2[(w[i], w[i + 1])] = c2.get((w[i], w[i + 1]), 0) + 1
            c1[w[i]] = c1.get(w[i], 0) + 1
    vsz = len(vocab)
    want = {}
    for d, w in words.items():
        if len(w) < 2:
            continue
        total = n = 0
        for i in range(len(w) - 1):
            den = c1.get(w[i], 0) + vsz
            num = c2.get((w[i], w[i + 1]), 0) + 1
            total += den.bit_length() - num.bit_length()
            n += 1
        want[d] = (n, total, (total * 1000) // n)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["total_bits"], r["avg_bits_x1000"])
        for r in _Q["doc_bigram_perplexity"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_bigram_perplexity_bits_nonnegative(spark):
    rows = _Q["doc_bigram_perplexity"].fn(spark, SF_SMALL).collect()
    assert rows
    # Laplace smoothing guarantees num <= den, so floor-log2 bits >= 0
    assert all(r["total_bits"] >= 0 for r in rows)
    assert {r["quality_tier"] for r in rows} <= {"high", "medium", "low"}


# --- doc_exact_substring_dedup ------------------------------------------------


def _esd_py(words: dict[int, list[str]]) -> dict[tuple[int, int], tuple]:
    """Pure-Python replica of the anchor-shingle protocol."""
    k = _ESD_K
    post: dict[str, list[tuple[int, int]]] = {}
    for d, w in words.items():
        for i in range(len(w) - k + 1):
            post.setdefault(" ".join(w[i : i + k]), []).append((d, i + 1))
    spans: dict[tuple[int, int, int, int], int] = {}
    runs: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for s, occ in post.items():
        docs = {d for d, _ in occ}
        if not (2 <= len(docs) <= _ESD_DF_CAP):
            continue
        for da, ia in occ:
            for db, ib in occ:
                if da < db:
                    runs.setdefault((da, db), []).append((ia - ib, ia))
    out: dict[tuple[int, int], tuple] = {}
    for pair, m in runs.items():
        by_diag: dict[int, list[int]] = {}
        for diag, ia in m:
            by_diag.setdefault(diag, []).append(ia)
        best, cnt = 0, 0
        for ias in by_diag.values():
            ias.sort()
            run = 1
            for prev, cur in zip(ias, ias[1:]):
                if cur == prev + 1:
                    run += 1
                else:
                    if run + k - 1 >= _ESD_MIN_SPAN:
                        cnt += 1
                        best = max(best, run + k - 1)
                    run = 1
            if run + k - 1 >= _ESD_MIN_SPAN:
                cnt += 1
                best = max(best, run + k - 1)
        if cnt:
            out[pair] = (best, cnt)
    return out


def test_exact_substring_dedup_matches_python_replica(spark):
    got = {
        (r["doc_a"], r["doc_b"]): (r["max_span_tokens"], r["n_spans"])
        for r in _Q["doc_exact_substring_dedup"].fn(spark, SF_SMALL).collect()
    }
    want = _esd_py(_doc_words(SF_SMALL))
    assert got == want
    assert got, "fixture corpus must contain exact duplicate spans"


def test_exact_substring_dedup_planted_span(spark, tmp_path):
    """A planted pair sharing EXACTLY a 25-token run must be reported
    with max_span_tokens == 25 — the anchor protocol reconstructs the
    true maximal span, not an approximation."""
    # distinct ALPHABETIC tokens: the [a-z]+ tokenizer strips digits,
    # so "w0".."w24" would all collapse to the repeated token "w" and
    # legitimately produce many diagonal runs
    shared = ["s" + chr(ord("a") + i) for i in range(25)]
    a = ["alpha"] * 10 + shared + ["beta"] * 10
    b = ["gamma"] * 7 + shared + ["delta"] * 12
    c = ["solo"] * 40
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [" ".join(a), " ".join(b), " ".join(c)],
        }
    )
    d = str(tmp_path / "esd")
    spark.createDataFrame(pdf).write.parquet(d + "/documents.parquet")
    rows = _Q["doc_exact_substring_dedup"].fn(spark, d).collect()
    assert [(r["doc_a"], r["doc_b"], r["max_span_tokens"], r["n_spans"])
            for r in rows] == [(1, 2, 25, 1)]


# --- iforest_deterministic ----------------------------------------------------


def _ifd_py(feat: dict[int, tuple[int, int, int]]) -> dict[int, int]:
    """Pure-Python replica: LCG cuts + descent + prefix-occupancy
    isolation depths."""
    t_cnt, depth = _IFD_TREES, _IFD_DEPTH
    a, c, m = _IFD_LCG_A, _IFD_LCG_C, _IFD_LCG_M
    lo = [min(v[q] for v in feat.values()) for q in range(3)]
    hi = [max(v[q] for v in feat.values()) for q in range(3)]
    cuts = {}
    for t in range(1, t_cnt + 1):
        for n in range(1, 2 ** depth):
            s0 = (t * 1000003 + n * 7919 + c) % m
            s1 = (a * s0 + c) % m
            q = s1 % 3
            s2 = (a * s1 + c) % m
            cuts[(t, n)] = (q, lo[q] + s2 % (hi[q] - lo[q] + 1))
    leaf = {}
    for ck, x in feat.items():
        for t in range(1, t_cnt + 1):
            node = 1
            for _ in range(depth):
                q, thr = cuts[(t, node)]
                node = 2 * node + (0 if x[q] <= thr else 1)
            leaf[(ck, t)] = node
    occ: dict[tuple[int, int, int], int] = {}
    for (ck, t), node in leaf.items():
        for d in range(1, depth + 1):
            pfx = node // (2 ** (depth - d))
            occ[(t, d, pfx)] = occ.get((t, d, pfx), 0) + 1
    out: dict[int, int] = {}
    for (ck, t), node in leaf.items():
        plen = depth
        for d in range(1, depth + 1):
            if occ[(t, d, node // (2 ** (depth - d)))] == 1:
                plen = d
                break
        out[ck] = out.get(ck, 0) + plen
    return out


def _orders_feat(sf_dir: str) -> dict[int, tuple[int, int, int]]:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_custkey,
               CAST(MAX(CAST(o_orderdate AS DATE)) - DATE '1992-01-01'
                    AS BIGINT),
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM '{sf_dir}/orders.parquet' GROUP BY o_custkey
        """
    ).fetchall()
    con.close()
    return {int(ck): (int(r), int(f), int(mm)) for ck, r, f, mm in rows}


def test_iforest_deterministic_matches_python_replica(spark):
    got = {
        r["c_custkey"]: r["path_sum"]
        for r in _Q["iforest_deterministic"].fn(spark, SF_SMALL).collect()
    }
    want = _ifd_py(_orders_feat(SF_SMALL))
    assert got == want


def test_iforest_deterministic_isolates_planted_anomaly(spark, tmp_path):
    """A customer with a wildly extreme spend must isolate earlier
    (lower path_sum / iso_score) than the bulk — the Liu/Ting/Zhou
    signal survives the deterministic protocol."""
    rows = []
    okey = 0
    for ck in range(1, 101):
        for j in range(3):
            okey += 1
            rows.append(
                (okey, ck, f"1995-0{1 + (ck + j) % 9}-15",
                 1000.0 + (ck * 37 + j * 11) % 500)
            )
    okey += 1
    rows.append((okey, 999, "1997-06-01", 900000.0))  # the anomaly
    pdf = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_orderdate",
                       "o_totalprice"]
    )
    d = str(tmp_path / "ifd")
    spark.createDataFrame(pdf).write.parquet(d + "/orders.parquet")
    res = {
        r["c_custkey"]: (r["path_sum"], r["iso_score"])
        for r in _Q["iforest_deterministic"].fn(spark, d).collect()
    }
    anomaly = res[999][0]
    bulk = sorted(v[0] for k, v in res.items() if k != 999)
    # strictly below the 5th percentile of the bulk path sums
    assert anomaly < bulk[len(bulk) // 20], (anomaly, bulk[:8])
    # score is the single IEEE division of the exact path sum
    assert res[999][1] == anomaly / (_IFD_TREES * _IFD_DEPTH)
