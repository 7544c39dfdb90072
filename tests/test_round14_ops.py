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


# --- doc_substring_dedup_apply ------------------------------------------------


def _esd_spans_py(words: dict[int, list[str]]):
    """(da, db, diag) -> list of (ib0, span) for ALL maximal runs."""
    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        _ESD_DF_CAP as CAP,
        _ESD_K as K,
    )

    post: dict[str, list[tuple[int, int]]] = {}
    for d, w in words.items():
        for i in range(len(w) - K + 1):
            post.setdefault(" ".join(w[i : i + K]), []).append((d, i + 1))
    by_pair: dict[tuple[int, int], dict[int, list[int]]] = {}
    for s, occ in post.items():
        docs = {d for d, _ in occ}
        if not (2 <= len(docs) <= CAP):
            continue
        for da, ia in occ:
            for db, ib in occ:
                if da < db:
                    by_pair.setdefault((da, db), {}).setdefault(
                        ia - ib, []
                    ).append(ia)
    spans = []
    for (da, db), diags in by_pair.items():
        for diag, ias in diags.items():
            ias.sort()
            start = ias[0]
            run = 1
            for prev, cur in zip(ias, ias[1:]):
                if cur == prev + 1:
                    run += 1
                else:
                    spans.append((da, db, start - diag, run + K - 1))
                    start, run = cur, 1
            spans.append((da, db, start - diag, run + K - 1))
    return spans


def test_substring_dedup_apply_matches_python_replica(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        _ESD_MIN_SPAN,
    )

    words = _doc_words(SF_SMALL)
    ivls: dict[int, list[tuple[int, int]]] = {}
    for da, db, ib0, span in _esd_spans_py(words):
        if span >= _ESD_MIN_SPAN:
            ivls.setdefault(db, []).append((ib0, ib0 + span - 1))
    want = {}
    for d, w in words.items():
        if not w:
            continue
        removed = n_iv = 0
        if d in ivls:
            merged = []
            for s, e in sorted(ivls[d]):
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            removed = sum(e - s + 1 for s, e in merged)
            n_iv = len(merged)
        want[d] = (len(w), removed, len(w) - removed, n_iv,
                   (removed * 10000) // len(w))
    got = {
        r["doc_id"]: (r["n_tokens"], r["tokens_removed"], r["tokens_kept"],
                      r["n_intervals"], r["removed_pct_x10000"])
        for r in _Q["doc_substring_dedup_apply"].fn(spark, SF_SMALL).collect()
    }
    assert got == want
    assert any(v[1] > 0 for v in got.values()), "corpus has real removals"


# --- doc_trigram_backoff_bits -------------------------------------------------


def test_trigram_backoff_matches_pure_python_lm(spark):
    words = _doc_words(SF_SMALL)
    train = {
        d: w for d, w in words.items()
        if d % _PPL_TRAIN_MOD < _PPL_TRAIN_LT
    }
    c3: dict[tuple, int] = {}
    cx: dict[tuple, int] = {}
    c2: dict[tuple, int] = {}
    c1: dict[str, int] = {}
    vocab = set()
    for w in train.values():
        vocab.update(w)
        for i in range(len(w) - 1):
            c2[(w[i], w[i + 1])] = c2.get((w[i], w[i + 1]), 0) + 1
            c1[w[i]] = c1.get(w[i], 0) + 1
        for i in range(len(w) - 2):
            t = (w[i], w[i + 1], w[i + 2])
            c3[t] = c3.get(t, 0) + 1
            cx[t[:2]] = cx.get(t[:2], 0) + 1
    vsz = len(vocab)
    want = {}
    for d, w in words.items():
        if len(w) < 3:
            continue
        total = nb = n = 0
        for i in range(len(w) - 2):
            t = (w[i], w[i + 1], w[i + 2])
            if t in c3:
                total += cx[t[:2]].bit_length() - c3[t].bit_length()
            else:
                nb += 1
                den = c1.get(w[i + 1], 0) + vsz
                num = c2.get((w[i + 1], w[i + 2]), 0) + 1
                total += 1 + den.bit_length() - num.bit_length()
            n += 1
        want[d] = (n, total, (total * 1000) // n, (nb * 10000) // n)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["total_bits"], r["avg_bits_x1000"],
                      r["backoff_rate_x10000"])
        for r in _Q["doc_trigram_backoff_bits"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


# --- part_harmonic_centrality -------------------------------------------------


def test_harmonic_centrality_matches_python_bfs(spark):
    from .test_round13_ops import _copurchase_edges_py

    edges = _copurchase_edges_py(SF_SMALL)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    nodes = {a for a, _ in edges}
    seeds = sorted(n for n in nodes if n % 500 == 0)
    dist: dict[tuple[int, int], int] = {}
    for s in seeds:
        frontier, seen, d = {s}, {s}, 0
        while frontier and d < 3:
            d += 1
            nxt = set()
            for v in frontier:
                nxt |= adj.get(v, set())
            nxt -= seen
            for v in nxt:
                dist[(s, v)] = d
            seen |= nxt
            frontier = nxt
    want: dict[int, tuple[int, int]] = {}
    for (s, v), d in dist.items():
        n, h = want.get(v, (0, 0))
        want[v] = (n + 1, h + 1_000_000 // d)
    got = {
        r["part_key"]: (r["n_sources"], r["harmonic_x1e6"])
        for r in _Q["part_harmonic_centrality"].fn(spark, SF_SMALL).collect()
    }
    assert got == want
    assert got, "seeds must reach at least one node"


# --- embedding_kcenter_coreset ------------------------------------------------


def test_kcenter_matches_python_greedy(spark):
    import duckdb as _dd

    con = _dd.connect()
    rows = con.execute(
        f"""
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0 + 0.5)
                           AS BIGINT))
        FROM '{SF_SMALL}/embeddings.parquet'
        """
    ).fetchall()
    con.close()
    pts = {int(v): tuple(int(x) for x in q) for v, q in rows}
    first = min(pts)
    picks = [(1, first, 0)]
    mind2 = {
        v: sum((a - b) ** 2 for a, b in zip(q, pts[first]))
        for v, q in pts.items()
    }
    from big_data_analysis_diseases_outbreaks_spark.queries.embeddings import (
        _KC_K,
    )

    for step in range(2, _KC_K + 1):
        nxt = max(mind2, key=lambda v: (mind2[v], -v))
        picks.append((step, nxt, mind2[nxt]))
        for v, q in pts.items():
            d2 = sum((a - b) ** 2 for a, b in zip(q, pts[nxt]))
            if d2 < mind2[v]:
                mind2[v] = d2
    got = sorted(
        (r["step"], r["vec_id"], r["radius_d2"])
        for r in _Q["embedding_kcenter_coreset"].fn(spark, SF_SMALL).collect()
    )
    assert got == picks
    # covering radius is non-increasing (greedy k-center invariant)
    radii = [r for _, _, r in picks[1:]]
    assert radii == sorted(radii, reverse=True)


# --- orders_psi_drift ---------------------------------------------------------


def test_psi_drift_total_row_and_shares(spark):
    rows = _Q["orders_psi_drift"].fn(spark, SF_SMALL).collect()
    buckets = [r for r in rows if r["bucket"] >= 0]
    total = [r for r in rows if r["bucket"] == -1]
    assert len(buckets) == 16 and len(total) == 1
    t = total[0]
    for col in ("n_early", "n_late", "p_early_x1e6", "p_late_x1e6",
                "contrib_bits_x1e6"):
        assert t[col] == sum(r[col] for r in buckets), col
    # truncating-div shares sum to <= 1e6 and within 16 ulps of it
    for col in ("p_early_x1e6", "p_late_x1e6"):
        assert 1_000_000 - 16 <= t[col] <= 1_000_000


# --- corpus_chao1_richness ----------------------------------------------------


def _trigram_freqs(words: dict[int, list[str]]) -> dict[str, int]:
    f: dict[str, int] = {}
    for w in words.values():
        for i in range(len(w) - 2):
            t = " ".join(w[i : i + 3])
            f[t] = f.get(t, 0) + 1
    return f


def test_chao1_matches_pure_python(spark):
    f = _trigram_freqs(_doc_words(SF_SMALL))
    v = len(f)
    n = sum(f.values())
    f1 = sum(1 for c in f.values() if c == 1)
    f2 = sum(1 for c in f.values() if c == 2)
    r = _Q["corpus_chao1_richness"].fn(spark, SF_SMALL).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["v_observed"], row["n_ngrams"], row["f1"], row["f2"]) == (
        v, n, f1, f2)
    assert row["chao1_est"] == v + (f1 * (f1 - 1)) / (2 * (f2 + 1))
    assert row["gt_unseen_mass"] == f1 / n
    # Chao1 is a lower-bound ESTIMATE above the observed richness
    assert row["chao1_est"] >= v


# --- corpus_zipf_octave_slope -------------------------------------------------


def test_zipf_octave_slope_matches_pure_python(spark):
    f = _trigram_freqs(_doc_words(SF_SMALL))
    ranked = sorted(f.items(), key=lambda kv: (-kv[1], kv[0]))
    oct_: dict[int, list[int]] = {}
    for rk, (_, c) in enumerate(ranked, start=1):
        oct_.setdefault(rk.bit_length() - 1, []).append(c.bit_length() - 1)
    prof = {
        o: (len(bits), (sum(bits) * 1000) // len(bits))
        for o, bits in oct_.items()
    }
    xs = sorted(prof)
    n = len(xs)
    sx = sum(xs)
    sy = sum(prof[o][1] for o in xs)
    sxx = sum(o * o for o in xs)
    sxy = sum(o * prof[o][1] for o in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rows = _Q["corpus_zipf_octave_slope"].fn(spark, SF_SMALL).collect()
    got = {r["octave"]: (r["n_types"], r["mean_bits_x1000"]) for r in rows}
    assert got == prof
    assert all(r["slope_millibits_per_octave"] == slope for r in rows)
    # a frequency-rank curve must fall: negative slope
    assert slope < 0


# --- token_burstiness_topk ----------------------------------------------------


def test_burstiness_matches_pure_python(spark):
    words = _doc_words(SF_SMALL)
    nd = len(words)
    per: dict[str, dict[int, int]] = {}
    for d, w in words.items():
        for t in w:
            per.setdefault(t, {}).setdefault(d, 0)
            per[t][d] += 1
    stats = {
        t: (sum(cs.values()), len(cs),
            sum(c * c for c in cs.values()))
        for t, cs in per.items()
    }
    top = sorted(stats.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    want = [
        (t, tot, df, ((nd * sq - tot * tot) * 1000) // (nd * tot))
        for t, (tot, df, sq) in top
    ]
    got = [
        (r["token"], r["total"], r["doc_freq"], r["vmr_x1000"])
        for r in _Q["token_burstiness_topk"].fn(spark, SF_SMALL).collect()
    ]
    assert sorted(got) == sorted(want)
    # every VMR is >= the Poisson baseline would allow only if bursty;
    # at minimum the algebraic identity keeps it non-negative minus
    # the -T/D term: VMR >= -1 always; check sane bounds
    assert all(v >= -1000 for _, _, _, v in got)


# --- lineitem_isotonic_calibration --------------------------------------------


def test_isotonic_matches_minimax_replica_and_is_monotone(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT LEAST(9, (CAST(l_quantity AS BIGINT) - 1) // 5) AS b,
               COUNT(*), SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        FROM '{SF_SMALL}/lineitem.parquet' GROUP BY 1
        """
    ).fetchall()
    con.close()
    n = {int(b): int(c) for b, c, _ in rows}
    pos = {int(b): int(p) for b, _, p in rows}
    bs = sorted(n)

    def mean_x(j, k):
        p = sum(pos[i] for i in bs if j <= i <= k)
        t = sum(n[i] for i in bs if j <= i <= k)
        return (p * 1_000_000) // t

    want = {}
    for i in bs:
        want[i] = max(
            min(mean_x(j, k) for k in bs if k >= i)
            for j in bs
            if j <= i
        )
    got = {
        r["bucket"]: r["iso_rate_x1e6"]
        for r in _Q["lineitem_isotonic_calibration"].fn(
            spark, SF_SMALL
        ).collect()
    }
    assert got == want
    fits = [got[b] for b in sorted(got)]
    assert fits == sorted(fits), "isotonic fit must be non-decreasing"


# --- stream_psi_drift ---------------------------------------------------------


def test_stream_psi_drift_exactly_once_and_shape(spark):
    r1 = sorted(
        tuple(r) for r in _Q["stream_psi_drift"].fn(spark, SF_SMALL).collect()
    )
    r2 = sorted(
        tuple(r) for r in _Q["stream_psi_drift"].fn(spark, SF_SMALL).collect()
    )
    assert r1 == r2, "replay must be exactly-once deterministic"
    buckets = [r for r in r1 if r[0] >= 0]
    totals = [r for r in r1 if r[0] == -1]
    assert len(buckets) == 16 and len(totals) == 1
    t = totals[0]
    assert t[1] == sum(r[1] for r in buckets)
    assert t[5] == sum(r[5] for r in buckets)
