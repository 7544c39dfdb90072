"""Targeted unit tests for the round-13 operators (beyond oracle
parity): bounded-distance betweenness vs a pure-Python Brandes
replica, deterministic-KMeans invariants, and BPE trainer parity
against a pure-Python reference trainer.
"""

from __future__ import annotations

import duckdb

from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

from .conftest import SF_SMALL

_Q = all_queries()

_BTW_SCALE = 1_000_000


def _copurchase_edges_py(sf_dir: str) -> set[tuple[int, int]]:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH li AS (
          SELECT l_orderkey, l_partkey
          FROM '{sf_dir}/lineitem.parquet'
          WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01')
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        """
    ).fetchall()
    return {(int(a), int(b)) for a, b in rows}


def _brandes_bounded_py(
    edges: set[tuple[int, int]], seed_mod: int, depth: int
) -> dict[int, int]:
    """Pure-Python replica of the fixed-point bounded-distance Brandes
    accumulation (same truncating integer division, same per-(s,v)
    credit order-independence — integer sums are associative)."""
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    nodes = {a for a, _ in edges}
    seeds = sorted(n for n in nodes if n % seed_mod == 0)
    btw: dict[int, int] = {}
    for s in seeds:
        levels: list[dict[int, int]] = [{s: 1}]  # node -> sigma
        visited = {s}
        for _ in range(depth):
            nxt: dict[int, int] = {}
            for v, sig in levels[-1].items():
                for w in adj.get(v, ()):
                    if w not in visited:
                        nxt[w] = nxt.get(w, 0) + sig
            # anti-join AFTER the full frontier expands (level-sync)
            levels.append(nxt)
            visited |= set(nxt)
        delta: list[dict[int, int]] = [dict() for _ in range(depth + 1)]
        for r in range(depth - 1, 0, -1):
            for v, sig in levels[r].items():
                d = 0
                for w in adj.get(v, ()):
                    if w in levels[r + 1]:
                        d += (
                            sig * (_BTW_SCALE + delta[r + 1].get(w, 0))
                        ) // levels[r + 1][w]
                delta[r][v] = d
        for r in range(1, depth):
            for v in levels[r]:
                btw[v] = btw.get(v, 0) + delta[r].get(v, 0)
        # depth-level nodes carry delta 0 but are still emitted rows
        for v in levels[depth]:
            btw.setdefault(v, 0)
    return btw


def test_betweenness_matches_pure_python_brandes(spark):
    rows = _Q["part_copurchase_betweenness"].fn(spark, SF_SMALL).collect()
    got = {r["part_key"]: r["betweenness_scaled"] for r in rows}
    edges = _copurchase_edges_py(SF_SMALL)
    want = _brandes_bounded_py(edges, seed_mod=500, depth=3)
    # engine emits one row per node reached at levels 1..2 (credit
    # carriers); the replica also tracks level-3 zeros — compare on the
    # engine's support and assert the replica agrees everywhere else
    # is zero-credit
    assert got, "fixture must reach at least one node from the seeds"
    for k, v in got.items():
        assert want.get(k, 0) == v, (k, v, want.get(k))
    for k, v in want.items():
        if k not in got:
            assert v == 0, (k, v)


def test_betweenness_nonnegative_and_seeds_excluded_per_source(spark):
    rows = _Q["part_copurchase_betweenness"].fn(spark, SF_SMALL).collect()
    assert all(r["betweenness_scaled"] >= 0 for r in rows)


# --- BPE trainer parity vs a pure-Python reference trainer ------------------


def _bpe_train_py(word_freq: dict[str, int], rounds: int):
    words = [(list(w), f) for w, f in word_freq.items()]
    out = []
    for step in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # argmax under (count DESC, pair ASC)
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, f"{a} {b}", a + b, n))
        merged = a + b
        nwords = []
        for syms, f in words:
            ns: list[str] = []
            for x in syms:
                if ns and ns[-1] == a and x == b:
                    ns[-1] = merged
                else:
                    ns.append(x)
            nwords.append((ns, f))
        words = nwords
    return out


def test_bpe_train_matches_pure_python_trainer(spark):
    import re

    rows = sorted(
        _Q["bpe_train_merges"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["step"],
    )
    got = [
        (r["step"], r["pair"], r["merged"], r["n_occurrences"]) for r in rows
    ]
    con = duckdb.connect()
    texts = [
        t[0]
        for t in con.execute(
            f"SELECT text FROM '{SF_SMALL}/documents.parquet'"
        ).fetchall()
    ]
    freq: dict[str, int] = {}
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            if len(w) >= 2:
                freq[w] = freq.get(w, 0) + 1
    want = _bpe_train_py(freq, rounds=8)
    assert got == want
    # merges must be sequential: later rounds may merge MERGED symbols
    assert len(got) == 8


# --- deterministic Lloyd parity vs pure-Python replica -----------------------


def _tdiv(s: int, n: int) -> int:
    q = abs(s) // n
    return q if s >= 0 else -q


def _lloyd_py(vecs: list[tuple[int, list[int]]], k: int, rounds: int):
    """(vec_id, quantized) → centroids after `rounds` truncating-div
    updates; init = k smallest vec_ids. Returns (cents, assignment)."""
    vecs = sorted(vecs)
    cents = {j: list(v) for j, (_, v) in enumerate(vecs[:k])}
    asg: dict[int, int] = {}
    for _ in range(rounds):
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for vid, x in vecs:
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(x, c)), j)
                for j, c in cents.items()
            )[1]
            asg[vid] = best
            if best not in sums:
                sums[best] = [0] * len(x)
                counts[best] = 0
            counts[best] += 1
            for d, a in enumerate(x):
                sums[best][d] += a
        cents = {
            j: [_tdiv(s, counts[j]) for s in sums[j]] for j in sums
        }
    return cents, asg


def _quant_vecs(sf_dir: str) -> list[tuple[int, list[int]]]:
    import math

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    return [
        (int(vid), [int(math.floor(float(x) * 1000.0 + 0.5)) for x in emb])
        for vid, emb in rows
    ]


def test_kmeans_track_matches_pure_python_lloyd(spark):
    rows = _Q["kmeans_track_deterministic"].fn(spark, SF_SMALL).collect()
    got = {
        (r["cluster"], r["dim"]): (r["centroid_q"], r["n_points"])
        for r in rows
    }
    cents, asg = _lloyd_py(_quant_vecs(SF_SMALL), k=4, rounds=4)
    counts: dict[int, int] = {}
    for c in asg.values():
        counts[c] = counts.get(c, 0) + 1
    want = {
        (j, d): (c[d], counts[j])
        for j, c in cents.items()
        for d in range(len(c))
    }
    assert got == want


def test_kmeans_inertia_profile_invariants(spark):
    rows = {
        r["k"]: r
        for r in _Q["kmeans_inertia_profile"].fn(spark, SF_SMALL).collect()
    }
    assert sorted(rows) == [2, 3, 4, 5]
    for k, r in rows.items():
        assert 1 <= r["n_clusters"] <= k
        assert r["inertia"] >= 0
    # more clusters with the same init prefix should not increase
    # inertia dramatically; pin weak monotonic trend start-to-end
    assert rows[5]["inertia"] <= rows[2]["inertia"]


# --- Luby MIS invariants ------------------------------------------------------


def test_mis_independent_and_maximal_on_decided_subgraph(spark):
    rows = _Q["part_copurchase_mis"].fn(spark, SF_SMALL).collect()
    sel = {r["part_key"] for r in rows}
    assert sel, "MIS must select at least one node on the fixture"
    edges = _copurchase_edges_py(SF_SMALL)
    nodes = {a for a, _ in edges}
    # independence: no edge inside the selected set
    for a, b in edges:
        assert not (a in sel and b in sel), (a, b)
    # maximality on the decided subgraph: every node NOT selected and
    # not still active after the bounded rounds has a selected
    # neighbor. Decided = selected ∪ killed = nodes with a selected
    # neighbor; so equivalently every node is selected, has a selected
    # neighbor, or was still active (undecided) — recompute undecided
    # via the same bounded replay to pin the partition.
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    undecided = set(nodes)
    for r in (1, 2, 3):
        pr = {
            v: ((v * 1103515245 + 12345 * r) % 2147483647) * 10**9 + v
            for v in undecided
        }
        s = {
            v
            for v in undecided
            if all(
                pr[v] < pr[u] for u in adj[v] if u in undecided
            )
        }
        assert s <= sel
        undecided -= s | {u for v in s for u in adj[v]}
    for v in nodes:
        if v in sel or v in undecided:
            continue
        assert any(u in sel for u in adj[v]), v


# --- tokenizer application consistency ---------------------------------------


def test_bpe_apply_matches_pure_python_segmentation(spark):
    import re

    rows = _Q["bpe_apply_vocab"].fn(spark, SF_SMALL).collect()
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_chars"],
            r["n_bpe"],
            r["tok_per_word_x10000"],
        )
        for r in rows
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    freq: dict[str, int] = {}
    for _, t in docs:
        for w in re.findall(r"[a-z]+", t.lower()):
            if len(w) >= 2:
                freq[w] = freq.get(w, 0) + 1
    merges = _bpe_train_py(freq, rounds=8)

    def seg_len(word: str) -> int:
        syms = list(word)
        for _, pair, merged, _ in merges:
            a, b = pair.split(" ")
            ns: list[str] = []
            for x in syms:
                if ns and ns[-1] == a and x == b:
                    ns[-1] = merged
                else:
                    ns.append(x)
            syms = ns
        return len(syms)

    cache: dict[str, int] = {}
    want = {}
    for did, t in docs:
        ws = re.findall(r"[a-z]+", t.lower())
        if not ws:
            continue
        nb = 0
        for w in ws:
            if w not in cache:
                cache[w] = seg_len(w) if len(w) >= 2 else 1
            nb += cache[w]
        nw = len(ws)
        want[did] = (nw, sum(len(w) for w in ws), nb, nb * 10000 // nw)
    assert got == want


# --- deterministic weighted priority sample -----------------------------------


def test_weighted_priority_sample_matches_replica(spark):
    import re

    rows = _Q["doc_weighted_priority_sample"].fn(spark, SF_SMALL).collect()
    got = [(r["rank"], r["doc_id"], r["weight"]) for r in rows]
    got.sort()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    pri = []
    for did, t in docs:
        w = len(re.findall(r"\S+", t))
        if w > 0:
            u = (did * 2654435761) % 2147483647 + 1
            pri.append((-(w / u), did, w))
    pri.sort()
    want = [(i + 1, did, w) for i, (_, did, w) in enumerate(pri[:50])]
    assert got == want


# --- PQ training parity vs pure-Python per-subspace Lloyd --------------------


def test_pq_train_codes_matches_pure_python(spark):
    rows = _Q["pq_train_codes"].fn(spark, SF_SMALL).collect()
    got = {(r["vec_id"], r["subspace"]): (r["code"], r["err_q"]) for r in rows}
    vecs = _quant_vecs(SF_SMALL)
    want = {}
    for s in range(8):
        sub = [(vid, v[8 * s : 8 * s + 8]) for vid, v in vecs]
        cents, asg = _lloyd_py(sub, k=4, rounds=2)
        for vid, x in sub:
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(x, c)), j)
                for j, c in cents.items()
            )
            want[(vid, s)] = (best[1], best[0])
    assert got == want


# --- conformal interval guarantee --------------------------------------------


def test_conformal_coverage_holds(spark):
    rows = _Q["orders_conformal_interval"].fn(spark, SF_SMALL).collect()
    assert rows
    # split-conformal guarantees coverage ≥ 1−α in EXPECTATION over the
    # calibration draw; a single draw's coverage is Beta-distributed
    # with sd ≈ sqrt(α(1−α)/n_cal) ≈ 2.4pp at the fixture's n_cal≈160 —
    # allow ~3σ per group and ~1.5σ on the across-group mean.
    for r in rows:
        assert r["coverage_x10000"] >= 8300, r
        assert r["coverage_x10000"] <= 10000
        assert r["q_cents"] >= 0 and r["n_test"] > 0 and r["n_cal"] > 0
    mean_cov = sum(r["coverage_x10000"] for r in rows) / len(rows)
    assert mean_cov >= 8800, mean_cov


# --- Apriori frequent triples vs brute force ----------------------------------


def test_frequent_triples_match_brute_force(spark):
    from itertools import combinations

    rows = _Q["part_frequent_triples"].fn(spark, SF_SMALL).collect()
    got = {(r["p1"], r["p2"], r["p3"]): r["support"] for r in rows}
    con = duckdb.connect()
    baskets = con.execute(
        f"""
        SELECT o.o_custkey, list(DISTINCT l.l_partkey)
        FROM '{SF_SMALL}/lineitem.parquet' l
        JOIN '{SF_SMALL}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        WHERE CAST(l.l_shipdate AS DATE) >= DATE '1998-01-01'
        GROUP BY 1"""
    ).fetchall()
    tri: dict[tuple[int, int, int], int] = {}
    pair: dict[tuple[int, int], int] = {}
    for _, ps in baskets:
        ps = sorted(set(int(p) for p in ps))
        for c in combinations(ps, 2):
            pair[c] = pair.get(c, 0) + 1
        for c in combinations(ps, 3):
            tri[c] = tri.get(c, 0) + 1
    want = {
        t: s
        for t, s in tri.items()
        if s >= 2
        and pair[(t[0], t[1])] >= 2
        and pair[(t[0], t[2])] >= 2
        and pair[(t[1], t[2])] >= 2
    }
    # the Apriori prune is lossless at these thresholds: support≥2 for
    # the triple implies support≥2 for every sub-pair — so the pruned
    # result must equal the UNPRUNED frequent triples too
    assert want == {t: s for t, s in tri.items() if s >= 2}
    assert got == want


# --- OLS trend identities ------------------------------------------------------


def test_ols_trend_identities(spark):
    rows = _Q["brand_ols_trend"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r["slope_den"] != 0:
            num, den = r["slope_num"], r["slope_den"]
            q = abs(num * 10000) // den
            want = q if num >= 0 else -q
            assert r["slope_cents_per_month_x10000"] == want, r
        assert r["slope_den"] >= 0  # n*Σx² − (Σx)² ≥ 0 (Cauchy-Schwarz)
        assert r["n"] >= 1


# --- deterministic walks vs pure-Python replica --------------------------------


def test_walks_match_pure_python_replica(spark):
    rows = _Q["part_copurchase_walks"].fn(spark, SF_SMALL).collect()
    got = {(r["seed"], r["step"]): r["node"] for r in rows}
    edges = _copurchase_edges_py(SF_SMALL)
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    seeds = sorted({a for a, _ in edges if a % 500 == 0})
    want = {}
    for s in seeds:
        cur = s
        want[(s, 0)] = s
        for t in range(1, 5):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(
                nbrs,
                key=lambda v: (
                    (cur * 48271 + v * 69621 + t * 12345) % 2147483647,
                    v,
                ),
            )
            want[(s, t)] = cur
    assert got == want
    # every consecutive hop is a real edge
    for (s, t), v in got.items():
        if t >= 1:
            assert (got[(s, t - 1)], v) in edges


# --- Theil-Sen slope vs pure-Python replica -----------------------------------


def test_theil_sen_matches_replica(spark):
    rows = _Q["brand_theil_sen"].fn(spark, SF_SMALL).collect()
    got = {r["brand"]: (r["n_pairs"], r["theil_sen_slope"]) for r in rows}
    con = duckdb.connect()
    bm = con.execute(
        f"""
        SELECT p.p_brand,
               CAST(DATE_DIFF('month', DATE '1995-01-01',
                              CAST(l.l_shipdate AS DATE)) AS BIGINT),
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
        FROM '{SF_SMALL}/lineitem.parquet' l
        JOIN '{SF_SMALL}/part.parquet' p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2"""
    ).fetchall()
    series: dict[str, list[tuple[int, int]]] = {}
    for b, x, y in bm:
        series.setdefault(b, []).append((int(x), int(y)))
    want = {}
    for b, pts in series.items():
        pts.sort()
        slopes = sorted(
            ((yj - yi) / (xj - xi), xi, xj)
            for i, (xi, yi) in enumerate(pts)
            for xj, yj in pts[i + 1 :]
        )
        n = len(slopes)
        med = (
            slopes[(n - 1) // 2][0]
            if n % 2
            else (slopes[n // 2 - 1][0] + slopes[n // 2][0]) / 2.0
        )
        want[b] = (n, med)
    assert set(got) == set(want)
    for b in got:
        assert got[b][0] == want[b][0], b
        assert abs(got[b][1] - want[b][1]) < 1e-9, (b, got[b], want[b])


# --- streaming conformal store ≡ batch ----------------------------------------


def test_stream_conformal_equals_batch(spark):
    a = sorted(
        tuple(r)
        for r in _Q["orders_conformal_interval"].fn(spark, SF_SMALL).collect()
    )
    b = sorted(
        tuple(r)
        for r in _Q["stream_conformal_calibration"]
        .fn(spark, SF_SMALL)
        .collect()
    )
    assert a == b and a


# --- temporal reachability vs pure-Python earliest-arrival ---------------------


def test_temporal_reachability_matches_replica(spark):
    rows = _Q["part_temporal_reachability"].fn(spark, SF_SMALL).collect()
    got = {r["part_key"]: r["earliest_arrival_day"] for r in rows}
    con = duckdb.connect()
    ev = con.execute(
        f"""
        WITH li AS (
          SELECT l.l_orderkey, l.l_partkey,
                 CAST(CAST(o.o_orderdate AS DATE) - DATE '1995-01-01'
                      AS BIGINT) AS t
          FROM '{SF_SMALL}/lineitem.parquet' l
          JOIN '{SF_SMALL}/orders.parquet' o
            ON l.l_orderkey = o.o_orderkey
          WHERE CAST(l.l_shipdate AS DATE) >= DATE '1998-01-01')
        SELECT DISTINCT a.l_partkey, b.l_partkey, a.t
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"""
    ).fetchall()
    out: dict[int, list[tuple[int, int]]] = {}
    nodes = set()
    for s, d, t in ev:
        out.setdefault(int(s), []).append((int(d), int(t)))
        nodes.add(int(s))
    arr = {n: 0 for n in nodes if n % 500 == 0}
    for _ in range(3):
        nxt = dict(arr)
        for u, a in arr.items():
            for v, t in out.get(u, ()):
                if t >= a and (v not in nxt or t < nxt[v]):
                    nxt[v] = t
        arr = nxt
    assert got == arr
    # a time-respecting path is also a static path: temporal reach is a
    # subset of 3-hop static reach
    static = {
        r["part_key"]
        for r in _Q["part_copurchase_khop"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) <= static


# --- deterministic SemDeDup planted recall --------------------------------------


def test_semdedup_deterministic_planted_recall(spark):
    rows = _Q["dedup_semdedup_deterministic"].fn(spark, SF_SMALL).collect()
    pairs = {(r["v1"], r["v2"]) for r in rows}
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{SF_SMALL}/embeddings.parquet'"
    ).fetchone()[0]
    # the only cosine-0.95+ pairs are the planted (v, v+100000) twins
    # (max genuine cosine on the fixture is ~0.51)
    assert all(v2 == v1 + 100_000 for v1, v2 in pairs), sorted(pairs)[:5]
    # cell-blocked recall: a twin pair is missed only when the two
    # copies straddle a cell boundary — allow 2%
    assert len(pairs) >= 0.98 * n, (len(pairs), n)


# --- exact quantile selection invariants ----------------------------------------


def test_exact_quantile_select_matches_sorted_ranks(spark):
    rows = {
        r["quantile"]: r
        for r in _Q["lineitem_exact_quantile_select"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    con = duckdb.connect()
    cents = [
        c[0]
        for c in con.execute(
            f"SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
            f" FROM '{SF_SMALL}/lineitem.parquet' ORDER BY 1"
        ).fetchall()
    ]
    n = len(cents)
    for num, den in ((25, 100), (50, 100), (75, 100), (99, 100)):
        r = rows[f"{num}/{den}"]
        k = max(1, -(-num * n // den))
        assert r["n"] == n and r["rank_k"] == k
        assert r["value_cents"] == cents[k - 1], (num, r, cents[k - 1])
    vals = [rows[q]["value_cents"] for q in ("25/100", "50/100", "75/100", "99/100")]
    assert vals == sorted(vals)


# --- RFM k-means invariants ------------------------------------------------------


def test_rfm_kmeans_partitions_all_customers(spark):
    rows = _Q["customer_rfm_kmeans"].fn(spark, SF_SMALL).collect()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{SF_SMALL}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == n
    assert 1 <= len(rows) <= 4
    for r in rows:
        for c in ("r_centroid", "f_centroid", "m_centroid"):
            assert 1 <= r[c] <= 5, r


# --- snapshot changelog completeness ----------------------------------------------


def test_snapshot_changelog_round_trips(spark):
    """Applying the changelog to the base must reproduce the next
    version exactly — the CDF contract."""
    from pyspark.sql import functions as F

    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    log = _Q["orders_snapshot_changelog"].fn(spark, SF_SMALL)
    rows = log.collect()
    kinds = {r["change_type"] for r in rows}
    assert kinds == {"insert", "update", "delete"}
    base = {
        r["k"]: r["cents"]
        for r in load_table(spark, SF_SMALL, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    }
    applied = dict(base)
    for r in rows:
        if r["change_type"] == "delete":
            del applied[r["o_orderkey"]]
        elif r["change_type"] == "insert":
            assert r["o_orderkey"] not in applied
            applied[r["o_orderkey"]] = r["new_cents"]
        else:
            assert applied[r["o_orderkey"]] == r["old_cents"]
            applied[r["o_orderkey"]] = r["new_cents"]
    # rebuild nxt independently and compare
    nxt = {}
    for k, cents in base.items():
        if k % 64 == 17 and (k // 64) % 5 == 0:
            continue
        nxt[k] = cents + (1 if k % 64 == 3 else 0)
    # Insert offset = MAX(o_orderkey) + 1, mirroring the query's
    # data-derived offset (planted insert keys can never collide with
    # genuine base keys at any scale — the r13 ADVICE fix).
    offset = max(base) + 1
    for k, cents in base.items():
        if k % 64 == 7 and (k // 64) % 997 == 0:
            nxt[k + offset] = cents
    assert applied == nxt


# --- percolation profile vs union-find replica --------------------------------


def test_percolation_profile_matches_union_find(spark):
    rows = {
        r["weight_threshold"]: (
            r["n_nodes"],
            r["n_components"],
            r["largest_component"],
        )
        for r in _Q["part_copurchase_percolation"].fn(spark, SF_SMALL).collect()
    }
    con = duckdb.connect()
    we = con.execute(
        f"""
        WITH li AS (
          SELECT l_orderkey, l_partkey FROM '{SF_SMALL}/lineitem.parquet'
          WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01')
        SELECT a.l_partkey, b.l_partkey, COUNT(*)
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2"""
    ).fetchall()
    for th in (2, 3, 4):
        parent: dict[int, int] = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v, w in we:
            if w >= th:
                u, v = int(u), int(v)
                parent.setdefault(u, u)
                parent.setdefault(v, v)
                ru, rv = find(u), find(v)
                if ru != rv:
                    parent[ru] = rv
        comps: dict[int, int] = {}
        for x in parent:
            comps[find(x)] = comps.get(find(x), 0) + 1
        want = (
            len(parent),
            len(comps),
            max(comps.values()) if comps else 0,
        )
        assert rows[th] == want, (th, rows[th], want)
    # monotone collapse: raising the threshold never grows the graph
    assert rows[2][0] >= rows[3][0] >= rows[4][0]
