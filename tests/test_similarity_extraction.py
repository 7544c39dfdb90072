"""Round-7: edge Jaccard (per-edge triangles), multimodal exact dedup,
RAKE word statistics — pure-Python parity on the sf0.001 fixture."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.queries.multimodal import (
    multimodal_exact_dedup,
)
from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
    copurchase_edges,
    part_edge_jaccard,
)
from big_data_analysis_diseases_outbreaks_spark.queries.text import (
    _RAKE_STOPWORDS,
    doc_rake_word_stats,
    tokens,
)
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_edge_jaccard_matches_bruteforce(spark):
    nbrs: dict[int, set[int]] = defaultdict(set)
    edges = set()
    for r in copurchase_edges(spark, SF_SMALL).collect():
        u, v = sorted((r["src"], r["dst"]))
        edges.add((u, v))
        nbrs[u].add(v)
        nbrs[v].add(u)
    got = {
        (r["u"], r["v"]): r for r in part_edge_jaccard(spark, SF_SMALL).collect()
    }
    n_checked = 0
    for u, v in edges:
        common = nbrs[u] & nbrs[v]
        union = (nbrs[u] | nbrs[v]) - {u, v}
        if not union:
            assert (u, v) not in got
            continue
        r = got[(u, v)]
        assert (r["n_common"], r["deg_u"], r["deg_v"]) == (
            len(common),
            len(nbrs[u]),
            len(nbrs[v]),
        )
        assert r["jaccard"] == len(common) / len(union)
        n_checked += 1
    assert n_checked == len(got) > 0
    assert any(r["n_common"] > 0 for r in got.values())


def test_multimodal_exact_dedup_matches_python(spark):
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents").collect()
    }
    by_hash: dict[str, list[int]] = defaultdict(list)
    for doc, text in texts.items():
        by_hash[hashlib.md5(text.encode()).hexdigest()].append(doc)
    got = {r["payload_md5"]: r for r in multimodal_exact_dedup(spark, SF_SMALL).collect()}
    assert set(got) == set(by_hash)
    for h, docs in by_hash.items():
        r = got[h]
        assert (r["n_copies"], r["canonical_doc_id"], r["is_dup"]) == (
            len(docs),
            min(docs),
            int(len(docs) > 1),
        )


def test_rake_matches_python(spark):
    stops = set(_RAKE_STOPWORDS.split(","))
    toks = {
        r["doc_id"]: r["ts"]
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", tokens(F.lower(F.col("text"))).alias("ts"))
        .collect()
    }
    want: dict[tuple, tuple] = {}
    for doc, ts in toks.items():
        phrases: list[list[str]] = [[]]
        for t in ts:
            if t in stops:
                phrases.append([])
            else:
                phrases[-1].append(t)
        freq: Counter = Counter()
        degree: Counter = Counter()
        for ph in phrases:
            for w in ph:
                freq[w] += 1
                degree[w] += len(ph)
        for w in freq:
            want[(doc, w)] = (freq[w], degree[w])
    got = doc_rake_word_stats(spark, SF_SMALL).collect()
    assert {(r["doc_id"], r["word"]) for r in got} == set(want)
    for r in got:
        f, d = want[(r["doc_id"], r["word"])]
        assert (r["freq"], r["degree"]) == (f, d)
        assert r["rake_score"] == d / f


def test_node_similarity_matches_bruteforce(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        _NODE_SIM_T,
        part_node_similarity,
    )

    nbrs: dict[int, set[int]] = defaultdict(set)
    for r in copurchase_edges(spark, SF_SMALL).collect():
        u, v = sorted((r["src"], r["dst"]))
        nbrs[u].add(v)
        nbrs[v].add(u)
    nodes = sorted(nbrs)
    want = {}
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            inter = len(nbrs[u] & nbrs[v])
            union = len(nbrs[u] | nbrs[v])
            if union and inter >= _NODE_SIM_T * union:
                want[(u, v)] = (inter, union)
    got = {
        (r["u"], r["v"]): (r["n_common"], r["n_union"])
        for r in part_node_similarity(spark, SF_SMALL).collect()
    }
    assert got == want


def test_banded_blocking_catches_boundary_pairs(spark, tmp_path):
    """Pairs whose amounts straddle a band boundary (same tolerance,
    different floor(c/W)) must still match — the ±1 probe bands are the
    part a fixture without boundary pairs never exercises."""
    import datetime

    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        _DUP_INVOICE_TOL_CENTS as W,
        orders_duplicate_invoices,
    )

    d0 = datetime.date(2024, 1, 10)
    rows = [
        # straddles the band edge: cents W-1 vs W+1 (diff 2 <= W)
        (1, 7, (W - 1) / 100.0, d0),
        (2, 7, (W + 1) / 100.0, d0 + datetime.timedelta(days=5)),
        # same band, inside tolerance
        (3, 8, 5 * W / 100.0 + 1.0, d0),
        (4, 8, 5 * W / 100.0 + 2.0, d0 + datetime.timedelta(days=2)),
        # outside tolerance (diff > W) — must NOT match
        (5, 9, 10 * W / 100.0, d0),
        (6, 9, 12 * W / 100.0, d0),
        # inside tolerance but too far apart in time
        (7, 10, 42.0, d0),
        (8, 10, 42.0, d0 + datetime.timedelta(days=300)),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, o_orderdate DATE"
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/orders.parquet")
    got = {
        (r["orderkey_1"], r["orderkey_2"])
        for r in orders_duplicate_invoices(spark, sf).collect()
    }
    assert got == {(1, 2), (3, 4)}
