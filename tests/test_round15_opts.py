"""Round-15 optimization internals: ER blocked pair generation (skew
cap), chunked MinHash signature pass, and the counted (lazy-checkpoint)
truncator. Each test pins an optimization-changed internal against a
pure-Python reference."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.checkpointing import (
    counted_truncator,
    truncator,
)
from big_data_analysis_diseases_outbreaks_spark.queries import text as text_q
from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
    _ER_BLOCK,
    _er_candidate_pairs,
)


# --- ER blocked in-bucket pair generation --------------------------------


def _pairs_of(df) -> set[tuple[int, int]]:
    rows = df.select("p.u", "p.v", "p.an", "p.bn").collect()
    out = set()
    for r in rows:
        assert r.u < r.v, f"pair not ordered: {r}"
        out.add((r.u, r.v, r.an, r.bn))
    return out


def test_er_blocked_pairs_hot_bucket_complete(spark):
    """A bucket bigger than _ER_BLOCK splits into blocks; the union of
    in-block and cross-block pairs must be EXACTLY the full unordered
    pair set of the bucket (every pair once, u < v, names attached to
    the right side)."""
    n_hot = 2 * _ER_BLOCK + 17  # 145 members -> nb = 3: cross path live
    rows = [(i, 7, f"name_{i}") for i in range(1, n_hot + 1)]
    # a second, small bucket and a singleton for the nb == 1 path
    rows += [(201, 9, "abc"), (202, 9, "abd"), (203, 11, "zzz")]
    keyed = spark.createDataFrame(
        rows, "c_custkey long, key long, name string"
    )
    got = _pairs_of(_er_candidate_pairs(keyed))
    want = set()
    for key, members in [(7, rows[:n_hot]), (9, rows[n_hot : n_hot + 2])]:
        for (u, _, un), (v, _, vn) in itertools.combinations(
            sorted(members), 2
        ):
            want.add((u, v, un, vn))
    assert got == want  # singleton key 11 contributes nothing


def test_er_blocked_pairs_no_row_exceeds_block_cap(spark):
    """No collect_list row holds more than ~_ER_BLOCK members: with a
    hot bucket of 4x the cap, every block row stays O(cap) (hash
    spread), i.e. the unbounded-row skew hazard is gone."""
    n_hot = 4 * _ER_BLOCK
    keyed = spark.createDataFrame(
        [(i, 1, f"n{i}") for i in range(n_hot)],
        "c_custkey long, key long, name string",
    )
    wkey = Window.partitionBy("key")
    blocks = (
        keyed.withColumn("n", F.count(F.lit(1)).over(wkey))
        .withColumn(
            "nb",
            F.expr(f"CAST((n + {_ER_BLOCK} - 1) DIV {_ER_BLOCK} AS INT)"),
        )
        .withColumn(
            "b", F.pmod(F.xxhash64("c_custkey"), F.col("nb")).cast("int")
        )
        .groupBy("key", "b")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    sizes = [r.sz for r in blocks.collect()]
    assert len(sizes) == 4  # nb = ceil(256/64) = 4 blocks
    assert sum(sizes) == n_hot
    # hash split is uneven but each block must stay O(cap), far below n
    assert max(sizes) < 2 * _ER_BLOCK


# --- chunked MinHash signature pass ---------------------------------------


def _mhl_batches(pdfs):
    return list(text_q._mhl_sig_bands_batches(iter(pdfs)))


def test_mhl_sig_chunking_invariance(monkeypatch):
    """Doc-chunking and permutation-grouping are pure memory bounds:
    forcing tiny chunk sizes must reproduce the unchunked signatures
    bit-for-bit."""
    rng = np.random.default_rng(7)
    gh = [
        rng.integers(0, text_q.RH_MOD, size=int(k)).astype("int64").tolist()
        for k in rng.integers(1, 40, size=57)
    ]
    pdf = pd.DataFrame({"doc_id": np.arange(57, dtype="int64"), "gh": gh})
    base = _mhl_batches([pdf.copy()])[0]
    monkeypatch.setattr(text_q, "_MHL_GRAM_CHUNK", 13)
    monkeypatch.setattr(text_q, "_MHL_PGRP", 3)
    chunked = _mhl_batches([pdf.copy()])[0]
    pd.testing.assert_frame_equal(base, chunked)


def test_mhl_sig_empty_gram_raises():
    pdf = pd.DataFrame({"doc_id": [1, 2], "gh": [[3, 4], []]})
    with pytest.raises(ValueError, match="empty gram array"):
        _mhl_batches([pdf])


# --- counted (lazy local-checkpoint) truncator ----------------------------


def test_counted_truncator_matches_eager(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("v")
    )
    agg = df.groupBy("k").agg(F.sum("v").alias("s"))
    lazy = counted_truncator(df, None)(agg)
    # the count IS the materializing action; reuse must read blocks
    assert lazy.count() == 37
    eager = truncator(df, None)(agg)
    assert sorted(map(tuple, lazy.collect())) == sorted(
        map(tuple, eager.collect())
    )


# --- contraction connected components -------------------------------------


def test_components_long_chain_contracts_to_exact_fixpoint(spark):
    """A 400-hop path graph needs ~200 propagate double-steps — far past
    any per-level budget — so it exercises the contraction levels; the
    result must be the exact fixpoint (every node labelled 0), which the
    pre-r15 truncated loop got wrong on graphs like this."""
    from big_data_analysis_diseases_outbreaks_spark.operators.components import (
        connected_components,
    )

    n = 400
    chain = [(i, i + 1) for i in range(n)]
    # a second component and a self-loop singleton, shuffled in
    chain += [(1000, 1001), (1001, 1002), (2000, 2000)]
    g = spark.createDataFrame(chain, "src long, dst long")
    got = {r.node: r.label for r in connected_components(g).collect()}
    want = {i: 0 for i in range(n + 1)}
    want.update({1000: 1000, 1001: 1000, 1002: 1000, 2000: 2000})
    assert got == want


def test_components_random_graph_matches_union_find(spark):
    """Deterministic pseudo-random sparse graph (mix of blobs and
    chains) vs a pure-Python union-find."""
    from big_data_analysis_diseases_outbreaks_spark.operators.components import (
        connected_components,
    )

    rnd = __import__("random").Random(42)
    edges = [(rnd.randrange(500), rnd.randrange(500)) for _ in range(300)]
    edges += [(i + 600, i + 601) for i in range(80)]  # one long chain
    g = spark.createDataFrame(edges, "src long, dst long")
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for a, b in edges:
        for v in (a, b):
            want[v] = find(v)
    got = {r.node: r.label for r in connected_components(g).collect()}
    assert got == want
