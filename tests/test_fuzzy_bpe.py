"""Blocked fuzzy join completeness + BPE pair counts vs pure-Python
references (SURVEY.md §5 strategy: optimized plans proven against the
naive spec)."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
    fuzzy_name_pairs,
)
from big_data_analysis_diseases_outbreaks_spark.queries.text import (
    _BPE_TOPN,
    bpe_top_merges,
)
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL


def _lev1(a: str, b: str) -> bool:
    """Levenshtein(a, b) <= 1 without the full DP table."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a with one insertion
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def test_fuzzy_blocking_finds_every_quadratic_pair(spark):
    """The deletion-neighborhood plan must recover EXACTLY the naive
    all-pairs result — blocking is an optimization, never a recall
    loss (the FastSS distance-1 completeness guarantee)."""
    names = [
        r["c_name"]
        for r in load_table(spark, SF_SMALL, "customer")
        .select("c_name")
        .collect()
    ]
    want = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _lev1(*sorted((a, b)))
    }
    want = {tuple(sorted(p)) for p in want}
    got = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_name_pairs(spark, SF_SMALL).collect()
    }
    assert got == want


def test_fuzzy_blocking_catches_insert_delete_pairs(spark, tmp_path):
    """Distance-1 includes insertions/deletions, not just
    substitutions — exercised via a synthetic table since customer
    names are all same-length."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "c_name": [
                "alpha",   # vs alpa (deletion), alphas (insertion)
                "alpa",
                "alphas",
                "beta",    # vs bela (substitution)
                "bela",
                "gamma",   # isolated
            ]
        }
    )
    d = str(tmp_path / "fuzzy")
    spark.createDataFrame(df).write.parquet(d + "/customer.parquet")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_name_pairs(spark, d).collect()
    }
    assert got == {
        ("alpa", "alpha", 1),
        ("alpha", "alphas", 1),
        ("bela", "beta", 1),
    }


def test_bpe_counts_match_python_reference(spark):
    docs = [
        r["text"]
        for r in load_table(spark, SF_SMALL, "documents")
        .select("text")
        .collect()
    ]
    counts: Counter[str] = Counter()
    for t in docs:
        for w in re.findall(r"[a-z]+", t.lower()):
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    counts[w[i : i + 2]] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_TOPN]
    got = [
        (r["pair"], r["n_occurrences"])
        for r in bpe_top_merges(spark, SF_SMALL)
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .collect()
    ]
    assert got == want

def test_bpe_train_survives_collapsed_two_letter_word(spark, tmp_path):
    """ADVICE r13 (medium): once a 2-letter word merges to ONE symbol,
    the next round's pair explode used to hit Spark's descending
    sequence(1, 0) and throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT.  The
    fix (filter size(syms) >= 2 before the explode) must be
    bit-identical to the pure-Python trainer, which simply emits no
    pairs for single-symbol words."""
    import pandas as pd

    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        _bpe_train_loop,
        _bpe_vocab,
    )

    from .test_round13_ops import _bpe_train_py

    texts = ["in in in in in in on on at at we go up"] * 3
    df = pd.DataFrame({"doc_id": list(range(3)), "text": texts})
    d = str(tmp_path / "bpe_collapse")
    spark.createDataFrame(df).write.parquet(d + "/documents.parquet")

    # Round 1 merges (i, n) -> "in" collapses to a single symbol;
    # rounds 2-4 must keep running on the remaining words.
    picks, wf = _bpe_train_loop(_bpe_vocab(spark, d), 4, apply_last=True)
    freq = {"in": 18, "on": 6, "at": 6, "we": 3, "go": 3, "up": 3}
    assert picks == _bpe_train_py(freq, rounds=4)
    assert picks[0][2] == "in"
    # The collapsed word survives in the applied table as one symbol.
    rows = {r["word"]: r["syms"] for r in wf.collect()}
    assert rows["in"] == ["in"]
