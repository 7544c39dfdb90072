"""Dedup-operator tests: MinHash-LSH recall vs exact Jaccard, exact-dedup
completeness, SimHash locality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.dedup import (
    exact_dedup,
    exact_jaccard_pairs,
    verified_near_duplicates,
)
from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL


def _docs_with_near_dups(spark):
    """Each doc + a copy with the last ~20% of words dropped (true
    Jaccard well above 0.5 for 3-gram shingles)."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), r"\s+")
    truncated = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(toks, F.lit(1), F.greatest((F.size(toks) * 0.8).cast("int"), F.lit(3))),
        ).alias("text"),
    )
    return docs.unionByName(truncated)


def test_exact_dedup_finds_all_copies(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    result = exact_dedup(doubled)
    assert result.count() == docs.count()
    assert result.where(F.col("n_copies") != 2).count() == 0
    # canonical id is always the original (min) id
    assert result.where(F.col("canonical_doc_id") >= 1_000_000).count() == 0


def test_minhash_recall_against_exact(spark):
    corpus = _docs_with_near_dups(spark)
    found = verified_near_duplicates(corpus, min_jaccard=0.5)
    found_pairs = {
        (r["doc_id_1"], r["doc_id_2"]) for r in found.collect()
    }
    # ground truth: the constructed (doc, doc+1M) pairs with true
    # 3-gram Jaccard >= 0.5 (single bucket: all docs share one)
    truth = exact_jaccard_pairs(
        corpus.withColumn("b", F.lit(1)), bucket_cols=("b",), min_jaccard=0.5
    )
    truth_pairs = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in truth.collect()
        if r["doc_id_2"] == r["doc_id_1"] + 1_000_000
    }
    assert truth_pairs, "fixture must contain true near-duplicates"
    recall = len(found_pairs & truth_pairs) / len(truth_pairs)
    assert recall >= 0.8, f"MinHash-LSH recall too low: {recall:.2f}"
    # verification step guarantees precision: every reported pair really
    # has Jaccard >= 0.5 (checked against the exact operator)
    all_exact = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in exact_jaccard_pairs(
            corpus.withColumn("b", F.lit(1)), bucket_cols=("b",), min_jaccard=0.5
        ).collect()
    }
    assert found_pairs <= all_exact


def test_simhash_locality(spark):
    """Near-duplicate docs must have closer SimHashes (hamming) than
    unrelated docs on average."""
    qs = all_queries()
    sig = qs["simhash_buckets"].fn(spark, SF_SMALL)
    # join signatures of original vs truncated-copy corpus not available
    # here; instead check bucket structure is non-trivial:
    n = sig.count()
    buckets = sig.select("bucket").distinct().count()
    assert 1 < buckets <= n


def test_block_decomposed_pairs_equal_plain(spark):
    """Triangle-block decomposition must produce exactly the plain
    bucket-join pair set (each unordered pair meets in one cell)."""
    docs = load_table(spark, SF_SMALL, "documents")
    plain = exact_jaccard_pairs(docs, min_jaccard=0.05, n_blocks=1)
    blocked = exact_jaccard_pairs(docs, min_jaccard=0.05, n_blocks=3)
    p = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, blocked.collect()))
    assert p == b and len(p) > 0


def test_dedup_operators_degenerate_inputs(spark):
    """Empty and single-doc corpora must flow through every dedup path
    without error (empty aggregates, empty bucket joins, empty edges)."""
    from big_data_analysis_diseases_outbreaks_spark.operators.components import (
        connected_components,
        dedup_cluster_canonical,
    )
    from big_data_analysis_diseases_outbreaks_spark.operators.dedup import (
        exact_dedup,
        exact_jaccard_pairs,
        verified_near_duplicates,
    )

    schema = "doc_id LONG, lang STRING, source STRING, text STRING"
    empty = spark.createDataFrame([], schema)
    assert exact_dedup(empty).count() == 0
    assert exact_jaccard_pairs(empty, min_jaccard=0.3).count() == 0
    assert verified_near_duplicates(empty, min_jaccard=0.3).count() == 0

    one = spark.createDataFrame(
        [(1, "en", "s", "alpha beta gamma delta")], schema
    )
    got = exact_dedup(one).collect()
    assert len(got) == 1 and got[0].n_copies == 1
    assert exact_jaccard_pairs(one, min_jaccard=0.3).count() == 0

    no_edges = spark.createDataFrame([], "src LONG, dst LONG")
    cc = connected_components(no_edges)
    assert cc.count() == 0
    canon = dedup_cluster_canonical(cc, one).collect()
    assert len(canon) == 1 and canon[0].is_canonical == 1


def test_duplicate_spans_planted(spark, tmp_path):
    """Cross-document exact L-token spans: a full duplicate shares every
    window, a partial overlap shares exactly its common window, and an
    INTRA-doc repeat (n_docs == 1) stays out."""
    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        _SPAN_L,
        doc_duplicate_spans,
    )

    assert _SPAN_L == 8
    base = "a b c d e f g h i j"  # windows: a..h, b..i, c..j
    rows = [
        (1, base),
        (2, "z y c d e f g h i j"),  # shares only "c d e f g h i j"
        (3, "one two three four five six seven eight nine"),
        (4, base),  # full duplicate of doc 1
        # intra-doc repeat: same 8-token span twice in ONE doc
        (5, "p q r s t u v w " + "p q r s t u v w"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    df.write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["span"]: (r["n_occurrences"], r["n_docs"], r["head_docs"])
        for r in doc_duplicate_spans(spark, str(tmp_path)).collect()
    }
    assert got == {
        "a b c d e f g h": (2, 2, "1,4"),
        "b c d e f g h i": (2, 2, "1,4"),
        "c d e f g h i j": (3, 3, "1,2,4"),
    }


def test_duplicate_span_rate_planted(spark, tmp_path):
    """Per-doc dup-window fraction on the same planted corpus: full
    duplicates rate 1.0, the partial overlap 1/3, singles 0.0."""
    from big_data_analysis_diseases_outbreaks_spark.queries.text import (
        doc_duplicate_span_rate,
    )

    base = "a b c d e f g h i j"
    rows = [
        (1, base),
        (2, "z y c d e f g h i j"),
        (3, "one two three four five six seven eight nine"),
        (4, base),
        (5, "p q r s t u v w " + "p q r s t u v w"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    df.write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_rate"])
        for r in doc_duplicate_span_rate(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (3, 3, 1.0),
        2: (3, 1, 1 / 3),
        3: (2, 0, 0.0),
        4: (3, 3, 1.0),
        5: (9, 0, 0.0),
    }


def test_simhash_buckets_parity_on_adversarial_whitespace(spark, tmp_path):
    """ADVICE r10/r11 regression: the simhash tokenization protocol
    (explicit ASCII whitespace class + ASCII translate-lower) must hold
    on input where Unicode-aware splitting/lowering diverges — NBSP,
    NEL (\\x85), vertical tab, and cased non-ASCII letters."""
    import os

    import pandas as pd

    from .conftest import SF_SMALL
    from .oracle_harness import compare_query

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "Hello WORLD foo",      # NBSP: one token to both engines
                "a\x0bB c\x85d",              # VT + NEL: protocol class splits VT
                "ÉCOLE Straße MIXED case",   # cased non-ASCII stays unlowered
                "  plain ascii Text  ",
            ],
        }
    )
    sfd = tmp_path / "sf_adv"
    sfd.mkdir()
    docs.to_parquet(sfd / "documents.parquet")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings".split()
    ):
        os.symlink(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            sfd / f"{t}.parquet",
        )
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

    q = all_queries()["simhash_buckets"]
    diff = compare_query(q.fn(spark, str(sfd)), q.oracle, str(sfd))
    assert not diff, diff[:3]
