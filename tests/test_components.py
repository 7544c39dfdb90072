"""Connected-components operator (operators/components.py)."""

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.components import (
    connected_components,
    dedup_cluster_canonical,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


def test_components_chain_and_island(spark):
    cc = connected_components(_edges(spark, [(1, 2), (2, 3), (4, 5)]))
    got = {r["node"]: r["label"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_components_long_chain_converges(spark):
    # 0-1-2-…-12: min label must propagate the full diameter.
    cc = connected_components(_edges(spark, [(i, i + 1) for i in range(12)]))
    labels = {r["label"] for r in cc.collect()}
    assert labels == {0}


def test_components_edge_direction_irrelevant(spark):
    a = connected_components(_edges(spark, [(2, 1), (3, 2)]))
    b = connected_components(_edges(spark, [(1, 2), (2, 3)]))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_canonical_marks_min_and_singletons(spark):
    cc = connected_components(_edges(spark, [(10, 11)]))
    docs = spark.createDataFrame([(10,), (11,), (12,)], "doc_id LONG")
    out = dedup_cluster_canonical(cc, docs)
    got = {r["doc_id"]: (r["component"], r["is_canonical"]) for r in out.collect()}
    assert got == {10: (10, 1), 11: (10, 0), 12: (12, 1)}
