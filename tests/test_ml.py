"""ML anomaly-track tests: seeded determinism + injected-anomaly recall
(SURVEY.md §5 — fixtures with known anomalies must be flagged).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.ml.iforest import iforest_by_region
from big_data_analysis_diseases_outbreaks_spark.ml.kmeans_track import kmeans_anomalies
from big_data_analysis_diseases_outbreaks_spark.operators.detrend import daily_aggregate
from big_data_analysis_diseases_outbreaks_spark.operators.pivot import (
    KW_VALUES,
    pivot_wide,
)
from big_data_analysis_diseases_outbreaks_spark.sources.tables import trends_view

from .conftest import SF_SMALL


def _wide(spark):
    return pivot_wide(daily_aggregate(trends_view(spark, SF_SMALL)))


def _with_injected_spike(wide):
    """Multiply every keyword column by 50 on one (date, region) row —
    an unmistakable synthetic outbreak day."""
    target = wide.orderBy("date", "region").limit(1).collect()[0]
    cond = (F.col("date") == F.lit(target["date"])) & (
        F.col("region") == target["region"]
    )
    out = wide
    for kw in KW_VALUES:
        out = out.withColumn(kw, F.when(cond, F.col(kw) * 50 + 1000).otherwise(F.col(kw)))
    return out, (target["date"], target["region"])


def test_iforest_vectorized_scoring_matches_scalar_walk():
    """The mask-routed batch traversal must be bit-identical to the
    per-row scalar walk on the same fitted trees."""
    import numpy as np

    from big_data_analysis_diseases_outbreaks_spark.ml.iforest import (
        _fit_tree,
        _path_length,
        _path_lengths,
    )

    rng = np.random.default_rng(7)
    x = rng.normal(size=(300, 5))
    for seed in range(5):
        t_rng = np.random.default_rng(seed)
        tree = _fit_tree(x[t_rng.choice(300, 256, replace=False)], t_rng, 8)
        batch = _path_lengths(tree, x)
        scalar = np.array([_path_length(tree, x[i]) for i in range(300)])
        assert (batch == scalar).all()


def test_iforest_deterministic(spark):
    wide = _wide(spark)
    a = sorted(map(tuple, iforest_by_region(wide, list(KW_VALUES)).collect()))
    b = sorted(map(tuple, iforest_by_region(wide, list(KW_VALUES)).collect()))
    assert a == b


def test_iforest_flags_injected_spike(spark):
    wide, (date, region) = _with_injected_spike(_wide(spark))
    scored = iforest_by_region(wide, list(KW_VALUES))
    top = (
        scored.where(F.col("region") == region)
        .orderBy(F.col("outlier_score").desc())
        .first()
    )
    assert top["date"] == date, "injected spike must be the region's top outlier"
    assert top["is_anomaly"] == 1


def test_kmeans_deterministic(spark):
    wide = _wide(spark)
    a = sorted(map(tuple, kmeans_anomalies(wide, list(KW_VALUES)).collect()))
    b = sorted(map(tuple, kmeans_anomalies(wide, list(KW_VALUES)).collect()))
    assert a == b


def test_kmeans_flags_injected_spike(spark):
    """The spike typically captures its own singleton cluster (distance
    ~0), so it must be flagged via the tiny-cluster rule."""
    wide, (date, region) = _with_injected_spike(_wide(spark))
    scored = kmeans_anomalies(wide, list(KW_VALUES))
    row = scored.where(
        (F.col("date") == F.lit(date)) & (F.col("region") == region)
    ).first()
    assert row is not None
    assert row["is_anomaly"] == 1


def test_prepare_features_size_guard_keeps_parallelism(spark):
    """The pre-fit coalesce(1) is a small-table optimization ONLY: at
    >=100k rows (the 100x-scale grid) the shared prep path must keep
    its partitioning, or every MLlib fit downstream becomes a
    single-task pipeline (VERDICT r6 §wrong-2)."""
    from big_data_analysis_diseases_outbreaks_spark.ml.kmeans_track import (
        prepare_features,
    )

    big = spark.range(100_000).selectExpr(
        "CAST(id AS DOUBLE) AS f1", "CAST(id % 97 AS DOUBLE) AS f2"
    ).repartition(8)
    feats = prepare_features(big, ["f1", "f2"], pca_k=2)
    try:
        assert feats.rdd.getNumPartitions() > 1
    finally:
        feats.unpersist()

    small = spark.range(64).selectExpr(
        "CAST(id AS DOUBLE) AS f1", "CAST(id % 7 AS DOUBLE) AS f2"
    ).repartition(8)
    feats_small = prepare_features(small, ["f1", "f2"], pca_k=2)
    try:
        assert feats_small.rdd.getNumPartitions() == 1
    finally:
        feats_small.unpersist()
