"""KMeans-distance anomaly track (reference Python notebook
``SparkBatchProcessKmeanPCA.ipynb`` cells 6-15, SURVEY.md §2.K1-K5/K8):

wide features → VectorAssembler → StandardScaler(withMean) → PCA(k) →
silhouette-selected KMeans → squared distance to own cluster center →
z-score of distances → |z| > 2 ⇒ anomaly.

Spark-first deltas from the reference:
- distance to center computed with ``vector_to_array`` + JVM array
  arithmetic — replaces the reference's row-at-a-time Python UDF
  (``calculate_distance``, notebook cell 12) entirely;
- centers are joined in as a tiny broadcast DataFrame instead of a
  closure over ``model.clusterCenters()`` (no per-row driver capture);
- final z-score via window aggregates, not two collect() round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import ClusteringEvaluator
from pyspark.ml.feature import PCA, StandardScaler, VectorAssembler
from pyspark.ml.functions import vector_to_array

SEED = 1  # reference: Main.scala:311, notebook cell 11


def _fit_eval(scaled: DataFrame, k: int):
    """Fit KMeans(k) and silhouette-score it → (k, model|None, score).

    random init, not k-means||: the parallel init runs initSteps extra
    distributed passes whose per-job overhead dominates at bench scale
    (~0.5 s/fit) while seeded-random centers converge to comparable
    silhouettes here; still fully deterministic. Degenerate fits (every
    point in one cluster — possible on small or low-variance feature
    tables) would make the silhouette assert; such k score -inf instead
    of crashing the pipeline.
    """
    model = KMeans(
        k=k, seed=SEED, featuresCol="features", initMode="random"
    ).fit(scaled)
    if len([s for s in model.summary.clusterSizes if s > 0]) < 2:
        return k, None, float("-inf")
    evaluator = ClusteringEvaluator(
        featuresCol="features", metricName="silhouette"
    )
    return k, model, evaluator.evaluate(model.transform(scaled))


def silhouette_profile(scaled: DataFrame, k_range=range(2, 7)):
    """[(k, model|None, silhouette)] for every candidate k.

    The candidate fits are independent, so they run as CONCURRENT Spark
    jobs from driver threads (the scheduler interleaves them across
    cores; data never moves to the driver).
    """
    from concurrent.futures import ThreadPoolExecutor

    ks = list(k_range)
    with ThreadPoolExecutor(max_workers=len(ks)) as ex:
        return list(ex.map(lambda k: _fit_eval(scaled, k), ks))


def select_k(scaled: DataFrame, k_range=range(2, 7)):
    """Silhouette model selection (notebook cell 10 ``select_k``).

    Returns ``(k, fitted model)`` so the winner is not refit. Each fit
    is seeded and the winner is reduced in ascending-k order, so the
    selection is exactly as deterministic as a serial loop.
    """
    ks = list(k_range)
    results = silhouette_profile(scaled, k_range)
    best_k, best_score, best_model = ks[0], float("-inf"), None
    for k, model, score in results:  # ascending k: first max wins ties
        if model is not None and score > best_score:
            best_k, best_score, best_model = k, score, model
    if best_model is None:
        best_model = KMeans(
            k=best_k, seed=SEED, featuresCol="features", initMode="random"
        ).fit(scaled)
    return best_k, best_model


def prepare_features(
    wide: DataFrame, feature_cols: list[str], pca_k: int = 4
) -> DataFrame:
    """wide → PERSISTED PCA feature frame (``features`` vector column).

    The shared prep path for the anomaly track and the model-selection
    surface (SURVEY.md §2.K1-K3). The pivot upstream is scanned by the
    scaler fit, the PCA fit, and every KMeans iteration — persist it
    once instead of recomputing the shuffle per fit. Every MLlib fit
    here is a treeAggregate whose cost on small inputs is per-task
    overhead (measured ~2.5 s/fit on 150 rows × 32 partitions, ~0.3 s
    on 1), so SMALL tables collapse to one partition BEFORE the first
    fit (reference notebook: coalesce(8) pre-ML) — guarded by a size
    count so a 100×-scale grid keeps its parallelism (no unconditional
    single-task funnel).
    """
    cached = VectorAssembler(
        inputCols=feature_cols, outputCol="raw_features"
    ).transform(wide).persist()
    # persist BEFORE the sizing count so the pivot lineage materializes
    # exactly once; the coalesce then reads cached partitions.
    assembled = cached.coalesce(1) if cached.count() < 100_000 else cached
    scaler = StandardScaler(
        inputCol="raw_features", outputCol="scaled", withStd=True, withMean=True
    ).fit(assembled)
    scaled = scaler.transform(assembled)
    pca_k = min(pca_k, len(feature_cols))
    pca = PCA(k=pca_k, inputCol="scaled", outputCol="features").fit(scaled)
    feats = pca.transform(scaled).persist()
    feats.count()  # materialize before the fit loop; upstream cache can go
    cached.unpersist()
    return feats


def kmeans_anomalies(
    wide: DataFrame, feature_cols: list[str], pca_k: int = 4, z_thresh: float = 2.0
) -> DataFrame:
    """wide (date, region, features...) → (date, region, score, is_anomaly)."""
    feats = prepare_features(wide, feature_cols, pca_k)

    _, model = select_k(feats)
    pred = model.transform(feats)

    # Broadcast-join the centers; squared distance in JVM array arithmetic.
    centers = pred.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "prediction INT, center ARRAY<DOUBLE>",
    )
    with_center = pred.withColumn("fa", vector_to_array("features")).join(
        F.broadcast(centers), on="prediction"
    )
    dist = F.aggregate(
        F.zip_with("fa", "center", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = with_center.withColumn("distance", dist)

    w = Window.partitionBy(F.lit(1))
    z = (F.col("distance") - F.avg("distance").over(w)) / F.nullif(
        F.stddev_samp("distance").over(w), F.lit(0.0)
    )
    # Distance-to-own-center misses extreme points that capture their own
    # (near-empty) cluster — their distance is ~0. Tiny-cluster membership
    # (<5% of rows) is therefore flagged as anomalous in its own right.
    wc = Window.partitionBy("prediction")
    cluster_frac = F.count(F.lit(1)).over(wc) / F.count(F.lit(1)).over(w)
    out = (
        scored.withColumn("score", F.round(z, 4))
        .withColumn("cluster_frac", cluster_frac)
        .withColumn(
            "is_anomaly",
            F.when(
                (F.abs(F.col("score")) > z_thresh) | (F.col("cluster_frac") < 0.05), 1
            )
            .otherwise(0)
            .cast("int"),
        )
        .select("date", "region", F.col("prediction").cast("int").alias("cluster"),
                "score", "is_anomaly")
    )
    # feats stays persisted: the returned DataFrame is LAZY and its plan
    # reads feats — an eager unpersist here would silently re-run the
    # whole pivot→scale→PCA lineage when the caller finally acts on the
    # result (measured +4.5 s at sf0.1, the dominant cost of the query).
    # The cache is released by the caller's clearCache()/session end.
    return out
