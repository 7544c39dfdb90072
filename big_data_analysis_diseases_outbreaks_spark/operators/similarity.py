"""Vector similarity search over an ``array<float>`` embedding column.

Two paths (north-star extension):
- brute-force cosine top-k: exact baseline. The query set is broadcast;
  the candidate scan is embarrassingly parallel (no shuffle until the
  per-query top-k, which is a TakeOrdered-style window over tiny groups).
- random-hyperplane LSH buckets: scale path — candidates meet only
  inside matching sign-buckets, turning the 100 TB × Q cross product
  into a bucket-local join.

Dot products use JVM higher-order functions (``zip_with`` +
``aggregate``) — no Python boundary in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMB_DIM = 64
N_PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.nullif(_norm(a) * _norm(b), F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest candidate
    vectors (rounded-score ordering with vec_id tie-break → fully
    deterministic)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    c = candidates.select(
        F.col("vec_id").alias("cand_id"), F.col(emb_col).alias("c_emb")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def hyperplane_signature(emb: Column, n_planes: int = N_PLANES) -> Column:
    """Sign-bit bucket from deterministic pseudo-random hyperplanes.

    Plane weights derive from xxhash64(plane, dim) — reproducible on any
    executor with zero driver state shipped.
    """
    def plane_weight(p: int):
        # closure factory: keeps the lambda binary (pyspark counts params)
        return lambda x, i: x.cast("double") * (
            (F.xxhash64(F.lit(p) * 1000 + i) % 1000).cast("double") / 500.0 - 1.0
        )

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(emb, F.sequence(F.lit(0), F.lit(EMB_DIM - 1)), plane_weight(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket.cast("int")


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        hyperplane_signature(F.col(emb_col)).alias("bucket"),
    )
    c = candidates.select(
        F.col("vec_id").alias("cand_id"),
        F.col(emb_col).alias("c_emb"),
        hyperplane_signature(F.col(emb_col)).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="bucket")
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
