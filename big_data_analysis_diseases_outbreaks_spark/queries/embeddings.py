"""Similarity-search queries on the ``embeddings`` table (vec_id,
embedding: array<float>, label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import _norm, brute_force_topk, lsh_topk
from ..sources.tables import load_table
from . import register

_N_QUERIES = 5  # vec_id < 5 are the query vectors


# --- vector norms (zip_with/aggregate arithmetic, JVM-side) ---------------


@register(
    "embedding_norms",
    oracle="""
SELECT vec_id, label,
       ROUND(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
FROM embeddings
""".strip(),
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", F.round(_norm(F.col("embedding")), 4).alias("l2_norm")
    )


# --- brute-force cosine top-k (exact ANN baseline) ------------------------


@register(
    "cosine_topk",
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         ROUND(
           list_sum(list_transform(range(1, len(q.embedding) + 1),
               i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
           / NULLIF(
             sqrt(list_sum(list_transform(q.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(c.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 0), 4) AS cos_sim
  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, cand_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, cand_id ASC) AS BIGINT) AS rank
  FROM scored)
SELECT query_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= 3
""".strip(),
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb.where(F.col("vec_id") < _N_QUERIES), emb, k=3)


# --- LSH-bucketed ANN (approximate scale path → rows-only check) ----------


@register("ann_lsh_topk", oracle=None)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb.where(F.col("vec_id") < _N_QUERIES), emb, k=3)


# --- centroid per label (array aggregation via posexplode) ----------------


@register(
    "label_centroids",
    oracle="""
SELECT label, CAST(i - 1 AS INTEGER) AS dim,
       ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) AS centroid_val
FROM embeddings, range(1, 65) t(i)
GROUP BY label, i
""".strip(),
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, unrolled to (label, dim, value) rows.

    posexplode + groupBy(label, dim) — one shuffle keyed (label, dim);
    scales linearly in rows × dims with full map-side partial aggregation
    (vs collecting vectors to the driver).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    )
    return exploded.groupBy("label", F.col("dim").cast("int").alias("dim")).agg(
        F.round(F.avg(F.col("val").cast("double")), 4).alias("centroid_val")
    )
