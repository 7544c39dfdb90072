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


def hyperplane_signature(
    emb: Column, n_planes: int = N_PLANES, table: int = 0
) -> Column:
    """Sign-bit bucket from deterministic pseudo-random hyperplanes.

    Plane weights derive from xxhash64(table, plane, dim) — reproducible
    on any executor with zero driver state shipped. ``table`` seeds an
    independent hash table for OR-amplified multi-table LSH.
    """
    def plane_weight(p: int):
        # closure factory: keeps the lambda binary (pyspark counts params)
        # pmod, not %: Spark's % keeps the dividend's sign, which would
        # bias the weight distribution to mean ≈ -1 and collapse planes.
        return lambda x, i: x.cast("double") * (
            F.pmod(
                F.xxhash64(F.lit(table) * 1_000_000 + F.lit(p) * 1000 + i), F.lit(1000)
            ).cast("double") / 500.0 - 1.0
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


def _bucketed(df: DataFrame, id_alias: str, emb_alias: str,
              emb_col: str, n_planes: int, n_tables: int) -> DataFrame:
    """(id, emb, table, bucket) — one row per hash table (OR-amplification)."""
    sigs = F.array(*[
        F.struct(
            F.lit(t).alias("table"),
            hyperplane_signature(F.col(emb_col), n_planes, table=t).alias("bucket"),
        )
        for t in range(n_tables)
    ])
    return (
        df.select(
            F.col("vec_id").alias(id_alias),
            F.col(emb_col).alias(emb_alias),
            F.explode(sigs).alias("sig"),
        )
        .select(id_alias, emb_alias, "sig.table", "sig.bucket")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    emb_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    A KMeans(seed=1) codebook partitions the corpus into ``n_cells``
    cells; every candidate lives in its nearest cell, every query probes
    its ``n_probe`` nearest cells. Scale shape: the codebook is tiny
    (n_cells × dim, broadcast as literal expressions), assignment is a
    narrow map over the corpus, and scoring shuffles on the cell key only
    — the classic FAISS-IVF layout expressed as DataFrame ops.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fit_input = candidates.select(array_to_vector(F.col(emb_col)).alias("_fv"))
    # Iterative fits on small codebook-training sets are task-scheduling
    # bound; one partition cuts the per-iteration overhead. (At scale the
    # codebook trains on a sample anyway — this is that sample.)
    if candidates.count() < 100_000:
        fit_input = fit_input.coalesce(1)
    fitted = KMeans(k=n_cells, seed=1, featuresCol="_fv").fit(fit_input)
    centers = [[float(x) for x in c] for c in fitted.clusterCenters()]

    def dist_to(center: list[float]) -> Column:
        carr = F.array(*[F.lit(x) for x in center])
        return F.aggregate(
            F.zip_with(F.col(emb_col), carr, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # array_sort on (dist, cell) structs sorts lexicographically → the
    # first n elements are the n nearest cells. All JVM expressions.
    ranked_cells = F.array_sort(
        F.array(*[
            F.struct(dist_to(c).alias("d"), F.lit(i).alias("cell"))
            for i, c in enumerate(centers)
        ])
    )
    c = candidates.select(
        F.col("vec_id").alias("cand_id"),
        F.col(emb_col).alias("c_emb"),
        ranked_cells[0]["cell"].alias("cell"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.explode(
            F.transform(F.slice(ranked_cells, 1, n_probe), lambda s: s["cell"])
        ).alias("cell"),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="cell")
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


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    emb_col: str = "embedding",
    n_planes: int = N_PLANES,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    Candidates meet a query iff they share a bucket in ≥1 of
    ``n_tables`` independent tables (OR-amplification: per-table miss
    probability compounds, so recall ≈ 1-(1-p^b)^L). The bucket join
    replaces the brute-force cross product; at 100 TB the candidate side
    shuffles by (table, bucket) and never materializes cross-bucket
    pairs. Collide-in-many-tables pairs are deduped before scoring so
    each pair's cosine is computed once."""
    q = _bucketed(queries, "query_id", "q_emb", emb_col, n_planes, n_tables)
    c = _bucketed(candidates, "cand_id", "c_emb", emb_col, n_planes, n_tables)
    pairs = (
        F.broadcast(q)
        .join(c, on=["table", "bucket"])
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "q_emb", "cand_id", "c_emb")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = pairs.select(
        "query_id",
        "cand_id",
        F.round(cosine(F.col("q_emb"), F.col("c_emb")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
