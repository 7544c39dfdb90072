"""Similarity-search queries on the ``embeddings`` table (vec_id,
embedding: array<float>, label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import _norm, brute_force_topk, ivf_topk, lsh_topk
from ..sources.tables import load_table
from . import register

_N_QUERIES = 5  # vec_id < 5 are the query vectors

# int8-quantization / deterministic grid-index constants (shared by the
# ann_grid_* family and the multi-method ann_recall_report)
_I8_SCALE = 64
_I8_TOPK = 3
_GRID_B = 8
_GRID_P1 = (48271, 11)
_GRID_P2 = (69621, 97)
_GRID_MOD = 1_000_000_007


def _grid_sign_sql(a: int, b: int) -> str:
    return (
        f"CASE WHEN (({a} * (i - 1) + {b}) % {_GRID_MOD}) % 2 = 0 "
        "THEN qv[i] ELSE -qv[i] END"
    )




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

# Shared by cosine_topk AND ann_index_stream_topk: the streaming IVF
# index queried with every cell probed must return exactly the exact
# answer, so both verify against one oracle definition.
_COSINE_TOPK_ORACLE = f"""
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
""".strip()


@register("cosine_topk", oracle=_COSINE_TOPK_ORACLE)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb.where(F.col("vec_id") < _N_QUERIES), emb, k=3)


# --- LSH-bucketed ANN (multi-table OR-amplified hyperplane LSH) -----------
# Value-oracled since round 10: the hyperplanes are pinned, integer,
# and cross-engine — Rademacher ±1 weights from the split-multiply-mix
# const family (the SRP-sketch precedent), dotted against the
# power-of-two-quantized embedding (floor(x·2^20) is exact in DOUBLE,
# so both engines compute identical sign bits). 4 tables × 8 planes:
# candidates meet a query iff they share an 8-bit bucket in ≥1 table
# (OR-amplification), pairs dedup across tables, and each survivor is
# verified with the exact rounded cosine + row_number top-k — the same
# ranking protocol as cosine_topk. The numpy-Gaussian fast path
# (operators/similarity.lsh_topk) remains the 100 TB throughput
# exemplar, exercised by ml_recall_report and the recall tests; THIS
# query proves the bucket/candidate/verify algorithm value-exactly.

_ALSH_TABLES = 4
_ALSH_PLANES = 8
_ALSH_QSCALE = 1 << 20
_ALSH_DIM = 64


def _alsh_weight(d: int, bit: int) -> int:
    hv = ((d * _ALSH_TABLES * _ALSH_PLANES + bit) * 16807 + 17) % 2147483647
    mv = (hv % 100003) * (hv // 100003 + 13)
    return ((mv >> 5) & 1) * 2 - 1


def _alsh_oracle() -> str:
    vals = ",".join(
        f"({bit},{d},{_alsh_weight(d, bit)})"
        for bit in range(_ALSH_TABLES * _ALSH_PLANES)
        for d in range(_ALSH_DIM)
    )
    return f"""
WITH wgt(bit, d, w) AS (SELECT * FROM (VALUES {vals})),
q AS (
  SELECT e.vec_id, t.d,
         CAST(FLOOR(CAST(e.embedding[t.d + 1] AS DOUBLE) * {_ALSH_QSCALE})
              AS BIGINT) AS qx
  FROM embeddings e, UNNEST(range(len(e.embedding))) AS t(d)),
dots AS (
  SELECT q.vec_id, wgt.bit // {_ALSH_PLANES} AS tbl,
         wgt.bit % {_ALSH_PLANES} AS p,
         CAST(SUM(q.qx * wgt.w) AS BIGINT) AS dot
  FROM q JOIN wgt ON wgt.d = q.d
  GROUP BY 1, 2, 3),
buckets AS MATERIALIZED (
  SELECT vec_id, tbl,
         CAST(SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS BIGINT)
           AS bucket
  FROM dots GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket
   AND a.vec_id < {_N_QUERIES} AND a.vec_id <> b.vec_id),
scored AS (
  SELECT c.query_id, c.cand_id,
         ROUND(
           list_sum(list_transform(range(1, len(qe.embedding) + 1),
               i -> CAST(qe.embedding[i] AS DOUBLE)
                    * CAST(ce.embedding[i] AS DOUBLE)))
           / NULLIF(
             sqrt(list_sum(list_transform(qe.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(ce.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 0), 4)
           AS cos_sim
  FROM cand c
  JOIN embeddings qe ON qe.vec_id = c.query_id
  JOIN embeddings ce ON ce.vec_id = c.cand_id),
ranked AS (
  SELECT query_id, cand_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, cand_id ASC) AS BIGINT) AS rank
  FROM scored)
SELECT query_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= 3
""".strip()


@register("ann_lsh_topk", oracle=_alsh_oracle())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine

    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    qarr = F.transform(
        "emb", lambda x: F.floor(x * F.lit(_ALSH_QSCALE)).cast("long")
    )
    base = emb.select("vec_id", "emb", qarr.alias("q"))

    def _bucket(t: int):
        acc = F.lit(0).cast("long")
        for p in range(_ALSH_PLANES):
            bit = t * _ALSH_PLANES + p
            w = F.array(
                *[F.lit(_alsh_weight(d, bit)) for d in range(_ALSH_DIM)]
            )
            dot = F.aggregate(
                F.zip_with(F.col("q"), w, lambda x, wv: x * wv),
                F.lit(0).cast("long"),
                lambda a, el: a + el,
            )
            acc = acc + (dot > 0).cast("long") * F.lit(1 << p).cast("long")
        return acc

    tbl_structs = [
        F.struct(F.lit(t).alias("table"), _bucket(t).alias("bucket"))
        for t in range(_ALSH_TABLES)
    ]
    # Persisted: the bucketed frame feeds both sides of the candidate
    # join with different filters (ReuseExchange never covers that).
    b = (
        base.select(
            "vec_id", "emb", F.explode(F.array(*tbl_structs)).alias("tb")
        )
        .select("vec_id", "emb", "tb.table", "tb.bucket")
        .persist()
    )
    qs = b.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        "table",
        "bucket",
    )
    pairs = (
        F.broadcast(qs)
        .join(b, ["table", "bucket"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "q_emb",
            F.col("vec_id").alias("cand_id"),
            F.col("emb").alias("c_emb"),
        )
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
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= 3)


# --- IVF-bucketed ANN (KMeans coarse quantizer → rows-only check) ---------


@register("ann_ivf_topk", oracle=None)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb.where(F.col("vec_id") < _N_QUERIES), emb, k=3)


# --- IVF-PQ ANN (residual product quantization + ADC + exact refine) ------
# The compressed-domain scale path: the corpus is stored as (cell, m sub-
# codes); scoring gathers from a per-(query, cell) lookup table and only
# the tiny shortlist is re-scored at full precision.


@register("ann_ivf_pq_topk", oracle=None)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_topk(emb.where(F.col("vec_id") < _N_QUERIES), emb, k=3)


# --- embedding-cosine near-duplicate pairs (exact; SQL oracle) ------------
# The testdata embeddings are mutually far apart, so near-dups are
# constructed: each vector is re-appended (vec_id+100000) with dim 0
# scaled ×1.05 — a scale-free perturbation keeping cosine ≈ 0.999
# whatever the embedding norms are. The dedup must then report exactly
# one pair per original vector.


@register(
    "dedup_embedding_cosine",
    oracle="""
WITH all_vecs AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(range(1, len(embedding) + 1),
             i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) * 1.05
                       ELSE CAST(embedding[i] AS DOUBLE) END) AS embedding
  FROM embeddings),
scored AS (
  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         ROUND(
           list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           / NULLIF(
             sqrt(list_sum(list_transform(a.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(b.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 0), 4) AS cos_sim
  FROM all_vecs a JOIN all_vecs b ON a.vec_id < b.vec_id)
SELECT vec_id_1, vec_id_2, cos_sim FROM scored WHERE cos_sim >= 0.98
""".strip(),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs (cosine ≥ 0.98) over the corpus +
    constructed perturbed copies.

    This is the *verifier* tier: all-pairs cosine, quadratic — correct at
    oracle scale. The 100 TB path is ann_lsh_topk / ann_ivf_topk, which
    bucket first and verify only within buckets.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    perturbed = emb.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") * 1.05).otherwise(
                x.cast("double")
            ),
        ).alias("embedding"),
    )
    # Norms are per-vector, not per-pair: computing them inside the pair
    # loop would run the O(dim) aggregate 2·N²/2 extra times. Pre-attach
    # them so each pair only evaluates the dot product.
    all_vecs = (
        emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        .unionByName(perturbed)
        .withColumn("nrm", _norm(F.col("embedding")))
    )
    a = all_vecs.alias("a")
    b = all_vecs.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.embedding"), F.col("b.embedding"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / F.nullif(F.col("a.nrm") * F.col("b.nrm"), F.lit(0.0))
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id_1"),
            F.col("b.vec_id").alias("vec_id_2"),
            F.round(cos, 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= 0.98)
    )


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


# --- int8 scalar quantization (training-pipeline storage path: 4× smaller
# vectors for ANN recall at 100 TB; exact-int outputs → full SQL oracle) ---


@register(
    "embedding_quantize_int8",
    oracle="""
WITH scaled AS (
  SELECT vec_id, label,
         list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
         embedding
  FROM embeddings)
SELECT vec_id, label, scale,
       array_to_string(
       CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
            ELSE list_transform(embedding,
                 x -> CAST(ROUND(CAST(x AS DOUBLE) / scale) AS INTEGER))
       END, ',') AS q,
       CASE WHEN scale = 0 THEN 0.0
            ELSE list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)
                          - ROUND(CAST(x AS DOUBLE) / scale) * scale)))
       END AS max_abs_err
FROM scaled
""".strip(),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x|/127,
    q_i = round(x_i/scale). The quantized array is exact integers (hash-
    comparable across engines); reconstruction error is reported per
    vector. All JVM higher-order functions — a 100 TB re-encode is one
    narrow map over the scan, no shuffle, no Python."""
    emb = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = (
        F.array_max(F.transform("embedding", lambda x: F.abs(xd(x)))) / 127.0
    ).alias("scale")
    scaled = emb.select("vec_id", "label", scale, "embedding")
    quant = F.when(
        F.col("scale") == 0,
        F.transform("embedding", lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            "embedding",
            lambda x: F.round(xd(x) / F.col("scale")).cast("int"),
        )
    )
    # scale and max_abs_err stay UNROUNDED: both are rationals whose
    # round()ed decimal repr diverges between engines (stable.py note);
    # the raw doubles come from identical IEEE op chains and hash equal.
    err = F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
        F.array_max(
            F.transform(
                "embedding",
                lambda x: F.abs(
                    xd(x) - F.round(xd(x) / F.col("scale")) * F.col("scale")
                ),
            )
        )
    )
    # q is emitted as a comma-joined string, not array<int>: the driver's
    # correctness canonicalizer sorts rows by every column and crashes on
    # unhashable array cells (round-1 ADVICE). Exact integers → the joined
    # string is byte-identical across engines.
    return scaled.select(
        "vec_id",
        "label",
        "scale",
        F.array_join(quant.cast("array<string>"), ",").alias("q"),
        err.alias("max_abs_err"),
    )


# --- LSH-bucketed near-dup (scale path; approximate → rows-only check,
# recall pinned against the exact verifier in tests/test_similarity.py) ----


@register("dedup_embedding_lsh", oracle=None)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    perturbed = emb.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") * 1.05).otherwise(
                x.cast("double")
            ),
        ).alias("embedding"),
    )
    doubled = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    ).unionByName(perturbed)
    return lsh_near_dup_pairs(doubled, min_cosine=0.98)


# --- array higher-order predicates (filter / exists / forall) — the
# remaining HOF family beyond transform/aggregate/zip_with; all JVM. -------


@register(
    "embedding_activation_stats",
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.0))
            AS INTEGER) AS n_positive,
       CAST(len(list_filter(embedding, x -> abs(CAST(x AS DOUBLE)) > 2.0)) > 0
            AS INTEGER) AS has_large,
       CAST(len(list_filter(embedding,
                x -> abs(CAST(x AS DOUBLE)) <= 4.0)) = len(embedding)
            AS INTEGER) AS all_bounded
FROM embeddings
""".strip(),
)
def embedding_activation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector activation profile via array predicates: F.filter
    (count positives), F.exists (any |x|>2), F.forall (all |x|<=4) —
    one narrow map over the scan, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: xd(x) > 0.0))
        .cast("int")
        .alias("n_positive"),
        F.exists("embedding", lambda x: F.abs(xd(x)) > 2.0)
        .cast("int")
        .alias("has_large"),
        F.forall("embedding", lambda x: F.abs(xd(x)) <= 4.0)
        .cast("int")
        .alias("all_bounded"),
    )


# --- ANN evaluation as a query: recall@k of approximate index methods
# against the exact baseline — the monitoring table an embedding-search
# owner watches after reindexing. Re-expressed on the DETERMINISTIC
# grid machinery in round 12 (VERDICT r11 #8): the methods compared are
# three probe policies over the same 2-projection int8 grid index —
# grid_3x3 (the ann_grid_topk 9-cell probe), grid_1x1 (center cell
# only: cheapest, lowest recall), and band_1d (a 3-cell stripe of the
# FIRST projection only: a coarser 1-D index with bigger candidate
# sets) — so the whole report is a pure function of the data and
# hash-matches in DuckDB. The seeded MLlib LSH/IVF/PQ paths keep their
# recall coverage in ml_recall_report + the ≥95%-recall pytest tier.
# The method definitions live ONCE (the oracle below is assembled from
# the same probe recipes); everything is joins + one tiny agg per
# method — no collect.


def _ann_rr_oracle() -> str:
    dot_rank = (
        "ROW_NUMBER() OVER (PARTITION BY pr.query_id "
        "ORDER BY CAST(list_sum(list_transform("
        "range(1, len(pr.qa) + 1), "
        "i -> pr.qa[i] * b.qv[i])) AS BIGINT) DESC, "
        "b.vec_id ASC)"
    )

    def top(name: str, probe: str, keys: str) -> str:
        return f"""
{name} AS (
  SELECT query_id, cand_id FROM (
    SELECT pr.query_id, b.vec_id AS cand_id, {dot_rank} AS rank
    FROM {probe} pr JOIN binned b
      ON {keys} AND b.vec_id <> pr.query_id)
  WHERE rank <= {_I8_TOPK})"""

    def report(label: str, cte: str) -> str:
        return f"""
SELECT '{label}' AS method,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS recall_at_k
FROM exact_top e
LEFT JOIN {cte} t ON t.query_id = e.query_id AND t.cand_id = e.cand_id"""

    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           GREATEST(-127, LEAST(127,
             CAST(ROUND(CAST(x AS DOUBLE) * {_I8_SCALE}) AS BIGINT))))
           AS qv
  FROM embeddings),
exact_pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
             i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot_i8
  FROM q a JOIN q b ON a.vec_id < {_N_QUERIES} AND a.vec_id <> b.vec_id),
exact_top AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY dot_i8 DESC, cand_id ASC) AS rank
    FROM exact_pairs) WHERE rank <= {_I8_TOPK}),
p AS (
  SELECT vec_id, qv,
         CAST(list_sum(list_transform(range(1, len(qv) + 1),
             i -> {_grid_sign_sql(*_GRID_P1)})) AS BIGINT) AS p1,
         CAST(list_sum(list_transform(range(1, len(qv) + 1),
             i -> {_grid_sign_sql(*_GRID_P2)})) AS BIGINT) AS p2
  FROM q),
mm AS (
  SELECT MIN(p1) AS l1, MAX(p1) AS h1, MIN(p2) AS l2, MAX(p2) AS h2
  FROM p),
binned AS (
  SELECT vec_id, qv,
         (p1 - l1) * {_GRID_B} // (h1 - l1 + 1) AS c1,
         (p2 - l2) * {_GRID_B} // (h2 - l2 + 1) AS c2
  FROM p, mm),
probe33 AS (
  SELECT b.vec_id AS query_id, b.qv AS qa,
         b.c1 + d1.x AS c1, b.c2 + d2.x AS c2
  FROM binned b, UNNEST([-1, 0, 1]) AS d1(x), UNNEST([-1, 0, 1]) AS d2(x)
  WHERE b.vec_id < {_N_QUERIES}),
probe11 AS (
  SELECT vec_id AS query_id, qv AS qa, c1, c2
  FROM binned WHERE vec_id < {_N_QUERIES}),
probe1d AS (
  SELECT b.vec_id AS query_id, b.qv AS qa, b.c1 + d1.x AS c1
  FROM binned b, UNNEST([-1, 0, 1]) AS d1(x)
  WHERE b.vec_id < {_N_QUERIES}),
{top("top33", "probe33", "b.c1 = pr.c1 AND b.c2 = pr.c2").strip()},
{top("top11", "probe11", "b.c1 = pr.c1 AND b.c2 = pr.c2").strip()},
{top("top1d", "probe1d", "b.c1 = pr.c1").strip()}
{report("grid_3x3", "top33").strip()}
UNION ALL
{report("grid_1x1", "top11").strip()}
UNION ALL
{report("band_1d", "top1d").strip()}
""".strip()


@register("ann_recall_report", oracle=_ann_rr_oracle())
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    binned = _grid_binned(emb).persist()  # index build feeds all probes
    # Exact baseline feeds three method joins — checkpoint once
    # (localCheckpoint, not persist: a query function never sees its
    # result materialized, so a persist could never be unpersisted) or
    # the O(|Q| x corpus) scan re-evaluates per consumer.
    exact = (
        embedding_int8_dot_topk(spark, sf_dir)
        .select("query_id", "cand_id")
        .localCheckpoint(eager=True)
    )
    offs = F.array([F.lit(-1), F.lit(0), F.lit(1)])
    qside = binned.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qa"),
        "c1",
        "c2",
    )
    probe33 = (
        qside.select(
            "query_id", "qa", F.explode(offs).alias("d1"), "c1", "c2"
        )
        .select(
            "query_id",
            "qa",
            (F.col("c1") + F.col("d1")).alias("c1"),
            F.explode(offs).alias("d2"),
            "c2",
        )
        .select(
            "query_id", "qa", "c1", (F.col("c2") + F.col("d2")).alias("c2")
        )
    )
    probe1d = qside.select(
        "query_id", "qa", F.explode(offs).alias("d1"), "c1"
    ).select("query_id", "qa", (F.col("c1") + F.col("d1")).alias("c1"))
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, el: acc + el,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_i8").desc(), F.col("cand_id").asc()
    )

    def topk(probe: DataFrame, keys: list[str]) -> DataFrame:
        cand = (
            F.broadcast(probe)
            .join(binned, keys)
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("cand_id"),
                dot.alias("dot_i8"),
            )
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _I8_TOPK)
            .select("query_id", "cand_id")
        )

    methods = {
        "grid_3x3": topk(probe33, ["c1", "c2"]),
        "grid_1x1": topk(qside, ["c1", "c2"]),
        "band_1d": topk(probe1d, ["c1"]),
    }
    reports = []
    for name, top in methods.items():
        m = exact.join(
            top.withColumn("_hit", F.lit(1)), ["query_id", "cand_id"], "left"
        )
        reports.append(
            m.agg(
                F.lit(name).alias("method"),
                F.count(F.lit(1)).cast("long").alias("n_exact"),
                F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                .cast("long")
                .alias("n_hits"),
                (
                    F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double")
                    / F.count(F.lit(1))
                ).alias("recall_at_k"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


# --- per-dimension drift check: activation-rate deltas between two
# cohorts (even/odd vec_id — at production scale, yesterday's batch vs
# today's). Count-based on purpose: float sums over arbitrary embedding
# values are partition-order-dependent, but counts of sign predicates
# are exact integers, and each rate is ONE division — the drift table
# stays bit-stable at any parallelism. posexplode keeps the dim index
# aligned with the value; one shuffle on the 64 dim keys. ------------------


@register(
    "embedding_dim_drift",
    oracle="""
WITH by_dim AS (
  SELECT vec_id % 2 AS cohort,
         unnest(list_transform(range(1, len(embedding) + 1),
             i -> struct_pack(d := i, v := CAST(embedding[i] AS DOUBLE)))) AS e
  FROM embeddings)
SELECT CAST(e.d AS INTEGER) AS dim,
       CAST(COUNT(*) FILTER (WHERE cohort = 0) AS BIGINT) AS n_a,
       CAST(COUNT(*) FILTER (WHERE cohort = 1) AS BIGINT) AS n_b,
       CAST(COUNT(*) FILTER (WHERE cohort = 0 AND e.v > 0) AS BIGINT)
         AS n_pos_a,
       CAST(COUNT(*) FILTER (WHERE cohort = 1 AND e.v > 0) AS BIGINT)
         AS n_pos_b,
       CAST(COUNT(*) FILTER (WHERE cohort = 0 AND e.v > 0) AS DOUBLE)
           / COUNT(*) FILTER (WHERE cohort = 0)
         - CAST(COUNT(*) FILTER (WHERE cohort = 1 AND e.v > 0) AS DOUBLE)
           / COUNT(*) FILTER (WHERE cohort = 1) AS pos_rate_delta
FROM by_dim
GROUP BY e.d
""".strip(),
)
def embedding_dim_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        (F.col("vec_id") % 2).alias("cohort"),
        F.posexplode("embedding").alias("pos", "x"),
    ).select(
        "cohort",
        (F.col("pos") + 1).alias("dim"),
        F.col("x").cast("double").alias("v"),
    )
    a = F.col("cohort") == 0
    b = F.col("cohort") == 1
    pos = F.col("v") > 0
    n_a = F.sum(a.cast("long"))
    n_b = F.sum(b.cast("long"))
    n_pos_a = F.sum((a & pos).cast("long"))
    n_pos_b = F.sum((b & pos).cast("long"))
    return e.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        n_pos_a.alias("n_pos_a"),
        n_pos_b.alias("n_pos_b"),
        (
            n_pos_a.cast("double") / n_a - n_pos_b.cast("double") / n_b
        ).alias("pos_rate_delta"),
    )


@register("dedup_semdedup", oracle=None)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540) over the perturbed-corpus fixture:
    k-means-cell-blocked semantic near-dup pairs, sharing the IVF
    codebook fit. Rows-only (the codebook is a seeded fit, not
    SQL-expressible); recall vs the exact all-pairs verifier is pinned
    in tests/test_similarity.py, determinism by the blanket
    rows-only test."""
    from ..operators.similarity import semdedup_pairs

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    perturbed = emb.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") * 1.05).otherwise(
                x.cast("double")
            ),
        ).alias("embedding"),
    )
    doubled = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    ).unionByName(perturbed)
    return semdedup_pairs(doubled, min_cosine=0.98)


# --- Batched-inference plumbing (the "embed the corpus" op): the model
# call is a deterministic md5-derived projection so the ENTIRE embedding
# matrix is value-checked — what's being verified is the production
# shape: corpus → Arrow-batched pandas UDF ("model server" stand-in,
# one vectorized call per batch, no shuffle) → fixed-dim array<double>
# column. Swapping the hash for a real encoder changes only the batch
# function body; partitioning, batching, schema and downstream
# compatibility (ANN/SemDeDup consume the same column type) all stay. ----

_EMB_DIM = 16


def _md5_embed_element_sql(expr: str, idx: str) -> str:
    """DuckDB SQL for dimension ``idx`` of the md5-derived embedding of
    ``expr`` — the ONE definition of the stand-in encoder's per-element
    math (the list form and doc_embed_deterministic's exploded oracle
    both build from it, so they can never drift)."""
    return f"""((strpos('0123456789abcdef',
                    substr(md5({expr} || ':' || CAST({idx} AS VARCHAR)), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef',
                    substr(md5({expr} || ':' || CAST({idx} AS VARCHAR)), 2, 1)) - 1)
          - 127.5) / 128.0"""


def _md5_embed_sql(expr: str) -> str:
    """DuckDB twin of the md5-derived embedding over ``expr`` as a list
    (the RAG pipeline's oracle builds from it)."""
    return (
        f"list_transform(range({_EMB_DIM}),"
        f" i -> {_md5_embed_element_sql(expr, 'i')})"
    )


def _md5_embed_udf():
    """The Arrow-batched stand-in encoder (one "model forward" per
    batch) — shared by doc_embed_deterministic and rag_chunk_retrieval
    so the two can never drift. Swapping in a real encoder changes only
    this body."""
    import hashlib

    from pyspark.sql.types import ArrayType, DoubleType

    # no hints: string-annotation inference clashes with
    # `from __future__ import annotations`; returnType governs.
    @F.pandas_udf(ArrayType(DoubleType()))
    def embed(texts):
        def one(t: str):
            return [
                (int(hashlib.md5(f"{t}:{i}".encode()).hexdigest()[:2], 16)
                 - 127.5) / 128.0
                for i in range(_EMB_DIM)
            ]

        return texts.map(one)

    return embed


@register(
    "doc_embed_deterministic",
    oracle=f"""
SELECT d.doc_id, CAST(t.i AS INTEGER) AS dim,
       {_md5_embed_element_sql('d.text', 't.i')} AS value
FROM documents d, range({_EMB_DIM}) t(i)
""".strip(),
)
def doc_embed_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus → Arrow-batched encoder → EXPLODED (doc_id, dim, value)
    rows. Long form, not array<double>: the driver's canonicalizer
    sorts a pandas frame over all columns and an ndarray cell is
    unhashable (r6's one red row) — exploding keeps every matrix value
    oracle-checked while staying driver-canonicalizable. Downstream
    consumers (ANN/SemDeDup/RAG) still get the array column from the
    shared ``_md5_embed_udf``; posexplode is a narrow generate (no
    shuffle), so this surface costs one in-task expansion."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(_md5_embed_udf()(F.col("text"))).alias("dim", "value"),
    )


# --- Exact cosine range query: the fixed-radius companion of
# cosine_topk — "all candidates within similarity r", the shape
# recommendation cutoffs and near-duplicate radii need (top-k bounds
# the COUNT, radius bounds the QUALITY). Same broadcast(Q) × corpus
# scan as the exact top-k baseline. ---------------------------------------

_RADIUS_MIN_SIM = 0.2


@register(
    "similarity_radius_search",
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
  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id)
SELECT query_id, cand_id, cos_sim
FROM scored WHERE cos_sim >= {_RADIUS_MIN_SIM}
""".strip(),
)
def similarity_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import radius_search

    emb = load_table(spark, sf_dir, "embeddings")
    return radius_search(
        emb.where(F.col("vec_id") < _N_QUERIES), emb, min_sim=_RADIUS_MIN_SIM
    )


# --- Streaming IVF index maintenance (streaming/ann_index.py): bootstrap
# the codebook + index from the first embeddings chunk, stream the rest
# in as exactly-once micro-batch appends (cell-assignment only — no
# refit), then query the persisted index. Probing EVERY cell makes the
# result provably equal to exact brute-force cosine top-k, so one oracle
# value-checks the full pipeline: codebook persistence, incremental cell
# assignment, partition-pruned probe join, and ranking. The approximate
# (n_probe < n_cells) serving path is recall-tested in
# tests/test_ann_index.py. ---------------------------------------------------

_ANN_IDX_CELLS = 8


def _embeddings_chunk_dir(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3
) -> str:
    """embeddings.parquet as n contiguous-vec_id chunk files (one per
    micro-batch under maxFilesPerTrigger=1); cached per source version
    (race-free + staleness-keyed — sources/cachedir.py)."""
    import os

    from ..sources.cachedir import build_cached_dir, source_fingerprint

    src = os.path.join(sf_dir, "embeddings.parquet")
    key = sf_dir.strip("/").replace("/", "_")

    def _build(d: str) -> None:
        import duckdb

        con = duckdb.connect()
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{src}')"
        ).fetchone()[0]
        per = (n + n_chunks - 1) // n_chunks
        for i in range(n_chunks):
            con.execute(
                f"""COPY (SELECT * FROM read_parquet('{src}')
                     WHERE vec_id >= {i * per} AND vec_id < {(i + 1) * per}
                     ORDER BY vec_id)
                    TO '{os.path.join(d, f"chunk_{i:02d}.parquet")}'
                    (FORMAT PARQUET)"""
            )
        con.close()

    return build_cached_dir(
        f"spark_annidx_src_{key}_{n_chunks}", source_fingerprint(src), _build
    )


@register("ann_index_stream_topk", oracle=_COSINE_TOPK_ORACLE)
def ann_index_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.cachedir import build_cached_dir, source_fingerprint
    from ..streaming.ann_index import (
        init_index,
        query_index,
        run_stream_index_maintenance,
    )

    src = _embeddings_chunk_dir(spark, sf_dir)
    chunks = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    # Index cached per source version (like the chunk dir): a fresh
    # mkdtemp per invocation would leave a full cell-partitioned corpus
    # copy + checkpoint behind on every bench rep / sweep run. Built in
    # a staging dir and atomically renamed — concurrent runs and killed
    # builds can't publish a partial index (sources/cachedir.py).
    key = sf_dir.strip("/").replace("/", "_")

    def _build(index_dir: str) -> None:
        chunk0 = spark.read.parquet(chunks[0])
        init_index(spark, chunk0, index_dir, n_cells=_ANN_IDX_CELLS)
        # Everything past the bootstrap chunk's actual MAX(vec_id) — not
        # its row count: with any gap in vec_ids, count < max and rows
        # in [count, max] would be ingested twice (bootstrap + stream).
        hi = chunk0.agg(F.max("vec_id")).first()[0]
        rest = (
            spark.readStream.schema(chunk0.schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(src)
            # chunk 0 is already in the index as the bootstrap batch;
            # the pruning filter rides INTO the stream scan
            .where(F.col("vec_id") > F.lit(-1 if hi is None else hi))
        )
        run_stream_index_maintenance(spark, rest, index_dir)

    index_dir = build_cached_dir(
        f"spark_annidx_{key}_{_ANN_IDX_CELLS}",
        source_fingerprint(os.path.join(sf_dir, "embeddings.parquet")),
        _build,
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return query_index(
        spark,
        emb.where(F.col("vec_id") < _N_QUERIES),
        index_dir,
        k=3,
        n_probe=_ANN_IDX_CELLS,
    )


# --- ColBERT-style late-interaction retrieval (MaxSim) --------------------
# Late interaction (Khattab & Zaharia, ColBERT, SIGIR'20): a document is
# a BAG of token vectors, and relevance is MaxSim — for each query
# vector take the max dot product over the document's vectors, then sum
# over query vectors. Richer than single-vector cosine (captures
# term-level matches) at bag-of-vectors storage cost; the standard
# scale path is exactly the ANN machinery above (cell-probe candidates,
# MaxSim re-scoring on the shortlist). The testdata has one 64-d vector
# per id, so the multi-vector bag is synthesized deterministically by
# splitting it into 4 contiguous 16-d sub-vectors — the plumbing
# (nested HOF scoring, bag schema, per-query ranking) is the real
# surface and is value-oracled exactly: fixed-order fold per dot, max
# over 4, sum over 4 — no variable-order float reduction anywhere.

_MAXSIM_SUBS = 4
_MAXSIM_DIM = 16  # 64-d embedding → 4 × 16-d token vectors


@register(
    "colbert_maxsim_topk",
    oracle=f"""
WITH sub AS (
  SELECT vec_id,
         list_transform(range(0, {_MAXSIM_SUBS}), i ->
           list_transform(
             list_slice(embedding, i * {_MAXSIM_DIM} + 1,
                        i * {_MAXSIM_DIM} + {_MAXSIM_DIM}),
             x -> CAST(x AS DOUBLE))) AS subs
  FROM embeddings),
q AS (SELECT vec_id AS query_id, subs AS qsubs FROM sub
      WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         ROUND(list_sum(list_transform(q.qsubs, qs ->
             list_max(list_transform(c.subs, cs ->
                 list_sum(list_transform(range(1, {_MAXSIM_DIM} + 1),
                                         k -> qs[k] * cs[k])))))), 4)
           AS maxsim
  FROM q JOIN sub c ON c.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, cand_id, maxsim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY maxsim DESC, cand_id ASC) AS BIGINT) AS rank
  FROM scored)
SELECT query_id, cand_id, maxsim, rank FROM ranked WHERE rank <= 3
""".strip(),
)
def colbert_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    # Let-bound projections (d, then subs): the cast array materializes
    # once per row, never re-evaluated inside the slicing lambda.
    sub = (
        emb.select(
            "vec_id",
            F.transform(
                F.col("embedding"), lambda x: x.cast("double")
            ).alias("d"),
        )
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(_MAXSIM_SUBS - 1)),
                lambda i: F.slice(
                    F.col("d"), i * _MAXSIM_DIM + 1, F.lit(_MAXSIM_DIM)
                ),
            ).alias("subs"),
        )
    )
    q = sub.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("subs").alias("qsubs")
    )
    c = sub.select(
        F.col("vec_id").alias("cand_id"), F.col("subs").alias("csubs")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    maxsim = F.round(
        F.aggregate(
            F.col("qsubs"),
            F.lit(0.0),
            lambda acc, qs: acc
            + F.array_max(
                F.transform(F.col("csubs"), lambda cs: dot(qs, cs))
            ),
        ),
        4,
    )
    # Tiny query side broadcast against the corpus; the != predicate
    # makes this a BroadcastNestedLoopJoin (never a shuffle of the
    # corpus). At scale the candidate side is an ANN shortlist, not the
    # full table — same re-scoring expression either way.
    pairs = F.broadcast(q).join(
        c, F.col("cand_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("maxsim").desc(), F.col("cand_id").asc()
    )
    return (
        pairs.select("query_id", "cand_id", maxsim.alias("maxsim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
    )


# --- End-to-end RAG retrieval: chunk → embed → top-k ----------------------
# The composed retrieval-indexing pipeline of the LLM era: documents are
# split into overlapping token chunks (doc_chunking's scheme), every
# chunk is embedded (doc_embed_deterministic's md5-derived stand-in —
# swapping in a real encoder changes one Arrow batch function), query
# documents are embedded the same way, and each query retrieves its
# top-k most-similar chunks from OTHER documents by exact cosine.
# Because the chunker and the embedder are both deterministic, the
# WHOLE pipeline is value-oracled — chunk boundaries, embedding matrix,
# scoring and ranking, cell-for-cell. Scale shape: chunk+embed is one
# narrow map over the corpus scan (no shuffle), scoring is a
# broadcast(Q) nested-loop over the chunk table (at 100 TB the chunk
# side comes from the ANN index's probed cells instead — same scoring
# expression), ranking shuffles only on query_doc_id.

_RAG_QUERIES = 3  # doc_id < 3 are the query documents
_RAG_K = 3

# Chunking scheme shared with doc_chunking — interpolated into the
# oracle from the SAME constants the Spark side imports, so the two
# sides cannot drift when the scheme is tuned.
from .text import CHUNK_STRIDE, CHUNK_TOKENS, TOKEN_RE  # noqa: E402


@register(
    "rag_chunk_retrieval",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS t FROM documents),
chunks AS (
  SELECT doc_id, CAST(u.s / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
         array_to_string(t[u.s + 1 : u.s + {CHUNK_TOKENS}], ' ') AS chunk_text
  FROM toks, UNNEST(range(0, GREATEST(len(t), 1), {CHUNK_STRIDE})) AS u(s)),
ce AS (
  SELECT doc_id, chunk_id, {_md5_embed_sql('chunk_text')} AS e FROM chunks),
q AS (
  SELECT doc_id AS query_doc_id, {_md5_embed_sql('text')} AS qe
  FROM documents WHERE doc_id < {_RAG_QUERIES}),
scored AS (
  SELECT q.query_doc_id, ce.doc_id AS cand_doc_id, ce.chunk_id,
         ROUND(
           list_sum(list_transform(range(1, {_EMB_DIM} + 1), k -> qe[k] * e[k]))
           / NULLIF(sqrt(list_sum(list_transform(qe, x -> x * x)))
                    * sqrt(list_sum(list_transform(e, x -> x * x))), 0),
           4) AS cos_sim
  FROM q JOIN ce ON ce.doc_id <> q.query_doc_id),
ranked AS (
  SELECT query_doc_id, cand_doc_id, chunk_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_doc_id
              ORDER BY cos_sim DESC, cand_doc_id ASC, chunk_id ASC) AS BIGINT)
           AS rank
  FROM scored)
SELECT query_doc_id, cand_doc_id, chunk_id, cos_sim, rank
FROM ranked WHERE rank <= {_RAG_K}
""".strip(),
)
def rag_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import tokens

    embed = _md5_embed_udf()  # the shared stand-in encoder
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks), F.lit(1)) - 1, F.lit(CHUNK_STRIDE)
    )
    chunk_structs = F.transform(
        starts,
        lambda s: F.struct(
            (s / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice(toks, s + 1, CHUNK_TOKENS)).alias(
                "chunk_text"
            ),
        ),
    )
    ce = (
        docs.select("doc_id", F.explode_outer(chunk_structs).alias("c"))
        .select(
            F.col("doc_id").alias("cand_doc_id"),
            F.col("c.chunk_id").alias("chunk_id"),
            embed(F.col("c.chunk_text")).alias("e"),
        )
    )
    q = docs.where(F.col("doc_id") < _RAG_QUERIES).select(
        F.col("doc_id").alias("query_doc_id"),
        embed(F.col("text")).alias("qe"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = F.round(
        dot(F.col("qe"), F.col("e"))
        / F.nullif(
            F.sqrt(dot(F.col("qe"), F.col("qe")))
            * F.sqrt(dot(F.col("e"), F.col("e"))),
            F.lit(0.0),
        ),
        4,
    )
    w = Window.partitionBy("query_doc_id").orderBy(
        F.col("cos_sim").desc(),
        F.col("cand_doc_id").asc(),
        F.col("chunk_id").asc(),
    )
    return (
        F.broadcast(q)
        .join(ce, F.col("cand_doc_id") != F.col("query_doc_id"))
        .select("query_doc_id", "cand_doc_id", "chunk_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _RAG_K)
    )


# --- Two-stage retrieval: bi-encoder shortlist → cross-encoder rerank -----
# The production RAG shape: a cheap vector-similarity stage shortlists
# candidates, then an expensive pairwise model re-scores ONLY the
# shortlist. The "cross-encoder" stand-in is a deterministic md5-derived
# interaction score over the (query_text, chunk_text) PAIR — exactly
# what a bi-encoder cannot express (its score factorizes) — computed
# with JVM builtins (md5/conv), no Python crossing. The combined score
# is an exact BIGINT (cos·10⁴·65535 + x·10⁴ ≡ equal-weight blend of
# cos and x/65535, order-isomorphic, no float rounding to diverge on).
# Scale shape: stage 1 is the rag_chunk_retrieval plan (broadcast(Q)
# BNLJ, ANN shortlist at 100 TB); stage 2 touches |Q|·SHORTLIST rows —
# negligible — and reuses stage 1's query_doc_id partitioning, so the
# rerank adds no new shuffle of anything corpus-sized.

_RERANK_SHORTLIST = 8


def _md5_hex4_int_sql(expr: str) -> str:
    """DuckDB twin of Spark ``conv(substring(md5(x),1,4),16,10)``: the
    first 4 hex nibbles of md5 as an integer 0..65535."""
    h = f"md5({expr})"
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
            f" * {16 ** (3 - i)}"
            for i in range(4)
        )
        + ")"
    )


@register(
    "rag_rerank_topk",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS t FROM documents),
chunks AS (
  SELECT doc_id, CAST(u.s / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
         array_to_string(t[u.s + 1 : u.s + {CHUNK_TOKENS}], ' ') AS chunk_text
  FROM toks, UNNEST(range(0, GREATEST(len(t), 1), {CHUNK_STRIDE})) AS u(s)),
ce AS (
  SELECT doc_id, chunk_id, chunk_text,
         {_md5_embed_sql('chunk_text')} AS e
  FROM chunks),
q AS (
  SELECT doc_id AS query_doc_id, text AS query_text,
         {_md5_embed_sql('text')} AS qe
  FROM documents WHERE doc_id < {_RAG_QUERIES}),
scored AS (
  SELECT q.query_doc_id, q.query_text, ce.doc_id AS cand_doc_id,
         ce.chunk_id, ce.chunk_text,
         ROUND(
           list_sum(list_transform(range(1, {_EMB_DIM} + 1), k -> qe[k] * e[k]))
           / NULLIF(sqrt(list_sum(list_transform(qe, x -> x * x)))
                    * sqrt(list_sum(list_transform(e, x -> x * x))), 0),
           4) AS cos_sim
  FROM q JOIN ce ON ce.doc_id <> q.query_doc_id),
shortlist AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc_id
             ORDER BY cos_sim DESC, cand_doc_id ASC, chunk_id ASC) AS srank
    FROM scored) WHERE srank <= {_RERANK_SHORTLIST}),
rerank AS (
  SELECT query_doc_id, cand_doc_id, chunk_id, cos_sim,
         CAST({_md5_hex4_int_sql("query_text || '##' || chunk_text")}
              AS BIGINT) AS xmatch
  FROM shortlist),
final AS (
  SELECT *, CAST(ROUND(cos_sim * 10000) AS BIGINT) * 65535
              + xmatch * 10000 AS score
  FROM rerank)
SELECT query_doc_id, cand_doc_id, chunk_id, cos_sim, xmatch, score,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_doc_id
            ORDER BY score DESC, cand_doc_id ASC, chunk_id ASC) AS BIGINT)
         AS rank
FROM final
QUALIFY rank <= {_RAG_K}
""".strip(),
)
def rag_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import tokens

    embed = _md5_embed_udf()
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks), F.lit(1)) - 1, F.lit(CHUNK_STRIDE)
    )
    chunk_structs = F.transform(
        starts,
        lambda s: F.struct(
            (s / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice(toks, s + 1, CHUNK_TOKENS)).alias(
                "chunk_text"
            ),
        ),
    )
    ce = docs.select("doc_id", F.explode_outer(chunk_structs).alias("c")).select(
        F.col("doc_id").alias("cand_doc_id"),
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        embed(F.col("c.chunk_text")).alias("e"),
    )
    q = docs.where(F.col("doc_id") < _RAG_QUERIES).select(
        F.col("doc_id").alias("query_doc_id"),
        F.col("text").alias("query_text"),
        embed(F.col("text")).alias("qe"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = F.round(
        dot(F.col("qe"), F.col("e"))
        / F.nullif(
            F.sqrt(dot(F.col("qe"), F.col("qe")))
            * F.sqrt(dot(F.col("e"), F.col("e"))),
            F.lit(0.0),
        ),
        4,
    )
    w1 = Window.partitionBy("query_doc_id").orderBy(
        F.col("cos_sim").desc(),
        F.col("cand_doc_id").asc(),
        F.col("chunk_id").asc(),
    )
    shortlist = (
        F.broadcast(q)
        .join(ce, F.col("cand_doc_id") != F.col("query_doc_id"))
        .select(
            "query_doc_id", "query_text", "cand_doc_id", "chunk_id",
            "chunk_text", cos.alias("cos_sim"),
        )
        .withColumn("srank", F.row_number().over(w1))
        .where(F.col("srank") <= _RERANK_SHORTLIST)
    )
    xmatch = F.conv(
        F.substring(
            F.md5(F.concat_ws("##", F.col("query_text"), F.col("chunk_text"))),
            1, 4,
        ),
        16, 10,
    ).cast("long")
    w2 = Window.partitionBy("query_doc_id").orderBy(
        F.col("score").desc(),
        F.col("cand_doc_id").asc(),
        F.col("chunk_id").asc(),
    )
    return (
        shortlist.withColumn("xmatch", xmatch)
        .withColumn(
            "score",
            F.round(F.col("cos_sim") * 10000).cast("long") * 65535
            + F.col("xmatch") * 10000,
        )
        .withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= _RAG_K)
        .select(
            "query_doc_id", "cand_doc_id", "chunk_id", "cos_sim",
            "xmatch", "score", "rank",
        )
    )


# --- Matryoshka truncation-recall report ----------------------------------
# Matryoshka representation learning [Kusupati et al., NeurIPS'22]
# trains embeddings whose PREFIX dimensions are themselves usable
# vectors; serving stacks exploit it by retrieving with the first d
# dims (d << D) and re-ranking with the full vector. This query is the
# quality surface for choosing d: exact top-k retrieval under each
# prefix length vs the full-dimension baseline, reported as
# recall@k — integer hit counts plus ONE exact int/int IEEE division.
# Ranking uses the repo's rounded-score + vec_id tie-break protocol
# (brute_force_topk), so both engines rank identically; scores are
# never emitted. Scale shape: each prefix run is the documented
# brute-force baseline (broadcast query side); the production path for
# large corpora swaps in the IVF/PQ operators unchanged — this report
# is how you'd validate them per prefix length.

_MAT_DIMS = (8, 16, 32, 64)
_MAT_K = 3


def _matryoshka_oracle() -> str:
    sels = []
    for d in _MAT_DIMS:
        sels.append(
            f"""sel{d} AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           ROUND(
             list_sum(list_transform(range(1, {d} + 1),
                 i -> CAST(q.embedding[i] AS DOUBLE)
                      * CAST(c.embedding[i] AS DOUBLE)))
             / NULLIF(
               sqrt(list_sum(list_transform(list_slice(q.embedding, 1, {d}),
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(list_slice(c.embedding, 1, {d}),
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 0),
             4) AS cos_sim
    FROM q JOIN embeddings c ON q.vec_id <> c.vec_id)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cos_sim DESC, cand_id ASC) <= {_MAT_K})"""
        )
    rows = "\nUNION ALL\n".join(
        f"""SELECT CAST({d} AS BIGINT) AS trunc_dim,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM sel{d} s
        JOIN sel{_MAT_DIMS[-1]} b USING (query_id, cand_id)) AS hits
"""
        for d in _MAT_DIMS
    )
    return (
        f"WITH q AS (SELECT vec_id, embedding FROM embeddings"
        f" WHERE vec_id < {_N_QUERIES}),\n"
        + ",\n".join(sels)
        + f""",
base_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_expected
           FROM sel{_MAT_DIMS[-1]}),
hits AS (
{rows})
SELECT h.trunc_dim, h.hits, b.n_expected,
       CAST(h.hits AS DOUBLE) / CAST(b.n_expected AS DOUBLE) AS recall
FROM hits h, base_n b
""".strip()
    )


@register("embedding_matryoshka_recall", oracle=_matryoshka_oracle())
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    tagged = []
    for d in _MAT_DIMS:
        trunc = emb.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        topk = brute_force_topk(
            trunc.where(F.col("vec_id") < _N_QUERIES), trunc, k=_MAT_K
        ).select(
            F.lit(d).cast("long").alias("trunc_dim"),
            "query_id",
            "cand_id",
        )
        tagged.append(topk)
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionAll(t)
    # tiny (k · n_queries rows); persisted — the full-dim baseline is
    # joined against every prefix length
    base = (
        tagged[-1].select("query_id", "cand_id").persist()
    )
    hits = (
        u.join(base, ["query_id", "cand_id"])
        .groupBy("trunc_dim")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    dims = spark.createDataFrame(
        [(d,) for d in _MAT_DIMS], "trunc_dim LONG"
    )
    n_expected = base.agg(
        F.count(F.lit(1)).alias("n_expected")
    )
    return (
        dims.join(hits, "trunc_dim", "left")
        .select(
            "trunc_dim",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        )
        .crossJoin(F.broadcast(n_expected))
        .select(
            "trunc_dim",
            "hits",
            "n_expected",
            (
                F.col("hits").cast("double")
                / F.col("n_expected").cast("double")
            ).alias("recall"),
        )
    )


# --- signed-random-projection (SimHash-for-vectors) sketch ------------------
# The classic JL/SRP bit sketch: 16 deterministic +-1 hyperplanes; bit b
# is sign(<q, w_b>) where q is the embedding quantized to exact integers
# (floor(x * 2^20) — floor of one IEEE multiply, identical in both
# engines; the float->double widening is exact). Hamming distance on the
# sketch approximates angular distance, so equal-sketch buckets are LSH
# candidates (the vector-side twin of doc_simhash16). Plan: one narrow
# JVM map over the scan (16 zip_with/aggregate expressions), no shuffle,
# no Python — at 100 TB this re-encode parallelizes per-file. Weights
# come from the split-multiply integer mixer (see
# customer_geo_grid_pairs: a bare LCG is linear -> lattice artifacts);
# taking a MIDDLE product bit avoids the low-bit parity bias of a
# product of two parities.

_SRP_BITS = 16
_SRP_DIM = 64
_SRP_QSCALE = 1 << 20


def _srp_weight(d: int, b: int) -> int:
    hv = ((d * _SRP_BITS + b) * 48271 + 11) % 2147483647
    mv = (hv % 100003) * (hv // 100003 + 7)
    return ((mv >> 6) & 1) * 2 - 1


def _srp_oracle() -> str:
    vals = ",".join(
        f"({b},{d},{_srp_weight(d, b)})"
        for b in range(_SRP_BITS)
        for d in range(_SRP_DIM)
    )
    return f"""
WITH wgt(b, d, w) AS (SELECT * FROM (VALUES {vals})),
q AS (
  SELECT e.vec_id, e.label, t.d,
         CAST(FLOOR(CAST(e.embedding[t.d + 1] AS DOUBLE) * {_SRP_QSCALE})
              AS BIGINT) AS qx
  FROM embeddings e, UNNEST(range(len(e.embedding))) AS t(d)),
s AS (
  SELECT q.vec_id, q.label, wgt.b,
         CAST(SUM(q.qx * wgt.w) AS BIGINT) AS dot
  FROM q JOIN wgt ON wgt.d = q.d
  GROUP BY q.vec_id, q.label, wgt.b)
SELECT vec_id, label,
       CAST(SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << b)
                ELSE 0 END) AS BIGINT) AS srp_sketch,
       CAST(SUM(CASE WHEN dot > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_positive
FROM s GROUP BY vec_id, label
""".strip()


@register("embedding_srp_sketch", oracle=_srp_oracle())
def embedding_srp_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qarr = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.lit(_SRP_QSCALE)).cast("long"),
    )
    emb = emb.select("vec_id", "label", qarr.alias("q"))
    dots = []
    for b in range(_SRP_BITS):
        w = F.array(
            *[F.lit(_srp_weight(d, b)) for d in range(_SRP_DIM)]
        )
        dots.append(
            F.aggregate(
                F.zip_with(F.col("q"), w, lambda x, wv: x * wv),
                F.lit(0).cast("long"),
                lambda acc, el: acc + el,
            ).alias(f"dot{b}")
        )
    emb = emb.select("vec_id", "label", *dots)
    sketch = None
    npos = None
    for b in range(_SRP_BITS):
        bit = (F.col(f"dot{b}") > 0).cast("long")
        term = bit * F.lit(1 << b).cast("long")
        sketch = term if sketch is None else sketch + term
        npos = bit if npos is None else npos + bit
    return emb.select(
        "vec_id",
        "label",
        sketch.alias("srp_sketch"),
        npos.cast("long").alias("n_positive"),
    )


# --- SRP-banded embedding near-dup pair join (candidates-then-verify) ------
# The scale path dedup_embedding_cosine's docstring promises: instead
# of the quadratic all-pairs cosine, candidate pairs come from
# pigeonhole bands over the 16-bit SRP sketch — Hamming ≤ 2 on the
# sketch is LOSSLESS under 3 bands (r+1 bands: at least one band is
# untouched by ≤ r flipped bits — the simhash_hamming_pairs theorem
# applied vector-side), and only candidates pay the exact O(dim)
# cosine. Output contract: pairs with sketch-Hamming ≤ 2 AND exact
# cosine ≥ 0.98 over the corpus + constructed perturbed twins (the
# dedup_embedding_cosine fixture). The ORACLE is the quadratic join
# evaluating BOTH predicates directly, so a hash-green row proves the
# banding found exactly the pairs the definition names. At 100 TB:
# sketches are a map-only re-encode (no shuffle), the band join keys
# are (band, ≤6-bit value) ints, and the verify joins ride vec_id —
# nothing quadratic anywhere.

_SRP_PAIR_HAM = 2   # pigeonhole: 3 bands over 16 bits
_SRP_PAIR_TAU = 0.98
_SRP_PAIR_BANDS = ((0, 6), (6, 11), (11, 16))  # [lo, hi) bit ranges


def _srp_pairs_oracle() -> str:
    vals = ",".join(
        f"({b},{d},{_srp_weight(d, b)})"
        for b in range(_SRP_BITS)
        for d in range(_SRP_DIM)
    )
    return f"""
WITH all_vecs AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(range(1, len(embedding) + 1),
             i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) * 1.05
                       ELSE CAST(embedding[i] AS DOUBLE) END)
  FROM embeddings),
wgt(b, d, w) AS (SELECT * FROM (VALUES {vals})),
q AS (
  SELECT v.vec_id, t.d,
         CAST(FLOOR(v.embedding[t.d + 1] * {_SRP_QSCALE}) AS BIGINT) AS qx
  FROM all_vecs v, UNNEST(range(len(v.embedding))) AS t(d)),
s AS MATERIALIZED (
  SELECT q.vec_id,
         CAST(SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << b)
                  ELSE 0 END) AS BIGINT) AS sk
  FROM (SELECT q.vec_id, wgt.b, SUM(q.qx * wgt.w) AS dot
        FROM q JOIN wgt ON wgt.d = q.d GROUP BY q.vec_id, wgt.b) q
  GROUP BY q.vec_id),
pairs AS (
  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         bit_count(xor(sa.sk, sb.sk)) AS hamming,
         ROUND(
           list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> a.embedding[i] * b.embedding[i]))
           / NULLIF(
             sqrt(list_sum(list_transform(a.embedding, x -> x * x)))
             * sqrt(list_sum(list_transform(b.embedding, x -> x * x))), 0),
           4) AS cos_sim
  FROM all_vecs a JOIN all_vecs b ON a.vec_id < b.vec_id
  JOIN s sa ON sa.vec_id = a.vec_id
  JOIN s sb ON sb.vec_id = b.vec_id)
SELECT vec_id_1, vec_id_2, CAST(hamming AS BIGINT) AS hamming, cos_sim
FROM pairs
WHERE hamming <= {_SRP_PAIR_HAM} AND cos_sim >= {_SRP_PAIR_TAU}
""".strip()


@register("embedding_srp_band_pairs", oracle=_srp_pairs_oracle())
def embedding_srp_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    perturbed = emb.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x * 1.05).otherwise(x),
        ).alias("embedding"),
    )
    all_vecs = emb.unionByName(perturbed).withColumn(
        "nrm", _norm(F.col("embedding"))
    )

    qarr = F.transform(
        "embedding",
        lambda x: F.floor(x * F.lit(_SRP_QSCALE)).cast("long"),
    )
    qv = all_vecs.select("vec_id", qarr.alias("q"))
    sketch = None
    for b in range(_SRP_BITS):
        w = F.array(*[F.lit(_srp_weight(d, b)) for d in range(_SRP_DIM)])
        dot = F.aggregate(
            F.zip_with(F.col("q"), w, lambda x, wv: x * wv),
            F.lit(0).cast("long"),
            lambda acc, el: acc + el,
        )
        term = (dot > 0).cast("long") * F.lit(1 << b).cast("long")
        sketch = term if sketch is None else sketch + term
    # Persisted: the sketch table feeds the band explode AND both
    # verify-side joins.
    sk = qv.select("vec_id", sketch.alias("sk")).persist()

    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            (
                F.shiftright("sk", lo).bitwiseAND(F.lit((1 << (hi - lo)) - 1))
            ).alias("bv"),
        )
        for i, (lo, hi) in enumerate(_SRP_PAIR_BANDS)
    ]
    banded = sk.select(
        "vec_id", "sk", F.explode(F.array(*band_structs)).alias("bb")
    ).select("vec_id", "sk", "bb.band", "bb.bv")
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.sk").bitwiseXOR(F.col("b.sk")))
    cands = (
        a.join(b, ["band", "bv"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .where(ham <= _SRP_PAIR_HAM)
        .select(
            F.col("a.vec_id").alias("vec_id_1"),
            F.col("b.vec_id").alias("vec_id_2"),
            ham.cast("long").alias("hamming"),
        )
        .distinct()  # a pair can collide in multiple bands
    )
    va = all_vecs.select(
        F.col("vec_id").alias("vec_id_1"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    vb = all_vecs.select(
        F.col("vec_id").alias("vec_id_2"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(
        dot / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)), 4
    )
    return (
        cands.join(va, "vec_id_1")
        .join(vb, "vec_id_2")
        .select("vec_id_1", "vec_id_2", "hamming", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= _SRP_PAIR_TAU)
    )


# --- int8 quantized dot-product top-k (round 10) --------------------------
# The compressed-domain ANN score the IVF-PQ family approximates,
# taken EXACT: embeddings quantize to int8 with one global
# power-of-two-adjacent scale (q = clamp(round(x·64), ±127) — exact in
# both engines), and the candidate score is the pure INTEGER dot
# product Σ q_a·q_b — no float accumulates anywhere, so ranking is
# bit-deterministic and the whole pipeline takes a full value oracle
# (its float cousins ann_ivf_pq/ann_ivf are rows-only by nature).
# Engine shape: one narrow quantize map, broadcast query side,
# zip_with/aggregate integer dot in whole-stage codegen, row_number
# top-3 keyed per query. At 100 TB this is the int8 rerank pass that
# runs over an IVF shortlist; here it scans all candidates so the
# oracle is total.



@register(
    "embedding_int8_dot_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           GREATEST(-127, LEAST(127,
             CAST(ROUND(CAST(x AS DOUBLE) * {_I8_SCALE}) AS BIGINT))))
           AS qv
  FROM embeddings),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
             i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot_i8
  FROM q a JOIN q b ON a.vec_id < {_N_QUERIES} AND a.vec_id <> b.vec_id),
ranked AS (
  SELECT query_id, cand_id, dot_i8,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY dot_i8 DESC, cand_id ASC) AS BIGINT) AS rank
  FROM pairs)
SELECT query_id, cand_id, dot_i8, rank FROM ranked
WHERE rank <= {_I8_TOPK}
""".strip(),
)
def embedding_int8_dot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding",
        lambda x: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.round(x.cast("double") * F.lit(_I8_SCALE)).cast("long"),
            ),
        ),
    )
    q = emb.select("vec_id", qv.alias("qv"))
    a = q.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qa")
    )
    b = q.select(F.col("vec_id").alias("cand_id"), F.col("qv").alias("qb"))
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, el: acc + el,
    )
    pairs = (
        F.broadcast(a)
        .crossJoin(b)
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", dot.alias("dot_i8"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_i8").desc(), F.col("cand_id").asc()
    )
    return pairs.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= _I8_TOPK)


# --- hard-negative mining (round 10) --------------------------------------
# Contrastive training wants negatives that are CLOSE in embedding
# space but semantically wrong — the highest-scoring candidates with a
# DIFFERENT label than the query. Same exact int8 integer-dot protocol
# as embedding_int8_dot_topk (bit-deterministic ranking, full value
# oracle); the label predicate rides in the candidate join, so the
# per-query state is still a broadcast row and the ranking window is
# query-keyed. At 100 TB this runs over an ANN shortlist instead of
# the full candidate scan; the scoring and selection logic is
# identical.

@register(
    "embedding_hard_negatives",
    oracle=f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding, x ->
           GREATEST(-127, LEAST(127,
             CAST(ROUND(CAST(x AS DOUBLE) * {_I8_SCALE}) AS BIGINT))))
           AS qv
  FROM embeddings),
pairs AS (
  SELECT a.vec_id AS query_id, a.label AS query_label,
         b.vec_id AS neg_id, b.label AS neg_label,
         CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
             i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot_i8
  FROM q a JOIN q b
    ON a.vec_id < {_N_QUERIES} AND a.vec_id <> b.vec_id
   AND a.label <> b.label),
ranked AS (
  SELECT query_id, query_label, neg_id, neg_label, dot_i8,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY dot_i8 DESC, neg_id ASC) AS BIGINT) AS rank
  FROM pairs)
SELECT query_id, query_label, neg_id, neg_label, dot_i8, rank
FROM ranked WHERE rank <= {_I8_TOPK}
""".strip(),
)
def embedding_hard_negatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding",
        lambda x: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.round(x.cast("double") * F.lit(_I8_SCALE)).cast("long"),
            ),
        ),
    )
    q = emb.select("vec_id", "label", qv.alias("qv"))
    a = q.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("qv").alias("qa"),
    )
    b = q.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("qv").alias("qb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, el: acc + el,
    )
    pairs = (
        F.broadcast(a)
        .crossJoin(b)
        .where(
            (F.col("query_id") != F.col("neg_id"))
            & (F.col("query_label") != F.col("neg_label"))
        )
        .select(
            "query_id", "query_label", "neg_id", "neg_label",
            dot.alias("dot_i8"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_i8").desc(), F.col("neg_id").asc()
    )
    return pairs.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= _I8_TOPK)


# --- per-label embedding separation (int8 exact-integer protocol) ----------
# (round 11) The classifier-dataset health check: do same-label vectors
# sit closer than cross-label ones? Everything reduces to EXACT BIGINT
# dot-statistics of the int8-quantized vectors (embedding_quantize_int8
# protocol):  per (label, dim) sums  s_d  give  Σ_{i,j∈c} q_i·q_j =
# Σ_d s_d²  (minus the Σ|q_i|² diagonal for i≠j pairs), and the global
# per-dim sums t_d give the cross-label mass  Σ_d s_d·(t_d − s_d).
# Mean within/cross dots are single double divisions of exact integers.
# Engine shape: one narrow quantize map, a posexplode to (label, dim)
# keyed sums (64·N rows — the dim fan-out is a constant factor), one
# broadcast of the 64-row global dim sums, two tiny aggregates. No
# pairwise joins anywhere: the n² pair space is collapsed by algebra.

@register(
    "embedding_label_separation",
    oracle="""
WITH q AS (
  SELECT vec_id, label,
         CASE WHEN list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) = 0
              THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
              ELSE list_transform(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE)
                        / (list_max(list_transform(embedding,
                             y -> abs(CAST(y AS DOUBLE)))) / 127.0))
                        AS BIGINT))
         END AS qv
  FROM embeddings),
qd AS (
  SELECT label, d.i AS dim, d.q
  FROM q, UNNEST(list_transform(range(1, len(qv) + 1), i ->
         struct_pack(i := i, q := qv[i]))) AS u(d)),
sums AS (
  SELECT label, dim, CAST(SUM(q) AS BIGINT) AS sd,
         CAST(SUM(q * q) AS BIGINT) AS sq
  FROM qd GROUP BY label, dim),
tot AS (
  SELECT dim, CAST(SUM(sd) AS BIGINT) AS td FROM sums GROUP BY dim),
pl AS (
  SELECT s.label,
         CAST(SUM(s.sd * s.sd) AS BIGINT) AS self_dot,
         CAST(SUM(s.sq) AS BIGINT) AS diag_dot,
         CAST(SUM(s.sd * (t.td - s.sd)) AS BIGINT) AS cross_dot
  FROM sums s JOIN tot t ON t.dim = s.dim
  GROUP BY s.label),
n AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM q GROUP BY label),
nt AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total FROM n)
SELECT n.label, n.n_vecs,
       pl.self_dot - pl.diag_dot AS within_pair_dot,
       pl.cross_dot,
       CAST(pl.self_dot - pl.diag_dot AS DOUBLE)
         / (CAST(n.n_vecs AS DOUBLE) * (n.n_vecs - 1)) AS within_mean,
       CAST(pl.cross_dot AS DOUBLE)
         / (CAST(n.n_vecs AS DOUBLE) * (nt.n_total - n.n_vecs))
         AS cross_mean
FROM n JOIN pl ON pl.label = n.label, nt
""".strip(),
)
def embedding_label_separation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x)))) / (
        127.0
    )
    qv = F.when(
        scale == 0,
        F.transform("embedding", lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            "embedding", lambda x: F.round(xd(x) / scale).cast("long")
        )
    )
    q = emb.select("vec_id", "label", qv.alias("qv")).persist()
    qd = q.select(
        "label", F.posexplode("qv").alias("dim", "qq")
    )
    sums = qd.groupBy("label", "dim").agg(
        F.sum("qq").cast("long").alias("sd"),
        F.sum(F.col("qq") * F.col("qq")).cast("long").alias("sq"),
    )
    tot = F.broadcast(
        sums.groupBy("dim").agg(F.sum("sd").cast("long").alias("td"))
    )
    pl = (
        sums.join(tot, "dim")
        .groupBy("label")
        .agg(
            F.sum(F.col("sd") * F.col("sd")).cast("long").alias("self_dot"),
            F.sum("sq").cast("long").alias("diag_dot"),
            F.sum(F.col("sd") * (F.col("td") - F.col("sd")))
            .cast("long")
            .alias("cross_dot"),
        )
    )
    n = q.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    nt = F.broadcast(
        n.agg(F.sum("n_vecs").cast("long").alias("n_total"))
    )
    return (
        n.join(pl, "label")
        .crossJoin(nt)
        .select(
            "label",
            "n_vecs",
            (F.col("self_dot") - F.col("diag_dot")).alias(
                "within_pair_dot"
            ),
            "cross_dot",
            (
                (F.col("self_dot") - F.col("diag_dot")).cast("double")
                / (
                    F.col("n_vecs").cast("double")
                    * (F.col("n_vecs") - 1)
                )
            ).alias("within_mean"),
            (
                F.col("cross_dot").cast("double")
                / (
                    F.col("n_vecs").cast("double")
                    * (F.col("n_total") - F.col("n_vecs"))
                )
            ).alias("cross_mean"),
        )
    )


# --- deterministic grid-IVF top-k (round 11) --------------------------------
# The index-probe PLAN SHAPE of IVF, in the SQL tier: ann_ivf_topk's
# Lloyd codebook is inherently seeded (rows-only by design), so this
# twin replaces the learned coarse quantizer with a DETERMINISTIC
# grid-file cell map [Nievergelt et al. '84] that both engines replay
# exactly: two ±1-signed integer projections of the int8-quantized
# vectors (sign of (a·d + b) mod P — the affine-hash protocol), each
# equi-width-binned into 8 cells between the global min/max with pure
# integer arithmetic ((p − lo)·B div (hi − lo + 1) ∈ [0, B−1]).
# Queries probe their 3×3 cell neighborhood through a HASH JOIN on the
# cell key — the honest inverted-list probe: candidates arrive by key
# equality, never a corpus scan — then exact int8 dots rank the
# shortlist (top-3, id tie-break). At 100 TB the cell table is
# partitioned by cell key and probes touch only matching partitions.

_ANN_GRID_ORACLE = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           GREATEST(-127, LEAST(127,
             CAST(ROUND(CAST(x AS DOUBLE) * {_I8_SCALE}) AS BIGINT))))
           AS qv
  FROM embeddings),
p AS (
  SELECT vec_id, qv,
         CAST(list_sum(list_transform(range(1, len(qv) + 1),
             i -> {_grid_sign_sql(*_GRID_P1)})) AS BIGINT) AS p1,
         CAST(list_sum(list_transform(range(1, len(qv) + 1),
             i -> {_grid_sign_sql(*_GRID_P2)})) AS BIGINT) AS p2
  FROM q),
mm AS (
  SELECT MIN(p1) AS l1, MAX(p1) AS h1, MIN(p2) AS l2, MAX(p2) AS h2
  FROM p),
binned AS (
  SELECT vec_id, qv,
         (p1 - l1) * {_GRID_B} // (h1 - l1 + 1) AS c1,
         (p2 - l2) * {_GRID_B} // (h2 - l2 + 1) AS c2
  FROM p, mm),
probe AS (
  SELECT b.vec_id AS query_id, b.qv AS qa,
         b.c1 + d1.x AS c1, b.c2 + d2.x AS c2
  FROM binned b, UNNEST([-1, 0, 1]) AS d1(x), UNNEST([-1, 0, 1]) AS d2(x)
  WHERE b.vec_id < {_N_QUERIES}),
cand AS (
  SELECT pr.query_id, b.vec_id AS cand_id,
         CAST(list_sum(list_transform(range(1, len(pr.qa) + 1),
             i -> pr.qa[i] * b.qv[i])) AS BIGINT) AS dot_i8
  FROM probe pr JOIN binned b
    ON b.c1 = pr.c1 AND b.c2 = pr.c2 AND b.vec_id <> pr.query_id),
ranked AS (
  SELECT query_id, cand_id, dot_i8,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY dot_i8 DESC, cand_id ASC) AS BIGINT) AS rank
  FROM cand)
SELECT query_id, cand_id, dot_i8, rank FROM ranked
WHERE rank <= {_I8_TOPK}
""".strip()


def _grid_binned(emb: DataFrame) -> DataFrame:
    """(vec_id, qv, c1, c2): int8-quantized vectors binned into the
    deterministic 2-projection grid — the index build shared by
    ann_grid_topk and the multi-method ann_recall_report."""
    qv = F.transform(
        "embedding",
        lambda x: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.round(x.cast("double") * F.lit(_I8_SCALE)).cast("long"),
            ),
        ),
    )

    def proj(a: int, b: int):
        # element index is 0-based Spark-side == (i-1) oracle-side
        return F.aggregate(
            F.zip_with(
                F.col("qv"),
                F.sequence(F.lit(0), F.size("qv") - 1),
                lambda x, d: F.when(
                    ((F.lit(a) * d + F.lit(b)) % _GRID_MOD) % 2 == 0, x
                ).otherwise(-x),
            ),
            F.lit(0).cast("long"),
            lambda acc, el: acc + el,
        )

    p = emb.select(
        "vec_id",
        qv.alias("qv"),
    ).select(
        "vec_id",
        "qv",
        proj(*_GRID_P1).alias("p1"),
        proj(*_GRID_P2).alias("p2"),
    ).persist()  # scalar min/max + the binned map both consume it
    mm = F.broadcast(
        p.agg(
            F.min("p1").alias("l1"),
            F.max("p1").alias("h1"),
            F.min("p2").alias("l2"),
            F.max("p2").alias("h2"),
        )
    )
    return p.crossJoin(mm).select(
        "vec_id",
        "qv",
        F.expr(f"(p1 - l1) * {_GRID_B} div (h1 - l1 + 1)").alias("c1"),
        F.expr(f"(p2 - l2) * {_GRID_B} div (h2 - l2 + 1)").alias("c2"),
    )


@register("ann_grid_topk", oracle=_ANN_GRID_ORACLE)
def ann_grid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    binned = _grid_binned(load_table(spark, sf_dir, "embeddings"))
    offs = F.array([F.lit(-1), F.lit(0), F.lit(1)])
    probe = (
        binned.where(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qv").alias("qa"),
            F.explode(offs).alias("d1"),
            "c1",
            "c2",
        )
        .select(
            "query_id",
            "qa",
            (F.col("c1") + F.col("d1")).alias("c1"),
            F.explode(offs).alias("d2"),
            "c2",
        )
        .select(
            "query_id", "qa", "c1", (F.col("c2") + F.col("d2")).alias("c2")
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, el: acc + el,
    )
    cand = (
        F.broadcast(probe)
        .join(binned, ["c1", "c2"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), dot.alias("dot_i8")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_i8").desc(), F.col("cand_id").asc()
    )
    return cand.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= _I8_TOPK)


# --- grid-IVF recall report, fully value-oracled (round 11) -----------------
# ann_recall_report (LSH/IVF vs exact) stays rows-only because the IVF
# codebook is seeded; this twin measures the DETERMINISTIC grid index
# (ann_grid_topk) against the exact int8 brute force, so the whole
# quality report — per-query hit counts and recall@k — is a pure
# function of the data and hash-matches in DuckDB. The evaluation
# pattern ("recall as a query") at full value-oracle strength.

@register(
    "ann_grid_recall_report",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x ->
           GREATEST(-127, LEAST(127,
             CAST(ROUND(CAST(x AS DOUBLE) * {_I8_SCALE}) AS BIGINT))))
           AS qv
  FROM embeddings),
exact_pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
             i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot_i8
  FROM q a JOIN q b ON a.vec_id < {_N_QUERIES} AND a.vec_id <> b.vec_id),
exact_top AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY dot_i8 DESC, cand_id ASC) AS rank
    FROM exact_pairs) WHERE rank <= {_I8_TOPK}),
p AS (
  SELECT vec_id, qv,
         CAST(list_sum(list_transform(range(1, len(qv) + 1),
             i -> {_grid_sign_sql(*_GRID_P1)})) AS BIGINT) AS p1,
         CAST(list_sum(list_transform(range(1, len(qv) + 1),
             i -> {_grid_sign_sql(*_GRID_P2)})) AS BIGINT) AS p2
  FROM q),
mm AS (
  SELECT MIN(p1) AS l1, MAX(p1) AS h1, MIN(p2) AS l2, MAX(p2) AS h2
  FROM p),
binned AS (
  SELECT vec_id, qv,
         (p1 - l1) * {_GRID_B} // (h1 - l1 + 1) AS c1,
         (p2 - l2) * {_GRID_B} // (h2 - l2 + 1) AS c2
  FROM p, mm),
probe AS (
  SELECT b.vec_id AS query_id, b.qv AS qa,
         b.c1 + d1.x AS c1, b.c2 + d2.x AS c2
  FROM binned b, UNNEST([-1, 0, 1]) AS d1(x), UNNEST([-1, 0, 1]) AS d2(x)
  WHERE b.vec_id < {_N_QUERIES}),
grid_top AS (
  SELECT query_id, cand_id FROM (
    SELECT pr.query_id, b.vec_id AS cand_id,
           ROW_NUMBER() OVER (PARTITION BY pr.query_id
             ORDER BY CAST(list_sum(list_transform(
                        range(1, len(pr.qa) + 1),
                        i -> pr.qa[i] * b.qv[i])) AS BIGINT) DESC,
                      b.vec_id ASC) AS rank
    FROM probe pr JOIN binned b
      ON b.c1 = pr.c1 AND b.c2 = pr.c2 AND b.vec_id <> pr.query_id)
  WHERE rank <= {_I8_TOPK})
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN g.cand_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       CAST(SUM(CASE WHEN g.cand_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS recall
FROM exact_top e
LEFT JOIN grid_top g
  ON g.query_id = e.query_id AND g.cand_id = e.cand_id
GROUP BY e.query_id
""".strip(),
)
def ann_grid_recall_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    exact = (
        embedding_int8_dot_topk(spark, sf_dir)
        .select("query_id", "cand_id")
    )
    grid = ann_grid_topk(spark, sf_dir).select(
        "query_id", F.col("cand_id").alias("g_cand")
    )
    j = exact.join(
        grid,
        (exact["query_id"] == grid["query_id"])
        & (exact["cand_id"] == grid["g_cand"]),
        "left",
    ).select(exact["query_id"].alias("qid"), "cand_id", "g_cand")
    return (
        j.groupBy(F.col("qid").alias("query_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(F.col("g_cand").isNotNull().cast("int"))
            .cast("long")
            .alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            (
                F.col("n_hit").cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
    )


# --- top principal direction by integer power iteration (round 11b) --------
# Distributed PCA's first step as an EXACT cross-engine protocol: the
# top eigendirection of the embedding covariance, computed the way a
# 100 TB job actually does it — one pass builds the dim x dim Gram
# from per-row outer products (a NARROW map: each row emits its 64x64
# products into the partial aggregate, no self-join, no shuffle of the
# fact table beyond the 4096-key agg exchange), then power iteration
# runs on the DIMENSION-SIZED matrix. Determinism protocol: vectors
# are int8-quantized (the embedding_quantize_int8 expressions), so
# Gram G, per-dim sums S, and the centered C_ij = G_ij - (S_i*S_j)
# div n are exact BIGINTs (the div truncation — toward zero in BOTH
# engines, verified — costs at most 1 per entry); each of the 8
# rounds rescales u to +/-1000 by integer division, the
# events_markov_stationary protocol. The all-ones start vector pins
# the eigenvector's sign. 2^63 envelope: |C| <= 2n*127^2, so
# u <= 64*|C|*1000 stays exact through n ~ 4e9 vectors.

_PC_DIM = 64  # embeddings fixture dimension
_PC_ROUNDS = 8
_PC_SCALE = 1_000


def _pc_oracle_sql() -> str:
    rounds = [
        f"v0 AS (SELECT i, CAST({_PC_SCALE} AS BIGINT) AS v "
        f"FROM range(1, {_PC_DIM + 1}) t(i))"
    ]
    # every u/v is MATERIALIZED: default CTE inlining re-evaluates u in
    # both the v and m branches, doubling the plan per round (the same
    # 2^rounds blow-up the Spark side truncates with localCheckpoint).
    for r in range(1, _PC_ROUNDS + 1):
        rounds.append(
            f"u{r} AS MATERIALIZED (SELECT c.i AS i, "
            f"CAST(SUM(c.c * v{r - 1}.v) AS BIGINT)"
            f" AS u FROM c JOIN v{r - 1} ON v{r - 1}.i = c.j GROUP BY c.i)"
        )
        rounds.append(
            f"m{r} AS (SELECT CAST(GREATEST(MAX(ABS(u)), 1) AS BIGINT) AS m "
            f"FROM u{r})"
        )
        rounds.append(
            f"v{r} AS MATERIALIZED (SELECT i, "
            f"CAST((u * {_PC_SCALE}) // m AS BIGINT) AS v "
            f"FROM u{r} CROSS JOIN m{r})"
        )
    return (
        f"""
WITH sc AS MATERIALIZED (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
  FROM embeddings),
q AS MATERIALIZED (
  SELECT vec_id,
         CASE WHEN scale = 0
              THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE) / scale) AS INTEGER))
         END AS qv
  FROM sc),
x AS MATERIALIZED (
  SELECT vec_id, t.i AS i, qv[t.i] AS q
  FROM q, range(1, {_PC_DIM + 1}) t(i)),
s AS (SELECT i, CAST(SUM(q) AS BIGINT) AS s FROM x GROUP BY i),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
g AS (
  SELECT a.i AS i, b.i AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS g
  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
c AS MATERIALIZED (
  SELECT g.i, g.j,
         CAST(g.g - (si.s * sj.s) // n.n AS BIGINT) AS c
  FROM g JOIN s si ON si.i = g.i JOIN s sj ON sj.i = g.j CROSS JOIN n),
"""
        + ",\n".join(rounds)
        + f"\nSELECT i AS dim, v AS comp_scaled FROM v{_PC_ROUNDS}"
    ).strip()


@register("embedding_top_pc_power", oracle=_pc_oracle_sql())
def embedding_top_pc_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    amax = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x))))
    quant = F.when(
        amax == 0, F.transform("embedding", lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            "embedding",
            lambda x: F.round(xd(x) / (amax / 127.0)).cast("int"),
        )
    )
    q = emb.select(quant.alias("qv")).persist()
    # per-dim sums (one narrow explode + 64-key agg)
    s = (
        q.select(F.posexplode("qv").alias("pos", "qe"))
        .groupBy((F.col("pos") + 1).cast("long").alias("i"))
        .agg(F.sum("qe").cast("long").alias("s"))
    )
    # Gram via per-row outer products: each row emits its dim^2
    # products straight into the partial aggregate — a narrow map, the
    # plan a 100 TB X^T X actually wants (no fact-table self-join).
    # flat int array, (i, j) recovered from the position — structs per
    # product would triple the exploded volume for nothing
    pairs = F.flatten(
        F.transform(
            "qv",
            lambda x: F.transform(F.col("qv"), lambda y: x * y),
        )
    )
    g = (
        q.select(F.posexplode(pairs).alias("pos", "p"))
        .groupBy(
            (F.expr(f"pos div {_PC_DIM}") + 1).cast("long").alias("i"),
            (F.col("pos") % _PC_DIM + 1).cast("long").alias("j"),
        )
        .agg(F.sum("p").cast("long").alias("g"))
    )
    n = q.agg(F.count(F.lit(1)).cast("long").alias("n"))
    si = F.broadcast(s.select(F.col("i").alias("_si"), F.col("s").alias("s_i")))
    sj = F.broadcast(s.select(F.col("i").alias("_sj"), F.col("s").alias("s_j")))
    c = (
        g.join(si, g["i"] == si["_si"])
        .join(sj, g["j"] == sj["_sj"])
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (F.col("g") - F.expr("(s_i * s_j) div n"))
            .cast("long")
            .alias("c"),
        )
    )
    # BOUNDED driver collect (the codebook-fit convention): C is
    # dim^2 = 4096 rows whatever the corpus size — the distributed work
    # (quantize + Gram partial-agg) is done; iterating a 64x64 fixpoint
    # through 8 Spark jobs is pure scheduling overhead (first cut spent
    # ~3 s on 8 eager localCheckpoint rounds), so the matvec runs in
    # unbounded Python ints with the SAME trunc-toward-zero div the SQL
    # oracle uses. Exactness is pinned by the pytest bigint replica.
    cm = {(r["i"], r["j"]): r["c"] for r in c.collect()}
    v = [_PC_SCALE] * _PC_DIM
    tz = (
        lambda a, b: -((-a) // b) if (a < 0) != (b < 0) else a // b
    )  # noqa: E731 — SQL div semantics (truncate toward zero)
    for _ in range(_PC_ROUNDS):
        u = [
            sum(
                cm.get((i + 1, j + 1), 0) * v[j]
                for j in range(_PC_DIM)
            )
            for i in range(_PC_DIM)
        ]
        m = max(max(abs(x) for x in u), 1)
        v = [tz(x * _PC_SCALE, m) for x in u]
    return spark.createDataFrame(
        [(i + 1, v[i]) for i in range(_PC_DIM)],
        "dim LONG, comp_scaled LONG",
    )


# --- deterministic distributed Lloyd (round 13) -------------------------------
# The KMeans track's VALUE-TIER twin (VERDICT r12 #4): MLlib
# kmeans_anomaly / kmeans_model_selection stay as the API-parity rows
# tier (seeded MLlib fits are not bit-reproducible across engines);
# these two queries re-express the same capability — Lloyd iterations +
# an inertia-based model-selection profile — under the repo's
# exact-integer protocol so every value hashes across engines:
# embeddings quantized to a 10^-3 grid (FLOOR(x·1000 + 0.5) — identical
# IEEE double ops in Spark and DuckDB), centroids updated with
# truncating integer division (Spark `div` ≡ DuckDB `//`, both
# truncate toward zero — probe-verified), assignment argmin with the
# (distance, cluster) total order. Init = the k smallest vec_ids'
# vectors (deterministic, SQL-expressible). The distributed shape is
# exactly MLlib's: broadcast k·dim centroid literals, one
# assignment+partial-agg pass per round (map-side combine on
# (cluster, dim)), only k·dim+k rows ever reach the driver per round —
# the sanctioned bounded collect of the codebook fits
# (operators/similarity.py). Empty clusters drop (documented;
# deterministic on both sides). Oracle = the same Lloyd loop unrolled
# as chained CTEs over the long-form (vec_id, dim, x) table.

_KMD_ROUNDS = 4
_KMD_K = 4
_KMD_PROFILE_KS = (2, 3, 4, 5)


def _kmd_quant_expr() -> str:
    return (
        "transform(embedding, x -> "
        "CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0D + 0.5D) AS BIGINT))"
    )


def _kmd_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_kmd_quant_expr()).alias("qe")
    )


def _kmd_dist_sql(cent: list[int]) -> str:
    arr = "array(" + ",".join(f"{v}L" for v in cent) + ")"
    return (
        f"aggregate(zip_with(qe, {arr}, (a, b) -> (a - b) * (a - b)), "
        "0L, (s, v) -> s + v)"
    )


def _kmd_assign_expr(cents: list[tuple[int, list[int]]]) -> str:
    structs = ",".join(
        f"named_struct('d', {_kmd_dist_sql(c)}, 'c', CAST({j} AS BIGINT))"
        for j, c in cents
    )
    return f"array_min(array({structs}))"


def _tdiv(s: int, n: int) -> int:
    """Truncating integer division (toward zero) — Python // floors,
    Spark `div` and DuckDB `//` truncate; match the engines."""
    q = abs(s) // n
    return q if s >= 0 else -q


def _kmd_fit(
    emb: DataFrame, k: int, rounds: int
) -> list[tuple[int, list[int]]]:
    """Run `rounds` Lloyd updates, collecting only k·dim sums + k counts
    per round; returns the post-round-`rounds` centroids (empty
    clusters dropped)."""
    init = emb.orderBy("vec_id").limit(k).collect()
    cents = [(j, [int(v) for v in r["qe"]]) for j, r in enumerate(init)]
    for _ in range(rounds):
        stats = (
            emb.withColumn(
                "cluster", F.expr(_kmd_assign_expr(cents) + ".c")
            )
            .select("cluster", F.posexplode("qe").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_c: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_c.setdefault(int(r["cluster"]), {})[int(r["dim"])] = (
                int(r["s"]),
                int(r["n"]),
            )
        cents = [
            (c, [_tdiv(*dims[d]) for d in sorted(dims)])
            for c, dims in sorted(by_c.items())
        ]
    return cents


def _kmd_round_ctes(k: int, rounds: int, p: str) -> str:
    """Chained-CTE Lloyd unroll with CTE names prefixed `p` (so the
    profile oracle can hold four independent chains)."""
    ctes = [
        f"""{p}init AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster
  FROM q ORDER BY vec_id LIMIT {k}),
{p}c0 AS MATERIALIZED (
  SELECT i.cluster, e.dim, e.x AS c FROM {p}init i JOIN e USING (vec_id))"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""{p}a{r} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY SUM((e.x - c.c) * (e.x - c.c)) ASC, c.cluster ASC
           ) AS rn
    FROM e JOIN {p}c{r - 1} c USING (dim)
    GROUP BY e.vec_id, c.cluster)
  WHERE rn = 1),
{p}c{r} AS MATERIALIZED (
  SELECT a.cluster, e.dim, CAST(SUM(e.x) // COUNT(*) AS BIGINT) AS c
  FROM {p}a{r} a JOIN e USING (vec_id)
  GROUP BY 1, 2)"""
        )
    return ",\n".join(ctes)


_KMD_BASE = """q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))
           AS qe
  FROM embeddings),
e AS MATERIALIZED (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, qe[i] AS x
  FROM q, LATERAL (SELECT UNNEST(generate_series(1, len(qe))) AS i) g)"""


def _kmd_track_oracle() -> str:
    r = _KMD_ROUNDS
    return f"""
WITH {_KMD_BASE},
{_kmd_round_ctes(_KMD_K, r, "")},
n AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_points
      FROM a{r} GROUP BY 1)
SELECT c.cluster, c.dim, c.c AS centroid_q, n.n_points
FROM c{r} c JOIN n USING (cluster)
""".strip()


@register("kmeans_track_deterministic", oracle=_kmd_track_oracle())
def kmeans_track_deterministic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _kmd_emb(spark, sf_dir).localCheckpoint(eager=True)
    cents = _kmd_fit(emb, _KMD_K, _KMD_ROUNDS - 1)
    # final round distributed: the returned plan IS round R's
    # assignment + update (same partial-agg shape the loop collected)
    asg = emb.withColumn("cluster", F.expr(_kmd_assign_expr(cents) + ".c"))
    stats = (
        asg.select("cluster", F.posexplode("qe").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    return stats.select(
        "cluster",
        F.col("dim").cast("long").alias("dim"),
        F.expr("s div n").alias("centroid_q"),
        F.col("n").alias("n_points"),
    )


def _kmd_profile_oracle() -> str:
    r = _KMD_ROUNDS
    chains = ",\n".join(
        _kmd_round_ctes(k, r, f"k{k}_") for k in _KMD_PROFILE_KS
    )
    rows = "\nUNION ALL\n".join(
        f"""SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(COUNT(DISTINCT cluster) AS BIGINT)
        FROM k{k}_c{r}) AS n_clusters,
       (SELECT CAST(SUM(md) AS BIGINT) FROM (
          SELECT MIN(d) AS md FROM (
            SELECT e.vec_id, SUM((e.x - c.c) * (e.x - c.c)) AS d
            FROM e JOIN k{k}_c{r} c USING (dim)
            GROUP BY e.vec_id, c.cluster) t
          GROUP BY vec_id) m) AS inertia"""
        for k in _KMD_PROFILE_KS
    )
    return f"WITH {_KMD_BASE},\n{chains}\n{rows}"


@register("kmeans_inertia_profile", oracle=_kmd_profile_oracle())
def kmeans_inertia_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic model selection: the inertia elbow profile over
    k ∈ {2,3,4,5}, each fit = _KMD_ROUNDS exact-integer Lloyd rounds;
    the value-tier twin of the MLlib silhouette-based
    kmeans_model_selection (which stays rows-tier: seeded MLlib fits
    don't hash across engines)."""
    emb = _kmd_emb(spark, sf_dir).localCheckpoint(eager=True)
    out: DataFrame | None = None
    for k in _KMD_PROFILE_KS:
        cents = _kmd_fit(emb, k, _KMD_ROUNDS)
        inert = (
            emb.select(
                F.expr(_kmd_assign_expr(cents) + ".d").alias("d")
            )
            .agg(F.sum("d").cast("long").alias("inertia"))
            .select(
                F.lit(k).cast("long").alias("k"),
                F.lit(len(cents)).cast("long").alias("n_clusters"),
                "inertia",
            )
        )
        out = inert if out is None else out.unionByName(inert)
    return out


# --- deterministic product-quantization training + encoding (round 13) -------
# The PQ half of the IVF-PQ family re-expressed under the exact-integer
# protocol (the kmeans_track_deterministic companion): split the
# 64-dim embedding into 8 contiguous 8-dim subspaces, train an
# independent k=4 codebook per subspace with 2 exact-integer Lloyd
# rounds (truncating-div centroid updates, (distance, cluster) argmin
# order), then encode every vector — (vec_id, subspace, code,
# reconstruction error). Unlike the driver-collect Lloyd track, this
# one is FULLY distributed: centroids live in a (subspace, cluster,
# dim, c) frame (8·4·8 = 256 rows, broadcast by AQE), each round is
# two shuffles over the long-form (vec_id, subspace, dim, x) table —
# the layout a 100 TB PQ trainer actually uses (codebook state is
# tiny and global; the data table is the only big fact, re-joined per
# round). Init = the k smallest vec_ids' subvectors. MLlib-free and
# bit-identical in any engine; ann_ivf_pq_topk stays as the seeded
# API-parity rows tier.

_PQ_SUBS = 8
_PQ_SUBDIM = 8
_PQ_K = 4
_PQ_ROUNDS = 2


def _pq_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, subspace, dim, x) — quantized long form; dim is the
    position WITHIN the subspace (0-based)."""
    return (
        _kmd_emb(spark, sf_dir)
        .select("vec_id", F.posexplode("qe").alias("gdim", "x"))
        .select(
            "vec_id",
            (F.col("gdim") / _PQ_SUBDIM).cast("long").alias("subspace"),
            (F.col("gdim") % _PQ_SUBDIM).cast("long").alias("dim"),
            "x",
        )
    )


def _pq_assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, subspace, code, err) — argmin cluster per (vec,
    subspace) under the (dist, cluster) total order."""
    d = (
        e.join(F.broadcast(cents), on=["subspace", "dim"])
        .groupBy("vec_id", "subspace", "cluster")
        .agg(
            F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
            .cast("long")
            .alias("dist")
        )
    )
    best = d.groupBy("vec_id", "subspace").agg(
        F.min(F.struct("dist", "cluster")).alias("b")
    )
    return best.select(
        "vec_id",
        "subspace",
        F.col("b.cluster").alias("code"),
        F.col("b.dist").alias("err_q"),
    )


def _pq_oracle() -> str:
    ctes = [
        f"""q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))
           AS qe
  FROM embeddings),
e AS MATERIALIZED (
  SELECT vec_id,
         CAST((i - 1) // {_PQ_SUBDIM} AS BIGINT) AS subspace,
         CAST((i - 1) % {_PQ_SUBDIM} AS BIGINT) AS dim,
         qe[i] AS x
  FROM q, LATERAL (SELECT UNNEST(generate_series(1, len(qe))) AS i) g),
init AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster
  FROM q ORDER BY vec_id LIMIT {_PQ_K}),
c0 AS MATERIALIZED (
  SELECT e.subspace, i.cluster, e.dim, e.x AS c
  FROM init i JOIN e USING (vec_id))"""
    ]
    for r in range(1, _PQ_ROUNDS + 1):
        ctes.append(
            f"""a{r} AS MATERIALIZED (
  SELECT vec_id, subspace, cluster FROM (
    SELECT e.vec_id, e.subspace, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id, e.subspace
             ORDER BY SUM((e.x - c.c) * (e.x - c.c)) ASC, c.cluster ASC
           ) AS rn
    FROM e JOIN c{r - 1} c ON c.subspace = e.subspace AND c.dim = e.dim
    GROUP BY e.vec_id, e.subspace, c.cluster)
  WHERE rn = 1),
c{r} AS MATERIALIZED (
  SELECT a.subspace, a.cluster, e.dim,
         CAST(SUM(e.x) // COUNT(*) AS BIGINT) AS c
  FROM a{r} a JOIN e ON e.vec_id = a.vec_id AND e.subspace = a.subspace
  GROUP BY 1, 2, 3)"""
        )
    return f"""
WITH {",".join(ctes)}
SELECT vec_id, subspace, CAST(cluster AS BIGINT) AS code,
       CAST(dist AS BIGINT) AS err_q
FROM (
  SELECT e.vec_id, e.subspace, c.cluster,
         SUM((e.x - c.c) * (e.x - c.c)) AS dist,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id, e.subspace
           ORDER BY SUM((e.x - c.c) * (e.x - c.c)) ASC, c.cluster ASC
         ) AS rn
  FROM e JOIN c{_PQ_ROUNDS} c ON c.subspace = e.subspace AND c.dim = e.dim
  GROUP BY e.vec_id, e.subspace, c.cluster) t
WHERE rn = 1
""".strip()


@register("pq_train_codes", oracle=_pq_oracle())
def pq_train_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _pq_long(spark, sf_dir).localCheckpoint(eager=True)
    # init: the k smallest vec_ids' subvectors, cluster = vec_id rank
    first_ids = (
        e.select("vec_id").distinct().orderBy("vec_id").limit(_PQ_K)
    )
    ranked = first_ids.select(
        "vec_id",
        (
            F.row_number().over(Window.orderBy("vec_id")) - 1
        ).cast("long").alias("cluster"),
    )
    cents = (
        e.join(ranked, on="vec_id")
        .select("subspace", "cluster", "dim", F.col("x").alias("c"))
        .localCheckpoint(eager=True)
    )
    for _r in range(_PQ_ROUNDS):
        asg = _pq_assign(e, cents)
        cents = (
            asg.join(e, on=["vec_id", "subspace"])
            .groupBy("subspace", F.col("code").alias("cluster"), "dim")
            .agg(F.expr("CAST(sum(x) div count(1) AS BIGINT)").alias("c"))
            .localCheckpoint(eager=True)
        )
    return _pq_assign(e, cents)


# --- deterministic SemDeDup (round 13) ----------------------------------------
# The VALUE-TIER twin of dedup_semdedup (which stays rows-tier: its
# codebook fit is seeded-random): SemDeDup [Abbas et al. 2023] =
# cluster the embedding space, then flag near-duplicate pairs WITHIN
# each cluster. Same PLANTED fixture as the rows-tier twin (every
# vector gets a +100000-id copy with dim 0 scaled 1.05x — cosine
# ~0.999 vs a 0.51 max between genuine vectors, so the planted pairs
# ARE the ground truth), but both stages re-expressed under the
# exact-integer protocol: cells = the deterministic Lloyd of
# kmeans_track_deterministic (k=8, 2 rounds, smallest-vec_id init) and
# the within-cell cosine test is an EXACT integer inequality —
# cos(a,b) ≥ θ ⇔ a·b > 0 ∧ (a·b)²·400 ≥ 361·|a|²|b|² (θ = 0.95 so
# θ² = 9025/10⁴ = 361/400 exactly; the gcd-25 reduction plus the
# n2 ≤ 1.5e8 vector cap below make overflow IMPOSSIBLE for any input
# passing the cap: n2a·n2b ≤ 2.25e16 ⇒ 361·n2a·n2b ≤ 8.2e18 < 2^63,
# and by Cauchy–Schwarz dot² ≤ n2a·n2b ⇒ 400·dot² ≤ 9.0e18 < 2^63.
# The cap is vacuous on the documented range — 64 dims, |x| ≤ 1 at
# the 10⁻³ grid gives n2 ≤ 6.4e7 — and on non-normalized inputs both
# engines now EXCLUDE oversized vectors identically instead of Spark
# wrapping silently where DuckDB raises (ADVICE r13).
# Pair generation is blocked TWICE: by Lloyd cell AND by the sign
# pattern of the first 16 quantized dims — the first 10× audit run
# measured e = 1.21 with cell-only blocking (fixed k ⇒ quadratic
# within-cell pairs); the sign sub-block restores ~linear growth. The
# planted 1.05× perturbation preserves every sign, so planted twins
# always share a block; genuine high-cosine pairs share most signs
# with high probability — the same blocking-recall trade SemDeDup
# itself makes (recall pinned ≥98% in pytest).

_SDD_K = 8
_SDD_ROUNDS = 2
_SDD_COS2_NUM = 361    # θ² = 361/400 for θ = 0.95 (gcd-25 reduced)
_SDD_COS2_DEN = 400
_SDD_N2_CAP = 150_000_000  # overflow-safety cap on |v|² (see note above)

# Planted-twin quantized corpus: original ∪ (+100000, dim0 × 1.05) —
# operation ORDER matters for the float discipline: (x·1.05)·1000+0.5
# with the same literals in both engines.
_SDD_Q_BASE = """qs AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))
           AS qe
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(generate_series(1, len(embedding)),
           i -> CASE WHEN i = 1
                THEN CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1.05
                                * 1000.0 + 0.5) AS BIGINT)
                ELSE CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000.0
                                + 0.5) AS BIGINT) END)
  FROM embeddings),
q AS (SELECT vec_id, qe FROM qs),
e AS MATERIALIZED (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, qe[i] AS x
  FROM q, LATERAL (SELECT UNNEST(generate_series(1, len(qe))) AS i) g)"""


def _sdd_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    orig = emb.select("vec_id", F.expr(_kmd_quant_expr()).alias("qe"))
    pert = emb.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> IF(i = 0,"
            " CAST(FLOOR(CAST(x AS DOUBLE) * 1.05D * 1000.0D + 0.5D)"
            " AS BIGINT),"
            " CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0D + 0.5D) AS BIGINT)))"
        ).alias("qe"),
    )
    return orig.unionByName(pert)


def _sdd_oracle() -> str:
    r = _SDD_ROUNDS
    return f"""
WITH {_SDD_Q_BASE},
{_kmd_round_ctes(_SDD_K, r, "")},
asg AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY SUM((e.x - c.c) * (e.x - c.c)) ASC, c.cluster ASC
           ) AS rn
    FROM e JOIN c{r} c USING (dim)
    GROUP BY e.vec_id, c.cluster) t
  WHERE rn = 1),
v AS (
  SELECT a.vec_id, a.cluster, q.qe,
         (SELECT SUM(x * x) FROM UNNEST(q.qe) AS u(x)) AS n2,
         list_aggregate(list_transform(generate_series(1, 16),
           i -> CASE WHEN q.qe[i] >= 0 THEN '1' ELSE '0' END),
           'string_agg', '') AS blk
  FROM asg a JOIN q ON q.vec_id = a.vec_id),
pairs AS (
  SELECT a.cluster, a.vec_id AS v1, b.vec_id AS v2,
         list_sum(list_transform(list_zip(a.qe, b.qe),
                                 z -> z[1] * z[2])) AS dot,
         a.n2 AS n2a, b.n2 AS n2b
  FROM v a JOIN v b
    ON a.cluster = b.cluster AND a.blk = b.blk
   AND a.vec_id < b.vec_id
   AND a.n2 <= {_SDD_N2_CAP} AND b.n2 <= {_SDD_N2_CAP})
SELECT CAST(cluster AS BIGINT) AS cluster, v1, v2,
       CAST(dot AS BIGINT) AS dot_q
FROM pairs
WHERE dot > 0
  AND dot * dot * {_SDD_COS2_DEN} >= {_SDD_COS2_NUM} * n2a * n2b
""".strip()


@register("dedup_semdedup_deterministic", oracle=_sdd_oracle())
def dedup_semdedup_deterministic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _sdd_emb(spark, sf_dir).localCheckpoint(eager=True)
    cents = _kmd_fit(emb, _SDD_K, _SDD_ROUNDS)
    v = emb.select(
        "vec_id",
        "qe",
        F.expr(_kmd_assign_expr(cents) + ".c").alias("cluster"),
        F.expr(
            "aggregate(qe, 0L, (s, x) -> s + x * x)"
        ).alias("n2"),
        F.expr(
            "concat_ws('', transform(slice(qe, 1, 16),"
            " x -> IF(x >= 0, '1', '0')))"
        ).alias("blk"),
    )
    v = v.where(F.col("n2") <= _SDD_N2_CAP)
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.cluster").alias("cluster"),
        F.col("a.vec_id").alias("v1"),
        F.col("b.vec_id").alias("v2"),
        F.expr(
            "aggregate(zip_with(a.qe, b.qe, (x, y) -> x * y), 0L,"
            " (s, t) -> s + t)"
        ).alias("dot"),
        F.col("a.n2").alias("n2a"),
        F.col("b.n2").alias("n2b"),
    )
    return pairs.where(
        (F.col("dot") > 0)
        & (
            F.col("dot") * F.col("dot") * _SDD_COS2_DEN
            >= F.lit(_SDD_COS2_NUM) * F.col("n2a") * F.col("n2b")
        )
    ).select("cluster", "v1", "v2", F.col("dot").cast("long").alias("dot_q"))


# --- k-center greedy coreset selection (round 14) -----------------------------
# Farthest-point sampling (Gonzalez 1985 2-approximation to the
# k-center objective) — the diversity-selection operator the curation
# family lacked: SemDeDup/near-dup REMOVE redundancy, k-center PICKS
# the maximally-spread representative subset (the coreset every
# "diverse training subset" recipe starts from; Sener & Savarese 2018
# use exactly this for active selection). Deterministic protocol on
# the 10^-3 quantized grid: start from the smallest vec_id, then K-1
# rounds of "farthest point from the chosen set" under exact integer
# squared distance, ties to the smallest vec_id; each round's distance
# IS the covering radius after the previous round, so the output is
# the (step, center, radius) profile — the elbow read for "how many
# exemplars does this corpus need". Spark: the per-point min-distance
# column updates by ONE broadcast-literal arithmetic map per round
# (the chosen center's 64 ints ride in the plan, the argmax is a
# TakeOrderedAndProject of one row — the kmeans-centroid driver-scalar
# precedent); localCheckpoint per round. Oracle: K-round chained-CTE
# unroll (argmax + LEAST distance fold per round). Scale: K·N work,
# no pair joins anywhere.

_KC_K = 8


def _kc_oracle() -> str:
    # every m{k} is read twice (p{k+1} argmax + m{k+1} fold) — without
    # MATERIALIZED DuckDB inlines the chain and the plan doubles per
    # round (8 rounds hung the sf0.001 compare; measured, not theory)
    ctes = ["""c1 AS MATERIALIZED (SELECT vec_id FROM q ORDER BY vec_id LIMIT 1),
m1 AS MATERIALIZED (
  SELECT p.vec_id, SUM((p.x - c.x) * (p.x - c.x)) AS mind2
  FROM e p JOIN e c
    ON c.vec_id = (SELECT vec_id FROM c1) AND c.dim = p.dim
  GROUP BY p.vec_id)"""]
    for k in range(2, _KC_K + 1):
        ctes.append(f"""p{k} AS MATERIALIZED (
  SELECT vec_id, mind2 FROM m{k - 1}
  ORDER BY mind2 DESC, vec_id ASC LIMIT 1),
m{k} AS MATERIALIZED (
  SELECT p.vec_id, LEAST(p.mind2, d.d2) AS mind2
  FROM m{k - 1} p JOIN (
    SELECT a.vec_id, SUM((a.x - c.x) * (a.x - c.x)) AS d2
    FROM e a JOIN e c
      ON c.vec_id = (SELECT vec_id FROM p{k}) AND c.dim = a.dim
    GROUP BY a.vec_id) d ON d.vec_id = p.vec_id)""")
    rows = ["""SELECT CAST(1 AS BIGINT) AS step,
       (SELECT CAST(vec_id AS BIGINT) FROM c1) AS vec_id,
       CAST(0 AS BIGINT) AS radius_d2"""]
    for k in range(2, _KC_K + 1):
        rows.append(f"""SELECT CAST({k} AS BIGINT), CAST(vec_id AS BIGINT),
       CAST(mind2 AS BIGINT) FROM p{k}""")
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))
           AS qe
  FROM embeddings),
e AS MATERIALIZED (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, qe[i] AS x
  FROM q, LATERAL (SELECT UNNEST(generate_series(1, len(qe))) AS i) g),
{",".join(ctes)}
{" UNION ALL ".join(rows)}
""".strip()


@register("embedding_kcenter_coreset", oracle=_kc_oracle())
def embedding_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _kmd_emb(spark, sf_dir).localCheckpoint(eager=True)

    def d2_to(center: list[int]):
        arr = "array(" + ",".join(f"{v}L" for v in center) + ")"
        return F.expr(
            f"aggregate(zip_with(qe, {arr}, (x, c) -> (x - c) * (x - c)),"
            " 0L, (s, t) -> s + t)"
        )

    first = emb.orderBy("vec_id").limit(1).collect()[0]
    picks = [(1, int(first["vec_id"]), 0)]
    cur = emb.select(
        "vec_id", "qe", d2_to(list(first["qe"])).alias("mind2")
    ).localCheckpoint(eager=True)
    for step in range(2, _KC_K + 1):
        top = cur.orderBy(
            F.col("mind2").desc(), F.col("vec_id").asc()
        ).limit(1).collect()[0]
        picks.append((step, int(top["vec_id"]), int(top["mind2"])))
        cur = cur.select(
            "vec_id",
            "qe",
            F.least(F.col("mind2"), d2_to(list(top["qe"]))).alias("mind2"),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        picks, "step BIGINT, vec_id BIGINT, radius_d2 BIGINT"
    )
