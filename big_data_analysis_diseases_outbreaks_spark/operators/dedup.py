"""Deduplication operators for the training-data-pipeline surface
(north-star extension; no reference twin — the reference's closest idiom
is dropDuplicates on the region list, ``Main.scala:283``).

Three tiers, all shuffle-minimal:
- exact: hash groupBy on the text fingerprint — one shuffle on the
  fingerprint key; at 100 TB this is the canonical pre-partitionable op.
- minhash LSH: shingles → k minhashes → banded buckets → candidate pairs
  only within buckets (avoids the quadratic all-pairs join); verification
  re-computes exact Jaccard on the candidates only.
- ngram jaccard: exact pairwise Jaccard *within explicit buckets* —
  quadratic within a bucket, used as the verifier / small-scale oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, with_shingles

# MinHash parameters: k = bands * rows_per_band signatures.
MINHASH_BANDS = 8
MINHASH_ROWS = 4
MERSENNE = (1 << 61) - 1
# Skip degenerate LSH buckets: a bucket shared by more than this many
# docs generates quadratic pairs while carrying almost no dedup signal
# (it means the banded signature is globally common). Standard
# production-LSH mitigation; keeps worst-case pair count ≤ buckets·cap².
MAX_BUCKET_SIZE = 64


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group identical (normalized) texts: canonical doc = min doc_id."""
    return (
        docs.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _perm_coefficients() -> tuple[list[int], list[int]]:
    """k deterministic multiply-shift permutation coefficients (odd a_i)
    from a fixed LCG (seeded, public textbook construction)."""
    a_lcg, b_lcg = 1103515245, 12345
    state = 42
    k = MINHASH_BANDS * MINHASH_ROWS
    As, Bs = [], []
    for _ in range(k):
        state = (a_lcg * state + b_lcg) % (1 << 31)
        As.append(2 * state + 1)  # odd multiplier
        state = (a_lcg * state + b_lcg) % (1 << 31)
        Bs.append(state)
    return As, Bs


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → ``sig`` array of k minhashes.

    Work split JVM/Python at the cheapest boundary: shingling + hashing
    happen JVM-side (``with_shingles`` + ``xxhash64`` — codegen'd string
    work, and the SAME hash space the exact-Jaccard verifier uses), so
    Python only ever sees an ``array<long>`` per doc. The Arrow-batched
    pandas UDF concatenates a batch's hashed shingles into one flat
    uint64 vector and takes per-doc segment minima of the k multiply-
    shift permutations (h_i(x) = a_i·x + b_i mod 2⁶⁴, odd a_i) via
    ``np.minimum.reduceat`` — one 1-D pass per permutation. (A 2-D
    (k, S) broadcast multiply is ~30× slower in numpy — bad inner-loop
    strides for broadcast uint64 ufuncs; hashing strings in Python was
    ~2× the whole signature cost.)

    Docs with fewer than 3 tokens (no shingles) are dropped, matching the
    ``with_shingles`` filter used by the verification path.
    """
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    As, Bs = _perm_coefficients()

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(shh):
        import pandas as pd

        A = np.array(As, dtype=np.uint64)
        B = np.array(Bs, dtype=np.uint64)
        k = len(As)
        arrs = [np.asarray(a, dtype=np.int64) for a in shh]
        if not arrs:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
        flat = np.concatenate(arrs).astype(np.uint64)  # C-cast: mod 2^64
        starts = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        sig = np.empty((len(arrs), k), dtype=np.int64)
        for i in range(k):
            v = A[i] * flat + B[i]  # natural mod-2^64 wraparound
            sig[:, i] = np.minimum.reduceat(v, starts).astype(np.int64)
        return pd.Series(list(sig))

    # repartition FIRST: the doc table may arrive as one small file
    # partition, and everything downstream (shingling, hashing, the UDF)
    # must run after the exchange to use all cores.
    spread = docs.select("doc_id", text_col).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    return (
        with_shingles(spread, text_col, out="sh")
        .select(
            "doc_id",
            F.transform("sh", lambda s: F.xxhash64(s)).alias("shh"),
        )
        .select("doc_id", sig_udf(F.col("shh")).alias("sig"))
    )


def minhash_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Banded LSH: docs agreeing on all rows of ≥1 band become candidates.

    Shuffle profile: one exchange keyed by (band, band_hash) — identical
    signatures co-locate; the pair join happens within buckets only.
    """
    band_cols = []
    for band in range(MINHASH_BANDS):
        members = [
            F.col("sig")[band * MINHASH_ROWS + r] for r in range(MINHASH_ROWS)
        ]
        band_cols.append(
            F.struct(
                F.lit(band).alias("band"),
                F.xxhash64(*members).alias("bucket"),
            )
        )
    exploded = signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    # ONE shuffle: group members into the bucket, then expand the in-
    # bucket pairs with array combinatorics — no bucket-size semi-join,
    # no self-join, no cache (the earlier join formulation shuffled the
    # exploded frame three times and re-ran the signature lineage per
    # consumer). Bucket size is capped, so the expansion is ≤ cap²/2
    # structs per bucket.
    buckets = (
        exploded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= MAX_BUCKET_SIZE))
    )
    pairs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + 2, F.size("ids")),
                lambda y: F.struct(
                    x.alias("doc_id_1"), y.alias("doc_id_2")
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_id_1", "p.doc_id_2")
        .distinct()
    )


def exact_jaccard_pairs(
    docs: DataFrame,
    bucket_cols: tuple[str, ...] = ("lang", "source"),
    min_jaccard: float = 0.01,
    text_col: str = "text",
) -> DataFrame:
    """All-pairs word-3-gram Jaccard within explicit buckets.

    Perf shape: shingles are hashed to int64 once (set semantics
    preserved; 64-bit collisions negligible) so the per-pair intersect
    compares longs, not strings; the pair join is hash-partitioned on
    the bucket keys so the quadratic-within-bucket work spreads across
    all cores (a single small parquet file would otherwise run the whole
    join in ONE task).
    """
    shingled = (
        with_shingles(docs.select(*bucket_cols, "doc_id", text_col), text_col, out="sh")
        .drop(text_col)
        .withColumn("shh", F.transform("sh", lambda s: F.xxhash64(s)))
        .drop("sh")
        .repartition(
            docs.sparkSession.sparkContext.defaultParallelism, *bucket_cols
        )
    )
    a = shingled.alias("a")
    b = shingled.alias("b")
    cond = (F.col("a.doc_id") < F.col("b.doc_id"))
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = F.size(F.array_intersect(F.col("a.shh"), F.col("b.shh")))
    union = F.size(F.col("a.shh")) + F.size(F.col("b.shh")) - inter
    jac = F.round(inter.cast("double") / union.cast("double"), 4)
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


def verified_near_duplicates(
    docs: DataFrame, min_jaccard: float = 0.3, text_col: str = "text"
) -> DataFrame:
    """MinHash-LSH candidates → exact-Jaccard verification (the scale
    path: quadratic work only inside LSH buckets)."""
    sigs = minhash_signatures(docs, text_col)
    cand = minhash_candidate_pairs(sigs)
    # Persisted: joined twice (doc_id_1 side and doc_id_2 side).
    shingled = (
        with_shingles(docs.select("doc_id", text_col), text_col, out="sh")
        .drop(text_col)
        .withColumn("sh", F.transform("sh", lambda s: F.xxhash64(s)))
        .repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .persist()
    )
    j = (
        cand.join(shingled.withColumnRenamed("doc_id", "doc_id_1"), "doc_id_1")
        .withColumnRenamed("sh", "sh1")
        .join(shingled.withColumnRenamed("doc_id", "doc_id_2"), "doc_id_2")
        .withColumnRenamed("sh", "sh2")
    )
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    return (
        j.select(
            "doc_id_1",
            "doc_id_2",
            F.round(inter.cast("double") / union.cast("double"), 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )
