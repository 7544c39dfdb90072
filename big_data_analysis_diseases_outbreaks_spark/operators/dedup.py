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

from ..functions.text import fingerprint, with_hashed_shingles

# MinHash parameters: k = bands * rows_per_band signatures.
MINHASH_BANDS = 8
MINHASH_ROWS = 4
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


def hashed_shingle_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → ``shh`` (distinct int64 shingle hashes): the shared
    input of both the signature path and the exact-Jaccard verifier —
    tokenize/shingle/hash the corpus exactly once.

    repartition FIRST: the doc table may arrive as one small file
    partition, and everything downstream (shingling, hashing, the UDF)
    must run after the exchange to use all cores.
    """
    spread = docs.select("doc_id", text_col).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    return with_hashed_shingles(spread, text_col, out="shh").drop(text_col)


def minhash_signatures_from_shingles(shingled: DataFrame) -> DataFrame:
    """(doc_id, shh) → ``sig`` array of k minhashes — 100% JVM-side.

    The i-th permutation is the seeded hash family
    ``h_i(x) = xxhash64(x, i)`` and the signature element is
    ``array_min(transform(shh, x → h_i(x)))`` — k interpreted-HOF passes
    over the (small) per-doc shingle array, no shuffle, no Python.
    An earlier Arrow-batched pandas-UDF implementation (multiply-shift
    permutations reduced with ``np.minimum.reduceat``) computed the same
    math faster per-row but paid ~2.4 s one-time Python-worker/Arrow
    setup per run — the JVM expression is ~4× faster end-to-end at
    bench scale and keeps the whole dedup pipeline Catalyst-visible.

    Docs with fewer than 3 tokens (no shingles) are dropped upstream,
    matching the filter used by the verification path.
    """
    k = MINHASH_BANDS * MINHASH_ROWS

    # NB: the transform lambda must take exactly ONE parameter — a
    # second parameter (even defaulted, `lambda x, i=i`) makes pyspark
    # bind it to the array INDEX, silently collapsing all k permutations.
    def perm(i: int):
        return lambda x: F.xxhash64(x, F.lit(i))

    sig_cols = [
        F.array_min(F.transform("shh", perm(i))).alias(f"_s{i}")
        for i in range(k)
    ]
    return shingled.select(
        "doc_id", F.array(*sig_cols).alias("sig")
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → ``sig`` array of k minhashes (convenience wrapper)."""
    return minhash_signatures_from_shingles(hashed_shingle_table(docs, text_col))


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
    # explode_outer, not explode: a plain explode lets the optimizer
    # infer `size(pairs) > 0` (InferFiltersFromGenerate) and evaluate
    # the ENTIRE pair-expansion expression a second time inside the
    # Filter. Buckets are already guaranteed ≥1 pair by the size(ids)>1
    # predicate, so outer ≡ inner.
    return (
        buckets.select(F.explode_outer(pairs).alias("p"))
        .select("p.doc_id_1", "p.doc_id_2")
        .distinct()
    )


def _prefix_filtered_pairs(
    docs: DataFrame,
    bucket_cols: tuple[str, ...],
    min_jaccard: float,
    text_col: str,
) -> DataFrame:
    """AllPairs/PPJoin-style exact Jaccard join: candidates are generated
    by a shared-prefix-token join instead of the all-pairs-in-bucket
    product [Bayardo et al., "Scaling Up All Pairs Similarity Search",
    WWW'07; Xiao et al., PPJoin].

    Theorem (prefix filter): order every shingle set by one global total
    order and keep each set's first ``|s| - ceil(t*|s|) + 1`` elements;
    any pair with Jaccard ≥ t must share at least one *prefix* element
    (J ≥ t ⇒ overlap ≥ ceil(t/(1+t)·(|a|+|b|)) ≥ ceil(t·|a|), which
    cannot fit in the ceil(t·|a|)-1 suffix). The candidate join is
    therefore lossless — results are bit-identical to the quadratic
    bucket join and the SQL oracle is unchanged.

    Shuffle/scale profile: parallelism is keyed by (bucket, token), not
    by bucket — a corpus with few buckets no longer serializes each
    bucket's O(n²) work on one task. Measured at sf0.1 (t=0.3, doubled
    corpus): 38 k candidate pairs where the bucket product evaluates
    ~10 M. The total order here is the hash value itself (arrays arrive
    hash-sorted, so the prefix is a free ``slice``); on natural-language
    corpora at larger scale, switch the order to document-frequency
    ascending (one extra count + re-sort pass) so stop-phrase shingles
    fall out of the prefixes and token buckets stay small.
    """
    spread = docs.select(*bucket_cols, "doc_id", text_col).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    # Consumed three times (prefix explode + both verification sides);
    # materialization beats triple recompute here because the
    # verification join re-keys by doc_id — unlike the bucket join, no
    # single upstream partitioning serves all consumers. localCheckpoint
    # (not persist): a query function never sees its result
    # materialized, so a persist here could never be unpersisted and
    # would pin a corpus-sized cache entry per invocation; checkpoint
    # blocks are freed when the result DataFrame is garbage-collected
    # (same convention as operators/components.py).
    shingled = (
        with_hashed_shingles(spread, text_col, out="shh")
        .drop(text_col)
        .withColumn("shh", F.array_sort("shh"))
        .withColumn("sz", F.size("shh"))
        .localCheckpoint(eager=True)
    )
    prefix_len = (
        F.col("sz") - F.ceil(F.col("sz") * F.lit(min_jaccard)) + 1
    ).cast("int")
    pref = shingled.select(
        *bucket_cols,
        "doc_id",
        "sz",
        # outer: prefix_len ≥ 1 always, and a plain explode would
        # re-evaluate the slice inside an inferred size()>0 filter.
        F.explode_outer(F.slice("shh", F.lit(1), prefix_len)).alias("tok"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cond = (F.col("a.tok") == F.col("b.tok")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # Same length-ratio prune as the bucket path, applied pre-distinct.
    cond = (
        cond
        & (F.col("a.sz").cast("double") >= min_jaccard * F.col("b.sz"))
        & (F.col("b.sz").cast("double") >= min_jaccard * F.col("a.sz"))
    )
    cand = (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )
    verified = (
        cand.join(
            shingled.select(
                F.col("doc_id").alias("doc_id_1"), F.col("shh").alias("sh1")
            ),
            "doc_id_1",
        )
        .join(
            shingled.select(
                F.col("doc_id").alias("doc_id_2"), F.col("shh").alias("sh2")
            ),
            "doc_id_2",
        )
    )
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    jac = F.round(inter.cast("double") / union.cast("double"), 4)
    return verified.select(
        "doc_id_1", "doc_id_2", jac.alias("jaccard")
    ).where(F.col("jaccard") >= min_jaccard)


def exact_jaccard_pairs(
    docs: DataFrame,
    bucket_cols: tuple[str, ...] = ("lang", "source"),
    min_jaccard: float = 0.01,
    text_col: str = "text",
    n_blocks: int = 1,
    prefix_filter: bool | None = None,
) -> DataFrame:
    """All-pairs word-3-gram Jaccard within explicit buckets.

    Perf shape: shingles are hashed to int64 once (set semantics
    preserved; 64-bit collisions negligible) so the per-pair intersect
    compares longs, not strings.

    Parallelism: a plain self-join on bucket equality puts each bucket's
    O(n²) pair work in the ONE shuffle partition owning that key — max
    parallelism = number of buckets, not cores. Block decomposition
    splits every bucket's pair space into ``n_blocks``² cells: side A
    carries its doc block id plus an exploded column tag, side B the
    transpose, and the join keys include the (row, col) cell — each
    unordered pair meets in exactly one cell (A's (blk_a, q=blk_b) copy
    with B's (p=blk_a, blk_b) copy), so no post-dedup is needed. Data
    inflates n_blocks× per side; quadratic work gains buckets×n_blocks²
    -way spread. At 100 TB the block count scales with cluster cores
    independent of how few buckets the corpus has.

    Default is 1 (plain bucket join): on this short-doc synthetic corpus
    the n_blocks× shuffle inflation of the shingle arrays measured
    SLOWER than the serial in-bucket work it parallelizes (intersects on
    ~50-element arrays are cheap). Raise it when buckets are few and
    documents long — when per-pair intersect work, not shuffle volume,
    dominates.

    ``prefix_filter`` (default: auto, on when ``min_jaccard ≥ 0.2``)
    switches candidate generation to the lossless shared-prefix-token
    join (:func:`_prefix_filtered_pairs`) — at high thresholds the
    prefix theorem prunes the bucket product by orders of magnitude; at
    permissive thresholds the prefix is nearly the whole set and the
    plain bucket join is cheaper.
    """
    if prefix_filter is None:
        prefix_filter = min_jaccard >= 0.2
    if prefix_filter:
        return _prefix_filtered_pairs(docs, bucket_cols, min_jaccard, text_col)
    # NOT persisted although the self-join consumes it twice: caching the
    # (small-array) shingle column and re-reading it measured ~25% SLOWER
    # than recomputing the codegen'd tokenize→shingle→hash lineage per
    # side — MEMORY_AND_DISK array ser/de costs more than the regex work
    # it saves, and the cache-fill step serializes the pipeline.
    shingled = (
        with_hashed_shingles(
            docs.select(*bucket_cols, "doc_id", text_col), text_col, out="shh"
        )
        .drop(text_col)
        .repartition(
            docs.sparkSession.sparkContext.defaultParallelism, *bucket_cols
        )
    )
    if n_blocks > 1:
        blk = F.pmod(F.xxhash64("doc_id"), F.lit(n_blocks))
        tags = F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
        a = shingled.withColumn("_blk", blk).withColumn("_tag", tags).alias("a")
        b = shingled.withColumn("_blk", blk).withColumn("_tag", tags).alias("b")
    else:
        # plain path keeps the join keys = bucket_cols EXACTLY, so the
        # upstream repartition's hashpartitioning satisfies the join's
        # distribution requirement and no second exchange is planned —
        # constant _blk/_tag key columns would defeat that reuse.
        a, b = shingled.alias("a"), shingled.alias("b")
    cond = (F.col("a.doc_id") < F.col("b.doc_id"))
    if n_blocks > 1:
        # cell pairing: A at (row=_blk, col=_tag) meets B at (row=_tag, col=_blk)
        cond = cond & (F.col("a._blk") == F.col("b._tag"))
        cond = cond & (F.col("a._tag") == F.col("b._blk"))
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # Length-ratio prefilter, IMPLIED by jaccard >= t (|A∩B| ≤ min and
    # |A∩B| ≥ t·|A∪B| ≥ t·max ⇒ min ≥ t·max): prunes size-mismatched
    # pairs inside the join condition, before the O(|A|+|B|) intersect
    # is ever built. Result set is provably unchanged, so SQL oracles
    # filtering on the final jaccard stay valid.
    sa, sb = F.size(F.col("a.shh")), F.size(F.col("b.shh"))
    cond = (
        cond
        & (sa.cast("double") >= min_jaccard * sb)
        & (sb.cast("double") >= min_jaccard * sa)
    )
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
    path: quadratic work only inside LSH buckets).

    The corpus is tokenized/shingled/hashed exactly ONCE
    (``hashed_shingle_table``), persisted, and consumed three times:
    the signature pass and both sides of the verification join — round-1
    profiling showed the duplicated shingle pass was the single biggest
    cost of this pipeline.
    """
    shingled = hashed_shingle_table(docs, text_col).persist()
    sigs = minhash_signatures_from_shingles(shingled)
    cand = minhash_candidate_pairs(sigs)
    j = (
        cand.join(shingled.withColumnRenamed("doc_id", "doc_id_1"), "doc_id_1")
        .withColumnRenamed("shh", "sh1")
        .join(shingled.withColumnRenamed("doc_id", "doc_id_2"), "doc_id_2")
        .withColumnRenamed("shh", "sh2")
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
