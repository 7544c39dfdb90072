"""Vector similarity search over an ``array<float>`` embedding column.

Two paths (north-star extension):
- brute-force cosine top-k: exact baseline. The query set is broadcast;
  the candidate scan is embarrassingly parallel (no shuffle until the
  per-query top-k, which is a TakeOrdered-style window over tiny groups).
- random-hyperplane LSH buckets: scale path — candidates meet only
  inside matching sign-buckets, turning the 100 TB × Q cross product
  into a bucket-local join.

Pairwise dot products use JVM higher-order functions (``zip_with`` +
``aggregate``). Batch-dense linear algebra (LSH plane projections, IVF
cell assignment) runs as numpy matmuls inside Arrow-batched pandas UDFs
— per-row interpreted expressions were measured ~3-5× slower there.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMB_DIM = 64
# Planes per table sets bucket granularity: ~n/2^planes vectors per
# bucket. 5 planes = 32 buckets/table — sized so the test corpora keep
# true neighbors co-bucketed (recall), while 8 OR'd tables bound the
# miss probability. At larger corpora raise planes ≈ log2(n/bucket_target)
# to hold candidate counts constant.
N_PLANES = 5


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


def _plane_matrix(n_planes: int, n_tables: int):
    """Deterministic Gaussian hyperplane weights,
    (n_tables·n_planes, EMB_DIM): spherically-symmetric random
    projections (the textbook SimHash construction). numpy's seeded
    PCG64 stream is reproducible across platforms, so executors and
    re-runs see identical planes with zero driver state shipped.
    (A sequential LCG here produces lattice-correlated planes and
    measurably degrades bucket recall.)"""
    import numpy as np

    rng = np.random.default_rng(20240813)
    return rng.standard_normal((n_tables * n_planes, EMB_DIM))


def _bucketed(df: DataFrame, id_alias: str, emb_alias: str,
              emb_col: str, n_planes: int, n_tables: int) -> DataFrame:
    """(id, emb, table, bucket) — one row per hash table (OR-amplification).

    All n_tables·n_planes sign bits come from ONE numpy matmul per Arrow
    batch. (The earlier pure-expression form evaluated an interpreted
    ``aggregate∘zip_with`` per plane per table — ~n_tables·n_planes·dim
    lambda steps per row, the dominant cost of the LSH query.)
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    w = _plane_matrix(n_planes, n_tables)
    pow2 = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def buckets(embs):
        x = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        bits = (x @ w.T >= 0).reshape(len(x), n_tables, n_planes)
        out = (bits * pow2).sum(axis=2).astype(np.int32)
        return pd.Series(list(out))

    return (
        df.select(
            F.col("vec_id").alias(id_alias),
            F.col(emb_col).alias(emb_alias),
            F.posexplode(buckets(F.col(emb_col))).alias("table", "bucket"),
        )
    )


def _fit_coarse_codebook(
    candidates: DataFrame,
    emb_col: str,
    n_cells: int,
    fit_sample: int = 10_000,
):
    """Shared IVF coarse quantizer: seeded numpy Lloyd on a bounded
    sample (standard IVF practice — at 100 TB you never K-means the full
    corpus; FAISS likewise trains its coarse quantizer on a capped
    training set). The sample is the repo's one sanctioned bounded
    ``collect()`` (``limit(fit_sample)`` first), the same protocol as
    the PQ codebook fit below. A driver-side Lloyd replaces the earlier
    per-invocation MLlib KMeans fit, which launched ~10 distributed
    jobs per run and dominated the query's bench time at small SF while
    adding nothing at scale (the fit input is capped either way).
    Seeded init + fixed iteration count → deterministic centroids.
    Returns the centroid matrix C (n_cells × dim), its row norms², and
    the sample itself so downstream fits (PQ codebooks) reuse it
    instead of collecting the same rows again."""
    import numpy as np

    sample = np.array(
        [
            [float(x) for x in r[0]]
            for r in candidates.select(emb_col).limit(fit_sample).collect()
        ]
    )
    if len(sample) == 0:
        raise ValueError(
            "IVF coarse-codebook fit needs at least one candidate row; "
            "the candidates DataFrame is empty"
        )
    # A sample smaller than n_cells (tiny tenant corpus, filtered subset)
    # fits fewer cells rather than crashing rng.choice(replace=False) —
    # the same degrade-gracefully contract MLlib KMeans had.
    n_cells = min(n_cells, len(sample))
    rng = np.random.default_rng(1)
    cent = sample[rng.choice(len(sample), size=n_cells, replace=False)].copy()
    for _ in range(10):
        d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sample @ cent.T)
        asg = np.argmin(d2, axis=1)
        for j in range(n_cells):
            pts = sample[asg == j]
            if len(pts):
                cent[j] = pts.mean(axis=0)
    return cent, (cent * cent).sum(axis=1), sample


def _make_cell_ranks_udf(C, c_norm2):
    """Cell assignment as a dense (rows × dim) · (dim × cells) matmul —
    numpy in an Arrow-batched pandas UDF. (The pure-expression variant
    — n_cells interpreted `aggregate∘zip_with` distances per row inside
    an array_sort — evaluated ~n_cells·dim lambda steps per row and was
    the dominant cost of the whole query.) argsort of |c|² - 2x·c ranks
    identically to squared distance; stable sort ties → lowest cell id."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def cell_ranks(embs):
        X = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        scores = c_norm2 - 2.0 * (X @ C.T)
        order = np.argsort(scores, axis=1, kind="stable").astype(np.int32)
        return pd.Series(list(order))

    return cell_ranks


def probe_queries(
    queries: DataFrame, cell_ranks, n_probe: int, emb_col: str = "embedding"
) -> DataFrame:
    """(query_id, q_emb, cell) with one row per probed cell. Shared by
    ivf_topk and the persisted streaming index (streaming/ann_index.py)
    so the probe idiom has one definition — including the subtle
    explode_outer choice: n_probe ≥ 1 so the slice is never empty, and
    a plain explode would re-run the full centroid-distance ranking
    inside an inferred size()>0 filter (InferFiltersFromGenerate)."""
    return queries.select(
        F.col("vec_id").alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.explode_outer(
            F.slice(cell_ranks(F.col(emb_col)), 1, n_probe)
        ).alias("cell"),
    )


def probe_score_topk(
    q: DataFrame, cand: DataFrame, k: int, dedup_pairs: bool = False
) -> DataFrame:
    """Score probed (query, candidate) pairs and keep each query's
    top-k — the shared tail of every cell-probed index. ``q``:
    (query_id, q_emb, cell) from :func:`probe_queries`; ``cand``:
    (cand_id, c_emb, cell). Rounded-score ordering with cand_id
    tie-break, identical to brute_force_topk, so a full probe
    (n_probe = n_cells) reproduces the exact answer. ``dedup_pairs``:
    set when the candidate table may hold a vector more than once
    (e.g. re-ingested index batches); off by default — an IVF
    assignment places each candidate in exactly one cell, so pairs are
    unique by construction and the extra aggregation would be waste."""
    scored = (
        F.broadcast(q)
        .join(cand, on="cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 4).alias(
                "cos_sim"
            ),
        )
    )
    if dedup_pairs:
        scored = scored.dropDuplicates(["query_id", "cand_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= k)


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
    C, c_norm2, _ = _fit_coarse_codebook(candidates, emb_col, n_cells)
    cell_ranks = _make_cell_ranks_udf(C, c_norm2)

    c = candidates.select(
        F.col("vec_id").alias("cand_id"),
        F.col(emb_col).alias("c_emb"),
        cell_ranks(F.col(emb_col))[0].alias("cell"),
    )
    q = probe_queries(queries, cell_ranks, n_probe, emb_col)
    return probe_score_topk(q, c, k)


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


def lsh_near_dup_pairs(
    vecs: DataFrame,
    min_cosine: float = 0.98,
    emb_col: str = "embedding",
    n_planes: int = N_PLANES,
    n_tables: int = 8,
    max_bucket: int = 256,
) -> DataFrame:
    """Embedding near-duplicate pairs via LSH buckets — the scale path
    twin of the all-pairs cosine verifier (quadratic work only inside
    sign buckets; a near-identical pair disagrees on a plane only when
    its projection is near zero, and 8 OR'd tables make a full miss
    vanishingly rare).

    Shuffle profile mirrors the minhash dedup: ONE exchange groups
    bucket members (embeddings carried inline), pairs expand with array
    combinatorics, dedup across tables, then the cosine verify runs once
    per surviving pair.
    """
    b = _bucketed(vecs, "vid", "emb", emb_col, n_planes, n_tables)
    buckets = (
        b.groupBy("table", "bucket")
        .agg(F.array_sort(F.collect_list(F.struct("vid", "emb"))).alias("ms"))
        .where((F.size("ms") > 1) & (F.size("ms") <= max_bucket))
    )
    pairs = F.flatten(
        F.transform(
            "ms",
            lambda x, i: F.transform(
                F.slice("ms", i + 2, F.size("ms")),
                lambda y: F.struct(
                    x["vid"].alias("vec_id_1"),
                    y["vid"].alias("vec_id_2"),
                    x["emb"].alias("e1"),
                    y["emb"].alias("e2"),
                ),
            ),
        )
    )
    # outer: size(ms)>1 guarantees ≥1 pair, and a plain explode would
    # re-evaluate the embedding-carrying pair expansion inside an
    # inferred size()>0 filter (InferFiltersFromGenerate).
    cand = (
        buckets.select(F.explode_outer(pairs).alias("p"))
        .select("p.vec_id_1", "p.vec_id_2", "p.e1", "p.e2")
        .dropDuplicates(["vec_id_1", "vec_id_2"])
    )
    return (
        cand.select(
            "vec_id_1",
            "vec_id_2",
            F.round(cosine(F.col("e1"), F.col("e2")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= min_cosine)
    )


def ivf_pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    emb_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    m_sub: int = 4,
    n_codes: int = 16,
    n_refine: int = 32,
    fit_sample: int = 10_000,
) -> DataFrame:
    """FAISS-style IVF-PQ with asymmetric-distance scoring and exact
    refinement, expressed as DataFrame ops.

    Layout: the coarse KMeans(seed=1) codebook routes every candidate to
    a cell (as :func:`ivf_topk`); each candidate's RESIDUAL from its
    cell centroid is product-quantized into ``m_sub`` sub-codes from
    per-subspace codebooks — at scale the corpus is stored as
    (cell, m_sub bytes) instead of full vectors. Scoring is ADC as a
    narrow ``mapInPandas`` over the probe join: within each Arrow batch,
    one lookup table of query-residual-to-code distances per distinct
    (query, probed cell) pair, then m_sub table gathers per candidate —
    LUTs are batch-composable (pure per-row function of the pair), so
    per-executor memory is bounded by the Arrow batch size, never by
    cell population. The approximate top ``n_refine`` per query are
    exactly re-scored with full-precision cosine (the tiny refine set
    broadcasts back onto the corpus by id).

    Both codebook fits run on bounded samples (`limit()`), matching the
    IVF fit protocol — at 100 TB you never K-means the full corpus; the
    per-subspace Lloyd iterations are seeded and deterministic.
    """
    import numpy as np
    import pandas as pd

    # One bounded sample drives BOTH codebook fits (coarse + PQ): the
    # second collect() the PQ path used to issue was the same rows again.
    C, c_norm2, sample = _fit_coarse_codebook(
        candidates, emb_col, n_cells, fit_sample=fit_sample
    )
    d = C.shape[1]
    if d % m_sub != 0:  # real exception, not assert: survives python -O
        raise ValueError(f"dim {d} not divisible into {m_sub} subspaces")
    sub_d = d // m_sub

    # PQ codebooks on coarse residuals of the same bounded sample
    # (driver-side numpy Lloyd, seeded + fixed iterations → deterministic).
    s_cell = np.argmin(c_norm2 - 2.0 * (sample @ C.T), axis=1)
    resid = sample - C[s_cell]
    rng = np.random.default_rng(1)
    books = np.zeros((m_sub, n_codes, sub_d))
    for m in range(m_sub):
        X = resid[:, m * sub_d : (m + 1) * sub_d]
        cent = X[rng.choice(len(X), size=n_codes, replace=False)].copy()
        for _ in range(10):
            d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            asg = np.argmin(d2, axis=1)
            for j in range(n_codes):
                pts = X[asg == j]
                if len(pts):
                    cent[j] = pts.mean(axis=0)
        books[m] = cent

    # No type hints: hint inference rejects the Series -> DataFrame
    # (struct-returning) shape; the returnType string governs instead.
    @F.pandas_udf("cell INT, codes ARRAY<INT>")
    def encode(embs):
        X = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        cell = np.argmin(c_norm2 - 2.0 * (X @ C.T), axis=1)
        R = X - C[cell]
        codes = np.zeros((len(X), m_sub), dtype=np.int32)
        for m in range(m_sub):
            Xm = R[:, m * sub_d : (m + 1) * sub_d]
            bm = books[m]
            codes[:, m] = np.argmin(
                (bm * bm).sum(axis=1)[None, :] - 2.0 * (Xm @ bm.T), axis=1
            )
        return pd.DataFrame(
            {"cell": cell.astype("int32"), "codes": list(codes)}
        )

    cell_ranks = _make_cell_ranks_udf(C, c_norm2)

    c = candidates.select(
        F.col("vec_id").alias("cand_id"), F.col(emb_col).alias("c_emb")
    ).withColumn("_enc", encode(F.col("c_emb"))).select(
        "cand_id", F.col("_enc.cell").alias("cell"), F.col("_enc.codes").alias("codes")
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        # outer: n_probe ≥ 1 so the slice is never empty, and a plain
        # explode would re-run the full centroid-distance ranking
        # inside an inferred size()>0 filter.
        F.explode_outer(
            F.slice(cell_ranks(F.col(emb_col)), 1, n_probe)
        ).alias("cell"),
    )

    # ADC scoring as a NARROW mapInPandas over the probe join: a
    # groupBy-applyInPandas per (query, cell) would materialize a whole
    # cell's candidates (O(corpus/n_cells)) in one pandas frame — an
    # executor OOM at the 100 TB design point. LUTs are a pure function
    # of the (query, cell) pair, so they compose across Arrow batches:
    # build each pair's LUT once per batch, gather per candidate, and
    # memory stays bounded by the batch size.
    def adc_score(batches):
        sub_idx = np.arange(m_sub)[None, :]
        for pdf in batches:
            if not len(pdf):
                continue
            out = np.empty(len(pdf))
            for (qid, cell), idx in pdf.groupby(
                ["query_id", "cell"], sort=False
            ).indices.items():
                qe = np.asarray(
                    pdf["q_emb"].iloc[idx[0]], dtype=np.float64
                )
                r = qe - C[int(cell)]
                lut = np.zeros((m_sub, n_codes))
                for m in range(m_sub):
                    rm = r[m * sub_d : (m + 1) * sub_d]
                    lut[m] = ((books[m] - rm[None, :]) ** 2).sum(axis=1)
                codes = np.stack(pdf["codes"].iloc[idx].to_numpy())
                out[idx] = lut[sub_idx, codes].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "cand_id": pdf["cand_id"],
                    "approx_d2": out,
                }
            )

    joined = F.broadcast(q).join(c, on="cell").where(
        F.col("query_id") != F.col("cand_id")
    )
    approx = joined.mapInPandas(
        adc_score, "query_id LONG, cand_id LONG, approx_d2 DOUBLE"
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("cand_id").asc()
    )
    shortlist = (
        approx.withColumn("_r", F.row_number().over(wa))
        .where(F.col("_r") <= n_refine)
        .select("query_id", "cand_id")
    )
    # Exact refinement: the shortlist is tiny (|queries| × n_refine) —
    # broadcast it onto both embedding lookups; full-precision cosine
    # decides the final ranking with the same tie-break as the exact path.
    qv = queries.select(
        F.col("vec_id").alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    cv = candidates.select(
        F.col("vec_id").alias("cand_id"), F.col(emb_col).alias("c_emb")
    )
    refined = (
        cv.join(F.broadcast(shortlist), "cand_id")
        .join(F.broadcast(qv), "query_id")
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
        refined.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def semdedup_pairs(
    vecs: DataFrame,
    min_cosine: float = 0.98,
    emb_col: str = "embedding",
    n_cells: int = 16,
    max_cell: int = 2048,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster the corpus with a k-means codebook, then compare pairs ONLY
    within a cluster — near-duplicates land in the same cell because the
    quantizer maps them to the same nearest centroid, so the quadratic
    verify never crosses cells.

    Shares the IVF coarse-codebook fit (seeded numpy Lloyd on a bounded
    sample, :func:`_fit_coarse_codebook`) — SemDeDup and IVF are the same
    blocking geometry used for different ends. Scoring follows the paper:
    per-cluster pairwise similarity as ONE numpy matmul inside a grouped
    ``applyInPandas`` (cells are orders of magnitude larger than LSH
    buckets — an interpreted per-pair cosine was measured 10× slower at
    2k vectors and degrades quadratically). Executor memory is bounded by
    ``max_cell``² doubles (2048² = 32 MB); production sizes ``n_cells``
    ∝ corpus/target-cell-size so cells stay under the cap, same knob the
    paper turns. Cells above the cap are skipped (counted like
    MAX_BUCKET_SIZE in the minhash tier). One shuffle, keyed by cell.

    Returns (vec_id_1 < vec_id_2, cos_sim, cell) for pairs with cosine ≥
    ``min_cosine``; canonical-keep (min id survives) is the caller's
    reduction, as in the minhash tier.
    """
    import numpy as np
    import pandas as pd

    C, c_norm2, _ = _fit_coarse_codebook(vecs, emb_col, n_cells)
    cell_ranks = _make_cell_ranks_udf(C, c_norm2)
    assigned = vecs.select(
        F.col("vec_id").alias("vid"),
        F.col(emb_col).alias("emb"),
        cell_ranks(F.col(emb_col))[0].alias("cell"),
    )

    def pairs_in_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"vec_id_1": pd.Series(dtype="int64"),
             "vec_id_2": pd.Series(dtype="int64"),
             "cos_sim": pd.Series(dtype="float64"),
             "cell": pd.Series(dtype="int32")}
        )
        m = len(pdf)
        if m < 2 or m > max_cell:
            return empty
        # deterministic pair orientation: ascending vid
        pdf = pdf.sort_values("vid", kind="mergesort").reset_index(drop=True)
        X = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["emb"]])
        nrm = np.sqrt((X * X).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        S = (X / nrm[:, None]) @ (X / nrm[:, None]).T
        iu, ju = np.triu_indices(m, k=1)
        sims = np.round(S[iu, ju], 4)
        keep = sims >= min_cosine
        if not keep.any():
            return empty
        vids = pdf["vid"].to_numpy()
        return pd.DataFrame(
            {"vec_id_1": vids[iu[keep]],
             "vec_id_2": vids[ju[keep]],
             "cos_sim": sims[keep],
             "cell": np.full(int(keep.sum()), pdf["cell"].iloc[0],
                              dtype="int32")}
        )

    return assigned.groupBy("cell").applyInPandas(
        pairs_in_cell,
        "vec_id_1 LONG, vec_id_2 LONG, cos_sim DOUBLE, cell INT",
    )


def radius_search(
    queries: DataFrame,
    candidates: DataFrame,
    min_sim: float,
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine range query: every (query, candidate) pair with
    similarity ≥ ``min_sim`` — the fixed-radius companion of
    :func:`brute_force_topk` (recommendation cutoffs, near-duplicate
    radii, density estimates want "all within r", not "best k").

    Same scale shape as the exact top-k: broadcast the query block,
    stream the corpus — O(|Q|·|C|) by definition (it IS the exact
    baseline); the LSH/IVF buckets above are the approximate scale
    path when |Q| grows with the corpus.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    c = candidates.select(
        F.col("vec_id").alias("cand_id"), F.col(emb_col).alias("c_emb")
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 4).alias(
                "cos_sim"
            ),
        )
        .where(F.col("cos_sim") >= min_sim)
    )
