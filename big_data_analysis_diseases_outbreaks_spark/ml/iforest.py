"""Per-region IsolationForest scoring (reference ``Main.scala:283-341``,
SURVEY.md §2.K6/L1).

The reference fits one LinkedIn-isolation-forest model per region in a
*driver-side parallel loop* (``regions.par.foreach``) — every iteration
re-runs the whole upstream lineage. Here the per-region fit/score runs as
ONE ``groupBy("region").applyInPandas`` stage: a single shuffle keyed by
region, model fitting on executors, linear scale-out in the number of
regions, zero driver round-trips.

No sklearn in this environment, so the estimator is a self-contained
numpy implementation of the standard Isolation Forest algorithm
(Liu/Ting/Zhou 2008): random-split trees on bootstrap-free subsamples,
anomaly score = 2^(-E[path length]/c(n)). Deterministic via seed=1
(matching the reference's seed, ``Main.scala:311``) + a per-region seed
offset so groups are independent but reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

N_TREES = 100  # reference: numEstimators=100 (Main.scala:306)
SEED = 1


def _c(n: float) -> float:
    """Average unsuccessful-search path length in a BST of n nodes."""
    if n <= 1:
        return 0.0
    return 2.0 * (np.log(n - 1.0) + 0.5772156649) - 2.0 * (n - 1.0) / n


def _fit_tree(x: np.ndarray, rng: np.random.Generator, height_limit: int):
    """Build one isolation tree as a nested dict (small data per region)."""

    def build(idx: np.ndarray, depth: int):
        n = idx.size
        if depth >= height_limit or n <= 1:
            return {"leaf": True, "n": int(n)}
        cols = np.arange(x.shape[1])
        rng.shuffle(cols)
        for q in cols:
            vals = x[idx, q]
            lo, hi = vals.min(), vals.max()
            if hi > lo:
                p = rng.uniform(lo, hi)
                left = idx[vals < p]
                right = idx[vals >= p]
                return {
                    "leaf": False,
                    "q": int(q),
                    "p": float(p),
                    "l": build(left, depth + 1),
                    "r": build(right, depth + 1),
                }
        return {"leaf": True, "n": int(n)}

    return build(np.arange(x.shape[0]), 0)


def _path_length(tree, row: np.ndarray) -> float:
    """Scalar reference scorer (kept as the test oracle for the
    vectorized traversal below — not used on the scoring path)."""
    depth = 0
    node = tree
    while not node["leaf"]:
        node = node["l"] if row[node["q"]] < node["p"] else node["r"]
        depth += 1
    return depth + _c(node["n"])


def _path_lengths(tree, x: np.ndarray) -> np.ndarray:
    """Vectorized path lengths: route the whole row matrix down the tree
    with boolean masks — one split comparison per node over all rows
    reaching it, no per-row Python loop. Each row's result is the same
    single float expression (depth + c(leaf_n)) as the scalar walk, so
    outputs are bit-identical to `_path_length`."""
    out = np.zeros(x.shape[0])
    stack = [(tree, np.arange(x.shape[0]), 0)]
    while stack:
        node, idx, depth = stack.pop()
        if node["leaf"]:
            out[idx] = depth + _c(node["n"])
        elif idx.size:
            left = x[idx, node["q"]] < node["p"]
            stack.append((node["l"], idx[left], depth + 1))
            stack.append((node["r"], idx[~left], depth + 1))
    return out


def isolation_scores(
    x: np.ndarray, seed: int = SEED, n_trees: int = N_TREES
) -> np.ndarray:
    """Anomaly scores in [0, 1]; higher = more isolated."""
    n = x.shape[0]
    if n < 2:
        return np.zeros(n)
    sub = min(256, n)
    height_limit = int(np.ceil(np.log2(max(sub, 2))))
    rng = np.random.default_rng(seed)
    paths = np.zeros(n)
    for _ in range(n_trees):
        idx = rng.choice(n, size=sub, replace=False)
        tree = _fit_tree(x[idx], rng, height_limit)
        paths += _path_lengths(tree, x)
    avg_path = paths / n_trees
    return np.power(2.0, -avg_path / _c(float(sub)))


def iforest_by_region(
    wide: DataFrame, feature_cols: list[str], threshold: float = 0.6
) -> DataFrame:
    """(date, region, features...) → per-region scores via applyInPandas."""
    schema = (
        "date DATE, region STRING, outlier_score DOUBLE, is_anomaly INT"
    )

    def fit_score(pdf: pd.DataFrame) -> pd.DataFrame:
        region = pdf["region"].iloc[0]
        # Deterministic per-region seed (stable hash of the region name).
        offset = sum(pdf["region"].iloc[0].encode()) % 1000
        x = pdf[feature_cols].to_numpy(dtype=float)
        scores = isolation_scores(x, seed=SEED + offset)
        return pd.DataFrame(
            {
                "date": pdf["date"].values,
                "region": region,
                "outlier_score": np.round(scores, 4),
                "is_anomaly": (scores > threshold).astype("int32"),
            }
        )

    return wide.groupBy("region").applyInPandas(fit_score, schema=schema)
