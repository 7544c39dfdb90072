"""Named-query registry — the driver-facing surface.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) is exposed as a named query: a callable
``(spark, sf_dir) -> DataFrame`` with, where SQL-expressible, a DuckDB
oracle SQL twin producing identical column names and values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None → rows-only check


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


# The driver's CORRECTNESS sweep covers the first 50 registered queries,
# so ordering is signal: the flagship reference pipeline (trends →
# detrend → anomaly → map), the streaming tier, the LLM-pipeline
# text/dedup operators and the TPC-H core go first.  Everything else
# keeps registration (import) order after these.
_PRIORITY: list[str] = [
    # Reference flagship: trends normalization → anomaly detection
    "trends_daily_agg",
    "trends_detrend",
    "anomaly_zscore",
    "anomaly_region_map",
    "pivot_wide",
    "qfactor_normalization",
    "month_onehot",
    "features_join",
    "value_stats_by_region",
    "series_threshold_filter",
    "daily_zero_filled",
    "asof_last_signup",
    "sessionize_events",
    "json_extract_props",
    "global_minmax_date",
    "union_distinct_regions",
    # Structured Streaming tier (batch-replay twins, SQL-expressible)
    "stream_daily_agg",
    "stream_sliding_agg",
    "stream_running_zscore",
    "stream_session_agg",
    "stream_dedup_events",
    "stream_interval_join",
    "stream_left_interval_join",
    "stream_cusum_changepoints",
    # LLM-pipeline: dedup + text analysis
    "dedup_exact",
    "ngram_jaccard_pairs",
    "ngram_jaccard_strict",
    "dedup_components",
    "doc_simhash16",
    "doc_token_count",
    "doc_quality_score",
    "doc_lang_id",
    "doc_fingerprint",
    "tfidf_top_terms",
    "contamination_8gram_overlap",
    "doc_sequence_pack",
    "doc_repetition_ratio",
    "training_data_pipeline",
    # TPC-H decision-support core
    "tpch_q1_pricing",
    "local_supplier_revenue",
    "waiting_orders_blame",
    "shipping_priority_top10",
    "national_market_share",
    "returned_item_reporting",
    # Embeddings / multimodal / ML (rows-only for the ML trio)
    "embedding_norms",
    "cosine_topk",
    "multimodal_decode",
    "multimodal_frame_sample",
    "kmeans_anomaly",
    "iforest_anomaly",
]


def all_queries() -> dict[str, Query]:
    # Import side-effect populates the registry.
    from . import (  # noqa: F401
        embeddings,
        ml,
        multimodal,
        relational,
        streaming,
        text,
        tpch,
        trends,
    )

    ordered: dict[str, Query] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
