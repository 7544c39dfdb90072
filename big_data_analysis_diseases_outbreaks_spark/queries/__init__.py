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
# so ordering is signal — and it is a ROTATING window: a query that has
# produced a driver-green row in ANY past round keeps that evidence
# forever, so each round the window is refilled with the oracle-backed
# queries that have never had one.  Round-6 rotation (per VERDICT r5 §1):
# the final 26 never-driver-checked oracle-backed queries lead; the two
# rows-only ML entries are DROPPED from the window (the driver can only
# ever record `err: no_oracle` for them — their evidence lives in pytest
# determinism/recall tests and BASELINE.md); the remaining slots (19
# after the 5 round-6 operators + 26 rotations) are backfilled with
# flagship already-green queries for re-confirmation. EXACTLY 50
# entries — a 51st would silently fall outside the driver's window
# (test-enforced). tools/rotate_window.py regenerates this list;
# tests/test_registry.py::test_window_covers_never_green asserts it
# stays ⊇ {oracle-backed ∧ never driver-green}.
_PRIORITY: list[str] = [
    # Round-6 new operators (never driver-checked) lead the window
    "doc_dsir_select",
    "part_copurchase_triangles",
    "colbert_maxsim_topk",
    "cms_heavy_hitters",
    "rag_chunk_retrieval",
    # Never-green oracle-backed (26) — close the book this round
    "doc_embed_deterministic",
    "similarity_radius_search",
    "ann_index_stream_topk",
    "multimodal_patchify",
    "cdc_merge_apply",
    "snapshot_diff_classes",
    "file_provenance_audit",
    "lateral_top2_orders",
    "part_copurchase_pagerank",
    "stream_full_interval_join",
    "stream_producer_daily_agg",
    "stream_incremental_curation",
    "doc_segment_dedup",
    "corpus_mixture_plan",
    "dedup_incremental",
    "curation_pipeline_v2",
    "doc_dup_ngram_chars",
    "training_order_shuffle",
    "pack_bin_manifest",
    "length_bucketed_batching",
    "corpus_budget_select",
    "doc_intra_dedup",
    "producer_generate",
    "producer_daily_mean",
    "json_variant_props",
    "recursive_date_spine",
    # Re-confirmation backfill (19): flagship + one per family, all
    # driver-green in a prior round
    "anomaly_zscore",
    "trends_detrend",
    "trends_daily_agg",
    "qfactor_normalization",
    "pivot_wide",
    "month_onehot",
    "json_roundtrip",
    "revenue_by_nation",
    "top10_customers",
    "global_minmax_date",
    "value_stats_by_region",
    "customers_only_first_half",
    "asof_last_signup",
    "series_threshold_filter",
    "stream_daily_agg",
    "stream_sliding_agg",
    "dedup_exact",
    "dedup_components",
    "dedup_keep_best",
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
