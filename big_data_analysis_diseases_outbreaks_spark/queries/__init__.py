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
        # Fail loud on a name collision: a second @register with an
        # existing name SILENTLY replaced the first (round-9 caught TWO
        # new queries shadowing green round-5 ones). Module reloads
        # re-register the same function — allow those by (module,
        # qualname, defining line); a same-module re-DEFINITION lands
        # on a different line and trips (the blind spot that let the
        # second collision through a qualname-only check).
        prev = _REGISTRY.get(name)
        if prev is not None and (
            prev.fn.__module__ != fn.__module__
            or prev.fn.__qualname__ != fn.__qualname__
            or prev.fn.__code__.co_firstlineno
            != fn.__code__.co_firstlineno
        ):
            raise ValueError(
                f"query name {name!r} already registered by "
                f"{prev.fn.__module__}.{prev.fn.__qualname__} "
                f"(line {prev.fn.__code__.co_firstlineno})"
            )
        _REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


# The driver's CORRECTNESS sweep covers the first 50 registered queries,
# so ordering is signal — and it is a ROTATING window: a query that has
# produced a driver-green row in ANY past round keeps that evidence
# forever, so each round the window is refilled with the oracle-backed
# queries that have never had one.  Round-8 rotation (per VERDICT r7
# §"Next round" #1): CORRECTNESS_r07 closed the book — 205/205
# oracle-backed queries ever green, every rows-only query has its
# driver row — so `tools/rotate_window.py` reports 50 spare slots.
# The round-8 window therefore leads with the queries whose oracles are
# RESHAPED this round (their old hash evidence no longer applies:
# winnowing's cheaper token-hash composition, node-similarity's hub
# cap) and new round-8 operators, then backfills with flagship
# re-confirmation queries, one per family. EXACTLY 50 entries — a
# 51st would silently fall outside the driver's window
# (test-enforced). tools/rotate_window.py regenerates this list;
# tests/test_registry.py::test_window_covers_never_green asserts it
# stays ⊇ {oracle-backed ∧ never driver-green}.
# Round-9 rotation (per VERDICT r8 §"Next round" #1): CORRECTNESS_r08
# closed the book again — 248/248 oracle-backed ever green, every
# rows-only query has its driver row — so all 50 slots are
# re-confirmation backfill.  New round-9 operators are inserted at the
# head as they land (never-green ⇒ must sit in the window), evicting
# backfill from the tail.  Backfill = the §2 flagship spine (no driver
# row since r5–r6) followed by the queries whose last green row is
# OLDEST (r1/r3).  EXACTLY 50 entries (test-enforced).
_PRIORITY: list[str] = [
    # --- Round-9 additions (never-green; newest first) ---
    "customer_balance_mwu",
    "customer_balance_ks",
    "orders_priority_drift",
    "part_copurchase_khop_sql",
    "part_substitute_pairs",
    "customer_cohort_ltv",
    "orders_seasonality_index",
    "part_degree_assortativity",
    "part_copurchase_modularity",
    "join_cardinality_estimate",
    "sql_udf_revenue_bands",
    "topk_mv_refresh",
    "events_type_overlap",
    "customer_tier_migration",
    "dedup_minhash_verified",
    "supplier_scorecard",
    "orders_open_backlog_daily",
    "sql_script_threshold_filter",
    "events_late_arrival_audit",
    "doc_containment_pairs",
    "corpus_dedup_report",
    "orders_group_split",
    "lineitem_star_flatten",
    "doc_quality_calibration",
    "stream_funnel_transitions",
    "part_copurchase_pagerank_weighted",
    "embedding_srp_band_pairs",
    "customer_l_diversity",
    "part_clustering_coefficient",
    "user_retention_matrix",
    "events_funnel",
    "nation_balance_mad",
    "part_degree_histogram",
    "doc_ngram_novelty",
    "doc_quality_classifier",
    "curation_pipeline_clf",
    "copurchase_edges_mv",
    "dedup_incremental_bloom",
    "part_copurchase_kcore",
    "part_copurchase_ktruss",
    # --- Re-confirmation: §2 flagship spine (last green r4–r6) ---
    "trends_detrend",
    "pivot_wide",
    "stream_daily_agg",
    "anomaly_zscore",
    "dedup_exact",
    "revenue_by_nation",
    "top10_customers",
    "json_roundtrip",
    "month_onehot",
    "global_minmax_date",
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
