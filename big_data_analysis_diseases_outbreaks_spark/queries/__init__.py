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
_PRIORITY: list[str] = [
    # Reshaped / newly oracle-backed this round (fresh hash evidence
    # needed)
    "doc_winnowing_fingerprints",
    "part_node_similarity",
    "corpus_greedy_coverage",
    "doc_duplicate_spans",
    "doc_duplicate_span_rate",
    "part_copurchase_ppr",
    "embedding_matryoshka_recall",
    "mv_agg_delta_maintenance",
    "orders_zorder_cells",
    "asof_nearest_signup",
    "referential_integrity_report",
    "part_association_rules",
    "events_chi2_independence",
    "stream_watermark_late_drop",
    "doc_sentence_chunks",
    "sql_pipe_quarterly_revenue",
    "orders_winsorized_stats",
    "corpus_heaps_law",
    "lineitem_pit_priority",
    "daily_user_bitmap_distinct",
    "series_conformal_intervals",
    # Rows-only, never driver-seen (first rows-row wanted)
    "part_copurchase_ktruss",
    # Re-confirmation backfill: flagships, one per family, all
    # driver-green in a prior round (round-8 new operators displace
    # from the tail as they land)
    "asof_last_signup",
    "qfactor_normalization",
    "fuzzy_name_pairs",
    "orders_duplicate_invoices",
    # Round-8 session-2 additions (never-green -> must sit in window)
    "customer_k_anonymity",
    "part_bipartite_hits",
    "order_businessday_lag",
    "customer_geo_grid_pairs",
    "purchase_attribution",
    "embedding_srp_sketch",
    "part_supplier_hhi",
    "customer_gini_by_nation",
    "collated_segment_counts",
    "stream_bitmap_distinct",
    "series_theil_sen_slope",
    "session_bounce_stats",
    "part_interval_coverage",
    "nation_equal_sample",
    "simhash_hamming_pairs",
    "nation_weighted_median_balance",
    "nation_top_revenue_share",
    "series_cusum_changepoint",
    "user_activity_lorenz",
    "k_anonymity_generalization",
    "orders_benford_digits",
    "nation_trade_flows",
    "segment_repeat_purchase_rate",
    "orders_yoy_aov",
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
