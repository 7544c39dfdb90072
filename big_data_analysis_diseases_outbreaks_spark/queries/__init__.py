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
    # --- Round-11 rotation: never-green first (the r11 upgrades/new),
    # then oldest-evidence re-confirmation backfill (last green r3/r4).
    # Round-11b additions (this session) lead — never driver-green yet.
    "segment_balance_anova",
    "customer_atkinson_inequality",
    "customer_t_closeness",
    "customer_geo_nn_grid",
    "lineitem_compaction_plan",
    "orders_mann_kendall",
    "orders_runs_test",
    "doc_cdc_chunks",
    "events_kmv_distinct",
    "embedding_top_pc_power",
    "customer_order_streaks",
    "multimodal_ahash_dedup",
    "stream_kmv_distinct",
    "sql_recursive_hierarchy",
    "interpurchase_hazard_na",
    "series_peak_detect",
    "part_copurchase_squares",
    "churn_labels_pit",
    "orders_queue_lindley",
    "customer_ab_srm_check",
    "orders_bootstrap_ci",
    "events_cuped_adjustment",
    "customer_geo_dbscan",
    "lineitem_linenumber_gaps",
    "events_markov_attribution",
    "doc_bm25_topk",
    "rag_rrf_fusion",
    "part_price_index_fisher",
    "series_dema8",
    "doc_textrank_top2",
    "lineitem_promo_did",
    "orders_spc_ewma",
    "events_absorption_time",
    "dedup_minhash_lsh",
    "doc_stratified_sample",
    "part_community_profile",
    "part_link_prediction_scores",
    "copurchase_degree_assortativity",
    "doc_dup_ngram_coverage",
    "source_cap_sample",
    "customer_revenue_gini",
    "customer_reorder_latency",
    "embedding_label_separation",
    "stream_gap_alerts",
    "copurchase_recommender_eval",
    "orders_equidepth_bins",
    "brand_discount_elasticity",
    "events_markov_stationary",
    "orders_fiscal_445_rollup",
    "orders_price_cume_dist",
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
