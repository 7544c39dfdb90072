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
    # --- Round-10 rotation v6 (final): all never-green first (37),
    # then oldest-evidence re-confirmation backfill.
    "ann_lsh_topk",
    "simhash_buckets",
    "part_copurchase_pagerank_mv",
    "part_copurchase_pagerank_weighted_mv",
    "part_copurchase_lpa_mv",
    "part_copurchase_kcore_mv",
    "part_copurchase_ktruss_mv",
    "part_node_similarity_mv",
    "part_copurchase_modularity_mv",
    "stream_sliding_topk_wm",
    "events_funnel_latency",
    "events_ab_test",
    "events_cramers_v",
    "part_link_prediction_cn",
    "orders_unshipped_revenue_top10",
    "customer_entity_resolution",
    "doc_postings_and_query",
    "stream_dedup_distinct_users",
    "rolling_7d_distinct_bitmap",
    "events_gap_fill_linear",
    "embedding_int8_dot_topk",
    "doc_shard_rendezvous",
    "stream_chained_daily_weekly",
    "corpus_apportion_budget",
    "sql_parameterized_revenue",
    "doc_phrase_query",
    "events_sequence_match",
    "nation_mode_priority",
    "stream_daily_agg_rocksdb",
    "gdpr_erasure_audit",
    "table_reconcile_drilldown",
    "events_session_window_batch",
    "part_supply_resilience",
    "copurchase_negative_samples",
    "embedding_hard_negatives",
    "orders_ship_latency_sla",
    "events_error_slo_burn",
    "doc_bpe_token_count",
    "doc_rolling_fingerprint",
    "token_frequencies",
    "cube_orders_status",
    "customer_halves_outer",
    "customer_order_frame",
    "customer_order_sequence",
    "customer_spend_deciles",
    "customer_spend_percentile",
    "customers_active_both_halves",
    "dedup_embedding_cosine",
    "disjunctive_promo_revenue",
    "distinct_users_per_type",
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
