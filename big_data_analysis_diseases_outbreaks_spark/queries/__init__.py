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
# Round-12 rotation (per VERDICT r11 §"Next round" #1): the 7 queries
# that have never had a driver row lead (r11b additions that landed
# after the r11 driver run), new round-12 operators are inserted at the
# head as they land, and the 43 backfill slots re-confirm the queries
# whose last driver-green row is OLDEST (r3/r4).  EXACTLY 50 entries
# (test-enforced); tools/rotate_window.py regenerates this list.
_PRIORITY: list[str] = [
    # --- never driver-green (r11b additions, all green in the judge's
    # own 381/381 sweep — need a CORRECTNESS_r12 row):
    "curriculum_order_manifest",
    "lang_tokenizer_fertility",
    "lang_id_confusion",
    "ann_grid_topk",
    "ann_grid_recall_report",
    "supplier_ontime_wilson",
    "part_copurchase_local_bridges",
    # --- round-12 additions are inserted HERE as they land (never-green
    # by construction), evicting backfill from the tail.
    "doc_eval_decontamination",
    "stream_minhash_incremental",
    # rows-only → value tier upgrades (deterministic sketch / grid
    # re-expressions; prior rows-only evidence no longer sufficient):
    "approx_distinct_users",
    "ann_recall_report",
    "orders_mad_outliers",
    "doc_vocab_coverage",
    "part_copurchase_anf",
    "part_copurchase_sssp",
    "events_top_paths",
    "part_graph_eff_diameter",
    "curation_pipeline_v3",
    "token_prefix_autocomplete",
    "stream_eval_decontam",
    "orders_dow_adjusted_anomaly",
    "part_rich_club",
    "multimodal_tile_manifest",
    "orders_holiday_event_study",
    "part_copurchase_anf_mv",
    "brand_croston_demand",
    "part_community_conductance",
    "customer_pit_features",
    # --- re-shaped oracles this round (old hash evidence no longer
    # applies after the ADVICE fixes):
    "segment_balance_anova",
    "events_markov_attribution",
    "churn_labels_pit",
    # --- oldest-evidence re-confirmation backfill (last green r3):
    "embedding_activation_stats",
    "embedding_quantize_int8",
    "event_prop_key_stats",
    "fuzzy_part_name_pairs",
    "grouping_sets_order_stats",
    "label_centroids",
    "late_shipment_orders",
    "merge_upsert_orders",
    "monthly_rollup_from_daily",
    "order_price_histogram",
    "orders_above_customer_avg",
    "orders_calendar_rollup",
    "orders_price_band",
    "parts_not_recently_shipped",
    "promo_revenue_share",
    "region_shipment_flags",
    "returned_parts_multiset",
    "rollup_lineitem_status",
    "salted_type_join",
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
