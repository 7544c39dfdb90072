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
# Round-13 rotation (per VERDICT r12 §"Next round" #3): never-green hit
# ZERO at r12 close, so the window is new-operator slots + pure
# re-confirmation backfill: new round-13 operators lead (never-green by
# construction, inserted at the head as they land, evicting backfill
# from the tail), then the 8 rows-only queries (they emit rows-rows,
# keeping the weaker driver evidence fresh — their last driver rows are
# r1-r7), then the oracle-backed queries whose last driver-green row is
# OLDEST (r3/r4).  EXACTLY 50 entries (test-enforced);
# tools/rotate_window.py regenerates this list.
_PRIORITY: list[str] = [
    # --- round-14 additions (never driver-green by construction):
    "iforest_deterministic",
    "doc_exact_substring_dedup",
    "doc_bigram_perplexity",
    "doc_substring_dedup_apply",
    "doc_trigram_backoff_bits",
    "part_harmonic_centrality",
    "embedding_kcenter_coreset",
    "orders_psi_drift",
    "corpus_chao1_richness",
    "corpus_zipf_octave_slope",
    "token_burstiness_topk",
    "lineitem_isotonic_calibration",
    "stream_psi_drift",
    # --- round-13 additions (all driver-green in r13; retained near the
    # head until the r14 close rotation re-ranks by evidence age):
    "part_copurchase_betweenness",
    "bpe_train_merges",
    "kmeans_track_deterministic",
    "kmeans_inertia_profile",
    "bpe_apply_vocab",
    "part_copurchase_mis",
    "doc_weighted_priority_sample",
    "pq_train_codes",
    "orders_conformal_interval",
    "part_frequent_triples",
    "brand_ols_trend",
    "part_copurchase_walks",
    "brand_theil_sen",
    "stream_conformal_calibration",
    "part_temporal_reachability",
    "dedup_semdedup_deterministic",
    "lineitem_exact_quantile_select",
    "customer_rfm_kmeans",
    "orders_snapshot_changelog",
    "part_copurchase_percolation",
    # --- rows-only refresh (driver rows-rows keep the no-oracle
    # evidence current; newest-first is fine, they all predate r8):
    "ann_ivf_topk",
    "ann_ivf_pq_topk",
    "dedup_embedding_lsh",
    "dedup_semdedup",
    "kmeans_anomaly",
    "iforest_anomaly",
    "ml_recall_report",
    "kmeans_model_selection",
    # --- oldest-evidence re-confirmation backfill (last green r3/r4):
    "scd2_priority_epochs",
    "small_quantity_revenue",
    "sql_api_priority_revenue",
    "top3_customers_per_nation",
    "anomaly_region_map",
    "contamination_8gram_overlap",
    "cosine_topk",
    "daily_zero_filled",
    "doc_fingerprint",
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
