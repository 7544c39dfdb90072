#!/usr/bin/env python
"""Measure per-family scaling exponents on the self-scaled fixtures.

Runs each audited family's representative registry query at
``scale1`` and ``scale10`` (tools/gen_scale_fixture.py output),
best-of-N with the bench noop-sink protocol, and reports the fitted
exponent  e = log(t10 / t1) / log(10)  — the empirical "t ∝ n^e".
Sub-linear exponents at this size mean fixed overhead still
dominates; anything clearly super-linear (e >> 1) is a scale bug
unless the family's docstring bounds it.

Usage:
  PYTHONPATH=. python tools/scale_audit.py /tmp/spark_graft_scale
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
from big_data_analysis_diseases_outbreaks_spark.session import get_spark

FAMILIES = [
    ("graph-iterative (pagerank, 8 rounds)", "part_copurchase_pagerank"),
    ("graph-peel (k-core)", "part_copurchase_kcore"),
    ("edge rebuild + MV merge", "copurchase_edges_mv"),
    ("dedup MinHash-LSH", "dedup_minhash_lsh"),
    ("dedup simhash Hamming join", "simhash_hamming_pairs"),
    ("dedup incremental + Bloom", "dedup_incremental_bloom"),
    ("fuzzy join (FastSS blocking)", "fuzzy_name_pairs"),
    ("ANN IVF", "ann_ivf_topk"),
    ("ANN exact baseline", "cosine_topk"),
    ("rank machinery (deciles)", "customer_spend_deciles"),
    ("text map-heavy (winnowing)", "doc_winnowing_fingerprints"),
    ("node similarity (AllPairs)", "part_node_similarity"),
    # round-9 operators
    ("model quality gate (map-only)", "doc_quality_classifier"),
    ("containment prefix join", "doc_containment_pairs"),
    ("gram novelty (gram-keyed shuffle)", "doc_ngram_novelty"),
    ("funnel (stage-keyed aggs)", "events_funnel"),
    ("late-arrival audit (global run-max)", "events_late_arrival_audit"),
    ("backlog sweep line (prefix sum)", "orders_open_backlog_daily"),
    ("SRP band pairs (vector near-dup)", "embedding_srp_band_pairs"),
    ("clustering coefficient (wedge join)", "part_clustering_coefficient"),
    ("weighted pagerank over MV", "part_copurchase_pagerank_weighted"),
    # round-10: the streaming/stateful family (VERDICT r9 #7) — state-
    # store growth measured, not asserted. Each line runs a full
    # bounded-replay streaming query (engine startup is a fixed cost
    # shared by both scales; the exponent isolates the state/emission
    # growth).
    ("stateful recursive EWMA (stream, per-series state)",
     "stream_ewma_recursive"),
    ("stateful funnel (stream, per-user state machine)",
     "stream_funnel_transitions"),
    ("sliding window append+watermark (stream)", "stream_sliding_topk_wm"),
    # round-11 additions (VERDICT r10 #6 + the #2 done-proof)
    ("postings AND retrieval (term-filtered shuffle)",
     "doc_postings_and_query"),
    ("phrase retrieval (positional explode)", "doc_phrase_query"),
    ("entity resolution (deletion blocking + components)",
     "customer_entity_resolution"),
    ("negative sampling (per-user bounded draws)",
     "copurchase_negative_samples"),
    ("hard negatives (int8 dot, label-aware)", "embedding_hard_negatives"),
    ("link prediction (oriented wedges)", "part_link_prediction_cn"),
    # round-11b additions: the calendar-bounded quadratic, the Gram
    # outer-product map, the per-type ranking sketch, per-doc chunk
    # windows, the grid NN candidate join, and the prefix-sum planner.
    ("Mann-Kendall (calendar-bounded pair join)", "orders_mann_kendall"),
    ("top-PC power iteration (Gram outer product)",
     "embedding_top_pc_power"),
    ("KMV distinct sketch (per-type ranking)", "events_kmv_distinct"),
    ("CDC chunking (per-doc windows)", "doc_cdc_chunks"),
    ("grid 1-NN (cell-neighborhood join)", "customer_geo_nn_grid"),
    ("compaction planner (distributed prefix sum)",
     "lineitem_compaction_plan"),
    # round-11b second wave: density clustering, removal-effect
    # attribution, the Lindley reflection, the Poisson bootstrap
    # fan-out, the 4-cycle census, incremental sketch maintenance,
    # and PIT label generation.
    ("grid DBSCAN (candidates + components)", "customer_geo_dbscan"),
    ("Markov removal-effect attribution", "events_markov_attribution"),
    ("Lindley queue (two prefix aggregates)", "orders_queue_lindley"),
    ("Poisson bootstrap (B-way fan-out)", "orders_bootstrap_ci"),
    ("4-cycle census (oriented wedges)", "part_copurchase_squares"),
    ("KMV stream maintenance (k-minima merge)", "stream_kmv_distinct"),
    ("PIT churn labels (spine fan-out)", "churn_labels_pit"),
    # round-11b third wave: retrieval scoring/fusion, per-doc graph
    # iteration, basket indexes, convolution smoothing, causal DiD.
    ("BM25 scoring (term-filtered postings)", "doc_bm25_topk"),
    ("RRF fusion (bounded pools)", "rag_rrf_fusion"),
    ("TextRank (per-doc sentence graphs)", "doc_textrank_top2"),
    ("Fisher price index (matched basket)", "part_price_index_fisher"),
    ("DEMA convolution smoother", "series_dema8"),
    ("DiD promo lift (4-cell means)", "lineitem_promo_did"),
    # round-12: the centered-ANOVA fix (ADVICE r11 — overflow family now
    # measured, not just analyzed).
    ("one-way ANOVA (centered fixed-point)", "segment_balance_anova"),
    # round-12 second wave: decontamination broadcast join, streaming
    # LSH index maintenance, deterministic sketches, grid recall panel.
    ("eval decontamination (13-gram broadcast)", "doc_eval_decontamination"),
    ("MinHash index stream maintenance", "stream_minhash_incremental"),
    ("KMV + hash-sample sketches", "approx_distinct_users"),
    ("grid ANN recall panel (3 probe policies)", "ann_recall_report"),
    ("ANF/HyperBall sketches (3 rounds)", "part_copurchase_anf"),
    ("weighted SSSP (4 relaxation rounds)", "part_copurchase_sssp"),
    ("journey paths (rank pivot + top-k)", "events_top_paths"),
    ("rich club (edge-degree threshold join)", "part_rich_club"),
    # round-12 third wave: composed decontaminating curation, streaming
    # ingest decontamination, event-study offsets, Croston telescoped
    # intervals, prefix autocomplete index.
    ("curation v3 (composed + decontam)", "curation_pipeline_v3"),
    ("decontam at ingest (stream)", "stream_eval_decontam"),
    ("holiday event study (offset join)", "orders_holiday_event_study"),
    ("Croston demand (telescoped intervals)", "brand_croston_demand"),
    ("prefix autocomplete (per-prefix top-k)", "token_prefix_autocomplete"),
    ("community conductance (stored labels)", "part_community_conductance"),
    ("PIT feature matrix (spine fan-out)", "customer_pit_features"),
    # round-13: bounded-distance Brandes, the BPE trainer loop (vocab-
    # sized iterations), deterministic Lloyd (k·dim bounded collects),
    # and the ANF cold-vs-MV pair (VERDICT r12 #7: show the edge-rebuild
    # gap at 10×).
    ("betweenness (multi-source Brandes, depth 3)",
     "part_copurchase_betweenness"),
    ("BPE trainer (8 sequential merges)", "bpe_train_merges"),
    ("deterministic Lloyd (4 rounds)", "kmeans_track_deterministic"),
    ("ANF cold (edge rebuild + sketches)", "part_copurchase_anf"),
    ("ANF stored-MV (sketches only)", "part_copurchase_anf_mv"),
    # round-13 second wave: symmetry-breaking MIS, deterministic walks,
    # Apriori candidate counting, conformal order statistics, PQ
    # training, grouped OLS/Theil-Sen, priority sampling, the streaming
    # calibration store, and the tokenizer-application join.
    ("Luby MIS (3 rounds)", "part_copurchase_mis"),
    ("deterministic walks (4 steps)", "part_copurchase_walks"),
    ("Apriori triples (candidate-pruned)", "part_frequent_triples"),
    ("conformal intervals (rank statistics)", "orders_conformal_interval"),
    ("PQ training (8 subspaces, distributed)", "pq_train_codes"),
    ("grouped OLS slope (partial aggs)", "brand_ols_trend"),
    ("Theil-Sen (bounded pair join)", "brand_theil_sen"),
    ("weighted priority sample (top-k)", "doc_weighted_priority_sample"),
    ("conformal store maintenance (stream)", "stream_conformal_calibration"),
    ("BPE apply (vocab join)", "bpe_apply_vocab"),
    ("temporal reachability (time-filtered relax)",
     "part_temporal_reachability"),
    ("deterministic SemDeDup (cell-blocked pairs)",
     "dedup_semdedup_deterministic"),
    ("exact quantile selection (histogram refinement)",
     "lineitem_exact_quantile_select"),
    ("RFM k-means (NTILE features + Lloyd)", "customer_rfm_kmeans"),
    ("snapshot changelog (full outer diff)", "orders_snapshot_changelog"),
    ("percolation profile (thresholded components)",
     "part_copurchase_percolation"),
    # round-14: the deterministic random-cut forest (customer-sized
    # descent, 504-row broadcast cuts), the anchor-shingle exact
    # substring dedup (DF-capped content buckets — the SemDeDup e=1.21
    # lesson says measure BEFORE shipping), and the bigram-LM scorer
    # (corpus stream × vocabulary-sized count tables).
    ("deterministic iforest (LCG random-cut)", "iforest_deterministic"),
    ("exact substring dedup (anchor diagonals)",
     "doc_exact_substring_dedup"),
    ("bigram LM perplexity (vocab-bounded joins)", "doc_bigram_perplexity"),
    # round-14 second wave: span-removal manifest (interval union),
    # trigram stupid-backoff, per-seed bounded BFS, farthest-point
    # K-round loop, bucket-count drift.
    ("substring dedup apply (interval union)", "doc_substring_dedup_apply"),
    ("trigram stupid-backoff (vocab joins)", "doc_trigram_backoff_bits"),
    ("harmonic centrality (per-seed BFS)", "part_harmonic_centrality"),
    ("k-center coreset (8-round farthest point)",
     "embedding_kcenter_coreset"),
    ("PSI drift (16-bucket counts)", "orders_psi_drift"),
    # round-14 third wave: spectrum estimators (freq-table reduces),
    # global-rank octaves, per-(token, doc) counts, the 10-bucket
    # minimax fit, and the streaming PSI store.
    ("Chao1 richness (spectrum aggregate)", "corpus_chao1_richness"),
    ("Zipf octave slope (global rank)", "corpus_zipf_octave_slope"),
    ("token burstiness (doc-count reduce)", "token_burstiness_topk"),
    ("isotonic calibration (minimax intervals)",
     "lineitem_isotonic_calibration"),
    ("PSI store maintenance (stream)", "stream_psi_drift"),
]


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    spark = get_spark(app_name="scale_audit")
    registry = all_queries()
    # warmup (bench.py protocol: JVM/codegen/Arrow off the clock)
    spark.range(1000).selectExpr("sum(id)").collect()
    registry["dedup_exact"].fn(
        spark, os.path.join(root, "scale1")
    ).write.format("noop").mode("overwrite").save()

    only = {
        s for s in os.environ.get("SPARK_GRAFT_AUDIT_ONLY", "").split(",")
        if s
    }
    results = {}
    for label, name in FAMILIES:
        if only and name not in only:
            continue
        times = {}
        for m in (1, 10):
            sf_dir = os.path.join(root, f"scale{m}")
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                try:
                    registry[name].fn(spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    dt = time.perf_counter() - t0
                except Exception as exc:  # noqa: BLE001
                    print(f"{name}@{m}x FAILED: {exc!r}", file=sys.stderr)
                    dt = -1.0
                spark.catalog.clearCache()
                if dt > 0:
                    best = dt if best is None else min(best, dt)
                else:
                    best = best if best is not None else -1.0
                    break
            times[m] = round(best, 3)
        exp = (
            round(math.log(times[10] / times[1]) / math.log(10), 2)
            if times[1] > 0 and times[10] > 0
            else None
        )
        results[name] = {
            "family": label,
            "t1": times[1],
            "t10": times[10],
            "exponent": exp,
        }
        print(
            f"{label:42s} {name:28s} t1={times[1]:8.2f}s "
            f"t10={times[10]:8.2f}s e={exp}",
            flush=True,
        )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
