"""Physical-plan quality assertions (SURVEY.md §4): the properties that
make these queries survive a 100× scale-up must hold in the actual
optimized plans, not just in docstrings.

- column pruning + predicate pushdown reach the parquet scan,
- dimension joins broadcast (no sort-merge shuffle of the fact table
  against a small dim),
- top-k plans as TakeOrderedAndProject (per-partition heap, no global
  sort),
- partial (map-side) aggregation precedes the shuffle.
"""

from __future__ import annotations

import re

from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

from .conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q1_pushdown_and_pruning(spark):
    plan = _plan(spark, "tpch_q1_pricing")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    m = re.search(r"ReadSchema: struct<([^\n]*)", plan)
    assert m, "no ReadSchema in plan"
    cols = m.group(1)  # may be display-truncated; head columns suffice
    # pruned scan starts at the needed columns, not the table's first
    # (l_orderkey) or widest (l_comment) columns
    assert cols.startswith("l_quantity:double")
    assert "l_orderkey" not in cols and "l_comment" not in cols


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3, (
        "dimension joins (orders/customer/nation/region) must broadcast"
    )
    assert "SortMergeJoin" not in plan


def test_top10_customers_take_ordered(spark):
    plan = _plan(spark, "top10_customers")
    assert "TakeOrderedAndProject" in plan, (
        "ORDER BY + LIMIT must plan as a per-partition heap, not a global sort"
    )


def test_daily_agg_partial_aggregation(spark):
    plan = _plan(spark, "trends_daily_agg")
    # two HashAggregates (partial + final) around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_detrend_single_window_shuffle(spark):
    """The expanding mean must shuffle once on the series key — a second
    exchange would mean the window spec re-partitions needlessly."""
    plan = _plan(spark, "trends_detrend")
    exchanges = plan.count("Exchange hashpartitioning")
    assert exchanges <= 2, f"expected ≤2 exchanges (agg + window), got {exchanges}"
    assert "WindowExec" in plan or "Window" in plan


def test_price_band_broadcast_nested_loop(spark):
    """A theta join against a literal handful of band rows must broadcast
    the bands and stream the fact side — never shuffle orders."""
    plan = _plan(spark, "orders_price_band")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_grouping_sets_single_pass(spark):
    """GROUPING SETS must plan as Expand over ONE scan of orders, not a
    union of per-set scans."""
    plan = _plan(spark, "grouping_sets_order_stats")
    assert "Expand" in plan
    assert plan.count("FileScan parquet") == 1


def test_above_customer_avg_one_window_pass(spark):
    """The correlated-subquery rewrite must be a single window over one
    scan — the naive plan (self-join against a grouped agg) scans and
    shuffles orders twice."""
    plan = _plan(spark, "orders_above_customer_avg")
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") <= 1


def test_range_frame_single_window_shuffle(spark):
    plan = _plan(spark, "value_7d_range_avg")
    # one exchange for the daily agg, one for the window partition key
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "specifiedwindowframe(RangeFrame" in plan or "RANGE" in plan.upper()


def test_salted_join_spreads_hot_keys(spark):
    """With broadcast off (forcing a shuffled join — the regime salting
    exists for), the exchange must partition on (event_type, _salt):
    each of the 5 hot keys spreads over 32 sub-partitions instead of 1.
    With default confs Catalyst broadcasts the tiny replicated dim and
    the salt is inert — also asserted, since that's the right plan when
    the build side fits."""
    plan = _plan(spark, "salted_type_join")
    assert "BroadcastHashJoin" in plan  # default: tiny dim broadcasts
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, "salted_type_join")
        m = re.search(r"hashpartitioning\(event_type[^)]*_salt", plan)
        assert m, "shuffled join must partition on (event_type, _salt)"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_top3_per_nation_broadcasts_and_single_window(spark):
    plan = _plan(spark, "top3_customers_per_nation")
    assert plan.count("BroadcastHashJoin") >= 2, (
        "customer and nation dims must broadcast against the orders fact"
    )
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"\bWindow \[", plan)) == 1, (
        "one window pass for the per-group rank"
    )
    # rank<=k must push a per-partition partial top-k BELOW the shuffle
    # (WindowGroupLimit Partial) — at scale only <=3 rows per group per
    # partition ever cross the wire, not the full per-customer aggregate
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_monthly_rollup_reaggregates_daily(spark):
    # two grouped aggregations (daily then monthly), each with a
    # partial/final HashAggregate pair; the monthly level re-aggregates
    # the ~1000x smaller daily output, never rescanning the fact table
    plan = _plan(spark, "monthly_rollup_from_daily")
    assert plan.count("HashAggregate") >= 4
    assert plan.count("Scan parquet") == 1, "exactly one fact-table scan"


def test_tfidf_window_group_limit(spark):
    plan = _plan(spark, "tfidf_top_terms")
    # rnk <= 5 over row_number must push a partial top-k below the window
    # shuffle (WindowGroupLimit), and tf/df aggregates must partial-agg.
    assert "WindowGroupLimit" in plan
    assert "partial_count" in plan


def test_unpivot_is_expand_no_extra_shuffle(spark):
    plan = _plan(spark, "unpivot_wide")
    assert "Expand" in plan, "unpivot must plan as an Expand node"
    # only the pivot aggregation's own exchanges: melt itself adds none.
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 3, f"unexpected extra shuffles: {n_exchanges}"


def test_simhash16_partial_aggregation(spark):
    plan = _plan(spark, "doc_simhash16")
    # explode + groupBy(doc_id) must combine map-side before the shuffle
    # (one shuffle total — the bit sums), and stay off Python paths.
    assert "partial_sum" in plan
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_aqe_skew_join_splits_hot_partition(spark):
    """The runtime counterpart of operators/skew.py: with AQE skew-join
    on, a hot join key must be split at runtime (SortMergeJoin(skew=true)
    over a skewed AQEShuffleRead) — no manual salting required."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 != 0, 0)
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(0, 97).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        j = fact.join(dim, "k")
        j.localCheckpoint(eager=True)  # executes THIS QE → final AQE plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not mark the join as skewed"
        assert "skewed" in plan.lower()
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """A selective dim-side predicate must inject a runtime bloom filter
    on the fact side of the shuffle join (Spark's row-level runtime
    filtering), so at scale the fact scan drops non-joining rows before
    the exchange instead of shuffling them."""
    from pyspark.sql import functions as F

    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # local test tables are far below the 10 GiB production default
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # force the shuffle-join path: broadcast joins use their own
        # (broadcast) runtime filter instead
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_SMALL, "lineitem")
        orders = load_table(spark, SF_SMALL, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower() or "mightcontain" in plan.lower(), (
            f"no runtime bloom filter injected:\n{plan[:2000]}"
        )
        assert joined.count() >= 1  # still executes correctly
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_shipping_priority_topk_plan(spark):
    """Q3 shape: filtered customer side broadcasts; the final top-10 is a
    TakeOrderedAndProject heap, not a global sort; date filters reach the
    parquet scans."""
    plan = _plan(spark, "shipping_priority_top10")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # Catalyst rewrites to_date(ts) > d into ts >= d+1 before pushdown
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan


def test_funnel_single_shuffle(spark):
    """The array-HOF funnel must cost exactly one exchange (the per-user
    collect); per-stage self-joins would show as extra exchanges."""
    plan = _plan(spark, "funnel_view_click_purchase")
    assert plan.count("Exchange") == 1, plan[:1500]


def test_interval_join_is_hash_join(spark):
    """The banded self-join must plan as an equality hash/sort-merge join
    on (user, cell) — never a nested-loop/cartesian product with a time
    predicate."""
    plan = _plan(spark, "event_pairs_interval_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_histogram_broadcasts_extent(spark):
    """The 1-row global extent must broadcast to the scan; the histogram
    itself is one partial+final aggregate pair."""
    plan = _plan(spark, "order_price_histogram")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("HashAggregate") >= 2


def test_dedup_exact_single_scan(spark):
    """The doubled corpus is built by post-scan explode, not self-union:
    exactly ONE parquet scan of the text-heavy documents table."""
    plan = _plan(spark, "dedup_exact")
    assert plan.count("Scan parquet") == 1, plan
    # and the groupBy still has its map-side partial before the shuffle
    assert "partial_min" in plan or "partial_count" in plan


def test_doc_train_split_prunes_text_column(spark):
    """The split is a pure doc_id hash — the scan must not read the wide
    text column (at corpus scale that's the difference between scanning
    8 bytes/row and the whole table)."""
    plan = _plan(spark, "doc_train_split")
    m = re.search(r"ReadSchema: struct<([^\n]*)", plan)
    assert m, "no ReadSchema in plan"
    assert "doc_id" in m.group(1)
    assert "text" not in m.group(1), m.group(1)


def test_doc_pii_scrub_is_map_only(spark):
    """Redaction is a projection: no exchange anywhere in the plan."""
    plan = _plan(spark, "doc_pii_scrub")
    assert "Exchange" not in plan, plan


def test_anomaly_zscore_two_shuffles_no_funnel(spark):
    """The flagship plan's contract: exactly TWO exchanges total (the
    daily hash agg + the (region, kw) series window — which share a
    partitioning with the detrend window) and no single-partition
    funnel anywhere."""
    plan = _plan(spark, "anomaly_zscore")
    n_exchanges = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exchanges == 2, f"expected 2 exchanges, plan has {n_exchanges}"
    assert "SinglePartition" not in plan


def test_training_data_pipeline_no_single_partition(spark):
    """The composed dedup → gate → split → pack pipeline must keep the
    distributed running sum's no-global-funnel property end-to-end."""
    plan = _plan(spark, "training_data_pipeline")
    assert "SinglePartition" not in plan


def test_segment_dedup_two_shuffles_partial_agg(spark):
    """Segment-level dedup must stay at exactly two exchanges (fp window,
    doc re-agg) with map-side partial aggregation, and the scan must
    prune to (doc_id, text) — at 100 TB both shuffles carry 32-char
    fingerprints plus counters, never document text."""
    plan = _plan(spark, "doc_segment_dedup")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_count" in plan and "partial_sum" in plan
    m = re.search(r"ReadSchema: struct<([^\n]*)", plan)
    assert m and "lang" not in m.group(1) and "n_chars" not in m.group(1)


def test_mixture_plan_broadcasts_weights(spark):
    """The mixture planner is one corpus aggregation (partial sums before
    its single shuffle) joined to the literal weight table via broadcast
    — a sort-merge join here would shuffle the stats for a 20-row dim."""
    plan = _plan(spark, "corpus_mixture_plan")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan


def test_cdc_merge_full_outer_sort_merge(spark):
    """MERGE semantics need every row of both sides → FullOuter, which
    cannot broadcast: the snapshot and change set each shuffle exactly
    once on the merge key. The only broadcasts allowed are the 1-row
    max-key and the 10-row insert batch."""
    plan = _plan(spark, "cdc_merge_apply")
    assert re.search(r"SortMergeJoin.*o_orderkey.*FullOuter", plan)
    assert "BroadcastHashJoin" not in plan.split("FullOuter")[0]


def test_dedup_incremental_anti_join_adaptive(spark):
    """The batch-vs-corpus membership test must plan as a LEFT ANTI join
    on the fingerprint — broadcast is acceptable only because the test
    corpus sits under the autoBroadcast threshold; the query sets no
    join hint, so at corpus scale the same plan degrades to a shuffled
    anti join."""
    plan = _plan(spark, "dedup_incremental")
    assert "LeftAnti" in plan
    assert plan.count("Exchange hashpartitioning") >= 2  # both GROUP BYs on fp


def test_curation_v2_stays_jvm_side(spark):
    """The composed curation pipeline must stay whole-JVM (no Python
    eval node anywhere — every gate is built-in expressions over the
    token arrays), broadcast the 20-row mixture fractions, and key its
    corpus-wide shuffles on fingerprint/doc-id columns only."""
    plan = _plan(spark, "curation_pipeline_v2")
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan and "mapinpandas" not in plan.lower()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(sfp" in plan  # segment-fp window key


def test_dup_ngram_chars_two_shuffles_partial_agg(spark):
    """The within-doc duplicate-5-gram stats are two doc-keyed hash
    aggregations over the gram explode — both with a map-side partial —
    and never a single-partition funnel. (A zero-exchange array_sort
    variant exists but CollapseProject re-inlines the sorted array per
    output column — 60x slower; see the query's header comment.)"""
    plan = _plan(spark, "doc_dup_ngram_chars")
    n_exchanges = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exchanges == 2, f"expected 2 exchanges, plan has {n_exchanges}"
    assert "partial_" in plan or "partial" in plan.lower()
    assert "SinglePartition" not in plan


def test_training_order_shuffle_no_single_partition(spark):
    """The epoch permutation must come out of the range-partitioned rank,
    never a global ROW_NUMBER window funnel."""
    plan = _plan(spark, "training_order_shuffle")
    assert "SinglePartition" not in plan, plan


def test_length_bucketed_batching_no_single_partition(spark):
    """Quantile bucketing must get rank AND total from the shared P-row
    offsets side computation — no scalar-agg or window funnel."""
    plan = _plan(spark, "length_bucketed_batching")
    assert "SinglePartition" not in plan, plan


def test_pack_bin_manifest_no_single_partition(spark):
    plan = _plan(spark, "pack_bin_manifest")
    assert "SinglePartition" not in plan, plan


def test_corpus_budget_select_no_single_partition(spark):
    """Quality-ordered budget selection must use the range-partitioned
    running sum — a bare SUM() OVER (ORDER BY quality DESC) would plan
    an Exchange SinglePartition."""
    plan = _plan(spark, "corpus_budget_select")
    assert "SinglePartition" not in plan, plan


def test_doc_intra_dedup_is_map_only(spark):
    """The intra-doc segment rewrite is scan → project: no exchange."""
    plan = _plan(spark, "doc_intra_dedup")
    assert "Exchange" not in plan, plan


def _final_plan_section(plan: str) -> str:
    """Under AQE, executedPlan.toString prints the final plan AND the
    initial plan (plus cached-relation child plans) — subtree-count
    asserts must look at the final section only."""
    return plan.split("== Initial Plan ==")[0]


def test_dsir_single_corpus_pass_via_checkpoint(spark):
    """doc_dsir_select's (doc_id, bucket) table is consumed twice; the
    lazy localCheckpoint must put ONE shared materialized RDD under
    both consumers (ReuseExchange can't dedupe here — the consumers
    prune different columns — so without it the corpus pass runs
    twice)."""
    df = all_queries()["doc_dsir_select"].fn(spark, SF_SMALL)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # Both consumers read the checkpointed relation (LogicalRDD /
    # ExistingRDD), and the corpus scan is gone from the lazy plan.
    assert opt.count("LogicalRDD") + opt.count("ExistingRDD") == 2, opt[:400]
    assert "Relation" not in opt or "documents" not in opt


def test_cms_reuses_token_frequency_exchange(spark):
    """cms_heavy_hitters builds the sketch AND the exact probe side from
    one token-frequency exchange — ReuseExchange must fire (its firing
    is what makes the documents corpus a single pass: freq's only two
    consumers share the one exchange)."""
    df = all_queries()["cms_heavy_hitters"].fn(spark, SF_SMALL)
    df.collect()
    plan = _final_plan_section(
        df._jdf.queryExecution().executedPlan().toString()
    )
    assert "ReusedExchange" in plan


def test_streaming_microbatch_plans_are_scale_safe(spark):
    """The batch plan gate (test_plan_gate.py) excludes stream-replay
    queries — their fn() returns a memory-sink scan, not the micro-batch
    plan. This closes that hole for the core stateful shapes: the LAST
    EXECUTED micro-batch plan (StreamExecution.explainInternal) must
    contain the stateful operator and none of the scale-killing
    patterns, and state exchanges must be keyed, never single-partition."""
    from big_data_analysis_diseases_outbreaks_spark.streaming.pipeline import (
        daily_agg_stream,
        run_to_memory,
        sliding_agg_stream,
        trends_stream,
    )

    builders = {
        "daily": lambda: daily_agg_stream(
            trends_stream(spark, SF_SMALL), watermark=None
        ),
        "sliding": lambda: sliding_agg_stream(
            trends_stream(spark, SF_SMALL), watermark=None
        ),
    }
    for label, build in builders.items():
        _, q = run_to_memory(build(), output_mode="complete")
        plan = q._jsq.explainInternal(True)
        assert "StateStore" in plan, f"{label}: no stateful operator?"
        for bad in (
            "BatchEvalPython",
            "Exchange SinglePartition",
            "CartesianProduct",
        ):
            assert bad not in plan, f"{label}: {bad} in micro-batch plan"
        assert "hashpartitioning" in plan, f"{label}: state not keyed"


def test_interval_join_microbatch_plan_is_scale_safe(spark):
    """Extends the micro-batch gate to the stream-stream interval join:
    the executed plan must use the symmetric hash join with BOTH state
    sides hash-partitioned on the join key — and none of the
    scale-killing patterns."""
    from big_data_analysis_diseases_outbreaks_spark.streaming.pipeline import (
        interval_join_stream,
        run_to_memory,
    )

    _, q = run_to_memory(
        interval_join_stream(spark, SF_SMALL), output_mode="append"
    )
    plan = q._jsq.explainInternal(True)
    assert "StreamingSymmetricHashJoin" in plan, plan[:500]
    for bad in (
        "BatchEvalPython",
        "Exchange SinglePartition",
        "CartesianProduct",
    ):
        assert bad not in plan, f"{bad} in micro-batch plan"
    assert "hashpartitioning" in plan, "join state not keyed"


def test_curation_microbatch_plans_are_scale_safe(spark, tmp_path):
    """foreachBatch bodies are invisible to explainInternal — the
    curation pipeline records each batch's survivors plan through its
    PLAN_CAPTURE hook instead. Every captured plan (batch-canonical
    window + seen-store anti-join) must be free of the scale-killing
    patterns, and cross-batch dedup must actually plan an anti join
    once the seen store exists."""
    from big_data_analysis_diseases_outbreaks_spark.queries.streaming import (
        _docs_chunk_dir,
    )
    from big_data_analysis_diseases_outbreaks_spark.streaming import curation

    src = _docs_chunk_dir(spark, SF_SMALL, n_chunks=3)
    schema = spark.read.parquet(src).schema
    docs = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    curation.PLAN_CAPTURE = []
    try:
        curation.run_stream_curation(spark, docs, str(tmp_path / "out"))
        plans = curation.PLAN_CAPTURE
    finally:
        curation.PLAN_CAPTURE = None
    assert len(plans) >= 2, f"expected >=2 micro-batches, got {len(plans)}"
    for i, plan in enumerate(plans):
        for bad in (
            "BatchEvalPython",
            "Exchange SinglePartition",
            "CartesianProduct",
        ):
            assert bad not in plan, f"batch {i}: {bad} in plan"
    assert any("LeftAnti" in p for p in plans[1:]), (
        "no anti join planned after the seen store exists"
    )


def test_runtime_bloom_filter_semi_join_reduction(spark):
    """The 100 TB semi-join reduction path: Catalyst injects a bloom
    filter built from the FILTERED dimension (creation side) into the
    fact scan (application side), pruning shuffle input before the
    exchange — the engine-native form of the hand-rolled bloom prejoin
    (`might_contain` is not SQL-registered, so this optimizer rule IS
    the supported surface). The rule is threshold-gated on byte sizes
    (defaults 10MB creation / 10GB application), so fixture-sized data
    can't trigger it organically — this pins the RECIPE: with the
    application-side threshold scaled down and broadcast disabled, the
    optimized plan must gain might_contain + bloom_filter_agg around
    the fact side."""
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "1B",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_SMALL, "lineitem")
        orders = load_table(spark, SF_SMALL, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt[:800]
        assert "bloom_filter_agg" in opt, opt[:800]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_quality_classifier_map_only(spark):
    """The linear gate must score in the scan projection: zero
    exchanges, zero joins — the weight vector is a plan constant."""
    plan = _plan(spark, "doc_quality_classifier")
    assert "Exchange" not in plan, plan[:1500]
    assert "Join" not in plan, plan[:1500]


def test_star_flatten_broadcasts_dims(spark):
    """customer/nation/region resolve through broadcast joins; only the
    lineitem ⋈ orders fact join may shuffle."""
    plan = _plan(spark, "lineitem_star_flatten")
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    assert "CartesianProduct" not in plan


def test_events_funnel_no_event_self_join_blowup(spark):
    """Stage joins ride user-keyed aggregates; the raw event table must
    never cross itself (SortMergeJoin of two event scans)."""
    plan = _plan(spark, "events_funnel")
    assert "CartesianProduct" not in plan
    # three per-stage aggregates (partial+final pairs)
    assert plan.count("HashAggregate") >= 6, plan[:2000]


def test_containment_prefix_filter_probes_prefix(spark):
    """The probe side must keep only the df-ascending prefix (a
    row_number window capped at the prefix length per doc), never
    explode every shingle on both probe AND posting sides; joins stay
    equality-keyed."""
    plan = _plan(spark, "doc_containment_pairs")
    assert "row_number" in plan, plan[:2000]
    assert re.search(r"_rn#\d+ <= pl#\d+", plan), plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, tmp_path):
    """Scale posture: a date-partitioned fact joined to a filtered dim
    must prune partitions at RUNTIME (DPP) — the physical plan carries
    a dynamicpruning subquery on the partition column. At 100 TB this
    is the difference between scanning 7 days and scanning 7 years."""
    import pyspark.sql.functions as F

    fact = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 10).alias("day_bucket"),
        (F.col("id") * 3).alias("v"),
    )
    path = str(tmp_path / "fact")
    fact.write.partitionBy("day_bucket").parquet(path)
    f = spark.read.parquet(path)
    dim = spark.range(10).select(
        F.col("id").alias("day_bucket"), F.lit("x").alias("tag")
    ).where(F.col("day_bucket") < 2)
    plan = (
        f.join(dim, "day_bucket").groupBy("tag").count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]
