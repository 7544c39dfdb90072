"""Source/sink tests (SURVEY.md §2.A3/A6/A4-shape): CSV round-trip and
partitioned parquet writes with partition pruning.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.detrend import daily_aggregate
from big_data_analysis_diseases_outbreaks_spark.sources.tables import trends_view

from .conftest import SF_SMALL


def test_csv_roundtrip_single_file(spark):
    """Reference CSV sink: coalesce(1) + header + overwrite
    (SparkBatchProcessKmeanPCA.ipynb cell 18); source: header+inferSchema
    (cell 1)."""
    daily = daily_aggregate(trends_view(spark, SF_SMALL))
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "daily_csv")
        daily.coalesce(1).write.option("header", True).mode("overwrite").csv(out)
        files = [f for f in os.listdir(out) if f.endswith(".csv")]
        assert len(files) == 1, "coalesce(1) must produce a single csv part"
        back = spark.read.csv(out, header=True, inferSchema=True)
        assert back.count() == daily.count()
        assert set(back.columns) == set(daily.columns)
        orig_sum = daily.agg(F.round(F.sum("value"), 2)).collect()[0][0]
        back_sum = back.agg(F.round(F.sum("value"), 2)).collect()[0][0]
        assert orig_sum == back_sum


def test_partitioned_parquet_write_prunes(spark):
    """JDBC-sink stand-in (A4): date-partitioned parquet; a date filter
    must prune to a single partition directory at scan time."""
    daily = daily_aggregate(trends_view(spark, SF_SMALL))
    some_date = daily.agg(F.min("date")).collect()[0][0]
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "facts")
        daily.write.mode("overwrite").partitionBy("date").parquet(out)
        n_parts = len([d for d in os.listdir(out) if d.startswith("date=")])
        assert n_parts == daily.select("date").distinct().count()

        # inputFiles() lists the whole relation pre-pruning, so prove the
        # prune via the executed plan's partition-filter clause + row scan.
        pruned = spark.read.parquet(out).where(F.col("date") == F.lit(some_date))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "isnotnull(date" in plan
        expected = daily.where(F.col("date") == F.lit(some_date)).count()
        assert pruned.count() == expected


def test_bucketed_join_no_shuffle(spark):
    """Bucketed tables co-located on the join key must join with ZERO
    exchanges (the 100 TB co-location strategy: pay the shuffle once at
    write time, never again per query). Broadcast is disabled so the
    no-exchange plan is attributable to bucketing, not to dim size."""
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
        expected = orders.join(
            li, orders.o_orderkey == li.l_orderkey
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _roundtrip(spark, fmt: str):
    """Write the daily facts in ``fmt``, read back, prove content equality
    via count + exact scaled sum (schema supplied on read so types
    survive formats without embedded schema)."""
    daily = daily_aggregate(trends_view(spark, SF_SMALL))
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, f"daily_{fmt}")
        daily.write.mode("overwrite").format(fmt).save(out)
        back = (
            spark.read.format(fmt)
            .schema("date DATE, region STRING, kw STRING, value DOUBLE")
            .load(out)
        )
        assert back.count() == daily.count()
        exact = lambda df: df.agg(  # noqa: E731
            F.sum(F.round(F.col("value") * 100).cast("long"))
        ).collect()[0][0]
        assert exact(back) == exact(daily)


def test_json_lines_roundtrip(spark):
    _roundtrip(spark, "json")


def test_orc_roundtrip(spark):
    _roundtrip(spark, "orc")


def test_dynamic_partition_overwrite(spark):
    """Partitioned re-writes must replace ONLY the partitions present in
    the incoming batch (partitionOverwriteMode=dynamic) — static mode
    truncates the whole table, the classic backfill footgun."""
    daily = daily_aggregate(trends_view(spark, SF_SMALL)).cache()
    dates = sorted(r["date"] for r in daily.select("date").distinct().collect())
    target = dates[0]
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "facts")
        daily.write.mode("overwrite").partitionBy("date").parquet(out)
        n_total = daily.count()
        n_target = daily.where(F.col("date") == F.lit(target)).count()
        old = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            patch = (
                daily.where(F.col("date") == F.lit(target))
                .withColumn("value", F.col("value") * 2)
            )
            patch.write.mode("overwrite").partitionBy("date").parquet(out)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
        back = spark.read.parquet(out)
        assert back.count() == n_total, "untouched partitions must survive"
        assert back.where(F.col("date") == F.lit(target)).count() == n_target
    daily.unpersist()


def test_compact_small_files(spark):
    """Small-file compaction: many tiny part files rewritten to a target
    count with identical content (the 100 TB metadata-pressure fix for
    high-frequency streaming appends)."""
    from big_data_analysis_diseases_outbreaks_spark.operators.compact import (
        compact_parquet,
    )

    daily = daily_aggregate(trends_view(spark, SF_SMALL))
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "frag")
        daily.repartition(64).write.mode("overwrite").parquet(out)
        n_before = len([f for f in os.listdir(out) if f.endswith(".parquet")])
        assert n_before >= 32
        stats = compact_parquet(spark, out, target_files=4)
        n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
        assert n_after <= 4
        back = spark.read.parquet(out)
        assert back.count() == daily.count()
        assert stats["files_before"] == n_before and stats["files_after"] == n_after
        exact = lambda df: df.agg(  # noqa: E731
            F.sum(F.round(F.col("value") * 100).cast("long"))
        ).collect()[0][0]
        assert exact(back) == exact(daily)


def test_zorder_clustering_skips_on_both_dims(spark, tmp_path):
    """Z-ordered files must have narrow min/max spans on BOTH clustered
    columns (the whole point of the layout: file-level stats prune for
    predicates on either), while a single-column sort layout leaves the
    other column's per-file span at ~full range."""
    import glob

    from pyspark.sql import functions as F

    from big_data_analysis_diseases_outbreaks_spark.operators.zorder import zorder_repartition
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    o = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01")).alias(
            "day"
        ),
    )

    def file_spans(path):
        spans = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            row = (
                spark.read.parquet(f)
                .agg(
                    F.min("o_custkey"), F.max("o_custkey"),
                    F.min("day"), F.max("day"),
                )
                .collect()[0]
            )
            spans.append((row[1] - row[0], row[3] - row[2]))
        return spans

    full = o.agg(
        F.max("o_custkey") - F.min("o_custkey"), F.max("day") - F.min("day")
    ).collect()[0]

    zdir = str(tmp_path / "zorder")
    zorder_repartition(o, ["o_custkey", "day"], 16).write.parquet(zdir)
    z_spans = file_spans(zdir)
    assert len(z_spans) == 16
    avg_cust = sum(s[0] for s in z_spans) / len(z_spans) / full[0]
    avg_day = sum(s[1] for s in z_spans) / len(z_spans) / full[1]
    # 16 files on a 2-D curve → ~4 splits per dimension (~25% spans);
    # allow generous slack for range-bound sampling noise.
    assert avg_cust < 0.6, f"custkey span {avg_cust:.2f} not clustered"
    assert avg_day < 0.6, f"day span {avg_day:.2f} not clustered"

    sdir = str(tmp_path / "sorted")
    o.repartitionByRange(16, "o_custkey").write.parquet(sdir)
    s_spans = file_spans(sdir)
    s_day = sum(s[1] for s in s_spans) / len(s_spans) / full[1]
    assert s_day > 0.9, "control: custkey-only layout should not cluster day"
    assert avg_day < s_day / 2


def test_json_corrupt_record_handling(spark, tmp_path):
    """PERMISSIVE JSON ingest must keep malformed lines in the corrupt-
    record column instead of failing the batch or silently dropping —
    then DROPMALFORMED yields only the clean rows."""
    from pyspark.sql import types as T

    p = tmp_path / "raw.jsonl"
    p.write_text(
        '{"id": 1, "v": 10.5}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": null}\n'
        '{"id": 3, "v": "not-a-number"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("_bad", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(str(p))
    )
    rows = df.collect()
    assert len(rows) == 4
    bad = [r for r in rows if r._bad is not None]
    assert len(bad) == 2  # the non-JSON line and the type-mismatched one
    clean = (
        spark.read.schema("id long, v double")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
        .collect()
    )
    assert {r.id for r in clean} == {1, 2}


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A column added by a later writer must surface via mergeSchema with
    nulls for old files — and stay invisible without it (reading with the
    first file's schema only)."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "tbl")
    spark.range(3).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(
        base + "/p=1"
    )
    spark.range(3, 5).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(9).alias("v2")
    ).write.parquet(base + "/p=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) >= {"id", "v1", "v2"}
    assert merged.where(F.col("v2").isNull()).count() == 3
    assert merged.where(F.col("v2") == 9).count() == 2


def test_register_tables_sql_entry_point(spark):
    """register_tables exposes every testdata table as a temp view with
    normalized types — ad-hoc spark.sql over the catalog must agree with
    the DataFrame loader, including instant semantics on events.ts."""
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import (
        TABLE_NAMES,
        load_table,
        register_tables,
    )

    names = register_tables(spark, SF_SMALL)
    assert set(names) == set(TABLE_NAMES)
    for name in names:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {name}").collect()[0].n \
            == load_table(spark, SF_SMALL, name).count()
    got = spark.sql(
        "SELECT CAST(MIN(unix_micros(ts)) AS BIGINT) AS lo FROM events"
    ).collect()[0].lo
    want = (
        load_table(spark, SF_SMALL, "events")
        .selectExpr("CAST(MIN(unix_micros(ts)) AS BIGINT) AS lo")
        .collect()[0].lo
    )
    assert got == want


def test_jdbc_roundtrip_append_and_pushed_filter(spark, tmp_path):
    """SURVEY §2.A2/A4 on a real ``format("jdbc")`` wire: append-mode
    write then a history read whose date filter is pushed into the
    database (reference Main.scala:99-109 sink / :131-137 source,
    ``where($"date" < lit(thisDate))``). Runs against embedded Derby —
    the JDBC engine Spark itself bundles — so the exact production code
    path (url/driver/dbtable options, SaveMode.Append, pushdown) is
    exercised without a MySQL server; only the url/driver strings change
    in production."""
    import datetime

    from big_data_analysis_diseases_outbreaks_spark.sources.jdbc import (
        DERBY_DRIVER,
        read_jdbc,
        write_jdbc,
    )

    # Point derby.log at the tmp dir BEFORE the engine first loads —
    # otherwise Derby drops it in whatever cwd the tests run from.
    spark._jvm.System.setProperty("derby.system.home", str(tmp_path))

    url = f"jdbc:derby:{tmp_path}/smoke;create=true"
    day1 = spark.createDataFrame(
        [(datetime.date(2020, 1, 1), "US", "Virus", 39.0),
         (datetime.date(2020, 1, 1), "CN", "Mucus", 12.5)],
        "date DATE, region STRING, kw STRING, value DOUBLE",
    )
    day2 = spark.createDataFrame(
        [(datetime.date(2020, 1, 2), "US", "Virus", 41.0)],
        "date DATE, region STRING, kw STRING, value DOUBLE",
    )
    write_jdbc(day1, url, "trends", DERBY_DRIVER)   # creates via append
    write_jdbc(day2, url, "trends", DERBY_DRIVER)   # appends, no clobber

    full = read_jdbc(spark, url, "trends", DERBY_DRIVER)
    assert full.count() == 3

    history = full.where(F.col("date") < F.lit(datetime.date(2020, 1, 2)))
    plan = history._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(DATE".lower() in plan.lower() or \
        "LessThan(date" in plan, f"date filter not pushed to JDBC: {plan}"
    rows = {(r["region"], r["value"]) for r in history.collect()}
    assert rows == {("US", 39.0), ("CN", 12.5)}

    # Parallel range read: N partitions issue N bounded queries — the
    # scan shape that matters once the table is not dimension-sized.
    ranged = read_jdbc(
        spark, url, "trends", DERBY_DRIVER,
        partition_column="value", lower_bound=0, upper_bound=50,
        num_partitions=4,
    )
    assert ranged.rdd.getNumPartitions() == 4
    assert ranged.count() == 3


def test_anomaly_map_artifact(spark, tmp_path):
    """The choropleth artifact (reference anomaly map.ipynb / anim_2020.gif
    twin): consumes the oracle-checked map feeds, emits well-formed SVG
    with one tile per region and one panel per month."""
    import xml.etree.ElementTree as ET

    from big_data_analysis_diseases_outbreaks_spark.artifacts import (
        REGION_GEOMETRY,
        write_anomaly_map,
    )

    out = str(tmp_path / "map.svg")
    write_anomaly_map(spark, SF_SMALL, out)
    root = ET.parse(out).getroot()
    assert root.tag.endswith("svg")
    texts = [t.text for t in root.iter() if t.tag.endswith("text")]
    for region in REGION_GEOMETRY:
        assert region in texts, f"region tile {region} missing from SVG"
    series = ET.parse(str(tmp_path / "map_series.svg")).getroot()
    panels = [g for g in series.iter() if g.tag.endswith("g")]
    assert panels, "series artifact has no per-month panels"


def test_producer_datasource_fanout_and_options(spark):
    """SURVEY §2.A10 engine-native: the producer twin must expose one
    InputPartition per day (the fleet's fan-out unit), honor options,
    and generate deterministically."""
    from big_data_analysis_diseases_outbreaks_spark.sources.producer_source import (
        register_producer_source,
    )

    register_producer_source(spark)
    df = (
        spark.read.format("trends_producer")
        .option("days", "7").option("n_kw", "3").option("regions", "US,IL")
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    rows = df.collect()
    assert len(rows) == 7 * 3 * 2
    assert sorted(map(tuple, rows)) == sorted(map(tuple, df.collect()))
    kws = {r["kw"] for r in rows}
    assert kws == {"kw_0", "kw_1", "kw_2"}
    assert {r["region"] for r in rows} == {"US", "IL"}


def test_orc_roundtrip_with_predicate_pushdown(spark):
    """ORC source/sink (the other columnar format Spark ships built-in):
    lossless value round-trip of a typed aggregate, and a filter on the
    read-back relation reaches the ORC scan as a pushed filter (the
    parquet-pushdown contract extended to the second format)."""
    daily = daily_aggregate(trends_view(spark, SF_SMALL))
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "daily_orc")
        daily.write.mode("overwrite").orc(out)
        back = spark.read.orc(out)
        assert back.count() == daily.count()
        assert back.schema == daily.schema
        a = daily.agg(F.round(F.sum("value"), 2)).collect()[0][0]
        b = back.agg(F.round(F.sum("value"), 2)).collect()[0][0]
        assert a == b
        filtered = back.where(F.col("value") > 50)
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "GreaterThan(value,50" in plan
        assert filtered.count() == daily.where(F.col("value") > 50).count()


def test_binaryfile_source_reads_blobs(spark):
    """Multimodal ingestion path (A-family source): the built-in
    ``binaryFile`` format reads opaque blobs with (path, length,
    content) — content bytes must round-trip exactly, and a pathGlob
    filter must prune non-matching files."""
    import hashlib

    blobs = {f"img_{i:02d}.bin": bytes([i]) * (100 + i) for i in range(5)}
    with tempfile.TemporaryDirectory() as tmp:
        for name, payload in blobs.items():
            with open(os.path.join(tmp, name), "wb") as fh:
                fh.write(payload)
        with open(os.path.join(tmp, "notes.txt"), "wb") as fh:
            fh.write(b"not a blob")
        df = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.bin")
            .load(tmp)
            .select(
                F.element_at(F.split("path", "/"), -1).alias("name"),
                "length",
                F.md5("content").alias("digest"),
            )
        )
        rows = {r.name: r for r in df.collect()}
    assert set(rows) == set(blobs)  # glob pruned notes.txt
    for name, payload in blobs.items():
        assert rows[name].length == len(payload)
        assert rows[name].digest == hashlib.md5(payload).hexdigest()
