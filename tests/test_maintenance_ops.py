"""Round-7 maintenance/selection operators: sketch linearity, Merkle
reconciliation localization, interval-bucket rewrite, greedy coverage
vs the pure-Python reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
    _RECON_DELETE_BUCKET,
    _RECON_DRIFT_BUCKET,
    table_reconcile_checksums,
)
from big_data_analysis_diseases_outbreaks_spark.queries.text import (
    _COVER_K,
    cms_sketch_cells,
    cms_token_occurrences,
    corpus_greedy_coverage,
    tokens as _tokens_expr,
)
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_cms_sketch_is_linear(spark):
    """Cell-wise sum of per-split sketches == the full-corpus sketch —
    the property the incremental stream (stream_cms_incremental)
    relies on for exactness."""
    docs = load_table(spark, SF_SMALL, "documents")
    full = {
        (r["row_i"], r["bucket"]): r["cnt"]
        for r in cms_sketch_cells(cms_token_occurrences(docs)).collect()
    }
    merged: dict[tuple[int, int], int] = {}
    for part in (
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
    ):
        for r in cms_sketch_cells(cms_token_occurrences(part)).collect():
            k = (r["row_i"], r["bucket"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert merged == full


def test_reconciliation_localizes_divergence(spark):
    """Exactly the perturbed buckets flag divergent; counts expose the
    deletion, checksums alone expose the price drift."""
    rows = {
        r["bucket"]: r for r in table_reconcile_checksums(spark, SF_SMALL).collect()
    }
    divergent = {b for b, r in rows.items() if r["is_divergent"] == 1}
    assert divergent == {_RECON_DRIFT_BUCKET, _RECON_DELETE_BUCKET}
    drift = rows[_RECON_DRIFT_BUCKET]
    assert drift["n_rows_a"] == drift["n_rows_b"]  # same rows, drifted cells
    assert drift["checksum_a"] != drift["checksum_b"]
    dele = rows[_RECON_DELETE_BUCKET]
    assert dele["n_rows_b"] < dele["n_rows_a"]  # missing rows


def test_greedy_coverage_matches_python_reference(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    }
    # Mirror functions/text.tokens via the registered expression itself
    # so the reference can't drift from the engine's tokenizer.
    tok_df = (
        load_table(spark, SF_SMALL, "documents")
        .select(
            "doc_id",
            F.explode_outer(_tokens_expr(F.lower(F.col("text")))).alias("t"),
        )
        .where(F.col("t").isNotNull())
        .collect()
    )
    doc_tokens: dict[int, set[str]] = {}
    for r in tok_df:
        doc_tokens.setdefault(r["doc_id"], set()).add(r["t"])
    covered: set[str] = set()
    want = []
    total = 0
    for step in range(_COVER_K):
        best = None
        for d in sorted(doc_tokens):
            g = len(doc_tokens[d] - covered)
            if best is None or g > best[1]:
                best = (d, g)
        if best is None or best[1] == 0:
            # Exhausted coverage: the engine's anti-join leaves no rows
            # for zero-gain docs, so it stops here too.
            break
        total += best[1]
        want.append((step, best[0], best[1], total))
        covered |= doc_tokens[best[0]]
    got = [
        (r["step"], r["doc_id"], r["gain"], r["covered_total"])
        for r in corpus_greedy_coverage(spark, SF_SMALL)
        .orderBy("step")
        .collect()
    ]
    assert got == want


def test_interval_overlap_spans_at_most_two_months(spark):
    """The rewrite's per-row explode is bounded: a ≤30-day transit
    interval spans at most 3 calendar months (Jan 31 + 30 days crosses
    short February into March) — the bucket-width invariant that keeps
    the explode linear."""
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        shipment_interval_overlap,
    )

    li = load_table(spark, SF_SMALL, "lineitem").select(
        F.to_date("l_shipdate").alias("ship"),
        F.date_add(
            F.to_date("l_shipdate"),
            (F.lit(1) + F.col("l_orderkey") % 30).cast("int"),
        ).alias("receipt"),
    )
    spans = li.select(
        F.size(
            F.expr(
                "sequence(trunc(ship, 'MM'), trunc(receipt, 'MM'),"
                " interval 1 month)"
            )
        ).alias("n")
    )
    assert spans.agg(F.max("n")).first()[0] <= 3
    # and the query itself runs with a sane total
    out = shipment_interval_overlap(spark, SF_SMALL)
    n_li = li.count()
    total = out.agg(F.sum("n_in_transit")).first()[0]
    assert n_li <= total <= 3 * n_li


def test_mv_agg_delta_planted_insert_delete_cases(spark, tmp_path):
    """The three maintenance cases the mod-split fixture can't
    guarantee: a group whose rows are ALL deleted must vanish, a group
    introduced only by the insert batch must appear, and a mixed group
    must carry exact merged arithmetic."""
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        mv_agg_delta_maintenance,
    )

    # predicates: ins = l_orderkey % 11 == 0; del = l_suppkey % 13 == 0
    rows = [
        # part 100: old rows only, ALL deleted -> group vanishes
        (1, 100, 13, 5.0),
        (2, 100, 26, 7.0),
        # part 200: only inserted rows -> appears with their sums
        (11, 200, 1, 3.0),
        (22, 200, 2, 4.5),
        # part 300: old kept + old deleted + inserted (mixed)
        (3, 300, 1, 10.0),   # old, kept
        (4, 300, 13, 20.0),  # old, deleted
        (33, 300, 13, 40.0), # inserted (del-pred irrelevant for inserts)
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_quantity DOUBLE"
    )
    df.write.parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        r["part_key"]: (r["n_items"], r["sum_qty_c"])
        for r in mv_agg_delta_maintenance(spark, str(tmp_path)).collect()
    }
    assert got == {
        200: (2, 750),
        300: (2, 5000),
    }


def test_zorder_cells_are_bounded_rectangles(spark):
    """The z-order locality property: dropping the low 10 bits of a
    16-bit Morton code fixes the top 3 bits of each dimension, so every
    cell's rows span at most a 32x32 rectangle in (custkey-bucket,
    date-bucket) — exactly why per-file min/max stats skip on BOTH
    columns after a z-sorted write. Also checks the Morton math on
    known values."""
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        orders_zorder_cells,
    )

    rows = orders_zorder_cells(spark, "/root/testdata/sf0.001").collect()
    assert rows
    total = 0
    for r in rows:
        assert 0 <= r["zcell"] < 64
        assert r["max_xb"] - r["min_xb"] < 32
        assert r["max_yb"] - r["min_yb"] < 32
        # the cell's x/y high bits are determined by the cell id:
        # zcell = (x>>5)<<3 grouping? — verify via re-interleave of the
        # high bits: bits of zcell alternate x(5..7), y(5..7)
        total += r["n_orders"]
    # conservation: every order lands in exactly one cell
    from big_data_analysis_diseases_outbreaks_spark.sources.tables import (
        load_table,
    )

    assert total == load_table(spark, "/root/testdata/sf0.001", "orders").count()


def test_morton_interleave_known_values(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        _interleave_sql,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x LONG, y LONG"
    )
    got = [
        r["z"]
        for r in df.select(
            F.expr(_interleave_sql("x", "y", 8)).alias("z")
        ).collect()
    ]

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(x, y) for x, y in [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)]]
    assert got[1] == 1 and got[2] == 2 and got[-1] == 65535


def test_referential_integrity_detects_planted_orphans(spark, tmp_path):
    """Planted orphans must be counted, intact edges report ok=1."""
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        referential_integrity_report,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99)],  # orderkey 3 -> custkey 99 orphan
        "o_orderkey BIGINT, o_custkey BIGINT",
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(10, 0)], "c_custkey BIGINT, c_nationkey BIGINT"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(1, 100), (2, 200), (7, 300)],  # lineitem orderkey 7 orphan
        "l_orderkey BIGINT, l_partkey BIGINT",
    ).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [(100,), (300,)], "p_partkey BIGINT"  # partkey 200 orphan
    ).write.parquet(f"{sf}/part.parquet")
    spark.createDataFrame(
        [(0,)], "n_nationkey BIGINT"
    ).write.parquet(f"{sf}/nation.parquet")
    spark.createDataFrame(
        [(5, 1)], "s_suppkey BIGINT, s_nationkey BIGINT"  # nation 1 orphan
    ).write.parquet(f"{sf}/supplier.parquet")
    got = {
        r["check_name"]: (r["n_child"], r["n_orphans"], r["ok"])
        for r in referential_integrity_report(spark, sf).collect()
    }
    assert got == {
        "lineitem_orders": (3, 1, 0),
        "orders_customer": (3, 1, 0),
        "lineitem_part": (3, 1, 0),
        "customer_nation": (1, 0, 1),
        "supplier_nation": (1, 1, 0),
    }


def test_association_rules_planted_baskets(spark, tmp_path):
    """Hand-checkable baskets: joint counts, both confidences, and lift
    (duplicate lineitems of the same part in one order count once)."""
    from big_data_analysis_diseases_outbreaks_spark.queries.relational import (
        part_association_rules,
    )

    baskets = {
        1: [10, 20],
        2: [10, 20],
        3: [10, 30],
        4: [20, 30, 30],  # dup 30 collapses
        5: [10],
    }
    rows = [
        (o, p) for o, ps in baskets.items() for p in ps
    ]
    spark.createDataFrame(
        rows, "l_orderkey BIGINT, l_partkey BIGINT"
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        (r["part_a"], r["part_b"]): r
        for r in part_association_rules(spark, str(tmp_path)).collect()
    }
    assert set(got) == {(10, 20), (10, 30), (20, 30)}
    r = got[(10, 20)]
    # n(10)=4, n(20)=3, joint=2, N=5
    assert (r["n_joint"], r["n_a"], r["n_b"]) == (2, 4, 3)
    assert r["conf_a_to_b"] == 2 / 4 and r["conf_b_to_a"] == 2 / 3
    assert r["lift"] == (2 * 5) / (4 * 3)
