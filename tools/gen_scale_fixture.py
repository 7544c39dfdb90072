#!/usr/bin/env python
"""Generate self-scaled stress fixtures for the SCALE.md scaling audit.

The driver testdata stops at sf0.1, so "the plans hold at 100×" would
otherwise rest on plan reads alone. This tool synthesizes the six
tables the audited query families consume — lineitem / documents /
customer / embeddings / orders / events — at an arbitrary multiplier of the
sf0.1 row counts, with the engine itself (seeded JVM expressions, no
Python row loop), writing `<out>/scale<N>/<table>.parquet`. Shapes
mimic the driver fixtures (FIXTURES.md / TESTDATA.md conventions):

* lineitem: ~4 lines/order, part keys uniform over a part universe
  that scales WITH the data (constant co-purchase degree density, so
  the graph family's per-round cost scales with edges, not degree²),
  shipdates uniform over 1992-1998 (the graph cutoff keeps ~14%);
* documents: ~60-token texts over the driver vocab, with exact-dup
  clusters (~8% of docs reuse another doc's seed) so dedup families
  have real work at every scale;
* embeddings: 64-dim float vectors, hash-derived;
* customer: `Customer#%09d` names (the fuzzy family's edit-distance-1
  pairs arise from single-digit differences, as in the driver data);
* orders: custkeys over a customer universe scaling with the data;
* events: ~30 days of near-sorted event time with bounded jitter (the
  late-arrival shape the watermark audit measures).

Usage:
  PYTHONPATH=. python tools/gen_scale_fixture.py OUT_DIR MULT [MULT...]
e.g.
  PYTHONPATH=. python tools/gen_scale_fixture.py /tmp/spark_graft_scale 1 10
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession, functions as F

# sf0.1 row counts (TESTDATA.md)
BASE = {
    "lineitem": 600_000,
    "orders": 150_000,
    "customer": 15_000,
    "documents": 5_000,
    "embeddings": 2_000,
    "events": 100_000,
}
N_PARTS_BASE = 20_000

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch "
    "window spark order data column join small line customer query "
    "the a filter group sort plan stage shuffle"
).split()


def _h(*cols):
    return F.abs(F.xxhash64(*cols, F.lit(42)))


def gen_lineitem(spark, n, n_parts):
    ids = spark.range(n)
    return ids.select(
        (F.col("id") / 4).cast("long").alias("l_orderkey"),
        (_h(F.col("id"), F.lit(1)) % n_parts).alias("l_partkey"),
        (_h(F.col("id"), F.lit(2)) % 1000).alias("l_suppkey"),
        (F.col("id") % 4).cast("int").alias("l_linenumber"),
        (1 + (_h(F.col("id"), F.lit(4)) % 50)).cast("double").alias(
            "l_quantity"
        ),
        ((_h(F.col("id"), F.lit(5)) % 9_000_000) / 100.0 + 900).alias(
            "l_extendedprice"
        ),
        ((_h(F.col("id"), F.lit(6)) % 11) / 100.0).alias("l_discount"),
        ((_h(F.col("id"), F.lit(7)) % 9) / 100.0).alias("l_tax"),
        F.when(_h(F.col("id"), F.lit(8)) % 4 == 0, "R")
        .otherwise("N")
        .alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
        F.to_timestamp(
            F.date_add(
                F.lit("1992-01-01").cast("date"),
                (_h(F.col("id"), F.lit(3)) % 2557).cast("int"),
            )
        ).alias("l_shipdate"),
    )


def gen_documents(spark, n):
    ids = spark.range(n)
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    nv = len(VOCAB)
    # ~8% of docs reuse another doc's text seed -> exact-dup clusters
    seed = F.when(
        _h(F.col("id"), F.lit(10)) % 12 == 0,
        _h(F.col("id"), F.lit(11)) % (n // 10 + 1),
    ).otherwise(F.col("id")).alias("seed")
    toked = ids.select("id", seed).select(
        "id",
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(
                    F.lit(1), (8 + _h(F.col("seed")) % 108).cast("int")
                ),
                lambda i: F.element_at(
                    vocab,
                    (_h(F.col("seed"), i) % nv).cast("int") + 1,
                ),
            ),
        ).alias("text"),
    )
    langs = F.array(*[F.lit(x) for x in ["en", "de", "fr", "es", "zh"]])
    return toked.select(
        F.col("id").alias("doc_id"),
        "text",
        F.element_at(
            langs, (_h(F.col("id"), F.lit(12)) % 5).cast("int") + 1
        ).alias("lang"),
        F.concat(
            F.lit("src"), (_h(F.col("id"), F.lit(13)) % 20).cast("string")
        ).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def gen_embeddings(spark, n):
    ids = spark.range(n)
    return ids.select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: (
                (_h(F.col("id"), d) % 2001).cast("float") / 1000.0 - 1.0
            ).cast("float"),
        ).alias("embedding"),
        (_h(F.col("id"), F.lit(14)) % 10).cast("int").alias("label"),
    )


def gen_customer(spark, n):
    ids = spark.range(n)
    return ids.select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        (_h(F.col("id"), F.lit(15)) % 25).cast("int").alias("c_nationkey"),
        ((_h(F.col("id"), F.lit(16)) % 1_100_000) / 100.0 - 1000).alias(
            "c_acctbal"
        ),
        F.element_at(
            F.array(
                F.lit("AUTOMOBILE"),
                F.lit("BUILDING"),
                F.lit("FURNITURE"),
                F.lit("HOUSEHOLD"),
                F.lit("MACHINERY"),
            ),
            (_h(F.col("id"), F.lit(17)) % 5).cast("int") + 1,
        ).alias("c_mktsegment"),
    )


def gen_orders(spark, n, n_cust):
    ids = spark.range(n)
    return ids.select(
        F.col("id").alias("o_orderkey"),
        (_h(F.col("id"), F.lit(20)) % n_cust).alias("o_custkey"),
        F.when(_h(F.col("id"), F.lit(21)) % 2 == 0, "O")
        .otherwise("F")
        .alias("o_orderstatus"),
        ((_h(F.col("id"), F.lit(22)) % 45_000_000) / 100.0 + 1000).alias(
            "o_totalprice"
        ),
        F.to_timestamp(
            F.date_add(
                F.lit("1992-01-01").cast("date"),
                (_h(F.col("id"), F.lit(23)) % 2557).cast("int"),
            )
        ).alias("o_orderdate"),
        F.concat(
            F.lit((_h(F.col("id"), F.lit(24)) % 5 + 1)).cast("string"),
            F.lit("-PRIORITY"),
        ).alias("o_orderpriority"),
    )


def gen_events(spark, n, n_users):
    # ~30 days of event time, ids in ingestion order but timestamps
    # nearly-sorted with bounded jitter (the late-arrival shape)
    ids = spark.range(n)
    span_us = 30 * 86_400_000_000
    types = F.array(
        *[F.lit(t) for t in ["view", "click", "purchase", "signup", "error"]]
    )
    base_us = (F.col("id") * (span_us // n)).cast("long")
    jitter = (_h(F.col("id"), F.lit(30)) % 3_600_000_000).cast("long")
    return ids.select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000) + base_us + jitter
        ).alias("ts"),
        (_h(F.col("id"), F.lit(31)) % n_users).alias("user_id"),
        F.element_at(
            types, (_h(F.col("id"), F.lit(32)) % 5).cast("int") + 1
        ).alias("event_type"),
        ((_h(F.col("id"), F.lit(33)) % 10000) / 100.0).alias("value"),
        F.concat(
            F.lit('{"k": '),
            (_h(F.col("id"), F.lit(34)) % 100).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )


def gen_part(spark, n_parts):
    """Minimal part dimension (universe scales with the data —
    consumed by the negative-sampling validity semi-join and any
    part-attribute join)."""
    ids = spark.range(n_parts)
    return ids.select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("Brand#"), (_h(F.col("id"), F.lit(21)) % 25 + 11))
        .alias("p_brand"),
        F.concat(F.lit("part "), F.col("id")).alias("p_name"),
        ((900 + _h(F.col("id"), F.lit(22)) % 1_200_00) / 100.0).alias(
            "p_retailprice"
        ),
        # p_type: PROMO for ~1/5 of parts (the DiD treatment flag)
        F.when(
            _h(F.col("id"), F.lit(23)) % 5 == 0, F.lit("PROMO BURNISHED")
        )
        .otherwise(F.lit("STANDARD PLATED"))
        .alias("p_type"),
    )


def main() -> None:
    out_root = sys.argv[1]
    mults = [int(m) for m in sys.argv[2:]] or [1, 10]
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("gen_scale_fixture")
        .getOrCreate()
    )
    for m in mults:
        d = os.path.join(out_root, f"scale{m}")
        n_parts = N_PARTS_BASE * m
        tables = {
            "part": gen_part(spark, n_parts),
            "lineitem": gen_lineitem(spark, BASE["lineitem"] * m, n_parts),
            "documents": gen_documents(spark, BASE["documents"] * m),
            "embeddings": gen_embeddings(spark, BASE["embeddings"] * m),
            "customer": gen_customer(spark, BASE["customer"] * m),
            "orders": gen_orders(
                spark, BASE["orders"] * m, BASE["customer"] * m
            ),
            "events": gen_events(
                spark, BASE["events"] * m, 1_500 * m
            ),
        }
        for name, df in tables.items():
            path = os.path.join(d, f"{name}.parquet")
            df.coalesce(max(1, 4 * m)).write.mode("overwrite").parquet(path)
            print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
