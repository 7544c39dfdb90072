"""Bloom-filter pre-pass invariants (operators/bloom.py).

Three properties the dedup_incremental_bloom routing rests on:

* NO FALSE NEGATIVES — every inserted fingerprint tests "maybe"
  (otherwise the route would silently re-emit a duplicate as new);
* measured false-positive rate within the designed
  (1 − e^(−k·n/m))^k bound at a deliberately saturated m;
* routed output ≡ the exact path (oracle parity is also checked by the
  driver; this pins it at pytest scale on a split WITH true
  cross-split duplicates, which the sf fixtures may lack).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.bloom import (
    bloom_build,
    bloom_maybe,
)

K = 4


def _fps(prefix: str, n: int) -> list[str]:
    return [
        hashlib.md5(f"{prefix}{i}".encode()).hexdigest() for i in range(n)
    ]


def test_no_false_negatives(spark):
    m = 1 << 13
    seen = _fps("seen", 1500)
    df = spark.createDataFrame([(s,) for s in seen], "fp STRING")
    words = bloom_build(df, "fp", m, K)
    hits = (
        df.withColumn("_m", bloom_maybe(F.col("fp"), words, m, K))
        .where("_m")
        .count()
    )
    assert hits == len(seen)


def test_fpr_within_design_bound(spark):
    m = 1 << 13  # deliberately saturated: kn/m ≈ 0.98
    n = 2000
    seen = _fps("seen", n)
    new = _fps("new", n)  # disjoint by construction
    words = bloom_build(
        spark.createDataFrame([(s,) for s in seen], "fp STRING"), "fp", m, K
    )
    fp_hits = (
        spark.createDataFrame([(s,) for s in new], "fp STRING")
        .withColumn("_m", bloom_maybe(F.col("fp"), words, m, K))
        .where("_m")
        .count()
    )
    designed = (1.0 - math.exp(-K * n / m)) ** K
    measured = fp_hits / n
    # Double hashing is slightly worse than ideal; 2x headroom, and a
    # floor that catches a broken filter (all-zero words -> 0.0 would
    # ALSO be suspicious given saturation, hence the lower bound).
    assert measured <= 2.0 * designed, (measured, designed)
    assert measured >= designed / 4.0, (measured, designed)


def test_routing_matches_exact(spark):
    m = 1 << 10  # tiny filter -> plenty of false positives to route
    corpus_fps = _fps("c", 300)
    batch_fps = _fps("b", 200) + corpus_fps[:50]  # 50 true duplicates
    corpus = spark.createDataFrame(
        [(s,) for s in corpus_fps], "fp STRING"
    )
    batch = spark.createDataFrame(
        [(s,) for s in set(batch_fps)], "fp STRING"
    )
    words = bloom_build(corpus, "fp", m, K)
    routed = batch.withColumn(
        "_m", bloom_maybe(F.col("fp"), words, m, K)
    )
    survivors = (
        routed.where("_m").drop("_m").join(corpus, "fp", "left_anti")
    ).unionByName(routed.where("NOT _m").drop("_m"))
    exact = batch.join(corpus, "fp", "left_anti")
    got = {r["fp"] for r in survivors.collect()}
    want = {r["fp"] for r in exact.collect()}
    assert got == want
    # sanity: the duplicate half really was flagged maybe
    assert routed.where("_m").count() >= 50
