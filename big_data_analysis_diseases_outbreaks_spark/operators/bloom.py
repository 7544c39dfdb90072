"""Distributed Bloom-filter build + map-side membership test.

The approximate-membership pre-pass a 100 TB incremental dedup wants in
front of its exact seen-set anti-join: the seen side is folded into an
``m``-bit Bloom filter with one distributed aggregation (explode k
positions → bit_or per 64-bit word), the filter is collected to the
driver (BOUNDED: ``m / 64`` longs — a property of the filter size, not
of the data) and shipped to executors as ONE array literal inside the
task binary (a broadcast), and membership is tested map-side with
``element_at`` + bit ops — no join, no shuffle, no Python.

Positions use Kirsch-Mitzenmacher double hashing [ESA'06]:
``pos_i = (h1 + i·h2) mod m`` gives k independent-enough probes from
two base hashes, with all arithmetic kept inside signed-64 range (the
base hash is the first 48 bits of the row's md5 fingerprint, reduced
mod two large primes before any multiply).

A Bloom "no" is definitive (no false negatives — inserted keys always
hit all k bits), so the pre-pass can only ROUTE rows, never change the
result: definite-new rows skip the exact anti-join entirely, and only
the "maybe seen" slice (true duplicates + an FPR-bounded sliver of new
rows) pays the shuffle. Designed FPR ≈ (1 − e^(−k·n/m))^k; size m ≈
−k·n / ln(1 − FPR^(1/k)) from the seen-set cardinality estimate (a
sketch the pipeline already maintains).

Reference scope: extends the reference's exact dedup (no approximate
structures in the reference); the exact output contract is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P1 = 2_147_483_647  # 2^31 - 1 (Mersenne)
_P2 = 1_073_741_789  # largest prime < 2^30


def _base_hashes(fp_col: Column) -> tuple[Column, Column]:
    """(h1, h2) from a 32-hex-char fingerprint column — first 48 bits,
    reduced mod two primes.  h2 = 1 + 2·(h mod P2) is strictly ODD, so
    it is coprime with any power-of-two ``m`` and the k
    Kirsch-Mitzenmacher probes can never collapse onto a single bit
    (an even h2 sharing all factors with m would locally inflate FPR;
    never a correctness issue — no false negatives either way).
    Max h2 ≈ 2^31, times i < k keeps all arithmetic in signed-64."""
    h = F.conv(F.substring(fp_col, 1, 12), 16, 10).cast("long")
    return h % _P1, F.lit(1).cast("long") + F.lit(2).cast("long") * (h % _P2)


def _position(h1: Column, h2: Column, i: int, m: int) -> Column:
    return (h1 + F.lit(i).cast("long") * h2) % F.lit(m)


def bloom_build(df: DataFrame, fp_col: str, m: int, k: int) -> list[int]:
    """Aggregate ``df[fp_col]`` into an m-bit Bloom filter; returns the
    m/64 little-endian words. One shuffle (k·n rows of two ints wide →
    m/64 groups); the collect is bounded by the filter size."""
    if m % 64:
        raise ValueError(f"bloom m must be a multiple of 64, got {m}")
    h1, h2 = _base_hashes(F.col(fp_col))
    pos = F.explode(
        F.array(*[_position(h1, h2, i, m) for i in range(k)])
    ).alias("pos")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            (F.col("pos") % 64).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(
                # SQL shiftleft accepts a column shift amount; the
                # Python wrapper F.shiftleft does not (int only).
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), F.col("bit")
                )
            ).alias("bits")
        )
        .collect()
    )
    arr = [0] * (m // 64)
    for row in words:
        arr[row["word"]] = row["bits"]
    return arr


def bloom_maybe(fp_col: Column, words: list[int], m: int, k: int) -> Column:
    """Boolean column: all k probe bits set (membership "maybe")."""
    if m % 64:
        raise ValueError(f"bloom m must be a multiple of 64, got {m}")
    if len(words) != m // 64:
        raise ValueError(f"words has {len(words)} entries, want {m // 64}")
    wvec = F.lit(words)  # ONE ArrayType literal — shipped with the task
    h1, h2 = _base_hashes(fp_col)
    cond = F.lit(True)
    for i in range(k):
        pos = _position(h1, h2, i, m)
        word = F.element_at(wvec, (pos / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond
