"""Skew mitigation: salted joins for hot keys.

SURVEY.md §7 posture: at 100 TB a handful of hot join keys (here:
``events.event_type`` — a few distinct values across the whole fact
table) turn a hash join into a straggler, because every row of a hot key
lands in ONE shuffle partition. Salting splits each hot key into
``n_salts`` synthetic sub-keys: the fact side gets a deterministic salt
derived from a high-cardinality column, the (small) build side is
replicated once per salt value, and the join runs on
(key, salt) — spreading each hot key over ``n_salts`` partitions.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) solves the
sort-merge variant at runtime; explicit salting remains the portable fix
when the build side must shuffle too, or when an aggregation (not a
join) is skewed. The salt is deterministic (hash of a chosen column,
not ``rand()``) so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, salt_from: str, n_salts: int = 32, out: str = "_salt"
) -> DataFrame:
    """Deterministic salt ∈ [0, n_salts) from a high-cardinality column."""
    return df.withColumn(out, F.pmod(F.xxhash64(salt_from), F.lit(n_salts)))


def replicate_for_salt(
    df: DataFrame, n_salts: int = 32, out: str = "_salt"
) -> DataFrame:
    """Cross the (small) build side with the salt domain: one copy per
    salt value, so every (key, salt) pair of the probe side finds its
    match. Replication factor = n_salts — only viable for small sides,
    which is exactly the skew-join case."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    return df.withColumn(out, salts)


def salted_join(
    fact: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: str,
    n_salts: int = 32,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ small on ``on`` with each key split into n_salts sub-keys.

    Equivalent to ``fact.join(small, on, how)`` for keys present on both
    sides; the salt column never escapes.

    ``how`` is restricted to fact-side-preserving joins: the build side
    is replicated n_salts times, so right/full-outer (and right_semi /
    right_anti) would emit each unmatched build-side row once per salt.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — build-side replication"
            " multiplies unmatched small-side rows; use inner/left/semi/anti"
        )
    f = with_salt(fact, salt_from, n_salts)
    s = replicate_for_salt(small, n_salts)
    return f.join(s, on=[*on, "_salt"], how=how).drop("_salt")
