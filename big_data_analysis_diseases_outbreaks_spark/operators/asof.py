"""General as-of join: backward / forward / nearest, with tolerance.

The pandas ``merge_asof`` / kdb ``aj`` operator family as ONE window
pass — the scalable as-of idiom (``queries/trends.py:asof_last_signup``
generalized to two arbitrary frames and all three directions):

* union the probe (left) and reference (right) rows into one keyed
  stream — right rows carry their payload in a struct, left rows carry
  theirs;
* one window per key ordered by (event time, side, right-tiebreak):
  ``last(right_payload, ignorenulls)`` over the unbounded-preceding
  frame yields each left row's latest right row at-or-before it
  (backward); the same window over descending time yields forward;
* nearest = the smaller absolute gap of the two, ties → backward;
* an optional tolerance nulls out matches farther than the bound.

No join, no per-key explosion: the cost is a union + (at most two)
window sorts over |L| + |R| rows, partitioned by key — exactly the
shuffle profile of a grouped aggregate, which is why this shape scales
where a range-join formulation degenerates (a range join on (key,
time-band) re-bucketizes; the window pass needs no banding).

At equal (key, ts): right rows sort BEFORE left rows (a reference row
timestamped exactly at the probe time matches, per merge_asof), and
among equal-ts right rows the one greatest under ``tiebreak_col``
wins deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    direction: str = "backward",
    tolerance_us: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Return ``left``'s rows plus a nullable ``asof`` struct holding the
    matched right row's columns (minus the key).

    ``ts`` must be a timestamp column present in both frames.
    ``tolerance_us`` bounds |gap| in microseconds; a left row with no
    in-tolerance match keeps a NULL ``asof``. ``tiebreak_col``: right
    column ordering equal-ts right rows (greatest wins); required for
    determinism when (key, ts) is not unique on the right.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    rpay = [c for c in right.columns if c != key]
    lpay = [c for c in left.columns]
    tie = (
        F.col(tiebreak_col)
        if tiebreak_col
        else F.lit(0)
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(0).alias("_side"),
        tie.cast("long").alias("_tie"),
        F.struct(*[right[c] for c in rpay]).alias("_rv"),
        F.lit(None)
        .cast(
            left.select(
                F.struct(*[left[c] for c in lpay]).alias("s")
            ).schema["s"].dataType
        )
        .alias("_lv"),
    )
    lft = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tie"),
        F.lit(None)
        .cast(
            right.select(
                F.struct(*[right[c] for c in rpay]).alias("s")
            ).schema["s"].dataType
        )
        .alias("_rv"),
        F.struct(*[left[c] for c in lpay]).alias("_lv"),
    )
    u = r.unionByName(lft)

    def _scan(desc: bool):
        if desc:
            order = [
                F.col("_t").desc(),
                F.col("_side").asc(),
                F.col("_tie").desc(),
            ]
        else:
            order = [
                F.col("_t").asc(),
                F.col("_side").asc(),
                F.col("_tie").asc(),
            ]
        w = (
            Window.partitionBy("_k")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_rv", ignorenulls=True).over(w)

    if direction == "backward":
        u = u.withColumn("_m", _scan(desc=False))
    elif direction == "forward":
        u = u.withColumn("_m", _scan(desc=True))
    else:
        u = u.withColumn("_mb", _scan(desc=False)).withColumn(
            "_mf", _scan(desc=True)
        )
        gap_b = F.abs(
            F.unix_micros(F.col("_t")) - F.unix_micros(F.col(f"_mb.{ts}"))
        )
        gap_f = F.abs(
            F.unix_micros(F.col(f"_mf.{ts}")) - F.unix_micros(F.col("_t"))
        )
        u = u.withColumn(
            "_m",
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(gap_f < gap_b, F.col("_mf"))  # ties -> backward
            .otherwise(F.col("_mb")),
        )
    out = u.where(F.col("_side") == 1)
    matched = F.col("_m")
    if tolerance_us is not None:
        gap = F.abs(
            F.unix_micros(F.col("_t")) - F.unix_micros(F.col(f"_m.{ts}"))
        )
        matched = F.when(gap <= F.lit(tolerance_us), F.col("_m"))
    return out.select(
        *[F.col(f"_lv.{c}").alias(c) for c in lpay],
        matched.alias("asof"),
    )
