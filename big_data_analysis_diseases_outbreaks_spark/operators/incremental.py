"""Incremental aggregate maintenance: merge partial aggregation states
instead of recomputing from raw data.

At 100 TB a daily rollup is never rebuilt from scratch — yesterday's
aggregate STATE merges with the new batch's partial aggregate, touching
only rows proportional to the delta. That works exactly when the
aggregate's state is associative/commutative (sum, count, min, max —
and anything derivable from them: mean, variance via (n, Σx, Σx²)).
This operator is the batch twin of Structured Streaming's stateful
aggregation merge, and mirrors what Spark itself does between its
partial and final HashAggregate phases — lifted to a user-visible
operator so state can persist across pipeline runs.

Column-name convention: ``n*``/``sum_*`` columns merge by SUM,
``min_*`` by MIN, ``max_*`` by MAX. Keeping sums integer-scaled
(functions/stable.py) makes the merge bit-exact and order-independent,
so an incrementally-maintained rollup is indistinguishable from a full
recompute — which is precisely what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_partial_aggregates(
    states: list[DataFrame], keys: list[str]
) -> DataFrame:
    """Union partial-aggregate states and combine them per key.

    Each state must share the same schema: ``keys`` plus state columns
    following the n*/sum_*/min_*/max_* naming convention.
    """
    if not states:
        raise ValueError("need at least one partial state")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    aggs = []
    for name in merged.columns:
        if name in keys:
            continue
        if name.startswith(("sum_", "n")):
            aggs.append(F.sum(name).alias(name))
        elif name.startswith("min_"):
            aggs.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            aggs.append(F.max(name).alias(name))
        else:
            raise ValueError(
                f"column {name!r} has no mergeable prefix (n/sum_/min_/max_)"
            )
    return merged.groupBy(*keys).agg(*aggs)
