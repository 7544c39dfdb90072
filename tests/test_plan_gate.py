"""Registry-wide physical-plan gate.

The per-query plan assertions (tests/test_plans.py etc.) protect the
queries they name — and rot as the registry grows. This sweep compiles
EVERY registered batch query at sf0.001 and fails on scale-killing
physical operators anywhere in the plan:

* ``Exchange SinglePartition`` over anything but a PARTIAL AGGREGATE —
  a global funnel: one task processes data-sized input (global
  sort/window/limit surfaces must plan as TakeOrderedAndProject or go
  through the O(P) global-rank operator). The partial-aggregate
  exemption is principled, not a convenience: under a scalar aggregate
  (``df.agg(...)`` with no keys) the map side pre-reduces every
  partition to ONE row, so exactly P rows cross the single-partition
  exchange — O(cluster), not O(data) — and forbidding that would
  outlaw every global count/min/max. The gate therefore inspects the
  exchange's CHILD: ``partial_``-function aggregates pass, anything
  else (Sort, LocalLimit, Window, a bare join side) is a violation.
* ``CartesianProduct`` — an unkeyed data×data cross join. The engine's
  deliberate cross joins (rank.py / zorder.py control-table triangles)
  are O(P)/O(1)-sized and broadcast, so they plan as
  BroadcastNestedLoopJoin — a CartesianProduct appearing means a keyed
  join lost its key or a new query crossed two facts.
* ``BatchEvalPython`` — a row-at-a-time (non-Arrow) Python UDF in the
  hot path; every sanctioned Python boundary is Arrow-batched
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas), which this
  pattern does not match.

The sweep reads the SIMPLE explain string, where the pattern prints
contiguously as ``Exchange SinglePartition`` with its child on the next
line. The previous revision grepped the FORMATTED string — where the
same exchange prints as ``(N) Exchange`` + ``Arguments:
SinglePartition`` on separate lines — so the single-partition check had
never actually fired (found round 7 when a deliberately-funneling draft
query sailed through).

Stream-replay queries (``stream_*``, ``producer_*``) are excluded: their
fn() executes the stream and returns a memory-sink scan, so the plan
visible here is not the micro-batch plan (those are covered by the
streaming plan/behavior tests). Everything else — including ML and ANN
queries whose fn() performs bounded bootstrap work — is gated on the
plan of the DataFrame it returns.

ALLOWLIST entries require a justification string; additions should be
rare and deliberate.
"""

from __future__ import annotations

FORBIDDEN = (
    "CartesianProduct",
    "BatchEvalPython",
)

# Child-line shape that makes an Exchange SinglePartition benign: an
# aggregate operator whose functions are partial (map-side) reductions,
# so each partition sends ONE row across the exchange. The check is
# structural, not a bare substring: the child must BE an aggregate node
# (a column merely named `partial_x` under a Sort doesn't pass), and
# `partial_collect_list`/`partial_collect_set` are excluded — their
# partial buffers carry every value of the column, so all data bytes
# still funnel through the single task.
import re as _re

_PARTIAL_AGG_CHILD = _re.compile(
    r"(HashAggregate|SortAggregate|ObjectHashAggregate)\(.*partial_"
)
# A keyless aggregate whose function list was COLUMN-PRUNED away
# (functions=[]) emits exactly one zero-column row per partition — the
# degenerate "constant row" shape Catalyst leaves behind when a scalar
# subtree's output is unused in one consumer (seen first on the geo
# auto-span aggregate inside customer_geo_dbscan, round 12). One empty
# row per partition through the exchange is benign by construction.
_EMPTY_AGG_CHILD = _re.compile(
    r"(HashAggregate|SortAggregate|ObjectHashAggregate)"
    r"\(keys=\[\], functions=\[\]\)"
)
_DATA_SIZED_PARTIAL = "partial_collect_"

# name -> (pattern, why it is acceptable THERE). Empty today; keep it so.
ALLOWLIST: dict[str, tuple[str, str]] = {}

_STREAM_PREFIXES = ("stream_", "producer_")


def _single_partition_violations(plan: str) -> list[str]:
    """Every ``Exchange SinglePartition`` whose child is not a partial
    aggregate, reported with the offending child line."""
    out = []
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1].strip() if i + 1 < len(lines) else "<none>"
        if _EMPTY_AGG_CHILD.search(child):
            continue
        if not _PARTIAL_AGG_CHILD.search(child) or (
            _DATA_SIZED_PARTIAL in child
        ):
            out.append(f"Exchange SinglePartition over [{child[:80]}]")
    return out


def test_no_scale_killing_operators_anywhere(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    violations: list[str] = []
    scanned = 0
    for name, q in all_queries().items():
        if name.startswith(_STREAM_PREFIXES):
            continue
        scanned += 1
        try:
            df = q.fn(spark, sf)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            # Collect, don't fail-fast: one broken query must not hide
            # the remaining planning failures and forbidden-operator
            # hits in the same sweep (ADVICE r6).
            violations.append(f"{name}: failed to plan: {exc!r}")
            continue
        found = [pat for pat in FORBIDDEN if pat in plan]
        found.extend(_single_partition_violations(plan))
        for desc in found:
            allowed = ALLOWLIST.get(name)
            if allowed and allowed[0] in desc:
                continue
            violations.append(f"{name}: {desc}")
    assert scanned > 150, f"registry shrank? scanned only {scanned}"
    assert violations == [], (
        "scale-killing operators in registry plans (justify in ALLOWLIST "
        f"only with a written reason): {violations}"
    )
