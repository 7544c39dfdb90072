"""Registry-wide physical-plan gate.

The per-query plan assertions (tests/test_plans.py etc.) protect the
queries they name — and rot as the registry grows. This sweep compiles
EVERY registered batch query at sf0.001 and fails on scale-killing
physical operators anywhere in the formatted plan:

* ``Exchange SinglePartition`` — a global funnel: one task processes the
  whole dataset (global sort/limit surfaces must plan as
  TakeOrderedAndProject or stay partitioned; the composed pipelines go
  through the O(P) global-rank operator for exactly this reason).
* ``CartesianProduct`` — an unkeyed data×data cross join. The engine's
  deliberate cross joins (rank.py / zorder.py control-table triangles)
  are O(P)/O(1)-sized and broadcast, so they plan as
  BroadcastNestedLoopJoin — a CartesianProduct appearing means a keyed
  join lost its key or a new query crossed two facts.
* ``BatchEvalPython`` — a row-at-a-time (non-Arrow) Python UDF in the
  hot path; every sanctioned Python boundary is Arrow-batched
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas), which this
  pattern does not match.

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
    "Exchange SinglePartition",
    "CartesianProduct",
    "BatchEvalPython",
)

# name -> (pattern, why it is acceptable THERE). Empty today; keep it so.
ALLOWLIST: dict[str, tuple[str, str]] = {}

_STREAM_PREFIXES = ("stream_", "producer_")


def test_no_scale_killing_operators_anywhere(spark):
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
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
        for pat in FORBIDDEN:
            if pat in plan:
                allowed = ALLOWLIST.get(name)
                if allowed and allowed[0] == pat:
                    continue
                violations.append(f"{name}: {pat}")
    assert scanned > 150, f"registry shrank? scanned only {scanned}"
    assert violations == [], (
        "scale-killing operators in registry plans (justify in ALLOWLIST "
        f"only with a written reason): {violations}"
    )
