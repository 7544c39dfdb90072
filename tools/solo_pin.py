#!/usr/bin/env python
"""Solo re-pin of bench priors (VERDICT r12 "Next round" #1/#2).

Measures the named queries OUTSIDE the full-suite contention regime:
one warm session, best-of-N (default 5) noop-forced reps per query,
cache cleared between reps — the same forcing protocol as bench.py but
with nothing else competing for the 32 local cores.  Prints one JSON
line per query plus a summary map; pass ``--write`` to fold the new
bests into BENCH_LOCAL.json's ``queries`` map (priors only — the
driver-recorded BENCH_r{N}.json files are never touched).

Usage:
  PYTHONPATH=. python tools/solo_pin.py [--reps 5] [--write] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--write", action="store_true")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
    from big_data_analysis_diseases_outbreaks_spark.session import get_spark

    spark = get_spark(app_name="solo_pin")
    registry = all_queries()

    # Same untimed engine warmups bench.py pays (JVM/codegen/Arrow).
    from pyspark.sql import functions as _F

    spark.range(1000).selectExpr("sum(id)").collect()
    registry["trends_daily_agg"].fn(spark, args.sf_dir).count()
    _noop = _F.pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_noop("id")).count()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    results: dict[str, list[float]] = {}
    for name in args.names:
        q = registry[name]
        reps: list[float] = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            q.fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        results[name] = reps
        print(
            json.dumps({"query": name, "best": min(reps), "reps": reps}),
            flush=True,
        )

    bests = {n: min(r) for n, r in results.items()}
    print(json.dumps({"solo_bests": bests}))

    if args.write:
        # Fold into the per-regime prior floor the bench guard reads
        # (elementwise min — a solo pin can only TIGHTEN the floor).
        path = os.path.join(repo, "BENCH_PRIORS.json")
        sf = os.path.basename(args.sf_dir.rstrip("/")).replace("sf", "")
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
        regime = f"{cpus}@sf{sf}"
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            data = {}
        sect = data.setdefault("by_regime", {}).setdefault(
            regime, {"queries": {}}
        )
        pq = sect.setdefault("queries", {})
        for n, b in bests.items():
            old = pq.get(n)
            pq[n] = (
                round(min(old, b), 3)
                if isinstance(old, (int, float)) and old > 0
                else b
            )
        with open(path, "w") as fh:
            json.dump(data, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(
            f"folded {len(bests)} pins into {path} [{regime}]",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
