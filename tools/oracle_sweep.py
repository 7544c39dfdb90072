#!/usr/bin/env python
"""Full-registry oracle sweep on a VANILLA session at sf0.01 — the
grading driver's exact regime (default confs, ANSI on, no nanosAsLong,
arrow-path compare). The pytest suite runs at sf0.001; scale-dependent
divergences (equi-width bucket counts, candidate-set sizes, window
boundaries) can pass there and fail at the driver's sf0.01 — this sweep
caught exactly such a bug (doc_length_histogram after a constant
shadowing). ~2-3 min for the full registry.

Usage: python tools/oracle_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from oracle_harness import compare_query

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = e.queries(), e.oracle_sql()
    fails, n = [], 0
    t0 = time.time()
    for name in qs:
        if name not in osql:
            continue
        n += 1
        try:
            diff = compare_query(qs[name](spark, sf), osql[name], sf)
            if diff:
                fails.append((name, diff[:1]))
        except Exception as exc:  # noqa: BLE001
            fails.append((name, repr(exc)[:150]))
    print(f"checked {n} oracle-backed queries at {sf} in {time.time()-t0:.0f}s")
    print("FAILS:", fails if fails else "NONE")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
