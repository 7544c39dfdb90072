#!/usr/bin/env python
"""Capture `.explain("formatted")` output for named queries into
plans/<tag>/<query>_<suffix>.txt — the judge-checkable evidence behind
every optimization-round plan claim (guide §1.4/§7.2).

Usage:
  PYTHONPATH=. python tools/capture_plans.py --suffix before q1 q2 ...

Plans are captured on the bench session (get_spark: AQE on, shuffle
partitions sized to the machine) at $SPARK_GRAFT_SF_DIR (default
sf0.1), BEFORE execution — so they show the static plan shape
(Exchange count, join strategy, PushedFilters/ReadSchema, codegen
spans), which is what the optimization log cites.
"""

from __future__ import annotations

import argparse
import os
import sys


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out-dir", default="plans/r14")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries
    from big_data_analysis_diseases_outbreaks_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    registry = all_queries()
    out_dir = os.path.join(repo, args.out_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in args.names:
        df = registry[name].fn(spark, args.sf_dir)
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_formatted(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
