#!/usr/bin/env python
"""Suggest the next round's first-50 correctness window.

The driver's CORRECTNESS gate checks only the first 50 registered
queries; a hash-green row in ANY past round is permanent evidence. This
tool scans CORRECTNESS_r*.json, lists every oracle-backed query that has
never been driver-green plus rows-only queries that have never even had
a driver row, and prints a suggested `_PRIORITY` ordering for
`big_data_analysis_diseases_outbreaks_spark/queries/__init__.py` (never-green
oracle-backed first, then never-seen rows-only up to 50 slots).

Usage: PYTHONPATH=. python tools/rotate_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from big_data_analysis_diseases_outbreaks_spark.queries import all_queries

    qs = all_queries()
    green: set[str] = set()
    seen: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        for name, r in json.load(open(f)).items():
            seen.add(name)
            if (
                r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            ):
                green.add(name)

    never_green_oracle = [
        n for n in qs if qs[n].oracle is not None and n not in green
    ]
    never_seen_rows_only = [
        n for n in qs if qs[n].oracle is None and n not in seen
    ]
    window = (never_green_oracle + never_seen_rows_only)[:50]

    print(f"# registry: {len(qs)} queries, "
          f"{sum(1 for q in qs.values() if q.oracle)} oracle-backed")
    print(f"# ever driver-green: {len(green)}; "
          f"never-green oracle-backed: {len(never_green_oracle)}; "
          f"rows-only never in a window: {len(never_seen_rows_only)}")
    print(f"# suggested _PRIORITY ({len(window)} of 50 slots filled):")
    for n in window:
        print(f'    "{n}",')
    if len(window) < 50:
        print(f"# {50 - len(window)} spare slots — backfill with flagship "
              f"already-green queries for re-confirmation.")


if __name__ == "__main__":
    main()
