"""Isolated min-of-N re-measurement for registry entries.

This VM shows ±50% run-to-run variance on individual bench entries
(documented in README), so a single slower clock in a 100-entry sweep
is NOT a regression signal. The protocol — re-run the suspect entries
alone, warmed, min-of-N — lived in ad-hoc snippets; this makes it a
tool so every round's regression triage is one command.

Usage:
  python tools/bench_repeat.py ENTRY [ENTRY ...] [--n 3] [--sf SF_DIR]

Prints one JSON line per entry: {"entry", "runs", "min", "median"}.
"""
from __future__ import annotations

import argparse
import gc
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from sigmod_2024_contest_spark import api
    from sigmod_2024_contest_spark.session import get_spark

    spark = get_spark("bench-repeat", shuffle_partitions=32)
    reg = api.queries()
    unknown = [e for e in args.entries if e not in reg]
    if unknown:
        sys.exit(f"unknown entries: {unknown}")

    # one warm-up action: JVM/codegen/python-worker startup off the clocks
    reg["stats_category_counts"](spark, args.sf).count()

    for name in args.entries:
        runs = []
        for _ in range(args.n):
            gc.collect()
            t0 = time.time()
            reg[name](spark, args.sf).count()
            runs.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {
                    "entry": name,
                    "runs": runs,
                    "min": min(runs),
                    "median": round(statistics.median(runs), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
