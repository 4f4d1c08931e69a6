#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric", "value", "unit", "queries", "sf"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: kept small and representative; every entry also exists
# in the api registry so correctness is covered by the driver's t2.
HEADLINE = [
    "knn_bruteforce",
    "knn_declarative",
    "knn_sq8_rerank",
    "knn_hybrid",
]


def main() -> None:
    from sigmod_2024_contest_spark import api
    from sigmod_2024_contest_spark.session import get_spark

    spark = get_spark("bench")
    reg = api.queries()
    # warm the session once (JVM/codegen/python-worker startup + package
    # shipping) so per-query timings measure the queries, not app init
    try:
        reg["stats_category_counts"](spark, SF_DIR).count()
    except Exception:
        pass
    names = [n for n in HEADLINE if n in reg]
    # include any registered query not in HEADLINE as well — the driver
    # grades total coverage, and per-query timings localize regressions
    names += [n for n in sorted(reg) if n not in names]

    # Build/Search split (reference baseline.cpp:96,152): the one-time
    # graph-index build + parquet save/load is timed here, OUTSIDE the
    # per-query search clocks, and reported under "prep" — knn_hybrid /
    # recall_hybrid_vs_exact then measure search over the loaded index.
    prep: dict[str, float] = {}
    t0 = time.time()
    try:
        api.prepare_hybrid_index(spark, SF_DIR)
        prep["knn_hybrid_build"] = round(time.time() - t0, 3)
    except Exception as e:
        print(f"bench: knn_hybrid_build failed: {e}", file=sys.stderr)
        prep["knn_hybrid_build"] = -1.0

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        try:
            n = reg[name](spark, SF_DIR).count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep the bench line parseable on partial failure
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "prep": prep,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
