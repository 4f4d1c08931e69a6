"""A/B the retrieval_rrf shared pipeline (r11 verdict #3).

Two plan shapes, identical values (asserted once per run):

- SEPARATE (the r11 shape): ``rrf_fuse(bm25_topk(docs),
  tf_match_topk(docs))`` — each ranking independently tokenizes the
  corpus and pays its own pair aggregate (6 corpus scans, 2 pair
  exchanges), fused with a FULL OUTER join on top-k-bounded inputs.
- SHARED (the r12 shape): ``retrieval_rrf(docs)`` — one probe join,
  one (query_id, doc_id) aggregate carrying BOTH sums, two rank
  windows over the same scores table, join-free fusion (4 corpus
  scans, 1 pair exchange).

min-of-N wall for both shapes at $SPARK_GRAFT_SF_DIR (default sf0.1),
reps interleaved so each pair is compared in-run (the ab_hoist
protocol); README records the table.

Usage: python tools/ab_rrf.py [--sf DIR] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from sigmod_2024_contest_spark.functions import retrieval as R
    from sigmod_2024_contest_spark.session import get_spark
    from sigmod_2024_contest_spark.sources.tables import load_table

    spark = get_spark("ab-rrf", shuffle_partitions=32)
    docs = load_table(spark, args.sf, "documents")

    def separate():
        return R.rrf_fuse(R.bm25_topk(docs), R.tf_match_topk(docs))

    def shared():
        return R.retrieval_rrf(docs)

    # value identity, once, off the clocks
    a = {tuple(r) for r in separate().collect()}
    b = {tuple(r) for r in shared().collect()}
    assert a == b and a, f"shape mismatch: {len(a)} vs {len(b)} rows"

    walls = {"separate": [], "shared": []}
    for _rep in range(args.reps):
        for name, fn in (("separate", separate), ("shared", shared)):
            t0 = time.time()
            fn().count()
            walls[name].append(round(time.time() - t0, 3))
    sep, sha = min(walls["separate"]), min(walls["shared"])
    print(
        json.dumps(
            {
                "sf": args.sf,
                "separate_sec": sep,
                "shared_sec": sha,
                "speedup": round(sep / sha, 2),
                "runs": walls,
                "values_identical": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
