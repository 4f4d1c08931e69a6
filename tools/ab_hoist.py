"""A/B the tokenization hoist per operator (r10 verdict #4).

Commit a76b5f1 hoisted `split(text, ' ')` into its own projection for
the multi-feature text operators, arguing one split per row beats one
per feature. The r10 driver artifact then showed text_stats at ~2.2×
its r1-r8 band. Two plan shapes, bit-identical values:

- HOIST: `select(doc_id, text, split(..) AS ws)` → feature projection
  reading `ws` — two ProjectExecs in one codegen stage; the array is
  bound once but materialized across the projection boundary.
- INLINE: one projection where every feature expression contains its
  own `split(..)` — whole-stage codegen's subexpression elimination
  (spark.sql.subexpressionElimination.enabled, default true) still
  evaluates the split once per row, with no extra boundary.

This tool measures min-of-N wall for both shapes of text_stats /
lang_id / quality_classifier at $SPARK_GRAFT_SF_DIR (default sf0.1),
reps interleaved, and asserts both shapes return identical results
once per operator. The per-operator winner becomes the `hoist=`
default in functions/text.py; README records the table.

Usage: python tools/ab_hoist.py [--sf DIR] [--reps 3]
"""
from __future__ import annotations

import argparse
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

    from sigmod_2024_contest_spark.functions import text as T
    from sigmod_2024_contest_spark.session import get_spark
    from sigmod_2024_contest_spark.sources.tables import load_table

    spark = get_spark("ab-hoist", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    docs = load_table(spark, args.sf, "documents")
    ops = {
        "text_stats": T.text_stats,
        "lang_id": T.lang_id,
        "quality_classifier": T.quality_classifier,
    }
    # warm the session + the doc scan once, outside every clock
    docs.count()

    print(f"# sf={args.sf} reps={args.reps} (min-of-N, reps interleaved)")
    print(f"| operator | inline s | hoist s | winner |")
    print(f"|---|---|---|---|")
    for name, fn in ops.items():
        # identity check once: both shapes must return the same rows
        a = {tuple(r) for r in fn(docs, hoist=False).collect()}
        b = {tuple(r) for r in fn(docs, hoist=True).collect()}
        assert a == b, f"{name}: shapes disagree"
        walls: dict[bool, list[float]] = {False: [], True: []}
        for _rep in range(args.reps):
            for hoist in (False, True):
                t0 = time.time()
                fn(docs, hoist=hoist).count()
                walls[hoist].append(round(time.time() - t0, 3))
        inl, hoi = min(walls[False]), min(walls[True])
        winner = "inline" if inl <= hoi else "hoist"
        print(
            f"| {name} | {inl} {walls[False]} | {hoi} {walls[True]} | {winner} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
