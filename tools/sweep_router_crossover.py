"""Re-calibrate the type-0 → fused-bf routing crossover (r11 verdict #6).

The r11 warm scale curve read 500k/59.4 s search vs 1M/32.1 s — the
smaller corpus SLOWER. At 500k×dim64 the corpus sits under
``bc_rows_bound(64)`` = 625k, so route_plan sends every type-0 query
(25 % of the batch) to the fused corpus-broadcast bf kernel; at 1M the
same queries take the decile-graph fan-out. If the fused kernel loses
to the fan-out at 500k, the bound is mis-calibrated for the small end.

This tool measures BOTH routings of the SAME batch at each corpus
size: identical synthetic inputs, one index build per size, per-rep
INTERLEAVED (t0→bf, t0→graph) pairs (the in-run pairing every other
bench comparison uses), min-of-N per variant, route mix recorded.
The variant knob is ``route_plan(t0_bf_bound=...)`` — 2^62 forces
type-0 to bf wherever fused applies, 0 forces the graph fan-out;
everything else (low-selectivity bf routing, engine internals) is
identical between variants.

Usage: python tools/sweep_router_crossover.py [--sizes 250000,500000,1000000]
           [--nq 2048] [--reps 2]

Machine must be otherwise idle (the round-workflow measurement rule).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="250000,500000,1000000")
    ap.add_argument("--nq", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    dim = 64

    from pyspark import StorageLevel

    from sigmod_2024_contest_spark.functions import quantization as Q
    from sigmod_2024_contest_spark.operators import engine, routing
    from sigmod_2024_contest_spark.operators import stats as stats_ops
    from sigmod_2024_contest_spark.session import get_spark, ship_package
    from tools.stress_scale import synth_base, synth_queries

    spark = get_spark("sweep-router", shuffle_partitions=128)
    ship_package(spark)

    VARIANTS = {"t0_bf": 1 << 62, "t0_graph": 0}
    for n_rows in (int(s) for s in args.sizes.split(",")):
        base = synth_base(spark, n_rows, dim).persist(StorageLevel.MEMORY_AND_DISK)
        nb = base.count()
        queries = synth_queries(spark, args.nq, dim).persist()
        queries.count()
        st = stats_ops.corpus_stats(base, routing.ROUTING_TS_BINS)
        alpha = Q.train_alpha(base)
        splan = engine._shard_plan(base, routing.CAT_GRAPH_THR, engine.MAX_NODES_PER_GRAPH)
        index = engine.partition_index_for_search(
            engine.build_index(
                base, graph_min_nodes=engine.GEMM_SHARD_THR, shard_plan=splan, alpha=alpha
            )
        ).persist(StorageLevel.MEMORY_AND_DISK)
        index.count()
        catalog = engine.catalog_from_plan(spark, splan)

        # symmetric warmup per variant, off the clocks
        warm_q = queries.limit(256)
        for bound in VARIANTS.values():
            wplan = routing.route_plan(base, warm_q, stats=st, dim=dim, t0_bf_bound=bound)
            engine.knn_hybrid(
                spark, base, warm_q, index=index, plan=wplan, alpha=alpha,
                catalog=catalog, corpus_rows=nb, dim=dim,
            ).count()

        walls: dict[str, list[float]] = {v: [] for v in VARIANTS}
        mixes: dict[str, dict[str, int]] = {}
        for _rep in range(args.reps):
            for vname, bound in VARIANTS.items():
                t0 = time.time()
                plan = routing.route_plan(
                    base, queries, stats=st, dim=dim, t0_bf_bound=bound
                ).persist()
                res = engine.knn_hybrid(
                    spark, base, queries, index=index, plan=plan, alpha=alpha,
                    catalog=catalog, corpus_rows=nb, dim=dim,
                ).persist(StorageLevel.MEMORY_AND_DISK)
                res.count()
                walls[vname].append(round(time.time() - t0, 2))
                mixes[vname] = {
                    r["route"]: r["count"] for r in plan.groupBy("route").count().collect()
                }
                res.unpersist()
                plan.unpersist()
        line = {
            "n_rows": nb,
            "nq": args.nq,
            "shards": sum(splan.values()),
            "default_bound_rows": __import__(
                "sigmod_2024_contest_spark.operators.knn", fromlist=["bc_rows_bound"]
            ).bc_rows_bound(dim),
        }
        for vname in VARIANTS:
            line[f"{vname}_sec"] = min(walls[vname])
            line[f"{vname}_runs"] = walls[vname]
            line[f"{vname}_mix"] = mixes[vname]
        line["winner"] = min(VARIANTS, key=lambda v: min(walls[v]))
        print(json.dumps(line), flush=True)
        index.unpersist()
        base.unpersist()
        queries.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
