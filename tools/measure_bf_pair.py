"""Re-measurable evidence for the type-0 → fused-bf routing rule
(routing.py:40-62): at N×dim (default 500k×64, inside
``knn.bc_rows_bound(64)``), time the bf-routed query subset through
BOTH physical plans of ``knn_sq8_rerank`` — the fused corpus-broadcast
kernel (the routed choice) and the forced query-broadcast codes scan +
pool window + re-rank (the 100 TB shape) — warmed, min-of-2 each.

Usage: python tools/measure_bf_pair.py [N_ROWS] [N_QUERIES]
Prints one JSON line; the README's routing-rule numbers cite this.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from sigmod_2024_contest_spark.functions import quantization as Q
    from sigmod_2024_contest_spark.operators import bruteforce_sq8, routing
    from sigmod_2024_contest_spark.session import get_spark, ship_package
    from tools.stress_scale import synth_base, synth_queries

    spark = get_spark("measure-bf-pair")
    ship_package(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    base = synth_base(spark, n_rows).persist(StorageLevel.MEMORY_AND_DISK)
    nb = base.count()
    queries = synth_queries(spark, n_queries).persist()
    queries.count()
    plan = routing.route_plan(base, queries, dim=64).persist()
    bf_q = queries.join(
        plan.filter(F.col("route") == routing.ROUTE_BF).select("query_id"), "query_id"
    ).persist()
    n_bf = bf_q.count()
    alpha = Q.train_alpha(base)

    out: dict = {"n_rows": nb, "n_queries": n_queries, "n_bf_routed": n_bf, "dim": 64}
    warm = bf_q.limit(128)
    for label, force in (("fused", False), ("scan", True)):
        bruteforce_sq8.knn_sq8_rerank(
            base, warm, alpha, corpus_rows=nb, dim=64, force_scan=force
        ).count()  # plan warmup outside the clocks
        walls = []
        for _ in range(2):
            t0 = time.time()
            bruteforce_sq8.knn_sq8_rerank(
                base, bf_q, alpha, corpus_rows=nb, dim=64, force_scan=force
            ).count()
            walls.append(round(time.time() - t0, 3))
        out[f"bf_{label}"] = min(walls)
        out[f"bf_{label}_runs"] = walls
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
