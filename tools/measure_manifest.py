"""Measure manifest-mode vs full-snapshot write amplification for
streaming index ingest (README "Measured (1M rows, ...)" citation).

Synthesizes an N-row corpus, streams it as 4 ts-ordered micro-batches
(the realistic regime: new data lands in new time slices) through
``index_ingest_stream`` once per mode, and reports per-version shard
counts / bytes plus a row-count equality check of the two assembled
indexes. One JSON line per mode + one for the equality check.

Usage: python tools/measure_manifest.py [N_ROWS]
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from sigmod_2024_contest_spark.functions import quantization as Q
    from sigmod_2024_contest_spark.operators import engine, routing
    from sigmod_2024_contest_spark.session import get_spark, ship_package
    from sigmod_2024_contest_spark.streaming import vector as V
    from tools.stress_scale import synth_base

    spark = get_spark("manifest-measure")
    ship_package(spark)
    base = synth_base(spark, n_rows, 64).persist()
    base.count()
    alpha = Q.train_alpha(base)
    splan = engine._shard_plan(base, routing.CAT_GRAPH_THR, engine.MAX_NODES_PER_GRAPH)

    work = tempfile.mkdtemp(prefix="sg_manifest_measure_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    for i, (lo, hi) in enumerate(((0.0, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.01))):
        cdir = os.path.join(work, f"c{i}")
        base.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).coalesce(2).write.mode(
            "overwrite"
        ).parquet(cdir)
        for j, p in enumerate(glob.glob(cdir + "/*.parquet")):
            shutil.copy(p, os.path.join(src, f"part-{i}-{j}.parquet"))
        time.sleep(1.1)  # distinct mtimes -> deterministic pickup order

    idx_dirs = {}
    for mode, inc, epoch in (
        ("epoch", True, True),
        ("incremental", True, False),
        ("full", False, False),
    ):
        idx_dir = os.path.join(work, f"idx_{mode}")
        os.makedirs(idx_dir)
        idx_dirs[mode] = idx_dir
        t0 = time.time()
        q = V.index_ingest_stream(
            V.stream_base(spark, src, files_per_trigger=2),
            idx_dir, splan, alpha, incremental=inc, epoch_sharding=epoch,
        )
        q.processAllAvailable()
        q.stop()
        wall = round(time.time() - t0, 1)
        sizes = {}
        for d in sorted(os.listdir(idx_dir)):
            if d.startswith("v"):
                sub = os.path.join(idx_dir, d, "shards") if inc else os.path.join(idx_dir, d)
                nshards = len([x for x in os.listdir(sub) if x.startswith("pkey=")])
                sizes[d] = {"mb": round(du(os.path.join(idx_dir, d)) / 1e6, 1), "shards": nshards}
        print(json.dumps({"mode": mode, "wall_s": wall, "versions": sizes,
                          "total_mb": round(du(idx_dir) / 1e6, 1)}), flush=True)

    na = V.load_latest_index(spark, idx_dirs["incremental"]).count()
    nb = V.load_latest_index(spark, idx_dirs["full"]).count()
    ne = V.load_latest_index(spark, idx_dirs["epoch"]).count()
    # epoch routing changes shard MEMBERSHIP (append-only vs id-hash)
    # but never the row multiset: each base row lands in each of its
    # slices exactly once in every mode
    print(json.dumps({"rows_incremental": na, "rows_full": nb, "rows_epoch": ne,
                      "equal_counts": na == nb == ne}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
