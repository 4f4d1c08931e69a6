"""Sources/sinks (.bin format, partitioned layout, index persistence)
and evaluation operators (recall@k, workload stats)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sigmod_2024_contest_spark import api
from sigmod_2024_contest_spark.operators import engine, evaluate, similarity
from sigmod_2024_contest_spark.sources import bin_format, layout
from sigmod_2024_contest_spark.sources.tables import base_vectors

from conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle, duck_con


def test_base_bin_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(7)
    n, dim = 200, 16
    labels = rng.integers(0, 5, n).astype(np.float32)
    ts = rng.random(n).astype(np.float32)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    p = str(tmp_path / "base.bin")
    bin_format.write_base_bin(p, labels, ts, vecs)

    df = bin_format.read_base_bin(spark, p, dim=dim)
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == n
    assert rows[3]["category"] == int(labels[3])
    np.testing.assert_allclose(rows[7]["vec"], vecs[7], rtol=1e-6)
    np.testing.assert_allclose(rows[7]["ts"], float(ts[7]), rtol=1e-6)


def test_queries_bin_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(8)
    n, dim = 50, 16
    qt = rng.integers(0, 4, n).astype(np.float32)
    v = rng.integers(-1, 5, n).astype(np.float32)
    l = rng.random(n).astype(np.float32)
    r = np.clip(l + 0.3, 0, 1).astype(np.float32)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    p = str(tmp_path / "queries.bin")
    bin_format.write_queries_bin(p, qt, v, l, r, vecs)

    df = bin_format.read_queries_bin(spark, p, dim=dim)
    rows = {r_["query_id"]: r_ for r_ in df.collect()}
    assert len(rows) == n
    assert rows[5]["query_type"] == int(qt[5])
    assert rows[5]["v"] == int(v[5])
    np.testing.assert_allclose(rows[9]["qvec"], vecs[9], rtol=1e-6)


def test_knn_bin_roundtrip(spark, tmp_path):
    res = spark.createDataFrame(
        [(q, q * 100 + r, r + 1) for q in range(4) for r in range(5)],
        "query_id long, id long, rnk long",
    )
    p = str(tmp_path / "knn.bin")
    bin_format.write_knn_bin(res, p, k=5)
    back = bin_format.read_knn_bin(spark, p, k=5).collect()
    got = {r["query_id"]: r["knn"] for r in back}
    assert got[2] == [200, 201, 202, 203, 204]


def test_partitioned_layout_prunes(spark, tmp_path):
    base = base_vectors(spark, SF_SMOKE)
    out = str(tmp_path / "replicas")
    layout.write_replicas(base, out)

    sl = layout.read_category_slice(spark, out, 3)
    expect = base.filter(F.col("category") == 3).count()
    assert sl.count() == expect
    # partition pruning must reach the scan
    plan = sl._jdf.queryExecution().executedPlan().toString()
    assert "category" in plan

    rng_df = layout.read_decile_range(spark, out, 0.2, 0.45)
    expect2 = base.filter(F.col("ts").between(0.2, 0.45)).count()
    assert rng_df.count() == expect2


def test_codes_replica_scan_is_codes_only_and_matches(spark, tmp_path):
    """B10 parity: with a persisted codes replica the bf candidate
    phase scans the codes column only — the replica parquet scan's
    ReadSchema must NOT contain the float vec column — and the result
    is row-identical to the encode-in-kernel path."""
    from sigmod_2024_contest_spark.functions import quantization as Q
    from sigmod_2024_contest_spark.operators import bruteforce_sq8
    from sigmod_2024_contest_spark.plans import workload

    base = base_vectors(spark, SF_SMOKE)
    q = workload.queries_df(spark, SF_SMOKE)
    alpha = Q.train_alpha(base)
    out = str(tmp_path / "replicas")
    layout.write_replicas(base, out, alpha=alpha)
    codes_base = layout.read_codes_base(spark, out)

    # force_scan pins the query-broadcast codes-scan plan (the 100 TB
    # shape this test asserts); without it a smoke-scale corpus flips
    # to the fused corpus-broadcast plan, which has no codes scan
    res = bruteforce_sq8.knn_sq8_rerank(base, q, alpha, codes_base=codes_base, force_scan=True)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the replica scan is the one reading array<tinyint> codes (the
    # Location string is truncated by Spark, so key on ReadSchema);
    # its projection must not include the float vec column
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    replica_scans = [ln for ln in scans if "codes:array<tinyint>" in ln]
    assert replica_scans, plan
    for ln in replica_scans:
        rs = ln.split("ReadSchema:")[-1]
        assert "vec" not in rs, ln

    fast = sorted(map(tuple, res.collect()))
    plain = sorted(map(tuple, bruteforce_sq8.knn_sq8_rerank(base, q, alpha).collect()))
    assert fast == plain


def test_index_save_load_search_identical(spark, tmp_path):
    base = base_vectors(spark, SF_SMOKE)
    from sigmod_2024_contest_spark.plans import workload

    queries = workload.queries_df(spark, SF_SMOKE)
    idx = engine.build_index(base)
    p = str(tmp_path / "index")
    layout.save_index(idx, p)
    idx2 = layout.load_index(spark, p)

    r1 = engine.knn_hybrid(spark, base, queries, index=idx).collect()
    r2 = engine.knn_hybrid(spark, base, queries, index=idx2).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_recall_lsh_vs_exact_oracle(spark):
    con = duck_con(SF_CORRECT)
    df = api.queries()["recall_lsh_vs_exact"](spark, SF_CORRECT)
    assert_matches_oracle(df, con, api.oracle_sql()["recall_lsh_vs_exact"])
    # Quality gate calibrated to the data: testdata embeddings are
    # near-isotropic (all-pairs cos ≈ 0), so absolute recall is
    # data-bounded; multi-probe h≤1 scans ~0.8% of the corpus and must
    # beat the random-candidate baseline by >10×.
    mean = df.agg(F.avg("recall_ppm")).first()[0]
    assert mean > 100_000  # measured 0.154 at sf0.01, deterministic


def test_workload_stats_oracle(spark):
    con = duck_con(SF_CORRECT)
    df = api.queries()["workload_stats"](spark, SF_CORRECT)
    assert_matches_oracle(df, con, api.oracle_sql()["workload_stats"])
    rows = {r["query_type"]: r for r in df.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0]["avg_sel_ppm"] == 1_000_000  # type 0: no predicate


def test_recall_exact_self_is_one(spark):
    emb_exact = similarity.ann_cosine_topk(
        __import__(
            "sigmod_2024_contest_spark.sources.tables", fromlist=["load_table"]
        ).load_table(spark, SF_SMOKE, "embeddings")
    )
    rec = evaluate.recall_at_k(emb_exact, emb_exact)
    assert rec.filter(F.col("recall_ppm") != 1_000_000).count() == 0
