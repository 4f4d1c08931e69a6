"""Route-plan EXPLAIN surface: the rendered decisions must agree with
the routing ladder and the shard-plan metadata the engine executes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sigmod_2024_contest_spark.operators import engine, routing
from sigmod_2024_contest_spark.plans import workload
from sigmod_2024_contest_spark.plans.explain import (
    _slice_counts,
    explain_routes,
    render_route_report,
)
from sigmod_2024_contest_spark.sources.tables import base_vectors

from conftest import SF_SMOKE


def test_explain_one_row_per_query_and_route_parity(spark):
    """Every workload query appears exactly once, with the SAME route
    the ladder assigns (explain composes route_plan, it must not
    re-derive it)."""
    base = base_vectors(spark, SF_SMOKE)
    queries = workload.queries_df(spark, SF_SMOKE)
    want = {
        r["query_id"]: r["route"]
        for r in routing.route_plan(base, queries).collect()
    }
    got = {r["query_id"]: r["route"] for r in explain_routes(spark, SF_SMOKE).collect()}
    assert got == want


def test_explain_fanout_matches_shard_metadata(spark):
    """bf → zero shards; cat_graph → exactly that category's shard
    count; graph ef floors at k (never 0 on a routed query)."""
    base = base_vectors(spark, SF_SMOKE)
    counts = _slice_counts(base, routing.CAT_GRAPH_THR)
    queries = {
        r["query_id"]: r
        for r in workload.queries_df(spark, SF_SMOKE)
        .select("query_id", "v")
        .collect()
    }
    for r in explain_routes(spark, SF_SMOKE).collect():
        if r["route"] == routing.ROUTE_BF:
            assert r["n_shards"] == 0 and r["ef_max"] == 0
            assert r["est_candidates"] >= 0
        else:
            assert r["n_shards"] >= 1
            assert r["ef_min"] >= workload.K
            if r["route"] == routing.ROUTE_CAT_GRAPH:
                prefix = f"cat:{int(queries[r['query_id']]['v'])}"
                want = math.ceil(counts[prefix] / engine.MAX_NODES_PER_GRAPH)
                assert r["n_shards"] == want


def test_explain_fanout_matches_engine_assignments(spark):
    """The strongest tie: for every graph-routed query, the explain
    table's n_shards must equal the number of (query, pkey) pairs the
    ENGINE's assignment join actually produces against the analytic
    shard catalog — same slice math, same empty-slice drops."""
    base = base_vectors(spark, SF_SMOKE)
    queries = workload.queries_df(spark, SF_SMOKE)
    plan = routing.route_plan(base, queries)
    counts = _slice_counts(base, routing.CAT_GRAPH_THR)
    splan = {p: math.ceil(c / engine.MAX_NODES_PER_GRAPH) for p, c in counts.items()}
    catalog = engine.catalog_from_plan(spark, splan)
    actual = {
        r["query_id"]: r["n"]
        for r in engine._assignments(queries, plan, catalog)
        .groupBy("query_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in explain_routes(spark, SF_SMOKE).collect():
        assert r["n_shards"] == actual.get(r["query_id"], 0), (
            r["query_id"],
            r["route"],
            r["n_shards"],
            actual.get(r["query_id"], 0),
        )


def test_render_route_report_sections(spark):
    rep = render_route_report(spark, SF_SMOKE)
    assert "ROUTE PLAN" in rep and "SHARD CATALOG" in rep
    # every route that appears in the plan shows up in the table
    for route in {r["route"] for r in explain_routes(spark, SF_SMOKE).collect()}:
        assert route in rep
