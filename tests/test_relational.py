"""Relational surface: star join, TPC-H-style agg, JSON, as-of join."""

from __future__ import annotations

from pyspark.sql import functions as F

from sigmod_2024_contest_spark import api
from sigmod_2024_contest_spark.operators import relational
from sigmod_2024_contest_spark.sources.tables import load_table

from conftest import SF_SMOKE, assert_matches_oracle, duck_con


def _check(spark, name):
    con = duck_con(SF_SMOKE)
    df = api.queries()[name](spark, SF_SMOKE)
    assert_matches_oracle(df, con, api.oracle_sql()[name])


def test_pricing_summary_oracle(spark):
    _check(spark, "pricing_summary")


def test_top_customers_oracle(spark):
    _check(spark, "top_customers")


def test_events_json_stats_oracle(spark):
    _check(spark, "events_json_stats")


def test_asof_last_error_oracle(spark):
    _check(spark, "asof_last_error")


def test_pricing_summary_filter_pushed_to_scan(spark):
    df = relational.pricing_summary(load_table(spark, SF_SMOKE, "lineitem"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:300]


def test_top_customers_broadcasts_dims(spark):
    df = relational.top_customers(
        load_table(spark, SF_SMOKE, "orders"),
        load_table(spark, SF_SMOKE, "customer"),
        load_table(spark, SF_SMOKE, "nation"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2


def test_asof_semantics_manual(spark):
    """Hand-checkable case: the as-of value is the max-ts error <= click ts."""
    ev = load_table(spark, SF_SMOKE, "events")
    res = {r["event_id"]: r["last_error_value_c"]
           for r in relational.asof_last_error(ev).collect()}
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts").collect()
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value").collect()
    by_user = {}
    for e in errors:
        by_user.setdefault(e["user_id"], []).append((e["ts"], e["value"]))
    for c in clicks[:50]:
        cand = [(t, v) for t, v in by_user.get(c["user_id"], []) if t <= c["ts"]]
        want = -1
        if cand:
            want = int(max(cand)[1] * 100 + 0.5)
        assert res[c["event_id"]] == want, (c["event_id"], res[c["event_id"]], want)
