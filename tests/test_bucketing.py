"""Bucketed layout: the write-once / join-shuffle-free contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sigmod_2024_contest_spark.sources import bucketing
from sigmod_2024_contest_spark.sources.tables import load_table

from conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge planning so the test exercises the bucketed
    join path (tiny test tables would otherwise broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    """Both sides bucketed by the join key with the SAME bucket count:
    the executed join plan must contain no Exchange (the write-time
    shuffle replaces every query-time shuffle), and the result must
    equal the plain join."""
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    try:
        bucketing.write_bucketed(li, "t_li_b", "l_orderkey", 4)
        bucketing.write_bucketed(od, "t_od_b", "o_orderkey", 4)
        j = bucketing.bucketed_join(spark, "t_li_b", "t_od_b", "l_orderkey", "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:800]
        assert "Exchange" not in plan, plan[:800]
        # the layout must not change the answer
        expect = li.join(od, li["l_orderkey"] == od["o_orderkey"]).count()
        assert j.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_od_b")


def test_mismatched_bucket_counts_reshuffle(spark, no_broadcast):
    """Different bucket counts break co-location: Spark must insert an
    Exchange for (at least) one side — the negative control that the
    zero-Exchange assertion above is really the bucketing at work."""
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    try:
        bucketing.write_bucketed(li, "t_li_m", "l_orderkey", 4)
        bucketing.write_bucketed(od, "t_od_m", "o_orderkey", 3)
        j = bucketing.bucketed_join(spark, "t_li_m", "t_od_m", "l_orderkey", "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan, plan[:800]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_m")
        spark.sql("DROP TABLE IF EXISTS t_od_m")


def test_bucketed_agg_skips_shuffle(spark):
    """A groupBy on the bucket key over a bucketed table must also
    plan without an Exchange — bucketing feeds any key-aligned
    operator, not just joins."""
    od = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    try:
        bucketing.write_bucketed(od, "t_od_a", "o_orderkey", 4)
        agg = (
            spark.table("t_od_a")
            .groupBy("o_orderkey")
            .agg(F.sum("o_totalprice").alias("s"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_od_a")
