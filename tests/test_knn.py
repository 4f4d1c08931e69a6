"""Exact filtered kNN vs the DuckDB oracle (reference semantics:
utils.h:80-158 brute force, searcher.hpp:29-43 predicates)."""

from __future__ import annotations

from conftest import SF_SMOKE, assert_matches_oracle, duck_con, rows_set

from sigmod_2024_contest_spark.operators import knn
from sigmod_2024_contest_spark.plans import workload
from sigmod_2024_contest_spark.sources.tables import base_vectors


def test_knn_expr_matches_oracle(spark):
    df = knn.knn_exact_expr(base_vectors(spark, SF_SMOKE), workload.queries_df(spark, SF_SMOKE))
    assert_matches_oracle(df, duck_con(SF_SMOKE), knn.knn_oracle_sql())


def test_knn_arrow_matches_expr(spark):
    base = base_vectors(spark, SF_SMOKE)
    q = workload.queries_df(spark, SF_SMOKE)
    expr_rows = rows_set(knn.knn_exact_expr(base, q).collect())
    arrow_rows = rows_set(knn.knn_exact_arrow(spark, base, q).collect())
    assert expr_rows == arrow_rows


def test_all_query_types_present(spark):
    q = workload.queries_df(spark, SF_SMOKE)
    types = {r.query_type for r in q.select("query_type").distinct().collect()}
    assert types == {0, 1, 2, 3}


def test_every_query_answered(spark):
    base = base_vectors(spark, SF_SMOKE)
    q = workload.queries_df(spark, SF_SMOKE)
    res = knn.knn_exact_expr(base, q)
    nq = q.count()
    answered = res.select("query_id").distinct().count()
    assert answered == nq
