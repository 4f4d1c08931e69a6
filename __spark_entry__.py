"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``sigmod_2024_contest_spark``; this module is
a thin adapter over its query registry (``api.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sigmod_2024_contest_spark import api
from sigmod_2024_contest_spark.session import tune_for_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact filtered kNN (all 4 reference query types) via
    the distributed partial-top-k plan on sf0.001."""
    tune_for_session(spark)
    return api.queries()["knn_bruteforce"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return api.queries()


def oracle_sql() -> dict[str, str]:
    return api.oracle_sql()
