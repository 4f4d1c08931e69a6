"""Query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``bench.py`` and tests.

Each entry: name → (spark_callable(spark, sf_dir) -> DataFrame,
oracle_sql: str | None). ``oracle_sql`` is ANSI SQL DuckDB runs over
the same parquet views; None marks non-SQL-expressible ops (ANN graph
search, streaming) which get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import knn
from .plans import workload
from .sources.tables import base_vectors

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    _REGISTRY[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# ---------------------------------------------------------------------------
# Core workload: exact filtered kNN (reference utils.h:80-158), two
# physical strategies for the same logical op.
# ---------------------------------------------------------------------------


def _knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn.knn_exact_arrow(spark, base_vectors(spark, sf_dir), workload.queries_df(spark, sf_dir))


def _knn_declarative(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn.knn_exact_expr(base_vectors(spark, sf_dir), workload.queries_df(spark, sf_dir))


register("knn_bruteforce", _knn_bruteforce, knn.knn_oracle_sql())
register("knn_declarative", _knn_declarative, knn.knn_oracle_sql())
