"""Corpus statistics & selectivity estimation.

Reference: category histogram during scan (``utils.h:377-384``),
max/min category size (``utils.h:387-395``), and per-query selectivity
by binary search over sorted replicas (``hybrid_graph.cpp:176-200``).

Spark-first: the sorted-replica binary search becomes arithmetic over
small pre-aggregated stats tables. ``(category, ts) → count`` has at
most |categories|×|distinct ts| rows — tiny next to the corpus — so a
selectivity lookup is a broadcast join against stats, never a scan of
the base table. At 100 TB the stats table is the only thing that
moves; it is the same trick as the reference's (start,count) partition
maps, expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans import workload
from ..sources.tables import TS_SQL


def category_counts(base: DataFrame) -> DataFrame:
    """A1: per-category histogram + fraction of corpus."""
    total = base.count()
    return base.groupBy("category").agg(F.count("*").alias("cnt")).select(
        "category",
        "cnt",
        (F.col("cnt").cast("double") / F.lit(float(total))).alias("frac"),
    )


CATEGORY_COUNTS_SQL = f"""
WITH b AS (SELECT label AS category FROM embeddings),
     t AS (SELECT count(*)::DOUBLE AS total FROM b)
SELECT category, count(*) AS cnt, count(*)::DOUBLE / (SELECT total FROM t) AS frac
FROM b GROUP BY category
"""


def cat_ts_counts(base: DataFrame) -> DataFrame:
    """The stats table selectivity arithmetic runs against:
    (category, ts) → count. Bounded by |cats|×|distinct ts|."""
    return base.groupBy("category", "ts").agg(F.count("*").alias("cnt"))


def selectivity(base: DataFrame, queries: DataFrame) -> DataFrame:
    """A3: exact per-query selectivity via broadcast join of queries
    against the stats table (not the corpus).

    Returns (query_id, query_type, sel_num, n_total) with sel_num the
    number of predicate-satisfying rows — integers only, so the oracle
    hash-matches without float care.
    """
    total = base.count()
    stats = cat_ts_counts(base).alias("b")
    q = F.broadcast(queries.alias("q"))
    cond = workload.predicate_expr(stats, q)
    joined = q.join(stats, cond, "left")
    return joined.groupBy("q.query_id", "q.query_type").agg(
        F.coalesce(F.sum("b.cnt"), F.lit(0)).alias("sel_num")
    ).select(
        F.col("query_id"),
        F.col("query_type"),
        F.col("sel_num").cast("long").alias("sel_num"),
        F.lit(total).cast("long").alias("n_total"),
    )


def selectivity_sql() -> str:
    return f"""
WITH b AS (
  SELECT label AS category, {TS_SQL} AS ts, count(*) AS cnt
  FROM embeddings GROUP BY 1, 2
),
q AS ({workload.queries_cte_sql()}),
t AS (SELECT count(*) AS total FROM embeddings)
SELECT q.query_id, q.query_type,
       COALESCE(SUM(b.cnt), 0)::BIGINT AS sel_num,
       (SELECT total FROM t)::BIGINT AS n_total
FROM q LEFT JOIN b ON {workload.PREDICATE_SQL}
GROUP BY q.query_id, q.query_type
"""
