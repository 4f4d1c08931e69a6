"""Deterministic hybrid-search query workload over the embeddings table.

The reference consumes a separate query table ``(query_type, v, l, r,
vec)`` (``/root/reference/utils.h:550-566``). The driver's testdata has
no query table, so we derive one deterministically from the corpus
itself: every row with ``vec_id % QUERY_STRIDE == 0`` becomes a query,
and its predicate parameters come from arithmetic on ``vec_id`` —
reproducible in both Spark and the DuckDB oracle with the same
formulas (kept side by side in this module so they cannot drift).

Query-type semantics mirror ``searcher.hpp:29-43``:
  type 0 — no predicate           type 1 — category == v
  type 2 — l <= ts <= r           type 3 — both
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import TS_SQL, load_table

QUERY_STRIDE = 10  # every 10th vector becomes a query
K = 10  # top-k at testdata scale (reference uses k=100 at 10M rows)

# --- the deterministic predicate-parameter formulas -----------------------
# type: round-robin over {0,1,2,3} by query ordinal
_TYPE_SQL = "CAST((vec_id / {stride}) % 4 AS INT)"
# category predicate: the query row's own label (guarantees >=k matches)
_V_SQL = "label"
# range predicate: l in {0.0,0.1,...,0.4} by ordinal, width 0.45
_L_SQL = "(CAST((vec_id / {stride}) % 5 AS DOUBLE) / 10.0)"
_R_SQL = "({l} + 0.45)"


def queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, query_type, v, l, r, qvec) — reference query-table shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    t = _TYPE_SQL.format(stride=QUERY_STRIDE)
    l = _L_SQL.format(stride=QUERY_STRIDE)
    return emb.filter(F.expr(f"vec_id % {QUERY_STRIDE} = 0")).select(
        F.col("vec_id").alias("query_id"),
        F.expr(t).alias("query_type"),
        F.when(F.expr(t).isin(1, 3), F.expr(_V_SQL)).otherwise(F.lit(-1)).alias("v"),
        F.when(F.expr(t).isin(2, 3), F.expr(l)).otherwise(F.lit(-1.0)).alias("l"),
        F.when(F.expr(t).isin(2, 3), F.expr(_R_SQL.format(l=l))).otherwise(F.lit(-1.0)).alias("r"),
        F.col("embedding").alias("qvec"),
    )


def queries_cte_sql() -> str:
    """DuckDB CTE producing the identical query table (for oracles)."""
    t = _TYPE_SQL.format(stride=QUERY_STRIDE)
    l = _L_SQL.format(stride=QUERY_STRIDE)
    r = _R_SQL.format(l=l)
    return f"""
    SELECT vec_id AS query_id,
           {t} AS query_type,
           CASE WHEN {t} IN (1,3) THEN {_V_SQL} ELSE -1 END AS v,
           CASE WHEN {t} IN (2,3) THEN {l} ELSE -1.0 END AS l,
           CASE WHEN {t} IN (2,3) THEN {r} ELSE -1.0 END AS r,
           embedding AS qvec
    FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0
    """


def base_cte_sql() -> str:
    """DuckDB CTE producing the base-vector view (id, category, ts, vec)."""
    return f"SELECT vec_id AS id, label AS category, {TS_SQL} AS ts, embedding AS vec FROM embeddings"


def predicate_expr(base: DataFrame, q: DataFrame):
    """The 4-type predicate as a join condition (Filter functor,
    searcher.hpp:23-44): a base row qualifies for a query iff its
    category/ts pass the query's type-dispatched predicate."""
    t = q["query_type"]
    return (
        (t == 0)
        | ((t == 1) & (base["category"] == q["v"]))
        | ((t == 2) & base["ts"].between(q["l"], q["r"]))
        | ((t == 3) & (base["category"] == q["v"]) & base["ts"].between(q["l"], q["r"]))
    )


PREDICATE_SQL = """(
      q.query_type = 0
   OR (q.query_type = 1 AND b.category = q.v)
   OR (q.query_type = 2 AND b.ts BETWEEN q.l AND q.r)
   OR (q.query_type = 3 AND b.category = q.v AND b.ts BETWEEN q.l AND q.r)
)"""
