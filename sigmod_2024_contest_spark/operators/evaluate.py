"""Evaluation operators: recall@k (A7) and per-type workload stats (A8/S10).

Reference: ``GetKNNRecall`` (``/root/reference/utils.h:224-253``) —
per-query intersection count vs ground truth, averaged — and the
per-type time/count rollups of ``getquery.cpp:61-114`` /
``ReadStats`` (``utils.h:572-625``).

Spark-first: recall is a join on (query_id, id) + groupBy — never an
array collect on the driver. All ratios are integer ppm so oracle
comparisons hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(result: DataFrame, truth: DataFrame) -> DataFrame:
    """(query_id, n_truth, n_hit, recall_ppm): per-query recall of
    ``result`` against ``truth`` (both (query_id, id, ...) row sets).
    Mean recall = avg over this output; the per-query rows are kept so
    failures localize (the reference dumps recall1.bin for the same
    reason, utils.h:250-251)."""
    t = truth.select("query_id", "id")
    r = result.select("query_id", "id", F.lit(1).alias("hit"))
    # single left join + one groupBy: each input plan (often itself an
    # expensive kNN job) is evaluated exactly once — the two-aggregate
    # formulation would recompute `truth` per aggregate
    return (
        t.join(r, ["query_id", "id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_truth"),
            F.count("hit").cast("long").alias("n_hit"),
        )
        .withColumn(
            "recall_ppm",
            F.expr("n_hit * 1000000 DIV n_truth").cast("long"),
        )
    )


def recall_sql(result_sql: str, truth_sql: str) -> str:
    """DuckDB mirror of recall_at_k over two query bodies."""
    return f"""
WITH res AS ({result_sql}),
tru AS ({truth_sql}),
hits AS (
  SELECT t.query_id, count(*) AS n_hit
  FROM tru t JOIN res r ON r.query_id = t.query_id AND r.id = t.id
  GROUP BY t.query_id
),
per_q AS (SELECT query_id, count(*) AS n_truth FROM tru GROUP BY query_id)
SELECT p.query_id,
       p.n_truth::BIGINT AS n_truth,
       COALESCE(h.n_hit, 0)::BIGINT AS n_hit,
       (COALESCE(h.n_hit, 0) * 1000000 // p.n_truth)::BIGINT AS recall_ppm
FROM per_q p LEFT JOIN hits h ON h.query_id = p.query_id
"""


def recall_gate(result: DataFrame, truth: DataFrame, bar_ppm: int) -> DataFrame:
    """(n_queries, bar_ppm, recall_ge_bar): single-row quality gate for
    ANN paths whose candidate generation is not SQL-expressible (graph
    search, trained IVF). The oracle can't reproduce the ANN result,
    but it CAN predict this row when quality holds: n_queries is the
    distinct-query count of the *exact* side (which hash-matches
    DuckDB) and recall_ge_bar must be true. Mean recall dropping below
    the bar flips the boolean → driver hash mismatch → red row. This
    turns a rows-only blind spot into a value-checked gate."""
    rec = recall_at_k(result, truth)
    return rec.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.lit(int(bar_ppm)).cast("long").alias("bar_ppm"),
        (F.floor(F.avg("recall_ppm")) >= F.lit(int(bar_ppm))).alias("recall_ge_bar"),
    )


def recall_gate_sql(truth_sql: str, bar_ppm: int) -> str:
    """DuckDB mirror of :func:`recall_gate`'s expected-green row."""
    return f"""
SELECT count(DISTINCT query_id)::BIGINT AS n_queries,
       {int(bar_ppm)}::BIGINT AS bar_ppm,
       TRUE AS recall_ge_bar
FROM ({truth_sql})
"""


def workload_stats(selectivity: DataFrame) -> DataFrame:
    """(query_type, n_queries, sel_sum, avg_sel_ppm): the per-type
    rollup over the selectivity table (A8). avg is computed over
    per-query integer ppm values, so both engines agree bit-for-bit."""
    per_q = selectivity.withColumn(
        "sel_ppm", F.expr("sel_num * 1000000 DIV n_total")
    )
    return per_q.groupBy("query_type").agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("sel_num").cast("long").alias("sel_sum"),
        F.floor(F.avg("sel_ppm")).cast("long").alias("avg_sel_ppm"),
    )


def workload_stats_sql(selectivity_sql: str) -> str:
    return f"""
WITH sel AS ({selectivity_sql}),
per_q AS (SELECT *, sel_num * 1000000 // n_total AS sel_ppm FROM sel)
SELECT query_type,
       count(*)::BIGINT AS n_queries,
       sum(sel_num)::BIGINT AS sel_sum,
       CAST(floor(avg(sel_ppm)) AS BIGINT) AS avg_sel_ppm
FROM per_q GROUP BY query_type
"""
