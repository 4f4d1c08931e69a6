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


def cat_ts_counts(base: DataFrame, ts_bins: int | None = None) -> DataFrame:
    """The stats table selectivity arithmetic runs against:
    (category, ts) → count.

    With ``ts_bins`` the timestamp is quantized to the left edge of its
    bin — the Spark replacement for the reference's sorted-replica
    binary search (hybrid_graph.cpp:176-200): the stats table is then
    bounded by |cats|×ts_bins rows no matter the corpus size. Without
    it the table is exact but grows with |distinct ts| — fine for
    discrete timestamps, corpus-sized for continuous ones."""
    ts = F.col("ts")
    if ts_bins is not None:
        ts = F.floor(ts * ts_bins) / float(ts_bins)
    return base.groupBy("category", ts.alias("ts")).agg(F.count("*").alias("cnt"))


def corpus_stats(base: DataFrame, ts_bins: int | None = None) -> tuple[DataFrame, int]:
    """Build-phase stats handle: the cached (category, ts) histogram
    and the corpus total — the relational twin of the reference's
    sorted metadata replicas (SortDataset, hybrid_graph.cpp:505-524),
    built once alongside the index and reused by every routing pass."""
    cat_ts = cat_ts_counts(base, ts_bins).cache()
    total = cat_ts.agg(F.sum("cnt")).collect()[0][0] or 0
    return cat_ts, int(total)


def selectivity(
    base: DataFrame,
    queries: DataFrame,
    ts_bins: int | None = None,
    stats: tuple[DataFrame, int] | None = None,
) -> DataFrame:
    """A3: per-query selectivity via per-type broadcast joins of
    queries against small histograms (never the corpus).

    Physical plan — one branch per query type, unioned:
    type 0 → no join (sel = N); type 1 → equi-join on the category
    histogram (|cats| rows); type 2 → range join on the ts histogram
    (≤ ts_bins distinct ts); type 3 → equi-join on category (hash
    join) + range residual on the (category, ts) table. A single
    OR-of-all-types theta join would force a nested-loop over the full
    stats table for every query — the per-type split keeps each join's
    build side minimal and lets Spark use hash joins wherever there is
    an equality key.

    Returns (query_id, query_type, sel_num, n_total); integers only,
    so the oracle hash-matches without float care. ``ts_bins`` makes
    sel approximate within one bin's mass (routing thresholds don't
    care) while keeping the table bounded at scale.
    """
    # one corpus scan total: the (category, ts) table is cached (it is
    # tiny — ≤ |cats|×bins rows) and every other stat derives from it,
    # including N. Without this, each histogram branch AND the count
    # would re-evaluate the base lineage — ruinous when base is an
    # expensive source (.bin decode) rather than a parquet scan.
    # ``stats`` (from corpus_stats) supplies both precomputed — the
    # build-once path.
    if stats is None:
        stats = corpus_stats(base, ts_bins)
    cat_ts, total = stats
    ts_hist = cat_ts.groupBy("ts").agg(F.sum("cnt").alias("cnt"))
    cat_hist = cat_ts.groupBy("category").agg(F.sum("cnt").alias("cnt"))

    q = queries.select("query_id", "query_type", "v", "l", "r")
    q0 = q.filter(F.col("query_type") == 0).select(
        "query_id", "query_type", F.lit(total).alias("sel_num")
    )
    q1 = (
        q.filter(F.col("query_type") == 1)
        .join(F.broadcast(cat_hist), F.col("v") == cat_hist["category"], "left")
        .groupBy("query_id", "query_type")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("sel_num"))
    )
    q2 = (
        q.filter(F.col("query_type") == 2)
        .join(F.broadcast(ts_hist), ts_hist["ts"].between(F.col("l"), F.col("r")), "left")
        .groupBy("query_id", "query_type")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("sel_num"))
    )
    q3 = (
        q.filter(F.col("query_type") == 3)
        .join(
            F.broadcast(cat_ts),
            (F.col("v") == cat_ts["category"]) & cat_ts["ts"].between(F.col("l"), F.col("r")),
            "left",
        )
        .groupBy("query_id", "query_type")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("sel_num"))
    )
    return (
        q0.unionByName(q1)
        .unionByName(q2)
        .unionByName(q3)
        .select(
            "query_id",
            "query_type",
            F.col("sel_num").cast("long").alias("sel_num"),
            F.lit(total).cast("long").alias("n_total"),
        )
    )


def selectivity_sql(ts_bins: int | None = None) -> str:
    ts = TS_SQL
    if ts_bins is not None:
        ts = f"(floor({TS_SQL} * {ts_bins}) / {float(ts_bins)})"
    return f"""
WITH b AS (
  SELECT label AS category, {ts} AS ts, count(*) AS cnt
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
