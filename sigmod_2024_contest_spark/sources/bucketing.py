"""Bucketed table layout — shuffle-free co-located joins.

The biggest repeated cost in a fact-fact pipeline (orders ⋈ lineitem
on every query) is re-shuffling both sides on the join key. Bucketing
pays that shuffle ONCE at write time: both tables are written with
`bucketBy(n, key)` into the warehouse, and every later equi-join on
the key is planned as a zero-Exchange sort-merge join — each task
reads bucket i of both sides, which hold exactly the matching key
ranges. At 100 TB this turns the dominant per-query cost into a
one-time layout cost, the same replica-layout idea as the engine's
sorted+codes replicas (sources/layout.py) applied to relational keys.

Rules that make it work (all asserted in tests/test_bucketing.py):
- SAME bucket count on both sides (mismatch re-shuffles the smaller);
- `sortBy` the key so the merge phase needs no per-task sort of the
  larger side (Spark still plans a defensive Sort node; it is cheap
  on sorted input);
- bucket count sized to the TARGET scale: buckets are the ceiling of
  join parallelism for the table's lifetime, so at 100 TB you size
  them like shuffle partitions (data / ~256 MB), not like today's
  file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table on ``key``."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket keys. When both
    were written with the same bucket count, the physical plan contains
    NO Exchange — the join reads co-located buckets directly."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
