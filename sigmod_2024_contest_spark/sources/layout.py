"""Sorted-replica layout prep (S3) + index persistence (S8/S9).

Reference: ``ReadSortedBaseTimestamp`` (``/root/reference/
utils.h:352-479``) materializes three sorted replicas of the base table
plus (start,count) partition maps. The Spark-native equivalent is a
one-time prep job that writes the corpus as *partitioned, sorted
Parquet*: Hive partition directories replace the manual maps (partition
pruning does the (start,count) lookup), and ``sortWithinPartitions``
gives Parquet row-group min/max skipping inside each directory — the
same binary-search property, but distributed and spill-safe.

Index persistence mirrors ``Graph::save/load`` (``graph.hpp:101-137``)
and ``HierarchicalNSW::saveIndex/loadIndex`` (``hnswalg.h:821-946``):
our graph is already a DataFrame (SURVEY S8 mapping: one row per node
with neighbor arrays), so save/load are plain Parquet round-trips
partitioned by the graph key — loading one partition's graph touches
exactly one directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def decile_expr() -> F.Column:
    return F.least(F.floor(F.col("ts") * 10).cast("int"), F.lit(9))


def write_replicas(base: DataFrame, out_dir: str) -> None:
    """S3: write the two clustered replicas.

    - ``by_category/category=<v>/`` sorted by ts within each category
      (serves type-1/3 — reference replica 1, utils.h:403-414)
    - ``by_decile/decile=<d>/`` sorted by ts within each decile
      (serves type-0/2 — reference replica 3, utils.h:429-434)

    ``repartition(pkey)`` puts each partition's rows in one task before
    the write, so every Hive directory holds few, fully-sorted files.
    """
    (
        base.repartition("category")
        .sortWithinPartitions("ts", "id")
        .write.mode("overwrite")
        .partitionBy("category")
        .parquet(os.path.join(out_dir, "by_category"))
    )
    (
        base.withColumn("decile", decile_expr())
        .repartition("decile")
        .sortWithinPartitions("ts", "id")
        .write.mode("overwrite")
        .partitionBy("decile")
        .parquet(os.path.join(out_dir, "by_decile"))
    )


def read_category_slice(spark: SparkSession, out_dir: str, v: int) -> DataFrame:
    """F2 via partition pruning: the filter prunes to one directory
    (verify with .explain → PartitionFilters)."""
    df = spark.read.parquet(os.path.join(out_dir, "by_category"))
    return df.filter(F.col("category") == v)


def read_decile_range(spark: SparkSession, out_dir: str, l: float, r: float) -> DataFrame:
    """F3 via partition pruning + row-group skip: decile directories
    overlapping [l, r] are read, the residual ts filter is pushed to
    Parquet (sorted row groups → min/max skip)."""
    df = spark.read.parquet(os.path.join(out_dir, "by_decile"))
    lo, hi = int(l * 10), min(int(r * 10), 9)
    return df.filter(F.col("decile").between(lo, hi) & F.col("ts").between(l, r))


def save_index(index: DataFrame, path: str) -> None:
    """S8/S9: persist the graph index partitioned by pkey."""
    index.write.mode("overwrite").partitionBy("pkey").parquet(path)


def load_index(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    # partitionBy writes pkey as a partition column at the end; restore
    # the canonical column order of engine.INDEX_SCHEMA
    return df.select(
        "pkey", "pos", "id", "category", "ts", "codes", "nbrs", "nbr_ts", "level", "upper"
    )
