"""Parquet table loaders for the driver's synthetic tables
(TESTDATA.md) and the vector-search view over them.

The reference's base table is ``(id, category, timestamp, vec[d])``
(``/root/reference/utils.h:257-276``). The driver's ``embeddings``
table carries ``(vec_id, embedding, label)``; we derive the missing
normalized timestamp deterministically so every reference query type
(category / time-range predicates, ``searcher.hpp:29-43``) is
exercisable: ``ts = (vec_id % 1000) / 1000.0``. The same formula is
used verbatim in the DuckDB oracle SQL, so Spark and oracle agree by
construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Shared ts-derivation (Spark expr and DuckDB SQL must stay in lockstep).
TS_SQL = "(CAST(vec_id % 1000 AS DOUBLE) / 1000.0)"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has shipped with two physical ts encodings:
        # INT64 TIMESTAMP(NANOS) (older testdata — Spark's reader
        # rejects it unless nanos are surfaced as long) and native
        # timestamp[us] (current testdata — already a timestamp
        # column). Branch on the *loaded* dtype: only an INT64-nanos
        # column needs the truncating nanos→micros conversion
        # (integer division — float division loses precision at 1e18;
        # DuckDB's micro-precision TIMESTAMP truncates identically).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_dtype = dict(df.dtypes)["ts"]
        if ts_dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_dtype == "timestamp_ntz":
            # Downstream operators (unix_micros, time windows, as-of
            # joins) expect TIMESTAMP; with the session timezone pinned
            # to UTC (session.py) this cast is instant-preserving and
            # renders identically to DuckDB's naive micro timestamps.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def base_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector corpus as the reference's base-table shape:
    (id LONG, category INT, ts DOUBLE, vec ARRAY<FLOAT>)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").alias("id"),
        F.col("label").alias("category"),
        F.expr(TS_SQL).alias("ts"),
        F.col("embedding").alias("vec"),
    )
