"""The reference's raw little-endian .bin wire format — scan + sink.

Reference layouts (all little-endian, ``uint32 N`` header):
- base:    N rows of (label f32, timestamp f32, vec f32[dim])
  (``/root/reference/utils.h:257-276`` ReadBase; row stride at :272-274)
- queries: N rows of (query_type f32, v f32, l f32, r f32, vec f32[dim])
  (``/root/reference/utils.h:550-566`` ReadQuery)
- knn/gt:  N rows of k uint32 ids, no per-row header
  (``/root/reference/io.h:22-33`` SaveKNN; ``utils.h:168-221``)

Spark mapping (SURVEY §2.1 S1/S2/S4/S6/S7): a directory of .bin shards
is read with ``spark.read.format("binaryFile")`` and decoded shard-wise
in ``mapInPandas`` (Arrow-batched NumPy ``frombuffer`` — no Python row
loop). Row ids are ``file_seq * (1<<40) + position`` so ids stay stable
and unique across shards; for the single-file contest layout that
degenerates to plain position, matching the reference. The writers are
NumPy (driver- or test-side): the format itself has a global row count
in the header, so a .bin file is inherently a single-writer artifact —
at scale you write many shard files, which the readers accept.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SHARD_STRIDE = 1 << 40


# ---------------------------------------------------------------------------
# Writers (NumPy, one file = one shard)
# ---------------------------------------------------------------------------


def write_base_bin(path: str, labels: np.ndarray, ts: np.ndarray, vecs: np.ndarray) -> None:
    n, dim = vecs.shape
    rows = np.empty((n, dim + 2), dtype="<f4")
    rows[:, 0] = labels
    rows[:, 1] = ts
    rows[:, 2:] = vecs
    with open(path, "wb") as f:
        f.write(struct.pack("<I", n))
        f.write(rows.tobytes())


def write_queries_bin(
    path: str,
    qtype: np.ndarray,
    v: np.ndarray,
    l: np.ndarray,
    r: np.ndarray,
    vecs: np.ndarray,
) -> None:
    n, dim = vecs.shape
    rows = np.empty((n, dim + 4), dtype="<f4")
    rows[:, 0] = qtype
    rows[:, 1] = v
    rows[:, 2] = l
    rows[:, 3] = r
    rows[:, 4:] = vecs
    with open(path, "wb") as f:
        f.write(struct.pack("<I", n))
        f.write(rows.tobytes())


def write_knn_bin(result: DataFrame, path: str, k: int) -> None:
    """S6 sink: (query_id, id, rnk) rows → Nq×k uint32 matrix, rows in
    query_id order, columns in rnk order. Streams via toLocalIterator —
    the output format is a single dense file, so this sink is the one
    deliberately driver-side piece (the contest's exchange format, not
    a scale path; at scale keep results as Parquet)."""
    it = result.orderBy("query_id", "rnk").toLocalIterator()
    buf: list[list[int]] = []
    cur_q = None
    row: list[int] = []
    for rec in it:
        if rec["query_id"] != cur_q:
            if cur_q is not None:
                buf.append(row)
            cur_q = rec["query_id"]
            row = []
        row.append(rec["id"])
    if cur_q is not None:
        buf.append(row)
    mat = np.full((len(buf), k), np.iinfo(np.uint32).max, dtype="<u4")
    for i, r_ in enumerate(buf):
        mat[i, : min(len(r_), k)] = r_[:k]
    with open(path, "wb") as f:
        f.write(mat.tobytes())


# ---------------------------------------------------------------------------
# Distributed readers (binaryFile + mapInPandas shard decode)
# ---------------------------------------------------------------------------


def _decode_shards(batches, row_floats: int, emit, seq_of_path: dict[str, int]):
    for pdf in batches:
        for _, rec in pdf.iterrows():
            raw = bytes(rec["content"])
            (n,) = struct.unpack_from("<I", raw, 0)
            rows = np.frombuffer(raw, dtype="<f4", offset=4, count=n * row_floats)
            rows = rows.reshape(n, row_floats)
            # shard sequence assigned from the sorted file listing on
            # the driver — batch-local enumeration would collide ids
            # when Spark delivers files in separate Arrow batches
            name = rec["path"].rsplit("/", 1)[-1]
            base_id = seq_of_path[name] * SHARD_STRIDE if len(seq_of_path) > 1 else 0
            yield emit(rows, base_id)


# 8k rows ≈ 3 MB per task: small enough that the per-row emit cost
# (NumPy→Arrow list column) spreads across all cores, and under the
# Arrow maxRecordsPerBatch so each range is exactly one batch
ROWS_PER_TASK = 1 << 13


def _read_bin_df(
    spark: SparkSession,
    path: str,
    row_floats: int,
    emit,
    schema: str,
    rows_per_task: int = ROWS_PER_TASK,
) -> DataFrame:
    """Shared scan body. A directory of shard files parallelizes per
    file (binaryFile); a SINGLE file — the contest layout, one header +
    dense rows — is split into row ranges on the driver (only the
    4-byte header is read there) and each task seeks into its disjoint
    slice. Without the split, one 10M-row data.bin would decode in one
    task — the classic unsplittable-format bottleneck. Requires the
    path to be visible from executors (local FS here; on a cluster the
    same seek-read pattern runs against a shared/remote FS)."""
    import os

    if os.path.isdir(path):
        seq_of_path = {name: i for i, name in enumerate(sorted(os.listdir(path)))}
        files = spark.read.format("binaryFile").load(path).select("path", "content")
        return files.mapInPandas(
            lambda it: _decode_shards(it, row_floats, emit, seq_of_path), schema
        )

    with open(path, "rb") as f:
        (n,) = struct.unpack("<I", f.read(4))
    row_bytes = 4 * row_floats
    ranges = [(s, min(rows_per_task, n - s)) for s in range(0, n, rows_per_task)] or [(0, 0)]
    rdf = spark.createDataFrame(ranges, "start long, cnt long").repartition(len(ranges))

    def decode(batches):
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                if rec.cnt <= 0:
                    continue
                with open(path, "rb") as f:
                    f.seek(4 + rec.start * row_bytes)
                    raw = f.read(rec.cnt * row_bytes)
                rows = np.frombuffer(raw, dtype="<f4").reshape(-1, row_floats)
                yield emit(rows, int(rec.start))

    return rdf.mapInPandas(decode, schema)


def read_base_bin(spark: SparkSession, path: str, dim: int = 100) -> DataFrame:
    """S2: .bin base scan → (id, category, ts, vec)."""

    def emit(rows: np.ndarray, base_id: int) -> pd.DataFrame:
        n = rows.shape[0]
        return pd.DataFrame(
            {
                "id": np.arange(n, dtype=np.int64) + base_id,
                "category": rows[:, 0].astype(np.int32),
                "ts": rows[:, 1].astype(np.float64),
                "vec": list(rows[:, 2:].astype(np.float32)),
            }
        )

    return _read_bin_df(
        spark, path, dim + 2, emit, "id long, category int, ts double, vec array<float>"
    )


def read_queries_bin(spark: SparkSession, path: str, dim: int = 100) -> DataFrame:
    """S4: .bin query scan → (query_id, query_type, v, l, r, qvec)."""

    def emit(rows: np.ndarray, base_id: int) -> pd.DataFrame:
        n = rows.shape[0]
        return pd.DataFrame(
            {
                "query_id": np.arange(n, dtype=np.int64) + base_id,
                "query_type": rows[:, 0].astype(np.int32),
                "v": rows[:, 1].astype(np.int32),
                "l": rows[:, 2].astype(np.float64),
                "r": rows[:, 3].astype(np.float64),
                "qvec": list(rows[:, 4:].astype(np.float32)),
            }
        )

    return _read_bin_df(
        spark,
        path,
        dim + 4,
        emit,
        "query_id long, query_type int, v int, l double, r double, qvec array<float>",
    )


def read_knn_bin(spark: SparkSession, path: str, k: int) -> DataFrame:
    """S7: Nq×k uint32 matrix → (query_id, knn array<long>)."""
    import os

    seq_of_path = (
        {name: i for i, name in enumerate(sorted(os.listdir(path)))}
        if os.path.isdir(path)
        else {}
    )
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def gen(batches):
        for pdf in batches:
            for _, rec in pdf.iterrows():
                raw = bytes(rec["content"])
                mat = np.frombuffer(raw, dtype="<u4").reshape(-1, k)
                name = rec["path"].rsplit("/", 1)[-1]
                base_id = seq_of_path[name] * SHARD_STRIDE if len(seq_of_path) > 1 else 0
                yield pd.DataFrame(
                    {
                        "query_id": np.arange(mat.shape[0], dtype=np.int64) + base_id,
                        "knn": list(mat.astype(np.int64)),
                    }
                )

    return files.mapInPandas(gen, "query_id long, knn array<long>")
