"""Product quantization (PQ): per-subspace k-means codebooks, compact
integer codes, and an ADC (asymmetric distance computation) scan with
exact float re-rank.

Beyond-reference codec: the reference ships the SCALAR quantizers SQ8
(sq8_sym_quant.hpp) and SQ4 (sq4_quant.hpp); PQ — per Jégou, Douze &
Schmid, "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011 (public) — is the vector-codebook sibling every
100 TB vector store runs, so the engine carries it with the same
two-phase contract as the reference's K2/K12 pair: compressed-domain
candidate cut, exact float re-rank.

Scale shape (mirrors bruteforce_sq8 / ann_cosine_topk):
- training is cost-routed like IVF's k-means: a bounded driver-side
  Lloyd twin under ``PQ_LOCAL_ROWS`` and a distributed
  one-Arrow-pass-per-iteration loop above it (all ``m`` subspaces
  accumulate in the SAME pass — the fact table is scanned ``iters``
  times, never ``m × iters``), pinned equal by a forced
  ``local_rows=0`` test;
- the codes table is the compressed replica (n × m small ints — the
  table that still fits when the floats don't); the ADC scan reads
  ONLY it via the chunked query broadcast (O(1) driver memory, the
  corpus never moves), computing per-batch LUT lookups — no GEMM in
  the compressed domain, just ``sum_j LUT[q, j, code_j]``;
- the per-partition partial top-pool means the shuffle is
  nq × pool × P candidate rows; the exact re-rank joins float vectors
  for CANDIDATES ONLY (the K12 pattern) and re-scores with the same
  float64 cosine arithmetic as ann_cosine_topk, so with
  ``pool >= corpus`` the result is bit-identical to the exact oracle
  (the hash-gated registry config — same trick as the IVF entry's
  forced-exhaustive gate), while the approximate config
  (``PQ_POOL``) is recall-gated via ``recall_pq_vs_exact``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.workload import QUERY_STRIDE

PQ_M = 8  # subspaces (dim 64 -> 8 dims each)
PQ_KSUB = 32  # centroids per subspace (5-bit codes)
PQ_ITERS = 5
PQ_LOCAL_ROWS = 65_536
PQ_POOL = 128  # approximate-config re-rank pool (recall 0.954 @ sf0.01)
TOPK = 10


def _value_stride_seeds(ids: np.ndarray, V: np.ndarray, ksub: int) -> np.ndarray:
    """Deterministic init shared by both twins and with IVF's: the rows
    whose vec_id is a multiple of stride = max(n//ksub, 1) with
    vec_id/stride < ksub, ordered by vec_id. Selecting by id VALUE (not
    sorted position) makes the local and forced-distributed twins pick
    identical seed rows on ANY id space — the r7 positional rule
    (V[::stride]) only coincided with the distributed filter when ids
    were contiguous from 0 (r7 advice #3). Sparse/non-dense ids can
    under-fill; the codebook shrinks identically in both twins instead
    of silently diverging."""
    n = V.shape[0]
    stride = max(n // ksub, 1)
    sel = (ids % stride == 0) & (ids // stride < ksub)
    return V[sel][:ksub].astype(np.float64).copy()


def _lloyd(V: np.ndarray, cents: np.ndarray, iters: int) -> np.ndarray:
    if cents.shape[0] == 0 or V.shape[0] == 0:
        return cents
    for _ in range(iters):
        cc = np.einsum("ij,ij->i", cents, cents)
        assign = np.argmin(cc[:, None] - 2.0 * (cents @ V.T), axis=0)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, V)
        cnts = np.bincount(assign, minlength=cents.shape[0]).astype(np.float64)
        nz = cnts > 0
        cents[nz] = sums[nz] / cnts[nz, None]
    return cents


def pq_train(
    emb: DataFrame,
    col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    local_rows: int | None = PQ_LOCAL_ROWS,
) -> np.ndarray:
    """(m, ksub, dsub) codebooks. Under ``local_rows`` the whole
    training set collects once (bounded) and each subspace runs the
    driver Lloyd; above it, one mapInArrow pass per iteration emits
    per-(subspace, centroid) partial sums/counts for ALL subspaces —
    the twins share init and update arithmetic and are pinned equal by
    a forced-distributed test."""
    import pyarrow as pa

    from .knn import list_column_matrix

    spark = emb.sparkSession
    n = emb.count()
    if local_rows and n <= local_rows:
        rows = emb.select("vec_id", col).collect()
        rows.sort(key=lambda r: r["vec_id"])
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        V = np.array([r[col] for r in rows], dtype=np.float64)
        dsub = V.shape[1] // m
        seeds = _value_stride_seeds(ids, V, ksub)
        return np.stack(
            [
                _lloyd(
                    V[:, j * dsub : (j + 1) * dsub],
                    seeds[:, j * dsub : (j + 1) * dsub].copy(),
                    iters,
                )
                for j in range(m)
            ]
        )
    # distributed twin: stride init needs the seed rows only (bounded:
    # ksub rows), then iters passes of all-subspace partials
    stride = max(n // ksub, 1)
    seed = (
        emb.filter((F.col("vec_id") % stride == 0) & (F.col("vec_id") / stride < ksub))
        .orderBy("vec_id")
        .select(col)
        .collect()
    )
    S = np.array([r[col] for r in seed], dtype=np.float64)[:ksub]
    dim = S.shape[1]
    dsub = dim // m
    books = np.stack([S[:, j * dsub : (j + 1) * dsub].copy() for j in range(m)])
    partial_schema = "sub long, cent long, cnt long, vsum array<double>"
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(books)

        def partials(batches):
            B = bc.value
            m_, ksub_, dsub_ = B.shape
            for batch in batches:
                V = list_column_matrix(batch, col)
                for j in range(m_):
                    sub = V[:, j * dsub_ : (j + 1) * dsub_]
                    c = B[j]
                    cc = np.einsum("ij,ij->i", c, c)
                    assign = np.argmin(cc[:, None] - 2.0 * (c @ sub.T), axis=0)
                    sums = np.zeros((ksub_, dsub_))
                    np.add.at(sums, assign, sub)
                    cnts = np.bincount(assign, minlength=ksub_)
                    nz = np.flatnonzero(cnts)
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(np.full(nz.shape[0], j, dtype=np.int64)),
                            pa.array(nz.astype(np.int64)),
                            pa.array(cnts[nz].astype(np.int64)),
                            pa.array(list(sums[nz])),
                        ],
                        names=["sub", "cent", "cnt", "vsum"],
                    )

        rows = emb.select(col).mapInArrow(partials, partial_schema).collect()
        cnts = np.zeros((m, books.shape[1]))
        sums = np.zeros_like(books)
        for r in rows:
            cnts[r["sub"], r["cent"]] += r["cnt"]
            sums[r["sub"], r["cent"]] += np.asarray(r["vsum"])
        nz = cnts > 0
        books[nz] = sums[nz] / cnts[nz][:, None]
    return books


def pq_codes(emb: DataFrame, books: np.ndarray, col: str = "embedding") -> DataFrame:
    """(vec_id, codes array<long>): the compressed replica — m small
    ints per vector (the argmin centroid per subspace), one Arrow
    projection, no shuffle."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(books)

    @F.pandas_udf("array<long>")
    def encode(vs: pd.Series) -> pd.Series:
        B = bc.value
        m_, ksub_, dsub_ = B.shape
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        out = np.empty((V.shape[0], m_), dtype=np.int64)
        for j in range(m_):
            sub = V[:, j * dsub_ : (j + 1) * dsub_]
            c = B[j]
            cc = np.einsum("ij,ij->i", c, c)
            out[:, j] = np.argmin(cc[:, None] - 2.0 * (c @ sub.T), axis=0)
        return pd.Series(list(out))

    return emb.select("vec_id", encode(col).alias("codes"))


def knn_pq_rerank(
    emb: DataFrame,
    k: int = TOPK,
    pool: int | None = None,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
) -> DataFrame:
    """(query_id, id, rnk): PQ two-phase kNN by cosine for the derived
    query set (every QUERY_STRIDE-th vector), self excluded.

    ``pool=None`` re-ranks every corpus vector — the ADC cut keeps
    everything and the exact re-rank fully determines the answer, so
    the result hash-matches the exact-cosine oracle end-to-end
    through the codes pipeline (registry config). A finite ``pool``
    is the production config: the ADC scan cuts to nq × pool
    candidates and ONLY those join back to float vectors (K12), with
    quality pinned by the recall gate."""
    import pyarrow as pa

    from .knn import chunked_broadcast_scan, list_column_matrix

    spark = emb.sparkSession
    n = emb.count()
    eff_pool = n if pool is None else min(pool, n)
    books = pq_train(emb, m=m, ksub=ksub)
    codes = pq_codes(emb, books)

    def payload(qrows):
        qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
        Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
        m_, ksub_, dsub_ = books.shape
        # LUT[q, j, c] = || Q[q] subspace j  -  books[j, c] ||² term:
        # -2 q·c + ||c||²  (||q||² is constant per query — rank-safe)
        luts = np.empty((Q.shape[0], m_, ksub_))
        for j in range(m_):
            sub = Q[:, j * dsub_ : (j + 1) * dsub_]
            c = books[j]
            luts[:, j, :] = np.einsum("ij,ij->i", c, c)[None, :] - 2.0 * (sub @ c.T)
        return qids, luts

    schema = pa.schema(
        [pa.field("query_id", pa.int64()), pa.field("id", pa.int64()), pa.field("adc", pa.float64())]
    )

    def make_kernel(bc):
        def kernel(batches):
            qids_, luts_ = bc.value
            nq = qids_.shape[0]
            for batch in batches:
                ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
                C = list_column_matrix(batch, "codes").astype(np.int64)  # (rows, m)
                # ADC: dist[q, r] = sum_j LUT[q, j, C[r, j]]
                d = np.zeros((nq, C.shape[0]))
                for j in range(luts_.shape[1]):
                    d += luts_[:, j, C[:, j]]
                d[qids_[:, None] == ids[None, :]] = np.inf  # self
                pp = min(eff_pool, d.shape[1])
                part = np.argpartition(d, pp - 1, axis=1)[:, :pp]
                rows_q, rows_id, rows_d = [], [], []
                for i in range(nq):
                    sel = part[i][np.isfinite(d[i, part[i]])]
                    rows_q.append(np.full(sel.shape[0], qids_[i], dtype=np.int64))
                    rows_id.append(ids[sel].astype(np.int64))
                    rows_d.append(d[i, sel])
                if rows_q:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(np.concatenate(rows_q)),
                            pa.array(np.concatenate(rows_id)),
                            pa.array(np.concatenate(rows_d)),
                        ],
                        schema=schema,
                    )

        return kernel

    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select("vec_id", "embedding")
    cands = chunked_broadcast_scan(
        codes, queries, payload, make_kernel, "query_id long, id long, adc double", scan_rows=n
    )
    if cands is None:
        return spark.createDataFrame([], "query_id long, id long, rnk long")
    # pool cut across partitions (adc asc), then candidates-only float join
    wp = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("id").asc())
    pool_df = (
        cands.withColumn("prnk", F.row_number().over(wp))
        .filter(F.col("prnk") <= eff_pool)
        .select("query_id", "id")
    )
    return exact_cosine_rerank(pool_df, emb, k)


def exact_cosine_rerank(pool_df: DataFrame, emb: DataFrame, k: int) -> DataFrame:
    """(query_id, id, rnk): K12 — join float vectors for the CANDIDATE
    set only, re-score with float64 cosine, window top-k. Shared by
    the PQ and IVF-PQ pipelines; candidate volume is nq × pool, so
    both joins are candidate-sized, never corpus-sized.

    Scoring runs as a mapInArrow kernel over the joined batches using
    ``list_column_matrix`` (the repo-wide Arrow convention, r7 verdict
    #3): list<float> columns decode to (n, dim) matrices without
    per-row Python objects, and each batch is one pair of einsum folds.
    """
    import pyarrow as pa

    from .knn import list_column_matrix

    withv = pool_df.join(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("bvec")), "id"
    ).join(
        emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")),
        "query_id",
    )

    out_schema = pa.schema(
        [
            pa.field("query_id", pa.int64()),
            pa.field("id", pa.int64()),
            pa.field("cos", pa.float64()),
        ]
    )

    def score(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            Q = list_column_matrix(batch, "qvec")
            V = list_column_matrix(batch, "bvec")
            qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
            vn = np.sqrt(np.einsum("ij,ij->i", V, V))
            c = np.einsum("ij,ij->i", Q, V) / (qn * vn)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("query_id").cast(pa.int64()),
                    batch.column("id").cast(pa.int64()),
                    pa.array(c),
                ],
                schema=out_schema,
            )

    scored = withv.select("query_id", "id", "qvec", "bvec").mapInArrow(
        score, "query_id long, id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "id", F.col("rnk").cast("long").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells as the partition key, residual-PQ codes as the
# payload — the canonical 100 TB vector-search layout (FAISS IVFPQ per
# Jégou et al. TPAMI'11 §V; public knowledge).
# ---------------------------------------------------------------------------

IVFPQ_NLIST = 16
IVFPQ_NPROBE = 8  # recall 0.796 @ sf0.01 with IVFPQ_POOL (deterministic)
IVFPQ_POOL = 256


def ivfpq_index(
    emb: DataFrame,
    nlist: int = IVFPQ_NLIST,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
):
    """(coarse, books, codes_df): the IVF-PQ index. Coarse k-means
    reuses the IVF trainer (cost-routed, deterministic stride init);
    PQ codebooks train on RESIDUALS (v − coarse[cell]) — the canonical
    composition, residual magnitudes being what the codebooks must
    cover, not absolute positions; the codes table carries
    (vec_id, cell, codes) — at 100 TB ``cell`` is the physical
    partition key and ``codes`` the n × m compressed payload, so a
    probe touches only its cells' partitions and never a float."""
    from .similarity import ivf_train

    spark = emb.sparkSession
    coarse = ivf_train(emb, nlist)
    bc = spark.sparkContext.broadcast(coarse)

    @F.pandas_udf("long")
    def cell_of(vs: pd.Series) -> pd.Series:
        c = bc.value
        cc = np.einsum("ij,ij->i", c, c)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        return pd.Series(np.argmin(cc[:, None] - 2.0 * (c @ V.T), axis=0).astype(np.int64))

    @F.pandas_udf("array<double>")
    def residual_of(vs: pd.Series, cells: pd.Series) -> pd.Series:
        c = bc.value
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        R = V - c[cells.to_numpy()]
        return pd.Series(list(R))

    with_cell = emb.select("vec_id", "embedding", cell_of("embedding").alias("cell"))
    res = with_cell.select(
        "vec_id", "cell", residual_of("embedding", "cell").alias("residual")
    )
    books = pq_train(res, col="residual", m=m, ksub=ksub)
    codes = pq_codes(res, books, col="residual").join(
        with_cell.select("vec_id", "cell"), "vec_id"
    )
    return coarse, books, codes


def knn_ivfpq_rerank(
    emb: DataFrame,
    k: int = TOPK,
    nlist: int = IVFPQ_NLIST,
    nprobe: int = IVFPQ_NPROBE,
    pool: int | None = IVFPQ_POOL,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
) -> DataFrame:
    """(query_id, id, rnk): IVF-PQ kNN by cosine for the derived query
    set, self excluded. Each query probes its ``nprobe`` nearest
    coarse cells and scores ONLY those cells' codes by residual-ADC
    (per-cell LUT: the query residual against that cell's centroid),
    then the global pool re-ranks exactly (K12).

    Physical plan = the cell cogroup of ann_ivf_topk with the codes
    table in place of floats: the corpus shuffles ONCE on cell;
    queries explode to nprobe probe rows and cogroup in; per-task work
    is LUT lookups over that cell's codes. With nprobe = nlist and
    pool = None every vector is scored and exactly re-ranked, so the
    registry config hash-matches the exact-cosine oracle through the
    full cluster-route + residual-codes pipeline (the IVF
    forced-exhaustive trick); the production (nprobe, pool) config is
    recall-gated."""
    spark = emb.sparkSession
    nprobe = min(nprobe, nlist)
    coarse, books, codes = ivfpq_index(emb, nlist=nlist, m=m, ksub=ksub)
    n = emb.count()
    eff_pool = n if pool is None else min(pool, n)
    bc = spark.sparkContext.broadcast((coarse, books))

    @F.pandas_udf("array<long>")
    def probes_of(vs: pd.Series) -> pd.Series:
        c, _ = bc.value
        cc = np.einsum("ij,ij->i", c, c)
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        d = cc[None, :] - 2.0 * (Q @ c.T)  # L2 rank (||q||² constant per row)
        top = np.argsort(d, axis=1)[:, :nprobe]
        return pd.Series(list(top.astype(np.int64)))

    qp = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.explode(probes_of("embedding")).alias("probe"),
    )

    def per_cell(b_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "id": [], "adc": []}).astype(
            {"query_id": "int64", "id": "int64", "adc": "float64"}
        )
        if b_pdf.empty or q_pdf.empty:
            return empty
        c, B = bc.value
        m_, ksub_, dsub_ = B.shape
        cell = int(b_pdf["cell"].iloc[0])
        ids = b_pdf["vec_id"].to_numpy()
        C = np.stack([np.asarray(x, dtype=np.int64) for x in b_pdf["codes"]])
        qids = q_pdf["query_id"].to_numpy()
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in q_pdf["qvec"]])
        R = Q - c[cell][None, :]  # query residual vs THIS cell's centroid
        luts = np.empty((R.shape[0], m_, ksub_))
        for j in range(m_):
            sub = R[:, j * dsub_ : (j + 1) * dsub_]
            cb = B[j]
            luts[:, j, :] = np.einsum("ij,ij->i", cb, cb)[None, :] - 2.0 * (sub @ cb.T)
        d = np.zeros((R.shape[0], C.shape[0]))
        for j in range(m_):
            d += luts[:, j, C[:, j]]
        d[qids[:, None] == ids[None, :]] = np.inf  # self
        pp = min(eff_pool, d.shape[1])
        part = np.argpartition(d, pp - 1, axis=1)[:, :pp]
        rows_q, rows_id, rows_d = [], [], []
        for i in range(d.shape[0]):
            sel = part[i][np.isfinite(d[i, part[i]])]
            rows_q.append(np.full(sel.shape[0], qids[i], dtype=np.int64))
            rows_id.append(ids[sel].astype(np.int64))
            rows_d.append(d[i, sel])
        if not rows_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(rows_q),
                "id": np.concatenate(rows_id),
                "adc": np.concatenate(rows_d),
            }
        )

    cands = (
        codes.groupby("cell")
        .cogroup(qp.groupby("probe"))
        .applyInPandas(per_cell, "query_id long, id long, adc double")
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("id").asc())
    pool_df = (
        cands.withColumn("prnk", F.row_number().over(wp))
        .filter(F.col("prnk") <= eff_pool)
        .select("query_id", "id")
    )
    return exact_cosine_rerank(pool_df, emb, k)
