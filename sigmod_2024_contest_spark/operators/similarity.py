"""Similarity search over embedding columns: brute-force cosine top-k
(the exact baseline) and a hyperplane-LSH bucketed variant (the scale
path).

Beyond the reference's own L2 workload (SURVEY §7.5) but the same
shape: candidate generation must never touch the O(n²) pair space.
The LSH variant mirrors the reference's category partitioning — hash
buckets play the role of category slices, and search happens only
inside the query's bucket.

Hyperplane components are generated from a portable LCG formula (not
engine RNG), so bucket assignment — and therefore the whole result —
is bit-identical in Spark and the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.workload import QUERY_STRIDE

TOPK = 10
DIM = 64
MOD = 2147483647

# Bucket count scales with the corpus (fixed 256 buckets would make
# bucket size — and each cogroup task — grow linearly with corpus
# size). Planes = smallest p in [N_PLANES_MIN, N_PLANES_MAX] with
# rows <= TARGET_ROWS_PER_BUCKET·2^p, found by pure integer compares so
# the SQL oracle derives the IDENTICAL count from count(*) with no
# float log anywhere. Multi-probe compute fraction stays ~(p+1)/2^p of
# brute force — shrinking as the corpus grows, the true LSH scaling.
N_PLANES_MIN, N_PLANES_MAX = 4, 20
TARGET_ROWS_PER_BUCKET = 32


def n_planes_for(n_rows: int) -> int:
    p = N_PLANES_MIN
    while p < N_PLANES_MAX and n_rows > (TARGET_ROWS_PER_BUCKET << p):
        p += 1
    return p


def n_planes_cte(table: str = "embeddings") -> str:
    """One-row CTE body (alias it ``lshnp``) deriving the plane count
    from count(*) — integer comparisons only, bit-identical across
    engines. Cross-join it wherever ``_bucket_sql`` appears."""
    whens = " ".join(
        f"WHEN cnt <= {TARGET_ROWS_PER_BUCKET << p} THEN {p}"
        for p in range(N_PLANES_MIN, N_PLANES_MAX)
    )
    return (
        f"SELECT CASE {whens} ELSE {N_PLANES_MAX} END AS n "
        f"FROM (SELECT count(*) AS cnt FROM {table})"
    )


def n_planes_for_pairs(n_rows: int) -> int:
    """Plane count for PAIR-generating blocking (the dedup candidate
    self-join): its volume is quadratic in probe-bucket occupancy —
    ≈ n²(p+1)²/2^(p+1) pairs — so sizing to rows/bucket alone (as
    :func:`n_planes_for` does for the query→bucket ANN join, whose
    cost is linear in occupancy) leaves pairs growing linearly with
    the corpus. Pick the smallest p with n·(p+1)² ≤ T·2^(p+1), i.e.
    ~T/2 candidate pairs per row regardless of corpus size. Integer
    compares only — the SQL oracle derives the identical count."""
    p = N_PLANES_MIN
    while p < N_PLANES_MAX and n_rows * (p + 1) * (p + 1) > (
        TARGET_ROWS_PER_BUCKET << (p + 1)
    ):
        p += 1
    return p


def n_planes_pairs_cte(table: str = "embeddings") -> str:
    """SQL twin of :func:`n_planes_for_pairs` (alias it ``lshnp``)."""
    whens = " ".join(
        f"WHEN cnt * {(p + 1) * (p + 1)} <= {TARGET_ROWS_PER_BUCKET << (p + 1)} THEN {p}"
        for p in range(N_PLANES_MIN, N_PLANES_MAX)
    )
    return (
        f"SELECT CASE {whens} ELSE {N_PLANES_MAX} END AS n "
        f"FROM (SELECT count(*) AS cnt FROM {table})"
    )


def _plane(j: int, dim: int = DIM) -> list[float]:
    """Deterministic pseudo-random hyperplane (portable LCG)."""
    return [
        ((1103515245 * (j * dim + i) + 12345) % MOD) / MOD - 0.5 for i in range(dim)
    ]


def ann_cosine_topk(emb: DataFrame, k: int = TOPK) -> DataFrame:
    """(query_id, id, rnk): exact top-k by cosine for the derived query
    set (every QUERY_STRIDE-th vector), self excluded. The brute-force
    baseline every ANN variant is measured against.

    Physical plan = the same partial/final top-k split as
    knn.knn_exact_arrow: queries broadcast as a NumPy matrix (in
    bounded batches — driver never holds the full query table), one
    GEMM per Arrow batch of the corpus, per-partition top-k, then a
    window merges candidates (shuffle is nq×k×P rows — corpus never
    moves). ~10× the throughput of the per-pair Catalyst fold this
    replaces."""
    import numpy as np
    import pyarrow as pa

    from .knn import chunked_broadcast_scan, list_column_matrix

    spark = emb.sparkSession

    def payload(qrows):
        qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
        qv = np.array([r["embedding"] for r in qrows], dtype=np.float64)
        qn = np.sqrt(np.einsum("ij,ij->i", qv, qv))
        return qids, qv, qn

    schema = pa.schema(
        [pa.field("query_id", pa.int64()), pa.field("id", pa.int64()), pa.field("cos", pa.float64())]
    )

    def make_kernel(bc):
        return lambda batches: partial(bc, batches)

    def partial(bc, batches):
        qids_, qv_, qn_ = bc.value
        chunk = max(1, (1 << 22) // max(len(qids_), 1))  # ≈32 MB sim blocks
        for batch in batches:
            ids_all = batch.column("vec_id").to_numpy(zero_copy_only=False)
            V_all = list_column_matrix(batch, "embedding")
            for s in range(0, V_all.shape[0], chunk):
                V = V_all[s : s + chunk]
                ids = ids_all[s : s + chunk]
                vn = np.sqrt(np.einsum("ij,ij->i", V, V))
                sims = (qv_ @ V.T) / (qn_[:, None] * vn[None, :])
                sims[qids_[:, None] == ids[None, :]] = -np.inf  # self
                kk = min(k, sims.shape[1])
                part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                rows_q, rows_id, rows_c = [], [], []
                for i in range(sims.shape[0]):
                    sel = part[i][np.isfinite(sims[i, part[i]])]
                    rows_q.append(np.full(sel.shape[0], qids_[i], dtype=np.int64))
                    rows_id.append(ids[sel].astype(np.int64))
                    rows_c.append(sims[i, sel])
                if rows_q:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(np.concatenate(rows_q)),
                            pa.array(np.concatenate(rows_id)),
                            pa.array(np.concatenate(rows_c)),
                        ],
                        schema=schema,
                    )

    cands = chunked_broadcast_scan(
        emb.select("vec_id", "embedding"),
        emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select("vec_id", "embedding"),
        payload,
        make_kernel,
        "query_id long, id long, cos double",
    )
    if cands is None:
        return spark.createDataFrame([], "query_id long, id long, rnk long")
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("id").asc())
    return (
        cands.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "id", F.col("rnk").cast("long").alias("rnk"))
    )


_COS = (
    "list_sum(list_transform(range(1, len(b.embedding) + 1), "
    "k -> q.qvec[k]::DOUBLE * b.embedding[k]::DOUBLE)) / "
    "(sqrt(list_sum(list_transform(range(1, len(q.qvec) + 1), "
    "k -> q.qvec[k]::DOUBLE * q.qvec[k]::DOUBLE))) * "
    "sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1), "
    "k -> b.embedding[k]::DOUBLE * b.embedding[k]::DOUBLE))))"
)


def ann_cosine_topk_sql(k: int = TOPK) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
  WHERE vec_id % {QUERY_STRIDE} = 0
),
scored AS (
  SELECT q.query_id, b.vec_id AS id, {_COS} AS cos
  FROM embeddings b, q WHERE q.query_id != b.vec_id
)
SELECT query_id, id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rnk
  FROM scored
) WHERE rnk <= {k}
"""


def _bucket_expr(vec_col: str, n_planes: int) -> F.Column:
    """LSH bucket id: bit j = sign(vec · plane_j), folded left-to-right
    in float64 (portable)."""
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        plane = F.array([F.lit(x) for x in _plane(j)])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return bucket


def _bucket_sql(vec_sql: str) -> str:
    """SQL mirror with the plane count read at runtime from the
    cross-joined one-row ``lshnp`` CTE (:func:`n_planes_cte`): all
    N_PLANES_MAX bits are computed, bits at j >= lshnp.n mask to 0 —
    structurally static SQL, data-derived bucket count."""
    terms = []
    for j in range(N_PLANES_MAX):
        lits = ", ".join(repr(x) for x in _plane(j))
        dot = (
            f"list_sum(list_transform(range(1, len({vec_sql}) + 1), "
            f"k -> {vec_sql}[k]::DOUBLE * ([{lits}])[k]::DOUBLE))"
        )
        terms.append(f"(CASE WHEN {j} < lshnp.n AND {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::BIGINT"


def ann_lsh_topk(emb: DataFrame, k: int = TOPK) -> DataFrame:
    """(query_id, id, rnk): top-k by cosine over the query's
    *multi-probe* LSH candidate set — the home bucket plus every bucket
    at Hamming distance 1 (flip one hyperplane bit). Multi-probe buys
    ~4× the single-probe recall for 9× the (still tiny) candidate set;
    buckets partition the corpus, so probes never produce duplicate
    candidates.

    Physical plan = bucket cogroup: the corpus shuffles ONCE on its
    bucket id, queries (exploded to their 9 probes) cogroup in, and
    each task runs one GEMM of (queries probing this bucket ×
    bucket rows) — total compute is the true LSH fraction
    (≈9/2^planes of brute force) and no (qvec, vec) pair row is ever
    materialized. At 100 TB the bucket id becomes the physical
    partition key (the reference's category_map trick). Recall vs the
    exact baseline is the quality metric (tests)."""
    import numpy as np
    import pandas as pd

    from .knn import list_column_matrix  # noqa: F401  (shared helper)

    planes = n_planes_for(emb.count())
    wb = emb.select("vec_id", "embedding", _bucket_expr("embedding", planes).alias("bucket"))
    probes = F.array(
        F.col("qbucket"),
        *[F.col("qbucket").bitwiseXOR(F.lit(1 << j)) for j in range(planes)],
    )
    qp = (
        wb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
            F.col("bucket").alias("qbucket"),
        )
        .select("query_id", "qvec", F.explode(probes).alias("probe"))
    )

    def per_bucket(b_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "id": [], "cos": []}).astype(
            {"query_id": "int64", "id": "int64", "cos": "float64"}
        )
        if b_pdf.empty or q_pdf.empty:
            return empty
        ids = b_pdf["vec_id"].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in b_pdf["embedding"]])
        qids = q_pdf["query_id"].to_numpy()
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in q_pdf["qvec"]])
        vn = np.sqrt(np.einsum("ij,ij->i", V, V))
        qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
        sims = (Q @ V.T) / (qn[:, None] * vn[None, :])
        sims[qids[:, None] == ids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows_q, rows_id, rows_c = [], [], []
        for i in range(sims.shape[0]):
            sel = part[i][np.isfinite(sims[i, part[i]])]
            rows_q.append(np.full(sel.shape[0], qids[i], dtype=np.int64))
            rows_id.append(ids[sel].astype(np.int64))
            rows_c.append(sims[i, sel])
        if not rows_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(rows_q),
                "id": np.concatenate(rows_id),
                "cos": np.concatenate(rows_c),
            }
        )

    scored = (
        wb.groupby("bucket")
        .cogroup(qp.groupby("probe"))
        .applyInPandas(per_bucket, "query_id long, id long, cos double")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "id", F.col("rnk").cast("long").alias("rnk"))
    )


N_LIST = 64  # IVF cells
N_PROBE = 16  # cells scanned per query (compute fraction = 16/64 = 0.25)
# Local-training bound (rows): below this the embedding set rides one
# bounded collect (≈ rows·dim·8 B — 32 MB at dim 64) and all Lloyd
# iterations run driver-side in one pass, instead of iters+2 Spark
# jobs whose wall is pure scheduler constants at small n (the same
# cost route as nndescent.NND_LOCAL_ROWS / dedup_clusters' driver CC).
IVF_LOCAL_ROWS = 65_536


def ivf_train(
    emb: DataFrame, nlist: int = N_LIST, iters: int = 4,
    local_rows: int | None = IVF_LOCAL_ROWS,
):
    """Deterministic distributed k-means (the IVF coarse quantizer).

    Init = every (n/nlist)-th vector by id rank (seedless, stable).
    Each Lloyd iteration is ONE job: mapInArrow assigns a batch to its
    nearest centroid via GEMM and emits per-partition partial sums
    (nlist rows per partition — not the corpus), which the driver
    reduces into new centroids. Only the (nlist × dim) centroid table
    ever reaches the driver; the corpus never moves.

    Below ``local_rows`` the same Lloyd updates run driver-side over
    one bounded collect (0/None forces distributed). Both paths use
    the same init and the same assignment/update formulas; centroid
    floats can differ at ulp level because the local sum folds in one
    order and the distributed one reduces per-partition partials —
    every consumer is recall-gated, not centroid-bit-gated, and the
    forced-distributed twin is pinned approximately equal in tests."""
    import numpy as np
    import pyarrow as pa

    from .knn import list_column_matrix

    spark = emb.sparkSession
    n = emb.count()
    if local_rows and n <= local_rows:
        return _ivf_train_local(emb, nlist, iters)
    stride = max(n // nlist, 1)
    init = (
        emb.filter((F.col("vec_id") % stride == 0) & (F.col("vec_id") / stride < nlist))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    cents = np.array([r["embedding"] for r in init], dtype=np.float64)[:nlist]
    nlist = cents.shape[0]  # sparse/non-dense ids can under-fill the init

    partial_schema = "cluster long, cnt long, vsum array<double>"

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents)

        def partials(batches):
            c = bc.value
            cc = np.einsum("ij,ij->i", c, c)
            for batch in batches:
                V = list_column_matrix(batch, "embedding")
                d = cc[:, None] - 2.0 * (c @ V.T)  # ||c||² - 2c·v (v² constant per column)
                assign = np.argmin(d, axis=0)
                sums = np.zeros((c.shape[0], V.shape[1]))
                np.add.at(sums, assign, V)
                cnts = np.bincount(assign, minlength=c.shape[0])
                nz = np.flatnonzero(cnts)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(nz.astype(np.int64)),
                        pa.array(cnts[nz].astype(np.int64)),
                        pa.array(list(sums[nz])),
                    ],
                    names=["cluster", "cnt", "vsum"],
                )

        rows = emb.select("embedding").mapInArrow(partials, partial_schema).collect()
        cnts = np.zeros(nlist)
        sums = np.zeros_like(cents)
        for r in rows:
            cnts[r["cluster"]] += r["cnt"]
            sums[r["cluster"]] += np.asarray(r["vsum"])
        nz = cnts > 0
        cents[nz] = sums[nz] / cnts[nz, None]
    return cents


def _ivf_train_local(emb: DataFrame, nlist: int, iters: int):
    """Driver-side Lloyd twin for sub-``IVF_LOCAL_ROWS`` embedding
    sets: one bounded collect, then the same init rule and
    assignment/update arithmetic as the distributed loop."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    n = len(rows)
    stride = max(n // nlist, 1)
    init = [
        r["embedding"]
        for r in rows
        if r["vec_id"] % stride == 0 and r["vec_id"] / stride < nlist
    ]
    cents = np.array(init, dtype=np.float64)[:nlist]
    nlist = cents.shape[0]
    if nlist == 0 or n == 0:
        return cents
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    for _ in range(iters):
        cc = np.einsum("ij,ij->i", cents, cents)
        assign = np.argmin(cc[:, None] - 2.0 * (cents @ V.T), axis=0)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, V)
        cnts = np.bincount(assign, minlength=nlist).astype(np.float64)
        nz = cnts > 0
        cents[nz] = sums[nz] / cnts[nz, None]
    return cents


def ann_ivf_topk(
    emb: DataFrame, k: int = TOPK, nlist: int = N_LIST, nprobe: int = N_PROBE
) -> DataFrame:
    """(query_id, id, rnk): IVF ANN — each query scans ONLY its
    ``nprobe`` nearest k-means cells.

    Physical plan = cell cogroup (the same shape as
    :func:`ann_lsh_topk`'s bucket cogroup): the corpus gets a ``cell``
    column (one Arrow pass: argmin distance to the broadcast centroid
    table) and shuffles ONCE on it; queries explode to their nprobe
    probe cells and cogroup in; each task GEMMs (queries probing this
    cell × cell rows). Per-query compute fraction is genuinely
    nprobe/nlist — vectors outside probed cells are never scored (the
    earlier formulation scored the whole corpus and masked, i.e. a full
    scan in IVF clothing). At 100 TB ``cell`` is the physical partition
    key — cluster-then-prune, the reference's category_map structure.
    Iterative float training ⇒ no SQL oracle; quality is driver-gated
    via ``recall_ivf_vs_exact`` (mean recall vs the exact baseline)."""
    spark = emb.sparkSession
    cents = ivf_train(emb, nlist)
    nprobe = min(nprobe, cents.shape[0])
    bc = spark.sparkContext.broadcast(cents)

    @F.pandas_udf("long")
    def cell_of(embs: pd.Series) -> pd.Series:
        c = bc.value
        cc = np.einsum("ij,ij->i", c, c)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
        # ||c||² − 2c·v: argmin over cells (||v||² constant per row)
        return pd.Series(np.argmin(cc[:, None] - 2.0 * (c @ V.T), axis=0).astype(np.int64))

    @F.pandas_udf("array<long>")
    def probes_of(embs: pd.Series) -> pd.Series:
        c = bc.value
        cn = np.sqrt(np.einsum("ij,ij->i", c, c))
        cn[cn == 0] = 1.0
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
        qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
        qn[qn == 0] = 1.0
        qc = (Q @ c.T) / (qn[:, None] * cn[None, :])
        top = np.argsort(-qc, axis=1)[:, :nprobe]
        return pd.Series(list(top.astype(np.int64)))

    wc = emb.select("vec_id", "embedding", cell_of("embedding").alias("cell"))
    qp = (
        emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
            F.explode(probes_of("embedding")).alias("probe"),
        )
    )

    def per_cell(b_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "id": [], "cos": []}).astype(
            {"query_id": "int64", "id": "int64", "cos": "float64"}
        )
        if b_pdf.empty or q_pdf.empty:
            return empty
        ids = b_pdf["vec_id"].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in b_pdf["embedding"]])
        qids = q_pdf["query_id"].to_numpy()
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in q_pdf["qvec"]])
        vn = np.sqrt(np.einsum("ij,ij->i", V, V))
        qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
        sims = (Q @ V.T) / (qn[:, None] * vn[None, :])
        sims[qids[:, None] == ids[None, :]] = -np.inf  # self
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows_q, rows_id, rows_c = [], [], []
        for i in range(sims.shape[0]):
            sel = part[i][np.isfinite(sims[i, part[i]])]
            rows_q.append(np.full(sel.shape[0], qids[i], dtype=np.int64))
            rows_id.append(ids[sel].astype(np.int64))
            rows_c.append(sims[i, sel])
        if not rows_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(rows_q),
                "id": np.concatenate(rows_id),
                "cos": np.concatenate(rows_c),
            }
        )

    scored = (
        wc.groupby("cell")
        .cogroup(qp.groupby("probe"))
        .applyInPandas(per_cell, "query_id long, id long, cos double")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "id", F.col("rnk").cast("long").alias("rnk"))
    )


def ann_lsh_topk_sql(k: int = TOPK) -> str:
    bexpr = _bucket_sql("embedding")
    probe_list = (
        "[qbucket] || list_transform(range(0, (SELECT n FROM lshnp)), "
        "j -> xor(qbucket, (2**j)::BIGINT))"
    )
    return f"""
WITH lshnp AS ({n_planes_cte()}),
wb AS (SELECT vec_id, embedding, {bexpr} AS bucket FROM embeddings, lshnp),
q0 AS (
  SELECT vec_id AS query_id, embedding AS qvec, bucket AS qbucket FROM wb
  WHERE vec_id % {QUERY_STRIDE} = 0
),
q AS (SELECT query_id, qvec, unnest({probe_list}) AS probe FROM q0),
scored AS (
  SELECT q.query_id, b.vec_id AS id, {_COS} AS cos
  FROM wb b JOIN q ON q.probe = b.bucket AND q.query_id != b.vec_id
)
SELECT query_id, id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rnk
  FROM scored
) WHERE rnk <= {k}
"""


# ---------------------------------------------------------------------------
# Random projection — JL dimension reduction for embedding columns
# ---------------------------------------------------------------------------

EMBED_PROJECT_DIM = 8  # output dims; real deployments size ~O(log n / eps^2)


def embed_project(
    emb: DataFrame, out_dim: int = EMBED_PROJECT_DIM, method: str = "arrow"
) -> DataFrame:
    """(vec_id, proj…): Johnson-Lindenstrauss random projection of the
    embedding column onto ``out_dim`` deterministic hyperplanes (the
    same portable-LCG planes the LSH family uses, so projected space
    and bucket space are consistent) — the standard dimension-reduction
    step before ANN indexing / clustering on a training corpus.

    Two kernels, one semantics:

    - ``method='arrow'`` (default, the 100 TB path): one mapInArrow
      GEMM per batch — vectorized, zero shuffles, returns
      ``proj array<double>``.
    - ``method='fold'`` (the oracle twin): per-plane Catalyst
      zip_with/aggregate folds emitting ``proj_ppm array<bigint>``
      (floor(dot·1e6) — integer ppm per repo convention, so the DuckDB
      hash never compares raw floats). The GEMM path is pinned ≈ the
      fold path in tests (they differ only in float summation order).
    """
    planes = [_plane(j) for j in range(int(out_dim))]
    if method == "fold":
        dots = []
        for p in planes:
            lit = F.array([F.lit(x) for x in p])
            dot = F.aggregate(
                F.zip_with(F.col("embedding"), lit, lambda x, v: x.cast("double") * v),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            dots.append(F.floor(dot * 1e6).cast("long"))
        return emb.select("vec_id", F.array(*dots).alias("proj_ppm"))

    import numpy as np
    import pyarrow as pa

    from .knn import list_column_matrix

    P = np.array(planes, dtype=np.float64)  # (out_dim, dim)

    def kernel(batches):
        for batch in batches:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            V = list_column_matrix(batch, "embedding")
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(list(V @ P.T))],
                names=["vec_id", "proj"],
            )

    return emb.select("vec_id", "embedding").mapInArrow(
        kernel, "vec_id long, proj array<double>"
    )


def embed_project_sql(out_dim: int = EMBED_PROJECT_DIM) -> str:
    """DuckDB twin of the ``method='fold'`` kernel."""
    dots = []
    for j in range(int(out_dim)):
        lits = ", ".join(repr(x) for x in _plane(j))
        dots.append(
            "floor(list_sum(list_transform(range(1, len(embedding) + 1), "
            f"k -> embedding[k]::DOUBLE * ([{lits}])[k]::DOUBLE)) * 1e6)::BIGINT"
        )
    return f"SELECT vec_id, [{', '.join(dots)}] AS proj_ppm FROM embeddings"


def embed_project_rows(
    emb: DataFrame, out_dim: int = EMBED_PROJECT_DIM, method: str = "fold"
) -> DataFrame:
    """Driver-hashable twin of :func:`embed_project`: one scalar row per
    ``(vec_id, component)`` instead of an array column, because the
    correctness harness canonicalizes by pandas-sorting every result
    column and an ``array<bigint>`` column is unsortable/unhashable
    there. Same values, exploded shape: ``(vec_id, component, ppm)``.
    """
    proj = embed_project(emb, out_dim, method=method)
    return proj.select(
        "vec_id", F.posexplode("proj_ppm").alias("component", "ppm")
    ).select("vec_id", F.col("component").cast("long").alias("component"), "ppm")


def embed_project_rows_sql(out_dim: int = EMBED_PROJECT_DIM) -> str:
    """DuckDB twin of :func:`embed_project_rows` — same per-plane fold,
    one row per component via a constant component table (DuckDB's
    ``unnest`` has no WITH ORDINALITY in the dialect the harness pins,
    so index explicitly; component is 0-based to match posexplode)."""
    dots = []
    for j in range(int(out_dim)):
        lits = ", ".join(repr(x) for x in _plane(j))
        dots.append(
            "floor(list_sum(list_transform(range(1, len(embedding) + 1), "
            f"k -> embedding[k]::DOUBLE * ([{lits}])[k]::DOUBLE)) * 1e6)::BIGINT"
        )
    return f"""
WITH proj AS (SELECT vec_id, [{', '.join(dots)}] AS proj_ppm FROM embeddings),
comp AS (SELECT unnest(range(0, {int(out_dim)})) AS component)
SELECT p.vec_id, CAST(c.component AS BIGINT) AS component,
       p.proj_ppm[c.component + 1] AS ppm
FROM proj p CROSS JOIN comp c
"""
