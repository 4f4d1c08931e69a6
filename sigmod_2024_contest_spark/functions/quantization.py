"""SQ8 symmetric scalar quantization.

Reference: ``/root/reference/sq8_sym_quant.hpp:15-115`` — train a
single global scale α = max |x| over every vector element (an
aggregation), encode float → int8 as ``round(127·x/α)``, and compute
symmetric distances in integer arithmetic
(``distance.hpp:329-366``: ``Σ(ca−cb)²`` over int).

Spark-first: training is ``F.max(F.array_max(F.transform(vec, abs)))``
— one JVM-side agg over the corpus, no data movement beyond the scalar.
Encoding is a higher-order ``transform`` (whole column stays JVM-side).
Rounding is pinned to ``floor(x + 0.5)`` (identical semantics in Spark,
DuckDB and NumPy — C++ ``round`` half-away-from-zero differs from
banker's rounding, so we standardize explicitly).

Integer code distances are **order-independent** (int addition is
associative), so the quantized candidate-generation phase is exactly
reproducible by the SQL oracle — unlike float sums, no fold-order
care needed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def train_alpha(base: DataFrame, vec_col: str = "vec") -> float:
    """Global α = max |x| over all vector elements (sq8_sym_quant.hpp:37-42)."""
    row = base.select(
        F.max(F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))).alias("alpha")
    ).collect()[0]
    return float(row.alpha)


ALPHA_SQL = "SELECT max(list_max(list_transform(embedding, x -> abs(x::DOUBLE)))) AS alpha FROM embeddings"


def encode_expr(vec: Column | str, alpha: float) -> Column:
    """float vec → int codes in [−127, 127]: floor(127·clamp(x/α,−1,1)+0.5).

    Emitted as ARRAY<INT> (not tinyint) so downstream integer products
    can't overflow and the oracle's type matches trivially.
    """
    vec = F.col(vec) if isinstance(vec, str) else vec

    def enc(x):
        scaled = x.cast("double") / F.lit(float(alpha))
        clamped = F.least(F.greatest(scaled, F.lit(-1.0)), F.lit(1.0))
        return F.floor(clamped * F.lit(127.0) + F.lit(0.5)).cast("int")

    return F.transform(vec, enc)


def encode_sql(vec_sql: str, alpha_sql: str = "alpha.alpha") -> str:
    """The identical encode as DuckDB SQL (lambda over the list).

    ``alpha_sql`` must be a plain column reference (DuckDB rejects
    subqueries inside lambdas) — cross-join the 1-row ``alpha`` CTE
    into the FROM clause.
    """
    return (
        f"list_transform({vec_sql}, x -> CAST(floor("
        f"least(greatest(x::DOUBLE / {alpha_sql}, -1.0), 1.0) * 127.0 + 0.5) AS INTEGER))"
    )


def code_l2_sqr_expr(a: Column | str, b: Column | str) -> Column:
    """Symmetric int distance Σ(ca−cb)² (distance.hpp:329-366), exact."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(a, b, lambda x, y: (x.cast("long") - y.cast("long")) * (x.cast("long") - y.cast("long")))
    return F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, v: acc + v)


CODE_L2_SQL = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> ({a}[i]::BIGINT - {b}[i]::BIGINT) * ({a}[i]::BIGINT - {b}[i]::BIGINT)))"
)


# ---------------------------------------------------------------------------
# SQ8 asymmetric (per-dimension min/max) — reference sq8_quant.hpp:14-99
# ---------------------------------------------------------------------------


def train_minmax(base: DataFrame, vec_col: str = "vec") -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus (sq8_quant.hpp:30-42).

    posexplode + groupBy(dim): min/max partial-aggregate map-side, so
    only |dims| rows per partition reach the shuffle — scalable to any
    corpus size. Only the 2×d stats vector reaches the driver."""
    stats = (
        base.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min(F.col("x").cast("double")).alias("mn"), F.max(F.col("x").cast("double")).alias("mx"))
        .orderBy("pos")
        .collect()
    )
    return [r["mn"] for r in stats], [r["mx"] for r in stats]


def encode_asym_expr(vec: Column | str, mins: list[float], maxs: list[float]) -> Column:
    """float vec → uint8-range codes: floor(255·(x−mnᵢ)/(mxᵢ−mnᵢ)+0.5),
    clamped to [0,1] pre-scale; degenerate dims (mx==mn) encode 0."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    mns = F.array(*[F.lit(float(v)) for v in mins])
    mxs = F.array(*[F.lit(float(v)) for v in maxs])

    def enc(x, i):
        mn = F.element_at(mns, i + 1)
        mx = F.element_at(mxs, i + 1)
        frac = F.least(F.greatest((x.cast("double") - mn) / (mx - mn), F.lit(0.0)), F.lit(1.0))
        return F.when(mx > mn, F.floor(frac * F.lit(255.0) + F.lit(0.5))).otherwise(F.lit(0)).cast("int")

    return F.transform(vec, enc)


def encode_asym_sql(table: str = "embeddings", vec_sql: str = "embedding") -> str:
    """Self-contained DuckDB mirror: computes the identical per-dim
    stats in a CTE (min/max are exact, so both engines agree) and
    applies the identical encode."""
    return f"""
WITH e AS (
  SELECT unnest({vec_sql}) AS x, generate_subscripts({vec_sql}, 1) AS i FROM {table}
),
stats AS (SELECT i, min(x::DOUBLE) AS mn, max(x::DOUBLE) AS mx FROM e GROUP BY i),
mm AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM stats)
SELECT vec_id,
       list_transform(range(1, len({vec_sql}) + 1),
         j -> CASE WHEN mxs[j] > mns[j]
                   THEN CAST(floor(least(greatest(({vec_sql}[j]::DOUBLE - mns[j]) / (mxs[j] - mns[j]), 0.0), 1.0) * 255.0 + 0.5) AS INTEGER)
                   ELSE 0 END) AS codes
FROM {table}, mm
"""


# ---------------------------------------------------------------------------
# SQ4 (global min/max, 4-bit packed) — reference sq4_quant.hpp:15-108
# ---------------------------------------------------------------------------


def train_global_minmax(base: DataFrame, vec_col: str = "vec") -> tuple[float, float]:
    """Global (min, max) over every vector element (sq4_quant.hpp
    trains one scale for the whole corpus)."""
    row = base.select(
        F.min(F.array_min(F.col(vec_col))).cast("double").alias("mn"),
        F.max(F.array_max(F.col(vec_col))).cast("double").alias("mx"),
    ).collect()[0]
    return float(row["mn"]), float(row["mx"])


def encode_sq4_expr(vec: Column | str, mn: float, mx: float) -> Column:
    """float vec → packed 4-bit codes, two per byte (low nibble =
    even dim): byte_j = c₂ⱼ + 16·c₂ⱼ₊₁ with
    c = floor(15·clamp((x−mn)/(mx−mn), 0, 1) + 0.5). Odd dims pad 0."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    scale = float(mx - mn) if mx > mn else 1.0

    def nib(x):
        frac = F.least(F.greatest((x.cast("double") - F.lit(float(mn))) / F.lit(scale), F.lit(0.0)), F.lit(1.0))
        return F.floor(frac * F.lit(15.0) + F.lit(0.5)).cast("int")

    half = F.ceil(F.size(vec) / F.lit(2)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), half - 1),
        lambda j: nib(F.element_at(vec, 2 * j + 1))
        + F.lit(16) * F.coalesce(
            F.when(2 * j + 2 <= F.size(vec), nib(F.element_at(vec, 2 * j + 2))), F.lit(0)
        ),
    )


def encode_sq4_sql(table: str = "embeddings", vec_sql: str = "embedding") -> str:
    nib = (
        "CAST(floor(least(greatest(({v}::DOUBLE - mm.mn) / (CASE WHEN mm.mx > mm.mn THEN mm.mx - mm.mn ELSE 1.0 END), 0.0), 1.0) * 15.0 + 0.5) AS INTEGER)"
    )
    lo = nib.format(v=f"{vec_sql}[2*j + 1]")
    hi = nib.format(v=f"{vec_sql}[2*j + 2]")
    return f"""
WITH mm AS (
  SELECT min(list_min({vec_sql}))::DOUBLE AS mn, max(list_max({vec_sql}))::DOUBLE AS mx
  FROM {table}
)
SELECT vec_id,
       list_transform(range(0, CAST(ceil(len({vec_sql}) / 2.0) AS BIGINT)),
         j -> {lo} + 16 * (CASE WHEN 2*j + 2 <= len({vec_sql}) THEN {hi} ELSE 0 END)) AS codes
FROM {table}, mm
"""


# ---------------------------------------------------------------------------
# Driver-hashable projection of (id, codes) frames
# ---------------------------------------------------------------------------


def codes_digest(df: DataFrame, id_col: str) -> Column | DataFrame:
    """Fold an (id, codes array<int>) frame to hashable scalars:
    (id, n_codes, codes_sum, codes_md5). The grading driver's
    canonicalizer sorts all columns with pandas and dies on list cells,
    so registry entries emit this projection instead of the raw array;
    the md5 of the comma-joined codes keeps full value sensitivity
    (any single code changing flips the hash), and n_codes/codes_sum
    give human-diagnosable partial signals."""
    return df.select(
        id_col,
        F.size("codes").cast("long").alias("n_codes"),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("codes_sum"),
        F.md5(F.array_join(F.transform("codes", lambda x: x.cast("string")), ",")).alias(
            "codes_md5"
        ),
    )


def codes_digest_sql(inner_sql: str, id_col: str) -> str:
    """DuckDB mirror of :func:`codes_digest` over a query body."""
    return f"""
SELECT {id_col},
       len(codes)::BIGINT AS n_codes,
       COALESCE(list_sum(codes), 0)::BIGINT AS codes_sum,
       md5(array_to_string(codes, ',')) AS codes_md5
FROM ({inner_sql})
"""


# ---------------------------------------------------------------------------
# NumPy variants (Arrow batch path — used inside HNSW build/search)
# ---------------------------------------------------------------------------


def encode_np(vecs: np.ndarray, alpha: float) -> np.ndarray:
    scaled = np.clip(vecs.astype(np.float64) / alpha, -1.0, 1.0)
    return np.floor(scaled * 127.0 + 0.5).astype(np.int16)


def code_l2_sqr_np(q: np.ndarray, b: np.ndarray) -> np.ndarray:
    """All-pairs int code distance: q (nq×d) vs b (nb×d) → int64, exact.

    Computed via float BLAS GEMM, not integer matmul: NumPy has no
    accelerated int64 matmul (it falls to a generic loop, ~50× slower
    than sgemm). Float accumulation of integers is EXACT as long as
    every intermediate stays below the mantissa bound (2²⁴ for
    float32, 2⁵³ for float64); the worst intermediate is ≤ 4·d·m² for
    codes bounded by m, so SQ8 (m=127, d=100 → 6.5e6) rides exact
    float32 sgemm and the asym fixed-point grid (m=65280 → 1.7e12)
    rides exact float64 dgemm. The int64 fallback only exists for
    grids no quantizer here produces."""
    if q.shape[0] == 0 or b.shape[0] == 0:
        return np.zeros((q.shape[0], b.shape[0]), dtype=np.int64)
    d = q.shape[1]
    m = float(max(np.abs(q).max(initial=0), np.abs(b).max(initial=0)))
    bound = 4.0 * d * m * m
    if bound < 2.0**24:
        dt = np.float32
    elif bound < 2.0**52:
        dt = np.float64
    else:
        q64 = q.astype(np.int64, copy=False)
        b64 = b.astype(np.int64, copy=False)
        qq = np.einsum("ij,ij->i", q64, q64)[:, None]
        bb = np.einsum("ij,ij->i", b64, b64)[None, :]
        return qq + bb - 2 * (q64 @ b64.T)
    qf = q.astype(dt, copy=False)  # no-op when the caller pre-casts
    bf = b.astype(dt, copy=False)
    qq = np.einsum("ij,ij->i", qf, qf)[:, None]
    bb = np.einsum("ij,ij->i", bf, bf)[None, :]
    out = qq + bb - 2.0 * (qf @ bf.T)
    return np.rint(out).astype(np.int64)
