"""Distance kernels.

Reference: SIMD L2/IP kernels in ``/root/reference/distance.hpp:165-436``
and ``space_l2.h:30-69``. Here the same math is expressed two ways:

* **Column expressions** (``l2_sqr_expr``, ``cosine_sim_expr``) —
  evaluated JVM-side by Catalyst's higher-order functions. Arithmetic
  is a strict left-to-right fold in float64, which makes the result
  bit-reproducible and lets the DuckDB oracle replicate it exactly
  (``list_sum(list_transform(...))`` folds in the same order).
* **NumPy matrix kernels** (``l2_sqr_matrix``, ``cosine_matrix``) —
  the fast path used inside ``mapInArrow`` operators; one BLAS-backed
  ``Q @ B.T`` per Arrow batch replaces the reference's hand-rolled
  AVX512 loops (``distance.hpp:184-227``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def l2_sqr_expr(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance between two ARRAY<FLOAT/DOUBLE> columns,
    accumulated left-to-right in float64 (matches the scalar reference
    ``L2SqrRef``, distance.hpp:166-172)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def dot_expr(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_sim_expr(a: Column | str, b: Column | str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


# ---------------------------------------------------------------------------
# NumPy kernels (Arrow batch path)
# ---------------------------------------------------------------------------


def l2_sqr_matrix(q: np.ndarray, b: np.ndarray) -> np.ndarray:
    """All-pairs squared L2: q (nq×d) vs b (nb×d) → (nq×nb) float64.

    Uses the ‖q‖²+‖b‖²−2q·b expansion (one GEMM) like the reference's
    batched kernels, but computed in float64 so ranking is stable.
    """
    q = q.astype(np.float64, copy=False)
    b = b.astype(np.float64, copy=False)
    qq = np.einsum("ij,ij->i", q, q)[:, None]
    bb = np.einsum("ij,ij->i", b, b)[None, :]
    d = qq + bb - 2.0 * (q @ b.T)
    np.maximum(d, 0.0, out=d)
    return d


def l2_sqr_exact(q: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact fold-order-stable variant: (nq×nb) with per-element
    (x−y)² summed along the dim axis; slower but bit-matches the
    column-expression path. Used for re-rank and tests."""
    q = q.astype(np.float64, copy=False)
    b = b.astype(np.float64, copy=False)
    out = np.empty((q.shape[0], b.shape[0]), dtype=np.float64)
    for i in range(q.shape[0]):
        diff = b - q[i]
        out[i] = np.einsum("ij,ij->i", diff, diff)
    return out


def cosine_matrix(q: np.ndarray, b: np.ndarray) -> np.ndarray:
    q = q.astype(np.float64, copy=False)
    b = b.astype(np.float64, copy=False)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    return qn @ bn.T
