"""Deterministic sampling & dataset splitting for training-data curation.

The two operations every large-scale pipeline runs before training:
rebalance strata (domains/sources/languages are wildly skewed in web
corpora) and carve out held-out splits. Both are expressed as pure
per-row projections over a portable hash of the row key — no shuffle,
no sort, no RNG state — so they cost one corpus scan at any size and
every engine reproduces the identical sample bit-for-bit (the same
md5-fold idiom as the dedup substrate, ``dedup._hash48_expr``).

No reference counterpart (the reference is a vector-search engine,
`/root/reference/baseline.cpp`); this is part of the beyond-the-
reference training-pipeline surface (SURVEY §7.5).

Scale posture: the only non-projection step is one bounded
``groupBy(strata).count()`` whose result (|strata| rows) comes to the
driver and re-enters the plan as a literal map — same pattern as the
engine's analytic shard catalog. Hash buckets are ppm integers, so
oracle comparison never touches floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hash48_expr, _hash48_sql

PPM = 1_000_000
# distinct hash domains so sampling and splitting are independent draws
_SAMP_TAG = "samp:"
_SPLIT_TAG = "split:"


def _bucket(tag: str, key: F.Column) -> F.Column:
    return F.pmod(_hash48_expr(F.concat(F.lit(tag), key.cast("string"))), F.lit(PPM))


def split_expr(key: F.Column, val_ppm: int, test_ppm: int) -> F.Column:
    """'train' | 'val' | 'test' assignment from the key's hash bucket —
    stable under corpus growth: a document's split never changes when
    rows are added or removed, which is what keeps eval sets honest
    across pipeline re-runs."""
    b = _bucket(_SPLIT_TAG, key)
    return (
        F.when(b < test_ppm, F.lit("test"))
        .when(b < test_ppm + val_ppm, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def balanced_sample_splits(
    docs: DataFrame,
    strata: str = "source",
    val_ppm: int = 100_000,
    test_ppm: int = 100_000,
) -> DataFrame:
    """(doc_id, <strata>, split): downsample every stratum to the size
    of the smallest, then assign train/val/test.

    Per-stratum keep-rate = floor(min_count·1e6 / count) ppm, computed
    from one bounded stats collect; the filter itself is a projection
    (hash bucket < literal-map rate), so rebalancing a 100 TB corpus
    is a single scan with no shuffle at all.
    """
    cnts = {r[0]: r[1] for r in docs.groupBy(strata).count().collect()}
    if not cnts:
        return docs.select("doc_id", strata, F.lit("train").alias("split")).limit(0)
    mn = min(cnts.values())
    pairs: list[F.Column] = []
    for s, c in sorted(cnts.items()):
        pairs += [F.lit(s), F.lit((mn * PPM) // c)]
    rate = F.element_at(F.create_map(*pairs), F.col(strata))
    return docs.filter(_bucket(_SAMP_TAG, F.col("doc_id")) < rate).select(
        "doc_id", strata, split_expr(F.col("doc_id"), val_ppm, test_ppm).alias("split")
    )


def balanced_sample_splits_sql(
    strata: str = "source", val_ppm: int = 100_000, test_ppm: int = 100_000
) -> str:
    samp = _hash48_sql(f"'{_SAMP_TAG}' || doc_id::VARCHAR")
    spl = _hash48_sql(f"'{_SPLIT_TAG}' || doc_id::VARCHAR")
    return f"""
WITH c AS (SELECT {strata}, count(*) AS cnt FROM documents GROUP BY {strata}),
m AS (SELECT min(cnt) AS mn FROM c),
r AS (SELECT {strata}, (m.mn * {PPM}) // cnt AS rate_ppm FROM c, m),
h AS (
  SELECT doc_id, {strata},
         ({samp}) % {PPM} AS sb,
         ({spl}) % {PPM} AS pb
  FROM documents
)
SELECT h.doc_id, h.{strata},
       CASE WHEN pb < {test_ppm} THEN 'test'
            WHEN pb < {test_ppm + val_ppm} THEN 'val'
            ELSE 'train' END AS split
FROM h JOIN r USING ({strata})
WHERE sb < rate_ppm
"""


# ---------------------------------------------------------------------------
# Weighted mixture sampling — dataset mixing by target proportions
# ---------------------------------------------------------------------------

_MIX_TAG = "mix:"

# Target mixture proportions by source (relative weights, not ppm) —
# the "data recipe" every pretraining run specifies; sources absent
# from the map keep weight 1. The default recipe upweights two of the
# fixture's sources so the registry entry exercises real non-uniform
# rates; production callers pass their own map.
DEFAULT_MIX_WEIGHTS: dict[str, float] = {"src0": 4.0, "src1": 2.0}


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    strata: str = "source",
) -> DataFrame:
    """(doc_id, <strata>): downsample each stratum so the KEPT corpus
    follows the target mixture ``weights`` as closely as possible
    without upsampling (the stratum with the highest demand-to-supply
    ratio is kept whole, everything else scales down proportionally).

    Same physical shape as :func:`balanced_sample_splits`: one bounded
    per-stratum count, keep-rates re-enter the plan as a literal map,
    and the filter is a pure hash projection — one scan, no shuffle,
    deterministic at any corpus size."""
    w = DEFAULT_MIX_WEIGHTS if weights is None else weights
    cnts = {r[0]: r[1] for r in docs.groupBy(strata).count().collect()}
    if not cnts:
        return docs.select("doc_id", strata).limit(0)
    # scale s.t. the tightest stratum keeps 100%: rate_s ∝ w_s / n_s
    demand = {s: w.get(s, 1.0) / c for s, c in cnts.items()}
    mx = max(demand.values())
    pairs: list[F.Column] = []
    for s in sorted(cnts):
        pairs += [F.lit(s), F.lit(int(demand[s] / mx * PPM))]
    rate = F.element_at(F.create_map(*pairs), F.col(strata))
    return docs.filter(_bucket(_MIX_TAG, F.col("doc_id")) < rate).select("doc_id", strata)


def mixture_sample_sql(
    weights: dict[str, float] | None = None, strata: str = "source"
) -> str:
    """Oracle: the identical demand/supply arithmetic in SQL. Rates are
    computed as integer ppm from exact per-stratum counts; the float
    weight division is the same double math in both engines (one
    divide + one multiply on exact integers — bit-identical)."""
    w = DEFAULT_MIX_WEIGHTS if weights is None else weights
    cases = " ".join(
        f"WHEN {strata} = '{s}' THEN {float(wt)}" for s, wt in sorted(w.items())
    )
    wexpr = f"CASE {cases} ELSE 1.0 END"
    mix_key = f"'{_MIX_TAG}' || doc_id::VARCHAR"
    hb = f"({_hash48_sql(mix_key)}) % {PPM}"
    return f"""
WITH c AS (SELECT {strata}, count(*) AS cnt, ({wexpr}) AS w FROM documents GROUP BY {strata}),
m AS (SELECT max(w / cnt) AS mx FROM c),
r AS (SELECT {strata}, floor((w / cnt) / m.mx * {PPM})::BIGINT AS rate_ppm FROM c, m)
SELECT d.doc_id, d.{strata}
FROM documents d JOIN r USING ({strata})
WHERE ({hb}) < rate_ppm
"""
