"""Deduplication family for document corpora: exact, shingle-Jaccard,
MinHash+LSH, SimHash, embedding-cosine.

Beyond the reference's surface (SURVEY §7.5) but built on its ideas:
LSH banding is the same partition-then-search-within-partition trick
as the reference's category graphs; the verify-after-candidates step
mirrors its quantize-then-rerank two-phase split.

Design for 100 TB: every op is candidate-generation (cheap, massively
parallel, produces a small pair set) followed by verification (exact,
touches only candidate pairs). Nothing ever materializes the O(n²)
pair space: exact dedup groups by fingerprint; Jaccard joins on shared
shingles (inverted-index join); MinHash joins on band signatures;
SimHash groups by hash value; cosine blocks by label. All hash
functions are portable integer arithmetic (word-id based, not engine
hashes), so every op here is hash-match verifiable against DuckDB.
"""

from __future__ import annotations

import numpy as _np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Portable hash constants (shared verbatim by Spark + oracle SQL).
MOD = 2147483647
N_HASHES = 12
BAND_ROWS = 3  # → 4 bands
HASH_A = [(1103515245 * (i + 1) + 7) % MOD for i in range(N_HASHES)]
HASH_B = [(12345 * (i + 1) + 3) % MOD for i in range(N_HASHES)]
SIM_A, SIM_B = 1103515245, 12345
SIM_BITS = 32
JACCARD_TAU_PPM = 500_000  # τ = 0.5


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(docs: DataFrame) -> DataFrame:
    """(doc_id, canonical_id): every doc mapped to the smallest doc_id
    sharing its exact text — the hash-groupBy dedup. Keep rows where
    doc_id == canonical_id to materialize the deduplicated corpus.

    The window partitions on md5(text), not the text itself: the
    shuffle key is 16 bytes per row instead of the whole document body
    (at 100 TB the documents ARE the dataset — keying the exchange on
    them would move the corpus twice). md5 collisions over equal-length
    inputs are not a practical concern for dedup grouping; the oracle
    partitions by raw text and values agree."""
    w = Window.partitionBy(F.md5("text"))
    return docs.select(
        "doc_id", F.min("doc_id").over(w).cast("long").alias("canonical_id")
    )


DEDUP_EXACT_SQL = """
SELECT doc_id, CAST(min(doc_id) OVER (PARTITION BY text) AS BIGINT) AS canonical_id
FROM documents
"""


# ---------------------------------------------------------------------------
# Shingles (shared substrate)
# ---------------------------------------------------------------------------
# Shingle key = low-48-bit md5 of the 3-gram string. A pure per-row
# projection: no vocabulary table, no global sort, no extra shuffle —
# the property that lets this run over 100 TB of documents (the old
# rank-over-vocab design needed a single-partition window). Both
# engines compute the identical integer: Spark via conv(substr(md5)),
# DuckDB via a strpos hex fold (exact: every term < 2^53).


def _hash48_expr(s: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")


def _hash48_sql(s: str) -> str:
    # fold variable must not be `i`: callers embed this inside an outer
    # list_transform whose variable is `i` (DuckDB lambdas shadow)
    return (
        "list_sum(list_transform(range(1, 13), "
        f"hx -> (strpos('0123456789abcdef', substr(md5({s}), hx, 1)) - 1) "
        "* (2.0 ** (4 * (12 - hx)))))::BIGINT"
    )


def _shingle_keys_expr() -> F.Column:
    """array<long> of distinct hashed 3-word shingles of ``text`` — a
    pure projection (no shuffle, no state)."""
    ws = F.split("text", " ")
    grams = F.when(F.size(ws) >= 3, F.sequence(F.lit(0), F.size(ws) - 3)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(
            grams,
            lambda i: _hash48_expr(
                F.concat_ws(
                    " ",
                    F.element_at(ws, i + 1),
                    F.element_at(ws, i + 2),
                    F.element_at(ws, i + 3),
                )
            ),
        )
    )


def _shingle_table(docs: DataFrame) -> DataFrame:
    """(doc_id, skeys array<long>, mh array<long>): distinct hashed
    3-gram shingles AND the 12 minhash values, one Arrow pass.

    hashlib.md5 produces the identical 48-bit keys as the JVM
    expression (`_shingle_keys_expr`) and the oracle's hex fold — the
    Python kernel exists because the md5-per-gram *expression* pays
    multi-second whole-stage-codegen compilation per query, while this
    kernel is a flat per-row map with NumPy minhash reduction. Still a
    pure projection: no shuffle, no state, scales per-partition."""
    a_arr = _np.array(HASH_A, dtype="int64")[:, None]
    b_arr = _np.array(HASH_B, dtype="int64")[:, None]

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_id, out_keys, out_mh = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = text.split(" ") if text else []  # null ≡ empty doc
                keys = {
                    int(hashlib.md5((" ".join(ws[i : i + 3])).encode()).hexdigest()[:12], 16)
                    for i in range(len(ws) - 2)
                }
                ks = np.fromiter(keys, dtype=np.int64, count=len(keys))
                if ks.size:
                    # reduce below 2^31 first: a·skey would overflow int64
                    mh = ((a_arr * (ks[None, :] % MOD) + b_arr) % MOD).min(axis=1)
                else:
                    mh = np.full(N_HASHES, MOD, dtype=np.int64)
                out_id.append(doc_id)
                out_keys.append(ks)
                out_mh.append(mh)
            yield pd.DataFrame({"doc_id": out_id, "skeys": out_keys, "mh": out_mh})

    return docs.select("doc_id", "text").mapInPandas(
        gen, "doc_id long, skeys array<long>, mh array<long>"
    )


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, skey) — distinct hashed 3-word shingles per document."""
    return _shingle_table(docs).select("doc_id", F.explode("skeys").alias("skey"))


_SHINGLE_KEY_SQL = _hash48_sql("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")

_SHINGLES_CTE = f"""
shingles AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(ws) - 1),
           i -> {_SHINGLE_KEY_SQL}))) AS skey
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
)
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup join
# ---------------------------------------------------------------------------


# Document-frequency cap for candidate generation: a shingle shared by
# f documents contributes f(f−1)/2 rows to the inverted-index self-join,
# so one stop-word trigram in 1% of a 100 TB corpus is a quadratic hot
# key. The standard df/prefix filter drops such shingles from CANDIDATE
# GENERATION only — the exact verify still counts them, so any pair
# surfaced through a rarer shared shingle gets its true Jaccard. Pairs
# sharing ONLY >cap shingles are excluded by design (stop-word
# collisions, not near-dups).
HOT_SHINGLE_DF_CAP = 64


# ---------------------------------------------------------------------------
# Benchmark decontamination (train/eval n-gram overlap)
# ---------------------------------------------------------------------------

# A training doc sharing at least this many rare shingles with an eval
# doc is flagged contaminated (the Dolma/GPT-3-style n-gram overlap
# rule). Contamination signal lives in RARE n-grams; shingles above the
# df cap are stop-phrases, excluded from matching by spec (not merely
# as an optimization — the SQL oracle applies the same rule).
DECON_MIN_SHARED = 3
DECON_BENCH_MOD = 10


def decontaminate(
    docs: DataFrame,
    bench_mod: int = DECON_BENCH_MOD,
    min_shared: int = DECON_MIN_SHARED,
    df_cap: int = HOT_SHINGLE_DF_CAP,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(train_doc_id, bench_doc_id, shared): training documents that
    share ≥ ``min_shared`` rare 3-gram shingles with a benchmark
    document — the train/eval overlap (decontamination) pass every
    LLM-pretraining pipeline runs before training. The "benchmark" here
    is the deterministic ``doc_id % bench_mod == 0`` slice standing in
    for a held-out eval suite; pass a different predicate upstream by
    filtering ``docs`` yourself and unioning.

    Scale shape: inverted-index join keyed on df-capped shingles — the
    hot (stop-phrase) keys are removed by a broadcast anti-join exactly
    as in :func:`jaccard_pairs`. With ``broadcast_bench`` (default) the
    BENCH shingle side is broadcast so the training corpus's shingles
    never shuffle: one projection scan, one broadcast hash join, one
    map-side-combined groupBy bounded by the flagged-pair count. That
    hint assumes a GENUINELY SMALL eval suite (a real one is MBs) —
    the ``bench_mod`` slice default is a small-scale stand-in that is
    ~1/bench_mod of the corpus, which at 100 TB would OOM the driver if
    broadcast. For a corpus-sized bench side pass
    ``broadcast_bench=False``: the join falls back to a shuffle hash
    join that AQE still converts to broadcast at runtime when the built
    side turns out small."""
    sh = _doc_shingles(docs)
    hot = (
        sh.groupBy("skey")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > df_cap)
        .select("skey")
    )
    cold = sh.join(F.broadcast(hot), "skey", "left_anti")
    train = cold.filter(F.pmod(F.col("doc_id"), F.lit(bench_mod)) != 0).select(
        F.col("doc_id").alias("train_doc_id"), "skey"
    )
    bench = cold.filter(F.pmod(F.col("doc_id"), F.lit(bench_mod)) == 0).select(
        F.col("doc_id").alias("bench_doc_id"), "skey"
    )
    bench_side = F.broadcast(bench) if broadcast_bench else bench
    return (
        train.join(bench_side, "skey")
        .groupBy("train_doc_id", "bench_doc_id")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def decontaminate_sql(
    bench_mod: int = DECON_BENCH_MOD,
    min_shared: int = DECON_MIN_SHARED,
    df_cap: int = HOT_SHINGLE_DF_CAP,
) -> str:
    return f"""
WITH {_SHINGLES_CTE},
cold AS (
  SELECT * FROM shingles
  WHERE skey NOT IN (SELECT skey FROM shingles GROUP BY skey HAVING count(*) > {df_cap})
)
SELECT t.doc_id AS train_doc_id, b.doc_id AS bench_doc_id, count(*) AS shared
FROM cold t JOIN cold b ON t.skey = b.skey
WHERE t.doc_id % {bench_mod} != 0 AND b.doc_id % {bench_mod} = 0
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


def _jaccard_candidates(sh: DataFrame, df_cap: int | None) -> DataFrame:
    """(d1, d2) distinct candidate pairs through shared shingles with
    document frequency ≤ df_cap (None = uncapped)."""
    gen = sh
    if df_cap is not None:
        hot = (
            sh.groupBy("skey")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > df_cap)
            .select("skey")
        )
        # the hot set is tiny (only >cap-frequency keys) → broadcast
        # anti-join, and the df aggregation itself is safe on a hot key
        # (count has map-side partial aggregation)
        gen = sh.join(F.broadcast(hot), "skey", "left_anti")
    a = gen.alias("a")
    b = gen.alias("b")
    return (
        a.join(b, (F.col("a.skey") == F.col("b.skey")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )


# Hot-key sets (keys crossing the df cap) are boilerplate by definition
# — a handful of shingles/fingerprints shared by thousands of docs — so
# they almost always fit on the driver. Below this cap the key set is
# collected once and rebuilt as a local relation (no persisted RDD
# outlives the operator — the r10-flagged session-lifetime cache leak);
# above it the uncached plan is reused, trading one recompute per
# consuming join for bounded driver memory.
_HOT_KEYS_COLLECT_CAP = 1_000_000


def _split_hot(
    items: DataFrame, key: str, df_cap: int | None
) -> tuple[DataFrame, DataFrame | None]:
    """(cold, hot_rows) split of ``items`` on per-``key`` document
    frequency vs ``df_cap``, leak-free. ``hot_rows`` is None when no
    key crosses the cap (the common case on clean corpora) — the cold
    plan then IS the full plan and callers skip the correction join."""
    if df_cap is None:
        return items, None
    hot = (
        items.groupBy(key)
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > df_cap)
        .select(key)
    )
    head = hot.limit(_HOT_KEYS_COLLECT_CAP + 1).collect()
    if not head:
        return items, None
    if len(head) <= _HOT_KEYS_COLLECT_CAP:
        hot = items.sparkSession.createDataFrame(head, hot.schema)
    cold = items.join(F.broadcast(hot), key, "left_anti")
    return cold, items.join(F.broadcast(hot), key)


def _pair_intersections(
    docs: DataFrame, df_cap: int | None
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate machinery of the shingle near-dup family:
    returns (inter, sizes) where inter = (d1 < d2, exact shingle
    intersection count) for every pair sharing ≥1 cold shingle, and
    sizes = per-doc shingle counts. See :func:`jaccard_pairs` for the
    cold/hot split rationale."""
    sh = _doc_shingles(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    cold, hot_sh = _split_hot(sh, "skey", df_cap)
    a = cold.alias("a")
    b = cold.alias("b")
    inter = (
        a.join(b, (F.col("a.skey") == F.col("b.skey")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    if hot_sh is not None:
        h1 = hot_sh.select(F.col("doc_id").alias("d1"), F.col("skey").alias("hk1"))
        h2 = hot_sh.select(F.col("doc_id").alias("d2b"), F.col("skey").alias("hk2"))
        hot_cnt = (
            inter.select("d1", "d2")
            .join(h1, "d1")
            .join(h2, (F.col("hk2") == F.col("hk1")) & (F.col("d2b") == F.col("d2")))
            .groupBy("d1", "d2")
            .agg(F.count("*").alias("hot_inter"))
        )
        inter = inter.join(hot_cnt, ["d1", "d2"], "left").withColumn(
            "inter", F.col("inter") + F.coalesce(F.col("hot_inter"), F.lit(0))
        )
    return inter, sizes


def _with_sizes(inter: DataFrame, sizes: DataFrame) -> DataFrame:
    return inter.join(
        sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1"
    ).join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")


def jaccard_pairs(
    docs: DataFrame,
    tau_ppm: int = JACCARD_TAU_PPM,
    df_cap: int | None = HOT_SHINGLE_DF_CAP,
) -> DataFrame:
    """(d1, d2, jaccard_ppm) for pairs with 3-shingle Jaccard ≥ τ.

    Inverted-index join over COLD shingles (document frequency ≤
    df_cap, see HOT_SHINGLE_DF_CAP): candidate pairs are generated and
    their cold intersection counted in one join + map-side-combined
    groupBy, never enumerated. Hot shingles still count toward the
    exact Jaccard through a correction join restricted to the
    candidate pairs (the hot shingle table is tiny — only >cap-df
    keys), so every surfaced pair gets its true intersection. The τ
    filter compares integers (inter·1e6 ≥ τppm·union) — no float in
    the cut."""
    inter, sizes = _pair_intersections(docs, df_cap)
    j = _with_sizes(inter, sizes).withColumn(
        "un", F.col("n1") + F.col("n2") - F.col("inter")
    )
    return j.filter(F.col("inter") * 1_000_000 >= F.lit(tau_ppm) * F.col("un")).select(
        "d1",
        "d2",
        F.floor(F.col("inter").cast("double") / F.col("un").cast("double") * 1e6)
        .cast("long")
        .alias("jaccard_ppm"),
    )


CONTAINMENT_TAU_PPM = 700_000


def containment_pairs(
    docs: DataFrame,
    tau_ppm: int = CONTAINMENT_TAU_PPM,
    df_cap: int | None = HOT_SHINGLE_DF_CAP,
) -> DataFrame:
    """(d1, d2, c12_ppm, c21_ppm): ASYMMETRIC near-dup — Broder
    containment c(A→B) = |A∩B| / |A| over 3-shingles, keeping pairs
    where either direction clears τ. Catches what Jaccard misses:
    a short document embedded verbatim in a much longer one (quote,
    concatenation, page-of-pages) has high containment but low
    Jaccard. Same candidate machinery as :func:`jaccard_pairs` (cold
    inverted-index join + hot correction — one shared plan, no extra
    scan), integer cut: inter·1e6 ≥ τ·min(n1, n2)."""
    inter, sizes = _pair_intersections(docs, df_cap)
    j = _with_sizes(inter, sizes)
    return j.filter(
        F.col("inter") * 1_000_000 >= F.lit(tau_ppm) * F.least("n1", "n2")
    ).select(
        "d1",
        "d2",
        F.floor(F.col("inter").cast("double") / F.col("n1").cast("double") * 1e6)
        .cast("long")
        .alias("c12_ppm"),
        F.floor(F.col("inter").cast("double") / F.col("n2").cast("double") * 1e6)
        .cast("long")
        .alias("c21_ppm"),
    )


def containment_pairs_sql(
    tau_ppm: int = CONTAINMENT_TAU_PPM, df_cap: int | None = HOT_SHINGLE_DF_CAP
) -> str:
    cold = (
        f"""cold AS (
  SELECT * FROM shingles
  WHERE skey NOT IN (SELECT skey FROM shingles GROUP BY skey HAVING count(*) > {df_cap})
),"""
        if df_cap is not None
        else "cold AS (SELECT * FROM shingles),"
    )
    return f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
{cold}
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM cold a JOIN cold b ON a.skey = b.skey AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.d1, c.d2, count(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.d1
  JOIN shingles sb ON sb.doc_id = c.d2 AND sb.skey = sa.skey
  GROUP BY 1, 2
)
SELECT d1, d2,
       CAST(floor(inter::DOUBLE / n1.n::DOUBLE * 1e6) AS BIGINT) AS c12_ppm,
       CAST(floor(inter::DOUBLE / n2.n::DOUBLE * 1e6) AS BIGINT) AS c21_ppm
FROM inter
JOIN sizes n1 ON n1.doc_id = d1
JOIN sizes n2 ON n2.doc_id = d2
WHERE inter * 1000000 >= {tau_ppm} * least(n1.n, n2.n)
"""


def jaccard_pairs_sql(
    tau_ppm: int = JACCARD_TAU_PPM, df_cap: int | None = HOT_SHINGLE_DF_CAP
) -> str:
    cold = (
        f"""cold AS (
  SELECT * FROM shingles
  WHERE skey NOT IN (SELECT skey FROM shingles GROUP BY skey HAVING count(*) > {df_cap})
),"""
        if df_cap is not None
        else "cold AS (SELECT * FROM shingles),"
    )
    return f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
{cold}
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM cold a JOIN cold b ON a.skey = b.skey AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.d1, c.d2, count(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.d1
  JOIN shingles sb ON sb.doc_id = c.d2 AND sb.skey = sa.skey
  GROUP BY 1, 2
)
SELECT d1, d2,
       CAST(floor(inter::DOUBLE / (n1.n + n2.n - inter)::DOUBLE * 1e6) AS BIGINT) AS jaccard_ppm
FROM inter
JOIN sizes n1 ON n1.doc_id = d1
JOIN sizes n2 ON n2.doc_id = d2
WHERE inter * 1000000 >= {tau_ppm} * (n1.n + n2.n - inter)
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def band_sigs(arrs: DataFrame, with_skeys: bool = False) -> DataFrame:
    """(doc_id, band, sig[, skeys]) — the LSH band signatures of a
    (doc_id, skeys, mh) shingle table: N_HASHES minhashes split into
    bands of BAND_ROWS, each band's values folded to one string key.
    Shared by the batch pair join and the streaming stateful twin so
    the two candidate generators cannot drift."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("mh", b * BAND_ROWS + j + 1).cast("string")
                        for j in range(BAND_ROWS)
                    ],
                ).alias("sig"),
            )
            for b in range(N_HASHES // BAND_ROWS)
        ]
    )
    cols = ["doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")]
    if with_skeys:
        cols.append("skeys")
    keep = ["doc_id", "skeys"] if with_skeys else ["doc_id"]
    return (
        arrs.filter(F.size("skeys") > 0)
        .select(*keep, F.explode(bands).alias("bs"))
        .select(*cols)
    )


def minhash_lsh_pairs(docs: DataFrame, tau_ppm: int = JACCARD_TAU_PPM) -> DataFrame:
    """(d1, d2, jaccard_ppm): LSH-banded candidate generation +
    exact-Jaccard verification.

    12 portable hashes ((aᵢ·skey+bᵢ) mod p) → 4 bands × 3 rows; docs
    sharing any band signature become candidates; candidates are
    verified exactly. Signatures are computed row-local (array_min over
    a transform of the per-doc shingle array — no explode, no shuffle),
    so at 100 TB the band self-join is the ONLY shuffle of the
    candidate phase and its key space (band, sig) is uniformly spread
    by construction."""
    # Materialize the per-doc (shingles, minhashes) table ONCE;
    # signatures, the exploded shingle table, and verification all
    # derive from this cache, so hashing runs a single time.
    arrs = _shingle_table(docs).cache()
    sh = arrs.select("doc_id", F.explode("skeys").alias("skey"))
    sigs = band_sigs(arrs)
    a = sigs.alias("a")
    b = sigs.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    # Verify ONLY candidate pairs (the LSH contract): exact Jaccard is
    # computed by joining each candidate to its two shingle sets, never
    # by re-running the full inverted-index pair join.
    sh2 = sh.alias("s1")
    sh3 = sh.alias("s2")
    inter = (
        cands.join(sh2, F.col("d1") == F.col("s1.doc_id"))
        .join(
            sh3,
            (F.col("d2") == F.col("s2.doc_id")) & (F.col("s1.skey") == F.col("s2.skey")),
        )
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
        .withColumn("un", F.col("n1") + F.col("n2") - F.col("inter"))
    )
    return j.filter(F.col("inter") * 1_000_000 >= F.lit(tau_ppm) * F.col("un")).select(
        "d1",
        "d2",
        F.floor(F.col("inter").cast("double") / F.col("un").cast("double") * 1e6)
        .cast("long")
        .alias("jaccard_ppm"),
    )


def minhash_lsh_pairs_sql(tau_ppm: int = JACCARD_TAU_PPM) -> str:
    a_list = ", ".join(str(x) for x in HASH_A)
    b_list = ", ".join(str(x) for x in HASH_B)
    return f"""
WITH {_SHINGLES_CTE},
params AS (
  SELECT i, ([{a_list}])[i + 1]::BIGINT AS a, ([{b_list}])[i + 1]::BIGINT AS b
  FROM (SELECT unnest(range(0, {N_HASHES})) AS i)
),
sigs AS (
  SELECT doc_id, i // {BAND_ROWS} AS band,
         string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
  FROM (
    SELECT s.doc_id, p.i, min((p.a * (s.skey % {MOD}) + p.b) % {MOD}) AS mh
    FROM shingles s, params p
    GROUP BY s.doc_id, p.i
  )
  GROUP BY doc_id, band
),
cands AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM sigs a JOIN sigs b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
  FROM shingles a JOIN shingles b ON a.skey = b.skey AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
verified AS (
  SELECT d1, d2,
         CAST(floor(inter::DOUBLE / (n1.n + n2.n - inter)::DOUBLE * 1e6) AS BIGINT) AS jaccard_ppm
  FROM inter
  JOIN sizes n1 ON n1.doc_id = d1
  JOIN sizes n2 ON n2.doc_id = d2
  WHERE inter * 1000000 >= {tau_ppm} * (n1.n + n2.n - inter)
)
SELECT c.d1, c.d2, v.jaccard_ppm FROM cands c JOIN verified v ON c.d1 = v.d1 AND c.d2 = v.d2
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash over word multisets. Word
    hash = low 48 bits of md5 (portable, no vocabulary table — scale
    property as in _doc_shingles). Near-dups cluster by equal (or
    Hamming-close) values; grouping by the hash is the blocking step."""
    spark = docs.sparkSession
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    counts = toks.groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
    bits = spark.range(SIM_BITS).select(
        F.col("id").cast("int").alias("j"), F.pow(F.lit(2.0), F.col("id")).cast("long").alias("p2")
    )
    contrib = (
        counts.withColumn("g", _hash48_expr(F.col("w")))
        .crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            "j",
            "p2",
            (((F.col("g") / F.col("p2")).cast("long") % 2) * 2 - 1) * F.col("cnt"),
        )
        .toDF("doc_id", "j", "p2", "c")
        .groupBy("doc_id", "j", "p2")
        .agg(F.sum("c").alias("s"))
    )
    return contrib.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.col("p2")).otherwise(F.lit(0))).cast("long").alias("simhash")
    )


SIMHASH_SQL = f"""
WITH counts AS (
  SELECT doc_id, w, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2
),
bits AS (SELECT j, CAST(power(2, j) AS BIGINT) AS p2 FROM (SELECT unnest(range(0, {SIM_BITS})) AS j)),
contrib AS (
  SELECT doc_id, j, p2,
         sum((({_hash48_sql('w')} // p2) % 2 * 2 - 1) * cnt) AS s
  FROM counts, bits
  GROUP BY 1, 2, 3
)
SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN p2 ELSE 0 END) AS BIGINT) AS simhash
FROM contrib GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs
# ---------------------------------------------------------------------------


def cosine_pairs(emb: DataFrame, tau_ppm: int = 400_000) -> DataFrame:
    """(d1, d2, cos_ppm): label-blocked pairs with cosine ≥ τ.
    Blocking keys (here: label; at scale an LSH bucket — see
    similarity.py) keep the join off the O(n²) pair space.

    Physical plan: one task per block, pairwise similarity as a single
    NumPy GEMM inside applyInPandas (upper triangle only) — the
    per-pair expression join this replaces shuffled every pair row
    through the JVM; here only above-threshold pairs leave the task."""
    import numpy as np
    import pandas as pd

    tau = tau_ppm / 1e6

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        Vn = V / np.sqrt(np.einsum("ij,ij->i", V, V))[:, None]
        S = Vn @ Vn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        sel = S[iu, ju] >= tau
        return pd.DataFrame(
            {
                "d1": ids[iu[sel]],
                "d2": ids[ju[sel]],
                "cos_ppm": np.floor(S[iu[sel], ju[sel]] * 1e6).astype(np.int64),
            }
        )

    return emb.groupBy("label").applyInPandas(fn, "d1 long, d2 long, cos_ppm long")


def cosine_pairs_lsh(emb: DataFrame, tau_ppm: int = 400_000) -> DataFrame:
    """(d1, d2, cos_ppm): embedding near-dup pairs with LSH blocking —
    the 100 TB shape of :func:`cosine_pairs` (whose label blocking
    assumes a partition-friendly label exists). Candidates are pairs
    sharing ≥1 probe bucket (home hyperplane-sign bucket + every
    1-bit flip — covering pairs up to Hamming 2 apart), then an exact
    cosine verify keeps cos ≥ τ. The bucket join is the only shuffle
    keyed wider than the pair set; no O(n²) pair space is touched.

    Verify runs as a Catalyst fold (not a NumPy GEMM) so the emitted
    cos_ppm is bit-identical to the DuckDB oracle's list_sum fold."""
    from .similarity import _bucket_expr, n_planes_for_pairs

    tau = tau_ppm / 1e6
    planes = n_planes_for_pairs(emb.count())
    wb = emb.select("vec_id", _bucket_expr("embedding", planes).alias("bucket"))
    probes = wb.select(
        "vec_id",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << j)).cast("long")
                    for j in range(planes)
                ],
            )
        ).alias("probe"),
    )
    cand = (
        probes.alias("a")
        .join(
            probes.alias("b"),
            (F.col("a.probe") == F.col("b.probe")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("d1"), F.col("b.vec_id").alias("d2"))
        .distinct()
    )
    def _fold_sum(col: F.Column) -> F.Column:
        return F.aggregate(col, F.lit(0.0), lambda a, v: a + v)

    # per-DOC norms once (n rows), not per pair — the fold expression is
    # identical, so the value (and the oracle hash) is unchanged while
    # two of the three per-pair folds disappear from the verify
    nrm = F.sqrt(
        _fold_sum(F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")))
    )
    ea = emb.select(F.col("vec_id").alias("d1"), F.col("embedding").alias("e1"), nrm.alias("n1"))
    eb = emb.select(F.col("vec_id").alias("d2"), F.col("embedding").alias("e2"), nrm.alias("n2"))

    dot = _fold_sum(
        F.zip_with(F.col("e1"), F.col("e2"), lambda x, y: x.cast("double") * y.cast("double"))
    )
    return (
        cand.join(ea, "d1")
        .join(eb, "d2")
        .select("d1", "d2", (dot / (F.col("n1") * F.col("n2"))).alias("cos"))
        .filter(F.col("cos") >= tau)
        .select("d1", "d2", F.floor(F.col("cos") * 1e6).cast("long").alias("cos_ppm"))
    )


def cosine_pairs_lsh_sql(tau_ppm: int = 400_000) -> str:
    from .similarity import N_PLANES_MAX, _bucket_sql, n_planes_pairs_cte

    bucket = _bucket_sql("embedding")
    probe_terms = ["SELECT vec_id, bucket AS probe FROM wb"] + [
        f"SELECT vec_id, xor(bucket, {1 << j}) AS probe FROM wb "
        f"WHERE {j} < (SELECT n FROM lshnp)"
        for j in range(N_PLANES_MAX)
    ]
    probes = " UNION ALL ".join(probe_terms)
    dot = (
        "list_sum(list_transform(range(1, len(ea.embedding) + 1), "
        "k -> ea.embedding[k]::DOUBLE * eb.embedding[k]::DOUBLE))"
    )
    na = (
        "sqrt(list_sum(list_transform(range(1, len(ea.embedding) + 1), "
        "k -> ea.embedding[k]::DOUBLE * ea.embedding[k]::DOUBLE)))"
    )
    nb = (
        "sqrt(list_sum(list_transform(range(1, len(eb.embedding) + 1), "
        "k -> eb.embedding[k]::DOUBLE * eb.embedding[k]::DOUBLE)))"
    )
    return f"""
WITH lshnp AS ({n_planes_pairs_cte()}),
wb AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings, lshnp),
probes AS ({probes}),
cand AS (
  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
  FROM probes a JOIN probes b ON a.probe = b.probe AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT c.d1, c.d2, {dot} / ({na} * {nb}) AS cos
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.d1
  JOIN embeddings eb ON eb.vec_id = c.d2
)
SELECT d1, d2, CAST(floor(cos * 1e6) AS BIGINT) AS cos_ppm
FROM pairs WHERE cos >= {tau_ppm / 1e6}
"""


def cosine_pairs_sql(tau_ppm: int = 400_000) -> str:
    dot = (
        "list_sum(list_transform(range(1, len(a.embedding) + 1), "
        "k -> a.embedding[k]::DOUBLE * b.embedding[k]::DOUBLE))"
    )
    na = (
        "sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1), "
        "k -> a.embedding[k]::DOUBLE * a.embedding[k]::DOUBLE)))"
    )
    nb = (
        "sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1), "
        "k -> b.embedding[k]::DOUBLE * b.embedding[k]::DOUBLE)))"
    )
    return f"""
WITH pairs AS (
  SELECT a.vec_id AS d1, b.vec_id AS d2, {dot} / ({na} * {nb}) AS cos
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT d1, d2, CAST(floor(cos * 1e6) AS BIGINT) AS cos_ppm
FROM pairs WHERE cos >= {tau_ppm / 1e6}
"""


# ---------------------------------------------------------------------------
# Near-dup clustering (connected components over duplicate pairs)
# ---------------------------------------------------------------------------


# Below this many duplicate PAIRS, connected components runs as one
# driver-side union-find over a single collect (two jobs total) instead
# of the iterative join loop (~3 jobs/round): the pair set is the
# OUTPUT of dedup — orders of magnitude smaller than the corpus — so
# even 100 TB corpora usually land here. 5M pairs ≈ 80 MB collected.
CC_DRIVER_MAX_PAIRS = 5_000_000


def _cc_driver(pairs: DataFrame) -> DataFrame:
    """Exact connected components over a collected pair list; same
    contract as the distributed loop (cluster_id = min doc_id in the
    component). Fully vectorized: min-label propagation over the edge
    arrays + pointer jumping per round — O((E+V)·log d) numpy work, no
    per-edge Python loop (which would dominate at the 5M-pair cap)."""
    import numpy as np

    pdf = pairs.select("d1", "d2").toPandas()
    a = pdf["d1"].to_numpy().astype(np.int64)
    b = pdf["d2"].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))  # sorted ⇒ min pos ≡ min id
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    lbl = np.arange(len(nodes))
    while True:
        new = lbl.copy()
        np.minimum.at(new, ai, lbl[bi])  # adopt smallest neighbor label
        np.minimum.at(new, bi, lbl[ai])
        new = new[new]  # pointer jump: halve remaining path per round
        if np.array_equal(new, lbl):
            break
        lbl = new
    out = [(int(n), int(c)) for n, c in zip(nodes, nodes[lbl])]
    return pairs.sparkSession.createDataFrame(out, "doc_id long, cluster_id long")


def dedup_clusters(
    pairs: DataFrame,
    max_iter: int = 25,
    n_pairs: int | None = None,
    force_distributed: bool = False,
) -> DataFrame:
    """(doc_id, cluster_id): connected components over duplicate pairs
    — the step that turns pairwise dedup output into the curation
    deliverable (cluster_id = min doc_id in the component ⇒ "keep the
    canonical doc, drop the rest" is a filter).

    Cost-based like every other two-plan op here: a pair set under
    ``CC_DRIVER_MAX_PAIRS`` (the common case — pairs are dedup OUTPUT,
    not corpus) collects once and resolves with driver union-find (two
    jobs); larger pair sets run the distributed loop below.

    The distributed plan is iterative min-label propagation as repeated
    joins: each round every node adopts the smallest label among itself
    and its neighbors, and the driver stops at fixpoint (the
    convergence count is the one scalar that crosses to the driver per
    round). Rounds needed = O(log diameter) via pointer jumping;
    near-dup clusters are shallow, so this converges in a handful of
    rounds even when the pair set is 100 TB-scale. Each intermediate is
    persisted and replaces its parent so lineage stays O(1) deep —
    without that, iteration k would replay all k-1 prior shuffles.

    ``n_pairs``: pass the pair count when the caller already knows it
    (skips the branch-choice count job). When unknown, ``pairs`` is
    persisted before counting so the (typically expensive) pair
    pipeline executes once — the count and the chosen plan both read
    the cache, not the lineage. ``force_distributed``: pin the
    distributed join loop regardless of pair count (A/B twin tests).
    """
    owned: DataFrame | None = None
    if n_pairs is None:
        owned = pairs.persist()
        pairs = owned
        n_pairs = owned.count()
    if n_pairs <= CC_DRIVER_MAX_PAIRS and not force_distributed:
        out = _cc_driver(pairs)
        if owned is not None:
            owned.unpersist()
        return out
    e = pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    # pairs are d1<d2-canonical, so the swapped union is already
    # duplicate-free — no distinct shuffle needed
    edges = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    # seed each node with its 1-hop minimum (node itself or smallest
    # neighbor) — the same aggregation that dedups nodes, and it banks
    # the first propagation round for free
    labels = edges.groupBy(F.col("a").alias("node")).agg(
        F.least(F.col("a"), F.min("b")).alias("lbl")
    ).persist()
    # handle to the DataFrame that actually owns the cache entry —
    # unpersisting a projection of it is a no-op (the plan doesn't
    # match the cache), which would leak one cached table per round
    cached = labels
    for _ in range(max_iter):
        prop = edges.join(labels, edges["a"] == labels["node"]).select(
            F.col("b").alias("node"), "lbl", F.lit(False).alias("own")
        )
        # pointer jumping: adopt the label's own label too — halves the
        # remaining path each round, so rounds = O(log diameter), and
        # at scale every round is the expensive part (a full shuffle)
        jump = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.lbl") == F.col("y.node"))
            .select(
                F.col("x.node").alias("node"),
                F.col("y.lbl").alias("lbl"),
                F.lit(False).alias("own"),
            )
        )
        # one shuffle produces BOTH the new label and the old one
        # (own-flagged row), so convergence is a filter-count on the
        # persisted result — not a second join job per round
        new_labels = (
            labels.withColumn("own", F.lit(True))
            .unionByName(prop)
            .unionByName(jump)
            .groupBy("node")
            .agg(
                F.min("lbl").alias("lbl"),
                F.min(F.when(F.col("own"), F.col("lbl"))).alias("old_lbl"),
            )
            .persist()
        )
        changed = new_labels.filter(F.col("lbl") < F.col("old_lbl")).count()
        cached.unpersist()
        cached = new_labels
        labels = new_labels.select("node", "lbl")
        if changed == 0:
            break
    edges.unpersist()
    if owned is not None:
        owned.unpersist()  # the final labels are served by their own cache
    return labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def dedup_clusters_sql(pairs_sql: str) -> str:
    """Oracle: transitive closure by recursive CTE, cluster label =
    min reachable doc_id (exact on test scales; the Spark side is the
    one that scales)."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2, d1 FROM pairs
),
reach AS (
  SELECT a AS node, b AS r FROM edges
  UNION
  SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a
)
SELECT node AS doc_id, least(node, min(r)) AS cluster_id
FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints — positional rolling-hash document signatures
# ---------------------------------------------------------------------------

WINNOW_WINDOW = 4  # windows of consecutive shingle hashes per fingerprint


def winnow_fingerprints(docs: DataFrame, window: int = WINNOW_WINDOW) -> DataFrame:
    """(doc_id, win_id, fp): winnowing fingerprints (Schleimer et al.,
    SIGMOD'03) — the local fingerprinting scheme behind plagiarism /
    near-copy detection. The document's POSITIONAL 3-word shingle
    hashes (same hash48 as the dedup family, so signatures are
    comparable across operators) slide under a ``window``-wide min:
    window j's fingerprint is min(h[j..j+window-1]). Guarantees every
    match of ≥ window+2 consecutive tokens shares a fingerprint.

    One Arrow pass — per-doc hashing + a vectorized sliding min, zero
    shuffles; output is one integer row per window, bounded by token
    count. Docs shorter than window+2 tokens emit their single
    whole-sequence min; docs under 3 tokens (no shingle) emit nothing.

    Same md5-low-48 keys as ``_shingle_table`` (hashlib ≡ the JVM
    conv(substr(md5)) expression ≡ the oracle's hex fold), and the same
    reason for the Python kernel: the md5-per-gram Catalyst expression
    (plus a per-element aggregate ring-buffer fold for the window min)
    paid multi-second codegen + JVM hashing walls, while this kernel is
    a flat per-row map whose window min is ``np.minimum.reduce`` over
    ``window`` shifted views (measured r13: 4.5-5.9 s → ~1 s at sf0.1
    for the whole operator). Property-tested against a pure-python
    reference and the DuckDB twin (`winnow_fingerprints_sql`)."""
    w = int(window)

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_id, out_win, out_fp = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not text:  # null/empty text emits nothing — the
                    continue  # replaced Catalyst expression's behavior
                ws = text.split(" ")
                m = len(ws) - 2
                if m <= 0:
                    continue
                h = np.fromiter(
                    (
                        int(
                            hashlib.md5((" ".join(ws[i : i + 3])).encode())
                            .hexdigest()[:12],
                            16,
                        )
                        for i in range(m)
                    ),
                    dtype=np.int64,
                    count=m,
                )
                if m <= w:
                    fps = h.min(keepdims=True)
                else:
                    fps = np.minimum.reduce([h[j : m - w + 1 + j] for j in range(w)])
                out_id.append(np.full(fps.size, doc_id, dtype=np.int64))
                out_win.append(np.arange(1, fps.size + 1, dtype=np.int64))
                out_fp.append(fps)
            if out_id:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(out_id),
                        "win_id": np.concatenate(out_win),
                        "fp": np.concatenate(out_fp),
                    }
                )

    return docs.select("doc_id", "text").mapInPandas(
        gen, "doc_id long, win_id long, fp long"
    )


def winnow_fingerprints_sql(window: int = WINNOW_WINDOW) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` (same positional
    shingle hash48, same window-min rule)."""
    skey = _hash48_sql("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
h AS (
  SELECT doc_id,
         CASE WHEN len(ws) < 3 THEN []::BIGINT[]
              ELSE list_transform(range(1, len(ws) - 1), i -> {skey}) END AS hs
  FROM t
),
w AS (
  SELECT doc_id, hs,
         unnest(range(1, greatest(len(hs) - {int(window)} + 1, 1) + 1)) AS j
  FROM h WHERE len(hs) > 0
)
SELECT doc_id, j::BIGINT AS win_id,
       list_min(list_slice(hs, j, j + {int(window)} - 1))::BIGINT AS fp
FROM w
"""


WINNOW_MIN_SHARED = 2


def winnow_match_pairs(
    docs: DataFrame,
    window: int = WINNOW_WINDOW,
    min_shared: int = WINNOW_MIN_SHARED,
    df_cap: int | None = HOT_SHINGLE_DF_CAP,
) -> DataFrame:
    """(d1, d2, n_shared): near-copy PAIR detection over winnowing
    fingerprints — the matching half of the scheme
    (:func:`winnow_fingerprints` emits the signatures; this is the
    MOSS-style join that turns them into plagiarism/near-copy pairs).
    ``n_shared`` counts shared DISTINCT fingerprints; winnowing's
    guarantee makes any ≥ window+2-token verbatim overlap contribute at
    least one, so ``min_shared=2`` asks for two independent matching
    regions (or one long one).

    Same cold/hot candidate discipline as the shingle family
    (:func:`jaccard_pairs`): pairs are DISCOVERED through fingerprints
    with df ≤ ``df_cap`` (a boilerplate fingerprint shared by
    thousands of docs would generate quadratic candidates), then
    ``n_shared`` is corrected to the EXACT count including hot
    fingerprints via a candidate-bounded join — pairs sharing only hot
    fingerprints are not discovered (the documented bound, same as
    jaccard's). The oracle mirrors the discovery rule exactly."""
    fps = (
        winnow_fingerprints(docs, window).select("doc_id", "fp").distinct()
    )
    cold, hot_f = _split_hot(fps, "fp", df_cap)
    a, b = cold.alias("a"), cold.alias("b")
    inter = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("n_shared"))
    )
    if hot_f is not None:
        h1 = hot_f.select(F.col("doc_id").alias("d1"), F.col("fp").alias("hk1"))
        h2 = hot_f.select(F.col("doc_id").alias("d2b"), F.col("fp").alias("hk2"))
        hot_cnt = (
            inter.select("d1", "d2")
            .join(h1, "d1")
            .join(h2, (F.col("hk2") == F.col("hk1")) & (F.col("d2b") == F.col("d2")))
            .groupBy("d1", "d2")
            .agg(F.count("*").alias("hot_n"))
        )
        inter = inter.join(hot_cnt, ["d1", "d2"], "left").withColumn(
            "n_shared", F.col("n_shared") + F.coalesce(F.col("hot_n"), F.lit(0))
        )
    return (
        inter.filter(F.col("n_shared") >= int(min_shared))
        .select("d1", "d2", F.col("n_shared").cast("long").alias("n_shared"))
    )


def winnow_match_pairs_sql(
    window: int = WINNOW_WINDOW,
    min_shared: int = WINNOW_MIN_SHARED,
    df_cap: int | None = HOT_SHINGLE_DF_CAP,
) -> str:
    cold = (
        f"""cold AS (
  SELECT * FROM fps
  WHERE fp NOT IN (SELECT fp FROM fps GROUP BY fp HAVING count(*) > {df_cap})
),"""
        if df_cap is not None
        else "cold AS (SELECT * FROM fps),"
    )
    return f"""
WITH fps0 AS ({winnow_fingerprints_sql(window)}),
fps AS (SELECT DISTINCT doc_id, fp FROM fps0),
{cold}
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM cold a JOIN cold b ON a.fp = b.fp AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.d1, c.d2, count(*) AS n_shared
  FROM cand c
  JOIN fps fa ON fa.doc_id = c.d1
  JOIN fps fb ON fb.doc_id = c.d2 AND fb.fp = fa.fp
  GROUP BY 1, 2
)
SELECT d1, d2, n_shared::BIGINT AS n_shared
FROM inter WHERE n_shared >= {int(min_shared)}
"""


# ---------------------------------------------------------------------------
# Span-level (substring) dedup — "Deduplicating Training Data Makes
# Language Models Better" (Lee et al., ACL 2022): remove duplicated
# token SPANS across documents, not whole near-duplicate documents.
# A span is duplicated when its constituent word n-grams also occur in
# at least one other document; maximal runs of duplicated n-gram start
# positions are the spans.
# ---------------------------------------------------------------------------

SPAN_NGRAM_N = 5

# Global occurrence order is encoded as one int64 so the "first
# occurrence" winner is a plain MIN aggregate (map-side combinable,
# skew-safe on hot boilerplate grams) instead of a rank window keyed
# by gram (one giant partition per hot gram — the skew trap
# dup_ngram_stats documents). Valid for doc_id < 2^31, pos < 2^32.
_OCC_KEY = "CAST(doc_id AS BIGINT) * 4294967296 + pos"


def _gram_occurrences(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, pos, gram): every word n-gram occurrence with its
    1-based start position. One row per token position — the linear
    working set every downstream shuffle is sized by."""
    ws = docs.select("doc_id", F.split("text", " ").alias("ws"))
    grams = F.expr(
        f"CASE WHEN size(ws) < {n} THEN array() ELSE "
        f"transform(sequence(1, size(ws) - {n} + 1), "
        f"i -> concat_ws(' ', slice(ws, i, {n}))) END"
    )
    return ws.select(
        "doc_id", F.posexplode(grams).alias("pos0", "gram")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "gram")


def _gram_meta(occ: DataFrame) -> DataFrame:
    """(gram, gdf, leader_key): document frequency and the globally
    first occurrence per gram. Both are aggregates on the gram key —
    map-side combine collapses hot grams before the shuffle; no
    windows keyed by gram anywhere in the family."""
    gdf = (
        occ.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("gdf"))
    )
    leaders = occ.groupBy("gram").agg(F.expr(f"min({_OCC_KEY})").alias("leader_key"))
    return gdf.join(leaders, "gram")


def dup_span_extract(docs: DataFrame, n: int = SPAN_NGRAM_N) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens, n_shared_grams):
    maximal token spans whose every n-gram also appears in ≥1 other
    document — the extraction half of span-level dedup. Positions are
    1-based inclusive token indices.

    Shape: the occurrence table (one row per token position) flows
    through one gram-keyed aggregate + one join back (AQE-splittable
    probe side, exactly the dup_ngram_stats discipline); the
    gaps-and-islands merge is a row_number window partitioned by
    doc_id — bounded by document length, the scalable window axis."""
    occ = _gram_occurrences(docs, n)
    meta = _gram_meta(occ)
    dup_pos = occ.join(meta, "gram").filter(F.col("gdf") >= 2).select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup_pos.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + n - 1).cast("long").alias("span_end"),
        (F.max("pos") - F.min("pos") + n).cast("long").alias("span_tokens"),
        F.count("*").cast("long").alias("n_shared_grams"),
    ).select("doc_id", "span_start", "span_end", "span_tokens", "n_shared_grams")


# Merge sorted 1-based start positions of length-n runs into disjoint
# covered intervals (struct<lo,hi>, adjacency-merged): the fold is
# O(|starts| · |intervals|) and |intervals| ≤ |spans| ≪ L, so the
# per-token coverage test below is O(L · |intervals|) instead of the
# r11 shape's O(L · |starts|) — boilerplate-heavy long documents whose
# removable starts approach L no longer pay a quadratic projection.
def _intervals_expr(starts_col: str, n: int) -> str:
    new_iv = f"array(struct(s AS lo, s + {n} - 1 AS hi))"
    last = "element_at(acc, -1)"
    return (
        f"aggregate(array_sort({starts_col}), "
        f"CAST(array() AS ARRAY<STRUCT<lo: BIGINT, hi: BIGINT>>), "
        f"(acc, s) -> CASE WHEN size(acc) > 0 AND s <= {last}.hi + 1 "
        f"THEN concat(slice(acc, 1, size(acc) - 1), "
        f"array(struct({last}.lo AS lo, greatest({last}.hi, s + {n} - 1) AS hi))) "
        f"ELSE concat(acc, {new_iv}) END)"
    )


def remove_dup_spans(docs: DataFrame, n: int = SPAN_NGRAM_N) -> DataFrame:
    """(doc_id, n_tokens, n_removed, clean_text): drop every token
    covered by a cross-document-duplicated n-gram occurrence EXCEPT
    tokens belonging to a gram's globally first occurrence (min
    (doc_id, pos) — the keep-one policy of Lee et al.'s ExactSubstr
    dedup, deterministic and order-free).

    Leader occurrences are PROTECTED: a token covered by both a
    non-leader occurrence (of one gram) and a leader occurrence (of
    another) survives — otherwise removing a non-leader run could
    destroy the only kept copy of an overlapping gram whose leader
    lives in the same document (r11 advice: doc A holds gram g1's
    leader, doc B holds g1's copy AND g2's leader one token over —
    unprotected removal of g1's copy would delete g2 everywhere).
    Consequence: every duplicated gram survives AT LEAST once;
    "exactly once" holds when duplicated runs don't overlap leader
    runs of other grams (the common case, pinned by the planted
    corpus test; the overlap case is pinned by
    test_leader_occurrence_is_protected).

    The removable and protected start positions per document are
    collected into arrays (bounded by document length), folded into
    disjoint covered intervals, and the surviving text is rebuilt
    with array lambdas in a single projection — no per-token rows
    ever shuffle, and the rebuild is O(L · |intervals|)."""
    occ = _gram_occurrences(docs, n)
    meta = _gram_meta(occ)
    is_leader = F.expr(_OCC_KEY) == F.col("leader_key")
    rem = (
        occ.join(meta, "gram")
        .filter(F.col("gdf") >= 2)
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.when(~is_leader, F.col("pos"))).alias("sl"),
            F.collect_list(F.when(is_leader, F.col("pos"))).alias("ll"),
        )
    )
    kept = (
        "filter(sequence(1, size(ws)), t -> "
        "NOT (exists(riv, v -> v.lo <= t AND t <= v.hi) "
        "AND NOT exists(liv, v -> v.lo <= t AND t <= v.hi)))"
    )
    empty = "CAST(array() AS ARRAY<BIGINT>)"
    return (
        docs.join(rem, "doc_id", "left")
        .select(
            "doc_id",
            F.split("text", " ").alias("ws"),
            F.coalesce("sl", F.expr(empty)).alias("sl"),
            F.coalesce("ll", F.expr(empty)).alias("ll"),
        )
        .select(
            "doc_id",
            "ws",
            F.expr(_intervals_expr("sl", n)).alias("riv"),
            F.expr(_intervals_expr("ll", n)).alias("liv"),
        )
        .select(
            "doc_id",
            F.expr("CAST(size(ws) AS BIGINT)").alias("n_tokens"),
            F.expr(f"CAST(size(ws) - size({kept}) AS BIGINT)").alias("n_removed"),
            F.expr(
                f"concat_ws(' ', transform({kept}, t -> element_at(ws, t)))"
            ).alias("clean_text"),
        )
    )


def _span_ctes(n: int) -> str:
    """Shared DuckDB CTEs: positioned n-gram occurrences + per-gram
    document frequency and first-occurrence key (the Spark plan's
    _gram_occurrences/_gram_meta, re-derived from the raw table)."""
    return f"""
t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
occ AS (
  SELECT doc_id, s.pos AS pos, s.gram AS gram FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(ws) - {n} + 1, 0) + 1),
                  i -> struct_pack(pos := i,
                                   gram := array_to_string(ws[i : i + {n} - 1], ' ')))) AS s
    FROM t)
),
gmeta AS (
  SELECT g.gram, g.gdf, l.leader_key
  FROM (SELECT gram, count(*)::BIGINT AS gdf
        FROM (SELECT DISTINCT doc_id, gram FROM occ) GROUP BY gram) g
  JOIN (SELECT gram, min(doc_id * 4294967296 + pos) AS leader_key
        FROM occ GROUP BY gram) l USING (gram)
)"""


def dup_span_extract_sql(n: int = SPAN_NGRAM_N) -> str:
    return f"""
WITH {_span_ctes(n)},
dup_pos AS (
  SELECT o.doc_id, o.pos FROM occ o JOIN gmeta m USING (gram) WHERE m.gdf >= 2
),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dup_pos
)
SELECT doc_id,
       min(pos)::BIGINT AS span_start,
       (max(pos) + {n} - 1)::BIGINT AS span_end,
       (max(pos) - min(pos) + {n})::BIGINT AS span_tokens,
       count(*)::BIGINT AS n_shared_grams
FROM isl GROUP BY doc_id, grp
"""


def remove_dup_spans_sql(n: int = SPAN_NGRAM_N) -> str:
    # sl = non-leader duplicated-gram starts (removable), ll = leader
    # starts in the same doc (protected) — a token is dropped iff some
    # removable run covers it AND no leader run does (the Spark plan's
    # riv/liv interval semantics, stated per-token here: the oracle
    # trades the interval fold for clarity, not speed).
    return f"""
WITH {_span_ctes(n)},
rem AS (
  SELECT o.doc_id,
         list(o.pos) FILTER (WHERE o.doc_id * 4294967296 + o.pos <> m.leader_key) AS sl,
         list(o.pos) FILTER (WHERE o.doc_id * 4294967296 + o.pos = m.leader_key) AS ll
  FROM occ o JOIN gmeta m USING (gram)
  WHERE m.gdf >= 2
  GROUP BY o.doc_id
)
SELECT doc_id,
       len(ws)::BIGINT AS n_tokens,
       (len(ws) - len(kept))::BIGINT AS n_removed,
       coalesce(array_to_string(list_transform(kept, tt -> ws[tt]), ' '), '') AS clean_text
FROM (
  SELECT t.doc_id, t.ws,
         list_filter(range(1, len(t.ws) + 1),
                     tt -> len(list_filter(coalesce(r.sl, []),
                                           s -> s <= tt AND tt <= s + {n} - 1)) = 0
                           OR len(list_filter(coalesce(r.ll, []),
                                              s -> s <= tt AND tt <= s + {n} - 1)) > 0) AS kept
  FROM t LEFT JOIN rem r USING (doc_id)
)
"""
