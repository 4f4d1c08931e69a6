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
    doc_id == canonical_id to materialize the deduplicated corpus."""
    w = Window.partitionBy("text")
    return docs.select(
        "doc_id", F.min("doc_id").over(w).cast("long").alias("canonical_id")
    )


DEDUP_EXACT_SQL = """
SELECT doc_id, CAST(min(doc_id) OVER (PARTITION BY text) AS BIGINT) AS canonical_id
FROM documents
"""


# ---------------------------------------------------------------------------
# Word dictionary + shingles (shared substrate)
# ---------------------------------------------------------------------------
# Word ids come from a rank over the sorted global vocabulary — a tiny
# dimension table (broadcast at scale) that makes every downstream hash
# engine-portable. Shingle key = ((w1·V)+w2)·V+w3 (collision-free).


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, skey) — distinct 3-word shingle keys per document."""
    toks = docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    vocab = (
        toks.select("w")
        .distinct()
        .select("w", F.row_number().over(Window.orderBy("w")).cast("long").alias("wid"))
    )
    v_size = vocab.count()
    wids = (
        toks.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "wid"))), lambda x: x.wid
            ).alias("wids")
        )
    )
    v = F.lit(v_size)
    keys = wids.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("wids") - 3),
                    lambda i: (
                        (F.element_at(F.col("wids"), i + 1) * v + F.element_at(F.col("wids"), i + 2))
                        * v
                        + F.element_at(F.col("wids"), i + 3)
                    ).cast("long"),
                )
            )
        ).alias("skey"),
    )
    return keys


_SHINGLES_CTE = """
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
vocab AS (
  SELECT w, row_number() OVER (ORDER BY w) AS wid FROM (SELECT DISTINCT w FROM toks)
),
vsize AS (SELECT count(*)::BIGINT AS v FROM vocab),
wids AS (
  SELECT t.doc_id, list(vocab.wid ORDER BY t.pos) AS wids
  FROM toks t JOIN vocab ON vocab.w = t.w
  GROUP BY t.doc_id
),
shingles AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(wids) - 1),
           i -> ((wids[i] * v + wids[i+1]) * v + wids[i+2])::BIGINT))) AS skey
  FROM wids, vsize
)
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup join
# ---------------------------------------------------------------------------


def jaccard_pairs(docs: DataFrame, tau_ppm: int = JACCARD_TAU_PPM) -> DataFrame:
    """(d1, d2, jaccard_ppm) for pairs with 3-shingle Jaccard ≥ τ.

    Inverted-index join: pairs are generated only through shared
    shingles, never enumerated. The τ filter compares integers
    (inter·1e6 ≥ τppm·union) — no float in the cut."""
    sh = _doc_shingles(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.skey") == F.col("b.skey")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
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


def jaccard_pairs_sql(tau_ppm: int = JACCARD_TAU_PPM) -> str:
    return f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
  FROM shingles a JOIN shingles b ON a.skey = b.skey AND a.doc_id < b.doc_id
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


def minhash_lsh_pairs(docs: DataFrame, tau_ppm: int = JACCARD_TAU_PPM) -> DataFrame:
    """(d1, d2, jaccard_ppm): LSH-banded candidate generation +
    exact-Jaccard verification.

    12 portable hashes ((aᵢ·skey+bᵢ) mod p) → 4 bands × 3 rows; docs
    sharing any band signature become candidates; candidates are
    verified exactly. At 100 TB the band join is the only shuffle and
    its key space (band, sig) is uniformly spread by construction."""
    sh = _doc_shingles(docs)
    spark = docs.sparkSession
    params = spark.createDataFrame(
        [(i, HASH_A[i], HASH_B[i]) for i in range(N_HASHES)], "i int, a long, b long"
    )
    sigs = (
        sh.crossJoin(F.broadcast(params))
        .select(
            "doc_id",
            "i",
            ((F.col("a") * F.col("skey") + F.col("b")) % MOD).alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("mh"))
        .withColumn("band", F.floor(F.col("i") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("i", "mh"))),
                    lambda x: x.mh.cast("string"),
                ),
            ).alias("sig")
        )
    )
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
    verified = jaccard_pairs(docs, tau_ppm)
    return cands.join(verified, ["d1", "d2"])


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
    SELECT s.doc_id, p.i, min((p.a * s.skey + p.b) % {MOD}) AS mh
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
    """(doc_id, simhash): 32-bit SimHash over word multisets with
    portable word hashes. Near-dups cluster by equal (or Hamming-close)
    values; grouping by the hash is the dedup blocking step."""
    spark = docs.sparkSession
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = (
        toks.select("w")
        .distinct()
        .select("w", F.row_number().over(Window.orderBy("w")).cast("long").alias("wid"))
    )
    counts = toks.join(vocab, "w").groupBy("doc_id", "wid").agg(F.count("*").alias("cnt"))
    g = (F.lit(SIM_A) * F.col("wid") + F.lit(SIM_B)) % MOD
    bits = spark.range(SIM_BITS).select(
        F.col("id").cast("int").alias("j"), F.pow(F.lit(2.0), F.col("id")).cast("long").alias("p2")
    )
    contrib = (
        counts.withColumn("g", g)
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
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
vocab AS (
  SELECT w, row_number() OVER (ORDER BY w) AS wid FROM (SELECT DISTINCT w FROM toks)
),
counts AS (
  SELECT t.doc_id, v.wid, count(*) AS cnt FROM toks t JOIN vocab v ON v.w = t.w
  GROUP BY 1, 2
),
bits AS (SELECT j, CAST(power(2, j) AS BIGINT) AS p2 FROM (SELECT unnest(range(0, {SIM_BITS})) AS j)),
contrib AS (
  SELECT doc_id, j, p2,
         sum((((({SIM_A} * wid + {SIM_B}) % {MOD}) // p2) % 2 * 2 - 1) * cnt) AS s
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
    similarity.py) keep the join off the O(n²) pair space."""
    from ..functions.distance import cosine_sim_expr

    a = emb.alias("a")
    b = emb.alias("b")
    tau = tau_ppm / 1e6
    pairs = a.join(
        b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id"))
    ).select(
        F.col("a.vec_id").alias("d1"),
        F.col("b.vec_id").alias("d2"),
        cosine_sim_expr(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= tau).select(
        "d1", "d2", F.floor(F.col("cos") * 1e6).cast("long").alias("cos_ppm")
    )


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
