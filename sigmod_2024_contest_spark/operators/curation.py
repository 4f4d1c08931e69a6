"""End-to-end corpus curation — the composition every training-data
pipeline actually ships: near-dup detection → duplicate clustering →
canonical selection → quality filtering → held-out split assignment,
as ONE DataFrame pipeline.

Each stage is an already-verified operator from this package
(``dedup.jaccard_pairs``, ``dedup.dedup_clusters``,
``functions.text.text_stats``, ``sampling.split_expr``) — this module
adds the joins that turn them into a curated training set, and a
single composed SQL oracle so the WHOLE pipeline is hash-checked
end-to-end, not just its pieces.

No reference counterpart (the reference is a vector-search engine);
this is the beyond-the-reference training-pipeline surface (SURVEY
§7.5) exercised as a composition.

Scale posture: inherits each stage's — candidate-bounded pair
generation (hot-shingle df cap), cost-based connected components,
projection-only quality stats and split hashing. The only NEW shuffles
are the canonical anti-join (|clusters| rows, bounded by the duplicate
count, not the corpus) and one broadcast-sized join of the kept set
against per-doc stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import TEXT_STATS_SQL, text_stats, tokens_expr
from .dedup import JACCARD_TAU_PPM, dedup_clusters, jaccard_pairs, jaccard_pairs_sql
from .sampling import PPM, _SPLIT_TAG, split_expr
from .dedup import _hash48_sql

# Keep docs whose combined quality score clears this bar (the standard
# length/redundancy/stopword combination from text_stats, in ppm).
QUALITY_BAR_PPM = 500_000


def curate_corpus(
    docs: DataFrame,
    tau_ppm: int = JACCARD_TAU_PPM,
    quality_bar_ppm: int = QUALITY_BAR_PPM,
    val_ppm: int = 100_000,
    test_ppm: int = 100_000,
    force_distributed_cc: bool = False,
) -> DataFrame:
    """(doc_id, cluster_id, quality_ppm, split) for the CURATED corpus:
    one canonical doc per near-duplicate cluster (smallest doc_id —
    ``dedup_clusters``'s label), quality ≥ the bar, deterministic
    train/val/test assignment that never changes when the corpus does.

    ``force_distributed_cc`` pins the clustering stage's large-corpus
    twin (the O(log d) pointer-jumping join loop) regardless of pair
    count — the A/B handle proving the composed pipeline's 100 TB plan
    produces row-identical output to the driver-CC plan."""
    pairs = jaccard_pairs(docs, tau_ppm=tau_ppm)
    clusters = dedup_clusters(pairs, force_distributed=force_distributed_cc)
    canon = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    kept = canon.filter(F.col("doc_id") == F.col("cluster_id"))
    stats = text_stats(docs).select("doc_id", "quality_ppm")
    return (
        kept.join(stats, "doc_id")
        .filter(F.col("quality_ppm") >= quality_bar_ppm)
        .select(
            "doc_id",
            "cluster_id",
            "quality_ppm",
            split_expr(F.col("doc_id"), val_ppm, test_ppm).alias("split"),
        )
    )


def curate_corpus_sql(
    tau_ppm: int = JACCARD_TAU_PPM,
    quality_bar_ppm: int = QUALITY_BAR_PPM,
    val_ppm: int = 100_000,
    test_ppm: int = 100_000,
) -> str:
    """The composed oracle: the same four stages as one SQL statement
    (jaccard pairs CTE → recursive-CTE components → canonical keep →
    quality join + hash split)."""
    split_key = f"'{_SPLIT_TAG}' || k.doc_id::VARCHAR"
    pb = f"({_hash48_sql(split_key)}) % {PPM}"
    return f"""
WITH RECURSIVE
pairs AS ({jaccard_pairs_sql(tau_ppm)}),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2, d1 FROM pairs
),
reach AS (
  SELECT a AS node, b AS r FROM edges
  UNION
  SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a
),
clusters AS (
  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
  FROM reach GROUP BY node
),
stats AS ({TEXT_STATS_SQL}),
canon AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
),
kept AS (SELECT * FROM canon WHERE doc_id = cluster_id)
SELECT k.doc_id, k.cluster_id, s.quality_ppm,
       CASE WHEN {pb} < {test_ppm} THEN 'test'
            WHEN {pb} < {test_ppm + val_ppm} THEN 'val'
            ELSE 'train' END AS split
FROM kept k JOIN stats s ON s.doc_id = k.doc_id
WHERE s.quality_ppm >= {quality_bar_ppm}
"""


def dedup_keep_best(
    docs: DataFrame,
    tau_ppm: int = JACCARD_TAU_PPM,
    force_distributed_cc: bool = False,
) -> DataFrame:
    """(doc_id, cluster_id, logit_ppm, keep): near-duplicate clusters
    with the HIGHEST-QUALITY member kept — the keep-best curation
    policy (curate_corpus keeps the smallest doc_id; real pipelines
    keep the best-scoring copy of each near-dup group and drop the
    rest).

    Composition: jaccard pairs → connected components (both existing,
    scale-audited ops) → left join back to the corpus so singletons
    form their own clusters → quality via the linear classifier →
    row_number over the cluster partition ordered (logit desc, doc_id
    asc). Clusters are near-dup groups — bounded and numerous — so the
    window partitions along the scalable axis (like tfidf's per-doc
    top-k), never a corpus-wide sort."""
    from ..functions.text import quality_classifier

    pairs = jaccard_pairs(docs, tau_ppm=tau_ppm)
    clusters = dedup_clusters(pairs, force_distributed=force_distributed_cc)
    members = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    scored = members.join(quality_classifier(docs).select("doc_id", "logit_ppm"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("logit_ppm").desc(), F.col("doc_id").asc()
    )
    return scored.select(
        "doc_id",
        "cluster_id",
        "logit_ppm",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def dedup_keep_best_sql(tau_ppm: int = JACCARD_TAU_PPM) -> str:
    from ..functions.text import quality_classifier_sql

    return f"""
WITH RECURSIVE
pairs AS ({jaccard_pairs_sql(tau_ppm)}),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2, d1 FROM pairs
),
reach AS (
  SELECT a AS node, b AS r FROM edges
  UNION
  SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a
),
clusters AS (
  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
  FROM reach GROUP BY node
),
members AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
),
q AS ({quality_classifier_sql()}),
scored AS (
  SELECT m.doc_id, m.cluster_id, q.logit_ppm
  FROM members m JOIN q ON q.doc_id = m.doc_id
)
SELECT doc_id, cluster_id, logit_ppm,
       row_number() OVER (PARTITION BY cluster_id
                          ORDER BY logit_ppm DESC, doc_id ASC) = 1 AS keep
FROM scored
"""


# ---------------------------------------------------------------------------
# Sequence packing — training-batch assembly
# ---------------------------------------------------------------------------

PACK_BUDGET_TOKENS = 2048
_PACK_TAG = "pack:"

# Bucket fan-out is corpus-derived (the same medicine ``n_planes_for``
# gave the LSH plane counts — r4 verdict #4): smallest power of two
# with total tokens/bucket ≤ PACK_TOKENS_PER_BUCKET, bounded to
# [2^2, 2^24]. Each bucket is ONE window-sort stream through one task,
# so tokens/bucket — and with it the single-task sort — stays constant
# as the corpus grows instead of scaling linearly with it (the r4
# fixed-64 weakness). Integer compares only; the SQL oracle derives
# the identical count from the same whitespace token sum.
PACK_TOKENS_PER_BUCKET = 8192
PACK_BUCKETS_LOG2_MIN, PACK_BUCKETS_LOG2_MAX = 2, 24


def n_pack_buckets(total_tokens: int) -> int:
    b = PACK_BUCKETS_LOG2_MIN
    while b < PACK_BUCKETS_LOG2_MAX and total_tokens > (PACK_TOKENS_PER_BUCKET << b):
        b += 1
    return 1 << b


def n_pack_buckets_cte(table: str = "documents") -> str:
    """One-row CTE body (alias it ``packnb``) deriving the bucket count
    from the corpus token total — the SQL twin of
    :func:`n_pack_buckets`, bit-identical across engines."""
    whens = " ".join(
        f"WHEN tot <= {PACK_TOKENS_PER_BUCKET << b} THEN {1 << b}"
        for b in range(PACK_BUCKETS_LOG2_MIN, PACK_BUCKETS_LOG2_MAX)
    )
    return (
        f"SELECT CASE {whens} ELSE {1 << PACK_BUCKETS_LOG2_MAX} END AS nb "
        f"FROM (SELECT sum(len(string_split(text, ' '))) AS tot FROM {table})"
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = PACK_BUDGET_TOKENS,
    buckets: int | None = None,
) -> DataFrame:
    """(doc_id, bucket, pack_id, start_offset, n_tokens): concat-and-
    chunk sequence packing — the batch-assembly step of an LLM
    pretraining pipeline. Documents hash into ``buckets`` independent
    streams; within a bucket they concatenate in deterministic
    (doc_id) order and chunk boundaries fall every ``budget`` tokens.
    A document's pack is the chunk holding its first token;
    start_offset is its position inside that chunk.

    ``buckets=None`` (default) derives the fan-out from the corpus
    token total (:func:`n_pack_buckets` — one bounded-scalar agg job);
    pass an explicit count to pin it (tests, resuming an existing
    packing layout).

    Scale shape: the ONLY wide operation is a window cumsum
    partitioned by bucket — B independent sorted streams, no global
    ordering, no driver state. Buckets grow with the corpus (constant
    tokens/bucket), and a document's (bucket, order) never changes
    when other buckets grow, so packing is stable under corpus growth
    within a bucket stream at a fixed bucket count. Token counts use
    the whitespace tokenizer (``text.token_counts``'s n_ws_tokens) —
    swap in a real tokenizer upstream by adding an n_tokens column;
    everything downstream is integer arithmetic both engines reproduce
    exactly."""
    from pyspark.sql import Window

    from .dedup import _hash48_expr

    if buckets is None:
        total = docs.agg(
            F.sum(F.size(F.split("text", " ")).cast("long")).alias("tot")
        ).collect()[0]["tot"]
        buckets = n_pack_buckets(int(total or 0))
    t = docs.select(
        "doc_id",
        F.pmod(
            _hash48_expr(F.concat(F.lit(_PACK_TAG), F.col("doc_id").cast("string"))),
            F.lit(buckets),
        ).alias("bucket"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return t.select(
        "doc_id",
        "bucket",
        F.floor(start / budget).cast("long").alias("pack_id"),
        (start - F.floor(start / budget) * budget).cast("long").alias("start_offset"),
        "n_tokens",
    )


def pack_sequences_sql(
    budget: int = PACK_BUDGET_TOKENS, buckets: int | None = None
) -> str:
    pack_key = f"'{_PACK_TAG}' || doc_id::VARCHAR"
    nb = str(buckets) if buckets is not None else "(SELECT nb FROM packnb)"
    bkt = f"({_hash48_sql(pack_key)}) % {nb}"
    return f"""
WITH packnb AS ({n_pack_buckets_cte()}),
t AS (
  SELECT doc_id, {bkt} AS bucket,
         len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, bucket, n_tokens,
         sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start
  FROM t
)
SELECT doc_id, bucket,
       (start // {budget})::BIGINT AS pack_id,
       (start - (start // {budget}) * {budget})::BIGINT AS start_offset,
       n_tokens
FROM c
"""


# ---------------------------------------------------------------------------
# Context-window chunking — long-document splitting
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_tok, chunk_text): sliding
    context-window chunking — the other half of training-batch
    assembly next to :func:`pack_sequences` (that op concatenates
    short docs up to the budget; this one splits docs longer than the
    window). Windows start every ``chunk_tokens - overlap`` tokens
    (1-based), the last window may be short, and every token of the
    document is covered.

    Scale shape: a pure projection + explode — per-doc work with no
    shuffle anywhere; output volume is input tokens × (1 + overlap /
    stride), bounded by the overlap ratio. All outputs are integers
    and substrings of the input, so the DuckDB oracle hash-matches
    exactly (whitespace tokens via the same single-space split the
    rest of the text ops use; swap in a real tokenizer upstream by
    materializing a token-array column)."""
    stride = max(int(chunk_tokens) - int(overlap), 1)
    s = docs.select(
        "doc_id", tokens_expr("text").alias("ws")
    ).select(
        "doc_id",
        "ws",
        F.size("ws").alias("n"),
        F.explode(F.expr(f"sequence(1, size(ws), {stride})")).alias("start"),
    )
    return s.select(
        "doc_id",
        F.expr(f"(start - 1) DIV {stride} + 1").cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start_tok"),
        F.least(
            F.lit(int(chunk_tokens)), F.col("n") - F.col("start") + 1
        ).cast("long").alias("n_tok"),
        F.array_join(
            F.slice(F.col("ws"), F.col("start"), F.lit(int(chunk_tokens))), " "
        ).alias("chunk_text"),
    )


def chunk_documents_sql(
    chunk_tokens: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP
) -> str:
    """DuckDB twin of :func:`chunk_documents` over the documents table."""
    stride = max(int(chunk_tokens) - int(overlap), 1)
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
s AS (
  SELECT doc_id, ws, len(ws) AS n,
         unnest(range(1, len(ws) + 1, {stride})) AS start
  FROM t
)
SELECT doc_id,
       ((start - 1) // {stride} + 1)::BIGINT AS chunk_id,
       start::BIGINT AS start_tok,
       least({int(chunk_tokens)}, n - start + 1)::BIGINT AS n_tok,
       array_to_string(list_slice(ws, start, least(start + {int(chunk_tokens)} - 1, n)), ' ') AS chunk_text
FROM s
"""
