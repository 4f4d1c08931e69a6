"""Lexical retrieval + rank fusion over the documents corpus.

The retrieval side of a training-data pipeline: given a query set
(derived deterministically from the corpus itself — every
``BM25_QUERY_STRIDE``-th document's most characteristic terms), rank
the whole corpus per query by

- **BM25** (Robertson/Spärck Jones Okapi weighting: term-frequency
  saturation + document-length normalization), and
- a plain **term-frequency** ranking (the "sparse baseline"),

then fuse rankings with **reciprocal-rank fusion** (Cormack, Clarke &
Büttcher, SIGIR'09): ``score(d) = Σ_lists 1/(K + rank_list(d))`` —
the standard way hybrid search combines lexical and dense lists
without score calibration.

Numeric convention (repo-wide): every hashed score is exact int64.
BM25's ``k1 = 1.2`` and ``b = 0.75`` are rational (6/5, 3/4), so the
per-term contribution

    idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

clears denominators exactly:

    contrib_ppm = (idf_ppm · 22 · avgdl · tf)
                  DIV (10·avgdl·tf + 3·avgdl + 9·dl)

and the classic log-idf (libm-unstable across engines) is replaced by
the bounded rational surrogate ``idf_ppm = 1e6·(N − df + 1) DIV
(N + df + 1)`` — monotone decreasing in df, ≤ 1e6 for ANY corpus
size, and identical under Spark ``DIV`` and DuckDB ``//``. The other
numerator factors are saturated (tf at 4e6, avgdl at 1e5 — both
unreachable on real documents, clamped identically on both engine
sides) so the int64 product provably cannot overflow for any input,
corpus-sized or pathological. No transcendentals anywhere in the
hashed output.

Distributed shape (no collects, no persists):
1. tokenize once per document, explode, map-side-combined
   ``groupBy(doc_id, term)`` → one (doc, term, tf) row per distinct
   pair enters the shuffle; document length rides along as a
   functionally-dependent grouping column.
2. corpus constants (N, avgdl) are ONE aggregate row, cross-joined
   (Catalyst broadcasts a single-row side).
3. df per term is a vocab-sized aggregate joined back on ``term`` —
   the AQE-skew-splittable shape (same rationale as tfidf_topk).
4. query terms are a per-query-document window (partitions bounded by
   one document's vocabulary) ranked by tf·idf — discriminative-term
   selection bounds the probe's candidate volume at Σ df(rare terms)
   per query instead of hot-term df ≈ corpus — then the qterms⋈pairs
   join probes the corpus pair table: build side is queries×terms,
   broadcastable when the query set is small, AQE-splittable when it
   is not.
5. per-(query, doc) scores are a map-side-combined sum of ≤
   ``BM25_QUERY_TERMS`` int64 contributions; top-k is a row_number
   window per query_id (millions of small partitions — the scalable
   window axis). Ties break (score desc, doc_id asc) so the cut is
   total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import STOPWORDS, _sql_list, tokens_expr

BM25_TOPK = 10
BM25_QUERY_STRIDE = 20
BM25_QUERY_TERMS = 3
RRF_K = 60

# Okapi BM25 with k1 = 6/5, b = 3/4, denominators cleared (see module
# docstring). Pure int64 end-to-end. idf_ppm ≤ 1e6 bounds one factor
# of the contribution numerator; the OTHER two are saturated so the
# full product provably fits int64 for ANY input (r11 advice: an
# unclamped avgdl·tf > ~4.2e11 — a pathologically long document —
# would wrap silently): tf saturates at 4e6 and avgdl at 1e5, giving
# 1e6 · 22 · 1e5 · 4e6 = 8.8e18 < 2^63−1. Both appear clamped in
# numerator AND denominator, so the ratio is the exact formula with
# saturated inputs — BM25's tf term is asymptotically flat in tf
# anyway (saturation is the point of k1), and the clamps are
# unreachable on any real document (4e6 occurrences of one term,
# 100k-token corpus-average length).
_TF_SAT = 4_000_000
_AVGDL_SAT = 100_000
_IDF_PPM = "CAST((n_docs - df + 1) * 1000000 DIV (n_docs + df + 1) AS BIGINT)"
_CONTRIB_PPM = (
    f"CAST((idf_ppm * 22 * least(avgdl, {_AVGDL_SAT}) * least(tf, {_TF_SAT}))"
    f" DIV (10 * least(avgdl, {_AVGDL_SAT}) * least(tf, {_TF_SAT})"
    f" + 3 * least(avgdl, {_AVGDL_SAT}) + 9 * dl) AS BIGINT)"
)


def _term_pairs(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, term, tf): per-document term frequencies with the
    document token length riding along (functionally dependent on
    doc_id, so adding it to the grouping key changes nothing)."""
    toks = docs.select(
        "doc_id", F.filter(tokens_expr("text"), lambda w: w != "").alias("ws")
    )
    return (
        toks.select(
            "doc_id", F.size("ws").cast("long").alias("dl"), F.explode("ws").alias("term")
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def _corpus_totals(docs: DataFrame) -> DataFrame:
    """One row: (n_docs, avgdl) — integer average document length.
    ``greatest(avgdl, 1)`` guards the all-empty-corpus denominator."""
    toks = docs.select(F.size(F.filter(tokens_expr("text"), lambda w: w != "")).alias("dl"))
    return toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.greatest(F.expr("CAST(sum(dl) DIV count(*) AS BIGINT)"), F.lit(1).cast("long")).alias(
            "avgdl"
        ),
    )


def _query_terms(
    pairs: DataFrame,
    dfs: DataFrame,
    totals: DataFrame,
    stride: int = BM25_QUERY_STRIDE,
    nterms: int = BM25_QUERY_TERMS,
) -> DataFrame:
    """(query_id, term): every stride-th document contributes its
    nterms most CHARACTERISTIC non-stopword terms — ranked by
    tf · idf_ppm (int64-exact), not raw tf — a deterministic
    more-like-this query set derived from the corpus itself (the same
    self-deriving convention as similarity.ann_cosine_topk's
    QUERY_STRIDE).

    The idf factor is load-bearing at scale, not cosmetic (r12, found
    by the sf1 probe): raw-tf selection picks whatever hot head terms
    a document repeats, and exact BM25 scoring of a hot term costs
    df(term) candidate rows — on a Zipf-headed corpus that degenerates
    to queries × corpus (the probe's 50k-doc corpus drove a ~125M-row
    score aggregate and a driver GC storm). tf·idf selection picks
    rare discriminative terms, bounding candidates at Σ df(rare) per
    query — the behavior a real more-like-this query generator has.
    The dfs/totals sides are vocab-sized and 1-row — broadcast."""
    w = Window.partitionBy("doc_id").orderBy(
        F.col("qscore").desc(), F.col("term").asc()
    )
    return (
        pairs.filter((F.col("doc_id") % stride == 0) & ~F.col("term").isin(*STOPWORDS))
        .join(dfs, "term")
        .crossJoin(F.broadcast(totals))
        .withColumn("qscore", F.expr(f"tf * {_IDF_PPM}"))
        .withColumn("qrnk", F.row_number().over(w))
        .filter(F.col("qrnk") <= nterms)
        .select(F.col("doc_id").alias("query_id"), "term")
    )


def bm25_topk(
    docs: DataFrame,
    k: int = BM25_TOPK,
    stride: int = BM25_QUERY_STRIDE,
    nterms: int = BM25_QUERY_TERMS,
) -> DataFrame:
    """(query_id, doc_id, score_ppm, rnk): top-k documents per derived
    query by exact-integer Okapi BM25 (self excluded).

    Physical plan (verified .explain): the pairs diamond resolves to
    THREE differently-pruned corpus scans rather than one reused
    exchange — deliberate. The qterms branch pushes the stride filter
    BELOW the tf aggregate (20× smaller partial agg), the dfs branch
    prunes ``dl`` and ``doc_id`` before its shuffle, and the probe
    branch keeps the full pair row; letting Catalyst prune each
    consumer beats forcing one fat reused shuffle because the pair
    exchange, not the tokenize scan, dominates at corpus scale.
    qterms/dfs/totals all arrive at the probe join as broadcasts
    (queries×terms, vocab, and 1 row respectively)."""
    pairs = _term_pairs(docs)
    totals = _corpus_totals(docs)
    dfs = pairs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    qterms = _query_terms(pairs, dfs, totals, stride, nterms)
    return _bm25_ranked(pairs, dfs, totals, qterms, k)


def _bm25_ranked(
    pairs: DataFrame, dfs: DataFrame, totals: DataFrame, qterms: DataFrame, k: int
) -> DataFrame:
    """The BM25 scoring core over prepared tables — shared by the
    direct path (tables derived from the raw corpus) and the
    index-served path (tables reconstructed from a saved inverted
    index); both must produce bit-identical rows."""
    hits = (
        qterms.join(pairs, "term")
        .join(dfs, "term")
        .crossJoin(F.broadcast(totals))
        .filter(F.col("doc_id") != F.col("query_id"))
        .withColumn("idf_ppm", F.expr(_IDF_PPM))
        .withColumn("contrib", F.expr(_CONTRIB_PPM))
    )
    scores = hits.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").cast("long").alias("score_ppm")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score_ppm").desc(), F.col("doc_id").asc())
    return (
        scores.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score_ppm", "rnk")
    )


def tf_match_topk(
    docs: DataFrame,
    k: int = BM25_TOPK,
    stride: int = BM25_QUERY_STRIDE,
    nterms: int = BM25_QUERY_TERMS,
) -> DataFrame:
    """(query_id, doc_id, tf_sum, rnk): the no-idf, no-length-norm
    sparse baseline — rank by summed raw term frequency of the query
    terms. Deliberately a DIFFERENT ranking than BM25 (a long spammy
    document wins here and loses under BM25), which is what makes the
    RRF fusion non-trivial."""
    pairs = _term_pairs(docs)
    totals = _corpus_totals(docs)
    dfs = pairs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    qterms = _query_terms(pairs, dfs, totals, stride, nterms)
    scores = (
        qterms.join(pairs, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("tf").cast("long").alias("tf_sum"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("tf_sum").desc(), F.col("doc_id").asc())
    return (
        scores.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "tf_sum", "rnk")
    )


def rrf_fuse(a: DataFrame, b: DataFrame, k: int = BM25_TOPK, kconst: int = RRF_K) -> DataFrame:
    """(query_id, doc_id, rrf_ppm, rnk): reciprocal-rank fusion of two
    (query_id, doc_id, ..., rnk) rankings —

        rrf_ppm = Σ_lists 1_000_000 DIV (kconst + rnk_list)

    (int64-exact; a document absent from a list contributes 0). The
    join is a full outer on (query_id, doc_id) — each side is already
    top-k-bounded (≤ k rows per query), so the fusion input is
    queries×2k rows no matter the corpus size."""
    ra = a.select("query_id", "doc_id", F.col("rnk").alias("rnk_a"))
    rb = b.select("query_id", "doc_id", F.col("rnk").alias("rnk_b"))
    fused = ra.join(rb, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_ppm",
        (
            F.coalesce(F.expr(f"CAST(1000000 DIV ({kconst} + rnk_a) AS BIGINT)"), F.lit(0))
            + F.coalesce(F.expr(f"CAST(1000000 DIV ({kconst} + rnk_b) AS BIGINT)"), F.lit(0))
        ).cast("long"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_ppm").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "rrf_ppm", "rnk")
    )


def retrieval_rrf(docs: DataFrame, k: int = BM25_TOPK, kconst: int = RRF_K) -> DataFrame:
    """(query_id, doc_id, rrf_ppm, rnk): the hybrid-retrieval headline
    — RRF of the BM25 list and the raw-tf list for the derived query
    set.

    SHARED pipeline (r11 verdict #3): calling ``bm25_topk`` +
    ``tf_match_topk`` would tokenize the corpus and pay the dominant
    pair exchange twice. The two rankings differ only in the score
    expression, so this builds ONE probe join (qterms ⋈ pairs ⋈ dfs ×
    totals) and ONE map-side-combined (query_id, doc_id) aggregate
    carrying BOTH sums, then ranks twice with windows over the same
    scores table — a single query_id exchange feeds both rank sorts
    (same partitioning → Catalyst plans one Exchange, two Sorts).
    Fusion needs no join at all: each (query_id, doc_id) row already
    holds both ranks, and the FULL OUTER of two top-k lists over the
    SAME candidate set is exactly ``rnk_a ≤ k OR rnk_b ≤ k`` (the df
    join is a no-op for the row set — every pair term has a df row —
    so both rankings see identical candidates). The deliberate trade:
    the rank windows lose WindowGroupLimit pruning (the disjunctive
    filter spans two windows), but the pruned quantity is the
    already-aggregated candidate table — orders smaller than the
    corpus pair exchange this shape halves. Plan-asserted by
    ``test_retrieval_rrf_shares_one_pair_aggregate``."""
    pairs = _term_pairs(docs)
    totals = _corpus_totals(docs)
    dfs = pairs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    qterms = _query_terms(pairs, dfs, totals)
    scores = (
        qterms.join(pairs, "term")
        .join(dfs, "term")
        .crossJoin(F.broadcast(totals))
        .filter(F.col("doc_id") != F.col("query_id"))
        .withColumn("idf_ppm", F.expr(_IDF_PPM))
        .withColumn("contrib", F.expr(_CONTRIB_PPM))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").cast("long").alias("score_ppm"),
            F.sum("tf").cast("long").alias("tf_sum"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.col("score_ppm").desc(), F.col("doc_id").asc())
    wb = Window.partitionBy("query_id").orderBy(F.col("tf_sum").desc(), F.col("doc_id").asc())
    fused = (
        scores.withColumn("rnk_a", F.row_number().over(wa).cast("long"))
        .withColumn("rnk_b", F.row_number().over(wb).cast("long"))
        .filter((F.col("rnk_a") <= k) | (F.col("rnk_b") <= k))
        .withColumn(
            "rrf_ppm",
            (
                F.expr(f"IF(rnk_a <= {k}, CAST(1000000 DIV ({kconst} + rnk_a) AS BIGINT), 0)")
                + F.expr(f"IF(rnk_b <= {k}, CAST(1000000 DIV ({kconst} + rnk_b) AS BIGINT), 0)")
            ).cast("long"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_ppm").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "rrf_ppm", "rnk")
    )


# ---------------------------------------------------------------------------
# Persisted lexical inverted index — the "build once, search many"
# posture of the vector-index lifecycle (S8/S9, engine.save/load)
# applied to the lexical side: a 100 TB retrieval system tokenizes
# its corpus ONCE into posting lists and serves every later query
# batch from the saved index, never re-reading raw text.
#
# Index layout (two parquet tables):
# - postings: (term, df, sum_tf, postings) — the posting list is a
#   canonical string "doc:tf,doc:tf,…" sorted by doc_id, making the
#   table flat-hashable (driver-comparable) and engine-portable; at
#   100 TB the table is vocabulary-keyed and parquet-partitionable by
#   term hash.
# - doclens: (doc_id, dl) — the per-document token length BM25's
#   normalization needs; corpus totals (n_docs, avgdl) re-derive from
#   it with one metadata-sized aggregate.
# `bm25_topk_from_index` reconstructs the (pairs, dfs, totals) tables
# from the index and runs the SAME scoring core as the direct path —
# the driver entry hash-checks the index-served result against the
# raw-recompute DuckDB oracle, proving tokenize→save→load→search
# end-to-end.
# ---------------------------------------------------------------------------

_POSTING_STR = (
    "concat_ws(',', transform(array_sort(collect_list(struct(doc_id, tf))), "
    "p -> concat(CAST(p.doc_id AS STRING), ':', CAST(p.tf AS STRING))))"
)


def term_postings(docs: DataFrame) -> DataFrame:
    """(term, df, sum_tf, postings): the inverted index as one
    gram-keyed aggregate over the pair table — map-side combinable
    into per-term rows; the posting string is canonical (doc_id-sorted
    via array_sort on the (doc_id, tf) struct, doc_id unique per
    term), so the output is deterministic and flat-hashable."""
    return (
        _term_pairs(docs)
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("sum_tf"),
            F.expr(_POSTING_STR).alias("postings"),
        )
    )


def doc_lengths(docs: DataFrame) -> DataFrame:
    """(doc_id, dl): per-document token length (all docs, empty ones
    included — n_docs/avgdl must match the direct path's count(*))."""
    return docs.select(
        "doc_id",
        F.size(F.filter(tokens_expr("text"), lambda w: w != "")).cast("long").alias("dl"),
    )


def save_lexical_index(docs: DataFrame, path: str) -> None:
    """Write the two index tables under ``path`` (postings/, doclens/)."""
    term_postings(docs).write.mode("overwrite").parquet(f"{path}/postings")
    doc_lengths(docs).write.mode("overwrite").parquet(f"{path}/doclens")


def load_lexical_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens) read back from ``path``."""
    return spark.read.parquet(f"{path}/postings"), spark.read.parquet(f"{path}/doclens")


def merge_postings(old: DataFrame, new: DataFrame) -> DataFrame:
    """Merge two posting tables whose document-id ranges are DISJOINT
    and ordered (append-only ingest: every new doc_id exceeds every
    old one — the caller guards this), so the canonical doc_id-sorted
    posting string of the union is simply ``old ,  new``: a full-outer
    term join with per-term integer arithmetic — the corpus is never
    re-tokenized and nothing re-sorts. ``concat_ws`` skips NULL sides,
    handling terms present in only one batch."""
    o = old.select(
        "term",
        F.col("df").alias("df_a"),
        F.col("sum_tf").alias("tf_a"),
        F.col("postings").alias("p_a"),
    )
    n = new.select(
        "term",
        F.col("df").alias("df_b"),
        F.col("sum_tf").alias("tf_b"),
        F.col("postings").alias("p_b"),
    )
    zero = F.lit(0).cast("long")
    return o.join(n, "term", "full_outer").select(
        "term",
        (F.coalesce("df_a", zero) + F.coalesce("df_b", zero)).cast("long").alias("df"),
        (F.coalesce("tf_a", zero) + F.coalesce("tf_b", zero)).cast("long").alias("sum_tf"),
        F.concat_ws(",", "p_a", "p_b").alias("postings"),
    )


def upsert_lexical_index(spark, src_path: str, new_docs: DataFrame, dst_path: str) -> None:
    """Append a new document batch to a saved index, writing the
    merged index to ``dst_path`` (immutable versioned dirs — the
    epoch-store convention; never an in-place overwrite of parquet
    being read). Loudly refuses interleaved id ranges: the O(1)
    posting-string merge is only canonical when every new doc_id
    exceeds every indexed one (append-only ingest). Both guards are
    metadata-sized aggregates (one row each)."""
    postings, doclens = load_lexical_index(spark, src_path)
    old_max = doclens.agg(F.max("doc_id")).collect()[0][0]
    new_min = new_docs.agg(F.min("doc_id")).collect()[0][0]
    if old_max is not None and new_min is not None and new_min <= old_max:
        raise ValueError(
            f"append-only upsert requires new doc_ids > indexed max "
            f"({new_min} <= {old_max}); re-ingest from scratch instead"
        )
    merged = merge_postings(postings, term_postings(new_docs))
    merged.write.mode("overwrite").parquet(f"{dst_path}/postings")
    doclens.unionByName(doc_lengths(new_docs)).write.mode("overwrite").parquet(
        f"{dst_path}/doclens"
    )


def _pairs_from_index(postings: DataFrame, doclens: DataFrame) -> DataFrame:
    """Reconstruct the (doc_id, dl, term, tf) pair table from posting
    strings: explode each list (output is exactly pair-table-sized,
    the explode is a projection — no shuffle) and join dl back on
    doc_id (AQE-splittable, same shape as the direct path's df
    join)."""
    exploded = (
        postings.select("term", F.explode(F.split("postings", ",")).alias("p"))
        .select("term", F.split("p", ":").alias("kv"))
        .select(
            "term",
            F.col("kv")[0].cast("long").alias("doc_id"),
            F.col("kv")[1].cast("long").alias("tf"),
        )
    )
    return exploded.join(doclens, "doc_id").select("doc_id", "dl", "term", "tf")


def bm25_topk_from_index(
    spark,
    path: str,
    k: int = BM25_TOPK,
    stride: int = BM25_QUERY_STRIDE,
    nterms: int = BM25_QUERY_TERMS,
) -> DataFrame:
    """(query_id, doc_id, score_ppm, rnk): BM25 top-k served entirely
    from a saved lexical index — raw text is never read. Must be
    bit-identical to ``bm25_topk`` on the corpus the index was built
    from (the driver entry hash-checks exactly that against the
    raw-recompute oracle)."""
    postings, doclens = load_lexical_index(spark, path)
    pairs = _pairs_from_index(postings, doclens)
    dfs = postings.select("term", "df")
    totals = doclens.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.greatest(
            F.expr("CAST(sum(dl) DIV count(*) AS BIGINT)"), F.lit(1).cast("long")
        ).alias("avgdl"),
    )
    qterms = _query_terms(pairs, dfs, totals, stride, nterms)
    return _bm25_ranked(pairs, dfs, totals, qterms, k)


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

_PAIRS_CTES = f"""
toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
),
pairs AS (
  SELECT doc_id, dl, term, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, len(ws)::BIGINT AS dl, unnest(ws) AS term FROM toks
  ) GROUP BY doc_id, dl, term
),
totals AS (
  SELECT count(*)::BIGINT AS n_docs,
         greatest((sum(len(ws)) // count(*))::BIGINT, 1) AS avgdl
  FROM toks
),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM pairs GROUP BY term),
qterms AS (
  SELECT doc_id AS query_id, term FROM (
    SELECT p.doc_id, p.term,
           row_number() OVER (
             PARTITION BY p.doc_id
             ORDER BY p.tf * ((t.n_docs - d.df + 1) * 1000000 // (t.n_docs + d.df + 1)) DESC,
                      p.term ASC) AS qrnk
    FROM pairs p JOIN dfs d USING (term) CROSS JOIN totals t
    WHERE p.doc_id % {BM25_QUERY_STRIDE} = 0 AND p.term NOT IN ({_sql_list(STOPWORDS)})
  ) WHERE qrnk <= {BM25_QUERY_TERMS}
)"""

_BM25_CTES = f"""{_PAIRS_CTES},
bm25_scores AS (
  SELECT q.query_id, p.doc_id,
         sum((((t.n_docs - d.df + 1) * 1000000 // (t.n_docs + d.df + 1))
              * 22 * least(t.avgdl, {_AVGDL_SAT}) * least(p.tf, {_TF_SAT}))
             // (10 * least(t.avgdl, {_AVGDL_SAT}) * least(p.tf, {_TF_SAT})
                 + 3 * least(t.avgdl, {_AVGDL_SAT}) + 9 * p.dl))::BIGINT AS score_ppm
  FROM qterms q
  JOIN pairs p USING (term)
  JOIN dfs d USING (term)
  CROSS JOIN totals t
  WHERE p.doc_id <> q.query_id
  GROUP BY q.query_id, p.doc_id
),
bm25_ranked AS (
  SELECT query_id, doc_id, score_ppm,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_ppm DESC, doc_id ASC)::BIGINT AS rnk
  FROM bm25_scores
),
tf_scores AS (
  SELECT q.query_id, p.doc_id, sum(p.tf)::BIGINT AS tf_sum
  FROM qterms q JOIN pairs p USING (term)
  WHERE p.doc_id <> q.query_id
  GROUP BY q.query_id, p.doc_id
),
tf_ranked AS (
  SELECT query_id, doc_id, tf_sum,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY tf_sum DESC, doc_id ASC)::BIGINT AS rnk
  FROM tf_scores
)"""


def bm25_topk_sql(k: int = BM25_TOPK) -> str:
    return f"""
WITH {_BM25_CTES}
SELECT query_id, doc_id, score_ppm, rnk FROM bm25_ranked WHERE rnk <= {k}
"""


def term_postings_sql() -> str:
    """DuckDB twin of `term_postings`: the canonical doc_id-sorted
    posting string via an ordered string_agg."""
    return f"""
WITH {_PAIRS_CTES}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS sum_tf,
       string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY term
"""


def retrieval_rrf_sql(k: int = BM25_TOPK, kconst: int = RRF_K) -> str:
    return f"""
WITH {_BM25_CTES},
la AS (SELECT query_id, doc_id, rnk FROM bm25_ranked WHERE rnk <= {k}),
lb AS (SELECT query_id, doc_id, rnk FROM tf_ranked WHERE rnk <= {k}),
fused AS (
  SELECT coalesce(la.query_id, lb.query_id) AS query_id,
         coalesce(la.doc_id, lb.doc_id) AS doc_id,
         (coalesce(1000000 // ({kconst} + la.rnk), 0)
          + coalesce(1000000 // ({kconst} + lb.rnk), 0))::BIGINT AS rrf_ppm
  FROM la FULL OUTER JOIN lb
    ON la.query_id = lb.query_id AND la.doc_id = lb.doc_id
)
SELECT query_id, doc_id, rrf_ppm, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_ppm DESC, doc_id ASC) AS rnk
  FROM fused
) WHERE rnk <= {k}
"""
