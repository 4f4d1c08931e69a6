"""Byte-pair-encoding tokenizer: distributed training + encoding.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.,
ACL 2016 — the algorithm behind GPT-2/SentencePiece-BPE vocabularies),
re-cut for Spark's execution model:

- The CORPUS-SIZED work — counting word occurrences — is one
  map-side-combined ``groupBy(word).count()``. This is the only step
  that ever touches all documents, and it is a single shuffle whose
  output is vocabulary-sized.
- The MERGE LOOP then runs over the vocabulary table only (the
  standard shape: HuggingFace ``tokenizers`` trains exactly this way —
  corpus → word counts → in-memory merge loop). Below
  ``BPE_LOCAL_VOCAB`` distinct words the loop runs on the driver
  (bounded collect, the dedup_clusters/nndescent cost-gate
  convention); above it, or when forced with ``local_vocab=0``, the
  same loop runs distributed — each iteration is a pair-count
  aggregate over the symbol table plus an Arrow-batched merge
  application (both vocabulary-sized jobs; the corpus is never
  re-read). The two paths are pinned equal by tests.
- ENCODING applies the learned merge ranks per document inside
  ``mapInPandas`` — the legitimate Python-UDF case (a data-dependent
  iterative per-word reduction no Catalyst expression can state),
  Arrow-batched, embarrassingly parallel over document partitions.

Determinism: merge selection orders by (pair count DESC, left ASC,
right ASC); merges stop early when no pair repeats. No floats
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_MERGES = 48
BPE_LOCAL_VOCAB = 2_000_000  # ≈ a few hundred MB of (word, count) rows


def _word_counts(docs: DataFrame) -> DataFrame:
    """(word, cnt): the one corpus-sized aggregation."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _merge_word(syms: list[str], left: str, right: str) -> list[str]:
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_local(words: list[tuple[list[str], int]], n_merges: int):
    """The classic in-memory loop over (symbol-list, count) rows."""
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (left, right), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if best < 2:
            break
        merges.append((rank, left, right, best))
        words = [(_merge_word(s, left, right), c) for s, c in words]
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    local_vocab: int | None = BPE_LOCAL_VOCAB,
) -> DataFrame:
    """(rank, left, right, pair_count): the learned merge table, rank
    ascending in training order. Symbols start as single characters of
    each whitespace word (no end-of-word marker — documented
    simplification; the FORM of the operator is the deliverable)."""
    spark = docs.sparkSession
    schema = "rank long, left string, right string, pair_count long"
    # persist-count-act-unpersist (the dedup_clusters convention): the
    # corpus-sized tokenize+aggregate runs ONCE; the gate's count, the
    # local collect, and the distributed path's symbol materialization
    # all read the cached vocabulary table
    owned = _word_counts(docs).persist()
    try:
        if local_vocab is None or (local_vocab > 0 and owned.count() <= local_vocab):
            rows = owned.collect()  # bounded: n_vocab ≤ local_vocab
            merges = _train_local([(list(r["word"]), r["cnt"]) for r in rows], n_merges)
            return spark.createDataFrame(
                [(int(r), l, rt, int(c)) for r, l, rt, c in merges], schema
            )
        syms_tbl = owned.select(
            F.expr("filter(split(word, ''), ch -> ch <> '')").alias("syms"), "cnt"
        ).localCheckpoint(eager=True)
    finally:
        owned.unpersist()
    return _train_distributed(syms_tbl, n_merges, schema)


def _train_distributed(syms_tbl: DataFrame, n_merges: int, schema: str) -> DataFrame:
    """Same loop, never collecting the vocabulary: per iteration one
    adjacent-pair aggregate (map-side combined; result is pair-space
    sized, only the argmax row reaches the driver) and one
    Arrow-batched merge application over the symbol table. O(n_merges)
    vocabulary-sized jobs, zero corpus re-reads (the caller
    checkpointed the symbol table off the corpus lineage)."""
    spark = syms_tbl.sparkSession
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            syms_tbl.select(
                F.explode(
                    F.expr(
                        "CASE WHEN size(syms) < 2 THEN array() ELSE "
                        "transform(sequence(0, size(syms) - 2), "
                        "i -> struct(syms[i] AS l, syms[i+1] AS r)) END"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
        )
        top = pairs.orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc()).limit(1).collect()
        if not top or top[0]["c"] < 2:
            break
        left, right, best = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rank, left, right, best))

        def apply_merge(batches, left=left, right=right):
            import pandas as pd

            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = [
                    _merge_word(list(s), left, right) for s in pdf["syms"]
                ]
                yield pdf

        # localCheckpoint keeps lineage O(1) deep across iterations
        # (the nndescent convention for iterative DataFrame loops)
        syms_tbl = syms_tbl.mapInPandas(
            apply_merge, "syms array<string>, cnt long"
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        [(int(r), l, rt, int(c)) for r, l, rt, c in merges], schema
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins. The merge loop is deterministic with a FIXED
# n_merges (BPE_MERGES), so it unrolls into a static CTE chain: per
# iteration one adjacent-pair aggregate over the vocabulary, one argmax
# row ((count DESC, left ASC, right ASC) — exactly `_train_local`'s
# key; DuckDB's binary collation ≡ Python's code-point compare), and
# one merge application. The merge application uses a bracketed-string
# encoding: a word's symbol list [s1..sn] is stored as
# \x01s1\x02\x01s2\x02…, so SQL `replace(s, \x01L\x02\x01R\x02,
# \x01LR\x02)` is EXACTLY `_merge_word`'s leftmost-non-overlapping
# scan — the full brackets make boundary sharing impossible ([a,a,a]
# merges to [aa,a], never [aa,aa] shifted) and a symbol can never
# match inside another symbol (\x01 only ever precedes a symbol
# start). Requires \x01\x02\x03 absent from the corpus (true for the
# test tables; a mismatch would fail the driver's hash loudly, not
# silently).
#
# The encode oracle rides the same chain: training applies every
# selected merge to every vocabulary word (rank order, leftmost
# non-overlapping), and that sequential application equals
# `_encode_word`'s priority encode whenever no two merges produce the
# same output string — a higher-rank merge can only enable an
# earlier-rank one if its output string collides with a component
# symbol of the earlier merge, and component symbols are themselves
# single chars (length 1 < 2) or outputs of still-earlier merges.
# `tests/test_bpe.py::test_priority_encode_equals_final_train_state`
# pins both the distinctness premise and the equivalence on the test
# corpus. So per-word BPE token count = symbol count (\x01 count) of
# the word's final training-state string.
# ---------------------------------------------------------------------------

_BL, _BR, _SEP = "chr(1)", "chr(2)", "chr(3)"  # bracket-left/right, pair joiner


def _merge_loop_ctes(n_merges: int) -> str:
    """The shared unrolled CTE chain: w0 (vocab as bracketed strings)
    through w{n}, with per-iteration pair aggregate p{i} and argmax
    b{i}. Every CTE is MATERIALIZED — w{i} is referenced twice (pair
    scan + next state) and inlining would re-expand the whole chain
    per reference. An exhausted corpus (no pair repeats) makes b{i}
    empty and w{i+1} pass through unchanged — same early-stop rows as
    `_train_local`'s `best < 2` break."""
    L, R, J = _BL, _BR, _SEP
    ctes = [
        f"""w0 AS MATERIALIZED (
  SELECT word, {L} || array_to_string(string_split(word, ''), {R}||{L}) || {R} AS s,
         count(*)::BIGINT AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word)"""
    ]
    for i in range(n_merges):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT string_split(pr, {J})[1] AS l, string_split(pr, {J})[2] AS r, sum(cnt)::BIGINT AS c
  FROM (SELECT unnest(CASE WHEN len(syms) < 2 THEN [] ELSE
           list_transform(generate_series(1, len(syms)-1), i -> syms[i] || {J} || syms[i+1]) END) AS pr, cnt
        FROM (SELECT string_split(substr(s, 2, length(s)-2), {R}||{L}) AS syms, cnt FROM w{i}))
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""b{i} AS MATERIALIZED (
  SELECT l, r, c FROM p{i} WHERE c >= 2 ORDER BY c DESC, l ASC, r ASC LIMIT 1)"""
        )
        ctes.append(
            f"""w{i + 1} AS MATERIALIZED (
  SELECT w.word, CASE WHEN b.l IS NULL THEN w.s
    ELSE replace(w.s, {L}||b.l||{R}||{L}||b.r||{R}, {L}||b.l||b.r||{R}) END AS s, w.cnt
  FROM w{i} w LEFT JOIN b{i} b ON TRUE)"""
        )
    return ",\n".join(ctes)


def bpe_train_sql(n_merges: int = BPE_MERGES) -> str:
    """DuckDB twin of `bpe_train` on the `documents` view."""
    union = "\nUNION ALL\n".join(
        f'SELECT {i}::BIGINT AS rank, l AS "left", r AS "right", c AS pair_count FROM b{i}'
        for i in range(n_merges)
    )
    return f"WITH {_merge_loop_ctes(n_merges)}\n{union}"


def bpe_encode_counts_sql(n_merges: int = BPE_MERGES) -> str:
    """DuckDB twin of `bpe_encode_counts(docs, bpe_train(docs))`:
    per-word token count = \\x01 count of the final training-state
    string (sequential ≡ priority encode; see module comment), then
    one per-doc aggregation. Zero-word docs still emit a (0, 0) row."""
    L = _BL
    return f"""WITH {_merge_loop_ctes(n_merges)},
per_word AS MATERIALIZED (
  SELECT word, (length(s) - length(replace(s, {L}, '')))::BIGINT AS n_syms FROM w{n_merges}),
dw AS (
  SELECT doc_id, word FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''),
agg AS (
  SELECT dw.doc_id, count(*)::BIGINT AS nw, sum(per_word.n_syms)::BIGINT AS nb
  FROM dw JOIN per_word USING (word) GROUP BY dw.doc_id)
SELECT d.doc_id, coalesce(agg.nw, 0)::BIGINT AS n_ws_tokens, coalesce(agg.nb, 0)::BIGINT AS n_bpe_tokens
FROM documents d LEFT JOIN agg USING (doc_id)"""


def _encode_word(word: str, rank_of: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE encode: repeatedly apply the lowest-rank applicable
    merge until none applies."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = rank_of.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_counts(docs: DataFrame, merges: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens): encode every document with
    the learned merge ranks and report token counts — the
    sequence-length accounting a packing/budgeting pipeline needs.

    The merge table is collected (it is n_merges rows — a constant)
    and closure-broadcast into an Arrow-batched ``mapInPandas``; the
    corpus streams through in one pass, embarrassingly parallel."""
    rank_of = {
        (r["left"], r["right"]): int(r["rank"]) for r in merges.collect()
    }  # bounded: n_merges rows

    def enc(batches):
        import pandas as pd

        cache: dict[str, int] = {}
        for pdf in batches:
            n_ws, n_bpe = [], []
            for text in pdf["text"]:
                words = [w for w in text.split(" ") if w != ""]
                total = 0
                for w in words:
                    if w not in cache:
                        cache[w] = len(_encode_word(w, rank_of))
                    total += cache[w]
                n_ws.append(len(words))
                n_bpe.append(total)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_ws_tokens": n_ws, "n_bpe_tokens": n_bpe}
            )

    return docs.select("doc_id", "text").mapInPandas(
        enc, "doc_id long, n_ws_tokens long, n_bpe_tokens long"
    )
