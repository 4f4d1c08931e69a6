"""BM25 + reciprocal-rank-fusion retrieval (functions/retrieval.py).

A planted corpus where every ranking decision is hand-checkable, plus
an independent pure-Python reference of the exact integer BM25 so the
Spark plan is compared against a second implementation, not itself.
"""

from collections import Counter

from sigmod_2024_contest_spark.functions import retrieval as R


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# Planted corpus (stride 20 → doc 0 is the only query doc).
# Query terms of doc 0 by (tf desc, term asc): zebra(3), common(2),
# quark(1) — all non-stopwords.
PLANTED = [
    (0, "zebra zebra zebra common common quark"),
    # idf discrimination: doc 1 hits the rare term, doc 2 the common
    # term, identical tf and identical length.
    (1, "zebra pad1a pad1b pad1c pad1d pad1e"),
    (2, "common pad2a pad2b pad2c pad2d pad2e"),
    # length normalization: same single quark hit, doc 4 shorter.
    (3, "quark p3a p3b p3c p3d p3e p3f p3g p3h p3i p3j p3k p3l p3m p3n"),
    (4, "quark p4a p4b"),
    # df inflation for "common": several docs containing it.
    (5, "common c5"),
    (6, "common c6"),
    (7, "common c7"),
]


def _reference_bm25(rows, k=10, stride=20, nterms=3, stop=R.STOPWORDS):
    """Independent int64 BM25: same formula, plain Python. Query terms
    rank by tf·idf (r12: discriminative-term selection), like the
    Spark plan."""
    toks = {d: [w for w in t.split(" ") if w != ""] for d, t in rows}
    tf = {d: Counter(ws) for d, ws in toks.items()}
    n_docs = len(toks)
    avgdl = max(sum(len(ws) for ws in toks.values()) // n_docs, 1)
    df = Counter(term for c in tf.values() for term in c)

    def _idf(term):
        return (n_docs - df[term] + 1) * 1_000_000 // (n_docs + df[term] + 1)

    out = {}
    for qd in sorted(toks):
        if qd % stride != 0:
            continue
        cand = sorted(
            ((t, c) for t, c in tf[qd].items() if t not in stop),
            key=lambda tc: (-tc[1] * _idf(tc[0]), tc[0]),
        )[:nterms]
        scores = {}
        for term, _ in cand:
            idf = (n_docs - df[term] + 1) * 1_000_000 // (n_docs + df[term] + 1)
            for d, c in tf.items():
                if d == qd or term not in c:
                    continue
                dl, t = len(toks[d]), c[term]
                contrib = (idf * 22 * avgdl * t) // (10 * avgdl * t + 3 * avgdl + 9 * dl)
                scores[d] = scores.get(d, 0) + contrib
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qd] = [(d, s, i + 1) for i, (d, s) in enumerate(ranked)]
    return out


def test_bm25_matches_independent_reference(spark):
    rows = R.bm25_topk(_docs(spark, PLANTED)).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score_ppm"], r["rnk"]))
    for q in by_q:
        by_q[q].sort(key=lambda x: x[2])
    assert by_q == _reference_bm25(PLANTED)
    assert set(by_q) == {0}


def test_bm25_idf_discrimination_and_length_norm(spark):
    rows = {r["doc_id"]: r["score_ppm"] for r in R.bm25_topk(_docs(spark, PLANTED)).collect()}
    # rare-term hit outranks common-term hit at equal tf and length
    assert rows[1] > rows[2]
    # shorter document outranks longer at equal tf
    assert rows[4] > rows[3]
    # self is excluded
    assert 0 not in rows


def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)], "query_id long, doc_id long, rnk long"
    )
    b = spark.createDataFrame(
        [(1, 40, 1), (1, 20, 2)], "query_id long, doc_id long, rnk long"
    )
    got = {
        r["doc_id"]: (r["rrf_ppm"], r["rnk"]) for r in R.rrf_fuse(a, b).collect()
    }
    # doc 20 is rank 2 in BOTH lists: 2 * (1e6 // 62) = 32258 — beats
    # both single-list rank-1 docs (1e6 // 61 = 16393): the consensus
    # property that motivates RRF.
    assert got[20] == (32258, 1)
    assert got[10] == (16393, 2)  # ties with 40 → doc_id asc
    assert got[40] == (16393, 3)
    assert got[30] == (1_000_000 // 63, 4)


def test_retrieval_rrf_shape(spark):
    out = R.retrieval_rrf(_docs(spark, PLANTED)).collect()
    assert [f.name for f in R.retrieval_rrf(_docs(spark, PLANTED)).schema] == [
        "query_id",
        "doc_id",
        "rrf_ppm",
        "rnk",
    ]
    assert all(r["query_id"] == 0 and r["doc_id"] != 0 for r in out)
    ranks = sorted(r["rnk"] for r in out)
    assert ranks == list(range(1, len(out) + 1))
    assert len(out) <= R.BM25_TOPK


def test_posting_blocks_canonical(spark):
    """Blocked posting rows are doc_id-sorted and exact. With
    block=4 the planted corpus splits at doc_id 4: 'common' (docs
    0,2,5,6,7) spans two blocks; per-block df/sum_tf are partials of
    the hand-checked totals."""
    rows = {
        (r["term"], r["block_no"]): (r["df"], r["sum_tf"], r["postings"])
        for r in R.term_posting_blocks(_docs(spark, PLANTED), block=4).collect()
    }
    assert rows[("common", 0)] == (2, 3, "0:2,2:1")
    assert rows[("common", 1)] == (3, 3, "5:1,6:1,7:1")
    assert rows[("zebra", 0)] == (2, 4, "0:3,1:1")
    assert rows[("quark", 0)] == (2, 2, "0:1,3:1")
    assert rows[("quark", 1)] == (1, 1, "4:1")
    # default block: the whole planted corpus fits in block 0 and the
    # strings match the flat hand-checked postings
    flat = {
        r["term"]: (r["df"], r["sum_tf"], r["postings"])
        for r in R.term_posting_blocks(_docs(spark, PLANTED)).collect()
    }
    assert flat["common"] == (5, 6, "0:2,2:1,5:1,6:1,7:1")


def test_blocks_bounded_on_hot_term(spark):
    """The store-side guarantee that kills the unbounded hot-term row:
    a term occurring in EVERY document of a corpus larger than the
    block size must produce only rows with <= block entries — and the
    store must still serve bit-identically to the direct path."""
    hot = [(i, f"hot filler{i} pad{i % 7}") for i in range(64)]
    docs = _docs(spark, hot)
    blocks = R.term_posting_blocks(docs, block=8)
    sizes = [len(r["postings"].split(",")) for r in blocks.collect()]
    assert max(sizes) <= 8
    hot_rows = blocks.filter("term = 'hot'").collect()
    assert len(hot_rows) == 8 and all(r["df"] == 8 for r in hot_rows)


def test_store_append_serve_equals_direct(spark, tmp_path):
    """The store-served path must be bit-identical to the direct path
    on the corpus the store indexed — append → load → search
    round-trips through parquet with nothing lost (planted + sf0.001
    corpora)."""
    from sigmod_2024_contest_spark.sources.tables import load_table
    from conftest import SF_SMOKE

    for name, docs in (
        ("planted", _docs(spark, PLANTED)),
        ("smoke", load_table(spark, SF_SMOKE, "documents")),
    ):
        path = str(tmp_path / name)
        R.append_lexical_segment(spark, path, docs)
        got = {tuple(r) for r in R.bm25_topk_from_index(spark, path).collect()}
        want = {tuple(r) for r in R.bm25_topk(docs).collect()}
        assert got == want and got, name


def test_bm25_from_index_reads_no_text(spark, tmp_path):
    """The store-served plan scans ONLY the index parquet — the raw
    documents table (and any 'text' column) appears nowhere; the
    posting explode is a projection, not a shuffle source, and the
    plan stays JVM-side."""
    from sigmod_2024_contest_spark.sources.tables import load_table
    from conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "idx")
    R.append_lexical_segment(spark, path, docs)
    plan = (
        R.bm25_topk_from_index(spark, path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "documents.parquet" not in plan
    assert "text#" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_segment_merge_equals_from_scratch(spark, tmp_path):
    """Append-only segment parity: append docs 0-4 then 5-7 as two
    O(batch) segments; the read-time merged block view must equal
    from-scratch term_posting_blocks over all 8 docs (terms present
    in only one batch included), and the two-segment store must SERVE
    identically to the direct path. block=4 makes segment 1 extend
    block 1, exercising the cross-segment posting concat."""
    all_docs = _docs(spark, PLANTED)
    path = str(tmp_path / "store")
    R.append_lexical_segment(spark, path, all_docs.filter("doc_id <= 4"), block=4)
    R.append_lexical_segment(spark, path, all_docs.filter("doc_id > 4"), block=4)
    blocks, _ = R.load_lexical_store(spark, path)
    got = {tuple(r) for r in R.merged_posting_blocks(blocks).collect()}
    want = {tuple(r) for r in R.term_posting_blocks(all_docs, block=4).collect()}
    assert got == want and got
    served = {tuple(r) for r in R.bm25_topk_from_index(spark, path).collect()}
    direct = {tuple(r) for r in R.bm25_topk(all_docs).collect()}
    assert served == direct and served


def test_compaction_equals_rebuild_and_bounds_store(spark, tmp_path):
    """Three appends + compact: the folded SINGLE segment must carry
    exactly the from-scratch blocked index (compaction merges posting
    strings, never re-tokenizes), the manifest must reference one
    segment, and GC must have removed the three old segment dirs."""
    import os
    import re as _re

    all_docs = _docs(spark, PLANTED)
    path = str(tmp_path / "store")
    R.append_lexical_segment(spark, path, all_docs.filter("doc_id <= 2"), block=4)
    R.append_lexical_segment(
        spark, path, all_docs.filter("doc_id > 2 AND doc_id <= 5"), block=4
    )
    R.append_lexical_segment(spark, path, all_docs.filter("doc_id > 5"), block=4)
    seg = R.compact_lexical_store(spark, path)
    manifest = R._read_manifest(path)
    assert [s["seg"] for s in manifest["segments"]] == [seg]
    assert manifest["segments"][0]["n_docs"] == 8
    on_disk = {d for d in os.listdir(path) if _re.fullmatch(r"seg_\d+", d)}
    assert on_disk == {f"seg_{seg}"}
    blocks, _ = R.load_lexical_store(spark, path)
    got = {
        tuple(r)
        for r in blocks.select("term", "block_no", "df", "sum_tf", "postings").collect()
    }
    want = {tuple(r) for r in R.term_posting_blocks(all_docs, block=4).collect()}
    assert got == want and got


def test_append_refuses_interleaved_ids(spark, tmp_path):
    """Segment merges are only canonical for append-only id ranges —
    interleaved ids must fail loudly (from manifest metadata alone,
    no old-segment scan), never write a silently mis-ordered store."""
    import pytest

    all_docs = _docs(spark, PLANTED)
    path = str(tmp_path / "store")
    R.append_lexical_segment(spark, path, all_docs.filter("doc_id >= 3"))
    with pytest.raises(ValueError, match="append-only"):
        R.append_lexical_segment(spark, path, all_docs.filter("doc_id < 3"))


def test_append_refuses_mismatched_block_grid(spark, tmp_path):
    """One block grid per store: blocks from different grids would
    interleave doc_id ranges within a (term, block_no) key."""
    import pytest

    all_docs = _docs(spark, PLANTED)
    path = str(tmp_path / "store")
    R.append_lexical_segment(spark, path, all_docs.filter("doc_id <= 4"), block=4)
    with pytest.raises(ValueError, match="block"):
        R.append_lexical_segment(spark, path, all_docs.filter("doc_id > 4"), block=8)


def test_append_empty_batch_is_noop(spark, tmp_path):
    """An empty micro-batch writes nothing and leaves the manifest
    untouched (sustained streaming ingest produces them)."""
    all_docs = _docs(spark, PLANTED)
    path = str(tmp_path / "store")
    R.append_lexical_segment(spark, path, all_docs)
    before = R._read_manifest(path)
    assert R.append_lexical_segment(spark, path, all_docs.filter("doc_id > 99")) is None
    assert R._read_manifest(path) == before


def test_orphan_segment_invisible_and_not_reused(spark, tmp_path):
    """Crash between segment write and manifest replace: the orphan
    seg dir must be invisible to readers AND its id must never be
    reused for different data (the next append numbers past it)."""
    import os

    all_docs = _docs(spark, PLANTED)
    path = str(tmp_path / "store")
    R.append_lexical_segment(spark, path, all_docs.filter("doc_id <= 4"))
    os.makedirs(os.path.join(path, "seg_7"))  # simulated orphan
    served = {tuple(r) for r in R.bm25_topk_from_index(spark, path).collect()}
    direct = {tuple(r) for r in R.bm25_topk(all_docs.filter("doc_id <= 4")).collect()}
    assert served == direct
    seg = R.append_lexical_segment(spark, path, all_docs.filter("doc_id > 4"))
    assert seg == 8


def test_bm25_plan_properties(spark):
    """Plan-assert the 100 TB shape: per-query top-k is pruned before
    the final window (WindowGroupLimit), every small side (query
    terms, vocab df, 1-row totals) reaches the probe join as a
    broadcast — no sort-merge join at broadcastable sizes — and no
    Python stage exists anywhere (pure JVM expressions)."""
    from sigmod_2024_contest_spark.sources.tables import load_table
    from conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = R.bm25_topk(docs)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_retrieval_rrf_equals_fused_separate_rankings(spark):
    """The shared-pipeline retrieval_rrf must return exactly what
    fusing the two standalone rankings returns — the r12 refactor
    changed the physical shape, never the values."""
    from sigmod_2024_contest_spark.sources.tables import load_table
    from conftest import SF_SMOKE

    for docs in (_docs(spark, PLANTED), load_table(spark, SF_SMOKE, "documents")):
        got = {tuple(r) for r in R.retrieval_rrf(docs).collect()}
        want = {
            tuple(r)
            for r in R.rrf_fuse(R.bm25_topk(docs), R.tf_match_topk(docs)).collect()
        }
        assert got == want and got


def test_retrieval_rrf_shares_one_pair_aggregate(spark):
    """Plan-assert the r11 verdict #3 fix, on invariants that hold at
    any corpus size (exchange/broadcast choices legitimately flip with
    scale — at sf0.001 Catalyst broadcasts the pair table and both
    rank windows inherit the qterms exchange's partitioning, zero
    extra exchanges): exactly ONE (query_id, doc_id) aggregate
    computes BOTH score sums in the same node (the old two-pipeline
    shape had two disjoint aggregates, one per ranking — the doubled
    pair pipeline), the fusion has no join at all, and the whole plan
    stays JVM-side."""
    from sigmod_2024_contest_spark.sources.tables import load_table
    from conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = R.retrieval_rrf(docs)._jdf.queryExecution().executedPlan().toString()
    # one partial aggregate carrying both sums — the shared-pipeline witness
    assert plan.count("partial_sum(contrib") == 1, plan
    both = [
        l
        for l in plan.splitlines()
        if "partial_sum(contrib" in l and "partial_sum(tf" in l
    ]
    assert len(both) == 1, plan
    assert "Join FullOuter" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
