"""BPE trainer/encoder (functions/bpe.py): hand-computed merge
sequence on a planted corpus, local ≡ forced-distributed parity, and
encode correctness."""

from sigmod_2024_contest_spark.functions import bpe


# words: banana×3, band×2, bans×1 → the full merge sequence is
# hand-derivable (see each step's counts in the assertions).
DOCS = [
    (1, "banana banana band"),
    (2, "banana band bans"),
]

# (rank, left, right, pair_count), stopping when no pair repeats:
# 0: (a,n)  9 = 2·3(banana) + 1·2(band) + 1(bans)
# 1: (b,an) 6
# 2: (an,a) 3  — ties (ban,an) at 3; (an,a) wins lexicographically
# 3: (ban,ana) 3
# 4: (ban,d) 2
EXPECTED = [
    (0, "a", "n", 9),
    (1, "b", "an", 6),
    (2, "an", "a", 3),
    (3, "ban", "ana", 3),
    (4, "ban", "d", 2),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _collect(df):
    return sorted(
        (r["rank"], r["left"], r["right"], r["pair_count"]) for r in df.collect()
    )


def test_bpe_train_hand_computed(spark):
    assert _collect(bpe.bpe_train(_docs(spark), n_merges=10)) == EXPECTED


def test_bpe_train_distributed_equals_local(spark):
    """local_vocab=0 forces the distributed loop (the 100 TB path);
    merge-for-merge equality with the driver loop."""
    local = _collect(bpe.bpe_train(_docs(spark), n_merges=10))
    dist = _collect(bpe.bpe_train(_docs(spark), n_merges=10, local_vocab=0))
    assert dist == local == EXPECTED


def test_bpe_train_respects_merge_budget(spark):
    assert len(_collect(bpe.bpe_train(_docs(spark), n_merges=2))) == 2


def test_bpe_encode_counts(spark):
    merges = bpe.bpe_train(_docs(spark), n_merges=10)
    enc_docs = spark.createDataFrame(
        [(7, "banana band bananas"), (8, ""), (9, "xyz")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
        for r in bpe.bpe_encode_counts(enc_docs, merges).collect()
    }
    # banana→[banana]=1, band→[band]=1, bananas→[banana,s]=2
    assert rows[7] == (3, 4)
    # empty text → zero of both
    assert rows[8] == (0, 0)
    # word with no applicable merges stays character-split
    assert rows[9] == (1, 3)


def test_bpe_oracle_matches_spark_smoke(spark):
    """The unrolled DuckDB merge-loop twin (bpe_train_sql /
    bpe_encode_counts_sql) reproduces the Spark results exactly on the
    sf0.001 corpus — the same comparison the driver runs at sf0.01."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle, duck_con
    from sigmod_2024_contest_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    con = duck_con(SF_SMOKE)
    merges = bpe.bpe_train(docs)
    assert_matches_oracle(merges, con, bpe.bpe_train_sql())
    assert_matches_oracle(
        bpe.bpe_encode_counts(docs, merges), con, bpe.bpe_encode_counts_sql()
    )


def test_priority_encode_equals_final_train_state(spark):
    """The encode oracle's premise: (a) the learned merge outputs are
    pairwise-distinct strings, and — therefore — (b) priority encode
    (`_encode_word`, lowest rank first) of every corpus word equals its
    final training state (merges applied in rank order, leftmost
    non-overlapping). A duplicate output string is the ONLY way a
    later merge can re-enable an earlier one; if the corpus ever
    learns one, this test (and the driver hash) fails loudly."""
    from tests.conftest import SF_SMOKE
    from sigmod_2024_contest_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    merges = [
        (r["rank"], r["left"], r["right"])
        for r in bpe.bpe_train(docs).orderBy("rank").collect()
    ]
    outputs = [l + r for _, l, r in merges]
    assert len(set(outputs)) == len(outputs), "duplicate merge output strings"

    words = {
        w
        for (text,) in docs.select("text").collect()
        for w in text.split(" ")
        if w
    }
    rank_of = {(l, r): k for k, l, r in merges}
    state = {w: list(w) for w in words}
    for _, l, r in merges:
        state = {w: bpe._merge_word(s, l, r) for w, s in state.items()}
    for w in words:
        assert bpe._encode_word(w, rank_of) == state[w], w


def test_encode_word_lowest_rank_first():
    rank_of = {(l, r): k for k, l, r, _ in EXPECTED}
    assert bpe._encode_word("bananas", rank_of) == ["banana", "s"]
    assert bpe._encode_word("band", rank_of) == ["band"]
    assert bpe._encode_word("nab", rank_of) == ["n", "a", "b"]
