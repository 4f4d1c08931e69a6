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


def test_encode_word_lowest_rank_first():
    rank_of = {(l, r): k for k, l, r, _ in EXPECTED}
    assert bpe._encode_word("bananas", rank_of) == ["banana", "s"]
    assert bpe._encode_word("band", rank_of) == ["band"]
    assert bpe._encode_word("nab", rank_of) == ["n", "a", "b"]
