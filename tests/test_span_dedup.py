"""Span-level substring dedup (operators/dedup.py: dup_span_extract /
remove_dup_spans) — planted corpus with hand-computed span boundaries
and the keep-exactly-one-copy policy."""

from sigmod_2024_contest_spark.operators import dedup


# n = 5 (SPAN_NGRAM_N). Docs 1 and 2 share the 8-token run s1..s8:
# duplicated 5-gram starts are 3..6 in doc 1 (run at tokens 3..10) and
# 4..7 in doc 2 (run at tokens 4..11); grams straddling the run
# boundary exist in one doc only. Doc 3 repeats a 5-gram WITHIN itself
# only — cross-document df is 1, so span dedup must ignore it.
DOCS = [
    (1, "a1 a2 s1 s2 s3 s4 s5 s6 s7 s8 a3 a4"),
    (2, "b1 b2 b3 s1 s2 s3 s4 s5 s6 s7 s8 b4"),
    (3, "c1 r1 r2 r3 r4 r5 c2 r1 r2 r3 r4 r5"),
    (4, "tiny doc"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_dup_span_extract_hand_computed(spark):
    rows = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"], r["n_shared_grams"])
        for r in dedup.dup_span_extract(_docs(spark)).collect()
    }
    # exactly one maximal span per sharing doc, boundaries exact
    assert rows == {
        1: (3, 10, 8, 4),
        2: (4, 11, 8, 4),
    }


def test_remove_dup_spans_keeps_first_occurrence(spark):
    rows = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in dedup.remove_dup_spans(_docs(spark)).collect()
    }
    # doc 1 holds every shared gram's globally-first occurrence: intact
    assert rows[1] == (12, 0, DOCS[0][1])
    # doc 2 loses exactly the shared run, surrounding tokens survive
    assert rows[2] == (12, 8, "b1 b2 b3 b4")
    # in-document repetition is NOT cross-document duplication
    assert rows[3] == (12, 0, DOCS[2][1])
    # shorter than n: no grams, untouched
    assert rows[4] == (2, 0, "tiny doc")


def test_exactly_one_copy_survives(spark):
    """After removal, each formerly-duplicated n-gram occurs exactly
    once across the cleaned corpus — the ExactSubstr contract."""
    cleaned = dedup.remove_dup_spans(_docs(spark)).collect()
    n = dedup.SPAN_NGRAM_N
    from collections import Counter

    def grams(text):
        ws = [w for w in text.split(" ")]
        return [" ".join(ws[i : i + n]) for i in range(max(len(ws) - n + 1, 0))]

    before = Counter(g for _, t in DOCS for g in grams(t))
    # cross-doc duplicated grams in the planted corpus: the 4 shared ones
    docs_per_gram = {}
    for d, t in DOCS:
        for g in set(grams(t)):
            docs_per_gram.setdefault(g, set()).add(d)
    cross_dup = {g for g, ds in docs_per_gram.items() if len(ds) >= 2}
    assert len(cross_dup) == 4
    after = Counter(g for r in cleaned for g in grams(r["clean_text"]))
    for g in cross_dup:
        assert after[g] == 1, g


def test_leader_occurrence_is_protected(spark):
    """The r11 advice counter-example: doc 20 holds gram g1's leader;
    doc 21 holds g1's copy (removable) AND g2's leader one token over;
    doc 22 holds g2's copy. Unprotected removal of g1's run in doc 21
    would destroy g2's leader — g2 would survive NOWHERE. With leader
    protection only the non-overlapping prefix of g1's run is removed
    and every duplicated gram still has ≥1 surviving copy."""
    docs = spark.createDataFrame(
        [
            (20, "A B C D E"),          # g1 = 'A B C D E' leader (pos 1)
            (21, "A B C D E F"),        # g1 copy (pos 1), g2 = 'B C D E F' leader (pos 2)
            (22, "B C D E F x"),        # g2 copy (pos 1)
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_removed"], r["clean_text"])
        for r in dedup.remove_dup_spans(docs).collect()
    }
    assert rows[20] == (0, "A B C D E")          # leader intact
    assert rows[21] == (1, "B C D E F")          # only token 'A' removable
    assert rows[22] == (5, "x")                  # g2's copy fully removed
    n = dedup.SPAN_NGRAM_N

    def grams(text):
        ws = [w for w in text.split(" ") if w]
        return [" ".join(ws[i : i + n]) for i in range(max(len(ws) - n + 1, 0))]

    from collections import Counter

    after = Counter(g for t in rows.values() for g in grams(t[1]))
    assert after["A B C D E"] == 1 and after["B C D E F"] == 1


def test_long_boilerplate_doc_interval_rebuild(spark):
    """A boilerplate-heavy long document (every token covered by
    removable starts — the |starts| → L regime the r11 verdict flagged
    as quadratic) folds into ONE covered interval and rebuilds
    correctly: the duplicated run survives only in the leader doc."""
    run = " ".join(f"s{i}" for i in range(400))
    docs = spark.createDataFrame(
        [(30, run + " tail0 tail1"), (31, "head0 head1 " + run)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in dedup.remove_dup_spans(docs).collect()
    }
    assert rows[30] == (402, 0, run + " tail0 tail1")
    assert rows[31] == (402, 400, "head0 head1")


def test_dup_span_extract_no_window_keyed_by_gram(spark):
    """Plan-assert the skew discipline: the only Window in the plan
    partitions by doc_id (bounded by document length); hot boilerplate
    grams flow through map-side-combinable aggregates, never through a
    single window partition."""
    from sigmod_2024_contest_spark.sources.tables import load_table
    from conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = dedup.dup_span_extract(docs)._jdf.queryExecution().executedPlan().toString()
    win_lines = [l for l in plan.splitlines() if "Window [" in l]
    assert win_lines, "expected the gaps-and-islands window"
    for l in win_lines:
        assert "doc_id" in l and "gram" not in l, l


def test_remove_dup_spans_plan_is_window_free(spark):
    """The keep-exactly-one-copy winner is a MIN aggregate on an int64
    key, NOT a rank window — plan-assert no Window node exists at all
    (and no Python stage: the rebuild is array lambdas)."""
    from sigmod_2024_contest_spark.sources.tables import load_table
    from conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = dedup.remove_dup_spans(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
