"""sf1-scale stress for the r9-r11 text/dedup family (r10 verdict #7).

The bench fixture tops out at sf0.1 (5k docs); the candidate-bounded /
df-capped scale claims of `winnow_match_pairs`, `dup_ngram_stats`,
`bigram_likelihood` and `dedup_keep_best` are asserted there but never
measured off the fixture scale. This tool synthesizes a 10× documents
corpus (50k docs, same ~50-token shape, deterministic), runs each
entry's registered body at sf0.1 AND at the synthetic sf1, min-of-N
each, and prints the wall ratio beside the data ratio — a candidate
set growing quadratically would show up as ratio >> 10.

The synthetic corpus is adversarially realistic for the dedup family:
~2% planted near-duplicate pairs (copy + token edits), a shared
boilerplate sentence on ~10% of docs (cross-doc n-grams for
dup_ngram_stats and hot fingerprints for the df cap), and a Zipf-ish
vocabulary so the bigram model has hot prefixes.

Usage: python tools/stress_text_sf1.py [--n-docs 50000] [--reps 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF01 = "/root/testdata/sf0.1"

ENTRIES = [
    "winnow_match_pairs",
    "dup_ngram_stats",
    "bigram_likelihood",
    "dedup_keep_best",
    # r12: the retrieval + span-dedup families (r11 verdict #7) — the
    # pair exchange (retrieval) and the interval rebuild
    # (remove_dup_spans) are the quantities to watch off-fixture
    "bm25_topk",
    "retrieval_rrf",
    "dup_span_extract",
    "remove_dup_spans",
]

BOILERPLATE = "subscribe to our newsletter for updates and follow the daily digest"


def synth_docs_parquet(n_docs: int, out_dir: str) -> str:
    """Write `documents.parquet` (doc_id, text, lang, source, n_chars)
    with the fixture's schema at n_docs scale. Deterministic."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    vocab = np.array(
        [f"w{i}" for i in range(2000)]
        + list("a the and of in to is on der die el la le les".split())
    )
    # Zipf-ish weights: hot head, long tail
    w = 1.0 / np.arange(1, len(vocab) + 1) ** 0.8
    w /= w.sum()
    texts: list[str] = []
    for i in range(n_docs):
        n_tok = int(rng.integers(30, 70))
        toks = list(vocab[rng.choice(len(vocab), size=n_tok, p=w)])
        if i % 10 == 0:  # shared boilerplate → cross-doc n-grams + hot fps
            toks = BOILERPLATE.split() + toks
        texts.append(" ".join(toks))
    # ~2% planted near-dup pairs: doc j copies doc j-1 with 2 token edits
    for j in range(1, n_docs, 50):
        toks = texts[j - 1].split()
        for pos in rng.integers(0, len(toks), size=2):
            toks[int(pos)] = "edited"
        texts[j] = " ".join(toks)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n_docs),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(tbl, path)
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=50_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from sigmod_2024_contest_spark import api
    from sigmod_2024_contest_spark.session import get_spark

    import tempfile

    sf1 = os.path.join(tempfile.gettempdir(), f"sg_text_sf1_{args.n_docs}")
    if not os.path.exists(os.path.join(sf1, "documents.parquet")):
        synth_docs_parquet(args.n_docs, sf1)

    spark = get_spark("stress-text-sf1", shuffle_partitions=32)
    reg = api.queries()
    reg["text_stats"](spark, SF01).count()  # session warm-up, off the clocks

    import duckdb

    con = duckdb.connect()
    n01 = con.sql(f"SELECT count(*) FROM '{SF01}/documents.parquet'").fetchone()[0]
    data_ratio = args.n_docs / n01
    for name in ENTRIES:
        walls = {SF01: [], sf1: []}
        rows = {}
        for _rep in range(args.reps):
            for d in (SF01, sf1):
                t0 = time.time()
                rows[d] = reg[name](spark, d).count()
                walls[d].append(round(time.time() - t0, 3))
        w01, w1 = min(walls[SF01]), min(walls[sf1])
        print(
            json.dumps(
                {
                    "entry": name,
                    "sf0.1_sec": w01,
                    "sf1_sec": w1,
                    "wall_ratio": round(w1 / w01, 2),
                    "data_ratio": round(data_ratio, 1),
                    "sf0.1_rows": rows[SF01],
                    "sf1_rows": rows[sf1],
                    "runs": {"sf0.1": walls[SF01], "sf1": walls[sf1]},
                }
            ),
            flush=True,
        )
    lexical_upsert_probe(spark, sf1, args.reps)
    spark.stop()


def lexical_upsert_probe(spark, sf1: str, reps: int) -> None:
    """The r13 segmented-store claim, measured: appending a 2% batch
    to an existing store must cost O(batch) — its wall should sit far
    below the from-scratch rebuild and STAY there as the indexed
    corpus grows 10× (the r12 store full-outer-joined and rewrote the
    whole postings table per batch, so its append wall tracked the
    INDEX). Prints one row per scale: rebuild wall (tokenize+write
    all docs as one segment), append wall (one O(batch) segment), and
    their ratio."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from sigmod_2024_contest_spark.functions import retrieval as R
    from sigmod_2024_contest_spark.sources.tables import load_table

    for label, d in (("sf0.1", SF01), ("sf1", sf1)):
        docs = load_table(spark, d, "documents")
        mx = docs.agg(F.max("doc_id")).collect()[0][0]
        cut = mx * 98 // 100
        base = docs.filter(F.col("doc_id") <= cut)
        batch = docs.filter(F.col("doc_id") > cut)
        rebuilds, appends = [], []
        for _ in range(reps):
            work = tempfile.mkdtemp(prefix="sg_lexprobe_")
            try:
                t0 = time.time()
                R.append_lexical_segment(spark, work, docs)
                rebuilds.append(round(time.time() - t0, 3))
            finally:
                shutil.rmtree(work, ignore_errors=True)
            work = tempfile.mkdtemp(prefix="sg_lexprobe_")
            try:
                R.append_lexical_segment(spark, work, base)  # off the clock
                t0 = time.time()
                R.append_lexical_segment(spark, work, batch)
                appends.append(round(time.time() - t0, 3))
            finally:
                shutil.rmtree(work, ignore_errors=True)
        print(
            json.dumps(
                {
                    "entry": "lexical_upsert_probe",
                    "scale": label,
                    "rebuild_sec": min(rebuilds),
                    "append_sec": min(appends),
                    "append_over_rebuild": round(min(appends) / min(rebuilds), 3),
                    "runs": {"rebuild": rebuilds, "append": appends},
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
