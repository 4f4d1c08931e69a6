"""End-to-end contest parity on the reference's own shipped data.

/root/reference/dummy-data.bin (10k rows) and dummy-queries.bin (100
queries) are the reference's smoke-scale inputs (baseline.cpp:30-31).
Running our engine on them is the switch-over test: same .bin formats,
same four query types, recall gated vs our exact oracle — the
reference's own methodology (recall@100 vs brute force, utils.h:224-253).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from sigmod_2024_contest_spark import contest
from sigmod_2024_contest_spark.sources import bin_format

DUMMY_BASE = "/root/reference/dummy-data.bin"
DUMMY_QUERIES = "/root/reference/dummy-queries.bin"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(DUMMY_BASE) and os.path.exists(DUMMY_QUERIES)),
    reason="reference dummy data not present",
)


def _result_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.id)
    return out


def test_contest_dummy_recall(spark, tmp_path):
    """hybrid vs exact on the contest dummy workload: recall@100 >= 0.95,
    and the .bin sink round-trips through the reference wire format."""
    k = 100
    exact = _result_sets(
        contest.contest_run(spark, DUMMY_BASE, DUMMY_QUERIES, k=k, mode="exact").collect()
    )
    out_bin = str(tmp_path / "out.bin")
    hybrid_rows = contest.contest_run(
        spark, DUMMY_BASE, DUMMY_QUERIES, out_path=out_bin, k=k, mode="hybrid"
    ).collect()
    hybrid = _result_sets(hybrid_rows)

    assert set(hybrid) == set(exact), "every query answered"
    recalls = [len(exact[q] & hybrid[q]) / len(exact[q]) for q in exact]
    mean_recall = float(np.mean(recalls))
    assert mean_recall >= 0.95, mean_recall

    # sink round-trip: the uint32 matrix re-reads to the same id sets
    mat = bin_format.read_knn_bin(spark, out_bin, k=k).collect()
    assert len(mat) == len(hybrid)
    by_qid = {r.query_id: r.knn for r in mat}
    # row order in the file is query_id order; ids per row match
    for i, qid in enumerate(sorted(hybrid)):
        got = {x for x in by_qid[i] if x != np.iinfo(np.uint32).max}
        assert got == hybrid[qid], f"row {i} (query {qid}) mismatch"


def test_contest_auto_mode_small_batch_is_exact(spark):
    """mode='auto' on the dummy workload (100 queries × 10k rows —
    far below the scan-FLOPs bound) must take the scan branch and
    therefore equal mode='exact' row-for-row."""
    auto = sorted(
        map(
            tuple,
            contest.contest_run(
                spark, DUMMY_BASE, DUMMY_QUERIES, k=100, mode="auto"
            ).collect(),
        )
    )
    exact = sorted(
        map(
            tuple,
            contest.contest_run(
                spark, DUMMY_BASE, DUMMY_QUERIES, k=100, mode="exact"
            ).collect(),
        )
    )
    assert auto == exact and auto
