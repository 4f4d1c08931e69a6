"""Multimodal binary-column plumbing: schemas, Arrow batch shapes,
fake-decode kernels vs NumPy reference, real-decode stub seam."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sigmod_2024_contest_spark import api
from sigmod_2024_contest_spark.functions import multimodal as MM
from sigmod_2024_contest_spark.sources.tables import load_table

from conftest import SF_SMOKE, assert_matches_oracle, duck_con


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_pack_media_schema(spark):
    m = MM.pack_media(_docs(spark))
    assert [f.name for f in m.schema.fields] == ["doc_id", "media_type", "payload", "meta"]
    assert m.schema["payload"].dataType.simpleString() == "binary"
    assert (
        m.schema["meta"].dataType.simpleString()
        == "struct<width:int,height:int,n_frames:int,sample_rate:int>"
    )
    types = {r["media_type"] for r in m.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_byte_stats_oracle(spark):
    con = duck_con(SF_SMOKE)
    df = api.queries()["media_byte_stats"](spark, SF_SMOKE)
    assert_matches_oracle(df, con, api.oracle_sql()["media_byte_stats"])


def test_frame_sample_oracle(spark):
    con = duck_con(SF_SMOKE)
    df = api.queries()["media_frame_sample"](spark, SF_SMOKE)
    assert_matches_oracle(df, con, api.oracle_sql()["media_frame_sample"])


def test_resize_matches_numpy_reference(spark):
    media = MM.pack_media(_docs(spark)).filter(F.col("doc_id") < 20)
    rows = {r["doc_id"]: r for r in MM.resize_images(media, factor=2).collect()}
    src = {r["doc_id"]: (r["text"], r["doc_id"]) for r in _docs(spark).filter(F.col("doc_id") < 20).collect()}
    for doc_id, (text, _) in src.items():
        w, h = 8 + doc_id % 8, 4 + doc_id % 4
        img = np.resize(np.frombuffer(text.encode(), dtype=np.uint8), (h, w)).astype(np.int64)
        oh, ow = h // 2, w // 2
        pooled = img[: oh * 2, : ow * 2].reshape(oh, 2, ow, 2).mean(axis=(1, 3))
        want = np.floor(pooled).astype(np.int64).ravel().tolist()
        got = rows[doc_id]
        assert (got["out_w"], got["out_h"]) == (ow, oh)
        assert list(got["pixels"]) == want


def test_real_decode_is_explicit_stub(spark):
    media = MM.pack_media(_docs(spark)).limit(2)
    with pytest.raises(Exception) as ei:
        MM.byte_stats(media, decode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_covers_payload(spark):
    """every=1 must partition the payload exactly: frame lengths sum to
    n_bytes per doc."""
    media = MM.pack_media(_docs(spark))
    frames = MM.sample_frames(media, every=1)
    sums = frames.groupBy("doc_id").agg(
        F.sum("frame_len").alias("tot"), F.sum("frame_sum").alias("bsum")
    )
    stats = MM.byte_stats(media).select("doc_id", "n_bytes", "sum_bytes")
    bad = (
        sums.join(stats, "doc_id")
        .filter((F.col("tot") != F.col("n_bytes")) | (F.col("bsum") != F.col("sum_bytes")))
        .count()
    )
    assert bad == 0


def test_media_resize_oracle(spark):
    from conftest import SF_SMOKE, assert_matches_oracle, duck_con

    from sigmod_2024_contest_spark import api

    assert_matches_oracle(
        api.queries()["media_resize"](spark, SF_SMOKE),
        duck_con(SF_SMOKE),
        api.oracle_sql()["media_resize"],
    )


def test_media_resize_planted(spark):
    """Hand-checked block-mean: an 8-wide 4-tall image from a known
    byte pattern, factor 2 — every pooled pixel is the floor-mean of
    its 2×2 block with np.resize's cycling rule."""
    import numpy as np

    from sigmod_2024_contest_spark.functions import multimodal as MM

    text = "abcdefghij"  # 10 bytes, cycles into the 4x8 grid
    docs = spark.createDataFrame([(8, text)], "doc_id long, text string")
    # doc_id=8 -> width 8+0=8, height 4+0=4 -> out 4x2
    row = MM.resize_images_hashable(MM.pack_media(docs)).collect()[0]
    assert (row.out_w, row.out_h) == (4, 2)
    arr = np.frombuffer(text.encode(), dtype=np.uint8)
    img = np.resize(arr, (4, 8)).astype(np.int64)
    want = np.floor(
        img.reshape(2, 2, 4, 2).mean(axis=(1, 3))
    ).astype(np.int64).ravel()
    assert row.pixels_csv == ",".join(map(str, want))
