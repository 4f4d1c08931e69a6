"""Multimodal binary-column plumbing: schemas, Arrow batch shapes,
fake-decode kernels vs NumPy reference, and the real (codec-free)
PGM/PPM/BMP decode path on planted container bytes."""

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


# --- real (codec-free) decode: planted-bytes containers -------------------


def _pgm(w, h, vals, comment=False):
    head = b"P5\n" + (b"# planted\n" if comment else b"") + f"{w} {h}\n255\n".encode()
    return head + bytes(vals)


def _bmp24(w, h, rgb_rows):
    """Minimal uncompressed 24-bit BMP: bottom-up rows, 4-byte padded,
    BGR order — the layout decode_image must undo."""
    stride = (w * 3 + 3) // 4 * 4
    raster = b""
    for row in reversed(rgb_rows):  # bottom-up
        line = b"".join(bytes([b_, g, r]) for (r, g, b_) in row)  # BGR
        raster += line + b"\x00" * (stride - len(line))
    data_off = 54
    size = data_off + len(raster)
    hdr = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")  # positive = bottom-up
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + b"\x00" * 20
    )
    return hdr + raster


def test_decode_image_pgm_planted():
    vals = [10, 20, 30, 40, 50, 60]
    h, w, ch, arr = MM.decode_image(_pgm(3, 2, vals, comment=True))
    assert (h, w, ch) == (2, 3, 1)
    assert arr.tolist() == vals


def test_decode_image_ppm_planted():
    raster = bytes(range(2 * 1 * 3))  # 2x1 RGB
    h, w, ch, arr = MM.decode_image(b"P6\n2 1\n255\n" + raster)
    assert (h, w, ch) == (1, 2, 3)
    assert arr.tolist() == list(range(6))


def test_decode_image_bmp24_planted():
    """w=3 forces row padding (9 -> 12 bytes); values chosen so any
    BGR/row-order mistake changes the output."""
    rows = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)], [(10, 11, 12), (13, 14, 15), (16, 17, 18)]]
    h, w, ch, arr = MM.decode_image(_bmp24(3, 2, rows))
    assert (h, w, ch) == (2, 3, 3)
    assert arr.reshape(2, 3, 3).tolist() == [[list(p) for p in r] for r in rows]


def test_decode_image_rejects_compressed():
    with pytest.raises(ValueError, match="codec"):
        MM.decode_image(b"\xff\xd8\xff\xe0JFIF-like")


def test_decode_image_roundtrip_property():
    """Randomized container round-trip (hypothesis): any gray image
    encoded as PGM, and any RGB image encoded as bottom-up padded BMP,
    must decode back to the exact pixel matrix."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:  # environment without hypothesis: planted tests cover it
        pytest.skip("hypothesis unavailable")

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 7),
        data=st.data(),
    )
    def roundtrip(w, h, data):
        gray = data.draw(
            st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)
        )
        gh, gw, gch, garr = MM.decode_image(_pgm(w, h, gray))
        assert (gh, gw, gch) == (h, w, 1) and garr.tolist() == gray
        rgb_rows = [
            [tuple(data.draw(st.integers(0, 255)) for _ in range(3)) for _ in range(w)]
            for _ in range(h)
        ]
        bh, bw, bch, barr = MM.decode_image(_bmp24(w, h, rgb_rows))
        assert (bh, bw, bch) == (h, w, 3)
        assert barr.reshape(h, w, 3).tolist() == [[list(p) for p in r] for r in rgb_rows]

    roundtrip()


def test_real_decode_through_spark_pipeline(spark):
    """decode='real' end-to-end: planted PGM payloads flow through the
    SAME mapInPandas kernel as the fake path, and byte_stats reduces
    the decoded samples (header excluded) exactly."""
    vals = [[9, 9, 9, 1], [0, 255, 16, 32]]
    media = spark.createDataFrame(
        [(i, "image", bytearray(_pgm(2, 2, v)), (2, 2, 1, 0)) for i, v in enumerate(vals)],
        MM.MEDIA_SCHEMA,
    )
    got = {r["doc_id"]: r for r in MM.byte_stats(media, decode="real").collect()}
    for i, v in enumerate(vals):
        assert got[i]["n_bytes"] == 4
        assert got[i]["sum_bytes"] == sum(v)
        assert got[i]["sumsq_bytes"] == sum(x * x for x in v)
        ref = np.bincount(np.asarray(v) >> 4, minlength=MM.N_BINS).tolist()
        assert list(got[i]["hist"]) == ref


def test_real_decode_resize_through_spark(spark):
    """Block-mean resize over a REAL-decoded 4x4 PGM: meta dims match
    the container dims, so np.resize is a no-op and the pooled output
    is the hand-computed 2x2 block mean."""
    img = list(range(16))  # 4x4 ramp
    media = spark.createDataFrame(
        [(0, "image", bytearray(_pgm(4, 4, img)), (4, 4, 1, 0))],
        MM.MEDIA_SCHEMA,
    )
    [r] = MM.resize_images(media, factor=2, decode="real").collect()
    assert (r["out_w"], r["out_h"]) == (2, 2)
    ref = np.arange(16).reshape(4, 4).reshape(2, 2, 2, 2).transpose(0, 2, 1, 3)
    ref = np.floor(ref.reshape(2, 2, 4).mean(axis=2)).astype(int).ravel().tolist()
    assert list(r["pixels"]) == ref


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


# --- audio: PCM WAV decode + sample stats ----------------------------------


def _wav(samples, rate=8000, channels=1, bits=16):
    """Minimal RIFF/WAVE PCM container around the given samples."""
    import struct

    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes((s + 128) & 0xFF for s in samples)
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_decode_audio_wav16_planted():
    samples = [0, 1000, -1000, 32767, -32768, 7]
    rate, ch, s = MM.decode_audio(_wav(samples, rate=44100, channels=2))
    assert (rate, ch) == (44100, 2)
    assert s.tolist() == samples


def test_decode_audio_wav8_planted():
    samples = [0, 127, -128, 5]
    rate, ch, s = MM.decode_audio(_wav(samples, rate=8000, bits=8))
    assert (rate, ch) == (8000, 1)
    assert s.tolist() == samples


def test_decode_audio_rejects_compressed():
    with pytest.raises(ValueError, match="decoder"):
        MM.decode_audio(b"\xff\xfb\x90mp3-frame-ish")


def test_audio_sample_stats_through_spark(spark):
    """Real-decoded WAV payloads through the mapInPandas stats kernel:
    sums/peak computed over SAMPLES (signed), not container bytes."""
    a = [100, -200, 300]
    b = [0, -32768]
    media = spark.createDataFrame(
        [
            (0, "audio", bytearray(_wav(a, rate=16000)), (0, 0, 0, 16000)),
            (1, "audio", bytearray(_wav(b, rate=8000)), (0, 0, 0, 8000)),
        ],
        MM.MEDIA_SCHEMA,
    )
    got = {r["doc_id"]: r for r in MM.audio_sample_stats(media).collect()}
    assert got[0]["sample_rate"] == 16000 and got[0]["n_samples"] == 3
    assert got[0]["sum_samples"] == sum(a)
    assert got[0]["sumsq_samples"] == sum(x * x for x in a)
    assert got[0]["peak"] == 300
    assert got[1]["peak"] == 32768 and got[1]["sum_samples"] == -32768


# --- video: Y4M decode + per-frame luma stats -------------------------------


def _y4m(w, h, frames, cs="C420"):
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 {cs}\n".encode()
    body = b"".join(b"FRAME\n" + bytes(f) for f in frames)
    return head + body


def test_decode_video_y4m_planted():
    w, h = 4, 2
    fbytes = w * h * 3 // 2  # C420
    f0 = list(range(fbytes))
    f1 = list(range(100, 100 + fbytes))
    hh, ww, cs, frames = MM.decode_video(_y4m(w, h, [f0, f1]))
    assert (hh, ww, cs) == (h, w, "C420")
    assert frames.shape == (2, fbytes)
    assert frames[0].tolist() == f0 and frames[1].tolist() == f1


def test_decode_video_mono_and_reject():
    hh, ww, cs, frames = MM.decode_video(_y4m(2, 2, [[1, 2, 3, 4]], cs="Cmono"))
    assert (hh, ww, cs) == (2, 2, "Cmono") and frames.shape == (1, 4)
    with pytest.raises(ValueError, match="decoder"):
        MM.decode_video(b"\x00\x00\x00\x18ftypmp42-ish")


def test_video_frame_stats_through_spark(spark):
    """Real Y4M through the mapInPandas kernel: luma stats use only the
    Y plane (first w*h bytes), chroma ignored."""
    w, h = 2, 2
    luma0, chroma0 = [0, 255, 0, 255], [9, 9]      # mean 127.5 of range
    luma1, chroma1 = [10, 10, 10, 10], [200, 200]
    payload = _y4m(w, h, [luma0 + chroma0, luma1 + chroma1])
    media = spark.createDataFrame(
        [(0, "video", bytearray(payload), (w, h, 2, 0))], MM.MEDIA_SCHEMA
    )
    got = {r["frame_idx"]: r for r in MM.video_frame_stats(media).collect()}
    assert got[0]["luma_min"] == 0 and got[0]["luma_max"] == 255
    assert got[0]["luma_mean_ppm"] == (sum(luma0) * 1_000_000) // (255 * 4)
    assert got[1]["luma_min"] == got[1]["luma_max"] == 10
    assert got[1]["luma_mean_ppm"] == (40 * 1_000_000) // (255 * 4)


def _bmp8(w, h, idx_rows, palette, n_colors=None):
    """Minimal uncompressed 8-bit BMP: bottom-up padded index raster
    preceded by a BGRX color table."""
    n = len(palette) if n_colors is None else n_colors
    stride = (w + 3) // 4 * 4
    raster = b""
    for row in reversed(idx_rows):
        raster += bytes(row) + b"\x00" * (stride - w)
    table = b"".join(bytes([b_, g, r, 0]) for (r, g, b_) in palette)
    data_off = 54 + len(table)
    size = data_off + len(raster)
    hdr = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + b"\x00" * 12
        + n.to_bytes(4, "little")  # biClrUsed
        + b"\x00" * 4
    )
    return hdr + table + raster


def test_decode_image_bmp8_grayscale_ramp():
    """Identity grayscale palette: samples ARE the indices, 1 channel."""
    pal = [(i, i, i) for i in range(256)]
    rows = [[10, 200, 32], [7, 0, 255]]
    h, w, ch, arr = MM.decode_image(_bmp8(3, 2, rows, pal, n_colors=0))
    assert (h, w, ch) == (2, 3, 1)
    assert arr.reshape(2, 3).tolist() == rows


def test_decode_image_bmp8_color_palette_mapped():
    """Non-identity palette: indices map through the color table to
    RGB — raw indices would be wrong sample values."""
    pal = [(9, 8, 7), (100, 101, 102), (200, 0, 50), (1, 2, 3)]
    rows = [[0, 2], [3, 1]]
    h, w, ch, arr = MM.decode_image(_bmp8(2, 2, rows, pal))
    assert (h, w, ch) == (2, 2, 3)
    got = arr.reshape(2, 2, 3).tolist()
    assert got == [[list(pal[i]) for i in r] for r in rows]


def test_decode_image_bmp8_truncated_palette_rejected():
    pal = [(i, i, i) for i in range(4)]
    buf = _bmp8(2, 1, [[0, 1]], pal, n_colors=256)  # claims 256, stores 4
    with pytest.raises(ValueError, match="color table"):
        MM.decode_image(buf)


def test_pnm_header_rejects_crlf_and_junk():
    """Spec: exactly ONE whitespace byte between maxval and raster —
    CRLF or a comment there would silently shift the raster offset."""
    vals = bytes([1, 2, 3, 4, 5, 6])
    with pytest.raises(ValueError, match="CRLF"):
        MM.decode_image(b"P5\n3 2\n255\r\n" + vals)
    with pytest.raises(ValueError, match="whitespace"):
        MM.decode_image(b"P5\n3 2\n255#c\n" + vals)


def test_pack_audio_decode_roundtrip(spark):
    """pack_audio → decode_audio is the identity on the planted bytes:
    mono 16 kHz 8-bit PCM whose samples are ascii(text) − 128."""
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "Zz 09")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: bytes(r["payload"])
            for r in MM.pack_audio(docs).collect()}
    rate, ch, s = MM.decode_audio(rows[1])
    assert (rate, ch) == (MM.AUDIO_RATE, 1)
    assert s.tolist() == [b - 128 for b in b"hello world"]
    rate2, ch2, s2 = MM.decode_audio(rows[2])
    assert s2.tolist() == [b - 128 for b in b"Zz 09"]


def test_pack_video_decode_roundtrip(spark):
    """pack_video → decode_video reproduces the documented geometry and
    the cycled-text frame bytes."""
    text = "abcdefghij" * 6
    doc_id = 5  # w=13, h=1(4+5%4=5? no: 4+1=5)... computed below
    docs = spark.createDataFrame([(doc_id, text)], "doc_id long, text string")
    payload = bytes(MM.pack_video(docs).collect()[0]["payload"])
    h, w, cs, frames = MM.decode_video(payload)
    assert (w, h) == (8 + doc_id % 8, 4 + doc_id % 4)
    assert cs.startswith("Cmono")
    nf = 1 + doc_id % 7
    assert frames.shape == (nf, w * h)
    tb = text.encode()
    n = len(tb)
    for f in range(nf):
        expect = [tb[(f * w * h + p) % n] for p in range(w * h)]
        assert frames[f].tolist() == expect


def test_pack_image_decode_roundtrip(spark):
    """pack_image plants a commented P5 header; real decode must strip
    exactly that header and return the text bytes."""
    text = "The quick brown fox."
    docs = spark.createDataFrame([(9, text)], "doc_id long, text string")
    payload = bytes(MM.pack_image(docs).collect()[0]["payload"])
    h, w, ch, arr = MM.decode_image(payload)
    assert (h, w, ch) == (1, len(text), 1)
    assert arr.tobytes() == text.encode()
