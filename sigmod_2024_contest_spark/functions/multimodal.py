"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas UDF plumbing (SURVEY §7.5 north star).

Design for 100 TB: payloads are opaque ``binary`` cells that travel
with the row (Parquet keeps them columnar and compressed); metadata is
a typed struct column so planning-relevant fields (width, frames,
sample rate) are prunable/filterable WITHOUT touching payload bytes.
All per-byte work happens in ``mapInPandas`` over Arrow record
batches — NumPy ``frombuffer`` per row, no Python byte loops.

Decode paths: ``decode=\"fake\"`` (default) is a deterministic
stand-in — payload bytes are interpreted directly as pixel/sample
values — keeping every downstream kernel (histogram, block-mean
resize, frame slicing) real, vectorized, and testable; the testdata
payloads are the documents' UTF-8 bytes, so byte-level results are
independently verifiable by the DuckDB oracle via ascii() arithmetic
on the text (api.py entries media_byte_stats, media_frame_sample).
``decode=\"real\"`` parses actual uncompressed containers in pure
NumPy — binary PGM/PPM (P5/P6) and uncompressed 8/24-bit BMP for
images (:func:`decode_image`), RIFF/WAVE 8/16-bit PCM for audio
(:func:`decode_audio`) — no external codec needed; compressed formats
(JPEG/PNG/MP3/MP4) raise ValueError at the same seam, which is where
PIL/ffmpeg would plug in on a cluster that ships them. Either way the
decoded samples flow into the SAME kernels, so the Spark-side
plumbing (schema, partitioning, Arrow batch shape) is identical for
both paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BINS = 16  # byte histogram bins (byte >> 4)

META_SCHEMA = "width int, height int, n_frames int, sample_rate int"
MEDIA_SCHEMA = f"doc_id long, media_type string, payload binary, meta struct<{META_SCHEMA}>"


def pack_media(docs: DataFrame) -> DataFrame:
    """Documents → media table: payload = UTF-8 bytes of the text (the
    deterministic test payload), metadata derived from doc_id so every
    row has a stable typed shape. Cycle media_type over the 3 classes."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.lit(8) + F.col("doc_id") % 8).cast("int").alias("width"),
            (F.lit(4) + F.col("doc_id") % 4).cast("int").alias("height"),
            (F.lit(1) + F.col("doc_id") % 7).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _pnm_header(buf: bytes) -> tuple[list[int], int]:
    """Parse the 3 integer header tokens (width, height, maxval) of a
    binary PNM after the 2-byte magic, honoring '#' comments; returns
    (tokens, offset of the first raster byte — one whitespace past the
    maxval token, per the PNM spec)."""
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        if i >= len(buf):
            raise ValueError("truncated PNM header")
        c = buf[i]
        if c == 0x23:  # '#' comment runs to end of line
            while i < len(buf) and buf[i] not in (0x0A, 0x0D):
                i += 1
        elif c in (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C):
            i += 1
        else:
            j = i
            while j < len(buf) and buf[j] not in (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C, 0x23):
                j += 1
            toks.append(int(buf[i:j]))
            i = j
    # the PNM spec mandates EXACTLY ONE whitespace byte between the
    # maxval token and the raster — verify rather than assume: a '#'
    # comment here, or a CRLF line ending (two bytes), would silently
    # shift the raster offset and corrupt every decoded pixel
    if i >= len(buf) or buf[i] not in (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C):
        raise ValueError("malformed PNM: maxval not followed by whitespace")
    if buf[i] == 0x0D and i + 1 < len(buf) and buf[i + 1] == 0x0A:
        raise ValueError(
            "malformed PNM: CRLF after maxval (spec requires a single "
            "whitespace byte before the raster)"
        )
    return toks, i + 1


def decode_image(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real (codec-free) image decode: binary PGM ('P5', gray) / PPM
    ('P6', RGB) and uncompressed 8-bit or 24-bit BMP, parsed with
    NumPy only. Returns (height, width, channels, samples) with
    samples flat in row-major top-down raster order (BMP bottom-up
    rows are flipped, row padding stripped, BGR reordered to RGB).
    Compressed containers raise ValueError — that is the seam where a
    cluster-side codec (PIL/ffmpeg) would plug in."""
    magic = payload[:2]
    if magic in (b"P5", b"P6"):
        (w, h, maxval), off = _pnm_header(payload)
        if maxval > 255:
            raise ValueError("16-bit PNM not supported")
        ch = 1 if magic == b"P5" else 3
        need = w * h * ch
        raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
        return h, w, ch, raster.copy()
    if magic == b"BM":
        hdr = np.frombuffer(payload, dtype=np.uint8, count=54).copy()
        data_off = int(hdr[10:14].view(np.uint32)[0])
        w = int(hdr[18:22].view(np.int32)[0])
        h_raw = int(hdr[22:26].view(np.int32)[0])
        bpp = int(hdr[28:30].view(np.uint16)[0])
        compression = int(hdr[30:34].view(np.uint32)[0])
        if compression != 0 or bpp not in (8, 24):
            raise ValueError(f"only uncompressed 8/24-bit BMP (bpp={bpp}, comp={compression})")
        h = abs(h_raw)
        ch = bpp // 8
        stride = (w * ch + 3) // 4 * 4  # rows pad to 4-byte boundaries
        raster = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
        rows = raster.reshape(h, stride)[:, : w * ch]
        if h_raw > 0:
            rows = rows[::-1]  # positive height = bottom-up storage
        px = rows.reshape(h, w, ch)
        if ch == 3:
            px = px[:, :, ::-1]  # BGR -> RGB
            return h, w, ch, np.ascontiguousarray(px).ravel()
        # 8-bit BMP samples are COLOR-TABLE INDICES, not values: the
        # palette (4-byte BGRX entries) sits between the 54-byte
        # headers and the raster. An identity grayscale ramp decodes
        # to the indices themselves (gray, 1 channel); anything else
        # maps through the palette to RGB — returning raw indices for
        # a non-gray palette would claim a successful decode of wrong
        # sample values.
        n_colors = int(hdr[46:50].view(np.uint32)[0]) or 256
        if 54 + 4 * n_colors > data_off:
            raise ValueError(
                "8-bit BMP: color table truncated or missing "
                f"(need {n_colors} BGRX entries before the raster)"
            )
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=54
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        idx = px.reshape(h, w)
        if idx.max(initial=0) >= n_colors:
            raise ValueError("8-bit BMP: pixel index beyond the color table")
        ramp = np.arange(n_colors, dtype=np.uint8)
        if (pal == ramp[:, None]).all():
            return h, w, 1, np.ascontiguousarray(idx).ravel()
        mapped = pal[idx]  # (h, w, 3) RGB
        return h, w, 3, np.ascontiguousarray(mapped).ravel()
    raise ValueError(
        f"unrecognized container magic {magic!r}: compressed formats "
        "(JPEG/PNG/MP4) need a cluster-side codec — plug it in here"
    )


def _decode_bytes(payload: bytes, decode: str) -> np.ndarray:
    if decode == "real":
        return decode_image(bytes(payload))[3]
    return np.frombuffer(payload, dtype=np.uint8)


# ---------------------------------------------------------------------------
# Feature extraction (decode → per-payload stats), mapInPandas
# ---------------------------------------------------------------------------

BYTE_STATS_SCHEMA = (
    "doc_id long, n_bytes long, sum_bytes long, sumsq_bytes long, hist array<long>"
)


def byte_stats(media: DataFrame, decode: str = "fake") -> DataFrame:
    """(doc_id, n_bytes, sum_bytes, sumsq_bytes, hist[16]): the
    feature-extraction pattern — decode payload, reduce to a fixed-size
    feature vector. Vectorized per Arrow batch; payload bytes never
    leave the executor."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, sb, sq, hists = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = _decode_bytes(payload, decode)
                ids.append(doc_id)
                nb.append(arr.size)
                a64 = arr.astype(np.int64)
                sb.append(int(a64.sum()))
                sq.append(int((a64 * a64).sum()))
                hists.append(np.bincount(arr >> 4, minlength=N_BINS).astype(np.int64))
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "n_bytes": np.asarray(nb, dtype=np.int64),
                    "sum_bytes": np.asarray(sb, dtype=np.int64),
                    "sumsq_bytes": np.asarray(sq, dtype=np.int64),
                    "hist": hists,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(gen, BYTE_STATS_SCHEMA)


BYTE_STATS_SQL = f"""
WITH chars AS (
  SELECT doc_id, ascii(c) AS b
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
),
hist AS (
  SELECT doc_id, b // 16 AS bin, count(*) AS cnt FROM chars GROUP BY 1, 2
),
bins AS (SELECT unnest(range(0, {N_BINS})) AS bin),
filled AS (
  SELECT d.doc_id, bins.bin, COALESCE(h.cnt, 0)::BIGINT AS cnt
  FROM (SELECT DISTINCT doc_id FROM hist) d
  CROSS JOIN bins
  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.bin = bins.bin
),
hist_arr AS (
  SELECT doc_id, list(cnt ORDER BY bin) AS hist FROM filled GROUP BY doc_id
)
SELECT c.doc_id,
       count(*)::BIGINT AS n_bytes,
       sum(b)::BIGINT AS sum_bytes,
       sum(b * b)::BIGINT AS sumsq_bytes,
       any_value(ha.hist) AS hist
FROM chars c JOIN hist_arr ha ON ha.doc_id = c.doc_id
GROUP BY c.doc_id
"""


def byte_stats_hashable(media: DataFrame, decode: str = "fake") -> DataFrame:
    """:func:`byte_stats` with the hist array folded to a CSV string so
    every output column is hashable by the grading driver's pandas
    canonicalizer (list cells break its sort_values). Value-equivalent:
    the CSV is a bijective rendering of the 16-bin histogram."""
    return byte_stats(media, decode).select(
        "doc_id",
        "n_bytes",
        "sum_bytes",
        "sumsq_bytes",
        F.array_join(F.transform("hist", lambda x: x.cast("string")), ",").alias("hist_csv"),
    )


BYTE_STATS_HASHABLE_SQL = f"""
SELECT doc_id, n_bytes, sum_bytes, sumsq_bytes,
       array_to_string(hist, ',') AS hist_csv
FROM ({BYTE_STATS_SQL})
"""


# ---------------------------------------------------------------------------
# Image resize (fake-decode → 2D grid → block-mean pool), mapInPandas
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, pixels array<long>"


def resize_images(media: DataFrame, factor: int = 2, decode: str = "fake") -> DataFrame:
    """(doc_id, out_w, out_h, pixels): interpret the payload as a
    meta.height × meta.width gray image (truncated/cycled to fit) and
    block-mean downsample by ``factor``. The resize kernel is the real
    thing (NumPy block reduction); only the pixel source is the fake
    decode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "out_w": [], "out_h": [], "pixels": []}
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                arr = _decode_bytes(payload, decode)
                img = np.resize(arr, (h, w)).astype(np.int64)  # cycle to fit
                oh, ow = h // factor, w // factor
                img = img[: oh * factor, : ow * factor]
                pooled = img.reshape(oh, factor, ow, factor).mean(axis=(1, 3))
                out["doc_id"].append(doc_id)
                out["out_w"].append(ow)
                out["out_h"].append(oh)
                out["pixels"].append(np.floor(pooled).astype(np.int64).ravel())
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload", "meta").mapInPandas(gen, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Video frame sampling (meta-driven explode + payload slice), mapInPandas
# ---------------------------------------------------------------------------

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_len long, frame_sum long"


def sample_frames(media: DataFrame, every: int = 2, decode: str = "fake") -> DataFrame:
    """(doc_id, frame_idx, frame_len, frame_sum): split the payload
    into meta.n_frames equal slices (last takes the remainder), keep
    every ``every``-th frame. The explode is meta-driven — planning
    can bound output size without reading payloads."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_sum": []}
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                nf = int(meta["n_frames"])
                arr = _decode_bytes(payload, decode).astype(np.int64)
                flen = arr.size // nf
                for fi in range(0, nf, every):
                    lo = fi * flen
                    hi = arr.size if fi == nf - 1 else lo + flen
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi)
                    out["frame_len"].append(hi - lo)
                    out["frame_sum"].append(int(arr[lo:hi].sum()))
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(out["doc_id"], dtype=np.int64),
                    "frame_idx": np.asarray(out["frame_idx"], dtype=np.int32),
                    "frame_len": np.asarray(out["frame_len"], dtype=np.int64),
                    "frame_sum": np.asarray(out["frame_sum"], dtype=np.int64),
                }
            )

    return media.select("doc_id", "payload", "meta").mapInPandas(gen, FRAME_SCHEMA)


def sample_frames_sql(every: int = 2) -> str:
    return f"""
WITH m AS (
  SELECT doc_id, text, length(text) AS n, (1 + doc_id % 7)::INT AS nf
  FROM documents
),
frames AS (
  SELECT doc_id, text, n, nf, n // nf AS flen,
         unnest(range(0, nf, {every})) AS frame_idx
  FROM m
),
sliced AS (
  SELECT doc_id, frame_idx::INT AS frame_idx,
         CASE WHEN frame_idx = nf - 1 THEN n - frame_idx * flen ELSE flen END::BIGINT AS frame_len,
         substr(text, 1 + frame_idx * flen,
                CASE WHEN frame_idx = nf - 1 THEN n - frame_idx * flen ELSE flen END) AS chunk
  FROM frames
)
SELECT doc_id, frame_idx, frame_len,
       COALESCE(list_sum(list_transform(string_split(chunk, ''), c -> ascii(c))), 0)::BIGINT AS frame_sum
FROM sliced
"""


def resize_images_hashable(media: DataFrame, factor: int = 2, decode: str = "fake") -> DataFrame:
    """:func:`resize_images` with the pixel array folded to a CSV
    string (same reason as :func:`byte_stats_hashable`: list cells
    break the grading driver's canonicalizer)."""
    return resize_images(media, factor, decode).select(
        "doc_id",
        "out_w",
        "out_h",
        F.array_join(F.transform("pixels", lambda x: x.cast("string")), ",").alias(
            "pixels_csv"
        ),
    )


def resize_images_sql(factor: int = 2) -> str:
    """DuckDB twin of the fake-decode resize: pixel (r, c) of the
    downsampled image is floor(mean of the factor×factor block) over
    the byte-cycled text interpreted as a meta.height × meta.width
    grid (same cycling rule as np.resize). Integer sums / exact float
    divide → floor matches bit-for-bit."""
    f = int(factor)
    # original-image byte at (rr, cc): text byte ((rr*w + cc) mod n) + 1
    def v(rr: str, cc: str) -> str:
        return f"ascii(substr(text, ((({rr}) * w + ({cc})) % n) + 1, 1))"

    block = " + ".join(
        v(f"(p // ow) * {f} + {dr}", f"(p % ow) * {f} + {dc}")
        for dr in range(f)
        for dc in range(f)
    )
    return f"""
WITH m AS (
  SELECT doc_id, text, length(text) AS n,
         (8 + doc_id % 8) AS w, (4 + doc_id % 4) AS h
  FROM documents
),
g AS (SELECT doc_id, text, n, w, (w // {f}) AS ow, (h // {f}) AS oh FROM m),
r AS (
  SELECT doc_id, ow, oh,
         list_transform(range(0, ow * oh), p -> floor(({block}) / {float(f * f)})::BIGINT) AS pixels
  FROM g
)
SELECT doc_id, ow::INT AS out_w, oh::INT AS out_h,
       array_to_string(pixels, ',') AS pixels_csv
FROM r
"""


# ---------------------------------------------------------------------------
# Audio: PCM WAV decode (codec-free) + sample-level feature extraction
# ---------------------------------------------------------------------------


def decode_audio(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real (codec-free) audio decode: RIFF/WAVE with 8-bit unsigned or
    16-bit signed PCM, parsed with NumPy only. Returns (sample_rate,
    channels, samples) — samples as int32 in interleaved frame order
    (8-bit values re-centered to signed by subtracting 128, per the
    WAV spec's unsigned-8-bit convention). Compressed codecs (MP3/AAC/
    float WAV) raise ValueError at the same seam as images."""
    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError(
            "unrecognized audio container: compressed codecs (MP3/AAC) "
            "need a cluster-side decoder — plug it in here"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM WAV (format={audio_format}, bits={bits})")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    else:
        n = len(data) // 2 * 2
        samples = np.frombuffer(data[:n], dtype="<i2").astype(np.int32)
    return sample_rate, channels, samples


AUDIO_STATS_SCHEMA = (
    "doc_id long, sample_rate int, channels int, n_samples long, "
    "sum_samples long, sumsq_samples long, peak int"
)


def audio_sample_stats(media: DataFrame) -> DataFrame:
    """(doc_id, sample_rate, channels, n_samples, sum/sumsq, peak):
    feature extraction over REAL-decoded PCM WAV payloads — the audio
    sibling of :func:`byte_stats`, same mapInPandas batch shape, sample
    domain instead of byte domain."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "channels", "n_samples",
                "sum_samples", "sumsq_samples", "peak",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, s = decode_audio(payload)
                s64 = s.astype(np.int64)
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["n_samples"].append(s.size)
                out["sum_samples"].append(int(s64.sum()))
                out["sumsq_samples"].append(int((s64 * s64).sum()))
                out["peak"].append(int(np.abs(s).max()) if s.size else 0)
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(out["doc_id"], dtype=np.int64),
                    "sample_rate": np.asarray(out["sample_rate"], dtype=np.int32),
                    "channels": np.asarray(out["channels"], dtype=np.int32),
                    "n_samples": np.asarray(out["n_samples"], dtype=np.int64),
                    "sum_samples": np.asarray(out["sum_samples"], dtype=np.int64),
                    "sumsq_samples": np.asarray(out["sumsq_samples"], dtype=np.int64),
                    "peak": np.asarray(out["peak"], dtype=np.int32),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(gen, AUDIO_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Video: Y4M (YUV4MPEG2, uncompressed) decode + per-frame features
# ---------------------------------------------------------------------------


def decode_video(payload: bytes) -> tuple[int, int, str, np.ndarray]:
    """Real (codec-free) video decode: YUV4MPEG2 — the standard
    UNCOMPRESSED video interchange container (plain-text header,
    ``FRAME`` markers, raw planar YUV) — parsed with NumPy only.
    Returns (height, width, colorspace, frames) with frames shaped
    (n_frames, frame_bytes): C420 frames carry w*h*3/2 bytes,
    C444 w*h*3, Cmono w*h. Compressed codecs (MP4/H.264/VP9) raise
    ValueError at the same seam as images/audio."""
    buf = bytes(payload)
    if not buf.startswith(b"YUV4MPEG2"):
        raise ValueError(
            "unrecognized video container: compressed codecs (MP4/H.264) "
            "need a cluster-side decoder — plug it in here"
        )
    nl = buf.index(b"\n")
    w = h = 0
    cs = "C420"
    for tok in buf[10:nl].split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C"):
            cs = tok.decode()
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cs.startswith("C420"):
        fbytes = w * h * 3 // 2
    elif cs.startswith("C444"):
        fbytes = w * h * 3
    elif cs.startswith("Cmono"):
        fbytes = w * h
    else:
        raise ValueError(f"unsupported Y4M colorspace {cs}")
    frames = []
    pos = nl + 1
    while pos < len(buf):
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt Y4M: missing FRAME marker")
        fnl = buf.index(b"\n", pos)
        start = fnl + 1
        frames.append(np.frombuffer(buf, dtype=np.uint8, count=fbytes, offset=start))
        pos = start + fbytes
    out = np.stack(frames) if frames else np.empty((0, fbytes), np.uint8)
    return h, w, cs, out


VIDEO_FRAME_STATS_SCHEMA = (
    "doc_id long, frame_idx int, luma_mean_ppm long, luma_min int, luma_max int"
)


def video_frame_stats(media: DataFrame, every: int = 1) -> DataFrame:
    """(doc_id, frame_idx, luma stats): per-frame feature extraction
    over REAL-decoded Y4M payloads — the video sibling of
    :func:`sample_frames`, real frame boundaries instead of equal
    slices. Luma = the Y plane (first w*h bytes of any supported
    colorspace); mean is integer ppm of the 0-255 range so results
    hash stably."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "frame_idx", "luma_mean_ppm", "luma_min", "luma_max",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                h, w, _, frames = decode_video(payload)
                luma = frames[:, : w * h].astype(np.int64)
                for fi in range(0, frames.shape[0], every):
                    y = luma[fi]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi)
                    out["luma_mean_ppm"].append(int(y.sum() * 1_000_000 // (255 * y.size)))
                    out["luma_min"].append(int(y.min()))
                    out["luma_max"].append(int(y.max()))
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(out["doc_id"], dtype=np.int64),
                    "frame_idx": np.asarray(out["frame_idx"], dtype=np.int32),
                    "luma_mean_ppm": np.asarray(out["luma_mean_ppm"], dtype=np.int64),
                    "luma_min": np.asarray(out["luma_min"], dtype=np.int32),
                    "luma_max": np.asarray(out["luma_max"], dtype=np.int32),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(gen, VIDEO_FRAME_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Planted-container packers: deterministic REAL payloads built in-plan
# from the documents table, so the codec-free decoders (PGM / PCM WAV /
# Y4M above) are exercised end-to-end by driver-checkable entries — the
# oracle recomputes the same features straight from the text, because
# the pack → decode pair is the identity on the planted bytes.
# ---------------------------------------------------------------------------

AUDIO_RATE = 16000


def pack_image(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): planted binary PGM — P5, a '#' comment line
    (exercising the header comment path), width = len(text), height 1,
    raster = the text's UTF-8 bytes. ``decode_image`` must undo exactly
    the header it wrote; any offset mistake shifts every sample."""

    @F.pandas_udf("binary")
    def pgm(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            data = t.encode("utf-8")
            out.append(
                b"P5\n# planted\n" + f"{len(data)} 1\n255\n".encode() + data
            )
        return pd.Series(out)

    return docs.select("doc_id", pgm("text").alias("payload"))


def pack_audio(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): planted RIFF/WAVE — mono, 16 kHz, 8-bit
    unsigned PCM, data chunk = the text's UTF-8 bytes (so decoded
    samples are ascii(c) − 128 per the WAV 8-bit convention)."""

    @F.pandas_udf("binary")
    def wav(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            data = t.encode("utf-8")
            n = len(data)
            hdr = (
                b"RIFF"
                + (36 + n).to_bytes(4, "little")
                + b"WAVE"
                + b"fmt "
                + (16).to_bytes(4, "little")
                + (1).to_bytes(2, "little")   # PCM
                + (1).to_bytes(2, "little")   # mono
                + AUDIO_RATE.to_bytes(4, "little")
                + AUDIO_RATE.to_bytes(4, "little")  # byte rate (1 B/frame)
                + (1).to_bytes(2, "little")   # block align
                + (8).to_bytes(2, "little")   # bits
                + b"data"
                + n.to_bytes(4, "little")
            )
            out.append(hdr + data)
        return pd.Series(out)

    return docs.select("doc_id", wav("text").alias("payload"))


def pack_video(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): planted YUV4MPEG2 — Cmono, the pack_media
    meta geometry (w = 8 + doc_id % 8, h = 4 + doc_id % 4, n_frames =
    1 + doc_id % 7), frame f's pixel p = byte ((f·w·h + p) mod n) of
    the text — the same cycling convention the resize/sample oracles
    use, so DuckDB can rebuild every frame from the text alone."""

    @F.pandas_udf("binary")
    def y4m(doc_ids: pd.Series, texts: pd.Series) -> pd.Series:
        out = []
        for doc_id, t in zip(doc_ids, texts):
            d = int(doc_id)
            w, h, nf = 8 + d % 8, 4 + d % 4, 1 + d % 7
            tb = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            n = tb.size
            fb = w * h
            head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode()
            parts = [head]
            for f_ in range(nf):
                idx = (np.arange(fb, dtype=np.int64) + f_ * fb) % n
                parts.append(b"FRAME\n" + tb[idx].tobytes())
            out.append(b"".join(parts))
        return pd.Series(out)

    return docs.select("doc_id", y4m("doc_id", "text").alias("payload"))


# DuckDB twins: features straight from the text (pack ∘ decode = id).
AUDIO_STATS_ORACLE_SQL = f"""
WITH chars AS (
  SELECT doc_id, ascii(c) - 128 AS s
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
)
SELECT doc_id,
       {AUDIO_RATE}::INT AS sample_rate,
       1::INT AS channels,
       count(*)::BIGINT AS n_samples,
       sum(s)::BIGINT AS sum_samples,
       sum(s * s)::BIGINT AS sumsq_samples,
       max(abs(s))::INT AS peak
FROM chars GROUP BY doc_id
"""

VIDEO_STATS_ORACLE_SQL = """
WITH m AS (
  SELECT doc_id, text, length(text) AS n,
         (8 + doc_id % 8) AS w, (4 + doc_id % 4) AS h, (1 + doc_id % 7) AS nf
  FROM documents
),
fr AS (
  SELECT doc_id, text, n, w * h AS fb, unnest(range(0, nf)) AS f FROM m
),
px AS (
  SELECT doc_id, f::INT AS frame_idx, fb,
         list_transform(range(0, fb),
                        p -> ascii(substr(text, ((f * fb + p) % n) + 1, 1))) AS vals
  FROM fr
)
SELECT doc_id, frame_idx,
       (list_sum(vals) * 1000000 // (255 * fb))::BIGINT AS luma_mean_ppm,
       list_min(vals)::INT AS luma_min,
       list_max(vals)::INT AS luma_max
FROM px
"""
