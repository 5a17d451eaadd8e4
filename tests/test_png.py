"""Stdlib PNG codec: round-trips, all five scanline filters, corrupt
payloads, and the multimodal seam running with a REAL decoder."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sfa_spark.operators.png import (
    decode_png,
    encode_png,
    png_or_fake_decoder,
)


def _ref_filter(img: np.ndarray, ftype: int) -> bytes:
    """Per-byte reference forward filter (spec pseudocode, slow)."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for y in range(h):
        out.append(ftype)
        for x in range(stride):
            raw = int(flat[y, x])
            a = int(flat[y, x - c]) if x >= c else 0
            b = int(flat[y - 1, x]) if y > 0 else 0
            cc = int(flat[y - 1, x - c]) if (x >= c and y > 0) else 0
            if ftype == 0:
                v = raw
            elif ftype == 1:
                v = raw - a
            elif ftype == 2:
                v = raw - b
            elif ftype == 3:
                v = raw - ((a + b) // 2)
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = raw - pred
            out.append(v & 0xFF)
    return bytes(out)


def _png_with_filter(img: np.ndarray, ftype: int) -> bytes:
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(_ref_filter(img, ftype))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_channel_counts(channels):
    rng = np.random.default_rng(channels)
    img = rng.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    back = decode_png(encode_png(img))
    np.testing.assert_array_equal(back, img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_every_filter_type(ftype):
    """Each of the five spec filters, forward-applied by the per-byte
    reference, must reconstruct exactly through the vectorized decoder."""
    rng = np.random.default_rng(ftype + 10)
    img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    back = decode_png(_png_with_filter(img, ftype))
    np.testing.assert_array_equal(back, img)


@pytest.mark.parametrize("bpp", [1, 2, 3, 4])
def test_fast_defilter_rows_match_numpy_reference(bpp):
    """The plain-Python-int Paeth/Average row kernels must reconstruct
    exactly what the per-column numpy reference does, for every pixel
    width (chained rows: each output feeds the next row's prev)."""
    from sfa_spark.operators.png import _avg_row, _paeth_row, _paeth_row_ref

    rng = np.random.default_rng(bpp)
    prev_fast = prev_ref = np.zeros(37 * bpp, dtype=np.uint8)
    for _ in range(8):
        row = rng.integers(0, 256, 37 * bpp).astype(np.uint8)
        fast = _paeth_row(row, prev_fast, bpp)
        ref = _paeth_row_ref(row, prev_ref, bpp)
        np.testing.assert_array_equal(fast, ref)
        prev_fast, prev_ref = fast, ref
    # Average vs the spec pseudocode reference, chained as well
    prev = np.zeros(37 * bpp, dtype=np.uint8)
    for _ in range(4):
        row = rng.integers(0, 256, 37 * bpp).astype(np.uint8)
        got = _avg_row(row, prev, bpp)
        want = np.zeros_like(row)
        for x in range(row.size):
            left = int(want[x - bpp]) if x >= bpp else 0
            want[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        np.testing.assert_array_equal(got, want)
        prev = got


def test_paeth_defilter_micro_bench_gate():
    """VERDICT r4 #3: the Paeth hot path (web PNGs are Paeth-heavy) must
    beat the per-pixel-column numpy reference ≥5× on a 256×256 RGB
    image's worth of scanlines (measured ~14×; the gate is slack for
    host noise — same pattern as the batched-verify kernel gate)."""
    import time

    from sfa_spark.operators.png import _paeth_row, _paeth_row_ref

    rng = np.random.default_rng(0)
    h, w, c = 256, 256, 3
    rows = [rng.integers(0, 256, w * c).astype(np.uint8) for _ in range(h)]
    prev = rng.integers(0, 256, w * c).astype(np.uint8)

    # best-of-3 per arm (single-shot flips on host noise; bench.py policy)
    t_ref, t_fast = float("inf"), float("inf")
    for _ in range(3):
        t0 = time.time()
        for r in rows:
            _paeth_row_ref(r, prev, c)
        t_ref = min(t_ref, time.time() - t0)
        t0 = time.time()
        for r in rows:
            _paeth_row(r, prev, c)
        t_fast = min(t_fast, time.time() - t0)
    assert t_ref / max(t_fast, 1e-9) >= 5.0, (t_ref, t_fast)


def test_decode_gradient_compresses_and_roundtrips():
    """A smooth gradient (the filterable case) still round-trips."""
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack([(y * 3) % 256, (x * 2) % 256, ((x + y) * 5) % 256], axis=-1).astype(
        np.uint8
    )
    data = encode_png(img)
    np.testing.assert_array_equal(decode_png(data), img)


def test_decoder_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"definitely not a png")
    # 16-bit depth → NotImplementedError (seam stays documented)
    img = np.zeros((4, 4, 3), np.uint8)
    data = bytearray(encode_png(img))
    # IHDR body starts at offset 16; depth byte is at 16+8
    data[24] = 16
    with pytest.raises(NotImplementedError):
        decode_png(bytes(data))


def test_png_or_fake_decoder_dispatch():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    meta = {"width": 32, "height": 24, "channels": 3}
    got = png_or_fake_decoder(encode_png(img), meta)
    np.testing.assert_array_equal(got, img)
    fake = png_or_fake_decoder(b"plain text bytes", meta)
    assert fake.shape == (24, 32, 3)


def test_extract_features_with_real_png_payloads(spark):
    """The multimodal seam end-to-end with the REAL decoder: PNG payloads
    through mapInPandas pooling == numpy pooling of the source images."""
    from pyspark.sql import functions as F

    from sfa_spark.operators.multimodal import extract_features

    rng = np.random.default_rng(21)
    imgs = [
        rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8) for _ in range(6)
    ]
    rows = [
        (i, "image", bytearray(encode_png(img)), (32, 24, 3, None, None))
        for i, img in enumerate(imgs)
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, channels:int, "
        "sample_rate:int, duration_ms:int>",
    )
    feats = (
        extract_features(media, decoder=decode_png)
        .orderBy("media_id")
        .toPandas()
    )
    for i, img in enumerate(imgs):
        pooled = (
            img.astype(np.float64).reshape(3, 8, 4, 8, 3).mean(axis=(1, 3))
        ).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(feats["features"].iloc[i], dtype=np.float32),
            pooled.ravel(),
        )
