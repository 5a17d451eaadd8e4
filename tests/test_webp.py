"""WebP-lossless (VP8L) codec tests.

External vectors: (1) the published 26-byte minimal WebP (a
hand-minimized but libwebp-valid VP8L file exercising the
color-indexing + sub-byte packing path), and (2) CPython's bundled
``python.webp`` test image (Lib/test/test_email/data, PSF-licensed
public test data, copied to tests/fixtures/python_lossy_alpha.webp) —
its ALPH chunk is a REAL libwebp-encoded VP8L entropy stream whose
decoded plane must show the Python-logo silhouette. Everything else
round-trips through the fixture encoder path by path.
"""

import base64
import hashlib
import os

import numpy as np
import pytest

from sfa_spark.operators.webp import (
    _plane_codes,
    decode_webp,
    encode_webp_lossless,
    webp_alpha_plane,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "python_lossy_alpha.webp")

# published minimal lossless WebP (widely circulated 26-byte vector)
MINIMAL = base64.b64decode("UklGRhoAAABXRUJQVlA4TA0AAAAvAAAAEAcQERGIiP4HAA==")


def test_plane_code_table_matches_spec_head():
    """First 40 entries of the distance-to-plane mapping, hand-checked
    against the published spec table (RFC 9649 §3.6.2.3)."""
    expect = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    ]
    table = _plane_codes()
    assert len(table) == 120
    assert table[:40] == expect


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"subtract_green": True},
        {"predictor_mode": 1},
        {"predictor_mode": 2},
        {"predictor_mode": 5},
        {"predictor_mode": 11},
        {"predictor_mode": 12},
        {"predictor_mode": 13},
        {"subtract_green": True, "predictor_mode": 7},
        {"cache_bits": 4},
        {"subtract_green": True, "predictor_mode": 10, "cache_bits": 5},
    ],
)
def test_round_trip_rgb(kw):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(img, **kw))
    assert out.shape == img.shape
    assert (out == img).all()


def test_round_trip_rgba_and_alpha_classification():
    rng = np.random.default_rng(11)
    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    rgba[0, 0, 3] = 7  # guarantee a non-opaque pixel
    out = decode_webp(encode_webp_lossless(rgba, predictor_mode=6))
    assert out.shape == rgba.shape and (out == rgba).all()
    # fully-opaque RGBA input comes back as RGB (content-determined)
    rgba[:, :, 3] = 255
    out = decode_webp(encode_webp_lossless(rgba))
    assert out.shape == (8, 8, 3)
    assert (out == rgba[:, :, :3]).all()


@pytest.mark.parametrize("ncol,shape", [(2, (9, 17)), (4, (6, 10)), (13, (7, 11)), (200, (20, 20))])
def test_round_trip_palette_all_packings(ncol, shape):
    """Color-indexing transform at every packing width (8/4/2/1 px per
    green byte)."""
    rng = np.random.default_rng(ncol)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, shape)]
    out = decode_webp(encode_webp_lossless(img, palette=True))
    assert (out == img).all()


def test_round_trip_row_copy_lz77():
    """Repeated rows emit real LZ77 copies through distance plane code
    (0, 1); decode must mirror color-cache inserts on copied pixels."""
    rng = np.random.default_rng(3)
    img = np.repeat(rng.integers(0, 256, (4, 12, 3), dtype=np.uint8), 3, axis=0)
    out = decode_webp(encode_webp_lossless(img, row_copy=True, cache_bits=3))
    assert (out == img).all()
    out = decode_webp(encode_webp_lossless(img, row_copy=True))
    assert (out == img).all()


def test_single_color_image():
    img = np.full((5, 31, 3), 129, dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(img, palette=True))
    assert (out == img).all()
    assert (decode_webp(encode_webp_lossless(img)) == img).all()


def test_minimal_published_webp_external_vector():
    out = decode_webp(MINIMAL)
    assert out.shape == (1, 1, 4)
    assert out.ravel().tolist() == [0, 0, 0, 0]  # one transparent pixel


def test_real_libwebp_alpha_plane_is_python_logo():
    payload = open(FIXTURE, "rb").read()
    plane = webp_alpha_plane(payload)
    assert plane.shape == (16, 16) and plane.dtype == np.uint8
    # silhouette facts: transparent corners, opaque body
    assert plane[0, 0] == 0 and plane[0, -1] == 0
    assert plane[-1, 0] == 0 and plane[-1, -1] == 0
    assert plane[6, 2] == 255 and plane[9, 8] == 255
    assert 90 < plane.mean() < 220
    # regression pin of the full decoded plane
    assert hashlib.md5(plane.tobytes()).hexdigest() == "fa1667e19ae1b259be670911674006a6"


def test_fast_table_reader_parity_and_speed(monkeypatch):
    """The flat-table symbol reader must be bit-identical to the
    per-bit walk oracle on every path (incl. the real libwebp alpha
    stream) and ≥2× faster on a literal-heavy decode (measured ~4×)."""
    import time

    import sfa_spark.operators.webp as W

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    payloads = [
        encode_webp_lossless(img),
        encode_webp_lossless(img, subtract_green=True, predictor_mode=11, cache_bits=5),
        MINIMAL,
    ]
    alpha_payload = open(FIXTURE, "rb").read()

    def run():
        outs = [decode_webp(p) for p in payloads]
        outs.append(webp_alpha_plane(alpha_payload))
        return outs

    t0 = time.perf_counter()
    fast = run()
    t_fast = time.perf_counter() - t0
    monkeypatch.setattr(W, "_FAST_TABLES", False)
    t0 = time.perf_counter()
    slow = run()
    t_slow = time.perf_counter() - t0
    for a, b in zip(fast, slow):
        assert (a == b).all()
    assert t_slow / t_fast >= 2.0, (t_fast, t_slow)


def test_predictor_span_vectorization_parity_and_speed():
    """The coalesced-run predictor inverse must match the per-pixel
    reference on random residuals across all 14 modes and random block
    tilings, and be ≥3× faster on a T-mode image (the common smooth-
    region case; measured ~10×)."""
    import time

    import sfa_spark.operators.webp as W

    rng = np.random.default_rng(2)
    for _ in range(25):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        bits = int(rng.integers(2, 5))
        img = rng.integers(0, 2**32, (h, w), dtype=np.uint32)
        sh, sw = -(-h // (1 << bits)), -(-w // (1 << bits))
        sub = rng.integers(0, 14, (sh, sw), dtype=np.uint32) << 8
        assert np.array_equal(
            W._inv_predictor(img, bits, sub), W._inv_predictor_ref(img, bits, sub)
        )
    img = rng.integers(0, 2**32, (256, 256), dtype=np.uint32)
    sub = np.full((16, 16), 2 << 8, dtype=np.uint32)
    t0 = time.perf_counter()
    a = W._inv_predictor(img, 4, sub)
    t1 = time.perf_counter()
    b = W._inv_predictor_ref(img, 4, sub)
    t2 = time.perf_counter()
    assert np.array_equal(a, b)
    assert (t2 - t1) / (t1 - t0) >= 3.0, (t1 - t0, t2 - t1)


def test_lossy_vp8_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_webp(open(FIXTURE, "rb").read())  # VP8X + lossy VP8 + ALPH


def test_corrupt_payloads_raise_value_error():
    with pytest.raises(ValueError):
        decode_webp(b"NOTRIFFxxxxxxxxx")
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
    good = encode_webp_lossless(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_webp(good[:-6])  # truncated bitstream
    bad = bytearray(good)
    bad[20] ^= 0xFF  # corrupt the VP8L signature byte
    with pytest.raises(ValueError):
        decode_webp(bytes(bad))


def test_seam_dispatch():
    from sfa_spark.operators.multimodal import fake_image_decoder, image_or_fake_decoder

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    meta = {"width": 6, "height": 10, "channels": 3}
    out = image_or_fake_decoder(encode_webp_lossless(img, subtract_green=True), meta)
    assert (out == img).all()
    # lossy VP8 container falls through to the deterministic fake
    lossy = open(FIXTURE, "rb").read()
    out = image_or_fake_decoder(lossy, meta)
    assert (out == fake_image_decoder(lossy, meta)).all()


def test_extract_features_end_to_end_with_real_webp(spark):
    """mapInPandas batch kernel over real WebP payloads."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sfa_spark.operators.multimodal import MEDIA_SCHEMA, extract_features, image_or_fake_decoder

    rng = np.random.default_rng(21)
    rows = []
    for i in range(6):
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "payload": encode_webp_lossless(img, predictor_mode=i % 14),
                "meta": {"width": 16, "height": 16, "channels": 3,
                         "sample_rate": None, "duration_ms": None},
            }
        )
    media = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    feats = extract_features(media, decoder=image_or_fake_decoder, pool=8).collect()
    assert len(feats) == 6
    assert all(len(r["features"]) == 4 * 3 for r in feats)
