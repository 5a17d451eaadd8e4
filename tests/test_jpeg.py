"""Baseline JPEG (SOF0) codec: analytic DC-only exactness, round-trip
tolerance at each subsampling, rejection of unsupported variants, and the
image_or_fake_decoder seam dispatch (PNG / JPEG / fake)."""

from __future__ import annotations

import numpy as np
import pytest

from sfa_spark.operators.jpeg import (
    _DCT,
    _ZZ,
    _scale_q,
    _Q_LUM,
    decode_jpeg,
    encode_jpeg,
)


def test_zigzag_order_matches_spec_prefix():
    """First entries of the generated zigzag scan must be the spec's
    published sequence (T.81 Figure A.6)."""
    want = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert _ZZ[: len(want)].tolist() == want
    # a permutation of all 64 raster positions
    assert sorted(_ZZ.tolist()) == list(range(64))


def test_dct_matrix_is_orthonormal():
    np.testing.assert_allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)


def test_grey_dc_only_blocks_decode_exactly():
    """An image of flat 8×8 blocks quantizes to DC-only coefficients, so
    the decoded pixels have a closed form: round(q00·round(8·(v−128)/q00)
    /8 + 128). The decoder must reproduce it exactly — this pins the
    whole pipeline (marker parse, Huffman, dequant, IDCT, level shift)
    without any reference decoder in the container."""
    rng = np.random.default_rng(3)
    # even values + q00=16 (quality 50) keep every rounding step away
    # from .5 ties, so float-vs-analytic round directions can't diverge
    vals = 2 * rng.integers(0, 128, size=(4, 5))  # one value per 8×8 block
    img = np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    quality = 50
    data = encode_jpeg(img, quality=quality)
    got = decode_jpeg(data)
    q00 = int(_scale_q(_Q_LUM, quality)[0])
    assert q00 == 16
    dc = np.round(8.0 * (vals.astype(np.float64) - 128.0) / q00)
    expect = np.clip(np.round(q00 * dc / 8.0 + 128.0), 0, 255).astype(np.uint8)
    expect_img = np.kron(expect, np.ones((8, 8), dtype=np.uint8))[:, :, None]
    np.testing.assert_array_equal(got, expect_img)


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0", "4:2:2"])
def test_rgb_roundtrip_smooth_image(subsampling):
    """Smooth gradients survive encode→decode within a small tolerance at
    quality 95, including non-multiple-of-16 dimensions (edge padding +
    crop) and chroma subsampling."""
    y, x = np.mgrid[0:37, 0:29]
    img = np.stack(
        [
            (y * 4 + 20).clip(0, 255),
            (x * 5 + 10).clip(0, 255),
            ((x + y) * 3 + 40).clip(0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, quality=95, subsampling=subsampling))
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    tol = 8 if subsampling == "4:4:4" else 24  # chroma is floor-upsampled
    assert err.max() <= tol, (subsampling, err.max())
    assert err.mean() <= tol / 4


def test_grey_roundtrip_and_shapes():
    y, x = np.mgrid[0:19, 0:23]
    img = ((y * 7 + x * 3) % 256).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, quality=92))
    assert got.shape == (19, 23, 1)
    # high-frequency checkerboard-ish content: loose bound, right shape
    assert np.abs(got[:, :, 0].astype(int) - img.astype(int)).mean() < 32


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
def test_restart_intervals_decode_identically(subsampling):
    """DRI + RSTn markers (real web JPEGs use restarts): the decoder's
    segment-split + DC-predictor-reset path must yield EXACTLY the same
    pixels as the restart-free encoding of the same image."""
    rng = np.random.default_rng(5)
    img = np.stack(
        [
            np.add.outer(np.linspace(0, 180, 24), np.linspace(0, 60, 40)),
            rng.integers(0, 256, size=(24, 40)),
            np.add.outer(np.linspace(200, 0, 24), np.linspace(0, 30, 40)),
        ],
        axis=-1,
    ).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=80, subsampling=subsampling))
    with_rst = decode_jpeg(
        encode_jpeg(img, quality=80, subsampling=subsampling, restart_interval=2)
    )
    np.testing.assert_array_equal(with_rst, plain)


def test_fast_entropy_reader_matches_per_bit_reference_and_is_faster():
    """The flat-table entropy reader must decode EXACTLY what the
    per-bit reference reader decodes — across subsamplings, restart
    intervals, and a noisy (AC-heavy) image — and beat it ≥2× on the
    noisy image (the decode-CPU hot path; ~2.4× measured — the sparse
    coefficient restructure sped BOTH readers, tightening the ratio
    while roughly halving absolute decode time again)."""
    import time

    rng = np.random.default_rng(17)
    noisy = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    cases = [
        encode_jpeg(noisy, quality=90),
        encode_jpeg(noisy, quality=90, subsampling="4:2:0"),
        encode_jpeg(noisy, quality=80, restart_interval=3),
        encode_jpeg(noisy[:, :, 0], quality=95),
    ]
    for data in cases:
        np.testing.assert_array_equal(
            decode_jpeg(data, fast=True), decode_jpeg(data, fast=False)
        )

    big = encode_jpeg(noisy, quality=95)  # high quality → many AC symbols
    t0 = time.time()
    for _ in range(3):
        decode_jpeg(big, fast=False)
    t_ref = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        decode_jpeg(big, fast=True)
    t_fast = time.time() - t0
    assert t_ref / max(t_fast, 1e-9) >= 2.0, (t_ref, t_fast)


def test_rejects_non_jpeg_and_unsupported_processes():
    with pytest.raises(ValueError):
        decode_jpeg(b"definitely not a jpeg")
    import struct

    # arithmetic-coded (SOF9) and lossless (SOF3) stay NotImplementedError
    for sof_marker in (b"\xff\xc9", b"\xff\xc3"):
        hdr = b"\xff\xd8" + sof_marker + struct.pack(">H", 8) + bytes(6)
        with pytest.raises(NotImplementedError):
            decode_jpeg(hdr)
    # 12-bit precision rejected even for supported processes
    hdr12 = (
        b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 8)
        + struct.pack(">BHHB", 12, 8, 8, 1) + bytes(1)
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(hdr12)


@pytest.mark.parametrize(
    "kw",
    [
        {},  # grey handled below
        {"subsampling": "4:4:4"},
        {"subsampling": "4:2:0"},
        {"subsampling": "4:2:2"},
        {"subsampling": "4:2:0", "restart_interval": 2},
        {"restart_interval": 3, "quality": 80},
    ],
)
def test_progressive_decodes_bit_identical_to_sequential(kw):
    """A fully-refined progressive (SOF2) stream carries exactly the
    same quantized coefficients as the sequential encoding, so the two
    must decode BIT-IDENTICALLY — grey and RGB, every subsampling, with
    and without restart intervals, odd (non-multiple-of-16) dims."""
    rng = np.random.default_rng(21)
    if not kw:
        img = rng.integers(0, 256, size=(19, 23), dtype=np.uint8)
    else:
        y, x = np.mgrid[0:37, 0:29]
        img = np.stack(
            [
                (y * 4 + 20).clip(0, 255),
                rng.integers(0, 256, size=(37, 29)),
                ((x + y) * 3 + 40).clip(0, 255),
            ],
            axis=-1,
        ).astype(np.uint8)
    seq = decode_jpeg(encode_jpeg(img, **kw))
    prog_bytes = encode_jpeg(img, progressive=True, **kw)
    assert b"\xff\xc2" in prog_bytes  # SOF2 actually emitted
    np.testing.assert_array_equal(decode_jpeg(prog_bytes), seq)
    # the per-bit reference reader decodes progressive identically too
    np.testing.assert_array_equal(decode_jpeg(prog_bytes, fast=False), seq)


def test_progressive_truncation_decodes_partial_refinement():
    """Progressive streams cut after at least one complete scan decode
    to whatever refinement arrived (browser behavior): every cut point
    past scan 1 yields an image; a cut inside the FIRST scan raises."""
    y, x = np.mgrid[0:24, 0:24]
    img = np.stack(
        [(y * 6) % 256, (x * 6) % 256, ((x + y) * 4) % 256], axis=-1
    ).astype(np.uint8)
    prog = encode_jpeg(img, quality=85, progressive=True)
    full = decode_jpeg(prog)
    sos = [
        i
        for i in range(len(prog) - 1)
        if prog[i] == 0xFF and prog[i + 1] == 0xDA
    ]
    assert len(sos) == 8  # DC first + DC refine + 3×(AC first) + 3×(AC refine)
    # scan-boundary cut: decodes, and is coarser than the full image
    part = decode_jpeg(prog[: sos[3]])
    assert part.shape == full.shape
    assert not np.array_equal(part, full)
    # arbitrary cuts beyond the first scan always decode
    for cut in range(sos[1], len(prog) - 2, 11):
        got = decode_jpeg(prog[:cut])
        assert got.shape == full.shape
    # inside the first scan: unusable
    with pytest.raises(ValueError):
        decode_jpeg(prog[: sos[0] + 14])


def test_multi_scan_baseline_decodes_like_interleaved():
    """Spec-legal multi-scan BASELINE (one full sequential scan per
    component, SOF0) — previously rejected — must decode exactly like
    the interleaved single-scan encoding of the same coefficients."""
    import struct

    from sfa_spark.operators import jpeg as J

    y, x = np.mgrid[0:21, 0:26]
    img = np.stack(
        [(y * 9) % 256, (x * 7) % 256, ((x * y) // 2) % 256], axis=-1
    ).astype(np.uint8)
    quality = 85
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    q_lum = J._scale_q(J._Q_LUM, quality)
    q_chr = J._scale_q(J._Q_CHR, quality)
    q_zz = [q_lum[J._ZZ], q_chr[J._ZZ], q_chr[J._ZZ]]
    h_img, w_img = img.shape[:2]
    mcux, mcuy = -(-w_img // 8), -(-h_img // 8)
    comp_blocks = []
    for ci in range(3):
        p = planes[ci]
        p = np.pad(
            p,
            ((0, mcuy * 8 - p.shape[0]), (0, mcux * 8 - p.shape[1])),
            mode="edge",
        )
        comp_blocks.append(J._encode_plane_blocks(p - 128.0, q_zz[ci]))
    dc = J._canonical_codes(J._ENC_DC_BITS, J._ENC_DC_VALS)
    ac = J._canonical_codes(J._ENC_AC_BITS, J._ENC_AC_VALS)

    def seg(m, body):
        return bytes([0xFF, m]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(q_lum[J._ZZ].astype(np.uint8)))
    out += seg(0xDB, bytes([0x01]) + bytes(q_chr[J._ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h_img, w_img, 3)
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for tc in (0, 1):
        bits, vals = (
            (J._ENC_DC_BITS, J._ENC_DC_VALS)
            if tc == 0
            else (J._ENC_AC_BITS, J._ENC_AC_VALS)
        )
        out += seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
    for ci in range(3):
        ent = J._emit_scan(
            ([ci], 0, 63, 0, 0),
            comp_blocks,
            [(1, 1)] * 3,
            mcux,
            mcuy,
            dc,
            ac,
            0,
            h_img,
            w_img,
        )
        out += seg(0xDA, bytes([1, ci + 1, 0x00, 0, 63, 0]))
        out += ent
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    want = decode_jpeg(encode_jpeg(img, quality=quality))
    np.testing.assert_array_equal(got, want)


def test_image_or_fake_decoder_dispatch():
    """The grown seam: PNG bytes take the PNG path, baseline JPEG bytes
    the JPEG path, anything else the deterministic fake."""
    from sfa_spark.operators.multimodal import fake_image_decoder, image_or_fake_decoder
    from sfa_spark.operators.png import encode_png

    rng = np.random.default_rng(11)
    meta = {"width": 6, "height": 4, "channels": 3}

    png_img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        image_or_fake_decoder(encode_png(png_img), meta), png_img
    )

    flat = np.full((8, 8), 77, dtype=np.uint8)
    got = image_or_fake_decoder(encode_jpeg(flat, quality=90), meta)
    assert got.shape == (8, 8, 1)
    assert np.abs(got.astype(int) - 77).max() <= 3  # decoded, not faked

    junk = b"GIF89a" + bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    np.testing.assert_array_equal(
        image_or_fake_decoder(junk, meta), fake_image_decoder(junk, meta)
    )


def test_extract_features_with_jpeg_payloads(spark):
    """The Spark-side multimodal plumbing runs real JPEG decode inside
    mapInPandas: features equal the pooled decode of each payload."""
    import pandas as pd

    from sfa_spark.operators.multimodal import extract_features, image_or_fake_decoder

    rng = np.random.default_rng(7)
    rows = []
    imgs = {}
    for i in range(6):
        h, w = 8 * int(rng.integers(2, 5)), 8 * int(rng.integers(2, 5))
        base = np.add.outer(np.linspace(0, 200, h), np.linspace(0, 40, w)) % 256
        img = np.stack(
            [base, (base + 30) % 256, (base + 90) % 256], axis=-1
        ).astype(np.uint8)
        payload = encode_jpeg(img, quality=95)
        imgs[i] = payload
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "payload": payload,
                "meta": {
                    "width": w,
                    "height": h,
                    "channels": 3,
                    "sample_rate": None,
                    "duration_ms": None,
                },
            }
        )
    media = spark.createDataFrame(
        pd.DataFrame(rows),
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,channels:int,sample_rate:int,duration_ms:int>",
    )
    feats = (
        extract_features(media, decoder=image_or_fake_decoder, pool=8)
        .toPandas()
        .set_index("media_id")
    )
    for i, payload in imgs.items():
        img = decode_jpeg(payload).astype(np.float64)
        h = (img.shape[0] // 8) * 8
        w = (img.shape[1] // 8) * 8
        pooled = (
            img[:h, :w]
            .reshape(h // 8, 8, w // 8, 8, -1)
            .mean(axis=(1, 3))
            .astype(np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(feats.loc[i, "features"], dtype=np.float32), pooled.ravel()
        )
