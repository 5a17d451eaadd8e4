"""GIF codec: a published external decode vector, LZW property fuzz
across width boundaries and table resets, exact round-trips (plain /
interlaced / transparent / animated), frame counting, and the
image_or_fake_decoder seam dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from sfa_spark.operators.gif import (
    _interlace_order,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_frame_count,
)

# The widely-published smallest transparent GIF (43 bytes): 1×1 screen,
# 2-color global table, GCE declaring index 0 transparent, one pixel of
# index 0. An encoder-independent decode vector — our decoder and
# encoder can't share a bias through it.
_TINY_TRANSPARENT_GIF = bytes.fromhex(
    "474946383961"  # GIF89a
    "010001008000 00"  # 1×1 screen, GCT present (2 colors), bg 0
    "ffffff 000000"  # palette: white, black
    "21f904 01000000 00"  # GCE: transparency on, index 0
    "2c 00000000 01000100 00"  # image descriptor 1×1, no LCT
    "02 0244 0100"  # LZW min 2; data: clear, idx0, EOI
    "3b".replace(" ", "")
)


def test_published_tiny_gif_decodes():
    img = decode_gif(_TINY_TRANSPARENT_GIF)
    assert img.shape == (1, 1, 4)
    assert img[0, 0, 3] == 0  # the single pixel is transparent
    assert gif_frame_count(_TINY_TRANSPARENT_GIF) == 1


def test_lzw_roundtrip_fuzz_width_boundaries_and_table_reset():
    """Random index streams over every LZW min-code size, long enough
    to cross several width bumps and (for small palettes) the 4096
    table reset — decode(encode(x)) must be exact."""
    rng = np.random.default_rng(3)
    for trial in range(40):
        mc = int(rng.integers(2, 9))
        n = int(rng.integers(1, 20000))
        seq = rng.integers(0, 1 << mc, size=n, dtype=np.uint8).tobytes()
        got = _lzw_decode(_lzw_encode(seq, mc), mc, n)
        assert got.tobytes() == seq, (trial, mc, n)


def test_lzw_rejects_corrupt_codes():
    with pytest.raises(ValueError):
        # a code far beyond the table right after clear
        _lzw_decode(bytes([0b10111_100]), 2, 4)


def test_interlace_order_is_the_specs_four_passes():
    assert _interlace_order(10).tolist() == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    # a permutation for any height
    for h in (1, 2, 7, 16, 33):
        assert sorted(_interlace_order(h).tolist()) == list(range(h))


@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_exact(interlace):
    rng = np.random.default_rng(11)
    img = (rng.integers(0, 8, size=(13, 17, 3), dtype=np.uint8) * 32).astype(
        np.uint8
    )
    got = decode_gif(encode_gif(img, interlace=interlace))
    np.testing.assert_array_equal(got, img)


def test_transparency_roundtrip():
    rng = np.random.default_rng(12)
    img = (rng.integers(1, 8, size=(9, 11, 3), dtype=np.uint8) * 30).astype(
        np.uint8
    )
    img[0:3, 0:5] = (0, 0, 0)
    got = decode_gif(encode_gif(img, transparent_color=(0, 0, 0)))
    assert got.shape == (9, 11, 4)
    assert (got[0:3, 0:5, 3] == 0).all()
    opaque = got[:, :, 3] == 255
    assert opaque.sum() == 9 * 11 - 15
    np.testing.assert_array_equal(got[:, :, :3][opaque], img[opaque])


def test_animated_frames_decode_independently():
    rng = np.random.default_rng(13)
    base = (rng.integers(0, 6, size=(8, 12, 3), dtype=np.uint8) * 40).astype(
        np.uint8
    )
    frames = [base, np.roll(base, 3, axis=1), np.roll(base, 6, axis=0)]
    data = encode_gif(frames)
    assert gif_frame_count(data) == 3
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(decode_gif(data, frame=i), f)
    with pytest.raises(ValueError):
        decode_gif(data, frame=3)


def test_rejects_non_gif_and_truncation():
    with pytest.raises(ValueError):
        decode_gif(b"not a gif at all")
    img = np.full((8, 8, 3), 9, dtype=np.uint8)
    data = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(data[: len(data) // 2])


def test_seam_dispatches_real_gif():
    """image_or_fake_decoder now decodes GIF for real (round 4's fake
    fallback for GIF payloads is gone); junk still reaches the fake."""
    from sfa_spark.operators.multimodal import (
        fake_image_decoder,
        image_or_fake_decoder,
    )

    meta = {"width": 6, "height": 4, "channels": 3}
    img = np.full((4, 6, 3), 200, dtype=np.uint8)
    img[:2] = (8, 16, 24)
    np.testing.assert_array_equal(
        image_or_fake_decoder(encode_gif(img), meta), img
    )
    junk = b"RIFF....WEBPVP8 " + bytes(range(48))
    np.testing.assert_array_equal(
        image_or_fake_decoder(junk, meta), fake_image_decoder(junk, meta)
    )
