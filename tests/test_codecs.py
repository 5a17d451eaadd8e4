"""Gorilla / delta-of-delta round-trip exactness (FIXTURES.md golden #4):
decode(encode(x)) == x bit-exactly, incl. ±0, denormals, inf, extreme
timestamps. Property-tested with hypothesis where available.
"""

from __future__ import annotations

import numpy as np
import pytest

from sfa_spark.codecs import dod_decode, dod_encode, gorilla_decode, gorilla_encode


def rt_values(x):
    got = gorilla_decode(gorilla_encode(np.asarray(x, dtype=np.float64)))
    np.testing.assert_array_equal(
        np.asarray(x, dtype=np.float64).view(np.uint64), got.view(np.uint64)
    )


def rt_ts(t):
    got = dod_decode(dod_encode(np.asarray(t, dtype=np.int64)))
    np.testing.assert_array_equal(np.asarray(t, dtype=np.int64), got)


def test_gorilla_empty_single_repeat():
    rt_values([])
    rt_values([3.14])
    rt_values([2.5] * 100)  # all-zero XOR → ~1 bit/value


def test_gorilla_edge_floats():
    rt_values([0.0, -0.0, 1.0, -1.0, np.inf, -np.inf,
               np.finfo(np.float64).tiny, 5e-324, np.finfo(np.float64).max])


def test_gorilla_random_walk():
    rng = np.random.default_rng(42)
    rt_values(np.cumsum(rng.standard_normal(10_000)))


def test_gorilla_compresses_smooth_series():
    x = np.full(1000, 123.456)
    blob = gorilla_encode(x)
    assert len(blob) < 1000 * 8 / 8  # way below raw size


def test_dod_empty_one_two():
    rt_ts([])
    rt_ts([1_700_000_000_000_000])
    rt_ts([10, 70])


def test_dod_regular_spacing_is_tiny():
    t = np.arange(0, 10_000) * 60_000_000 + 1_700_000_000_000_000
    blob = dod_encode(t)
    rt_ts(t)
    # regular spacing → ~1 bit per point after the header
    assert len(blob) < 24 + 10_000 // 8 + 16


def test_dod_buckets_and_overflow():
    base = 1_700_000_000_000_000
    # deltas engineered to hit every bucket incl. the 64-bit fallback
    deltas = [60, 60, 61, 2, 200, 1, 300, 4000, 10**12, 5, 60]
    t = np.cumsum([base] + deltas)
    rt_ts(t)


def test_dod_negative_and_duplicate_ts():
    rt_ts([-5, -5, -5, 0, 10, 10, 3])


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 500))
    vals = rng.standard_normal(n) * 10.0 ** float(rng.integers(-300, 300))
    rt_values(vals)
    ts = np.sort(rng.integers(-(2**62), 2**62, size=n))
    rt_ts(ts)


def test_hypothesis_roundtrip():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.floats(allow_nan=False), max_size=200))
    def inner_vals(xs):
        rt_values(xs)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=200))
    def inner_ts(ts):
        rt_ts(ts)

    inner_vals()
    inner_ts()


def test_dod_encode_dense_byte_identical():
    import numpy as np

    from sfa_spark.codecs import dod_encode, dod_encode_dense

    for t0, step, n in [(0, 60_000_000, 0), (5, 1, 1), (5, 7, 2), (1_600_000_000_000_000, 60_000_000, 3),
                        (123, 60_000_000, 4096), (-50, 3, 17)]:
        ts = t0 + step * np.arange(n, dtype=np.int64)
        assert dod_encode_dense(t0, step, n) == dod_encode(ts), (t0, step, n)
