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


def test_gorilla_encode_runs_byte_identical():
    """gorilla_encode_runs(vals, lens) ≡ gorilla_encode(np.repeat(vals,
    lens)) byte-for-byte — including NaN runs, equal adjacent runs
    (zero-XOR boundary → no record), zero-length runs (dropped, later
    duplicate wins), single runs and length-1 totals."""
    from sfa_spark.codecs import gorilla_encode_runs

    rng = np.random.default_rng(7)
    cases = [
        (np.array([1.5]), np.array([1])),
        (np.array([1.5]), np.array([4096])),
        (np.array([np.nan, 2.0, 2.0, -3.5]), np.array([5, 3, 7, 1])),
        (np.array([np.nan]), np.array([100])),
        (np.array([0.0, 0.0]), np.array([1, 1])),
        (np.array([1.0, 2.0, 3.0]), np.array([2, 0, 5])),  # zero-length run
        (np.array([], dtype=np.float64), np.array([], dtype=np.int64)),
    ]
    for _ in range(50):
        k = int(rng.integers(1, 40))
        vals = np.where(
            rng.random(k) < 0.15,
            np.nan,
            rng.standard_normal(k) * 10.0 ** float(rng.integers(-3, 4)),
        )
        # occasional exact repeats across a boundary
        for i in range(1, k):
            if rng.random() < 0.2:
                vals[i] = vals[i - 1]
        lens = rng.integers(0, 50, size=k)
        cases.append((vals, lens))
    for vals, lens in cases:
        dense = np.repeat(vals, lens)
        assert gorilla_encode_runs(vals, lens) == gorilla_encode(dense), (vals, lens)


def test_gorilla_encode_runs_blocks_byte_identical():
    """Batched multi-block encoding ≡ per-block gorilla_encode_runs ≡
    dense gorilla_encode, byte-for-byte — including empty blocks (n=0),
    single-run blocks, NaN carries and zero-length runs."""
    from sfa_spark.codecs import gorilla_encode_runs, gorilla_encode_runs_blocks

    rng = np.random.default_rng(11)
    for trial in range(30):
        nblocks = int(rng.integers(1, 25))
        vals_parts, lens_parts, bounds = [], [], [0]
        for _ in range(nblocks):
            k = int(rng.integers(0, 8))
            v = np.where(rng.random(k) < 0.2, np.nan, rng.standard_normal(k))
            for i in range(1, k):
                if rng.random() < 0.25:
                    v[i] = v[i - 1]
            ln = rng.integers(0, 60, size=k)
            vals_parts.append(v)
            lens_parts.append(ln)
            bounds.append(bounds[-1] + k)
        rv = np.concatenate(vals_parts) if vals_parts else np.empty(0)
        rl = np.concatenate(lens_parts) if lens_parts else np.empty(0, dtype=np.int64)
        out = gorilla_encode_runs_blocks(rv, rl, np.array(bounds))
        assert len(out) == nblocks
        for b, (v, ln) in enumerate(zip(vals_parts, lens_parts)):
            want = gorilla_encode_runs(v, ln)
            assert out[b] == want, (trial, b, v, ln)
            assert out[b] == gorilla_encode(np.repeat(v, ln))
