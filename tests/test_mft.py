"""MFT kernel property tests — mirrors the reference MFTTest
(/root/reference/src/test/java/sfa/transformation/MFTTest.java): the
windowed MFT must equal the per-window DFT of the z-normed subsequence,
swept over even/odd windows, l>w, odd l, normMean × lowerBounding.
Pure numpy — no Spark needed.
"""

from __future__ import annotations

import numpy as np
import pytest

from sfa_spark.transform import mft

WINDOWS = [4, 16, 19, 32, 33, 64]
LS = [2, 4, 5, 6, 8, 10, 12, 14, 16]


def walk(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.cumsum(rng.standard_normal(n))


@pytest.mark.parametrize("window_size", WINDOWS)
@pytest.mark.parametrize("method", ["mft", "fft"])
def test_transform_windowing_equals_per_window_dft(window_size, method):
    x = walk(1024, 7)
    for l in LS:
        for norm_mean in (True, False):
            for lower_bounding in (True, False):
                got = mft.transform_windowing(
                    x, window_size, l, norm_mean, lower_bounding, method=method
                )
                n_windows = x.size - window_size + 1
                assert got.shape == (n_windows, l)
                means, stds = mft.incremental_mean_std(x, window_size)
                for i in [0, 1, 2, n_windows // 2, n_windows - 1]:
                    wdata = x[i : i + window_size].copy()
                    inv = 1.0 / stds[i] if stds[i] != 0 else 1.0
                    normed = (wdata - means[i]) * inv if norm_mean else wdata * inv
                    want = mft.transform(normed, window_size, l, norm_mean, lower_bounding)
                    np.testing.assert_allclose(
                        got[i], want, atol=1e-7,
                        err_msg=f"w={window_size} l={l} nm={norm_mean} lb={lower_bounding} i={i}",
                    )


def test_transform_zero_padding_beyond_window():
    # MFTTest.java:43-49: coefficients beyond the window are zero
    for window_size in (4, 8):
        x = walk(window_size, 3)
        for norm_mean in (True, False):
            out = mft.transform(x, window_size, 16, norm_mean, True)
            start = window_size - (2 if norm_mean else 0)
            assert np.all(out[start:] == 0.0)


def test_dft_distance_lower_bounds_euclidean():
    # MFTTest.java:52-69
    for window_size in WINDOWS:
        q = walk(window_size, 1)
        ts = walk(window_size, 2)
        for l in LS:
            for norm_mean in (True, False):
                dq = mft.transform(q, window_size, l, norm_mean, True)
                dt = mft.transform(ts, window_size, l, norm_mean, True)
                ed = np.sum((q - ts) ** 2)
                lb = np.sum((dq - dt) ** 2)
                assert lb < ed


def test_incremental_mean_std_vs_naive():
    x = walk(32, 11)
    for window_size in (16, 32):
        means, stds = mft.incremental_mean_std(x, window_size)
        for i in range(x.size - window_size + 1):
            wdata = x[i : i + window_size]
            np.testing.assert_allclose(means[i], wdata.mean(), atol=1e-9)
            np.testing.assert_allclose(stds[i], wdata.std(), atol=1e-9)


def test_incremental_mean_std_window_larger_than_series():
    # TimeSeries.java contract: divide by windowSize even with fewer points
    x = walk(32, 11)
    for window_size in (64, 128):
        means, stds = mft.incremental_mean_std(x, window_size)
        assert means.shape == (1,)
        np.testing.assert_allclose(means[0], x.sum() / window_size, atol=1e-12)


def test_znorm_sigma_zero_guard():
    x = np.full(8, 3.25)
    out = mft.znorm(x, True)
    np.testing.assert_array_equal(out, np.zeros(8))  # (x-mean)*1.0
    out2 = mft.znorm(x, False)
    np.testing.assert_array_equal(out2, x)  # σ=0 → factor 1


def test_mft_method_equals_fft_method():
    x = walk(2048, 5)
    for window_size in (16, 33, 64):
        for l in (4, 8, 16):
            a = mft.transform_windowing(x, window_size, l, True, True, method="mft")
            b = mft.transform_windowing(x, window_size, l, True, True, method="fft")
            np.testing.assert_allclose(a, b, atol=1e-7)
