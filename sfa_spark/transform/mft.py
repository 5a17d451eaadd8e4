"""Momentary Fourier Transform + DFT approximation kernels (pure numpy).

Reproduces the semantics of the reference MFT
(/root/reference/src/main/java/sfa/transformation/MFT.java) — NOT its code:
the reference runs a per-window sequential complex recurrence in Java; here
the same recurrence is solved in closed form and vectorized with numpy
(cumulative-sum formulation), so a whole series transforms in a handful of
C-level array ops. Used inside ``applyInPandas`` per series.

Layout notes (hazard H1 in SURVEY.md §7.2): the reference stores Fourier
values in JTransforms ``realForward`` interleaved layout
``[Re c0, Re c_{n/2}, Re c1, Im c1, Re c2, Im c2, ...]`` and then zeroes
slot 1 (MFT.java:66,141), so the effective layout is
``[Re c0, 0, Re c1, Im c1, ...]`` under the e^{-2πi jk/n} (numpy) sign
convention. We build that layout from ``np.fft.rfft`` directly.

Semantics reproduced exactly:
* ``transform`` — MFT.java:62-82: zero-pad/truncate to windowSize, FFT,
  zero slot 1, copy ``min(windowSize-startOffset, l)`` values from
  ``startOffset`` (=2 if normMean else 0), scale by ``norm``
  (=1/sqrt(windowSize) if lowerBounding) with alternating sign (+,-,+,-).
* ``transform_windowing`` — MFT.java:96-155: word length =
  min/max(windowSize, l+startOffset) forced even; first window by FFT,
  later windows by the recurrence F_k(t) = (F_k(t-1) + x[t+w-1] - x[t-1])
  * e^{+2πik/w}; per-window scale by (1/σ_t)·norm with alternating sign
  (MFT.java:188-196, σ_t>0 guard).
* ``incremental_mean_std`` — TimeSeries.java:218-248 incl. its edge cases
  (window > series length: sum over available points, divide by window).
* ``znorm`` — TimeSeries.java:52-117: population σ via E[x²]-μ² with the
  σ=0 → factor 1.0 guard (TimeSeries.java:82).
"""

from __future__ import annotations

import numpy as np


def znorm(x: np.ndarray, norm_mean: bool = True) -> np.ndarray:
    """Z-normalize like TimeSeries.norm(normMean): always divide by the
    population σ (guarding σ=0 → 1.0); subtract the mean only if
    ``norm_mean``.

    Bit-mirrors the reference's SEQUENTIAL sums (calculateMean /
    calculateStddev, TimeSeries.java:101-128) via ``np.cumsum`` (a
    sequential loop, unlike ``np.sum``'s pairwise blocks): on a constant
    window the variance residual is pure float noise whose SIGN depends
    on summation order — the reference can get buf≈1e-16 > 0 and divide
    by σ≈1e-8 (blowing the window up by 1e8); matching the order makes
    this engine degenerate identically, which the MUSE/WEASEL bin parity
    depends on."""
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        return x
    mean = np.cumsum(x)[-1] / x.size
    buf = (1.0 / x.size) * np.cumsum(x * x)[-1] - mean * mean
    std = np.sqrt(buf) if buf > 0 else 0.0
    inv = 1.0 / std if std != 0 else 1.0
    if norm_mean:
        return (x - mean) * inv
    if inv != 1.0:  # TimeSeries.java:89-93 skips the multiply when inv==1
        return x * inv
    return x


def _interleave_rfft(window: np.ndarray, n_slots: int) -> np.ndarray:
    """FFT one window into the reference's effective slot layout.

    JTransforms ``realForward`` keeps ``w`` doubles; after the reference
    zeroes slot 1 (which held Re[w/2] for even w / Im[(w-1)/2] for odd w,
    MFT.java:66,141) the surviving layout equals the plain interleave
    ``[Re c0, Im c0(=0 → slot zeroed), Re c1, Im c1, ...]`` truncated at
    ``w`` doubles. Slots beyond ``w`` are zero (mftData is zero-init and
    only ``min(wl, w)`` doubles are copied, MFT.java:144).
    """
    w = window.size
    c = np.fft.rfft(window)
    full = np.empty(2 * c.size, dtype=np.float64)
    full[0::2] = c.real
    full[1::2] = c.imag
    full[1] = 0.0
    slots = np.zeros(n_slots, dtype=np.float64)
    m = min(w, n_slots, full.size)
    slots[:m] = full[:m]
    return slots


def _alternating_sign(length: int) -> np.ndarray:
    s = np.ones(length, dtype=np.float64)
    s[1::2] = -1.0
    return s


def transform(
    x: np.ndarray,
    window_size: int,
    l: int,
    norm_mean: bool,
    lower_bounding: bool = True,
) -> np.ndarray:
    """DFT approximation of one (whole) series: first ``l`` Fourier values.

    Mirrors MFT.transform (MFT.java:62-82).
    """
    x = np.asarray(x, dtype=np.float64)
    start_offset = 2 if norm_mean else 0
    norm = 1.0 / np.sqrt(window_size) if lower_bounding else 1.0

    data = np.zeros(window_size, dtype=np.float64)
    m = min(window_size, x.size)
    data[:m] = x[:m]
    slots = _interleave_rfft(data, window_size)

    out = np.zeros(l, dtype=np.float64)
    length = min(window_size - start_offset, l)
    if length > 0:
        out[:length] = slots[start_offset : start_offset + length]
    return out * (norm * _alternating_sign(l))


def incremental_mean_std(x: np.ndarray, window_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Sliding mean/σ for every length-``window_size`` window.

    Same contract as TimeSeries.calcIncrementalMeanStddev
    (TimeSeries.java:218-248): output length max(1, n-w+1); divides by the
    window size even when fewer points exist; σ=0 clamp via max(buf,0).
    Vectorized with cumulative sums instead of the reference's running
    accumulator.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    end = max(1, n - window_size + 1)
    r = 1.0 / window_size
    # Bit-mirror the reference's RUNNING accumulator: sum_t = ((S0 + d1)
    # + d2) + …, with d_j = x[j+W-1] - x[j-1] as ONE subtraction per step
    # (TimeSeries.java:254-266) — np.cumsum is a sequential loop, so the
    # float rounding matches exactly. On near-constant windows the sign
    # of buf (≈1e-16) decides between σ=0 and a 1e8 blow-up through
    # 1/σ, so matching the op order is a parity requirement, not pedantry.
    w0 = x[: min(n, window_size)]
    s0 = np.cumsum(w0)[-1] if w0.size else 0.0
    q0 = np.cumsum(w0 * w0)[-1] if w0.size else 0.0
    if end > 1:
        d = x[window_size:n] - x[0 : n - window_size]
        e = x[window_size:n] * x[window_size:n] - x[0 : n - window_size] * x[0 : n - window_size]
        sums = np.cumsum(np.concatenate(([s0], d)))
        sqsums = np.cumsum(np.concatenate(([q0], e)))
    else:
        sums = np.array([s0])
        sqsums = np.array([q0])
    means = sums * r
    buf = sqsums * r - means * means
    stds = np.sqrt(np.maximum(buf, 0.0))
    stds[buf <= 0] = 0.0
    return means, stds


def effective_word_length(
    window_size: int, l: int, norm_mean: bool, use_max_or_min: bool = False
) -> int:
    """MFT.java:97-100: min (WEASEL) or max (MUSE) of window and l+offset,
    forced even."""
    start_offset = 2 if norm_mean else 0
    wl = (
        max(window_size, l + start_offset)
        if use_max_or_min
        else min(window_size, l + start_offset)
    )
    return wl + (wl % 2)


def transform_windowing(
    x: np.ndarray,
    window_size: int,
    l: int,
    norm_mean: bool,
    lower_bounding: bool = True,
    use_max_or_min: bool = False,
    apply_z_norm: bool = True,
    method: str = "mft",
) -> np.ndarray:
    """All sliding windows → (n_windows, l) matrix of Fourier values.

    ``method="mft"``: closed-form vectorization of the reference recurrence
    (MFT.java:121-134) — O(n·l) total:
        F_k(t) = e^{iθ_k t} · (F_k(0) + Σ_{j=1..t} D_j e^{-iθ_k (j-1)}),
        θ_k = 2πk/w,  D_j = x[j+w-1] - x[j-1]
    ``method="fft"``: batch per-window rfft (the oracle used by tests).
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    start_offset = 2 if norm_mean else 0
    norm = 1.0 / np.sqrt(window_size) if lower_bounding else 1.0
    wl = effective_word_length(window_size, l, norm_mean, use_max_or_min)
    n_windows = max(1, n - window_size + 1)

    means, stds = incremental_mean_std(x, window_size)

    # --- slot matrix: (n_windows, wl) interleaved Fourier values ---
    if method == "fft" or n_windows == 1:
        if n_windows == 1:
            windows = np.zeros((1, window_size))
            m = min(n, window_size)
            windows[0, :m] = x[:m]
        else:
            windows = np.lib.stride_tricks.sliding_window_view(x, window_size)
        c = np.fft.rfft(windows, axis=1)
        full = np.empty((n_windows, 2 * c.shape[1]), dtype=np.float64)
        full[:, 0::2] = c.real
        full[:, 1::2] = c.imag
        full[:, 1] = 0.0
        slots = np.zeros((n_windows, wl), dtype=np.float64)
        m = min(window_size, wl, full.shape[1])
        slots[:, :m] = full[:, :m]
    elif method == "mft":
        n_coef = wl // 2
        first = _interleave_rfft(
            np.pad(x[:window_size], (0, max(0, window_size - n))), wl
        )
        f0 = first[0::2] + 1j * first[1::2]  # (n_coef,)
        theta = 2.0 * np.pi * np.arange(n_coef) / window_size  # φ_k = e^{+iθ_k}
        d = x[window_size:n] - x[0 : n - window_size]  # D_j, j=1..n_windows-1
        j = np.arange(d.size)
        # S_k(t) = cumsum_j D_j e^{-iθ_k (j-1)} ; outer over k
        damp = np.exp(-1j * np.outer(j, theta))  # (t-1, n_coef)
        s = np.cumsum(d[:, None] * damp, axis=0)
        t = np.arange(1, n_windows)
        rot = np.exp(1j * np.outer(t, theta))
        fk = np.empty((n_windows, n_coef), dtype=np.complex128)
        fk[0] = f0
        if n_windows > 1:
            fk[1:] = rot * (f0[None, :] + s)
        slots = np.empty((n_windows, wl), dtype=np.float64)
        slots[:, 0::2] = fk.real
        slots[:, 1::2] = fk.imag
    else:
        raise ValueError(f"unknown method {method!r}")

    # --- copy l values from startOffset, zero-pad (MFT.java:148-149) ---
    out = np.zeros((n_windows, l), dtype=np.float64)
    length = min(l, wl - start_offset)
    if length > 0:
        out[:, :length] = slots[:, start_offset : start_offset + length]

    # --- per-window normalization (MFT.java:188-196) ---
    factor = np.full(n_windows, norm, dtype=np.float64)
    if apply_z_norm:
        pos = stds > 0
        factor[pos] = norm / stds[pos]
    return out * factor[:, None] * _alternating_sign(l)[None, :]


# --------------------------------------------------------------------------
# batched (multi-series / multi-window) variants — bit-identical to mapping
# the scalar functions, with numpy dispatch paid once per BATCH instead of
# once per series/window. At 10^9 series the per-group python overhead is
# the scale bottleneck, not the math.
# --------------------------------------------------------------------------

def znorm_rows(X: np.ndarray, norm_mean: bool = True) -> np.ndarray:
    """Row-wise :func:`znorm` over an (N, w) matrix — same sequential
    cumsum-order sums per row, same σ=0 → factor 1.0 guard."""
    X = np.asarray(X, dtype=np.float64)
    if X.shape[1] == 0:
        return X.copy()
    w = X.shape[1]
    mean = np.cumsum(X, axis=1)[:, -1] / w
    buf = (1.0 / w) * np.cumsum(X * X, axis=1)[:, -1] - mean * mean
    pos = buf > 0
    std = np.where(pos, np.sqrt(np.where(pos, buf, 1.0)), 0.0)
    inv = np.where(std != 0, 1.0 / np.where(std != 0, std, 1.0), 1.0)
    if norm_mean:
        return (X - mean[:, None]) * inv[:, None]
    return X * inv[:, None]  # ×1.0 is a bitwise no-op for finite values


def transform_rows(
    X: np.ndarray,
    window_size: int,
    l: int,
    norm_mean: bool,
    lower_bounding: bool = True,
) -> np.ndarray:
    """Row-wise :func:`transform` over an (N, m≤window_size) matrix of
    (already-normed) windows — one batched rfft for the whole stack."""
    X = np.asarray(X, dtype=np.float64)
    n_rows, m = X.shape
    start_offset = 2 if norm_mean else 0
    norm = 1.0 / np.sqrt(window_size) if lower_bounding else 1.0
    data = np.zeros((n_rows, window_size), dtype=np.float64)
    data[:, : min(m, window_size)] = X[:, : min(m, window_size)]
    c = np.fft.rfft(data, axis=1)
    full = np.empty((n_rows, 2 * c.shape[1]), dtype=np.float64)
    full[:, 0::2] = c.real
    full[:, 1::2] = c.imag
    full[:, 1] = 0.0
    slots = np.zeros((n_rows, window_size), dtype=np.float64)
    k = min(window_size, full.shape[1])
    slots[:, :k] = full[:, :k]
    out = np.zeros((n_rows, l), dtype=np.float64)
    length = min(window_size - start_offset, l)
    if length > 0:
        out[:, :length] = slots[:, start_offset : start_offset + length]
    return out * (norm * _alternating_sign(l))[None, :]


def incremental_mean_std_rows(
    X: np.ndarray, window_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Row-wise :func:`incremental_mean_std` over (S, n) equal-length
    series — same running-accumulator op order per row (cumsum)."""
    X = np.asarray(X, dtype=np.float64)
    s, n = X.shape
    end = max(1, n - window_size + 1)
    r = 1.0 / window_size
    w0 = X[:, : min(n, window_size)]
    s0 = np.cumsum(w0, axis=1)[:, -1] if w0.shape[1] else np.zeros(s)
    q0 = np.cumsum(w0 * w0, axis=1)[:, -1] if w0.shape[1] else np.zeros(s)
    if end > 1:
        d = X[:, window_size:n] - X[:, : n - window_size]
        e = (
            X[:, window_size:n] * X[:, window_size:n]
            - X[:, : n - window_size] * X[:, : n - window_size]
        )
        sums = np.cumsum(np.concatenate([s0[:, None], d], axis=1), axis=1)
        sqsums = np.cumsum(np.concatenate([q0[:, None], e], axis=1), axis=1)
    else:
        sums = s0[:, None]
        sqsums = q0[:, None]
    means = sums * r
    buf = sqsums * r - means * means
    stds = np.sqrt(np.maximum(buf, 0.0))
    stds[buf <= 0] = 0.0
    return means, stds


def transform_windowing_rows(
    X: np.ndarray,
    window_size: int,
    l: int,
    norm_mean: bool,
    lower_bounding: bool = True,
    apply_z_norm: bool = True,
) -> np.ndarray:
    """Row-wise :func:`transform_windowing` (mft recurrence) over (S, n)
    equal-length series with n ≥ window_size → (S, n_windows, l).

    Same closed-form recurrence, complex cumsum along the window axis
    (sequential per series, bit-matching the scalar path); the batch
    shares the θ/rotation tables across series.
    """
    X = np.asarray(X, dtype=np.float64)
    s, n = X.shape
    if n < window_size:
        raise ValueError("transform_windowing_rows requires n >= window_size")
    start_offset = 2 if norm_mean else 0
    norm = 1.0 / np.sqrt(window_size) if lower_bounding else 1.0
    wl = effective_word_length(window_size, l, norm_mean)
    n_windows = n - window_size + 1

    means, stds = incremental_mean_std_rows(X, window_size)

    n_coef = wl // 2
    # first window per series — one batched rfft
    c = np.fft.rfft(X[:, :window_size], axis=1)
    full = np.empty((s, 2 * c.shape[1]), dtype=np.float64)
    full[:, 0::2] = c.real
    full[:, 1::2] = c.imag
    full[:, 1] = 0.0
    first = np.zeros((s, wl), dtype=np.float64)
    k = min(window_size, wl, full.shape[1])
    first[:, :k] = full[:, :k]
    f0 = first[:, 0::2] + 1j * first[:, 1::2]  # (S, n_coef)

    theta = 2.0 * np.pi * np.arange(n_coef) / window_size
    fk = np.empty((s, n_windows, n_coef), dtype=np.complex128)
    fk[:, 0] = f0
    if n_windows > 1:
        d = X[:, window_size:n] - X[:, : n - window_size]  # (S, T-1)
        j = np.arange(n_windows - 1)
        damp = np.exp(-1j * np.outer(j, theta))  # (T-1, n_coef)
        sacc = np.cumsum(d[:, :, None] * damp[None, :, :], axis=1)
        t = np.arange(1, n_windows)
        rot = np.exp(1j * np.outer(t, theta))
        fk[:, 1:] = rot[None, :, :] * (f0[:, None, :] + sacc)
    slots = np.empty((s, n_windows, wl), dtype=np.float64)
    slots[:, :, 0::2] = fk.real
    slots[:, :, 1::2] = fk.imag

    out = np.zeros((s, n_windows, l), dtype=np.float64)
    length = min(l, wl - start_offset)
    if length > 0:
        out[:, :, :length] = slots[:, :, start_offset : start_offset + length]

    factor = np.full((s, n_windows), norm, dtype=np.float64)
    if apply_z_norm:
        pos = stds > 0
        factor[pos] = norm / stds[pos]
    return out * factor[:, :, None] * _alternating_sign(l)[None, None, :]
