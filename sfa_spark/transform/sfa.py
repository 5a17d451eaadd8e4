"""SFA: Multiple Coefficient Binning (MCB) + quantization kernels (numpy).

Reproduces the semantics of the reference SFA
(/root/reference/src/main/java/sfa/transformation/SFA.java) over numpy
arrays; the Spark layer feeds these from Arrow batches. Hazard H2
(SURVEY.md §7.2): the equi-depth rule must match the reference literally —
sorted orderline per coefficient, values rounded to 2 decimals at FIT time
only (SFA.java:398), edge placed at the current value once the running
count exceeds ceil(depth*(pos+1)) skipping duplicate edges
(SFA.java:432-447), untouched edges stay at the +∞ sentinel
(SFA.java:97-100, Double.MAX_VALUE ≡ +inf for quantization purposes).

Quantization (SFA.java:181-218): symbol = number of bin edges ≤ value,
i.e. ``np.searchsorted(edges, value, side='right')``.

Equi-width (SFA.java:412-427 — dispatched by the *misnamed* enum
``EQUI_FREQUENCY``, SFA.java:360-366): edges = first + (last-first)/α·(c+1).

Word packing (Classifier.java:146-175): symbol i occupies bit range
[i·bits, (i+1)·bits) of a 60-bit-capped long, LSB-first.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import math

import numpy as np

from sfa_spark.transform import mft as _mft

#: Java's entropy() precomputes 1/ln(2) and multiplies (SFA.java:474)
_LOG2_INV = 1.0 / math.log(2.0)


def java_round2dp(values: np.ndarray) -> np.ndarray:
    """``Math.round(v*100.0)/100.0`` (SFA.java:397-398): Java rounds half
    UP (floor(x+0.5)), numpy's ``np.round`` rounds half to EVEN — they
    differ whenever v*100 lands exactly on .5, which flips orderline
    positions and therefore bins. Mirror Java exactly."""
    return np.floor(np.asarray(values, dtype=np.float64) * 100.0 + 0.5) / 100.0

EQUI_DEPTH = "EQUI_DEPTH"
EQUI_FREQUENCY = "EQUI_FREQUENCY"  # reference quirk: dispatches equi-WIDTH
INFORMATION_GAIN = "INFORMATION_GAIN"  # supervised (SFASupervised default)


def fit_bins_equi_depth(sorted_values: np.ndarray, alphabet_size: int) -> np.ndarray:
    """Equi-depth edges for ONE coefficient from its ascending orderline.

    Literal port of the reference RULE (not code): walk the sorted values,
    place an edge at the current value when the 1-based count exceeds
    ceil(depth·(pos+1)), unless it would duplicate the previous edge.
    """
    n = sorted_values.size
    edges = np.full(alphabet_size - 1, np.inf, dtype=np.float64)
    depth = n / alphabet_size
    pos = 0
    for count, value in enumerate(sorted_values, start=1):
        if pos >= alphabet_size - 1:
            break
        if count > np.ceil(depth * (pos + 1)) and (
            pos == 0 or edges[pos - 1] != value
        ):
            edges[pos] = value
            pos += 1
    return edges


def fit_bins_equi_width(sorted_values: np.ndarray, alphabet_size: int) -> np.ndarray:
    if sorted_values.size == 0:
        return np.full(alphabet_size - 1, np.inf, dtype=np.float64)
    first, last = sorted_values[0], sorted_values[-1]
    width = (last - first) / alphabet_size
    return first + width * np.arange(1, alphabet_size)


def _entropy(counts: dict[float, int], total: float) -> float:
    """Java-exact SFA.entropy (SFA.java:472-483): double division, so
    total==0 with a positive count gives p=+Inf and entropy -Inf (the
    caller's gain then becomes NaN and loses every >= comparison, i.e.
    the reference silently SKIPS those split candidates — reproduced);
    total<0 gives negative p, skipped, entropy 0."""
    e = 0.0
    for v in counts.values():
        if total == 0:
            if v > 0:
                return float("-inf")
            continue  # 0/0 = NaN in Java, not > 0 → skipped
        p = v / total
        if p > 0:
            # mirror Java's exact arithmetic: p*log(p)*(1/log 2), not log2(p)
            e -= p * math.log(p) * _LOG2_INV
    return e


def fit_bins_info_gain(
    values: np.ndarray, labels: np.ndarray, alphabet_size: int
) -> np.ndarray:
    """Information-gain binning for ONE coefficient (supervised).

    Literal port of the reference RULE (SFA.java:452-556): recursive best
    label-entropy split over the (value,label)-sorted orderline; gain
    evaluated only where the label changes; split budget halves per
    recursion; edge value = element[split+1].value. The reference passes
    the ABSOLUTE index as total_c_in into the gain for recursive calls —
    reproduced as-is (quirk).
    """
    order = np.lexsort((labels, values))
    vals = np.asarray(values, dtype=np.float64)[order]
    labs = np.asarray(labels, dtype=np.float64)[order]
    splits: list[int] = []

    def find_best_split(start: int, end: int, remaining: int) -> None:
        total = end - start
        if total <= 0:
            return
        c_in: dict[float, int] = {}
        c_out: dict[float, int] = {}
        for pos in range(start, end):
            c_out[labs[pos]] = c_out.get(labs[pos], 0) + 1
        class_entropy = _entropy(c_out, total)
        best_gain, best_pos = -1.0, -1

        def move(pos: int) -> None:
            lbl = labs[pos]
            c_in[lbl] = c_in.get(lbl, 0) + 1
            c_out[lbl] -= 1

        i = start
        last_label = labs[i]
        move(start)
        i += 1
        for split in range(start + 1, end - 1):
            label = labs[i]
            move(split)
            i += 1
            if label != last_label:
                t_in = i  # reference quirk: absolute index, not count
                t_out = total - t_in
                gain = (
                    class_entropy
                    - t_in / total * _entropy(c_in, t_in)
                    - t_out / total * _entropy(c_out, t_out)
                )
                if gain >= best_gain:
                    best_gain, best_pos = gain, split
            last_label = label
        if best_pos > -1:
            splits.append(best_pos)
            remaining //= 2
            if remaining > 1:
                if best_pos - start > 2 and end - best_pos > 2:
                    find_best_split(start, best_pos, remaining)
                    find_best_split(best_pos, end, remaining)
                elif end - best_pos > 4:
                    find_best_split(best_pos, (end - best_pos) // 2, remaining)
                    find_best_split((end - best_pos) // 2, end, remaining)
                elif best_pos - start > 4:
                    find_best_split(start, (best_pos - start) // 2, remaining)
                    find_best_split((best_pos - start) // 2, end, remaining)

    find_best_split(0, vals.size, alphabet_size)
    edges = np.full(alphabet_size - 1, np.inf, dtype=np.float64)
    for j, sp in enumerate(sorted(splits)[: alphabet_size - 1]):
        if sp + 1 < vals.size:
            edges[j] = vals[sp + 1]
    return edges


def quantize(approx: np.ndarray, bins: np.ndarray) -> np.ndarray:
    """(…, l) Fourier values → (…, l) symbols via per-coefficient edges.

    ``bins``: (l, alphabet-1) monotonic edges with +inf sentinels.
    """
    approx = np.asarray(approx, dtype=np.float64)
    l = bins.shape[0]
    out = np.empty(approx.shape, dtype=np.int16)
    flat = approx.reshape(-1, approx.shape[-1])
    oflat = out.reshape(-1, out.shape[-1])
    for i in range(min(l, approx.shape[-1])):
        oflat[:, i] = np.searchsorted(bins[i], flat[:, i], side="right")
    return out


def pack_words(words: np.ndarray, word_length: int, used_bits: int) -> np.ndarray:
    """(n, l) symbol matrix → (n,) packed int64, symbol i at bits
    [i·used_bits, (i+1)·used_bits), capped at 60//used_bits symbols
    (Classifier.java:146-175)."""
    words = np.asarray(words, dtype=np.int64)
    k = min(words.shape[-1], word_length, 60 // used_bits)
    shifts = (np.arange(k) * used_bits).astype(np.int64)
    return (words[..., :k] << shifts).sum(axis=-1)


def mask_word_length(packed: np.ndarray, length: int, used_bits: int) -> np.ndarray:
    """Truncate packed words to their first ``length`` symbols
    (BOSS.java:122-125 masking trick)."""
    mask = (np.int64(1) << np.int64(length * used_bits)) - np.int64(1)
    return np.asarray(packed, dtype=np.int64) & mask


@dataclass
class SFAModel:
    """Fitted SFA: the small broadcastable artifact (replaces the
    reference's Java-serialized model, SFA.java:577-594)."""

    word_length: int
    alphabet_size: int
    norm_mean: bool
    lower_bounding: bool
    window_size: int  # MFT window (whole-series length in fitTransform mode)
    histogram_type: str = EQUI_DEPTH
    bins: np.ndarray = field(default=None, repr=False)  # (l, alphabet-1)

    @property
    def needed_bits(self) -> int:
        # reference parity: Words.binlog(alphabetSize) = floor(log2 α)
        # (Classifier.java:125-144) — for non-power-of-2 alphabets this
        # under-allocates bits (reference quirk, e.g. α=6 → 2 bits cannot
        # hold symbols 4-5); all shipped configs use powers of 2, asserted
        # so the quirk can't silently corrupt packed words here
        assert self.alphabet_size & (self.alphabet_size - 1) == 0, (
            "non-power-of-2 alphabet would corrupt packed words "
            "(reference binlog quirk)"
        )
        return self.alphabet_size.bit_length() - 1

    def to_dict(self) -> dict:
        d = self.__dict__.copy()
        d["bins"] = self.bins.tolist()
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "SFAModel":
        d = dict(d)
        d["bins"] = np.asarray(d["bins"], dtype=np.float64)
        return cls(**d)

    # --- transform paths -------------------------------------------------
    def transform(self, series: np.ndarray) -> np.ndarray:
        """One whole series → SFA word (SFA.java:125-136): z-norm, DFT
        approximation, quantize. Note: fillOrderline always full-z-norms
        the series (norm() subtracts mean AND divides σ) regardless of
        normMean, which only controls the DC drop inside the MFT."""
        x = _mft.znorm(series, norm_mean=True)
        approx = _mft.transform(
            x, self.window_size, self.word_length, self.norm_mean, self.lower_bounding
        )
        return quantize(approx, self.bins)

    def transform_windowing(
        self, series: np.ndarray, method: str = "mft"
    ) -> np.ndarray:
        """All sliding windows of one series → (n_windows, l) symbols
        (SFA.java:291-300)."""
        approx = _mft.transform_windowing(
            series,
            self.window_size,
            self.word_length,
            self.norm_mean,
            self.lower_bounding,
            method=method,
        )
        return quantize(approx, self.bins)

    def transform_windowing_packed(
        self, series: np.ndarray, word_length: int | None = None, method: str = "mft"
    ) -> np.ndarray:
        words = self.transform_windowing(series, method=method)
        return pack_words(words, word_length or self.word_length, self.needed_bits)


def _fit_bins(orderline_per_coef: list[np.ndarray], alphabet_size: int, histogram_type: str) -> np.ndarray:
    fit = fit_bins_equi_depth if histogram_type == EQUI_DEPTH else fit_bins_equi_width
    return np.stack([fit(np.sort(v), alphabet_size) for v in orderline_per_coef])


def fit_transform(
    samples: list[np.ndarray],
    word_length: int,
    alphabet_size: int,
    norm_mean: bool,
    lower_bounding: bool = True,
    histogram_type: str = EQUI_DEPTH,
    window_size: int | None = None,
) -> tuple[SFAModel, np.ndarray]:
    """Whole-series fit+transform (SFA.java:349-379): z-norm each sample,
    DFT-approximate, fit MCB bins on the 2-dp-rounded values, quantize the
    UN-rounded values. MFT window = first sample's length (SFA.java:353-355;
    ragged samples are zero-padded/truncated like the reference)."""
    w = window_size or len(samples[0])
    approx = np.stack(
        [
            _mft.transform(_mft.znorm(s, True), w, word_length, norm_mean, lower_bounding)
            for s in samples
        ]
    )
    rounded = java_round2dp(approx)  # SFA.java:398
    bins = _fit_bins(list(rounded.T), alphabet_size, histogram_type)
    model = SFAModel(
        word_length=word_length,
        alphabet_size=alphabet_size,
        norm_mean=norm_mean,
        lower_bounding=lower_bounding,
        window_size=w,
        histogram_type=histogram_type,
        bins=bins,
    )
    return model, quantize(approx, bins)


def disjoint_windows(x: np.ndarray, window_size: int) -> list[np.ndarray]:
    """Tumbling windows (TimeSeries.java:256-271): floor(n/w) full chunks."""
    x = np.asarray(x, dtype=np.float64)
    amount = x.size // window_size
    return [x[i * window_size : (i + 1) * window_size] for i in range(amount)]


def fit_windowing(
    samples: list[np.ndarray],
    window_size: int,
    word_length: int,
    alphabet_size: int,
    norm_mean: bool,
    lower_bounding: bool = True,
    histogram_type: str = EQUI_DEPTH,
) -> SFAModel:
    """Fit bins on the DISJOINT windows of the training series
    (SFA.java:269-279): each tumbling window is normed with norm(normMean)
    — σ-divide always, mean-subtract only if normMean — then fed through
    the whole-series fit."""
    windows: list[np.ndarray] = []
    for s in samples:
        for wdata in disjoint_windows(s, window_size):
            windows.append(_mft.znorm(wdata, norm_mean))
    # fillOrderline's norm() is a no-op on already-normed windows
    # (TimeSeries.isNormed() guard), so fit directly on the windows:
    w = window_size
    approx = np.stack(
        [
            _mft.transform(wd, w, word_length, norm_mean, lower_bounding)
            for wd in windows
        ]
    )
    rounded = java_round2dp(approx)
    bins = _fit_bins(list(rounded.T), alphabet_size, histogram_type)
    return SFAModel(
        word_length=word_length,
        alphabet_size=alphabet_size,
        norm_mean=norm_mean,
        lower_bounding=lower_bounding,
        window_size=window_size,
        histogram_type=histogram_type,
        bins=bins,
    )
