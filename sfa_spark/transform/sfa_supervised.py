"""Supervised SFA: ANOVA-F coefficient selection (T10).

Reference: transformation/SFASupervised.java:39-222 — fit the usual SFA on
the FULL-length DFT, score every Fourier value with the one-way ANOVA
F-statistic over class groups (the sklearn ``f_oneway`` formulation the
reference ports), keep the ``wordLength`` highest-scoring coefficient
indices, and quantize only those (gather-projection P3).

Spark shape: the F-statistic needs only per-(class, coefficient) sums and
sum-of-squares — one hash aggregate over exploded (sample, coef, value)
rows at scale; here fit happens on the bounded training sample so the
numpy form is used directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from sfa_spark.transform import mft as _mft
from sfa_spark.transform import sfa as _sfa


def f_oneway(values: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """One-way ANOVA F per column of ``values`` (n_samples, l) —
    literal port of the reference formulation (SFASupervised.java:150-222)."""
    n_samples = values.shape[0]
    classes = np.unique(labels)
    n_classes = classes.size
    ss_alldata = (values**2).sum(axis=0)
    sums_all = values.sum(axis=0)
    sq_sums_all = sums_all**2
    sstot = ss_alldata - sq_sums_all / n_samples
    ssbn = np.zeros(values.shape[1])
    for c in classes:
        sel = values[labels == c]
        ssbn += sel.sum(axis=0) ** 2 / sel.shape[0]
    ssbn -= sq_sums_all / n_samples
    sswn = sstot - ssbn
    dfbn, dfwn = n_classes - 1, n_samples - n_classes
    with np.errstate(divide="ignore", invalid="ignore"):
        return (ssbn / dfbn) / (sswn / dfwn)


@dataclass
class SupervisedSFAModel:
    base: _sfa.SFAModel
    best_indices: np.ndarray = field(repr=False)  # top-l coefficient indices

    def transform(self, series: np.ndarray) -> np.ndarray:
        x = _mft.znorm(series, True)
        approx = _mft.transform(
            x,
            self.base.window_size,
            self.base.bins.shape[0],
            self.base.norm_mean,
            self.base.lower_bounding,
        )
        return self.quantize(approx)

    def quantize(self, approx: np.ndarray) -> np.ndarray:
        """Gather-project the best coefficients, quantize each with ITS
        OWN coefficient's bins (SFASupervised.java:39-55)."""
        out = np.empty(self.best_indices.size, dtype=np.int16)
        for a, i in enumerate(self.best_indices):
            out[a] = np.searchsorted(self.base.bins[i], approx[i], side="right")
        return out


def fit_transform_supervised(
    series: list[np.ndarray],
    labels: np.ndarray,
    word_length: int,
    alphabet_size: int,
    norm_mean: bool,
) -> tuple[SupervisedSFAModel, np.ndarray]:
    """SFASupervised.fitTransform (SFASupervised.java:71-89): full-length
    DFT fit, ANOVA-F ranking (desc, stable — Java's stable object sort),
    NaN F treated as largest like Double.compareTo."""
    labels = np.asarray(labels, dtype=np.float64)
    max_len = max(len(s) for s in series)
    base, _ = _sfa.fit_transform(
        series, max_len, alphabet_size, norm_mean, window_size=max_len
    )
    approx = np.stack(
        [
            _mft.transform(_mft.znorm(s, True), max_len, max_len, norm_mean, True)
            for s in series
        ]
    )
    f = f_oneway(approx, labels)
    key = np.where(np.isnan(f), np.inf, f)
    order = np.argsort(-key, kind="stable")
    best = order[: min(word_length, order.size)].astype(np.int64)
    model = SupervisedSFAModel(base=base, best_indices=best)
    words = np.stack([model.quantize(a) for a in approx])
    return model, words
