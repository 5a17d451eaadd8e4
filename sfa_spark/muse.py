"""MUSE — multivariate WEASEL (A6).

Semantics re-expressed from transformation/MUSE.java +
classification/MUSEClassifier.java: per window length an UNSUPERVISED SFA
(mftUseMaxOrMin=true — MUSE's 'max' effective word length, MFT.java:97-99)
is fit on the disjoint windows of ALL dimensions pooled
(SFA.fitWindowing(MTS[]), SFA.java:246-258); every (sample, dimension)
series yields packed windowed words; bags key features by
(window, dim, word[, word2]) structs (MuseWord, MUSE.java:144-175 — here
content tuples, resolving the insertion-order dictionary hazard H4);
per-class χ² ≥ 2 filter; logistic regression with bias. The classifier
grid sweeps histogram type {EQUI_DEPTH, EQUI_FREQUENCY→width} × normMean
× f∈{4,6}, scored by 10-fold CV, early break on perfect
(MUSEClassifier.java:159-203). The reference also appends per-dimension
derivative channels at load time (TimeSeriesLoader.getDerivatives) —
apply ``with_derivatives`` for that behavior.

No reference golden is asserted (the MTS sweep fixtures are heavyweight);
the test validates invariants + separation on structured synthetic MTS.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from sfa_spark.classifiers import _stratified_folds, grid_map
from sfa_spark.transform import mft as _mft
from sfa_spark.transform import sfa as _sfa
from sfa_spark.weasel import _chi_squared_filter, _fit_lr, _fit_lr_np, _predict_lr, _to_matrix

MAX_F, MIN_F, MAX_S = 6, 4, 4
CHI_LIMIT = 2.0
FOLDS = 10
MIN_WINDOW = 4
MAX_WINDOW = 250


def with_derivatives(samples: list[list[np.ndarray]]) -> list[list[np.ndarray]]:
    """Append first-difference channels per dim (TimeSeriesLoader.java:140-156)."""
    return [dims + [np.diff(d) for d in dims] for dims in samples]


def _fit_window_sfa(
    samples: list[list[np.ndarray]], window: int, norm_mean: bool, hist: str
) -> _sfa.SFAModel:
    """SFA.fitWindowing over all dims' disjoint windows, useMaxOrMin not
    relevant at fit time (whole-window transform)."""
    wins = []
    for dims in samples:
        for d in dims:
            for wd in _sfa.disjoint_windows(d, window):
                # The reference norms MTS fit windows TWICE: once in
                # SFA.fitWindowing(MTS[]) (SFA.java:246-257) and again in
                # fitWindowing(TimeSeries[]) (SFA.java:269-278), which
                # re-cuts each window into itself as a FRESH TimeSeries
                # (normed flag unset) and norms it again. The second pass
                # is ~identity for regular windows but rescales degenerate
                # (σ≈0 blow-up) windows by another √buf — bin parity
                # requires reproducing it.
                wins.append(_mft.znorm(_mft.znorm(wd, norm_mean), norm_mean))
    if not wins:
        wins = [np.zeros(window)]
    approx = np.stack([_mft.transform(w, window, MAX_F, norm_mean, True) for w in wins])
    rounded = _sfa.java_round2dp(approx)
    fit = _sfa.fit_bins_equi_depth if hist == _sfa.EQUI_DEPTH else _sfa.fit_bins_equi_width
    bins = np.stack([fit(np.sort(rounded[:, i]), MAX_S) for i in range(MAX_F)])
    return _sfa.SFAModel(
        word_length=MAX_F, alphabet_size=MAX_S, norm_mean=norm_mean,
        lower_bounding=True, window_size=window, histogram_type=hist, bins=bins,
    )


def _words(model: _sfa.SFAModel, x: np.ndarray) -> np.ndarray:
    if x.size < model.window_size:
        return np.empty(0, dtype=np.int64)
    approx = _mft.transform_windowing(
        x, model.window_size, MAX_F, model.norm_mean, True, use_max_or_min=True
    )
    w = _sfa.quantize(approx, model.bins)
    return _sfa.pack_words(w, MAX_F, model.needed_bits)


def _bags(words, windows, n_dims, f):
    bits = int(MAX_S - 1).bit_length()
    mask = (1 << (bits * f)) - 1
    n = len(words[0]) // n_dims
    bags = [dict() for _ in range(n)]
    for wi, w in enumerate(windows):
        if w < f:
            continue
        for i in range(n):
            for dim in range(n_dims):
                seq = words[wi][i * n_dims + dim] & mask
                for off in range(seq.size):
                    # MuseWord content key (w, dim, word, word2); unigrams
                    # carry word2=0 — EXACTLY as the reference, so a bigram
                    # whose second word masks to 0 collides with the
                    # unigram of its first word (MUSE.java:202-213 —
                    # MuseWord equality makes them the same feature)
                    k = (wi, dim, int(seq[off]), 0)
                    bags[i][k] = bags[i].get(k, 0) + 1
                    if off - w >= 0:
                        k2 = (wi, dim, int(seq[off - w]), int(seq[off]))
                        bags[i][k2] = bags[i].get(k2, 0) + 1
    return bags


@dataclass
class MUSEModel:
    windows: list[int]
    norm_mean: bool
    hist: str
    features: int
    n_dims: int
    sfa_models: list = field(repr=False)
    feature_index: dict = field(repr=False)
    lr_model: object = field(repr=False)
    train_cv_correct: int = 0


def _all_words(sfa_models, samples):
    return [
        [_words(m, np.asarray(d, dtype=np.float64)) for dims in samples for d in dims]
        for m in sfa_models
    ]


def _fit_window_and_words_muse(args):
    """One MUSE window config: pooled-dims SFA fit + packed words per
    (sample, dim) — the MUSE.createWords ParallelFor body
    (MUSE.java:95-110)."""
    samples, w, norm_mean, hist = args
    m = _fit_window_sfa(samples, w, norm_mean, hist)
    ws = [_words(m, np.asarray(d, dtype=np.float64)) for dims in samples for d in dims]
    return m, ws


def fit_muse(
    spark,
    samples: list[list[np.ndarray]],
    labels: np.ndarray,
    windows: list[int] | None = None,
) -> MUSEModel:
    """Fit the full MUSE grid. ``windows=None`` sweeps every length in
    [MIN_WINDOW, min(MAX_WINDOW, max series length)] like the reference
    default; passing an explicit list bounds the sweep (the reference
    classifier exposes the same dial via maxWindowLength,
    MUSEClassifier.java) — long-series datasets (e.g. AReM, 480 points)
    make the dense sweep O(length) SFA fits per grid config."""
    labels = np.asarray(labels, dtype=np.float64)
    n_dims = len(samples[0])
    max_len = min(MAX_WINDOW, max(len(d) for dims in samples for d in dims))
    if windows is None:
        windows = list(range(MIN_WINDOW, max_len + 1))
    else:
        windows = sorted(w for w in windows if MIN_WINDOW <= w <= max_len)
        if not windows:
            raise ValueError(
                f"no usable window lengths: every requested window falls "
                f"outside [{MIN_WINDOW}, {max_len}] for this dataset"
            )
    folds = _stratified_folds(labels, FOLDS)
    all_idx = np.arange(len(samples))

    best = None
    for hist in (_sfa.EQUI_DEPTH, _sfa.EQUI_FREQUENCY):
        for norm_mean in (True, False):
            fitted = grid_map(
                _fit_window_and_words_muse,
                (samples,),
                [(w, norm_mean, hist) for w in windows],
                spark=spark,
                work_points=sum(len(d) for dims in samples for d in dims)
                * len(windows),
            )
            sfa_models = [m for m, _ in fitted]
            words = [ws for _, ws in fitted]
            for f in range(MIN_F, MAX_F + 1, 2):
                bags = _bags(words, windows, n_dims, f)
                keep = _chi_squared_filter(bags, labels, CHI_LIMIT)
                fidx = {k: i for i, k in enumerate(sorted(keep, key=str))}
                mat = _to_matrix(bags, fidx)
                correct = 0
                for s in range(FOLDS):
                    test_idx = folds[s]
                    if test_idx.size == 0:
                        continue
                    train_idx = np.setdiff1d(all_idx, test_idx)
                    m = _fit_lr_np(mat[train_idx], labels[train_idx])
                    correct += int((_predict_lr(m, mat[test_idx]) == labels[test_idx]).sum())
                if best is None or correct > best[0]:
                    best = (correct, hist, norm_mean, f, sfa_models, words)
                if correct == len(samples):
                    break
            if best and best[0] == len(samples):
                break
        if best and best[0] == len(samples):
            break

    correct, hist, norm_mean, f, sfa_models, words = best
    bags = _bags(words, windows, n_dims, f)
    keep = _chi_squared_filter(bags, labels, CHI_LIMIT)
    fidx = {k: i for i, k in enumerate(sorted(keep, key=str))}
    mat = _to_matrix(bags, fidx)
    lr = _fit_lr(spark, mat, labels)
    return MUSEModel(windows, norm_mean, hist, f, n_dims, sfa_models, fidx, lr, correct)


def predict_muse(model: MUSEModel, samples: list[list[np.ndarray]]) -> np.ndarray:
    words = _all_words(model.sfa_models, samples)
    bags = _bags(words, model.windows, model.n_dims, model.features)
    mat = _to_matrix(bags, model.feature_index)
    return _predict_lr(model.lr_model, mat)


def predict_muse_df(
    spark, model: MUSEModel, series_df, key_col, dim_col, t_col, value_col
):
    """Distributed MUSE scoring over a long MULTIVARIATE table
    (key, dim, t, value): broadcast model, one applyInPandas group per
    sample, dims reassembled inside the kernel ordered by ``dim_col``.
    The caller supplies the same channels the model was fit on (apply
    :func:`with_derivatives` upstream if the fit used them). Equals
    :func:`predict_muse` exactly — tested."""
    import pandas as pd

    bc = spark.sparkContext.broadcast(model)

    def per_sample(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([dim_col, t_col])
        dims = [
            g[value_col].to_numpy(dtype=np.float64)
            for _, g in pdf.groupby(dim_col, sort=True)
        ]
        pred = float(predict_muse(bc.value, [dims])[0])
        return pd.DataFrame({key_col: [pdf[key_col].iloc[0]], "predicted": [pred]})

    return series_df.groupBy(key_col).applyInPandas(
        per_sample, schema=f"{key_col} long, predicted double"
    )
