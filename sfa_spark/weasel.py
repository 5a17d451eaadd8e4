"""WEASEL — Word ExtrAction for time SEries cLassification.

Semantics-exact re-expression of the reference
(transformation/WEASEL.java, classification/WEASELClassifier.java),
golden-validated on CBF (reference golden 0.967 train / 0.988 test,
WEASELClassifierTest.java:17, DELTA=0.05).

Reference pipeline reproduced:
* window grid 4..min(250, len) (WEASELClassifier.java:200-205)
* per window: SUPERVISED SFA fit on disjoint windows (ANOVA-F selected
  coefficients, SFASupervised), windowed transform, packed words
* bags of unigrams (word, window) + bigrams (prev word at offset-w,
  word, window) (WEASEL.java:131-166). The reference keys features
  through an insertion-order dictionary (hazard H4, SURVEY §7.2) —
  feature IDENTITY is what matters, so here features are keyed by their
  content tuples directly (deterministic under any parallelism).
* χ² filter: keep a feature if ANY class's (obs-exp)²/exp ≥ 2
  (WEASEL.java:172-225 — per-class test, not summed)
* logistic regression on the surviving counts with bias; the reference
  uses liblinear L2R_LR_DUAL (C=1); here pyspark.ml LogisticRegression
  (L2, regParam = 1/(C·n)) — the SURVEY §3.3 planned substitution.
  f/normMean selected by 10-fold stratified CV accuracy, early break on
  perfect score (WEASELClassifier.java:208-231).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from sfa_spark.classifiers import _stratified_folds, grid_map
from sfa_spark.transform import sfa as _sfa
from sfa_spark.transform.sfa_supervised import SupervisedSFAModel, f_oneway
from sfa_spark.transform import mft as _mft

MAX_F, MIN_F, MAX_S = 6, 4, 4
CHI_LIMIT = 2.0
C_PARAM = 1.0
FOLDS = 10
MIN_WINDOW = 4
MAX_WINDOW = 250


# --------------------------------------------------------------------------
# supervised windowed SFA per window length
# --------------------------------------------------------------------------

def _fit_supervised_windowing(
    series: list[np.ndarray], labels: np.ndarray, window: int, norm_mean: bool
) -> SupervisedSFAModel:
    """SFASupervised.fitWindowing: disjoint windows (labels inherited) →
    full-window-length DFT fit → ANOVA-F top-maxF coefficients.

    Reference parity: SFASupervised hard-codes INFORMATION_GAIN binning
    (SFASupervised.java:29) and lowerBounding=false (SFASupervised.java:24,
    WEASELClassifier.java:157 also passes false), so the supervised bins
    are label-entropy splits over UN-normed Fourier values."""
    wins, wlabels = [], []
    for s, lbl in zip(series, labels):
        for wd in _sfa.disjoint_windows(s, window):
            wins.append(_mft.znorm(wd, norm_mean))
            wlabels.append(lbl)
    if not wins:  # series shorter than window
        wins = [_mft.znorm(np.asarray(s[:window], dtype=np.float64), norm_mean) for s in series]
        wlabels = list(labels)
    wlabels = np.asarray(wlabels, dtype=np.float64)
    approx = np.stack(
        [_mft.transform(w, window, window, norm_mean, False) for w in wins]
    )
    rounded = _sfa.java_round2dp(approx)
    bins = np.stack(
        [
            _sfa.fit_bins_info_gain(rounded[:, i], wlabels, MAX_S)
            for i in range(window)
        ]
    )
    base = _sfa.SFAModel(
        word_length=window,
        alphabet_size=MAX_S,
        norm_mean=norm_mean,
        lower_bounding=False,
        window_size=window,
        histogram_type=_sfa.INFORMATION_GAIN,
        bins=bins,
    )
    f = f_oneway(approx, wlabels)
    key = np.where(np.isnan(f), np.inf, f)
    order = np.argsort(-key, kind="stable")
    best = order[: min(MAX_F, order.size)].astype(np.int64)
    return SupervisedSFAModel(base=base, best_indices=best)


def _transform_words(model: SupervisedSFAModel, x: np.ndarray) -> np.ndarray:
    """transformWindowingInt: windowed MFT up to maxWordLength, gather the
    best coefficients, quantize, pack (WEASEL.java:119-124 via
    SFA.transformWindowingInt)."""
    max_wl = int(model.best_indices.max()) + 1
    max_wl += max_wl % 2
    approx = _mft.transform_windowing(
        x,
        model.base.window_size,
        max_wl,
        model.base.norm_mean,
        model.base.lower_bounding,
    )
    words = np.empty((approx.shape[0], model.best_indices.size), dtype=np.int64)
    for a, i in enumerate(model.best_indices):
        words[:, a] = np.searchsorted(model.base.bins[i], approx[:, i], side="right")
    bits = int(MAX_S - 1).bit_length()
    return _sfa.pack_words(words, MAX_F, bits)


# --------------------------------------------------------------------------
# bags, χ², model
# --------------------------------------------------------------------------

def _bags_of_bigrams(
    words_per_window: list[list[np.ndarray]],
    windows: list[int],
    f: int,
) -> list[dict]:
    bits = int(MAX_S - 1).bit_length()
    mask = (1 << (bits * f)) - 1
    n_samples = len(words_per_window[0])
    bags: list[dict] = [dict() for _ in range(n_samples)]
    for wi, w in enumerate(windows):
        for j in range(n_samples):
            seq = words_per_window[wi][j] & mask
            for off in range(seq.size):
                key = ("u", int(seq[off]), wi)
                bags[j][key] = bags[j].get(key, 0) + 1
                if off - w >= 0:
                    key2 = ("b", int(seq[off - w]), int(seq[off]), wi)
                    bags[j][key2] = bags[j].get(key2, 0) + 1
    return bags


def _chi_squared_filter(bags: list[dict], labels: np.ndarray, limit: float) -> set:
    feature_count: dict = {}
    observed: dict = {}
    for bag, lbl in zip(bags, labels):
        for k, v in bag.items():
            if v > 0:
                feature_count[k] = feature_count.get(k, 0) + 1
                observed[(float(lbl), k)] = observed.get((float(lbl), k), 0) + 1
    n = len(bags)
    class_prob = {}
    for lbl in labels:
        class_prob[float(lbl)] = class_prob.get(float(lbl), 0) + 1
    keep = set()
    for lbl, cnt in class_prob.items():
        prob = cnt / n
        for feat, fc in feature_count.items():
            expected = prob * fc
            chi = observed.get((lbl, feat), 0) - expected
            if expected > 0 and chi * chi / expected >= limit:
                keep.add(feat)
    return keep


@dataclass
class WEASELModel:
    windows: list[int]
    norm_mean: bool
    features: int  # chosen f
    sfa_models: list[SupervisedSFAModel] = field(repr=False)
    feature_index: dict = field(repr=False)  # feature key → column
    lr_model: object = field(repr=False)
    train_cv_correct: int = 0


def _to_matrix(bags: list[dict], feature_index: dict) -> np.ndarray:
    mat = np.zeros((len(bags), len(feature_index)), dtype=np.float64)
    for i, bag in enumerate(bags):
        for k, v in bag.items():
            j = feature_index.get(k)
            if j is not None and v > 0:
                mat[i, j] = v
    return mat


def _fit_lr(spark, mat: np.ndarray, labels: np.ndarray):
    """pyspark.ml LogisticRegression fit → (coef matrix, intercepts,
    class labels) extracted to numpy so scoring is vectorized (no per-row
    py4j)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors

    classes = np.unique(labels)
    lut = {float(c): i for i, c in enumerate(classes)}
    rows = [
        (float(lut[float(lbl)]), Vectors.sparse(
            mat.shape[1],
            np.flatnonzero(mat[i]).tolist(),
            mat[i][np.flatnonzero(mat[i])].tolist(),
        ))
        for i, lbl in enumerate(labels)
    ]
    df = spark.createDataFrame(rows, ["label", "features"])
    lr = LogisticRegression(
        regParam=1.0 / (C_PARAM * len(labels)),
        maxIter=200,
        standardization=False,
        fitIntercept=True,
        tol=1e-8,
    )
    m = lr.fit(df)
    if m.numClasses == 2:
        w = np.vstack([-m.coefficientMatrix.toArray()[0], m.coefficientMatrix.toArray()[0]])
        b = np.array([-float(m.interceptVector[0]), float(m.interceptVector[0])])
    else:
        w = m.coefficientMatrix.toArray()
        b = m.interceptVector.toArray()
    return (w, b, classes)


def _predict_lr(lr_model, mat: np.ndarray) -> np.ndarray:
    w, b, classes = lr_model
    scores = mat @ w.T + b[None, :]
    return classes[scores.argmax(axis=1)]


def _fit_lr_np(mat: np.ndarray, labels: np.ndarray, iters: int = 300):
    """Tiny numpy softmax regression with L2 (used for the CV sweep that
    only SELECTS f/normMean — a pyspark.ml job per L-BFGS iteration is
    pure scheduling overhead at n≈30). Same (w, b, classes) contract.

    WEASEL/MUSE bag matrices are EXTREMELY sparse (a sample holds a few
    hundred of tens of thousands of χ²-surviving features), and the two
    matmuls per iteration dominate the whole classifier grid on
    many-class datasets (Libras: 15 classes × 41k features → 35s per CV
    fold dense). When scipy is available and the matrix is sparse enough
    to pay off, both products run CSR-sparse — identical math, ~50×
    faster; the dense path is kept verbatim as the fallback."""
    classes = np.unique(labels)
    y = np.searchsorted(classes, labels)
    n, d = mat.shape
    k = classes.size
    onehot = np.zeros((n, k))
    onehot[np.arange(n), y] = 1.0
    lam = 1.0 / (C_PARAM * n)
    w = np.zeros((k, d))
    b = np.zeros(k)
    # Lipschitz-ish step for softmax: L <= ||X||_F^2 / (2n) + lam
    step = 1.0 / ((mat * mat).sum() / (2.0 * n) / max(d, 1) * d / max(n, 1) + lam + 1e-9)
    step = min(step, 1.0)
    X, sparse = mat, False
    if d > 2000:
        try:
            import scipy.sparse as _sp

            if np.count_nonzero(mat) < 0.05 * mat.size:
                X, sparse = _sp.csr_matrix(mat), True
        except ImportError:
            pass
    for _ in range(iters):
        z = X @ w.T + b[None, :]
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - onehot) / n  # (n, k)
        # dense branch kept byte-for-byte as before (BLAS order) so small
        # fits are unperturbed; the sparse product associates differently
        # (per-row index order) — ulp-level only
        gw = ((X.T @ g).T if sparse else g.T @ mat) + lam * w
        gb = g.sum(axis=0)
        w -= step * gw
        b -= step * gb
    return (w, b, classes)


def _fit_window_and_words(args):
    """One WEASEL window config: supervised SFA fit + packed words for
    every training series (the ParallelFor body)."""
    series, labels, w, norm_mean = args
    m = _fit_supervised_windowing(series, labels, w, norm_mean)
    ws = [_transform_words(m, np.asarray(s, dtype=np.float64)) for s in series]
    return m, ws


def fit_weasel(spark, series: list[np.ndarray], labels: np.ndarray) -> WEASELModel:
    labels = np.asarray(labels, dtype=np.float64)
    max_len = max(len(s) for s in series)
    windows = list(range(MIN_WINDOW, min(MAX_WINDOW, max_len) + 1))
    folds = _stratified_folds(labels, FOLDS)
    all_idx = np.arange(len(series))

    best = None  # (correct, norm, f, sfa_models, words)
    for norm_mean in (True, False):
        # per-window supervised fit + all-series transform: the reference's
        # ParallelFor grid (WEASEL.java:102-118) — fork-pool at bundled
        # scale, Spark tasks w/ broadcast series on a real corpus
        fitted = grid_map(
            _fit_window_and_words,
            (series, labels),
            [(w, norm_mean) for w in windows],
            spark=spark,
            work_points=sum(len(s) for s in series) * len(windows),
        )
        sfa_models = [m for m, _ in fitted]
        words = [ws for _, ws in fitted]
        for f in range(MIN_F, MAX_F + 1, 2):
            bags = _bags_of_bigrams(words, windows, f)
            keep = _chi_squared_filter(bags, labels, CHI_LIMIT)
            feature_index = {k: i for i, k in enumerate(sorted(keep, key=str))}
            mat = _to_matrix(bags, feature_index)
            correct = 0
            for s in range(FOLDS):
                test_idx = folds[s]
                if test_idx.size == 0:
                    continue
                train_idx = np.setdiff1d(all_idx, test_idx)
                m = _fit_lr_np(mat[train_idx], labels[train_idx])
                pred = _predict_lr(m, mat[test_idx])
                correct += int((pred == labels[test_idx]).sum())
            if best is None or correct > best[0]:
                best = (correct, norm_mean, f, sfa_models, words)
            if correct == len(series):
                break
        if best and best[0] == len(series):
            break

    correct, norm_mean, f, sfa_models, words = best
    bags = _bags_of_bigrams(words, windows, f)
    keep = _chi_squared_filter(bags, labels, CHI_LIMIT)
    feature_index = {k: i for i, k in enumerate(sorted(keep, key=str))}
    mat = _to_matrix(bags, feature_index)
    lr_model = _fit_lr(spark, mat, labels)
    return WEASELModel(
        windows=windows,
        norm_mean=norm_mean,
        features=f,
        sfa_models=sfa_models,
        feature_index=feature_index,
        lr_model=lr_model,
        train_cv_correct=correct,
    )


def predict_weasel(model: WEASELModel, series: list[np.ndarray]) -> np.ndarray:
    words = [
        [_transform_words(m, np.asarray(s, dtype=np.float64)) for s in series]
        for m in model.sfa_models
    ]
    bags = _bags_of_bigrams(words, model.windows, model.features)
    mat = _to_matrix(bags, model.feature_index)
    return _predict_lr(model.lr_model, mat)


def predict_weasel_df(spark, model: WEASELModel, series_df, key_col, t_col, value_col):
    """Distributed WEASEL scoring (broadcast model + per-series
    applyInPandas; equals :func:`predict_weasel` exactly — tested)."""
    from sfa_spark.classifiers import predict_df

    return predict_df(
        spark, model, series_df, key_col, t_col, value_col, predict_weasel
    )
