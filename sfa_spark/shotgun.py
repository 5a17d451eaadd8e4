"""Shotgun classifier (J3) — semantics-exact re-expression of
classification/ShotgunClassifier.java, golden-validated on CBF
(ShotgunClassifierTest.java:17: train 1.0 / test 0.969, DELTA=0.05).

Shotgun distance (ShotgunClassifier.java:150-236): the query is cut into
DISJOINT windows (normed per model.normed); each train series exposes all
SLIDING windows z-normalized with precomputed incremental mean/invstd
(A12); distance = Σ over query windows of the min ED to any train window;
1-NN over train series (self skipped train-vs-train; strict < keeps the
first/smallest index). The reference's early-abandon caps don't change
the argmin, so the vectorized form computes exact distances: one matmul
per (train series) — numpy inside the per-test kernel, and a
mapInPandas-distributable scoring path for large test sets.

Fit (ShotgunClassifier.java:74-143): windows max..5 descending, train
score = leave-self-out train accuracy; plain Shotgun keeps the single
best model per normMean grid (factor 1.0); ensemble variant keeps models
within ``factor`` (0.92) and votes with train-score weights
(ShotgunEnsembleClassifier).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from sfa_spark.classifiers import _vote, accuracy, grid_map
from sfa_spark.transform import mft as _mft

MIN_WINDOW = 5
MAX_WINDOW = 250
ENSEMBLE_FACTOR = 0.92


@dataclass
class ShotgunModel:
    window: int
    norm_mean: bool
    train: list = field(repr=False)
    train_labels: np.ndarray = field(repr=False)
    train_score: int = 0


def _train_windows(x: np.ndarray, w: int, norm_mean: bool) -> np.ndarray:
    """All sliding windows of a train series, z-normalized with the
    incremental stats + σ=0→1 guard (calcMeansStds). A series shorter
    than the window yields NO windows — the reference's sliding loop
    ``end = len - windowLength + 1`` never executes then
    (ShotgunClassifier.java:184), so such a train series is effectively
    at infinite distance, not truncated."""
    if x.size < w:
        return np.empty((0, w), dtype=np.float64)
    wins = np.lib.stride_tricks.sliding_window_view(x, w).astype(np.float64)
    means, stds = _mft.incremental_mean_std(x, w)
    inv = np.where(stds > 0, 1.0 / np.where(stds > 0, stds, 1.0), 1.0)
    mu = means if norm_mean else np.zeros_like(means)
    return (wins - mu[:, None]) * inv[:, None]


def _query_windows(q: np.ndarray, w: int, norm_mean: bool) -> list[np.ndarray]:
    wq = min(q.size, w)
    from sfa_spark.transform.sfa import disjoint_windows

    return [_mft.znorm(d, norm_mean) for d in disjoint_windows(q, wq)]


def shotgun_distance_1nn(
    model: ShotgunModel, query: np.ndarray, skip_index: int | None = None
) -> float:
    """1-NN label for one query under the Shotgun distance."""
    qws = _query_windows(np.asarray(query, dtype=np.float64), model.window, model.norm_mean)
    if not qws:
        return np.nan
    qm = np.stack(qws)  # (k, wq)
    wq = qm.shape[1]
    best_d, best_label = np.inf, np.nan
    for j, ts in enumerate(model.train):
        if skip_index is not None and j == skip_index:
            continue
        tw = _train_windows(np.asarray(ts, dtype=np.float64), model.window, model.norm_mean)[:, :wq]
        if tw.shape[0] == 0:  # train series shorter than the window
            continue
        d = (
            (qm**2).sum(axis=1)[:, None]
            - 2.0 * qm @ tw.T
            + (tw**2).sum(axis=1)[None, :]
        )
        total = np.maximum(d.min(axis=1), 0.0).sum()
        if total < best_d:
            best_d, best_label = total, float(model.train_labels[j])
    return best_label


def _predict(model: ShotgunModel, queries: list[np.ndarray], train_vs_train: bool) -> np.ndarray:
    out = np.empty(len(queries))
    for i, q in enumerate(queries):
        out[i] = shotgun_distance_1nn(model, q, skip_index=i if train_vs_train else None)
    return out


def _shotgun_fit_window(args) -> ShotgunModel:
    """One window config: leave-self-out train accuracy (ParallelFor body,
    ShotgunClassifier.java:105-131)."""
    series, labels, w, norm_mean = args
    m = ShotgunModel(w, norm_mean, series, labels)
    pred = _predict(m, series, train_vs_train=True)
    m.train_score = int((~np.isnan(pred) & (pred == labels)).sum())
    return m


def fit_shotgun(
    series: list[np.ndarray],
    labels: np.ndarray,
    factor: float = 1.0,
    min_window: int = MIN_WINDOW,
    spark=None,
):
    """factor=1.0 → plain Shotgun (single best model per normMean grid);
    factor<1 → ensemble (list of models + weighted vote)."""
    labels = np.asarray(labels, dtype=np.float64)
    max_len = max(len(s) for s in series)
    n_points = sum(len(s) for s in series)
    best_single, best_members = None, None
    for norm_mean in (True, False):
        windows = list(range(min(MAX_WINDOW, max_len), min_window - 1, -1))
        cands = grid_map(
            _shotgun_fit_window,
            (series, labels),
            [(w, norm_mean) for w in windows],
            spark=spark,
            work_points=n_points * len(windows),
        )
        best_train = max((m.train_score for m in cands), default=0)
        members = [m for m in cands if m.train_score >= best_train * factor]
        top = max(members, key=lambda m: (m.train_score, m.window))
        if best_single is None or top.train_score > best_single.train_score:
            best_single, best_members = top, members
    return best_single if factor >= 1.0 else best_members


def predict_shotgun(model_or_members, queries: list[np.ndarray]) -> np.ndarray:
    if isinstance(model_or_members, ShotgunModel):
        return _predict(model_or_members, queries, train_vs_train=False)
    per_model = [
        (_predict(m, queries, train_vs_train=False), m.train_score)
        for m in model_or_members
    ]
    return _vote(per_model, len(queries))


def predict_shotgun_df(spark, model_or_members, series_df, key_col, t_col, value_col):
    """Distributed Shotgun scoring (broadcast model(s) + per-series
    applyInPandas; equals :func:`predict_shotgun` exactly — tested)."""
    from sfa_spark.classifiers import predict_df

    return predict_df(
        spark, model_or_members, series_df, key_col, t_col, value_col, predict_shotgun
    )
