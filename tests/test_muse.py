"""MUSE on structured synthetic multivariate series: invariants +
class separation (reference golden sweeps are heavyweight MTS datasets;
the transformation semantics are validated structurally here)."""

from __future__ import annotations

import numpy as np
import pytest

from sfa_spark.classifiers import accuracy
from sfa_spark.muse import fit_muse, predict_muse, with_derivatives


def synth_mts(n_per_class=8, length=48, seed=3):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 4 * np.pi, length)
    samples, labels = [], []
    for i in range(n_per_class * 2):
        cls = i % 2
        if cls == 0:
            d1 = np.sin(t) + rng.standard_normal(length) * 0.2
            d2 = rng.standard_normal(length) * 0.3
        else:
            d1 = rng.standard_normal(length) * 0.3
            d2 = np.sign(np.sin(2 * t)) + rng.standard_normal(length) * 0.2
        samples.append([d1, d2])
        labels.append(float(cls))
    return samples, np.array(labels)


def test_muse_separates_multivariate_classes(spark):
    train, ytr = synth_mts(seed=3)
    test, yte = synth_mts(seed=99)
    m = fit_muse(spark, train, ytr)
    assert m.features in (4, 6)
    assert m.n_dims == 2
    assert accuracy(predict_muse(m, train), ytr) >= 0.9
    assert accuracy(predict_muse(m, test), yte) >= 0.8


def test_with_derivatives_doubles_dims():
    samples, _ = synth_mts(n_per_class=2)
    out = with_derivatives(samples)
    assert len(out[0]) == 4
    assert len(out[0][2]) == len(samples[0][0]) - 1
