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


def test_muse_on_bundled_shapes_random(spark):
    """MUSE on the reference's bundled ShapesRandom MTS dataset (with
    derivative channels, like MTSClassificationTest.java:70-74). The
    reference hard-codes NO golden for MTS datasets (the test only prints
    scores), so this asserts a sanity floor on real multivariate data
    rather than reference parity."""
    import os

    from sfa_spark.classifiers import accuracy
    from sfa_spark.muse import fit_muse, predict_muse
    from sfa_spark.sources import load_multivariate_numpy

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    train, ytr = load_multivariate_numpy(
        os.path.join(fix, "ShapesRandom_TRAIN3"), derivatives=True
    )
    test, yte = load_multivariate_numpy(
        os.path.join(fix, "ShapesRandom_TEST3"), derivatives=True
    )
    assert len(train[0]) == 4  # 2 dims + 2 derivative channels
    model = fit_muse(spark, train, ytr)
    acc_train = accuracy(predict_muse(model, train), ytr)
    acc_test = accuracy(predict_muse(model, test), yte)
    assert acc_train >= 0.9, acc_train
    assert acc_test >= 0.7, acc_test
