"""Spark-distributed classifier fit grid (round-2 verdict stretch item):
``grid_map`` fans the window-grid × normMean sweep out as Spark tasks
with the training series broadcast once — the cluster analogue of the
reference's ParallelFor thread pool (ParallelFor.java:22-54).

The test forces both backends on the same data and asserts the FITTED
OUTPUT is identical — backend choice must be invisible to the model
(all selection / factor-filter logic runs after the map).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from sfa_spark.classifiers import (
    GRID_SPARK_THRESHOLD,
    accuracy,
    fit_boss_ensemble,
    grid_map,
    predict_boss_ensemble,
)
from sfa_spark.sources import load_ucr_numpy
from sfa_spark.weasel import fit_weasel, predict_weasel

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def cbf():
    train, ytr = load_ucr_numpy(os.path.join(FIX, "CBF_TRAIN"))
    test, yte = load_ucr_numpy(os.path.join(FIX, "CBF_TEST"))
    return train, ytr, test[:60], yte[:60]


@pytest.fixture
def force(monkeypatch):
    def _force(backend):
        monkeypatch.setenv("SFA_SPARK_GRID", backend)

    return _force


def test_grid_map_backends_identical(spark, force):
    """Raw grid_map parity: same fn, same configs, both backends."""

    def fn(args):
        xs, mult = args
        return float(np.sum(xs) * mult)

    xs = np.arange(100, dtype=np.float64)
    configs = [(m,) for m in range(7)]
    force("local")
    local = grid_map(fn, (xs,), configs, spark=spark)
    force("spark")
    dist = grid_map(fn, (xs,), configs, spark=spark)
    assert local == dist
    assert dist == [float(xs.sum() * m) for m in range(7)]


def test_boss_fit_spark_grid_matches_fork(spark, cbf, force):
    train, ytr, test, yte = cbf
    force("local")
    ens_local = fit_boss_ensemble(train, ytr, spark=spark)
    force("spark")
    ens_spark = fit_boss_ensemble(train, ytr, spark=spark)
    assert ens_local.norm_mean == ens_spark.norm_mean
    assert [(m.window, m.features, m.train_score) for m in ens_local.members] == [
        (m.window, m.features, m.train_score) for m in ens_spark.members
    ]
    pl = predict_boss_ensemble(ens_local, test)
    ps = predict_boss_ensemble(ens_spark, test)
    np.testing.assert_array_equal(pl, ps)
    assert accuracy(ps, yte) >= 0.9


def test_weasel_fit_spark_grid_matches_fork(spark, cbf, force):
    train, ytr, test, yte = cbf
    force("local")
    m_local = fit_weasel(spark, train, ytr)
    force("spark")
    m_spark = fit_weasel(spark, train, ytr)
    assert (m_local.norm_mean, m_local.features) == (m_spark.norm_mean, m_spark.features)
    assert m_local.train_cv_correct == m_spark.train_cv_correct
    assert set(m_local.feature_index) == set(m_spark.feature_index)
    np.testing.assert_array_equal(
        predict_weasel(m_local, test), predict_weasel(m_spark, test)
    )


def test_threshold_autoselects_spark_path():
    """Above GRID_SPARK_THRESHOLD points × configs, grid_map must pick the
    Spark path on its own (no env override) — asserted by giving it a
    'spark' whose sparkContext raises a sentinel."""

    class _Sentinel(Exception):
        pass

    class _FakeSpark:
        @property
        def sparkContext(self):
            raise _Sentinel()

    with pytest.raises(_Sentinel):
        grid_map(
            lambda a: a,
            (),
            [(1,), (2,)],
            spark=_FakeSpark(),
            work_points=GRID_SPARK_THRESHOLD,
        )
    # below threshold: fork path, fake spark never touched
    out = grid_map(lambda a: a[0], (), [(1,), (2,)], spark=_FakeSpark(), work_points=0)
    assert out == [1, 2]
