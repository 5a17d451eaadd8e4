"""Golden accuracy sweeps beyond CBF — Coffee, Beef, variable_length,
against the reference's hard-coded goldens (DELTA=0.05):
  BossEnsembleClassifierTest.java / BossVSClassifierTest.java /
  WEASELClassifierTest.java / ShotgunClassifierTest.java /
  ShotgunEnsembleClassifierTest.java (getDataSets lists).
The variable_length dataset doubles as the ragged-series coverage
(SFAWordsVariableLengthTest analogue — NaN-padded rows load to unequal
lengths)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from sfa_spark.classifiers import accuracy
from sfa_spark.sources import load_ucr_numpy

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
DELTA = 0.05


def _load(name):
    train, ytr = load_ucr_numpy(os.path.join(FIX, f"{name}_TRAIN"))
    test, yte = load_ucr_numpy(os.path.join(FIX, f"{name}_TEST"))
    return train, ytr, test, yte


@pytest.fixture(scope="module")
def coffee():
    return _load("Coffee")


@pytest.fixture(scope="module")
def beef():
    return _load("Beef")


@pytest.fixture(scope="module")
def varlen():
    return _load("variable_length")


def test_variable_length_loads_ragged(varlen):
    train, ytr, _, _ = varlen
    lens = {len(s) for s in train}
    assert len(lens) > 1, "variable_length fixture should be ragged"


# --- BOSS ensemble (BossEnsembleClassifierTest.java) -----------------------

@pytest.mark.parametrize(
    "ds,golden_train,golden_test",
    [("coffee", 1.0, 1.0), ("beef", 1.0, 0.833), ("varlen", 1.0, 0.964)],
)
def test_boss_ensemble_goldens(ds, golden_train, golden_test, request):
    from sfa_spark.classifiers import fit_boss_ensemble, predict_boss_ensemble

    train, ytr, test, yte = request.getfixturevalue(ds)
    ens = fit_boss_ensemble(train, ytr)
    assert abs(accuracy(predict_boss_ensemble(ens, train), ytr) - golden_train) <= DELTA
    assert abs(accuracy(predict_boss_ensemble(ens, test), yte) - golden_test) <= DELTA


# --- BOSS VS (BossVSClassifierTest.java) -----------------------------------

@pytest.mark.parametrize(
    "ds,golden_train,golden_test",
    [("coffee", 1.0, 1.0), ("beef", 1.0, 0.833)],
)
def test_bossvs_goldens(ds, golden_train, golden_test, request):
    from sfa_spark.classifiers import fit_bossvs, predict_bossvs

    train, ytr, test, yte = request.getfixturevalue(ds)
    ens = fit_bossvs(train, ytr)
    assert abs(accuracy(predict_bossvs(ens, train), ytr) - golden_train) <= DELTA
    assert abs(accuracy(predict_bossvs(ens, test), yte) - golden_test) <= DELTA


# --- WEASEL (WEASELClassifierTest.java) ------------------------------------

@pytest.mark.parametrize(
    "ds,golden_train,golden_test",
    [("coffee", 1.0, 1.0), ("beef", 0.833, 0.833), ("varlen", 0.929, 0.964)],
)
def test_weasel_goldens(spark, ds, golden_train, golden_test, request):
    from sfa_spark.weasel import fit_weasel, predict_weasel

    train, ytr, test, yte = request.getfixturevalue(ds)
    model = fit_weasel(spark, train, ytr)
    # the reference's train golden is the 10-fold CV score from fit
    # (WEASELClassifier Score.training), not final-model train accuracy
    cv_acc = model.train_cv_correct / len(train)
    assert cv_acc - golden_train >= -DELTA  # at least as good as reference
    assert abs(accuracy(predict_weasel(model, test), yte) - golden_test) <= DELTA


# --- Shotgun (ShotgunClassifierTest.java / ShotgunEnsembleClassifierTest) --

@pytest.mark.parametrize(
    "ds,golden_train,golden_test",
    [("coffee", 1.0, 1.0), ("beef", 0.633, 0.8), ("varlen", 1.0, 0.929)],
)
def test_shotgun_goldens(ds, golden_train, golden_test, request):
    from sfa_spark.shotgun import fit_shotgun, predict_shotgun

    train, ytr, test, yte = request.getfixturevalue(ds)
    model = fit_shotgun(train, ytr)
    # reference train golden = leave-self-out fit score (correctTraining)
    fit_acc = model.train_score / len(train)
    assert fit_acc - golden_train >= -DELTA
    assert abs(accuracy(predict_shotgun(model, test), yte) - golden_test) <= DELTA


@pytest.mark.parametrize(
    "ds,golden_train,golden_test",
    [("coffee", 1.0, 0.929), ("beef", 0.667, 0.9), ("varlen", 0.929, 0.857)],
)
def test_shotgun_ensemble_goldens(ds, golden_train, golden_test, request):
    from sfa_spark.shotgun import fit_shotgun, predict_shotgun

    train, ytr, test, yte = request.getfixturevalue(ds)
    members = fit_shotgun(train, ytr, factor=0.92)
    fit_acc = max(m.train_score for m in members) / len(train)
    assert fit_acc - golden_train >= -DELTA
    assert abs(accuracy(predict_shotgun(members, test), yte) - golden_test) <= DELTA
