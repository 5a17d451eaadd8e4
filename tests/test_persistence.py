"""Save → load → bit-identical predictions, per classifier family —
reproduces the reference's round-trip contract
(AbstractClassifierTest.java:39-61; Classifier.java:632-650)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from sfa_spark.persistence import load_model, save_model
from sfa_spark.sources import load_ucr_numpy

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def cbf_small():
    train, ytr = load_ucr_numpy(os.path.join(FIX, "CBF_TRAIN"))
    test, yte = load_ucr_numpy(os.path.join(FIX, "CBF_TEST"))
    return train, ytr, test[:40], yte[:40]


def _assert_same_preds(pred_a, pred_b):
    a, b = np.asarray(pred_a, float), np.asarray(pred_b, float)
    assert a.shape == b.shape
    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()


def test_boss_ensemble_roundtrip(cbf_small, tmp_path):
    from sfa_spark.classifiers import fit_boss_ensemble, predict_boss_ensemble

    train, ytr, test, _ = cbf_small
    ens = fit_boss_ensemble(train, ytr)
    p = str(tmp_path / "boss.json")
    save_model(ens, p)
    loaded = load_model(p)
    _assert_same_preds(predict_boss_ensemble(ens, test), predict_boss_ensemble(loaded, test))


def test_bossvs_roundtrip(cbf_small, tmp_path):
    from sfa_spark.classifiers import fit_bossvs, predict_bossvs

    train, ytr, test, _ = cbf_small
    ens = fit_bossvs(train, ytr)
    p = str(tmp_path / "bossvs.json")
    save_model(ens, p)
    loaded = load_model(p)
    # float32 tf-idf must narrow back exactly
    for m0, m1 in zip(ens.members, loaded.members):
        for lbl in m0.tfidf:
            for w, v in m0.tfidf[lbl].items():
                assert m1.tfidf[lbl][w] == v and m1.tfidf[lbl][w].dtype == np.float32
    _assert_same_preds(predict_bossvs(ens, test), predict_bossvs(loaded, test))


def test_weasel_roundtrip(spark, cbf_small, tmp_path):
    from sfa_spark.weasel import fit_weasel, predict_weasel

    train, ytr, test, _ = cbf_small
    model = fit_weasel(spark, train[:18], ytr[:18])
    p = str(tmp_path / "weasel.json")
    save_model(model, p)
    loaded = load_model(p)
    _assert_same_preds(predict_weasel(model, test), predict_weasel(loaded, test))


def test_muse_roundtrip(spark, tmp_path):
    from sfa_spark.muse import fit_muse, predict_muse

    rng = np.random.default_rng(5)
    samples, labels = [], []
    for i in range(16):
        lbl = i % 2
        base = np.sin(np.linspace(0, 4 + 3 * lbl, 40))
        samples.append([base + 0.05 * rng.standard_normal(40),
                        np.cos(np.linspace(0, 2 + 2 * lbl, 40)) + 0.05 * rng.standard_normal(40)])
        labels.append(float(lbl))
    model = fit_muse(spark, samples, np.asarray(labels))
    p = str(tmp_path / "muse.json")
    save_model(model, p)
    loaded = load_model(p)
    _assert_same_preds(predict_muse(model, samples), predict_muse(loaded, samples))


def test_shotgun_roundtrip(cbf_small, tmp_path):
    from sfa_spark.shotgun import fit_shotgun, predict_shotgun

    train, ytr, test, _ = cbf_small
    model = fit_shotgun(train[:15], ytr[:15])
    p = str(tmp_path / "shotgun.json")
    save_model(model, p)
    loaded = load_model(p)
    _assert_same_preds(predict_shotgun(model, test), predict_shotgun(loaded, test))


def test_shotgun_ensemble_roundtrip(cbf_small, tmp_path):
    from sfa_spark.shotgun import fit_shotgun, predict_shotgun

    train, ytr, test, _ = cbf_small
    members = fit_shotgun(train[:15], ytr[:15], factor=0.92)
    p = str(tmp_path / "shotgun_ens.json")
    save_model(members, p)
    loaded = load_model(p)
    _assert_same_preds(predict_shotgun(members, test), predict_shotgun(loaded, test))


def test_sfa_model_roundtrip(cbf_small, tmp_path):
    from sfa_spark.transform.sfa import fit_windowing

    train, _, test, _ = cbf_small
    model = fit_windowing(train[:10], 24, 6, 4, norm_mean=True)
    p = str(tmp_path / "sfa.json")
    save_model(model, p)
    loaded = load_model(p)
    assert (loaded.bins == model.bins).all()
    for s in test[:5]:
        assert (loaded.transform_windowing(s) == model.transform_windowing(s)).all()
