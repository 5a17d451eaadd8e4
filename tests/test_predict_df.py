"""Distributed scoring == local scoring, EXACTLY, for every classifier
family (the BOSS-ensemble DF path already had this; WEASEL / BOSS VS /
Shotgun / MUSE gained it in round 3). Small synthetic 2-class problem so
the fits stay fast; the assertion is equality of predictions, not
accuracy (accuracy parity lives in the golden tests)."""

from __future__ import annotations

import numpy as np
import pytest

from sfa_spark.classifiers import (
    fit_boss_ensemble,
    fit_bossvs,
    predict_boss_ensemble,
    predict_bossvs,
    predict_bossvs_df,
    predict_df,
)
from sfa_spark.muse import fit_muse, predict_muse, predict_muse_df
from sfa_spark.shotgun import fit_shotgun, predict_shotgun, predict_shotgun_df
from sfa_spark.weasel import fit_weasel, predict_weasel, predict_weasel_df

N, LEN = 16, 36


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    t = np.arange(LEN)
    series, labels = [], []
    for i in range(N):
        cls = i % 2
        base = np.sin(t / (2.0 + cls * 2.0)) * (1 + cls)
        series.append(base + 0.1 * rng.standard_normal(LEN))
        labels.append(float(cls + 1))
    return series, np.asarray(labels)


def _long_df(spark, series):
    rows = [
        (int(i), int(t), float(v))
        for i, s in enumerate(series)
        for t, v in enumerate(s)
    ]
    return spark.createDataFrame(rows, "sid long, t long, value double")


def _collect(df):
    pdf = df.toPandas().sort_values("sid").reset_index(drop=True)
    return pdf["predicted"].to_numpy()


def test_bossvs_df_equals_local(spark, data):
    series, labels = data
    ens = fit_bossvs(series, labels)
    local = predict_bossvs(ens, series)
    got = _collect(predict_bossvs_df(spark, ens, _long_df(spark, series), "sid", "t", "value"))
    np.testing.assert_array_equal(got, local)


def test_weasel_df_equals_local(spark, data):
    series, labels = data
    m = fit_weasel(spark, series, labels)
    local = predict_weasel(m, series)
    got = _collect(predict_weasel_df(spark, m, _long_df(spark, series), "sid", "t", "value"))
    np.testing.assert_array_equal(got, local)


def test_shotgun_df_equals_local(spark, data):
    series, labels = data
    m = fit_shotgun(series, labels)
    local = predict_shotgun(m, series)
    got = _collect(predict_shotgun_df(spark, m, _long_df(spark, series), "sid", "t", "value"))
    np.testing.assert_array_equal(got, local)


def test_generic_predict_df_with_boss(spark, data):
    series, labels = data
    ens = fit_boss_ensemble(series, labels)
    local = predict_boss_ensemble(ens, series)
    got = _collect(
        predict_df(
            spark, ens, _long_df(spark, series), "sid", "t", "value",
            predict_boss_ensemble,
        )
    )
    np.testing.assert_array_equal(got, local)


def test_muse_df_equals_local(spark, data):
    series, labels = data
    samples = [[s, np.cos(s)] for s in series]  # 2 channels per sample
    m = fit_muse(spark, samples, labels)
    local = predict_muse(m, samples)
    rows = [
        (int(i), int(d), int(t), float(v))
        for i, dims in enumerate(samples)
        for d, ch in enumerate(dims)
        for t, v in enumerate(ch)
    ]
    df = spark.createDataFrame(rows, "sid long, dim long, t long, value double")
    got = _collect(predict_muse_df(spark, m, df, "sid", "dim", "t", "value"))
    np.testing.assert_array_equal(got, local)
