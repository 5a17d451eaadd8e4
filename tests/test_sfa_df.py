"""Distributed SFA (DataFrame pipeline) == local numpy kernel, end to end."""

from __future__ import annotations

import numpy as np
import pytest

from sfa_spark.sources import random_walks
from sfa_spark.transform import sfa as _sfa
from sfa_spark.transform.sfa_df import (
    fit_windowing_df,
    transform_whole_df,
    transform_windowing_df,
)

N_SERIES, LENGTH = 8, 256
W, L, A = 32, 6, 8


@pytest.fixture(scope="module")
def walks(spark):
    df = random_walks(spark, N_SERIES, LENGTH, seed=7).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def walks_np(walks):
    pdf = walks.toPandas().sort_values(["series_id", "t"])
    return {
        int(sid): g["value"].to_numpy()
        for sid, g in pdf.groupby("series_id")
    }


def test_distributed_fit_equals_local(walks, walks_np):
    model = fit_windowing_df(walks, "series_id", "t", "value", W, L, A, norm_mean=True)
    local = _sfa.fit_windowing(
        [walks_np[i] for i in sorted(walks_np)], W, L, A, norm_mean=True
    )
    np.testing.assert_array_equal(model.bins, local.bins)


def test_distributed_transform_equals_local(walks, walks_np):
    model = fit_windowing_df(walks, "series_id", "t", "value", W, L, A, norm_mean=True)
    out = (
        transform_windowing_df(walks, model, "series_id", "t", "value", pack=True)
        .toPandas()
        .sort_values(["series_id", "offset"])
    )
    for sid in sorted(walks_np):
        got = out[out["series_id"] == sid]["word"].to_numpy()
        want = model.transform_windowing_packed(walks_np[sid])
        np.testing.assert_array_equal(got, want, err_msg=f"series {sid}")
    assert len(out) == N_SERIES * (LENGTH - W + 1)


def test_whole_series_transform_df(walks, walks_np):
    series = [walks_np[i] for i in sorted(walks_np)]
    local_model, local_words = _sfa.fit_transform(series, 8, 8, norm_mean=True)
    out = (
        transform_whole_df(walks, local_model, "series_id", "t", "value")
        .toPandas()
        .sort_values("series_id")
    )
    got = np.stack(out["word"].to_numpy())
    np.testing.assert_array_equal(got, local_words)
