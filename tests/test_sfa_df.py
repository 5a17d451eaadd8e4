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


def test_group_bucket_batched_equals_per_series(spark, events):
    """fit/transform with group_buckets=G must equal the per-series path
    EXACTLY — same fitted bins, same (key, offset, word) set — including
    ragged series lengths and series shorter than the window (scalar
    fallback inside the group kernel)."""
    from pyspark.sql import functions as F

    from sfa_spark.transform.sfa_df import fit_windowing_df, transform_windowing_df

    series = (
        events.limit(4000)
        .select(
            F.xxhash64("user_id", "event_type").alias("sid"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
            F.col("value").alias("value"),
        )
    ).cache()

    m1 = fit_windowing_df(series, "sid", "t", "value", 16, 4, 4, True)
    m2 = fit_windowing_df(
        series, "sid", "t", "value", 16, 4, 4, True, group_buckets=7
    )
    np.testing.assert_array_equal(m1.bins, m2.bins)

    w1 = (
        transform_windowing_df(series, m1, "sid", "t", "value", pack=True)
        .toPandas()
        .sort_values(["sid", "offset"])
        .reset_index(drop=True)
    )
    w2 = (
        transform_windowing_df(
            series, m1, "sid", "t", "value", pack=True, group_buckets=7
        )
        .toPandas()
        .sort_values(["sid", "offset"])
        .reset_index(drop=True)
    )
    assert len(w1) == len(w2)
    np.testing.assert_array_equal(w1["sid"].values, w2["sid"].values)
    np.testing.assert_array_equal(w1["offset"].values, w2["offset"].values)
    np.testing.assert_array_equal(w1["word"].values, w2["word"].values)
    series.unpersist()


def test_batched_mft_kernels_bit_parity():
    """znorm_rows / transform_rows / incremental_mean_std_rows /
    transform_windowing_rows ≡ their scalar counterparts bit-for-bit,
    incl. σ=0 windows and constant series."""
    from sfa_spark.transform import mft

    rng = np.random.default_rng(3)
    for nm in (True, False):
        X = rng.standard_normal((40, 16))
        X[7] = 3.25
        zr = mft.znorm_rows(X, nm)
        tr = mft.transform_rows(zr, 16, 4, nm)
        for i in range(40):
            np.testing.assert_array_equal(zr[i], mft.znorm(X[i], nm))
            np.testing.assert_array_equal(tr[i], mft.transform(zr[i], 16, 4, nm))
        for n in (16, 17, 168):
            S = rng.standard_normal((12, n))
            S[3, :] = 1.5
            if n > 30:
                S[5, 10:26] = -2.0
            mb, sb = mft.incremental_mean_std_rows(S, 16)
            W = mft.transform_windowing_rows(S, 16, 4, nm)
            for i in range(12):
                m1, s1 = mft.incremental_mean_std(S[i], 16)
                np.testing.assert_array_equal(mb[i], m1)
                np.testing.assert_array_equal(sb[i], s1)
                np.testing.assert_array_equal(
                    W[i], mft.transform_windowing(S[i], 16, 4, nm)
                )
