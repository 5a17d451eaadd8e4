"""Seasonal-baseline anomaly scoring: planted-anomaly recovery, no
self-leak into the baseline, history/variance guards."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sfa_spark.operators.anomaly import seasonal_anomaly

EPOCH = dt.datetime(2024, 1, 1)


def _tier(days, hours, vals, key=0):
    return pd.DataFrame(
        {
            "k": key,
            "bucket_ts": [
                EPOCH + dt.timedelta(days=int(d), hours=int(h))
                for d, h in zip(days, hours)
            ],
            "v": vals,
        }
    )


def test_planted_spike_is_the_only_anomaly(spark):
    rng = np.random.default_rng(31)
    days = np.repeat(np.arange(10), 24)
    hours = np.tile(np.arange(24), 10)
    # stable daily shape + noise; one planted spike on day 9, hour 12
    vals = 50 + 10 * np.sin(hours / 24 * 2 * np.pi) + rng.normal(0, 1.0, 240)
    vals[9 * 24 + 12] += 40.0
    df = spark.createDataFrame(_tier(days, hours, vals))
    out = seasonal_anomaly(df, ["k"], "bucket_ts", "v", 3600, 24, n_periods=7).toPandas()
    anom = out[out["is_anomaly"] == True]  # noqa: E712
    spike_ts = EPOCH + dt.timedelta(days=9, hours=12)
    # the planted spike is flagged, carries BY FAR the largest z (small-
    # sample noise legitimately crosses |z|=3 a handful of times in 240
    # buckets), and false positives stay rare
    assert (anom["bucket_ts"] == spike_ts).any()
    spike_z = out.loc[out["bucket_ts"] == spike_ts, "z"].iloc[0]
    assert spike_z > 10
    assert (out["z"].abs().dropna() < spike_z - 5).sum() >= len(out["z"].dropna()) - 1
    assert len(anom) < 12


def test_current_bucket_never_in_own_baseline(spark):
    # same-phase history 10,10,10 then current 100: baseline must be 10
    df = spark.createDataFrame(
        _tier([0, 1, 2, 3], [5, 5, 5, 5], [10.0, 10.0, 10.0, 100.0])
    )
    out = (
        seasonal_anomaly(df, ["k"], "bucket_ts", "v", 3600, 24, n_periods=7)
        .toPandas()
        .sort_values("bucket_ts")
    )
    last = out.iloc[-1]
    assert last["baseline"] == 10.0 and last["n_hist"] == 3
    # constant history -> sigma 0 -> guarded NULL z, not +inf
    assert pd.isna(last["z"]) and pd.isna(last["is_anomaly"])


def test_min_history_guard(spark):
    df = spark.createDataFrame(_tier([0, 1, 2], [7, 7, 7], [1.0, 2.0, 9.0]))
    out = (
        seasonal_anomaly(
            df, ["k"], "bucket_ts", "v", 3600, 24, n_periods=7, min_history=3
        )
        .toPandas()
        .sort_values("bucket_ts")
    )
    # 0,1,2 prior observations -> all below min_history=3 -> no z anywhere
    assert out["z"].isna().all()


def test_phases_partition_independently(spark):
    # hour 3 ramps, hour 4 constant-noise: a jump at hour 3 must not be
    # judged against hour 4's history
    rows = []
    for d in range(8):
        rows.append((d, 3, float(d)))       # ramp
        rows.append((d, 4, 5.0 + 0.1 * ((-1) ** d)))
    days, hours, vals = zip(*rows)
    df = spark.createDataFrame(_tier(days, hours, list(vals)))
    out = seasonal_anomaly(df, ["k"], "bucket_ts", "v", 3600, 24).toPandas()
    p3 = out[out["phase"] == 3].sort_values("bucket_ts")
    p4 = out[out["phase"] == 4].sort_values("bucket_ts")
    # the ramp's own history explains it: modest z, monotone baseline
    assert (p3["baseline"].dropna().diff().dropna() > 0).all()
    b4 = p4["baseline"].dropna()
    assert ((b4 >= 4.9) & (b4 <= 5.1)).all()  # never polluted by the ramp
