"""Rollup tier + LOCF gap-fill vs a pure-pandas oracle (resample + ffill).

Reference analogue: tumbling windows = TimeSeries.getDisjointSequences
(/root/reference/src/main/java/sfa/timeseries/TimeSeries.java:256-271).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sfa_spark.rollup import (
    apply_retention,
    gap_fill_locf,
    reaggregate,
    rollup_all_tiers,
    rollup_tier,
)

KEY = ["user_id"]


@pytest.fixture(scope="module")
def events_pd(events):
    return events.toPandas()


def pandas_rollup(pdf: pd.DataFrame, freq: str) -> pd.DataFrame:
    g = (
        pdf.sort_values(["user_id", "ts", "event_id"])
        .assign(bucket_ts=lambda d: d["ts"].dt.floor(freq))
        .groupby(["user_id", "bucket_ts"])["value"]
    )
    out = g.agg(n="count", sum="sum", min="min", max="max", first="first", last="last")
    return out.reset_index()


def assert_frames_match(spark_df, oracle: pd.DataFrame, float_cols):
    got = spark_df.toPandas().sort_values(["user_id", "bucket_ts"]).reset_index(drop=True)
    want = oracle.sort_values(["user_id", "bucket_ts"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["user_id"].values == want["user_id"].values).all()
    assert (got["bucket_ts"].values == want["bucket_ts"].values).all()
    assert (got["n"].values == want["n"].values).all()
    for c in float_cols:
        np.testing.assert_allclose(
            got[c].astype(float).values, want[c].astype(float).values, rtol=1e-9
        )


@pytest.mark.parametrize("tier,freq", [("1m", "1min"), ("1h", "1h"), ("1d", "1D")])
def test_rollup_tier_matches_pandas(events, events_pd, tier, freq):
    got = rollup_tier(events, KEY, "ts", "value", tier)
    want = pandas_rollup(events_pd, freq)
    assert_frames_match(got, want, ["sum", "min", "max", "first", "last"])


def test_reaggregate_equals_direct(events):
    """1h/1d computed by re-aggregating 1m partials == computed from raw."""
    tiers = rollup_all_tiers(events, KEY, "ts", "value")
    for tier in ("1h", "1d"):
        direct = rollup_tier(events, KEY, "ts", "value", tier)
        regg = tiers[tier]
        d = direct.toPandas().sort_values(["user_id", "bucket_ts"]).reset_index(drop=True)
        r = regg.toPandas().sort_values(["user_id", "bucket_ts"]).reset_index(drop=True)
        assert (d["n"].values == r["n"].values).all()
        for c in ["min", "max", "first", "last"]:
            np.testing.assert_array_equal(d[c].values, r[c].values)
        np.testing.assert_allclose(d["sum"].values, r["sum"].values, rtol=1e-9)


def test_gap_fill_locf_matches_pandas_ffill(events, events_pd):
    t1h = rollup_tier(events, KEY, "ts", "value", "1h")
    filled = gap_fill_locf(t1h, KEY, "1h").toPandas()
    filled = filled.sort_values(["user_id", "bucket_ts"]).reset_index(drop=True)

    want_parts = []
    base = pandas_rollup(events_pd, "1h").set_index("bucket_ts")
    for uid, grp in base.groupby("user_id"):
        dense = grp["last"].resample("1h").last().ffill()
        want_parts.append(
            pd.DataFrame({"user_id": uid, "bucket_ts": dense.index, "last": dense.values})
        )
    want = (
        pd.concat(want_parts)
        .sort_values(["user_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(filled) == len(want)
    np.testing.assert_array_equal(filled["bucket_ts"].values, want["bucket_ts"].values)
    np.testing.assert_allclose(filled["last"].astype(float).values, want["last"].astype(float).values)
    # filled rows are flagged, observed rows aren't, n==0 exactly on gaps
    assert (filled.loc[filled["locf_filled"], "n"] == 0).all()
    assert (filled.loc[~filled["locf_filled"], "n"] > 0).all()


def test_retention_filters_old_buckets(events):
    t1d = rollup_tier(events, KEY, "ts", "value", "1d")
    hi = t1d.agg({"bucket_ts": "max"}).collect()[0][0]
    kept = apply_retention(t1d, hi, 7 * 86400)
    pdf = kept.toPandas()
    assert (pdf["bucket_ts"] >= hi - pd.Timedelta(days=7)).all()
    assert len(pdf) < t1d.count()
