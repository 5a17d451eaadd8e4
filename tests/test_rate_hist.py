"""Counter rate (reset semantics, bucket attribution, telescoping) and
mergeable histograms (merge==direct, interpolation vs a scalar replica,
edge clamps)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sfa_spark.operators.histogram import hist_merge, hist_quantile, hist_rollup
from sfa_spark.operators.rate import counter_increase

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return [EPOCH + dt.timedelta(seconds=float(s)) for s in seconds]


def test_counter_reset_semantics(spark):
    # counter: 0 5 12 3 10 -> deltas 5 7 3(reset) 7; all in one hour
    pdf = pd.DataFrame(
        {"k": 0, "ts": _ts([0, 60, 120, 180, 240]), "c": [0, 5, 12, 3, 10]}
    )
    r = counter_increase(spark.createDataFrame(pdf), ["k"], "ts", "c", "1h").collect()
    assert len(r) == 1
    row = r[0]
    assert row.increase == 5 + 7 + 3 + 7
    assert row.n_resets == 1
    assert row.n_samples == 5
    assert row.rate == pytest.approx(22 / 3600.0)


def test_counter_delta_attributed_to_later_bucket(spark):
    # sample at 00:59 then 01:01 -> the delta lands in hour 01
    pdf = pd.DataFrame({"k": 0, "ts": _ts([3540, 3660]), "c": [10, 25]})
    rows = {
        r.bucket_ts.hour: r
        for r in counter_increase(spark.createDataFrame(pdf), ["k"], "ts", "c", "1h").collect()
    }
    assert rows[0].increase == 0 and rows[0].n_samples == 1
    assert rows[1].increase == 15 and rows[1].n_samples == 1


def test_counter_telescoping_without_resets(spark):
    rng = np.random.default_rng(17)
    n = 2000
    c = np.cumsum(rng.integers(0, 50, n))
    secs = np.sort(rng.choice(5 * 86400, n, replace=False))
    pdf = pd.DataFrame({"k": 0, "ts": _ts(secs), "c": c})
    out = counter_increase(spark.createDataFrame(pdf), ["k"], "ts", "c", "1d").toPandas()
    assert out["n_resets"].sum() == 0
    # sum of per-bucket increases telescopes to last - first
    assert out["increase"].sum() == c[-1] - c[0]


EDGES = [0.0, 1.0, 2.0, 4.0, 8.0]


def _scalar_hist_quantile(values, edges, q):
    k = len(edges)
    counts = {}
    for v in values:
        b = sum(1 for e in edges if v >= e)
        counts[b] = counts.get(b, 0) + 1
    lo = [edges[0], *edges]
    hi = [*edges, edges[-1]]
    tot = sum(counts.values())
    rank = q * tot
    cum = 0
    for b in sorted(counts):
        below = cum
        cum += counts[b]
        if cum >= rank:
            return lo[b] + (hi[b] - lo[b]) * (rank - below) / counts[b]
    raise AssertionError


@pytest.fixture(scope="module")
def hist_pdf():
    rng = np.random.default_rng(23)
    return pd.DataFrame(
        {
            "day": rng.integers(0, 3, 6000),
            "hour": rng.integers(0, 24, 6000),
            "ts": _ts(rng.integers(0, 86400, 6000)),
            "v": np.round(rng.gamma(2.0, 1.5, 6000), 3),
        }
    )


def test_hist_merge_equals_direct(spark, hist_pdf):
    df = spark.createDataFrame(hist_pdf)
    direct = (
        hist_rollup(df, ["day"], "ts", "v", EDGES, tier="1d")
        .groupBy("day", "vbucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    hourly = hist_rollup(df.withColumn("hday", F.col("hour")), ["day", "hday"], "ts", "v", EDGES, "1d")
    merged = hist_merge(hourly, ["day"])
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b


def test_hist_quantile_matches_scalar_replica(spark, hist_pdf):
    df = spark.createDataFrame(hist_pdf)
    hist = (
        hist_rollup(df, ["day"], "ts", "v", EDGES, tier="1d")
        .groupBy("day", "vbucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    for q in (0.1, 0.5, 0.9, 0.99):
        got = {r.day: r.est for r in hist_quantile(hist, ["day"], EDGES, q).collect()}
        for day, g in hist_pdf.groupby("day"):
            want = round(_scalar_hist_quantile(g["v"].tolist(), EDGES, q), 6)
            assert got[day] == pytest.approx(want, abs=1e-9), (day, q)


def test_hist_quantile_bucketing_error_is_bounded(spark, hist_pdf):
    fine = [float(x) for x in np.arange(0.0, 16.0, 0.25)]
    df = spark.createDataFrame(hist_pdf)
    hist = (
        hist_rollup(df, ["day"], "ts", "v", fine, tier="1d")
        .groupBy("day", "vbucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got = {r.day: r.est for r in hist_quantile(hist, ["day"], fine, 0.5).collect()}
    for day, g in hist_pdf.groupby("day"):
        exact = float(np.quantile(g["v"], 0.5))
        assert abs(got[day] - exact) <= 0.25, day


def test_hist_quantile_clamps_to_edge_buckets(spark):
    pdf = pd.DataFrame({"g": 0, "ts": _ts(range(10)), "v": [-5.0] * 5 + [100.0] * 5})
    df = spark.createDataFrame(pdf)
    hist = (
        hist_rollup(df, ["g"], "ts", "v", EDGES, "1d")
        .groupBy("g", "vbucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    lo = hist_quantile(hist, ["g"], EDGES, 0.2).collect()[0].est
    hi = hist_quantile(hist, ["g"], EDGES, 0.9).collect()[0].est
    assert lo == EDGES[0] and hi == EDGES[-1]
