"""M4 + LTTB downsampling.

M4 is checked against a pandas groupby re-derivation (the driver also
hash-checks it against DuckDB, m4_daily_16). LTTB — which has no SQL
oracle because each pick depends on the previous pick — is checked
against an independent SCALAR reference implementation written straight
from Steinarsson's thesis pseudocode (plain Python loop, no numpy), plus
the structural invariants: endpoints pinned, exact output size, pass-
through below budget, and partition-order determinism.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from sfa_spark.operators.downsample import lttb_downsample, m4_downsample

EPOCH = dt.datetime(2024, 1, 1)


def _series_pdf(rng, key, n, span_s=86400):
    secs = np.sort(rng.choice(span_s * 1_000_000, size=n, replace=False))
    return pd.DataFrame(
        {
            "k": key,
            "ts": [EPOCH + dt.timedelta(microseconds=int(u)) for u in secs],
            "v": np.round(rng.standard_normal(n) * 10, 3),
        }
    )


@pytest.fixture(scope="module")
def pdf(spark):
    rng = np.random.default_rng(11)
    return pd.concat(
        [_series_pdf(rng, k, n) for k, n in [(0, 5000), (1, 997), (2, 40), (3, 3)]],
        ignore_index=True,
    )


def lttb_reference(xs, ys, n_out):
    """Scalar LTTB straight from the thesis: pin first/last, equal-count
    interior buckets, next-bucket centroid as the third triangle point."""
    n = len(xs)
    if n <= n_out:
        return list(range(n))
    nb = n_out - 2
    edges = [1 + (i * (n - 2)) // nb for i in range(nb + 1)]
    picked = [0]
    a = 0
    for b in range(nb):
        lo, hi = edges[b], edges[b + 1]
        if hi <= lo:
            continue
        if b + 1 < nb and edges[b + 2] > edges[b + 1]:
            span = range(edges[b + 1], edges[b + 2])
            cx = sum(xs[i] for i in span) / len(span)
            cy = sum(ys[i] for i in span) / len(span)
        else:
            cx, cy = xs[n - 1], ys[n - 1]
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs((xs[a] - cx) * (ys[i] - ys[a]) - (xs[a] - xs[i]) * (cy - ys[a]))
            if area > best_area:  # strict: ties keep the earliest
                best, best_area = i, area
        picked.append(best)
        a = best
    picked.append(n - 1)
    return picked


def test_m4_matches_pandas(spark, pdf):
    df = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    got = (
        m4_downsample(df, ["k"], "ts", "v", F.date_trunc("day", F.col("ts")), 86400, width=16)
        .toPandas()
        .sort_values(["k", "bucket"])
        .reset_index(drop=True)
    )
    us = pdf["ts"].astype("int64") // 1000 - int(pd.Timestamp(EPOCH).value // 1000)
    ref = pdf.assign(bucket=(us * 16) // 86_400_000_000)
    rows = []
    for (k, b), g in ref.groupby(["k", "bucket"]):
        g = g.sort_values("ts")
        rows.append(
            dict(
                k=k,
                bucket=b,
                ts_first=g["ts"].iloc[0],
                ts_last=g["ts"].iloc[-1],
                v_first=g["v"].iloc[0],
                v_last=g["v"].iloc[-1],
                v_min=g["v"].min(),
                v_max=g["v"].max(),
                n=len(g),
            )
        )
    want = pd.DataFrame(rows).sort_values(["k", "bucket"]).reset_index(drop=True)
    got2 = got[want.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want, check_dtype=False)
    # every bucket holds <= span/width and the 4 extremes bound the data
    assert (got["v_min"] <= got["v_max"]).all()
    assert (got["bucket"] >= 0).all() and (got["bucket"] < 16).all()


def test_lttb_matches_scalar_reference(spark, pdf):
    got = (
        lttb_downsample(spark.createDataFrame(pdf), ["k"], "ts", "v", n_out=100)
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    for k, g in pdf.groupby("k"):
        g = g.sort_values("ts").reset_index(drop=True)
        xs = (g["ts"].astype("int64")).tolist()
        ys = g["v"].astype(float).tolist()
        idx = lttb_reference(xs, ys, 100)
        want = g.iloc[idx]
        mine = got[got["k"] == k]
        assert len(mine) == len(want) == min(100, len(g))
        assert mine["ts"].tolist() == want["ts"].tolist(), f"key {k}"
        assert mine["v"].tolist() == want["v"].astype(float).tolist(), f"key {k}"
        # endpoints pinned
        assert mine["ts"].iloc[0] == g["ts"].iloc[0]
        assert mine["ts"].iloc[-1] == g["ts"].iloc[-1]


def test_lttb_partition_order_invariant(spark, pdf):
    shuffled = pdf.sample(frac=1.0, random_state=3).reset_index(drop=True)
    a = (
        lttb_downsample(spark.createDataFrame(pdf).repartition(7), ["k"], "ts", "v", 50)
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    b = (
        lttb_downsample(spark.createDataFrame(shuffled).repartition(2), ["k"], "ts", "v", 50)
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
