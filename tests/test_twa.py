"""Time-weighted average: hand-computed cross-bucket holds, an
independent scalar replica on random data, and edge invariants."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from sfa_spark.operators.twa import time_weighted_avg

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return [EPOCH + dt.timedelta(seconds=float(s)) for s in seconds]


def test_hand_computed_cross_bucket_hold(spark):
    # samples: 0:00 v=10, 0:30 v=20, 2:00 v=50
    pdf = pd.DataFrame(
        {"k": 0, "eid": [0, 1, 2], "ts": _ts([0, 1800, 7200]), "v": [10.0, 20.0, 50.0]}
    )
    out = (
        time_weighted_avg(spark.createDataFrame(pdf), ["k"], "ts", "v", "1h", ["eid"])
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    assert len(out) == 2  # hour 2 gets nothing: the last sample holds nothing
    h0, h1 = out.iloc[0], out.iloc[1]
    assert h0["covered_us"] == 3600_000_000 and h0["twa"] == pytest.approx(15.0)
    assert h0["n_samples"] == 2
    # hour 1 is pure carry: v=20 the whole hour, no sample starts there
    assert h1["covered_us"] == 3600_000_000 and h1["twa"] == pytest.approx(20.0)
    assert h1["n_samples"] == 0


def test_constant_series_is_constant(spark):
    rng = np.random.default_rng(53)
    secs = np.sort(rng.choice(4 * 3600, 50, replace=False))
    pdf = pd.DataFrame({"k": 0, "eid": range(50), "ts": _ts(secs), "v": 7.5})
    out = time_weighted_avg(spark.createDataFrame(pdf), ["k"], "ts", "v", "1h", ["eid"]).toPandas()
    assert (out["twa"] == 7.5).all()


def _scalar_twa(g, step_us=3600_000_000):
    g = g.sort_values(["ts", "eid"])
    t = (g["ts"].astype("int64") // 1000).to_numpy()
    v = g["v"].to_numpy(dtype=float)
    acc = {}
    for i in range(len(t) - 1):
        t0, t1 = int(t[i]), int(t[i + 1])
        b = t0 // step_us
        while b * step_us < t1:
            lo = max(t0, b * step_us)
            hi = min(t1, (b + 1) * step_us)
            num, den = acc.get(b, (0.0, 0))
            acc[b] = (num + v[i] * (hi - lo), den + (hi - lo))
            b += 1
    return {b: (num / den, den) for b, (num, den) in acc.items()}


def test_matches_scalar_replica(spark):
    rng = np.random.default_rng(59)
    rows = []
    for k in range(5):
        n = int(rng.integers(2, 200))
        secs = np.sort(rng.choice(3 * 86400, n, replace=False))
        for i, s in enumerate(secs):
            rows.append((k, i, _ts([s])[0], float(rng.uniform(0, 100))))
    pdf = pd.DataFrame(rows, columns=["k", "eid", "ts", "v"])
    out = time_weighted_avg(spark.createDataFrame(pdf), ["k"], "ts", "v", "1h", ["eid"]).toPandas()
    for k, g in pdf.groupby("k"):
        want = _scalar_twa(g)
        mine = out[out["k"] == k]
        got = {
            int(r["bucket_ts"].value // 1000 // 3600_000_000): (r["twa"], r["covered_us"])
            for _, r in mine.iterrows()
        }
        assert set(got) == set(want), k
        for b in want:
            assert got[b][1] == want[b][1]
            assert got[b][0] == pytest.approx(want[b][0], rel=1e-12)
    # interior buckets are fully covered
    assert (out["covered_us"] <= 3600_000_000).all()
