"""EWMA kernel: BIT-exact parity with the scalar recurrence (the same
claim the driver oracle makes via a DuckDB recursive CTE), partition
invariance, and edge cases."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from sfa_spark.operators.smoothing import ewma

EPOCH = dt.datetime(2024, 1, 1)


def _pdf(rng, n_keys=7):
    rows = []
    for k in range(n_keys):
        n = int(rng.integers(1, 120))  # includes length-1 series
        secs = np.sort(rng.choice(100_000, n, replace=False))
        for i, s in enumerate(secs):
            rows.append((k, EPOCH + dt.timedelta(seconds=int(s)), i, float(rng.normal(50, 20))))
    return pd.DataFrame(rows, columns=["k", "ts", "eid", "v"])


def _scalar(pdf, alpha):
    out = {}
    for k, g in pdf.groupby("k"):
        g = g.sort_values(["ts", "eid"])
        y = None
        ys = []
        for v in g["v"]:
            y = v if y is None else alpha * v + (1.0 - alpha) * y
            ys.append(y)
        out[k] = (g["eid"].tolist(), ys)
    return out


@pytest.mark.parametrize("alpha", [0.2, 0.5, 0.97])
def test_bit_exact_vs_scalar_recurrence(spark, alpha):
    pdf = _pdf(np.random.default_rng(41))
    got = (
        ewma(spark.createDataFrame(pdf), ["k"], "ts", "v", alpha, ["eid"])
        .toPandas()
        .sort_values(["k", "ts", "eid"])
    )
    want = _scalar(pdf, alpha)
    for k, g in got.groupby("k"):
        eids, ys = want[k]
        assert g["eid"].tolist() == eids
        # bitwise equality — no tolerance
        assert all(a == b for a, b in zip(g["ewma"].tolist(), ys)), (k, alpha)


def test_partition_order_invariant(spark):
    pdf = _pdf(np.random.default_rng(43))
    shuffled = pdf.sample(frac=1.0, random_state=5).reset_index(drop=True)
    a = (
        ewma(spark.createDataFrame(pdf).repartition(8), ["k"], "ts", "v", 0.3, ["eid"])
        .toPandas()
        .sort_values(["k", "ts", "eid"])
        .reset_index(drop=True)
    )
    b = (
        ewma(spark.createDataFrame(shuffled).repartition(3), ["k"], "ts", "v", 0.3, ["eid"])
        .toPandas()
        .sort_values(["k", "ts", "eid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_alpha_one_is_identity(spark):
    pdf = _pdf(np.random.default_rng(44), n_keys=3)
    got = ewma(spark.createDataFrame(pdf), ["k"], "ts", "v", 1.0, ["eid"]).toPandas()
    assert (got["ewma"] == got["v"]).all()


def test_invalid_alpha_rejected(spark):
    pdf = _pdf(np.random.default_rng(45), n_keys=1)
    with pytest.raises(ValueError):
        ewma(spark.createDataFrame(pdf), ["k"], "ts", "v", 0.0)


def _scalar_holt(pdf, a, b):
    out = {}
    da, db = 1.0 - a, 1.0 - b
    for k, g in pdf.groupby("k"):
        g = g.sort_values(["ts", "eid"])
        lvl = trd = None
        rows = []
        for v in g["v"]:
            if lvl is None:
                lvl, trd = v, 0.0
            else:
                lvl_new = a * v + da * (lvl + trd)
                trd = b * (lvl_new - lvl) + db * trd
                lvl = lvl_new
            rows.append((lvl, trd))
        out[k] = rows
    return out


def test_holt_bit_exact_vs_scalar(spark):
    from sfa_spark.operators.smoothing import holt

    pdf = _pdf(np.random.default_rng(47))
    got = (
        holt(spark.createDataFrame(pdf), ["k"], "ts", "v", 0.3, 0.1, ["eid"])
        .toPandas()
        .sort_values(["k", "ts", "eid"])
    )
    want = _scalar_holt(pdf, 0.3, 0.1)
    for k, g in got.groupby("k"):
        for (gl, gt, gf), (wl, wt) in zip(
            g[["level", "trend", "forecast_1"]].itertuples(index=False), want[k]
        ):
            assert gl == wl and gt == wt and gf == wl + wt


def test_holt_tracks_linear_trend(spark):
    from sfa_spark.operators.smoothing import holt

    # x_t = 3t: after convergence trend -> 3 and forecast_1 -> next value
    pdf = pd.DataFrame(
        {
            "k": 0,
            "ts": [EPOCH + dt.timedelta(seconds=i) for i in range(200)],
            "eid": range(200),
            "v": [3.0 * i for i in range(200)],
        }
    )
    got = (
        holt(spark.createDataFrame(pdf), ["k"], "ts", "v", 0.5, 0.3, ["eid"])
        .toPandas()
        .sort_values("eid")
    )
    tail = got.iloc[-1]
    assert abs(tail["trend"] - 3.0) < 1e-6
    assert abs(tail["forecast_1"] - 3.0 * 200) < 1e-5


def test_padding_blowup_fallback_bit_exact(spark):
    """r6: one pathologically long series grouped with many short ones
    trips the >8x padding guard; the per-series fallback recurrence must
    be bit-identical to the padded sweep (same float associations)."""
    import numpy as np
    import pandas as pd

    from sfa_spark.operators.smoothing import ewma, holt

    from pyspark.sql import functions as F

    # pick 40 keys that all land in ONE coarse hash bucket, so the
    # kernel call really holds 1 long + 39 short series and the
    # (n_series x max_len) pivot would inflate >8x — tripping the guard
    g = spark.sparkContext.defaultParallelism
    cand = (
        spark.range(4000)
        .select("id", F.pmod(F.xxhash64("id"), F.lit(g)).alias("b"))
        .toPandas()
    )
    bucket = int(cand["b"].iloc[0])
    keys = cand[cand["b"] == bucket]["id"].tolist()[:40]
    assert len(keys) == 40
    rng = np.random.default_rng(3)
    rows = [
        (int(keys[0]), t, float(v))
        for t, v in enumerate(rng.standard_normal(5000))
    ]
    for k in keys[1:]:
        rows += [(int(k), t, float(v)) for t, v in enumerate(rng.standard_normal(3))]
    one = spark.createDataFrame(pd.DataFrame(rows, columns=["key", "t", "v"]))
    e_all = (
        ewma(one, ["key"], "t", "v", 0.2, order_cols=None)
        .toPandas().sort_values(["key", "t"]).reset_index(drop=True)
    )
    # reference: per-series grouping (original formulation, one series
    # per pandas call -> padded path with a single row, never the guard)
    ref_rows = []
    for k, grp in pd.DataFrame(rows, columns=["key", "t", "v"]).groupby("key"):
        xs = grp.sort_values("t")["v"].to_numpy()
        cur = xs[0]
        out = [cur]
        for t in range(1, xs.size):
            cur = 0.2 * xs[t] + 0.8 * cur
            out.append(cur)
        for t, y in enumerate(out):
            ref_rows.append((k, t, y))
    ref = pd.DataFrame(ref_rows, columns=["key", "t", "ewma"]).sort_values(
        ["key", "t"]
    ).reset_index(drop=True)
    assert np.array_equal(e_all["ewma"].to_numpy(), ref["ewma"].to_numpy())
    # holt fallback smoke: runs, right row count, finite outputs
    h_all = holt(one, ["key"], "t", "v", 0.3, 0.2).toPandas()
    assert len(h_all) == len(rows) and np.isfinite(h_all["level"]).all()
