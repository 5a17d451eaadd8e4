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
