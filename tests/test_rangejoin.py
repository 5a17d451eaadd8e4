"""Interval join: bucketed-equi-join plan vs a DuckDB naive range join,
edge timestamps, overlap multiplicity, left-outer nulls, and a plan gate
proving no nested-loop join survives.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pytest

from sfa_spark.operators.rangejoin import interval_join

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return [EPOCH + dt.timedelta(seconds=float(s)) for s in seconds]


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(13)
    n_p, n_i = 600, 80
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_p),
            "ts": _ts(rng.integers(0, 50_000, n_p)),
            "pv": np.round(rng.standard_normal(n_p), 3),
        }
    )
    starts = rng.integers(0, 45_000, n_i)
    ivls = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_i),
            "start": _ts(starts),
            "end": _ts(starts + rng.integers(0, 9_000, n_i)),  # overlaps happen
            "iv": np.arange(n_i),
        }
    )
    # exact-boundary rows: a point AT start and AT end of interval 0
    ivls.loc[0, ["k", "start", "end"]] = [0, _ts([100])[0], _ts([200])[0]]
    pts.loc[0, ["k", "ts"]] = [0, _ts([100])[0]]
    pts.loc[1, ["k", "ts"]] = [0, _ts([200])[0]]
    return pts, ivls


def _oracle(pts, ivls, inclusive_end=True, how="inner"):
    con = duckdb.connect()
    con.register("p", pts)
    con.register("i", ivls)
    op = "<=" if inclusive_end else "<"
    j = "JOIN" if how == "inner" else "LEFT JOIN"
    return con.sql(
        f"""SELECT p.k, p.ts, p.pv, i.start, i."end", i.iv
            FROM p {j} i ON p.k = i.k AND p.ts >= i.start AND p.ts {op} i."end"
        """
    ).df()


def _norm(df):
    cols = ["k", "ts", "pv", "start", "end", "iv"]
    return (
        df[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .astype({"iv": "float64"})
    )


@pytest.mark.parametrize("bucket_seconds", [60, 3600, 100_000])
def test_matches_naive_range_join(spark, frames, bucket_seconds):
    pts, ivls = frames
    got = interval_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(ivls),
        on=["k"],
        point_ts="ts",
        start_col="start",
        end_col="end",
        bucket_seconds=bucket_seconds,
    ).toPandas()
    want = _oracle(pts, ivls)
    pd.testing.assert_frame_equal(_norm(got), _norm(want))
    # boundary rows present: point at start and point at end both match
    assert ((got["ts"] == got["start"]) & (got["iv"] == 0)).any()
    assert ((got["ts"] == got["end"]) & (got["iv"] == 0)).any()


def test_exclusive_end(spark, frames):
    pts, ivls = frames
    got = interval_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(ivls),
        on=["k"],
        start_col="start",
        end_col="end",
        bucket_seconds=600,
        inclusive_end=False,
    ).toPandas()
    want = _oracle(pts, ivls, inclusive_end=False)
    pd.testing.assert_frame_equal(_norm(got), _norm(want))
    assert not ((got["ts"] == got["end"]) & (got["iv"] == 0)).any()


def test_left_join_keeps_uncontained_points(spark, frames):
    pts, ivls = frames
    got = interval_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(ivls),
        on=["k"],
        start_col="start",
        end_col="end",
        bucket_seconds=600,
        how="left",
    ).toPandas()
    want = _oracle(pts, ivls, how="left")
    a = _norm(got.fillna({"iv": -1}))
    b = _norm(want.fillna({"iv": -1}))
    pd.testing.assert_frame_equal(a, b)


def test_no_nested_loop_in_plan(spark, frames):
    pts, ivls = frames
    df = interval_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(ivls),
        on=["k"],
        start_col="start",
        end_col="end",
        bucket_seconds=600,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
