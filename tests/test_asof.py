"""As-of join vs DuckDB's native ASOF JOIN (an independent implementation).

DuckDB ≥0.9 ships a real ASOF JOIN operator; every semantic the union-tag
window implementation claims (inclusive ties, left-outer nulls, both
directions) is cross-checked against it on data built to hit the edges:
equal timestamps, keys with no match, interleaved histories.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pytest

from sfa_spark.operators.asof import asof_join

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return [EPOCH + dt.timedelta(seconds=float(s)) for s in seconds]


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n_l),  # key 5 has no right rows
            "ts": _ts(rng.integers(0, 10_000, n_l)),
            "lv": np.round(rng.standard_normal(n_l), 3),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_r),
            "ts": _ts(rng.integers(0, 10_000, n_r)),
            "rv": np.round(rng.standard_normal(n_r), 3),
        }
    )
    # force exact-tie collisions between left and right timestamps
    # (tie sources drawn from k<5 so key 5 stays matchless on the right)
    tie_src = lpd[lpd.k < 5].iloc[:21]
    rpd.loc[: len(tie_src) - 1, ["k", "ts"]] = tie_src[["k", "ts"]].values
    # dedupe right instants so the match is well-defined without tiebreak
    rpd = rpd.groupby(["k", "ts"], as_index=False).agg(rv=("rv", "max"))
    return lpd, rpd


def _duck_asof(lpd, rpd, op: str, tol_sql: str | None = None):
    con = duckdb.connect()
    con.register("l", lpd)
    con.register("r", rpd)
    tol = ""
    if tol_sql:
        sel = f"""
          CASE WHEN {tol_sql} THEN r.ts END AS asof_ts,
          CASE WHEN {tol_sql} THEN r.rv END AS asof_rv"""
    else:
        sel = "r.ts AS asof_ts, r.rv AS asof_rv"
    return con.sql(
        f"""
        SELECT l.k, l.ts, l.lv, {sel}
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts {op} r.ts
        ORDER BY l.k, l.ts, l.lv
        """
    ).df()


def _sort(df):
    return df.sort_values(["k", "ts", "lv"]).reset_index(drop=True)


def _check(got, want):
    got = _sort(got)[["k", "ts", "lv", "asof_ts", "asof_rv"]]
    want = _sort(want)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=0
    )


def test_backward_matches_duckdb_asof(spark, frames):
    lpd, rpd = frames
    got = asof_join(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd), on=["k"]
    ).toPandas()
    _check(got, _duck_asof(lpd, rpd, ">="))
    # key 5 rows exist and are all unmatched (left-outer semantics)
    assert (got[got.k == 5].asof_ts.isna()).all() and (got.k == 5).any()
    # the forced collisions match AT the tie (inclusive >=)
    tie_src = lpd[lpd.k < 5].iloc[:21][["k", "ts"]].drop_duplicates()
    ties = got.merge(tie_src, on=["k", "ts"])
    assert len(ties) and (ties.asof_ts == ties.ts).all()


def test_forward_matches_duckdb_asof(spark, frames):
    lpd, rpd = frames
    got = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        on=["k"],
        direction="forward",
    ).toPandas()
    _check(got, _duck_asof(lpd, rpd, "<="))


@pytest.mark.parametrize("direction,op", [("backward", ">="), ("forward", "<=")])
def test_tolerance_nulls_stale_matches(spark, frames, direction, op):
    lpd, rpd = frames
    tol = 500.0
    got = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        on=["k"],
        direction=direction,
        tolerance_seconds=tol,
    ).toPandas()
    bound = (
        "l.ts - r.ts <= INTERVAL 500 SECOND"
        if direction == "backward"
        else "r.ts - l.ts <= INTERVAL 500 SECOND"
    )
    _check(got, _duck_asof(lpd, rpd, op, tol_sql=bound))
    # tolerance must actually null something here but not everything
    assert got.asof_ts.isna().any() and got.asof_ts.notna().any()


def test_tiebreak_reduces_duplicate_instants(spark):
    lpd = pd.DataFrame({"k": [1], "ts": _ts([100]), "lv": [0.0]})
    rpd = pd.DataFrame(
        {
            "k": [1, 1, 1],
            "ts": _ts([50, 50, 200]),
            "rv": [10.0, 20.0, 99.0],
            "rid": [7, 9, 1],
        }
    )
    got = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        on=["k"],
        right_cols=["rv"],
        tiebreak_col="rid",
    ).toPandas()
    # rid=9 wins the duplicate instant deterministically
    assert got.asof_rv.tolist() == [20.0]


def test_plan_has_no_join_explosion(spark, frames):
    """The whole point: ONE window pass, never a per-key range join —
    the physical plan must contain no join operator at all."""
    lpd, rpd = frames
    df = asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd), on=["k"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan
