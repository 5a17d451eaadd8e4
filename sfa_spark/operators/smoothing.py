"""Exponentially-weighted moving average (EWMA) per series.

The classic smoothing recurrence (``adjust=False`` convention):

    y_1 = x_1
    y_t = alpha * x_t + (1 - alpha) * y_{t-1}

A recurrence is inherently sequential in t, so the engine vectorizes
across the OTHER axis: within each Arrow batch the series are pivoted
into a padded (n_series x max_len) matrix and one numpy sweep walks the
time axis — each step is ``y = a*x[:, t] + d*y`` across every series at
once. The Python-level loop runs ``max_len`` times per batch (the short
axis), not once per row: the same short-axis trick as the LOCF carry
and signature kernels. Within each series the float operations are
EXACTLY the scalar recurrence — ``(a*x) + (d*y)`` in that association —
which is what lets the driver oracle (a DuckDB RECURSIVE CTE computing
literally ``0.2*x + 0.8*ew``) match BIT-FOR-BIT, not just to a rounding
tolerance.

Why not pandas ``ewm``: its C kernel uses a different algebraic form
(``y + a*(x - y)``), which rounds differently — fine for smoothing, fatal
for a bit-exact cross-engine oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ewma", "holt"]


def ewma(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    order_cols: list[str] | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key EWMA; output = key_cols + ts/order cols + value + out_col."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    a, d = float(alpha), 1.0 - float(alpha)
    order_cols = order_cols or []
    carry = [ts_col, *order_cols]
    schema_cols = [*key_cols, *carry, value_col]
    sel = df.select(*schema_cols)
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in sel.dtypes] + [f"{out_col} double"]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([*key_cols, *carry], kind="mergesort").reset_index(
            drop=True
        )
        x = pdf[value_col].to_numpy(dtype=np.float64)
        # series boundaries from the sorted key columns
        if key_cols:
            keys = pdf[key_cols].to_numpy()
            new = np.ones(len(pdf), dtype=bool)
            new[1:] = (keys[1:] != keys[:-1]).any(axis=1)
        else:
            new = np.zeros(len(pdf), dtype=bool)
            new[:1] = True
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(pdf)))
        n_series, max_len = len(starts), int(lens.max()) if len(lens) else 0
        if n_series and n_series * max_len > 8 * len(pdf):
            # pathological length skew: the padded pivot would inflate
            # memory >8× — run the identical recurrence per series (same
            # float ops elementwise → bit-identical, O(len) memory)
            y = np.empty(len(pdf), dtype=np.float64)
            for s, ln in zip(starts, lens):
                xs = x[s : s + ln]
                cur = xs[0]
                y[s] = cur
                for t in range(1, ln):
                    cur = a * xs[t] + d * cur
                    y[s + t] = cur
            out = pdf.copy()
            out[out_col] = y
            return out
        # pivot: padded matrix, one sweep over the time axis
        xm = np.zeros((n_series, max_len), dtype=np.float64)
        mask = np.arange(max_len)[None, :] < lens[:, None]
        xm[mask] = x  # row-major fill == per-series order after the sort
        ym = np.empty_like(xm)
        cur = xm[:, 0].copy()  # y_1 = x_1
        ym[:, 0] = cur
        for t in range(1, max_len):
            # exactly (a*x) + (d*y): the scalar recurrence's rounding
            cur = np.where(mask[:, t], a * xm[:, t] + d * cur, cur)
            ym[:, t] = cur
        y = ym[mask]
        out = pdf.copy()
        out[out_col] = y
        return out

    return _grouped(sel, key_cols).applyInPandas(kernel, out_schema)


def _grouped(sel: DataFrame, key_cols: list[str]):
    """Coarse pmod-bucket grouping for the smoothing kernels (r6): with
    ``groupBy(*key_cols)`` each pandas call received exactly ONE series,
    so the padded (n_series × max_len) pivot always had one row and the
    documented cross-series vectorization never engaged. Bucketing
    ``xxhash64(keys) mod G`` (the sfa_words batching trick) hands each
    kernel call many series; per-series results are identical because
    the kernel already segments by the sorted key columns.

    G scales with the input — an applyInPandas group is one pandas frame
    in one task, so it is floored at the parallelism AND raised so a
    group holds ~8 MB of input by Catalyst's size estimate (unknown
    estimates are Long.Max and land on the row-bound cap, keeping groups
    bounded rather than cores-sized)."""
    if not key_cols:
        return sel.groupBy()
    spark = sel.sparkSession
    p = spark.sparkContext.defaultParallelism
    try:
        est = int(sel._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        est = 1 << 62
    g = min(p * 64, max(p, est >> 23))  # ~8 MB/group, capped at 64×cores
    grp = F.pmod(F.xxhash64(*key_cols), F.lit(g)).cast("int")
    return sel.groupBy(grp.alias("_grp"))


def holt(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) per series:

        lvl_1 = x_1,  trd_1 = 0
        lvl_t = a*x_t + (1-a)*(lvl_{t-1} + trd_{t-1})
        trd_t = b*(lvl_t - lvl_{t-1}) + (1-b)*trd_{t-1}

    Same column-sweep kernel as :func:`ewma` — vectorized across series,
    sequential only along the short time axis — and the same bit-exact
    discipline: every float expression keeps the association written
    above, so the DuckDB recursive-CTE oracle (carrying lvl and trd as
    two columns) matches without rounding. ``forecast_1`` = lvl + trd,
    the one-step-ahead prediction a monitoring tier alarms against.

    Output: key_cols + ts/order cols + value + (level, trend,
    forecast_1).
    """
    for nm, v in (("alpha", alpha), ("beta", beta)):
        if not 0.0 < v <= 1.0:
            raise ValueError(f"{nm} must be in (0, 1], got {v}")
    a, da = float(alpha), 1.0 - float(alpha)
    b, db = float(beta), 1.0 - float(beta)
    order_cols = order_cols or []
    carry = [ts_col, *order_cols]
    sel = df.select(*key_cols, *carry, value_col)
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in sel.dtypes]
        + ["level double", "trend double", "forecast_1 double"]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([*key_cols, *carry], kind="mergesort").reset_index(
            drop=True
        )
        x = pdf[value_col].to_numpy(dtype=np.float64)
        if key_cols:
            keys = pdf[key_cols].to_numpy()
            new = np.ones(len(pdf), dtype=bool)
            new[1:] = (keys[1:] != keys[:-1]).any(axis=1)
        else:
            new = np.zeros(len(pdf), dtype=bool)
            new[:1] = True
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(pdf)))
        n_series, max_len = len(starts), int(lens.max()) if len(lens) else 0
        if n_series and n_series * max_len > 8 * len(pdf):
            # same pathological-padding fallback as ewma: identical
            # float associations per element → bit-identical output
            lv = np.empty(len(pdf), dtype=np.float64)
            tv = np.empty(len(pdf), dtype=np.float64)
            for s, ln in zip(starts, lens):
                xs = x[s : s + ln]
                lvl_s, trd_s = xs[0], 0.0
                lv[s], tv[s] = lvl_s, trd_s
                for t in range(1, ln):
                    lvl_new = a * xs[t] + da * (lvl_s + trd_s)
                    trd_s = b * (lvl_new - lvl_s) + db * trd_s
                    lvl_s = lvl_new
                    lv[s + t], tv[s + t] = lvl_s, trd_s
            out = pdf.copy()
            out["level"] = lv
            out["trend"] = tv
            out["forecast_1"] = out["level"] + out["trend"]
            return out
        xm = np.zeros((n_series, max_len), dtype=np.float64)
        mask = np.arange(max_len)[None, :] < lens[:, None]
        xm[mask] = x
        lm = np.empty_like(xm)
        tm = np.empty_like(xm)
        lvl = xm[:, 0].copy()
        trd = np.zeros(n_series, dtype=np.float64)
        lm[:, 0], tm[:, 0] = lvl, trd
        for t in range(1, max_len):
            # associations pinned to the docstring formulas
            lvl_new = a * xm[:, t] + da * (lvl + trd)
            trd_new = b * (lvl_new - lvl) + db * trd
            upd = mask[:, t]
            lvl = np.where(upd, lvl_new, lvl)
            trd = np.where(upd, trd_new, trd)
            lm[:, t], tm[:, t] = lvl, trd
        out = pdf.copy()
        out["level"] = lm[mask]
        out["trend"] = tm[mask]
        out["forecast_1"] = out["level"] + out["trend"]
        return out

    return _grouped(sel, key_cols).applyInPandas(kernel, out_schema)
