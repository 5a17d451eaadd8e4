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

__all__ = ["ewma"]


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
        y = np.empty(len(pdf), dtype=np.float64)
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

    return sel.groupBy(*key_cols).applyInPandas(kernel, out_schema)
