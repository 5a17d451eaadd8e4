"""Visualization-grade series downsampling: M4 and LTTB.

Rollup tiers (rollup.py) answer *analytic* queries; dashboards ask a
different question — "give me <= W points per series that draw the same
pixel line as the raw data". Two published answers:

* **M4** (Jugel et al., "M4: A Visualization-Oriented Time Series Data
  Aggregation", VLDB 2014): per pixel-column bucket keep min/max value
  and first/last point. Error-free at pixel resolution, and — crucially
  for this engine — a plain hash aggregate: one map-side-combined
  groupBy, no window, no shuffle beyond the (key, bucket) agg. At
  10^12 rows this is the only downsample that costs the same as the 1m
  rollup tier.
* **LTTB** (Steinarsson, "Downsampling Time Series for Visual
  Representation", 2013): largest-triangle-three-buckets. Sequential
  per series (each pick depends on the previous pick), so it runs as a
  vectorized per-series ``applyInPandas`` kernel; for series too large
  for one task, run M4 first and LTTB over its output — the composition
  keeps the kernel's input bounded. Used when a fixed point budget
  matters more than pixel-exactness.

The reference's analogue is disjoint-window summarization
(/root/reference/src/main/java/sfa/timeseries/TimeSeries.java:256-271);
M4 is the summary a *rendering* tier stores.

Scale notes (100 TB): M4 buckets are computed from integer microsecond
arithmetic — ``(us_into_span * width) // span_us`` — so bucket edges are
exact and reproducible in any engine (the DuckDB oracle re-derives them
bit-for-bit). The aggregate re-uses the same (key, bucket) shuffle shape
as the rollup tiers, and AQE coalesces the tiny output. LTTB's kernel is
O(points) per series with numpy argmax per bucket — never all-pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    span_start: str | F.Column,
    span_seconds: int,
    width: int = 256,
) -> DataFrame:
    """M4 aggregation: per (key, pixel bucket) the 4 extreme points.

    ``span_start`` is a column/expression giving each row's span origin
    (e.g. ``date_trunc('day', ts)`` for one chart per day); rows map to
    bucket ``(us_since_origin * width) // (span_seconds * 10^6)`` —
    pure integer arithmetic, no float edges.

    Output: key_cols + bucket + (ts_first, ts_last, v_first, v_last,
    v_min, v_max, n). first/last are value-at-min/max-ts (deterministic
    min_by/max_by, same convention as rollup_tier).
    """
    from sfa_spark.scanfix import pin_scan_parallelism

    df = pin_scan_parallelism(df, key_cols)
    origin = F.col(span_start) if isinstance(span_start, str) else span_start
    us_in = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        origin.cast("timestamp")
    )
    span_us = int(span_seconds) * 1_000_000
    # floor-of-double-division is exact here: numerator < 2^53 and a
    # quotient can only sit within ulp of an integer when it IS one
    bucket = F.floor((us_in * F.lit(int(width))) / F.lit(span_us)).cast("long")
    v, ts = F.col(value_col), F.col(ts_col)
    return df.groupBy(
        *key_cols, origin.alias("span_start"), bucket.alias("bucket")
    ).agg(
        F.min(ts).alias("ts_first"),
        F.max(ts).alias("ts_last"),
        F.min_by(v, ts).alias("v_first"),
        F.max_by(v, ts).alias("v_last"),
        F.min(v).alias("v_min"),
        F.max(v).alias("v_max"),
        F.count(v).alias("n"),
    )


def lttb_downsample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    n_out: int = 256,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets to exactly ``min(n_out, n)`` points
    per key.

    Classic LTTB: first/last points pinned; interior points split into
    ``n_out - 2`` equal-count buckets; from each bucket pick the point
    maximizing the triangle area with the previously picked point and
    the NEXT bucket's centroid. Sequential in the pick chain, so it runs
    per-series inside ``applyInPandas`` with numpy doing each bucket's
    area argmax in one vectorized shot (ties → earliest point, so the
    result is partition-order independent).
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3 (first/last + interior), got {n_out}")
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in df.select(*key_cols).dtypes]
        + [
            f"{ts_col} {dict(df.dtypes)[ts_col]}",
            f"{value_col} double",
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[[*key_cols, ts_col, value_col]]
        x = pdf[ts_col].astype("int64").to_numpy(dtype=np.float64)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        # n_out-2 interior buckets over points 1..n-2 (integer edges)
        nb = n_out - 2
        edges = 1 + (np.arange(nb + 1, dtype=np.int64) * (n - 2)) // nb
        picked = [0]
        a = 0
        for b in range(nb):
            lo, hi = int(edges[b]), int(edges[b + 1])
            if hi <= lo:
                continue
            if b + 1 < nb:
                nlo, nhi = int(edges[b + 1]), int(edges[b + 2])
            else:
                nlo = nhi = 0
            if nhi > nlo:
                cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
            else:
                cx, cy = x[n - 1], y[n - 1]
            area = np.abs(
                (x[a] - cx) * (y[lo:hi] - y[a]) - (x[a] - x[lo:hi]) * (cy - y[a])
            )
            a = lo + int(np.argmax(area))  # argmax → first max: deterministic
            picked.append(a)
        picked.append(n - 1)
        return pdf.iloc[picked][[*key_cols, ts_col, value_col]]

    return df.select(*key_cols, ts_col, F.col(value_col).cast("double")).groupBy(
        *key_cols
    ).applyInPandas(kernel, out_schema)
