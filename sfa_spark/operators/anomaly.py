"""Seasonal-baseline anomaly scoring over rollup tiers.

The monitoring question a tiered store answers after "what is the 1h
rollup" is "is this hour NORMAL for this series?" — the standard
answer (seasonal-naive baseline, the same shape Prometheus recording
rules and classic dashboards use) compares each bucket to the SAME
PHASE of previous periods: hour-18 today vs hour-18 of the last n days.

``seasonal_anomaly`` computes, per (key, bucket):

* ``phase``     — bucket index within the period (e.g. hour-of-day),
* ``baseline``  — mean of the value at the same phase over the previous
  ``n_periods`` periods (rows-preceding frame: the CURRENT value never
  leaks into its own baseline),
* ``sigma``     — sample stddev of those same prior values,
* ``z``         — (value - baseline) / sigma, NULL when fewer than
  ``min_history`` prior observations or sigma below ``sigma_floor``
  (an all-but-constant history makes a z-score meaningless — and
  numerically explosive),
* ``is_anomaly`` — |z| > threshold.

Spark plan: ONE window partitioned by (key, phase) ordered by bucket —
no self-join against the shifted history, which at 10^12 rows would be
n_periods extra shuffles. The phase is exact integer arithmetic off
epoch microseconds, so the grouping is engine-independent (the DuckDB
oracle re-derives it bit-for-bit; float mean/stddev are rounded on
comparison like every order-sensitive aggregate in queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["seasonal_anomaly"]


def seasonal_anomaly(
    tier: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    bucket_seconds: int,
    period_buckets: int,
    n_periods: int = 7,
    min_history: int = 3,
    sigma_floor: float = 1e-9,
    threshold: float = 3.0,
) -> DataFrame:
    """Score each tier bucket against its same-phase history.

    Output: key_cols + (bucket_col, phase, value, n_hist, baseline,
    sigma, z, is_anomaly).
    """
    us = F.unix_micros(F.col(bucket_col).cast("timestamp"))
    step = int(bucket_seconds) * 1_000_000
    phase = F.pmod(F.floor(us / F.lit(step)).cast("long"), F.lit(int(period_buckets)))
    w = (
        Window.partitionBy(*key_cols, "phase")
        .orderBy(bucket_col)
        .rowsBetween(-int(n_periods), -1)
    )
    v = F.col(value_col)
    base = tier.withColumn("phase", phase)
    n_hist = F.count(v).over(w)
    mean = F.avg(v).over(w)
    sd = F.stddev_samp(v).over(w)
    scored = base.select(
        *key_cols,
        bucket_col,
        "phase",
        v.alias("value"),
        n_hist.alias("n_hist"),
        mean.alias("baseline"),
        sd.alias("sigma"),
    )
    usable = (F.col("n_hist") >= F.lit(int(min_history))) & (
        F.col("sigma") > F.lit(float(sigma_floor))
    )
    z = F.when(usable, (F.col("value") - F.col("baseline")) / F.col("sigma"))
    return scored.select(
        "*",
        z.alias("z"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(float(threshold))).alias("is_anomaly"),
    )
