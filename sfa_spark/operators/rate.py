"""Counter rate/increase with reset handling — the monitoring-store
primitive (Prometheus ``increase()``/``rate()`` semantics) the rollup
tiers need for counter-typed series.

A counter is monotonically increasing except when its process restarts
and it falls back toward 0. The per-sample contribution is therefore

* ``v_t - v_{t-1}``  when ``v_t >= v_{t-1}`` (normal growth), and
* ``v_t``            when ``v_t <  v_{t-1}`` (reset: everything since
  the restart counts, the pre-reset remainder is unobservable).

``counter_increase`` buckets those contributions into rollup tiers
(attributed to the LATER sample's bucket — each delta is observed at
``t``), giving per-bucket ``increase`` and ``rate = increase / width``.

Spark plan: one ``lag`` window per key (same shuffle shape as LOCF /
sessionization — a key's history sorts once) followed by a
map-side-combined hash aggregate onto (key, bucket). No Python in the
data plane. The first sample of a series has no predecessor and
contributes nothing (its growth is unobservable), matching Prometheus.

Scale: identical profile to rollup_tier — the window is the only
per-key-ordered pass, and at 10^12 rows it's the same partitioning the
encode stage already pins (hash-bucket by key), so the exchange is
shared. Integer counters aggregate exactly; float counters' bucket sums
are order-sensitive in the last ulp like any float sum (round on
comparison, as the tier oracles do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sfa_spark.rollup import TIERS, bucket_expr

__all__ = ["counter_increase"]


def counter_increase(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    counter_col: str,
    tier: str = "1h",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per (key, tier bucket): n_samples, n_resets, increase, rate.

    ``order_cols`` breaks timestamp ties deterministically (defaults to
    the timestamp alone — pass the event id when duplicates exist).
    """
    from sfa_spark.scanfix import pin_scan_parallelism

    # Unsplittable-input fixup (r6 continuation, guide §2.5): on a bare
    # single-row-group scan the window's own exchange distributes the
    # FULL query fine — but a count()/distinct-style consumer prunes the
    # window away, and the partial aggregation then runs inside the lone
    # scan task (measured at a 10M-row single-row-group table: count 7.6s
    # vs 3.7s full noop). Pinning by key first serves both shapes: the
    # window reuses the repartition (same ClusteredDistribution), so the
    # full plan pays no extra exchange. No-op for composed inputs (the
    # declared counter_rate_1h feeds a windowed frame) and real tables.
    df = pin_scan_parallelism(df, key_cols)
    _, width = TIERS[tier]
    order = [F.col(ts_col), *[F.col(c) for c in (order_cols or [])]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # materialize the lag ONCE: inlining the window expression into the
    # delta/reset CASEs made Catalyst plan FIVE identical lag() window
    # expressions (one per reference — r6 plan audit); a select boundary
    # pins a single `_prev` column the projections then reuse
    v, prev = F.col(counter_col), F.col("_prev")
    delta = F.when(prev.isNull(), F.lit(None)).otherwise(
        F.when(v >= prev, v - prev).otherwise(v)
    )
    reset = F.when(prev.isNotNull() & (v < prev), F.lit(1)).otherwise(F.lit(0))
    # bucket_expr is computed in the SECOND select, after the window's
    # exchange: putting it in the first select pinned the date_trunc into
    # the pre-shuffle (scan) stage, which on an unsplittable input is a
    # single task (r6 plan audit) — deferred, it runs distributed
    return (
        df.select(
            *key_cols,
            F.col(ts_col),
            F.col(counter_col),
            F.lag(counter_col).over(w).alias("_prev"),
        )
        .select(
            *key_cols,
            bucket_expr(ts_col, tier).alias("bucket_ts"),
            delta.alias("_d"),
            reset.alias("_r"),
        )
        .groupBy(*key_cols, "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("_r").alias("n_resets"),
            F.coalesce(F.sum("_d"), F.lit(0)).alias("increase"),
            (F.coalesce(F.sum("_d"), F.lit(0)) / F.lit(float(width))).alias("rate"),
        )
    )
