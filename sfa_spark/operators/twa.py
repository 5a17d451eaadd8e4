"""Time-weighted average over the LOCF curve — irregular samples done right.

A plain ``avg(value)`` per bucket weights every SAMPLE equally; for
irregularly-sampled series (exactly what per-url crawl timestamps are)
the meaningful per-bucket summary is the time integral of the
last-observation-carried-forward curve divided by covered time — the
TimescaleDB ``time_weight('LOCF')`` hyperfunction.

Semantics: per key, each sample holds its value over ``[ts, next_ts)``
(``lead`` over the full series, so holds CROSS bucket boundaries); the
integration domain is ``[first_ts, last_ts]`` of the series (the final
sample holds nothing — nothing after it was observed). Per (key,
bucket): ``twa = sum(v * overlap_us) / sum(overlap_us)`` where overlap
clips each holding interval to the bucket.

Plan shape (the same discretize-time idiom as the interval join): the
hold intervals are exploded to their covered buckets EXECUTOR-side
(``sequence`` — at most span/width + 1 rows per sample), then one hash
aggregate. One ``lead`` window per key + one groupBy — no dense spine
materialization, no per-row Python. All interval arithmetic is exact
integer microseconds; the only float is the final weighted mean (round
on comparison like every float aggregate, queries.py header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sfa_spark.rollup import TIERS

__all__ = ["time_weighted_avg"]


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tier: str = "1h",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per (key, tier bucket): covered_us, twa.

    Output: key_cols + (bucket_ts, n_samples, covered_us, twa).
    ``covered_us < bucket width`` at series edges; buckets the series
    never covers produce no row (gap-fill them downstream if needed).
    """
    _, width = TIERS[tier]
    step = int(width) * 1_000_000
    order = [F.col(ts_col), *[F.col(c) for c in (order_cols or [])]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    seg = df.select(
        *key_cols,
        us.alias("_t0"),
        F.lead(us).over(w).alias("_t1"),
        F.col(value_col).alias("_v"),
    ).filter(F.col("_t1").isNotNull())  # the last sample holds nothing
    # exact integer bucket indices (`div`), not float floor-division
    b0 = F.expr(f"_t0 div {step}")
    b1 = F.expr(f"(_t1 - 1) div {step}")
    e = seg.withColumn("_b", F.explode(F.sequence(b0, b1)))
    bstart = F.col("_b") * F.lit(step)
    overlap = F.least(F.col("_t1"), bstart + F.lit(step)) - F.greatest(
        F.col("_t0"), bstart
    )
    return (
        e.select(
            *key_cols,
            F.timestamp_micros(bstart).cast("timestamp_ntz").alias("bucket_ts"),
            F.col("_v"),
            overlap.alias("_ov"),
            (F.col("_t0") >= bstart).cast("long").alias("_starts_here"),
        )
        .groupBy(*key_cols, "bucket_ts")
        .agg(
            F.sum("_starts_here").alias("n_samples"),
            F.sum("_ov").alias("covered_us"),
            (F.sum(F.col("_v") * F.col("_ov")) / F.sum("_ov")).alias("twa"),
        )
    )
