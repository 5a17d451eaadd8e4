"""Mergeable fixed-bucket histograms + quantile estimation.

The third mergeable summary a continuous-aggregate tier carries (after
the plain associative stats in rollup.py and the HLL/count-min sketches
in sketches.py): per (key, bucket_ts) a vector of value-bucket counts.
Counts merge across tiers by element-wise ADDITION — so 1h histograms
re-aggregate to 1d without rescanning raw data — and quantiles are
estimated from the merged counts with the standard linear interpolation
inside the crossing bucket (the formula behind Prometheus'
``histogram_quantile``).

Representation is SPARSE rows (key..., bucket_ts, vbucket, cnt), not an
array column: a hash aggregate with map-side combine produces it
directly, absent buckets mean 0, and tier merge is the same groupBy-sum
as every other summary. ``vbucket`` for edges ``[e_0..e_{k-1}]`` is
``#edges <= value`` (0 = below e_0, k = above the top edge), computed
with a branch-free sum of comparisons — identical arithmetic is
trivially expressible in any SQL engine, which is what makes the DuckDB
oracle exact.

All counts are integers (exact on any engine, any partitioning); the
only float is the final interpolation, a fixed-order expression over
exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["vbucket_expr", "hist_rollup", "hist_merge", "hist_quantile"]


def vbucket_expr(value_col: str, edges: list[float]) -> Column:
    """Branch-free bucket index: #edges <= value (NULL-safe: NULL → NULL)."""
    v = F.col(value_col)
    idx = F.lit(0)
    for e in edges:
        idx = idx + F.when(v >= F.lit(float(e)), 1).otherwise(0)
    return F.when(v.isNull(), F.lit(None)).otherwise(idx)


def hist_rollup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    edges: list[float],
    tier: str = "1h",
) -> DataFrame:
    """Sparse histogram tier: key_cols + (bucket_ts, vbucket, cnt)."""
    from sfa_spark.rollup import bucket_expr

    return (
        df.filter(F.col(value_col).isNotNull())  # NULL sorts differ by engine
        .groupBy(
            *key_cols,
            bucket_expr(ts_col, tier).alias("bucket_ts"),
            vbucket_expr(value_col, edges).alias("vbucket"),
        )
        .agg(F.count(value_col).alias("cnt"))
    )


def hist_merge(hist: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge finer histograms into coarser groups: element-wise count sum.
    ``group_cols`` are the surviving grouping columns (e.g. drop the
    hour, keep the day)."""
    return hist.groupBy(*group_cols, "vbucket").agg(F.sum("cnt").alias("cnt"))


def hist_quantile(
    hist: DataFrame,
    group_cols: list[str],
    edges: list[float],
    q: float,
    round_to: int = 6,
) -> DataFrame:
    """Estimate the q-quantile per group from sparse bucket counts.

    Linear interpolation inside the bucket where the cumulative count
    crosses ``rank = q * total`` (the ``histogram_quantile`` rule):
    ``lo + (hi - lo) * (rank - cum_below) / cnt``. The open-ended edge
    buckets clamp to the nearest edge (below ``e_0`` → ``e_0``, above
    the top → top edge), which is also Prometheus' behavior for the
    +Inf bucket. Output: group_cols + (est,).
    """
    from pyspark.sql.window import Window

    k = len(edges)
    lo = F.array(*[F.lit(float(e)) for e in [edges[0], *edges]])
    hi = F.array(*[F.lit(float(e)) for e in [*edges, edges[-1]]])
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("vbucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(*group_cols)
    cum = F.sum("cnt").over(w)
    total = F.sum("cnt").over(wg)
    rank = F.lit(float(q)) * total
    below = cum - F.col("cnt")
    # the crossing bucket: first with cum >= rank; ties to the earliest
    cand = hist.select(
        *group_cols,
        "vbucket",
        "cnt",
        cum.alias("_cum"),
        total.alias("_tot"),
        rank.alias("_rank"),
        below.alias("_below"),
    ).filter(F.col("_cum") >= F.col("_rank"))
    first = cand.groupBy(*group_cols).agg(
        F.min_by(
            F.struct("vbucket", "cnt", "_below", "_rank"), F.col("vbucket")
        ).alias("_s")
    )
    vb = F.col("_s.vbucket")
    lo_e = F.element_at(lo, vb + 1)
    hi_e = F.element_at(hi, vb + 1)
    est = lo_e + (hi_e - lo_e) * (F.col("_s._rank") - F.col("_s._below")) / F.col(
        "_s.cnt"
    )
    return first.select(*group_cols, F.round(est, round_to).alias("est"))
