"""Tiered continuous aggregates (1m/1h/1d) + LOCF gap-fill + retention.

This is the engine's rollup core (north rule: "time-series rollup +
downsample + retention engine ... gap-fill ... continuous aggregates").
The reference's analogue is disjoint (tumbling) windowing
(/root/reference/src/main/java/sfa/timeseries/TimeSeries.java:256-271,
``getDisjointSequences``); here a tumbling rollup is a plain hash
aggregate on ``(key, date_trunc(tier, ts))`` — Catalyst gives map-side
partial aggregation, so the shuffle carries one partial row per
(key, bucket) per input partition, not raw points.

Scale notes (100 TB / 1000 executors):
* The 1m tier is the only aggregation that reads raw points; 1h and 1d
  re-aggregate the next-finer tier (associative summaries only), so the
  expensive scan happens once.
* All three tiers group by the same key — ``repartition(key)`` once
  upstream makes the per-tier aggregations and the LOCF window reuse one
  exchange (Catalyst recognizes the co-partitioning).
* LOCF's dense spine is generated per key with ``sequence()`` — rows are
  produced executor-side (no driver loop) and stay co-partitioned with
  the aggregate they join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tier name → (date_trunc unit, bucket width in seconds)
TIERS: dict[str, tuple[str, int]] = {
    "1m": ("minute", 60),
    "1h": ("hour", 3600),
    "1d": ("day", 86400),
}

#: the summary columns every tier carries (all associative/re-aggregable)
SUMMARY_COLS = ["n", "sum", "min", "max", "first", "last"]


def bucket_expr(ts_col: str, tier: str) -> Column:
    unit, _ = TIERS[tier]
    return F.date_trunc(unit, F.col(ts_col))


def rollup_tier(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tier: str = "1m",
) -> DataFrame:
    """Aggregate raw points into one tier: tumbling ``date_trunc`` buckets.

    Output: key_cols + (bucket_ts, n, sum, min, max, first, last).
    ``first``/``last`` are value-at-min-ts / value-at-max-ts (min_by /
    max_by), i.e. deterministic, not partition-order ``F.first``.

    Unsplittable-input fixup (r6, guide §2.5): when ``df`` is a bare
    scan that cannot feed the cores (single-row-group parquet), it is
    repartitioned by ``key_cols`` first — the aggregation then runs
    distributed instead of inside the lone scan task, and because every
    later stage of the cascade (re-aggregation, LOCF window, bounds
    aggregate, encode) clusters by the same key prefix, that one
    exchange is the ONLY one the whole tier cascade pays (guide §2.4).
    No-op for real multi-partition tables and for composed inputs.
    """
    from sfa_spark.scanfix import pin_scan_parallelism

    df = pin_scan_parallelism(df, key_cols)
    v = F.col(value_col)
    return (
        df.groupBy(*key_cols, bucket_expr(ts_col, tier).alias("bucket_ts"))
        .agg(
            F.count(v).alias("n"),
            F.sum(v).alias("sum"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.min_by(v, F.col(ts_col)).alias("first"),
            F.max_by(v, F.col(ts_col)).alias("last"),
        )
    )


def reaggregate(
    tier_df: DataFrame, key_cols: list[str], to_tier: str
) -> DataFrame:
    """Re-aggregate a finer tier's partial summaries into a coarser tier.

    Only associative summaries are carried (SURVEY.md §7.1 stage 4):
    n=Σn, sum=Σsum, min=min(min), max=max(max), first=first-of-earliest-
    bucket, last=last-of-latest-bucket. Input must have the columns
    produced by :func:`rollup_tier` with ``bucket_ts``.
    """
    return (
        tier_df.groupBy(
            *key_cols, bucket_expr("bucket_ts", to_tier).alias("bucket_ts")
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.min_by("first", F.col("bucket_ts")).alias("first"),
            F.max_by("last", F.col("bucket_ts")).alias("last"),
        )
    )


def dense_spine(
    tier_df: DataFrame, key_cols: list[str], tier: str
) -> DataFrame:
    """Per-key dense bucket spine: every tier bucket between that key's
    min and max observed bucket. Generated executor-side via
    ``sequence() + explode`` — no driver loop, stays partitioned by key.

    NOTE (r6): :func:`gap_fill_locf` no longer uses this — it generates
    dense rows directly from the observed rows (join-free). This stays
    as a public utility for callers that need a bare spine.

    Explicit shuffle sizing (north rule): the per-key min/max aggregate is
    tiny (one row per key), so AQE coalesces its shuffle to ~1 partition —
    and the downstream explode fans each row out to possibly millions of
    bucket rows, which would then run single-threaded through the join,
    LOCF window, and encode stages. Repartitioning the *pre-explode* rows
    (cheap: |keys| rows) by key pins the fan-out across the cluster.

    r6: the pin must be ``2 × parallelism``, not ``parallelism``. With
    ``n_part == spark.sql.shuffle.partitions`` Catalyst recognises the
    repartition as redundant with the aggregate's own exchange and drops
    it, leaving an ENSURE_REQUIREMENTS exchange that AQE then coalesces
    by its 1 MB min-partition floor (measured: the whole explode + join +
    LOCF window ran in 6 tasks at sf1.0). A distinct count keeps the
    exchange as REPARTITION_BY_NUM — never AQE-coalesced — and
    hashpartitioning(key, 2p) still satisfies the downstream window's
    ClusteredDistribution(key), so no extra exchange of the dense rows
    (plan-gated; 1.7× on the materialized gap-fill at sf1.0).
    """
    _, step = TIERS[tier]
    spark = tier_df.sparkSession
    n_part = spark.sparkContext.defaultParallelism * 2
    return (
        tier_df.groupBy(*key_cols)
        .agg(F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi"))
        .repartition(n_part, *key_cols)
        .select(
            *key_cols,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step} SECOND"))
            ).alias("bucket_ts"),
        )
    )


def gap_fill_locf(
    tier_df: DataFrame,
    key_cols: list[str],
    tier: str,
    fill_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-fill a rollup tier with last-observation-carried-forward.

    Adds ``locf_filled: boolean`` (true where the bucket had no points).
    Empty buckets keep n=0; sum/min/max stay NULL (only the carried
    columns are filled) — matching a pandas ``resample().ffill()`` on the
    carried column.

    r6 rewrite (guide §2.4 "remove shuffles outright", same idea as the
    fused encoder): the old plan built the dense spine separately
    (bounds aggregate — a second full pass over the tier), LEFT-JOINED
    the observed buckets back onto it (a broadcast of the WHOLE tier:
    fine at sf0.1, 80 MB at sf1.0, impossible at 100 TB), and ran the
    LOCF window over the DENSE rows (10.5M rows at sf1.0). The dense
    rows are instead generated directly from the observed rows: one
    window pass per key computes ``lead(bucket_ts)`` and the carried
    value (``last(fill, ignorenulls)`` over observed rows only), then
    each observed row explodes to the buckets it covers —
    ``[bucket, next_bucket)`` — holding its carried value. LOCF by
    construction: no bounds pass, no join, no broadcast, and the window
    runs over observed rows (1M) instead of dense rows (10.5M).
    Verified bit-identical to the join formulation at sf1.0 (10,493,422
    rows), on multi-fill-col calls, and on NULL-valued observed buckets;
    6.3× on full materialization (1.78s → 0.28s noop at sf1.0).
    """
    from pyspark.sql import Window as W

    fill_cols = fill_cols or ["last"]
    _, step = TIERS[tier]
    w = W.partitionBy(*key_cols).orderBy("bucket_ts")
    wcum = w.rowsBetween(W.unboundedPreceding, 0)
    carry = [
        F.last(c, ignorenulls=True).over(wcum).alias(f"_carry_{c}")
        for c in fill_cols
    ]
    base = tier_df.select(
        *tier_df.columns, *carry, F.lead("bucket_ts").over(w).alias("_next_ts")
    )
    interval = F.expr(f"INTERVAL {step} SECOND")
    # fill range of one observed row: its own bucket up to (not incl.)
    # the key's next observed bucket; the key's last row covers itself.
    # greatest(...) guards duplicate (key, bucket_ts) input rows — lead
    # then equals the row's own bucket and sequence(b, b-step) would
    # throw; each duplicate emits its own bucket instead (the old join
    # formulation passed duplicates through without error)
    end = F.greatest(
        F.coalesce(F.col("_next_ts") - interval, F.col("bucket_ts")),
        F.col("bucket_ts"),
    )
    e = base.withColumn(
        "_fill_ts", F.explode(F.sequence(F.col("bucket_ts"), end, interval))
    )
    obs = F.col("_fill_ts") == F.col("bucket_ts")
    nobs = F.when(obs, F.col("n"))  # NULL on synthesized rows
    cols = []
    for c in tier_df.columns:
        if c in key_cols:
            cols.append(F.col(c))
        elif c == "bucket_ts":
            cols.append(F.col("_fill_ts").alias("bucket_ts"))
        elif c == "n":
            cols.append(F.coalesce(nobs, F.lit(0)).alias("n"))
        elif c in fill_cols:
            cols.append(F.col(f"_carry_{c}").alias(c))
        else:
            cols.append(F.when(obs, F.col(c)).alias(c))
    cols.append(nobs.isNull().alias("locf_filled"))
    return e.select(*cols)


def apply_retention(
    tier_df: DataFrame, now_ts, keep_seconds: int
) -> DataFrame:
    """Drop buckets older than the tier's retention window.

    ``now_ts`` is an explicit timestamp (never wall-clock — determinism).
    At scale this predicate prunes whole partitions when the tier table
    is written ``partitionBy(days(bucket_ts))``.
    """
    return tier_df.filter(
        F.col("bucket_ts")
        >= F.lit(now_ts) - F.expr(f"INTERVAL {keep_seconds} SECOND")
    )


def rollup_all_tiers(
    df: DataFrame, key_cols: list[str], ts_col: str, value_col: str
) -> dict[str, DataFrame]:
    """The standard cascade: raw → 1m → 1h → 1d (scan raw once)."""
    t1m = rollup_tier(df, key_cols, ts_col, value_col, "1m")
    t1h = reaggregate(t1m, key_cols, "1h")
    t1d = reaggregate(t1h, key_cols, "1d")
    return {"1m": t1m, "1h": t1h, "1d": t1d}
