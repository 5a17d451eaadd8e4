"""Incremental tier refresh with snapshot checkpoints + resume.

North rule: "resumable from Iceberg-snapshot checkpoints with
per-partition lineage manifests and encode/rollup metrics". The tier
tables are partitioned by day (``dt = to_date(bucket_ts)``) — tumbling
1m/1h/1d buckets nest inside days, so a day partition is a closed,
independently-recomputable unit. A refresh:

  1. plans the day partitions present in the input slice,
  2. diffs them against the current snapshot's manifest
     (``TableIO.missing_partitions``) — a killed run resumes here and
     re-processes ONLY what never committed,
  3. aggregates just the missing days (partition-pruned input scan),
  4. commits a new snapshot carrying forward untouched partitions, with
     per-partition rollup metrics in the manifest.

Gap-fill/encode consume the committed tier table afterwards; their LOCF
carry crosses day boundaries, so they run over the table read, not per
partition (their block outputs are epoch-aligned and idempotent — see
sfa_spark.encode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfa_spark.rollup import reaggregate, rollup_tier
from sfa_spark.tableio import TableIO


def refresh_tier(
    spark: SparkSession,
    events: DataFrame,
    table_root: str,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tier: str = "1h",
    job: str = "refresh",
    source: str = "raw",
    recompute_stale: bool = True,
) -> dict:
    """Incrementally roll up ``events`` into the tier table at
    ``table_root``. Returns {planned, processed, skipped, stale, snapshot}.

    ``source="raw"`` aggregates raw points (:func:`rollup_tier`);
    ``source="tier"`` re-aggregates a FINER tier table
    (:func:`reaggregate`) — the cascade path: 1h refreshes from the
    committed 1m snapshot, 1d from 1h, so raw data is scanned exactly
    once per refresh across all tiers.

    Late-data detection: each commit records the per-day input row count
    (``input_rows_by_day``, cumulative across the lineage). A planned day
    that is already committed but whose incoming row count differs is
    **stale** — late-arriving rows landed in a closed day. With
    ``recompute_stale`` (default) its partition is recomputed in place
    (day partitions are closed, independently-recomputable units);
    otherwise it is only surfaced in the returned dict.
    """
    tio = TableIO(table_root)
    per_day = {
        str(r["dt"]): r["n"]
        for r in events.groupBy(F.to_date(ts_col).alias("dt"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    planned = sorted(per_day)
    missing = set(tio.missing_partitions(planned))
    prev_counts = (tio.manifest() or {}).get("metrics", {}).get(
        "input_rows_by_day", {}
    )
    stale = sorted(
        d
        for d in planned
        if d not in missing and d in prev_counts and prev_counts[d] != per_day[d]
    )
    to_process = sorted(missing | set(stale)) if recompute_stale else sorted(missing)
    if not to_process:
        return {
            "planned": planned,
            "processed": [],
            "skipped": planned,
            "stale": stale,
            "snapshot": tio.current_snapshot(),
        }
    slice_df = events.filter(F.to_date(ts_col).isin(to_process))
    if source == "tier":
        agg_df = reaggregate(slice_df, key_cols, tier)
    else:
        agg_df = rollup_tier(slice_df, key_cols, ts_col, value_col, tier)
    tier_df = agg_df.withColumn("dt", F.to_date("bucket_ts"))
    rows_by_day = {
        str(r["dt"]): r["n"]
        for r in tier_df.groupBy("dt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    snap = tio.write_snapshot(
        tier_df,
        "dt",
        job=job,
        metrics={
            "tier": tier,
            "rollup_rows_by_day": rows_by_day,
            "input_rows_by_day": {
                **prev_counts,
                **{d: per_day[d] for d in to_process},
            },
        },
    )
    return {
        "planned": planned,
        "processed": to_process,
        "skipped": sorted(set(planned) - set(to_process)),
        "stale": stale,
        "snapshot": snap,
    }


def read_tier(spark: SparkSession, table_root: str) -> DataFrame:
    return TableIO(table_root).read(spark)
