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

from sfa_spark.rollup import rollup_tier
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
) -> dict:
    """Incrementally roll up ``events`` into the tier table at
    ``table_root``. Returns {planned, processed, skipped, snapshot}."""
    tio = TableIO(table_root)
    planned = [
        str(r["dt"])
        for r in events.select(F.to_date(ts_col).alias("dt")).distinct().collect()
    ]
    missing = tio.missing_partitions(planned)
    if not missing:
        return {
            "planned": sorted(planned),
            "processed": [],
            "skipped": sorted(planned),
            "snapshot": tio.current_snapshot(),
        }
    slice_df = events.filter(F.to_date(ts_col).isin(missing))
    tier_df = rollup_tier(slice_df, key_cols, ts_col, value_col, tier).withColumn(
        "dt", F.to_date("bucket_ts")
    )
    rows_by_day = {
        str(r["dt"]): r["n"]
        for r in tier_df.groupBy("dt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    snap = tio.write_snapshot(
        tier_df,
        "dt",
        job=job,
        metrics={"tier": tier, "rollup_rows_by_day": rows_by_day},
    )
    return {
        "planned": sorted(planned),
        "processed": sorted(missing),
        "skipped": sorted(set(planned) - set(missing)),
        "snapshot": snap,
    }


def read_tier(spark: SparkSession, table_root: str) -> DataFrame:
    return TableIO(table_root).read(spark)
