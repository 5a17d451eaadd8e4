"""Structured Streaming variant of the 1m rollup tier.

The north rule's continuous aggregates are batch (incremental refresh via
snapshots — sfa_spark.incremental); this module is the streaming-ingest
shape for the same tier: file-source readStream → event-time tumbling
window aggregation with a watermark for late data → sink. The aggregate
carries the same summary columns as the batch tier so a streaming
micro-batch output can be merged into the tier table by the same
re-aggregation (rollup.reaggregate) — counts/sums/min/max re-aggregate
associatively; first/last carry their ordering columns.

(The reference has no streaming runtime; its one streaming-shaped
operator, the O(1)-per-window MFT recurrence, lives in transform/mft.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfa_spark.rollup import TIERS


def streaming_rollup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tier: str = "1m",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time tumbling rollup with late-data watermark.

    Output schema matches rollup.rollup_tier plus the window struct is
    flattened to bucket_ts (window start).
    """
    _, step = TIERS[tier]
    v = F.col(value_col)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.window(ts_col, f"{step} seconds").alias("_w"))
        .agg(
            F.count(v).alias("n"),
            F.sum(v).alias("sum"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.min_by(v, F.col(ts_col)).alias("first"),
            F.max_by(v, F.col(ts_col)).alias("last"),
        )
    )
    return agg.select(*key_cols, F.col("_w.start").alias("bucket_ts"),
                      "n", "sum", "min", "max", "first", "last")


def run_stream_once(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tier: str = "1m",
    query_name: str = "tier_stream",
) -> DataFrame:
    """Drive a file-source stream to completion synchronously (local
    smoke path): parquet dir → streaming rollup → in-memory table.
    Returns the completed result as a DataFrame."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = streaming_rollup(stream, key_cols, ts_col, value_col, tier)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
