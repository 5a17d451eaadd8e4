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


def streaming_locf_carry(
    stream: DataFrame,
    key_cols: list[str],
    tier: str = "1m",
    ts_col: str = "bucket_ts",
    value_col: str = "value",
) -> DataFrame:
    """Custom STATEFUL streaming operator: LOCF gap-fill as a
    ``applyInPandasWithState`` kernel.

    Input: a stream of observed tier rows (key…, bucket_ts, value).
    Per key, the GroupState carries (last emitted bucket, last value);
    each micro-batch emits the DENSE bucket range from the carried
    position through the batch's newest observation, forward-filling
    gaps — the streaming twin of rollup.gap_fill_locf (verified equal in
    tests when the same rows arrive in time order). State is two scalars
    per key: O(keys) memory regardless of stream length.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    _, step = TIERS[tier]
    bucket_us = int(step) * 1_000_000
    key_schema = ", ".join(f"{c} {dict(stream.dtypes)[c]}" for c in key_cols)
    out_schema = f"{key_schema}, bucket_ts timestamp, value double, locf_filled boolean"
    state_schema = "last_us long, last_value double"

    def fn(key, pdfs, state):
        obs = pd.concat(list(pdfs), ignore_index=True)
        if obs.empty:
            return
        us = (
            obs[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        )
        order = np.argsort(us, kind="stable")
        us = us[order]
        vals = obs[value_col].to_numpy(dtype=np.float64)[order]
        if state.exists:
            last_us, last_v = state.get
            start = last_us + bucket_us
            carry = last_v
        else:
            start = int(us[0])
            carry = np.nan
        # Late/replayed rows at or before the carried position would
        # searchsorted to idx 0 and (being bucket-aligned) silently land
        # in the wrong bucket — drop them before building the dense range.
        keep = us >= start
        us, vals = us[keep], vals[keep]
        if us.size == 0:
            return
        end = int(us[-1])
        ts = np.arange(start, end + 1, bucket_us, dtype=np.int64)
        dense = np.full(ts.size, np.nan)
        idx = np.searchsorted(ts, us)
        sel = (us - start) % bucket_us == 0
        dense[idx[sel]] = vals[sel]
        observed = ~np.isnan(dense)
        seen = np.maximum.accumulate(np.where(observed, np.arange(ts.size), -1))
        filled = np.where(seen >= 0, dense[np.maximum(seen, 0)], carry)
        state.update((int(ts[-1]), float(filled[-1])))
        out = pd.DataFrame(
            {
                "bucket_ts": pd.to_datetime(ts, unit="us"),
                "value": filled,
                "locf_filled": ~observed,
            }
        )
        for c, v in zip(key_cols, key):
            out[c] = v
        yield out[[*key_cols, "bucket_ts", "value", "locf_filled"]]

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


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


def tier_batch_sink(tio, tier: str):
    """The ``foreachBatch`` body for :func:`stream_tier_to_table`,
    exposed for direct testing of the replay fence."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        m = tio.manifest() or {}
        done = m.get("metrics", {}).get("stream_batch_id", -1)
        if batch_id <= done:
            return  # replayed batch — cheap early skip (no data write)
        rows = batch_df.withColumn("dt", F.to_date("bucket_ts"))
        if rows.isEmpty():
            return
        # the authoritative fence re-checks UNDER the commit lock: two
        # concurrent replays of the same batch can both pass the early
        # check above, but only the first one's commit survives — the
        # loser's staged data is discarded atomically (exactly-once
        # under arbitrary writer interleaving, not just sink retries)
        tio.write_snapshot(
            rows,
            "dt",
            job=f"stream_batch_{batch_id}",
            metrics={"tier": tier, "stream_batch_id": batch_id},
            merge_partitions=True,
            precondition=lambda man: man.get("metrics", {}).get(
                "stream_batch_id", -1
            )
            < batch_id,
        )

    return sink


def stream_tier_to_table(
    spark: SparkSession,
    stream: DataFrame,
    table_root: str,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tier: str = "1m",
    watermark: str = "10 minutes",
    checkpoint_dir: str | None = None,
    query_name: str = "tier_stream_sink",
):
    """Streaming ingest → the SAME snapshot tier table the batch refresh
    maintains: event-time rollup (append mode — the watermark finalizes
    each bucket exactly once) → ``foreachBatch`` committing every
    micro-batch through TableIO as a day-partitioned snapshot with
    ``merge_partitions`` (finalized buckets APPEND to their day's files;
    counts/sums/min/max/first/last re-aggregate associatively downstream,
    so coarser tiers and readers use rollup.reaggregate unchanged).

    Exactly-once across sink retries: each commit records its stream
    batch id; a replayed batch (foreachBatch is at-least-once) sees
    ``stream_batch_id >= batch_id`` in the current manifest and skips —
    the snapshot chain is the idempotence ledger, the same mechanism the
    batch refresh uses for kill-resume. Returns the StreamingQuery.
    """
    from sfa_spark.tableio import TableIO

    agg = streaming_rollup(stream, key_cols, ts_col, value_col, tier, watermark)
    sink = tier_batch_sink(TableIO(table_root), tier)
    writer = (
        agg.writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(sink)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def hll_batch_sink(tio, ts_col: str, value_col: str, p: int = 12):
    """``foreachBatch`` body maintaining a day-grouped HLL REGISTER table
    through the snapshot fence (exposed for direct fence testing).

    Each micro-batch appends its own batch-local registers to the day's
    partition (``merge_partitions``); readers re-merge by element-wise
    max (sketches.hll_merge) — the same associative-append model as the
    tier sink, so there is NO read-modify-write and concurrent batches
    cannot lose updates. Replays are fenced by stream_batch_id exactly
    like tier_batch_sink."""
    from sfa_spark.operators.sketches import hll_registers

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        m = tio.manifest() or {}
        done = m.get("metrics", {}).get("stream_batch_id", -1)
        if batch_id <= done:
            return
        if batch_df.isEmpty():
            return
        regs = hll_registers(
            batch_df.withColumn("day", F.date_trunc("day", F.col(ts_col))),
            ["day"],
            value_col,
            p,
        ).withColumn("dt", F.to_date("day"))
        tio.write_snapshot(
            regs,
            "dt",
            job=f"hll_batch_{batch_id}",
            metrics={"sketch": f"hll_p{p}", "stream_batch_id": batch_id},
            merge_partitions=True,
            precondition=lambda man: man.get("metrics", {}).get(
                "stream_batch_id", -1
            )
            < batch_id,
        )

    return sink


def stream_hll_to_table(
    spark: SparkSession,
    stream: DataFrame,
    table_root: str,
    ts_col: str,
    value_col: str,
    p: int = 12,
    checkpoint_dir: str | None = None,
    query_name: str = "hll_stream_sink",
):
    """Streaming ingest → persistent HLL register table: raw stream →
    per-micro-batch registers appended through the exactly-once snapshot
    fence. Distinct-count queries read the table and fold it with
    ``hll_merge`` + ``hll_estimate`` — registers merged across any
    number of micro-batches are bit-identical to a one-shot batch build
    (max is associative/commutative/idempotent), which is the mergeable-
    sketch property that lets a streaming tier answer the same continuous
    aggregates as the batch cascade. Returns the StreamingQuery."""
    from sfa_spark.tableio import TableIO

    sink = hll_batch_sink(TableIO(table_root), ts_col, value_col, p)
    writer = stream.writeStream.queryName(query_name).foreachBatch(sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_sessions(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization with Spark's native ``session_window``:
    events within ``gap`` of each other merge into one session whose
    window grows until a quiet period closes it (the stateful equivalent
    of the batch lag-gap derivation in queries.sessions_30m — semantics
    coincide except at gaps EXACTLY equal to ``gap``, a measure-zero
    case for microsecond timestamps; tests assert count parity on real
    data). Append mode: the watermark finalizes each session once.

    Output: key_cols + (session_start, session_end, n_events).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.session_window(F.col(ts_col), gap).alias("_w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
        )
    )
