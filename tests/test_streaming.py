"""Structured Streaming 1m rollup == batch rollup on the same files."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sfa_spark.rollup import rollup_tier
from sfa_spark.streaming import run_stream_once

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_streaming_rollup_matches_batch(spark, events, tmp_path):
    src = str(tmp_path / "stream_src")
    events.limit(3000).write.parquet(src)
    got = (
        run_stream_once(spark, src, SCHEMA, ["user_id"], "ts", "value", "1m")
        .toPandas()
        .sort_values(["user_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    want = (
        rollup_tier(spark.read.parquet(src), ["user_id"], "ts", "value", "1m")
        .toPandas()
        .sort_values(["user_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["n"].values == want["n"].values).all()
    for c in ("min", "max", "first", "last"):
        np.testing.assert_array_equal(got[c].values, want[c].values)
    np.testing.assert_allclose(got["sum"].values, want["sum"].values, rtol=1e-9)


def test_streaming_locf_carry_matches_batch(spark, events, tmp_path):
    """applyInPandasWithState LOCF carry across micro-batches == the batch
    gap_fill_locf on the same rows (files arrive in time order, one file
    per trigger → the state must carry values across batch boundaries)."""
    import numpy as np
    from pyspark.sql import functions as F

    from sfa_spark.rollup import gap_fill_locf, rollup_tier
    from sfa_spark.streaming import streaming_locf_carry

    t1h = rollup_tier(events, ["user_id"], "ts", "value", "1h").select(
        "user_id", "bucket_ts", F.col("last").alias("value")
    )
    cut = t1h.agg(F.expr("percentile(unix_micros(bucket_ts), 0.5)")).collect()[0][0]
    src = str(tmp_path / "src")
    (
        t1h.filter(F.unix_micros("bucket_ts") <= cut)
        .coalesce(1).write.parquet(src + "/batch=0")
    )
    (
        t1h.filter(F.unix_micros("bucket_ts") > cut)
        .coalesce(1).write.parquet(src + "/batch=1")
    )
    stream = (
        spark.readStream.schema("user_id long, bucket_ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/batch=*")
    )
    out = streaming_locf_carry(stream, ["user_id"], tier="1h")
    chk = str(tmp_path / "chk")
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("locf_stream").option("checkpointLocation", chk).start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM locf_stream")
        .toPandas().sort_values(["user_id", "bucket_ts"]).reset_index(drop=True)
    )
    want = (
        gap_fill_locf(rollup_tier(events, ["user_id"], "ts", "value", "1h"),
                      ["user_id"], "1h")
        .select("user_id", "bucket_ts", F.col("last").alias("value"), "locf_filled")
        .toPandas().sort_values(["user_id", "bucket_ts"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["bucket_ts"].values, want["bucket_ts"].values)
    np.testing.assert_array_equal(
        got["value"].to_numpy().view(np.int64),
        want["value"].to_numpy(dtype=np.float64).view(np.int64),
    )
    np.testing.assert_array_equal(got["locf_filled"].values, want["locf_filled"].values)


def test_stream_tier_to_table_matches_batch(spark, events, tmp_path):
    """File-source stream → streaming rollup → foreachBatch snapshot
    commits == one-shot batch rollup, for every bucket the watermark
    finalized; a replayed batch id is skipped (exactly-once fence)."""
    import numpy as np
    from pyspark.sql import functions as F

    from sfa_spark.rollup import rollup_tier
    from sfa_spark.streaming import stream_tier_to_table
    from sfa_spark.tableio import TableIO

    src = str(tmp_path / "src")
    ev = events.limit(4000).withColumn("ts", F.col("ts").cast("timestamp")).cache()
    # two chunks + a far-future sentinel row that pushes the watermark
    # past every real bucket so append mode finalizes them all
    ev.filter(F.col("user_id") % 2 == 0).write.mode("overwrite").parquet(src)
    ev.filter(F.col("user_id") % 2 == 1).write.mode("append").parquet(src)
    far = ev.limit(1).withColumn("ts", F.col("ts") + F.expr("INTERVAL 365 DAYS")).withColumn(
        "user_id", F.lit(-1).cast("long")
    )
    far.write.mode("append").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    root = str(tmp_path / "tier_table")
    q = stream_tier_to_table(
        spark, stream, root, ["user_id"], "ts", "value",
        tier="1m", watermark="0 seconds",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = (
        TableIO(root)
        .read(spark)
        .filter(F.col("user_id") >= 0)
        .select("user_id", "bucket_ts", "n", "sum", "min", "max", "first", "last")
        .toPandas()
        .sort_values(["user_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    # batch oracle: only buckets strictly below the final watermark are
    # guaranteed flushed; the sentinel pushed it past all real buckets
    want = (
        rollup_tier(ev, ["user_id"], "ts", "value", "1m")
        .toPandas()
        .sort_values(["user_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("n", "min", "max", "first", "last"):
        np.testing.assert_array_equal(got[c].values, want[c].values)
    np.testing.assert_allclose(got["sum"].values, want["sum"].values, rtol=1e-12)

    # replay fence: re-invoking the sink with an already-committed batch
    # id (foreachBatch is at-least-once) must not create a new snapshot
    from sfa_spark.streaming import tier_batch_sink

    tio = TableIO(root)
    snap_before = tio.current_snapshot()
    committed = tio.manifest()["metrics"]["stream_batch_id"]
    assert committed >= 0
    poison = rollup_tier(ev, ["user_id"], "ts", "value", "1m").withColumn(
        "sum", F.col("sum") * 1000
    )
    tier_batch_sink(tio, "1m")(poison, committed)  # replay → skipped
    assert tio.current_snapshot() == snap_before
    ev.unpersist()


def test_streaming_locf_late_rows_dropped_not_misbucketed(spark, tmp_path):
    """ADVICE round-2 defect: a late/replayed row at or before the
    carried position must be DROPPED, not scattered into the dense
    range's first bucket. Batch 1 replays an old bucket with a poison
    value; output must contain each bucket exactly once, with the
    original values, and the poison value nowhere."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sfa_spark.streaming import streaming_locf_carry

    h = 3_600_000_000  # one hour in µs
    base = 1_700_000_000_000_000

    def write(rows, name):
        pdf = pd.DataFrame(rows, columns=["user_id", "us", "value"])
        pdf["bucket_ts"] = pd.to_datetime(pdf.pop("us"), unit="us")
        spark.createDataFrame(pdf[["user_id", "bucket_ts", "value"]]).coalesce(
            1
        ).write.parquet(str(tmp_path / "src" / name))

    write([(1, base, 10.0), (1, base + 2 * h, 12.0)], "batch=0")
    # batch 1: a LATE replay of the first bucket (poison) + a new bucket
    write([(1, base, 99.0), (1, base + 4 * h, 14.0)], "batch=1")

    stream = (
        spark.readStream.schema("user_id long, bucket_ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src" / "batch=*"))
    )
    out = streaming_locf_carry(stream, ["user_id"], tier="1h")
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("locf_late")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM locf_late")
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    assert not got["bucket_ts"].duplicated().any()
    assert 99.0 not in set(got["value"])
    # dense 5-bucket range, LOCF-filled: 10,10,12,12,14
    assert got["value"].tolist() == [10.0, 10.0, 12.0, 12.0, 14.0]


def test_concurrent_same_batch_replays_commit_once(spark, events, tmp_path):
    """Two CONCURRENT replays of the same stream batch (both passing the
    cheap pre-check) must produce exactly ONE commit: the fence re-checks
    under the commit lock, the loser's staged data is discarded."""
    import threading

    from sfa_spark.rollup import rollup_tier
    from sfa_spark.streaming import tier_batch_sink
    from sfa_spark.tableio import TableIO

    tio = TableIO(str(tmp_path / "stream_race"))
    t1d = rollup_tier(events, ["user_id"], "ts", "value", "1d").withColumn(
        "dt", F.to_date("bucket_ts")
    )
    sink = tier_batch_sink(tio, "1d")
    errs = []

    def run():
        try:
            sink(t1d, 7)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=run) for _ in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    chain = tio.lineage()
    assert len(chain) == 1, [m["job"] for m in chain]
    assert tio.manifest()["metrics"]["stream_batch_id"] == 7
    # exactly one copy of the rows (a double commit with merge_partitions
    # would double-append)
    assert tio.read(spark).count() == t1d.count()
    # no staged leftovers from the losing replay
    import os

    assert not [n for n in os.listdir(tio.root) if n.startswith(".stage-")]


def test_concurrent_stream_sink_and_batch_refresh(spark, events, tmp_path):
    """The ADVICE r3 multi-writer scenario end-to-end: a streaming batch
    commit and a batch tier refresh interleave on the SAME table — both
    must land (CAS rebase), the stream fence and the refresh fingerprints
    must both survive, and the table must contain both writers' rows."""
    import threading

    from sfa_spark.incremental import refresh_tier
    from sfa_spark.rollup import rollup_tier
    from sfa_spark.streaming import tier_batch_sink
    from sfa_spark.tableio import TableIO

    root = str(tmp_path / "shared_tier")
    tio = TableIO(root)
    df = events.withColumn("dt", F.to_date("ts"))
    days = sorted(str(r["dt"]) for r in df.select("dt").distinct().collect())
    early, late = days[: len(days) // 2], days[len(days) // 2 :]

    t1d = rollup_tier(
        events.filter(F.to_date("ts").isin(late)), ["user_id"], "ts", "value", "1d"
    ).withColumn("dt", F.to_date("bucket_ts"))
    sink = tier_batch_sink(tio, "1d")
    errs, results = [], {}

    def stream_writer():
        try:
            sink(t1d, 3)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def batch_writer():
        try:
            results["refresh"] = refresh_tier(
                spark,
                events.filter(F.to_date("ts").isin(early)),
                root,
                ["user_id"],
                "ts",
                "value",
                tier="1d",
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [
        threading.Thread(target=stream_writer),
        threading.Thread(target=batch_writer),
    ]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    chain = tio.lineage()
    assert len(chain) == 2
    m = tio.manifest()
    # both writers' bookkeeping survived the interleaving
    assert m["metrics"]["stream_batch_id"] == 3
    assert set(m["metrics"]["input_fp_by_day"]) == set(early)
    assert set(m["partitions"]) == set(days)
    # a replay of the stream batch after the refresh commit stays fenced
    snap = tio.current_snapshot()
    sink(t1d.withColumn("sum", F.col("sum") * 9), 3)
    assert tio.current_snapshot() == snap


def test_stream_hll_registers_match_batch_build(spark, events, tmp_path):
    """Streaming HLL maintenance: registers appended per micro-batch and
    re-merged on read are BIT-IDENTICAL to a one-shot batch build, and
    the estimates therefore agree to the last bit."""
    from pyspark.sql import functions as F

    from sfa_spark.operators.sketches import hll_estimate, hll_merge, hll_registers
    from sfa_spark.streaming import stream_hll_to_table
    from sfa_spark.tableio import TableIO

    src = str(tmp_path / "hll_src")
    ev = events.select("user_id", F.col("ts").cast("timestamp").alias("ts")).cache()
    # three files -> three micro-batches with maxFilesPerTrigger=1
    ev.filter(F.col("user_id") % 3 == 0).write.mode("overwrite").parquet(src)
    ev.filter(F.col("user_id") % 3 == 1).write.mode("append").parquet(src)
    ev.filter(F.col("user_id") % 3 == 2).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    root = str(tmp_path / "hll_table")
    q = stream_hll_to_table(
        spark, stream, root, "ts", "user_id",
        checkpoint_dir=str(tmp_path / "hll_ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    tio = TableIO(root)
    assert tio.manifest()["metrics"]["stream_batch_id"] >= 1  # multiple batches
    stored = tio.read(spark).drop("dt")
    merged = hll_merge(stored, ["day"])
    direct = hll_registers(
        ev.withColumn("day", F.date_trunc("day", F.col("ts"))), ["day"], "user_id"
    )
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b and len(a) > 0
    ea = sorted(map(tuple, hll_estimate(merged, ["day"]).collect()))
    eb = sorted(map(tuple, hll_estimate(direct, ["day"]).collect()))
    assert ea == eb


def test_stream_hll_replayed_batch_commits_once(spark, events, tmp_path):
    """The exactly-once fence holds for the sketch sink: a replayed
    batch id neither duplicates register rows nor advances the chain."""
    from pyspark.sql import functions as F

    from sfa_spark.streaming import hll_batch_sink
    from sfa_spark.tableio import TableIO

    root = str(tmp_path / "hll_replay")
    tio = TableIO(root)
    batch = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    ).limit(500)
    sink = hll_batch_sink(tio, "ts", "user_id")
    sink(batch, 0)
    snap_after_first = tio.current_snapshot()
    n_rows = tio.read(spark).count()
    sink(batch, 0)  # replay
    assert tio.current_snapshot() == snap_after_first
    assert tio.read(spark).count() == n_rows
    sink(batch, 1)  # a NEW batch appends
    assert tio.read(spark).count() > n_rows


def test_streaming_session_window_matches_batch_sessions(spark, events, tmp_path):
    """Native session_window streaming sessionization == the batch
    lag-gap derivation: same session count and same per-session event
    counts for every user."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from sfa_spark.streaming import streaming_sessions

    src = str(tmp_path / "sess_src")
    ev = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    ).cache()
    ev.write.mode("overwrite").parquet(src)
    # sentinel far-future row per user pushes the watermark so append
    # mode finalizes every real session
    far = ev.groupBy("user_id").agg(F.max("ts").alias("ts")).select(
        "user_id", (F.col("ts") + F.expr("INTERVAL 365 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
    )
    far.write.mode("append").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        streaming_sessions(stream, ["user_id"], "ts", "30 minutes", "0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM sess_stream")
        .filter(F.col("n_events") > 0)
        .toPandas()
    )
    # drop sentinel-only sessions
    got = got[got["session_start"] < got["session_start"].max() - pd.Timedelta(days=300)]

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull() | (F.col("ts") - prev > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    batch = (
        ev.withColumn("sid", F.sum(new_s).over(w))
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("session_start"))
        .toPandas()
    )
    a = got.groupby("user_id")["n_events"].agg(["count", "sum"]).sort_index()
    b = batch.groupby("user_id")["n_events"].agg(["count", "sum"]).sort_index()
    pd.testing.assert_frame_equal(a, b)
    # per-session event counts match too (sorted multiset per user)
    for uid in a.index:
        ga = sorted(got[got["user_id"] == uid]["n_events"].tolist())
        gb = sorted(batch[batch["user_id"] == uid]["n_events"].tolist())
        assert ga == gb, uid
