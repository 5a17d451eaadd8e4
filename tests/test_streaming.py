"""Structured Streaming 1m rollup == batch rollup on the same files."""

from __future__ import annotations

import numpy as np
import pytest

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
