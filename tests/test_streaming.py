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
