"""TableIO snapshot/lineage/resume semantics incl. kill-and-resume shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfa_spark.tableio import TableIO


@pytest.fixture()
def tio(tmp_path):
    return TableIO(str(tmp_path / "tiers"))


def test_snapshot_write_read_roundtrip(spark, tio, events):
    df = events.withColumn("dt", F.to_date("ts")).limit(500)
    snap = tio.write_snapshot(df, "dt", job="t1")
    assert snap == "snap-000001"
    back = tio.read(spark)
    assert back.count() == 500
    assert "dt" in back.columns


def test_incremental_refresh_carries_forward(spark, tio, events):
    df = events.withColumn("dt", F.to_date("ts"))
    days = sorted(r["dt"] for r in df.select("dt").distinct().collect())
    first, rest = days[:2], days[2:4]

    tio.write_snapshot(df.filter(F.col("dt").isin(first)), "dt", job="initial")
    n1 = tio.read(spark).count()

    # resume diff: only the missing days are planned
    planned = [str(d) for d in first + rest]
    missing = tio.missing_partitions(planned)
    assert missing == [str(d) for d in rest]

    tio.write_snapshot(df.filter(F.col("dt").isin(rest)), "dt", job="incr")
    m = tio.manifest()
    assert set(m["partitions"]) == {str(d) for d in first + rest}
    n2 = tio.read(spark).count()
    assert n2 > n1
    want = df.filter(F.col("dt").isin(first + rest)).count()
    assert n2 == want


def test_lineage_chain(spark, tio, events):
    df = events.withColumn("dt", F.to_date("ts")).limit(100)
    tio.write_snapshot(df, "dt", job="a", metrics={"rows": 100})
    tio.write_snapshot(df, "dt", job="b")
    chain = tio.lineage()
    assert [m["job"] for m in chain] == ["b", "a"]
    assert chain[1]["metrics"] == {"rows": 100}
    assert chain[0]["parent"] == chain[1]["snapshot_id"]


def test_resume_after_partial_write(spark, tio, events):
    """Kill-and-resume: a snapshot is only visible after the _current
    pointer flips, so a crashed write leaves the previous snapshot live."""
    df = events.withColumn("dt", F.to_date("ts")).limit(200)
    snap1 = tio.write_snapshot(df, "dt", job="ok")
    # simulate a crash: data written, manifest written, pointer NOT flipped
    import os

    snap2_dir = f"{tio.root}/snap-000002"
    os.makedirs(snap2_dir, exist_ok=True)  # partial garbage
    assert tio.current_snapshot() == snap1
    assert tio.read(spark).count() == 200  # old snapshot intact
