"""Tier → compressed blocks → decode round trip on real testdata."""

from __future__ import annotations

import numpy as np
import pytest

from sfa_spark.encode import decode_blocks, encode_tier_blocks
from sfa_spark.rollup import gap_fill_locf, rollup_tier


@pytest.fixture(scope="module")
def tier(events):
    t = rollup_tier(events, ["user_id"], "ts", "value", "1h")
    return gap_fill_locf(t, ["user_id"], "1h").cache()


def test_block_roundtrip_exact(spark, tier):
    blocks = encode_tier_blocks(tier, "user_id", tier="1h", value_col="last", max_block=64)
    decoded = decode_blocks(blocks, "user_id").toPandas()
    want = tier.select("user_id", "bucket_ts", "last").toPandas()
    d = decoded.sort_values(["user_id", "bucket_ts"]).reset_index(drop=True)
    w = want.sort_values(["user_id", "bucket_ts"]).reset_index(drop=True)
    assert len(d) == len(w)
    np.testing.assert_array_equal(d["bucket_ts"].values, w["bucket_ts"].values)
    np.testing.assert_array_equal(
        d["value"].to_numpy().view(np.uint64),
        w["last"].to_numpy(dtype=np.float64).view(np.uint64),
    )


def test_blocks_compress_gapfilled_tier(spark, tier):
    """Gap-filled tiers have regular spacing + repeated LOCF values — the
    codecs should crush them (dod ≈ 1 bit/bucket, gorilla ≈ 1 bit/repeat)."""
    blocks = encode_tier_blocks(tier, "user_id", tier="1h", value_col="last").toPandas()
    ratio = blocks["enc_bytes"].sum() / blocks["raw_bytes"].sum()
    assert ratio < 0.45, f"compression ratio {ratio:.2f} too weak"
    assert (blocks["n"] > 0).all()


def test_block_boundaries_deterministic(spark, tier):
    a = encode_tier_blocks(tier, "user_id", tier="1h", max_block=32).toPandas()
    b = encode_tier_blocks(tier.repartition(7), "user_id", tier="1h", max_block=32).toPandas()
    a = a.sort_values(["user_id", "block_id"]).reset_index(drop=True)
    b = b.sort_values(["user_id", "block_id"]).reset_index(drop=True)
    assert (a["enc_bytes"].values == b["enc_bytes"].values).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["gorilla_blob"], b["gorilla_blob"]))


def test_fused_gapfill_encode_byte_identical(spark, events):
    """encode_tier_blocks_gapfill(raw tier) must produce byte-identical
    blocks to encode_tier_blocks(gap_fill_locf(raw tier))."""
    from sfa_spark.encode import encode_tier_blocks_gapfill

    t1h = rollup_tier(events, ["user_id"], "ts", "value", "1h")
    unfused = encode_tier_blocks(
        gap_fill_locf(t1h, ["user_id"], "1h"), "user_id", tier="1h", max_block=128
    ).toPandas().sort_values(["user_id", "block_id"]).reset_index(drop=True)
    fused = encode_tier_blocks_gapfill(
        t1h, "user_id", tier="1h", max_block=128
    ).toPandas().sort_values(["user_id", "block_id"]).reset_index(drop=True)
    assert len(fused) == len(unfused)
    assert (fused["block_id"].values == unfused["block_id"].values).all()
    assert (fused["n"].values == unfused["n"].values).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(fused["dod_blob"], unfused["dod_blob"]))
    assert all(bytes(a) == bytes(b) for a, b in zip(fused["gorilla_blob"], unfused["gorilla_blob"]))


def test_fused_encode_streams_across_arrow_batches(spark, events):
    """The streaming encoder keeps only the trailing block across Arrow
    batches; with a tiny maxRecordsPerBatch every key spans many batches
    and the output must still be byte-identical to the unfused path."""
    from sfa_spark.encode import encode_tier_blocks_gapfill

    t1h = rollup_tier(events, ["user_id"], "ts", "value", "1h")
    unfused = encode_tier_blocks(
        gap_fill_locf(t1h, ["user_id"], "1h"), "user_id", tier="1h", max_block=16
    ).toPandas().sort_values(["user_id", "block_id"]).reset_index(drop=True)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        fused = encode_tier_blocks_gapfill(
            t1h, "user_id", tier="1h", max_block=16
        ).toPandas().sort_values(["user_id", "block_id"]).reset_index(drop=True)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(fused) == len(unfused)
    assert (fused["block_id"].values == unfused["block_id"].values).all()
    assert (fused["n"].values == unfused["n"].values).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(fused["dod_blob"], unfused["dod_blob"]))
    assert all(bytes(a) == bytes(b) for a, b in zip(fused["gorilla_blob"], unfused["gorilla_blob"]))


def test_pre_partitioned_encode_shuffle_free_and_byte_identical(spark, events, tmp_path):
    """pre_partitioned=True: encoding a tier table STORED hash-partitioned
    by key skips the repartition exchange (no Exchange in the plan — on a
    cluster that is the whole shuffle of every observed row) and produces
    byte-identical blocks. Scan confs pin whole-file partitions so a
    key's rows can never be split across scan partitions."""
    from pyspark.sql import functions as F

    from sfa_spark.encode import encode_tier_blocks_gapfill
    from sfa_spark.rollup import rollup_tier

    tier = rollup_tier(events, ["user_id"], "ts", "value", "1m")
    path = str(tmp_path / "t1m_bucketed.parquet")
    tier.repartition(8, "user_id").write.parquet(path)

    conf = spark.conf
    old_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    old_oc = conf.get("spark.sql.files.openCostInBytes")
    try:
        # one whole file per scan partition (files are far below 4MB)
        conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        conf.set("spark.sql.files.openCostInBytes", "0")
        stored = spark.read.parquet(path)

        pre = encode_tier_blocks_gapfill(
            stored, ["user_id"], tier="1m", pre_partitioned=True
        )
        plan = pre._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]

        cols = ["user_id", "block_id"]
        a = (
            pre.toPandas().sort_values(cols).reset_index(drop=True)
        )
        b = (
            encode_tier_blocks_gapfill(stored, ["user_id"], tier="1m")
            .toPandas()
            .sort_values(cols)
            .reset_index(drop=True)
        )
    finally:
        conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        conf.set("spark.sql.files.openCostInBytes", old_oc)
    assert len(a) == len(b) > 0
    assert (a["block_id"].values == b["block_id"].values).all()
    assert (a["n"].values == b["n"].values).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["dod_blob"], b["dod_blob"]))
    assert all(
        bytes(x) == bytes(y) for x, y in zip(a["gorilla_blob"], b["gorilla_blob"])
    )


def test_pre_partitioned_validation_catches_split_keys(spark, events):
    """ADVICE r4: pre_partitioned=True with a key actually split across
    input partitions silently corrupts blocks (duplicate blocks, broken
    LOCF carry). validate_pre_partitioned=True must catch the bad claim
    with a clear error instead."""
    import pytest as _pytest

    from sfa_spark.encode import encode_tier_blocks_gapfill
    from sfa_spark.rollup import rollup_tier

    tier = rollup_tier(events, ["user_id"], "ts", "value", "1m")
    # round-robin repartition: every key is split across partitions
    split = tier.repartition(8)
    with _pytest.raises(ValueError, match="span multiple input partitions"):
        encode_tier_blocks_gapfill(
            split,
            ["user_id"],
            tier="1m",
            pre_partitioned=True,
            validate_pre_partitioned=True,
        ).count()

    # a genuinely co-located input passes validation and encodes
    ok = tier.repartition(4, "user_id")
    out = encode_tier_blocks_gapfill(
        ok, ["user_id"], tier="1m", pre_partitioned=True, validate_pre_partitioned=True
    )
    assert out.count() > 0
