"""Chunk encoding: rollup tiers → compressed blocks (binary columns).

The windowed-aggregate + Gorilla-encode stage the north rule names: after
the tier aggregation, each series' buckets are compressed into
(dod_blob, gorilla_blob) binary cells with per-block metrics, inside
``applyInPandas`` — the encode kernels are pure numpy array ops
(sfa_spark.codecs), Arrow carries the binary out.

Skew/scale design: groups are **(key, time-aligned chunk)**, not bare key —
``block_id = floor(unix_micros(bucket_ts) / (bucket_us · max_block))``.
A heavy-hitter url therefore never lands in one giant task: its history
splits into bounded ≤``max_block``-bucket groups that parallelize across
executors. Block boundaries are epoch-aligned, so they are deterministic
under any partitioning AND stable across incremental runs (re-encoding a
time slice is idempotent — the tableio resume path relies on this).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sfa_spark.codecs import (
    dod_decode,
    dod_encode,
    dod_encode_dense,
    gorilla_decode,
    gorilla_encode,
    gorilla_encode_runs_blocks,
)
from sfa_spark.rollup import TIERS


def _key_type(df: DataFrame, col: str) -> str:
    return dict(df.dtypes)[col]


def encode_tier_blocks(
    tier_df: DataFrame,
    key_cols: list[str] | str,
    tier: str = "1m",
    value_col: str = "last",
    ts_col: str = "bucket_ts",
    max_block: int = 4096,
) -> DataFrame:
    """(key…, bucket_ts, value) rows → one compressed block row per
    (key…, epoch-aligned ≤max_block-bucket chunk), with byte metrics."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    _, bucket_s = TIERS[tier]
    chunk_us = int(bucket_s) * 1_000_000 * max_block

    # prune to exactly what the kernel needs BEFORE the shuffle — the tier
    # carries 6 summary columns but only (keys, ts, value) must travel
    df = tier_df.select(
        *key_cols,
        (F.unix_micros(F.col(ts_col)) / F.lit(chunk_us)).cast("long").alias("block_id"),
        F.unix_micros(F.col(ts_col)).alias("_ts_us"),
        F.col(value_col).cast("double").alias("_v"),
    )
    key_schema = ", ".join(
        f"{c} {_key_type(tier_df, c)}" for c in key_cols
    )
    schema = (
        f"{key_schema}, block_id long, start_ts timestamp, n int, "
        "dod_blob binary, gorilla_blob binary, raw_bytes long, enc_bytes long"
    )

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf["_ts_us"].to_numpy(dtype=np.int64)
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        vals = pdf["_v"].to_numpy(dtype=np.float64)[order]
        dod = dod_encode(ts)
        gor = gorilla_encode(vals)
        row = {c: pdf[c].iloc[0] for c in key_cols}
        row.update(
            block_id=pdf["block_id"].iloc[0],
            start_ts=pd.Timestamp(ts[0], unit="us"),
            n=len(ts),
            dod_blob=dod,
            gorilla_blob=gor,
            raw_bytes=16 * len(ts),
            enc_bytes=len(dod) + len(gor),
        )
        return pd.DataFrame([row])

    return df.groupBy(*key_cols, "block_id").applyInPandas(per_block, schema=schema)


def encode_tier_blocks_gapfill(
    tier_df: DataFrame,
    key_cols: list[str] | str,
    tier: str = "1m",
    value_col: str = "last",
    ts_col: str = "bucket_ts",
    max_block: int = 4096,
    partitions: int | None = None,
    pre_partitioned: bool = False,
    validate_pre_partitioned: bool = False,
) -> DataFrame:
    """Fused LOCF gap-fill + block encode — the scale path.

    ``pre_partitioned=True`` skips the repartition exchange entirely:
    the caller asserts every key's rows are wholly contained in single
    input partitions (a tier table stored bucketed/hash-partitioned by
    key, read with whole-file scan partitions — keep files below
    ``spark.sql.files.maxPartitionBytes`` so the reader never splits
    one). The claim is NOT validated at runtime by default: a key split
    across input partitions silently produces duplicate blocks with a
    broken LOCF carry, not an error. Pass
    ``validate_pre_partitioned=True`` (test/first-deploy mode) to spend
    one extra aggregation job asserting each key maps to exactly one
    input partition before encoding.
    On a cluster this removes the stage's network+serde shuffle
    of every observed row — the bucketed-join-style co-location the
    north rule's "hash-bucket-by-url" partitioning exists to enable.
    (On the local sandbox it is a wash: local shuffle is a tmpfs
    memcpy over the same saturated DRAM bus — measured in
    BENCH/BASELINE.md round-4 attempts.) Output is byte-identical to
    the shuffled path — tested.

    ``encode_tier_blocks(gap_fill_locf(t))`` materializes the dense bucket
    spine as DataFrame rows: at 1m resolution a year-long key is ~526k
    rows, and every one of them pays the spine join, the LOCF window sort,
    and the Arrow transfer into the encode UDF. This operator produces
    BYTE-IDENTICAL blocks while keeping only *observed* buckets (plus one
    carry-in row per block) in the DataFrame plane:

      1. per-key bounds + per-block last-observed value — aggregates over
         observed rows only (map-side combined);
      2. a per-key BLOCK spine (|buckets|/max_block rows — thousands, not
         millions) gets the carry-in via a tiny LOCF window + lag;
      3. the encode kernel synthesizes the dense bucket range with
         ``np.arange``, scatters observed values, forward-fills in numpy,
         and Gorilla/DoD-encodes — dense data exists only inside the
         vectorized kernel and the compressed output.

    Verified equal to the unfused path in tests (same blobs, byte-for-byte).

    Skew ceiling: partitioning is by KEY (a key's rows must be
    contiguous for the streaming LOCF carry), so one key holding p% of
    all observed rows bounds the stage at p% · total / one core —
    measured end-to-end in jobs/skew_bench.py (BENCH/BASELINE.md): at a
    30%-hot key the epoch-chunked ``encode_tier_blocks`` grouping wins
    ~2×. This fused path is the default for realistic Zipf-ish skew
    (max key share a few %, smoothed by the ×2-wave fan-out); switch to
    the chunked grouping when a single key dominates.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    _, bucket_s = TIERS[tier]
    bucket_us = int(bucket_s) * 1_000_000
    chunk_us = bucket_us * max_block
    spark = tier_df.sparkSession

    # ONE pass over the observed buckets: shuffle by key (explicit N — AQE
    # upstream may have coalesced to fewer partitions than cores), sort
    # each partition by (key, ts), and run the kernel per partition with
    # mapInPandas. All of a key's history is then contiguous in-order, so
    # LOCF carry between blocks is plain sequential state inside the
    # kernel — no dense spine rows, no window, no self-join, and IPC cost
    # is per PARTITION (applyInPandas would pay per BLOCK).
    obs = tier_df.select(
        *key_cols,
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(value_col).cast("double").alias("_v"),
    )
    # Partition-count policy. Ceiling: 2 waves of tasks per core — with
    # one partition per core the most key-skewed partition sets the
    # stage wall time; smaller partitions let the scheduler smooth the
    # variance. Profiled on the 6B-point scaling input at 8 and 32
    # pinned cores: ×2 beats ×4/×8 (per-partition python+Arrow setup
    # grows with partition count — jobs/encode_profile.py sweep,
    # BENCH/BASELINE.md). r6: the ceiling is now scaled DOWN for small
    # inputs (guide §1.2 "per-task work"): every kernel task costs a
    # python round-trip whether it gets 1 MB or nothing, so tiny tiers
    # should not fan out to 2×cores tasks — size to ~1 MB of pruned
    # input per task from Catalyst's size estimate (floor cores/4;
    # unknown stats estimate to Long.Max and keep the 2× ceiling).
    # Measured at sf1.0 (28 MB pruned): parts=32 0.80s vs 64 0.90s; on
    # the 1.7 MB pipeline tier: parts=8 0.42s vs 64 0.75s.
    p = spark.sparkContext.defaultParallelism
    if partitions:
        n_part = partitions
    else:
        try:
            est = int(obs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:
            est = 1 << 62
        n_part = min(2 * p, max(p // 4, 1, -(-est // (1 << 20))))
    if not pre_partitioned:
        obs = obs.repartition(n_part, *key_cols)
    elif validate_pre_partitioned:
        split = (
            obs.select(*key_cols, F.spark_partition_id().alias("_pid"))
            .groupBy(*key_cols)
            .agg(F.countDistinct("_pid").alias("_np"))
            .filter(F.col("_np") > 1)
            .limit(5)
            .collect()
        )
        if split:
            bad = ", ".join(str(tuple(r[c] for c in key_cols)) for r in split)
            raise ValueError(
                "pre_partitioned=True but these keys span multiple input "
                f"partitions (first 5): {bad} — encoding would silently "
                "produce duplicate blocks with broken LOCF carry"
            )
    obs = obs.sortWithinPartitions(*key_cols, "_us")

    key_schema = ", ".join(f"{c} {_key_type(tier_df, c)}" for c in key_cols)
    schema = (
        f"{key_schema}, block_id long, start_ts timestamp, n int, "
        "dod_blob binary, gorilla_blob binary, raw_bytes long, enc_bytes long"
    )

    def encode_partition(batches):
        # STREAMING kernel: Arrow batches are processed as they arrive —
        # the only rows held across batches are the current key's
        # not-yet-complete trailing block (≤max_block observed rows) plus
        # its LOCF carry value. Memory is O(arrow_batch + max_block), NOT
        # O(partition): a skewed key's multi-year history never sits in
        # RAM at once. Correctness relies on the repartition+sort above —
        # a key's rows are contiguous and time-ordered across batches.

        # columnar accumulators — per-block python overhead kept to
        # appends; the value runs are only ENCODED at flush time, all
        # blocks in one vectorized pass (gorilla_encode_runs_blocks —
        # per-block numpy dispatch was ~60% of kernel CPU)
        acc: dict[str, list] = {c: [] for c in key_cols}
        acc.update(block_id=[], start_us=[], n=[], dod=[], runs_v=[], runs_l=[])

        def flush():
            bounds = np.zeros(len(acc["runs_v"]) + 1, dtype=np.int64)
            np.cumsum([a.size for a in acc["runs_v"]], out=bounds[1:])
            gor = gorilla_encode_runs_blocks(
                np.concatenate(acc["runs_v"]),
                np.concatenate(acc["runs_l"]),
                bounds,
            )
            out = pd.DataFrame(
                {
                    **{c: acc[c] for c in key_cols},
                    "block_id": acc["block_id"],
                    "start_ts": pd.to_datetime(
                        np.asarray(acc["start_us"], dtype=np.int64), unit="us"
                    ),
                    "n": np.asarray(acc["n"], dtype=np.int32),
                    "dod_blob": acc["dod"],
                    "gorilla_blob": gor,
                }
            )
            out["raw_bytes"] = out["n"].astype(np.int64) * 16
            out["enc_bytes"] = [len(a) + len(b) for a, b in zip(acc["dod"], gor)]
            for v in acc.values():
                v.clear()
            return out

        # per-key streaming state
        cur_key: tuple | None = None  # key tuple of the pending rows
        pend_us = np.empty(0, dtype=np.int64)
        pend_v = np.empty(0, dtype=np.float64)
        started = False  # first block of cur_key already emitted?
        next_block = 0  # next block_id to emit for cur_key
        carry_v = np.nan  # LOCF value entering next_block

        def emit_blocks(k_us, k_v, kvals, b0, b1, first_lo, hi):
            """Encode blocks b0..b1 (inclusive) of one key. ``first_lo``
            clamps the first-ever block's start; ``hi`` clamps the final
            block's end (None → natural block end)."""
            nonlocal carry_v
            for block_id in range(b0, b1 + 1):
                start = block_id * chunk_us
                if first_lo is not None and block_id == b0:
                    start = max(start, first_lo)
                end = block_id * chunk_us + chunk_us - bucket_us
                if hi is not None:
                    end = min(end, hi)
                n_ts = (end - start) // bucket_us + 1
                j0, j1 = np.searchsorted(k_us, [start, end + 1])
                obs_v = k_v[j0:j1]
                valid = ~np.isnan(obs_v)
                if valid.any():
                    # LOCF output is runs: carry until the first
                    # observation, then each observation repeated to the
                    # next — encode straight from that structure, O(obs)
                    # per block, never materializing the dense values.
                    # NaN observations carry no value (LOCF skips them),
                    # matching the dense scatter+forward-fill exactly.
                    obs_v = obs_v[valid]
                    idx = (k_us[j0:j1][valid] - start) // bucket_us
                    run_vals = np.empty(obs_v.size + 1, dtype=np.float64)
                    run_vals[0] = carry_v
                    run_vals[1:] = obs_v
                    run_lens = np.empty(obs_v.size + 1, dtype=np.int64)
                    run_lens[0] = idx[0]
                    run_lens[1:-1] = np.diff(idx)
                    run_lens[-1] = n_ts - idx[-1]
                    carry_v = float(obs_v[-1])
                else:  # pure-gap block: one carry run
                    run_vals = np.array([carry_v])
                    run_lens = np.array([n_ts], dtype=np.int64)
                for c, kv in zip(key_cols, kvals):
                    acc[c].append(kv)
                acc["block_id"].append(block_id)
                acc["start_us"].append(start)
                acc["n"].append(n_ts)
                # gap-filled timestamps are a dense arithmetic sequence —
                # their DoD stream is constructible without the generic
                # delta/bit-scatter pipeline (byte-identical, tested)
                acc["dod"].append(dod_encode_dense(start, bucket_us, n_ts))
                acc["runs_v"].append(run_vals)
                acc["runs_l"].append(run_lens)

        def finish_key():
            """Emit all remaining blocks of cur_key (end clamped at its
            last observation) and reset per-key state."""
            nonlocal pend_us, pend_v, started, next_block, carry_v
            if cur_key is not None and pend_us.size:
                hi = int(pend_us[-1])
                b0 = next_block if started else int(pend_us[0]) // chunk_us
                emit_blocks(
                    pend_us, pend_v, cur_key, b0, hi // chunk_us,
                    None if started else int(pend_us[0]), hi,
                )
            pend_us = np.empty(0, dtype=np.int64)
            pend_v = np.empty(0, dtype=np.float64)
            started = False
            next_block = 0
            carry_v = np.nan

        def advance_key():
            """Emit every block of cur_key strictly before the block that
            holds the last pending row (those can still grow); retain only
            the trailing block's rows."""
            nonlocal pend_us, pend_v, started, next_block
            last_block = int(pend_us[-1]) // chunk_us
            b0 = next_block if started else int(pend_us[0]) // chunk_us
            if last_block > b0 or (started and last_block >= next_block):
                if last_block - 1 >= b0:
                    emit_blocks(
                        pend_us, pend_v, cur_key, b0, last_block - 1,
                        None if started else int(pend_us[0]), None,
                    )
                    started = True
                cut = np.searchsorted(pend_us, last_block * chunk_us)
                pend_us, pend_v = pend_us[cut:], pend_v[cut:]
                next_block = last_block

        for pdf in batches:
            if pdf.empty:
                continue
            us_all = pdf["_us"].to_numpy(dtype=np.int64)
            v_all = pdf["_v"].to_numpy(dtype=np.float64)
            key_arrays = [pdf[c].to_numpy() for c in key_cols]
            change = np.zeros(len(pdf), dtype=bool)
            change[0] = True
            for a in key_arrays:
                change[1:] |= a[1:] != a[:-1]
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(pdf))
            for s, e in zip(starts, ends):
                kvals = tuple(a[s] for a in key_arrays)
                if kvals != cur_key:
                    finish_key()
                    cur_key = kvals
                    pend_us, pend_v = us_all[s:e].copy(), v_all[s:e].copy()
                else:
                    pend_us = np.concatenate([pend_us, us_all[s:e]])
                    pend_v = np.concatenate([pend_v, v_all[s:e]])
                advance_key()
                if len(acc["n"]) >= 4096:
                    yield flush()
        finish_key()
        if acc["n"]:
            yield flush()

    return obs.mapInPandas(encode_partition, schema=schema)


def decode_blocks(blocks_df: DataFrame, key_cols: list[str] | str) -> DataFrame:
    """Inverse of :func:`encode_tier_blocks` — the read path: blocks back
    to (key…, bucket_ts, value) rows."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    key_schema = ", ".join(f"{c} {_key_type(blocks_df, c)}" for c in key_cols)

    def per_batch(batches):
        for pdf in batches:
            # one decode call per BLOCK (a block is already a 4k-point
            # batch), then a single vectorized repeat/concat per Arrow
            # batch — no per-row pandas iteration
            ts_parts = [dod_decode(bytes(b)) for b in pdf["dod_blob"]]
            v_parts = [gorilla_decode(bytes(b)) for b in pdf["gorilla_blob"]]
            if not ts_parts:
                continue
            lens = np.array([t.size for t in ts_parts])
            out = pd.DataFrame(
                {
                    "bucket_ts": pd.to_datetime(np.concatenate(ts_parts), unit="us"),
                    "value": np.concatenate(v_parts),
                }
            )
            for c in key_cols:
                out[c] = np.repeat(pdf[c].to_numpy(), lens)
            yield out[[*key_cols, "bucket_ts", "value"]]

    return blocks_df.mapInPandas(
        per_batch, schema=f"{key_schema}, bucket_ts timestamp, value double"
    )
