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
        # not-yet-complete trailing rows plus its LOCF carry value.
        # Memory is O(arrow_batch + pending key window), NOT
        # O(partition): a skewed key's multi-year history never sits in
        # RAM at once (advance_key drains its completed blocks whenever
        # the pending buffer exceeds 4·max_block rows). Correctness
        # relies on the repartition+sort above — a key's rows are
        # contiguous and time-ordered across batches.
        #
        # r6: keys fully contained in one Arrow batch — the common case
        # (short keys, many of them) — are emitted by ONE vectorized
        # pass over the whole batch (``emit_keys_vec``): block spine,
        # LOCF carries, run values/lengths and dense-DoD blobs are all
        # computed with array ops instead of a per-key + per-block
        # python loop (the loop was ~30 µs/block × 172k blocks ≈ 60% of
        # kernel CPU at sf1.0 in the UDF profiler). The scalar path
        # below survives only for keys that span batch boundaries.
        # Output blocks are byte-identical either way (tested).

        # columnar accumulators: lists of per-chunk numpy arrays; runs
        # are (vals, lens, runs_per_block) triples concatenated at flush
        # so the whole flush Gorilla-encodes in one vectorized call
        acc: dict[str, list] = {c: [] for c in key_cols}
        acc.update(block_id=[], start_us=[], n=[], runs=[])
        acc_dod: list[bytes] = []
        n_acc_blocks = 0
        pads: dict[int, bytes] = {}

        def flush():
            nonlocal n_acc_blocks
            rpb = np.concatenate([r[2] for r in acc["runs"]])
            bounds = np.zeros(rpb.size + 1, dtype=np.int64)
            np.cumsum(rpb, out=bounds[1:])
            gor = gorilla_encode_runs_blocks(
                np.concatenate([r[0] for r in acc["runs"]]),
                np.concatenate([r[1] for r in acc["runs"]]),
                bounds,
            )
            n_arr = np.concatenate(acc["n"]).astype(np.int32)
            out = pd.DataFrame(
                {
                    **{c: np.concatenate(acc[c]) for c in key_cols},
                    "block_id": np.concatenate(acc["block_id"]),
                    "start_ts": pd.to_datetime(
                        np.concatenate(acc["start_us"]), unit="us"
                    ),
                    "n": n_arr,
                    "dod_blob": list(acc_dod),
                    "gorilla_blob": gor,
                }
            )
            out["raw_bytes"] = out["n"].astype(np.int64) * 16
            out["enc_bytes"] = [len(a) + len(b) for a, b in zip(acc_dod, gor)]
            for v in acc.values():
                v.clear()
            acc_dod.clear()
            n_acc_blocks = 0
            return out

        def dod_dense_batch(n_ts, start):
            """Dense-DoD blobs for many blocks at once — byte-identical
            to ``dod_encode_dense(start, bucket_us, n)`` per block: the
            24-byte big-endian (n, t0, step) header plus (n-2+7)//8 zero
            bytes (n==1 blobs are the first 16 header bytes alone)."""
            B = n_ts.size
            hdr = np.empty((B, 3), dtype=np.int64)
            hdr[:, 0] = n_ts
            hdr[:, 1] = start
            hdr[:, 2] = bucket_us
            mv = memoryview(hdr.astype(">u8").tobytes())
            pad_len = (n_ts - 2 + 7) >> 3
            out = []
            for j in range(B):
                if n_ts[j] >= 2:
                    L = int(pad_len[j])
                    p = pads.get(L)
                    if p is None:
                        p = pads[L] = bytes(L)
                    out.append(bytes(mv[24 * j : 24 * j + 24]) + p)
                else:  # n == 1: (n, t0) header only
                    out.append(bytes(mv[24 * j : 24 * j + 16]))
            return out

        def emit_keys_vec(us_all, v_all, key_arrays, kstarts, kends):
            """Vectorized emit of ALL blocks of complete, fresh keys
            (row slices ``kstarts[i]:kends[i]``, none previously
            started). Replicates emit_blocks per key exactly: first
            block start-clamped to the first observation, last block
            end-clamped to the last, NaN observations carry no value."""
            nonlocal n_acc_blocks
            nk = kstarts.size
            # row arrays restricted to the bulk span (keys are
            # contiguous, so one slice covers them all)
            lo, hi = int(kstarts[0]), int(kends[-1])
            us = us_all[lo:hi]
            v = v_all[lo:hi]
            ks = kstarts - lo
            ke = kends - lo
            kfirst = us[ks]
            klast = us[ke - 1]
            b0 = kfirst // chunk_us
            nb = (klast // chunk_us - b0 + 1).astype(np.int64)
            B = int(nb.sum())
            cumnb = np.zeros(nk + 1, dtype=np.int64)
            np.cumsum(nb, out=cumnb[1:])
            blk_key = np.repeat(np.arange(nk), nb)  # key ordinal per block
            within = np.arange(B, dtype=np.int64) - cumnb[blk_key]
            block_id = b0[blk_key] + within
            natural = block_id * chunk_us
            start = np.where(within == 0, kfirst[blk_key], natural)
            end = np.where(
                within == nb[blk_key] - 1,
                klast[blk_key],
                natural + chunk_us - bucket_us,
            )
            n_ts = (end - start) // bucket_us + 1

            # rows → global block ordinal
            rk = np.repeat(np.arange(nk), ke - ks)
            gblk = cumnb[rk] + (us // chunk_us - b0[rk])
            valid = ~np.isnan(v)
            vblk = gblk[valid]
            nvalid = np.bincount(vblk, minlength=B)
            vidx = (us[valid] - start[vblk]) // bucket_us
            vval = v[valid]
            cnv = np.zeros(B + 1, dtype=np.int64)
            np.cumsum(nvalid, out=cnv[1:])
            word = np.arange(vblk.size, dtype=np.int64) - cnv[vblk]

            # carry entering each block = last valid value of the
            # nearest prior block WITH a valid observation, same key
            lastv = np.empty(B, dtype=np.float64)
            sel_last = word == nvalid[vblk] - 1  # unique per non-empty block
            lastv[vblk[sel_last]] = vval[sel_last]
            hasv = nvalid > 0
            run = np.maximum.accumulate(
                np.where(hasv, np.arange(B, dtype=np.int64), -1)
            )
            prev_run = np.empty(B, dtype=np.int64)
            prev_run[0] = -1
            prev_run[1:] = run[:-1]
            ok = prev_run >= cumnb[blk_key]  # prior block of the SAME key
            carry = np.where(ok, lastv[np.maximum(prev_run, 0)], np.nan)

            # run layout per block: [carry] + one run per valid row
            rpb = 1 + nvalid
            roff = np.zeros(B + 1, dtype=np.int64)
            np.cumsum(rpb, out=roff[1:])
            R = int(roff[-1])
            run_vals = np.empty(R, dtype=np.float64)
            run_lens = np.empty(R, dtype=np.int64)
            run_vals[roff[:-1]] = carry
            vpos = roff[vblk] + 1 + word
            run_vals[vpos] = vval
            # carry-run length: first valid row's bucket index, or the
            # whole block when it has no valid observation
            carry_len = n_ts.copy()
            sel_first = word == 0
            carry_len[vblk[sel_first]] = vidx[sel_first]
            run_lens[roff[:-1]] = carry_len
            # valid-row run lengths: to the next valid row in the same
            # block, or to the block end for its last valid row
            if vblk.size:
                nxt = np.empty(vblk.size, dtype=np.int64)
                nxt[:-1] = vidx[1:]
                nxt[-1] = 0  # masked below
                same = np.empty(vblk.size, dtype=bool)
                same[:-1] = vblk[1:] == vblk[:-1]
                same[-1] = False
                run_lens[vpos] = np.where(same, nxt - vidx, n_ts[vblk] - vidx)

            for c, arr in zip(key_cols, key_arrays):
                acc[c].append(np.repeat(arr[kstarts], nb))
            acc["block_id"].append(block_id)
            acc["start_us"].append(start)
            acc["n"].append(n_ts)
            acc_dod.extend(dod_dense_batch(n_ts, start))
            acc["runs"].append((run_vals, run_lens, rpb))
            n_acc_blocks += B

        # per-key streaming state (scalar path: batch-spanning keys)
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
            nonlocal carry_v, n_acc_blocks
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
                    acc[c].append(np.asarray([kv]))
                acc["block_id"].append(np.asarray([block_id], dtype=np.int64))
                acc["start_us"].append(np.asarray([start], dtype=np.int64))
                acc["n"].append(np.asarray([n_ts], dtype=np.int64))
                # gap-filled timestamps are a dense arithmetic sequence —
                # their DoD stream is constructible without the generic
                # delta/bit-scatter pipeline (byte-identical, tested)
                acc_dod.append(dod_encode_dense(start, bucket_us, n_ts))
                acc["runs"].append(
                    (run_vals, run_lens, np.asarray([run_vals.size]))
                )
                n_acc_blocks += 1

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

            seg_lo = 0
            first_key = tuple(a[starts[0]] for a in key_arrays)
            if cur_key is not None and first_key == cur_key:
                # continuation of the pending key: absorb its rows; if
                # more segments follow, the key is complete — finish it
                # through the scalar path (it may be mid-stream)
                s, e = int(starts[0]), int(ends[0])
                pend_us = np.concatenate([pend_us, us_all[s:e]])
                pend_v = np.concatenate([pend_v, v_all[s:e]])
                seg_lo = 1
                if starts.size > 1:
                    finish_key()
                    cur_key = None
            elif cur_key is not None:
                finish_key()
                cur_key = None

            # all segments except the batch's last are complete fresh
            # keys — one vectorized emit for the lot
            if starts.size - seg_lo >= 2:
                emit_keys_vec(
                    us_all, v_all, key_arrays,
                    starts[seg_lo:-1], ends[seg_lo:-1],
                )
            # the last segment may continue into the next batch: pend it
            if starts.size > seg_lo:
                s, e = int(starts[-1]), int(ends[-1])
                cur_key = tuple(a[s] for a in key_arrays)
                pend_us = us_all[s:e].copy()
                pend_v = v_all[s:e].copy()
            # skew guard: a huge key never accumulates unbounded pending
            # rows — drain its completed blocks and keep the tail
            if pend_us.size > 4 * max_block:
                advance_key()
            if n_acc_blocks >= 4096:
                yield flush()
        finish_key()
        if n_acc_blocks:
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
