"""Gorilla XOR value compression + delta-of-delta timestamp encoding.

Numpy bitstream kernels (north star: "delta-of-delta timestamp encoding and
Gorilla XOR value compression implemented inside vectorized pandas/Arrow
UDFs"). Algorithms follow the public Gorilla paper (Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015).

Design decision (documented, engine-internal format): the paper's value
encoder carries a leading/trailing-zero *window* across values, a
sequential data dependency that cannot be expressed as numpy array ops.
This engine uses the stateless variant — every non-zero XOR record is
self-describing ('1' + 6-bit leading-zeros + 6-bit meaningful-length-1 +
meaningful bits) — which encodes with pure array arithmetic (no per-row
Python in the encode hot path) at a cost of a few control bits per point.
Timestamps use the paper's delta-of-delta buckets with the final bucket
widened to 64 bits (microsecond epochs overflow 32 bits).

Encode = vectorized bit-scatter (cumsum offsets + packbits).
Decode = sequential parse over one big Python int (read path / round-trip
verification; encode is the throughput-critical stage of the rollup job).

Stream layouts (big-endian bit order, n as u64 prefix):
  values:      [n:64][v0:64][record...]   record = '0' | '1' lz:6 ml-1:6 bits
  timestamps:  [n:64][t0:64][d0:64][record...]
               record = '0' | '10'+7b | '110'+9b | '1110'+12b | '1111'+64b
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_ONE = _U64(1)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 → 0)."""
    v = x.astype(np.uint64, copy=True)
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        t = v >> _U64(s)
        m = t != 0
        bl += s * m
        v = np.where(m, t, v)
    return bl + (v != 0)


def _ctz_u64(x: np.ndarray) -> np.ndarray:
    """Trailing zeros for uint64 (x==0 → 64)."""
    low = x & (~x + _ONE)
    out = _bit_length_u64(low) - 1
    out[x == 0] = 64
    return out


def _pack_segments(values: np.ndarray, lengths: np.ndarray) -> bytes:
    """Concatenate variable-width big-endian bit segments → bytes.

    values: uint64 right-aligned payloads; lengths: bit widths (0 allowed,
    dropped). Vectorized per SEGMENT (not per bit): each ≤64-bit segment
    lands in at most two 64-bit output words, OR-scattered with
    ``np.bitwise_or.at`` — ~60× less work than a per-bit scatter.
    """
    keep = lengths > 0
    values, lengths = values[keep], lengths[keep].astype(np.int64)
    total = int(lengths.sum())
    if total == 0:
        return b""
    # mask payloads to their width (defensive: callers pass clean values)
    starts = np.cumsum(lengths) - lengths
    word_idx = starts >> 6
    inword = starts & 63
    left = 64 - inword - lengths  # shift that right-aligns … in word 0

    n_words = (total + 63) >> 6
    words = np.zeros(n_words, dtype=np.uint64)
    one_word = left >= 0
    if one_word.any():
        np.bitwise_or.at(
            words,
            word_idx[one_word],
            values[one_word] << left[one_word].astype(np.uint64),
        )
    two = ~one_word
    if two.any():
        over = (-left[two]).astype(np.uint64)  # 1..63 bits spill to next word
        np.bitwise_or.at(words, word_idx[two], values[two] >> over)
        np.bitwise_or.at(
            words, word_idx[two] + 1, values[two] << (np.uint64(64) - over)
        )
    data = words.byteswap().tobytes()  # big-endian bit order
    return data[: (total + 7) >> 3]


def _pack_segments_at(
    values: np.ndarray, lengths: np.ndarray, starts: np.ndarray, total_bits: int
) -> bytes:
    """Like :func:`_pack_segments` but with explicit bit offsets — segments
    need not be contiguous; uncovered bit ranges stay 0. Lets encoders skip
    materializing all-zero filler segments (they are already zero in the
    output words), which for run-heavy streams removes the dominant
    full-length temporaries."""
    n_words = (total_bits + 63) >> 6
    words = np.zeros(n_words, dtype=np.uint64)
    word_idx = starts >> 6
    inword = starts & 63
    left = 64 - inword - lengths
    one_word = left >= 0
    if one_word.any():
        np.bitwise_or.at(
            words,
            word_idx[one_word],
            values[one_word] << left[one_word].astype(np.uint64),
        )
    two = ~one_word
    if two.any():
        over = (-left[two]).astype(np.uint64)
        np.bitwise_or.at(words, word_idx[two], values[two] >> over)
        np.bitwise_or.at(
            words, word_idx[two] + 1, values[two] << (np.uint64(64) - over)
        )
    return words.byteswap().tobytes()[: (total_bits + 7) >> 3]


class _BitReader:
    """Sequential big-endian bit reader over one Python int (read path)."""

    __slots__ = ("big", "total", "pos")

    def __init__(self, data: bytes):
        self.big = int.from_bytes(data, "big")
        self.total = 8 * len(data)
        self.pos = 0

    def read(self, width: int) -> int:
        v = (self.big >> (self.total - self.pos - width)) & ((1 << width) - 1)
        self.pos += width
        return v


# --------------------------------------------------------------------------
# Gorilla XOR values
# --------------------------------------------------------------------------

def gorilla_encode(values: np.ndarray) -> bytes:
    """float64 array → Gorilla-XOR-compressed bytes (stateless windows)."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = v.size
    header = np.array([n], dtype=np.uint64)
    if n == 0:
        return _pack_segments(header, np.array([64]))
    if n == 1:
        return _pack_segments(
            np.concatenate([header, v]), np.array([64, 64])
        )
    x = v[1:] ^ v[:-1]
    nz = x != 0
    # bit-position math only on the non-zero XORs — LOCF-filled series are
    # mostly repeats, so this skips ~20 full-array passes on typical data
    xnz = x[nz]
    lz = np.minimum(64 - _bit_length_u64(xnz), 63).astype(np.uint64)
    tz = _ctz_u64(xnz).astype(np.uint64)
    ml = _U64(64) - lz - tz  # meaningful bits, 1..64 where nz
    ml_i = ml.astype(np.int64)

    # explicit bit offsets: a zero-XOR delta occupies 1 zero bit, which is
    # already zero in the output words — only the n-nz records are packed
    extra = np.zeros(n - 1, dtype=np.int64)
    extra[nz] = 12 + ml_i  # record width minus the shared control bit
    off = np.empty(n - 1, dtype=np.int64)
    off[0] = 128
    if n > 2:
        np.cumsum(extra[:-1] + 1, out=off[1:])
        off[1:] += 128
    total_bits = 128 + (n - 1) + int(extra.sum())
    rec_off = off[nz]

    m = xnz.size
    seg_v = np.empty(2 + 2 * m, dtype=np.uint64)
    seg_l = np.empty(2 + 2 * m, dtype=np.int64)
    seg_s = np.empty(2 + 2 * m, dtype=np.int64)
    seg_v[0], seg_l[0], seg_s[0] = _U64(n), 64, 0
    seg_v[1], seg_l[1], seg_s[1] = v[0], 64, 64
    seg_v[2::2] = (_ONE << _U64(12)) | (lz << _U64(6)) | (ml - _ONE)
    seg_l[2::2] = 13
    seg_s[2::2] = rec_off
    seg_v[3::2] = xnz >> tz
    seg_l[3::2] = ml_i
    seg_s[3::2] = rec_off + 13
    return _pack_segments_at(seg_v, seg_l, seg_s, total_bits)


def gorilla_encode_runs(run_values: np.ndarray, run_lengths: np.ndarray) -> bytes:
    """``gorilla_encode(np.repeat(run_values, run_lengths))`` computed
    directly from the run structure — O(runs), never materializing the
    dense array.

    The LOCF gap-fill encode path emits exactly run-shaped series (each
    observation starts a run that repeats until the next observation), so
    this turns the value half of the fused encode kernel from O(dense
    points) into O(observed points). Byte-identical to the dense encoder:
    repeats are '0' control bits (already zero in the output words), and
    only run-boundary records with a non-zero XOR are packed, at offsets
    computed from the run lengths. Zero-length runs are dropped (dense
    scatter's last-duplicate-wins falls out of this too); a boundary whose
    XOR is zero (observation equal to the carried value) costs a control
    bit like any repeat — no record, exactly as the dense path.
    """
    L = np.asarray(run_lengths, dtype=np.int64)
    keep = L > 0
    w = np.ascontiguousarray(run_values, dtype=np.float64).view(np.uint64)[keep]
    L = L[keep]
    n = int(L.sum())
    header = np.array([n], dtype=np.uint64)
    if n == 0:
        return _pack_segments(header, np.array([64]))
    if n == 1:
        return _pack_segments(np.concatenate([header, w[:1]]), np.array([64, 64]))
    xb = w[1:] ^ w[:-1]
    nzb = xb != 0
    xnz = xb[nzb]
    lz = np.minimum(64 - _bit_length_u64(xnz), 63).astype(np.uint64)
    tz = _ctz_u64(xnz).astype(np.uint64)
    ml = _U64(64) - lz - tz
    ml_i = ml.astype(np.int64)
    # run k (k≥1) starts at dense position Σ L[:k]; its boundary is dense
    # delta index (position − 1); delta j sits at bit offset
    # 128 + j + (total extra bits of records at earlier deltas)
    pos = np.cumsum(L)[:-1]
    dj = pos[nzb] - 1
    extra = 12 + ml_i
    rec_off = 128 + dj + np.concatenate([[0], np.cumsum(extra[:-1])])
    total_bits = 128 + (n - 1) + int(extra.sum())
    m = xnz.size
    seg_v = np.empty(2 + 2 * m, dtype=np.uint64)
    seg_l = np.empty(2 + 2 * m, dtype=np.int64)
    seg_s = np.empty(2 + 2 * m, dtype=np.int64)
    seg_v[0], seg_l[0], seg_s[0] = _U64(n), 64, 0
    seg_v[1], seg_l[1], seg_s[1] = w[0], 64, 64
    seg_v[2::2] = (_ONE << _U64(12)) | (lz << _U64(6)) | (ml - _ONE)
    seg_l[2::2] = 13
    seg_s[2::2] = rec_off
    seg_v[3::2] = xnz >> tz
    seg_l[3::2] = ml_i
    seg_s[3::2] = rec_off + 13
    return _pack_segments_at(seg_v, seg_l, seg_s, total_bits)


def gorilla_encode_runs_blocks(
    run_values: np.ndarray, run_lengths: np.ndarray, block_bounds: np.ndarray
) -> list[bytes]:
    """Batched :func:`gorilla_encode_runs`: encode MANY blocks in one
    vectorized pass. Block ``b``'s runs are
    ``run_values[block_bounds[b]:block_bounds[b+1]]`` (same for lengths);
    returns one ``bytes`` per block, each byte-identical to
    ``gorilla_encode(np.repeat(...))`` of that block's runs.

    Why: the fused encode kernel emits ~tens of runs per block; per-block
    calls spend more time in numpy dispatch than in compute (profiled
    ~60% of kernel CPU). Here every stage — bit-length, offsets,
    cumsums, the or-scatter pack — runs ONCE over all blocks' records,
    into a single words buffer with each block's stream 64-bit aligned,
    then sliced per block (alignment makes the byteswapped slice of the
    shared buffer equal to the standalone encoding).
    """
    bounds = np.asarray(block_bounds, dtype=np.int64)
    nblocks = bounds.size - 1
    if nblocks <= 0:
        return []
    L = np.asarray(run_lengths, dtype=np.int64)
    blk = np.repeat(np.arange(nblocks, dtype=np.int64), np.diff(bounds))
    keep = L > 0
    w = np.ascontiguousarray(run_values, dtype=np.float64).view(np.uint64)[keep]
    L, blk = L[keep], blk[keep]

    n_per = np.zeros(nblocks, dtype=np.int64)
    np.add.at(n_per, blk, L)
    has_v0 = np.zeros(nblocks, dtype=bool)
    has_v0[blk] = True  # block has ≥1 kept run ⇔ n ≥ 1
    first_idx = np.searchsorted(blk, np.arange(nblocks))  # valid where has_v0

    # records: run boundaries within one block whose XOR is non-zero
    xb = w[1:] ^ w[:-1]
    rec = (blk[1:] == blk[:-1]) & (xb != 0)
    xnz = xb[rec]
    rec_blk = blk[1:][rec]
    lz = np.minimum(64 - _bit_length_u64(xnz), 63).astype(np.uint64)
    tz = _ctz_u64(xnz).astype(np.uint64)
    ml = _U64(64) - lz - tz
    ml_i = ml.astype(np.int64)
    extra = 12 + ml_i

    # dense position of each run inside its block → record delta index
    cstart = np.cumsum(L) - L  # global start position of each run
    block_pos0 = np.zeros(nblocks, dtype=np.int64)
    block_pos0[has_v0] = cstart[first_idx[has_v0]]
    pos_in_block = cstart - block_pos0[blk]
    dj = pos_in_block[1:][rec] - 1

    # within-block exclusive cumsum of record extras
    excl = np.cumsum(extra) - extra
    rec_first = np.searchsorted(rec_blk, np.arange(nblocks))
    has_rec = np.zeros(nblocks, dtype=bool)
    has_rec[rec_blk] = True
    rec_base = np.zeros(nblocks, dtype=np.int64)
    rec_base[has_rec] = excl[rec_first[has_rec]]
    within = excl - rec_base[rec_blk]
    rec_off = 128 + dj + within

    extra_per = np.zeros(nblocks, dtype=np.int64)
    np.add.at(extra_per, rec_blk, extra)
    total_bits = np.where(
        n_per >= 1, 128 + (n_per - 1) + extra_per, 64
    )
    padded = (total_bits + 63) >> 6 << 6  # word-align each block's stream
    base = np.cumsum(padded) - padded

    m = xnz.size
    nh = int(has_v0.sum())
    seg_v = np.empty(nblocks + nh + 2 * m, dtype=np.uint64)
    seg_l = np.empty(seg_v.size, dtype=np.int64)
    seg_s = np.empty(seg_v.size, dtype=np.int64)
    seg_v[:nblocks] = n_per.astype(np.uint64)
    seg_l[:nblocks] = 64
    seg_s[:nblocks] = base
    sl = slice(nblocks, nblocks + nh)
    seg_v[sl] = w[first_idx[has_v0]]
    seg_l[sl] = 64
    seg_s[sl] = base[has_v0] + 64
    rb = base[rec_blk]
    sl = slice(nblocks + nh, nblocks + nh + m)
    seg_v[sl] = (_ONE << _U64(12)) | (lz << _U64(6)) | (ml - _ONE)
    seg_l[sl] = 13
    seg_s[sl] = rb + rec_off
    sl = slice(nblocks + nh + m, None)
    seg_v[sl] = xnz >> tz
    seg_l[sl] = ml_i
    seg_s[sl] = rb + rec_off + 13
    data = _pack_segments_at(seg_v, seg_l, seg_s, int(padded.sum()))
    b0 = (base >> 3).tolist()
    nb = ((total_bits + 7) >> 3).tolist()
    return [data[o : o + k] for o, k in zip(b0, nb)]


def _read_bits_at(data: bytes, p: int, w: int) -> int:
    """Read ``w`` bits at bit offset ``p`` — O(w) regardless of blob
    size (slices ≤ 9 bytes; no whole-blob big-int shifting)."""
    byte0 = p >> 3
    nbytes = ((p & 7) + w + 7) >> 3
    chunk = int.from_bytes(data[byte0 : byte0 + nbytes], "big")
    return (chunk >> ((nbytes << 3) - (p & 7) - w)) & ((1 << w) - 1)


def gorilla_decode(data: bytes) -> np.ndarray:
    """Decode per RECORD, not per point: repeats are zero control bits,
    so the cursor jumps straight to the next set bit (one vectorized
    ``unpackbits``+``flatnonzero`` over the blob) and the dense output
    is one ``np.repeat`` of the run values — the exact inverse of
    :func:`gorilla_encode_runs`. Python work is O(value changes); a
    754M-point LOCF tier decodes through ~1/600th of the old per-point
    loop's interpreter work."""
    import bisect

    n = _read_bits_at(data, 0, 64)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    first = _read_bits_at(data, 64, 64)
    if n == 1:
        return np.array([first], dtype=np.uint64).view(np.float64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    # ones: positions of ALL set bits; the first ≥ cursor is always the
    # next record's control bit (zero-run deltas contribute no set bits,
    # payload bits lie strictly inside the record just consumed, and the
    # byte-boundary padding is zeros)
    ones = np.flatnonzero(bits)
    cursor = 128  # after header + first value
    dense_pos = 0  # dense index of the last emitted run start
    prev = first
    run_vals = [first]
    run_pos = [0]
    ones_list = ones.tolist()
    oi = bisect.bisect_left(ones_list, cursor)
    remaining = n - 1
    while remaining > 0 and oi < len(ones_list):
        p = ones_list[oi]
        if p >= cursor + remaining:  # set bit beyond our deltas (padding)
            break
        zeros = p - cursor  # zero-control deltas before this record
        hdr = _read_bits_at(data, p + 1, 12)
        lz = hdr >> 6
        ml = (hdr & 63) + 1
        payload = _read_bits_at(data, p + 13, ml)
        prev ^= payload << (64 - lz - ml)
        dense_pos += zeros + 1
        run_vals.append(prev)
        run_pos.append(dense_pos)
        cursor = p + 13 + ml
        remaining = n - 1 - dense_pos
        oi = bisect.bisect_left(ones_list, cursor, oi + 1)
    rv = np.array(run_vals, dtype=np.uint64)
    lens = np.diff(np.append(np.asarray(run_pos, dtype=np.int64), n))
    return np.repeat(rv, lens).view(np.float64)


# --------------------------------------------------------------------------
# Delta-of-delta timestamps
# --------------------------------------------------------------------------

_DOD_BUCKETS = (  # (low, high, control, control_bits, payload_bits, bias)
    (-63, 64, 0b10, 2, 7, 63),
    (-255, 256, 0b110, 3, 9, 255),
    (-2047, 2048, 0b1110, 4, 12, 2047),
)


def dod_encode(ts: np.ndarray) -> bytes:
    """int64 timestamps (any unit) → delta-of-delta compressed bytes."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = t.size
    head_v = [np.uint64(n)]
    head_l = [64]
    if n >= 1:
        head_v.append(t[0].astype(np.uint64))
        head_l.append(64)
    if n >= 2:
        head_v.append((t[1] - t[0]).astype(np.int64).astype(np.uint64))
        head_l.append(64)
    if n < 3:
        return _pack_segments(np.array(head_v, dtype=np.uint64), np.array(head_l))

    delta = t[1:] - t[:-1]
    dod = delta[1:] - delta[:-1]  # length n-2
    m = dod.size
    seg_v = np.zeros((m, 2), dtype=np.uint64)
    seg_l = np.zeros((m, 2), dtype=np.int64)

    assigned = dod == 0
    seg_l[assigned, 0] = 1  # control '0'
    for low, high, ctrl, cbits, pbits, bias in _DOD_BUCKETS:
        sel = (~assigned) & (dod >= low) & (dod <= high)
        seg_v[sel, 0] = (np.uint64(ctrl) << np.uint64(pbits)) | (
            (dod[sel] + bias).astype(np.uint64)
        )
        seg_l[sel, 0] = cbits + pbits
        assigned |= sel
    rest = ~assigned
    seg_v[rest, 0] = 0b1111
    seg_l[rest, 0] = 4
    seg_v[rest, 1] = dod[rest].astype(np.uint64)  # two's complement
    seg_l[rest, 1] = 64

    all_v = np.concatenate([np.array(head_v, dtype=np.uint64), seg_v.ravel()])
    all_l = np.concatenate([head_l, seg_l.ravel()])
    return _pack_segments(all_v, all_l)


def dod_encode_dense(t0: int, step: int, n: int) -> bytes:
    """``dod_encode(np.arange(t0, t0 + n*step, step))`` constructed
    directly — a dense arithmetic sequence has delta-of-delta ≡ 0, so the
    stream is the 3-word header plus n-2 zero control bits. The gap-filled
    encode path emits exactly such sequences; this skips the whole
    delta/bucket/bit-scatter pipeline for the timestamp half (verified
    byte-identical in tests)."""
    if n == 0:
        return np.array([0], dtype=">u8").tobytes()
    if n == 1:
        return np.array([1, t0], dtype=">u8").tobytes()
    head = np.array([n, t0, step], dtype=np.int64).astype(">u8").tobytes()
    return head + bytes((n - 2 + 7) >> 3)


def dod_decode(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(64)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    # dense fast path: every gap-filled blob this engine writes is an
    # arithmetic sequence (dod_encode_dense) — 3-word header, then n-2
    # zero control bits. Detect it by the all-zero tail and reconstruct
    # with one arange instead of a per-point python loop.
    if n > 1 and len(data) == 24 + ((n - 2 + 7) >> 3) and not any(data[24:]):
        t0 = np.frombuffer(data[8:16], dtype=">u8")[0].astype(np.int64)
        step = np.frombuffer(data[16:24], dtype=">u8")[0].astype(np.int64)
        return t0 + step * np.arange(n, dtype=np.int64)

    def _s64(u: int) -> int:
        # two's-complement wrap: encode-side arithmetic is numpy int64
        u &= (1 << 64) - 1
        return u - (1 << 64) if u >= (1 << 63) else u

    t = _s64(r.read(64))
    out[0] = t
    if n == 1:
        return out
    delta = _s64(r.read(64))
    t = _s64(t + delta)
    out[1] = t
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = _s64(r.read(64))
        delta = _s64(delta + dod)
        t = _s64(t + delta)
        out[i] = t
    return out
