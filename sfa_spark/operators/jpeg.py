"""Pure-stdlib JPEG codec (baseline SOF0/SOF1 + progressive SOF2) for
the multimodal decode seam.

JPEG is the dominant web image format; the container bundles no image
library, so — like the PNG module — this implements the PUBLIC spec
(ITU-T T.81 / ISO 10918-1, JFIF color) from scratch with numpy:
marker/segment parsing, DQT/DHT table decoding, canonical Huffman
entropy decode (DC predictors, AC run-length, byte destuffing, restart
markers), batched 8×8 IDCT via the orthonormal DCT-II matrix (one
einsum over all blocks), floor-scaled chroma upsampling, and BT.601
full-range YCbCr→RGB. Supported: 8-bit baseline-sequential (SOF0, and
SOF1 extended-sequential, single- or multi-scan, interleaved or not)
and 8-bit PROGRESSIVE (SOF2: spectral selection + successive
approximation, T.81 Annex G — DC first/refine, AC first/refine with
EOB-run decoding, per-scan restart intervals; truncated progressive
streams decode to whatever scans arrived, matching browser behavior),
greyscale or 3-component YCbCr with any H/V sampling factors (4:4:4,
4:2:0, 4:2:2, …). Arithmetic coding, 12-bit, hierarchical, lossless,
and CMYK raise NotImplementedError — the injection seam stays open for
them.

The encoder exists for fixtures and round-trip tests: it emits valid
self-describing baseline OR progressive JPEGs (its quant + Huffman
tables travel in DQT/DHT, so any compliant decoder can read them)
using simple canonical single-length Huffman tables — correctness over
compression. ``progressive=True`` uses the standard scan script shape
(interleaved DC first + DC refine, then per-component AC first + AC
refine) with per-block EOB runs; a fully-refined progressive encoding
carries EXACTLY the same quantized coefficients as the sequential
encoding, so the two must decode bit-identically — the round-trip
parity oracle the tests pin.

Scale note: the hot single-scan baseline path collects sparse
(block, k, value) triples in plain Python and defers scatter/
dequantize/dezigzag/IDCT to one whole-array pass per component, and
reads the bitstream through a flat-table reader (one list lookup per
Huffman symbol over precomputed 16-bit windows — ``_FastBitReader``;
micro-bench-gated ≥2× over the per-bit reference reader, which remains
as the parity oracle; ~2.4× measured). The per-SYMBOL Python loop that
remains is inherent to Huffman's sequential dependency. Multi-scan and
progressive files go through the generic dense-coefficient scan
decoder instead (refinement is per-coefficient sequential by
construction); it shares the flat-table reader and the one-pass
reconstruction."""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables


def _zigzag() -> np.ndarray:
    """The spec's zigzag scan as a (64,) array of raster indices:
    zigzag[k] = row*8 + col of the k-th scanned coefficient."""
    out = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        rows = rng if d % 2 else reversed(rng)  # odd diagonals go down-left
        for r in rows:
            out.append(r * 8 + (d - r))
    return np.asarray(out, dtype=np.int64)


_ZZ = _zigzag()  # zigzag position k -> raster index; q_raster[_ZZ] is
# the zigzag-ordered listing DQT stores and the quantizer divides by

# Annex K base quantization tables (public spec constants)
_Q_LUM = np.asarray(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHR = np.asarray(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def _dct_mat() -> np.ndarray:
    """Orthonormal DCT-II basis M: F = M f Mᵀ, f = Mᵀ F M (the JPEG
    FDCT/IDCT pair with the C(u) normalization folded in)."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_DCT = _dct_mat()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the DHT (BITS, HUFFVAL) form."""
    assert sum(bits) == len(vals)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the sequential bit-walk decoder
    (kept as the parity oracle for the flat-table fast path)."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


_FLAT_CACHE: dict[tuple, list[int]] = {}
_FLAT_CACHE_MAX = 16  # each entry is a 65536-int list (~2.3 MB boxed):
# standard Annex-K tables stay hot; per-image optimized-Huffman tables
# (mozjpeg etc.) churn through a bounded FIFO window instead of leaking


def _flat_table(bits: list[int], vals: list[int]) -> list[int]:
    """65536-entry lookup: next-16-bits window -> (symbol << 5) | length.
    Every 16-bit window whose prefix is code c of length l maps to c's
    entry, so Huffman decode is ONE list index + pointer bump instead of
    a per-bit Python walk. Entry 0 marks an invalid code. Returned as a
    plain Python list (int indexing is ~3× a numpy scalar lookup) and
    cached per (BITS, HUFFVAL) — web corpora overwhelmingly reuse the
    spec's standard tables, so the build cost is paid once per process."""
    key = (tuple(bits), tuple(vals))
    cached = _FLAT_CACHE.get(key)
    if cached is not None:
        return cached
    tbl = np.zeros(1 << 16, dtype=np.uint16)
    for sym, (code, length) in _canonical_codes(bits, vals).items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        tbl[lo:hi] = (sym << 5) | length
    out = tbl.tolist()
    if len(_FLAT_CACHE) >= _FLAT_CACHE_MAX:
        _FLAT_CACHE.pop(next(iter(_FLAT_CACHE)))  # FIFO evict
    _FLAT_CACHE[key] = out
    return out


# ---------------------------------------------------------------- decode


class _BitReader:
    """MSB-first bit reader over one destuffed entropy segment."""

    __slots__ = ("d", "pos", "bit")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        s = table.get((length, code))
        if s is not None:
            return s
    raise ValueError("invalid JPEG Huffman code")


class _FastBitReader:
    """Table-driven reader over one destuffed entropy segment.

    The segment's bits are unpacked ONCE and every 16-bit window is
    precomputed as an integer (16 vectorized shift-adds), so
    ``huff(tbl)`` is a single flat-table lookup + pointer bump and
    ``read_bits(n)`` a shift — replacing the per-bit Python arithmetic
    that dominated decode CPU (micro-bench-gated ≥2×, ~2.4× measured;
    the per-bit reader remains as the parity oracle). Windows past the end
    are padded with 1-bits, matching the spec's padding, and reads past
    the data raise IndexError like the reference reader."""

    __slots__ = ("win", "pos", "nbits")

    def __init__(self, data: bytes):
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.nbits = bits.size
        ext = np.concatenate([bits, np.ones(16, dtype=np.uint8)]).astype(np.uint32)
        win = np.zeros(self.nbits + 1, dtype=np.uint32)
        for j in range(16):
            win += ext[j : j + self.nbits + 1] << (15 - j)
        # plain Python ints: list indexing beats numpy scalar access ~3×
        # in the per-symbol loop
        self.win = win.tolist()
        self.pos = 0

    def huff(self, tbl: list[int]) -> int:
        if self.pos >= self.nbits:
            raise IndexError("JPEG entropy segment exhausted")
        v = tbl[self.win[self.pos]]
        length = v & 31
        if length == 0:
            raise ValueError("invalid JPEG Huffman code")
        self.pos += length
        return v >> 5

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos >= self.nbits:
            raise IndexError("JPEG entropy segment exhausted")
        v = self.win[self.pos] >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude-category decode (spec EXTEND)."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Destuff the entropy-coded bytes from ``pos`` to EOI, split on
    restart markers. Returns (segments, pos_after_EOI)."""
    segs: list[bytes] = []
    cur = bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        m = data[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        elif m == 0xD9:  # EOI
            pos += 2
            break
        elif m == 0xFF:
            pos += 1  # fill byte
        else:
            break  # next marker segment (subsequent SOS / EOI — caller's)
    segs.append(bytes(cur))
    return segs, pos


def _decode_scan_sparse(segs, scomps, comps, restart_interval, mcux, mcuy, fast):
    """The hot path: ONE interleaved sequential scan covering all
    components (the overwhelming majority of web JPEGs) decoded to
    SPARSE (block, zigzag-k, value) triples accumulated in plain Python
    lists — the per-symbol loop touches no numpy at all; scatter +
    dequantize + dezigzag + IDCT happen once per component as
    whole-array ops (per-block numpy dispatch was the decode bottleneck
    after the reader went table-driven)."""
    sp_b: list[list[int]] = [[] for _ in comps]
    sp_k: list[list[int]] = [[] for _ in comps]
    sp_v: list[list[int]] = [[] for _ in comps]
    mk_reader = _FastBitReader if fast else _BitReader

    def huffd(rd, tables) -> int:
        return rd.huff(tables["flat"]) if fast else _huff_decode(rd, tables["dict"])

    seg_i = 0
    br = mk_reader(segs[0])
    preds = [0] * len(scomps)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            br = mk_reader(segs[seg_i])
            preds = [0] * len(scomps)
        my, mx = divmod(mcu, mcux)
        for si, (ci, dc_t, ac_t) in enumerate(scomps):
            comp = comps[ci]
            bx_per_row = mcux * comp["h"]
            eb, ek, ev = sp_b[ci], sp_k[ci], sp_v[ci]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    bpos = (my * comp["v"] + by) * bx_per_row + (mx * comp["h"] + bx)
                    t = huffd(br, dc_t)
                    diff = _extend(br.read_bits(t), t) if t else 0
                    preds[si] += diff
                    if preds[si]:
                        eb.append(bpos)
                        ek.append(0)
                        ev.append(preds[si])
                    k = 1
                    while k < 64:
                        rs = huffd(br, ac_t)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        eb.append(bpos)
                        ek.append(k)
                        ev.append(_extend(br.read_bits(s), s))
                        k += 1
    return sp_b, sp_k, sp_v


def _decode_scan_generic(
    segs,
    scomps,
    ss,
    se,
    ah,
    al,
    comps,
    coefs,
    restart_interval,
    mcux,
    mcuy,
    hmax,
    vmax,
    h_img,
    w_img,
    fast,
    progressive,
):
    """One sequential-or-progressive scan decoded into the dense
    per-component ZIGZAG-order coefficient arrays (T.81 Annex F/G
    semantics: DC first/refine, AC first with EOB runs, AC refinement
    with correction bits — the successive-approximation decision trees
    mirror the public spec exactly). Handles interleaved (MCU-order)
    and single-component (component-raster, own block dims) scans,
    restart intervals (DC predictors AND the EOB run reset), and
    baseline multi-scan files (a sequential scan is the degenerate
    Ss=0, Se=63, Ah=Al=0 case of the same decision trees).

    Refinement scans mutate one plain-Python list per block (numpy
    scalar writes would dominate at these sizes)."""
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive JPEG scan mixes DC and AC")
        if ss > 0 and len(scomps) != 1:
            raise ValueError("progressive JPEG AC scan must be single-component")
    mk_reader = _FastBitReader if fast else _BitReader

    def sym(rd, tables) -> int:
        return rd.huff(tables["flat"]) if fast else _huff_decode(rd, tables["dict"])

    p1 = 1 << al
    interleaved = len(scomps) > 1
    if interleaved:
        nunits = mcux * mcuy
    else:
        ci0 = scomps[0][0]
        comp0 = comps[ci0]
        # non-interleaved scans traverse the component's OWN block grid
        # (ceil of its scaled sample dims), not the MCU-padded grid
        cw = -(-w_img * comp0["h"] // hmax)
        ch = -(-h_img * comp0["v"] // vmax)
        ubw = -(-cw // 8)
        nunits = ubw * (-(-ch // 8))
        stride0 = mcux * comp0["h"]

    seg_i = 0
    rd = mk_reader(segs[0])
    preds = [0] * len(scomps)
    eobrun = 0

    for u in range(nunits):
        if restart_interval and u and u % restart_interval == 0:
            seg_i += 1
            rd = mk_reader(segs[seg_i])
            preds = [0] * len(scomps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            blocks = []
            for si, (ci, _, _) in enumerate(scomps):
                comp = comps[ci]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blocks.append(
                            (
                                si,
                                (my * comp["v"] + by) * (mcux * comp["h"])
                                + (mx * comp["h"] + bx),
                            )
                        )
        else:
            bry, brx = divmod(u, ubw)
            blocks = [(0, bry * stride0 + brx)]
        for si, bpos in blocks:
            ci, dc_t, ac_t = scomps[si]
            arr = coefs[ci]
            if ss == 0:
                if ah == 0:  # DC first (or the DC half of a sequential scan)
                    if dc_t is None:
                        raise ValueError("JPEG scan missing its DC Huffman table")
                    t = sym(rd, dc_t)
                    diff = _extend(rd.read_bits(t), t) if t else 0
                    preds[si] += diff
                    arr[bpos, 0] = preds[si] << al
                else:  # DC refine: one raw bit per block
                    if rd.read_bits(1):
                        arr[bpos, 0] |= p1
            if se == 0:
                continue
            if ac_t is None:
                raise ValueError("JPEG scan missing its AC Huffman table")
            k0 = ss if ss > 0 else 1
            if ah == 0:  # AC first (EOB runs; sequential AC is the r=0 case)
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = k0
                while k <= se:
                    rs = sym(rd, ac_t)
                    r, s = rs >> 4, rs & 15
                    if s:
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC run past end of band")
                        arr[bpos, k] = _extend(rd.read_bits(s), s) << al
                        k += 1
                    else:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += rd.read_bits(r)
                            break
                        k += 16  # ZRL
            else:  # AC refinement: correction bits + newly-nonzero ±1·2^Al
                row = arr[bpos].tolist()
                k = k0
                if eobrun == 0:
                    while k <= se:
                        rs = sym(rd, ac_t)
                        r, s = rs >> 4, rs & 15
                        val = 0
                        if s:
                            # refinement codes magnitude 1 only; next bit
                            # is the sign of the newly-nonzero coefficient
                            val = p1 if rd.read_bits(1) else -p1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rd.read_bits(r)
                            break
                        # advance: correct nonzero-history coefficients
                        # (one bit each), consume r zero-history slots,
                        # land on the newly-nonzero target (or run out)
                        while k <= se:
                            c = row[k]
                            if c:
                                if rd.read_bits(1) and (c & p1) == 0:
                                    row[k] = c + (p1 if c >= 0 else -p1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            row[k] = val
                        k += 1
                if eobrun > 0:
                    # EOB run covers this block's tail: nonzero-history
                    # coefficients still carry one correction bit each
                    while k <= se:
                        c = row[k]
                        if c and rd.read_bits(1) and (c & p1) == 0:
                            row[k] = c + (p1 if c >= 0 else -p1)
                        k += 1
                    eobrun -= 1
                arr[bpos] = row


def decode_jpeg(payload: bytes, meta=None, fast: bool = True) -> np.ndarray:
    """Decode a JPEG (baseline SOF0/SOF1, multi-scan sequential, or
    progressive SOF2) to (h, w, c) uint8.

    Signature matches the multimodal ``decoder(payload, meta)`` seam
    (meta ignored — the SOF header is authoritative). Raises ValueError
    for non-JPEG payloads and NotImplementedError for unsupported
    coding processes (arithmetic, 12-bit, hierarchical, lossless,
    CMYK), so callers can fall back. ``fast`` selects the flat-table
    entropy reader (default); ``fast=False`` keeps the per-bit
    reference reader — identical output, used as the parity oracle in
    tests. A progressive stream truncated AFTER at least one complete
    scan decodes to the refinement level that arrived (browser
    behavior); truncation inside the first scan raises ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    progressive = False
    restart_interval = 0
    pos = 2
    n = len(payload)
    sparse = None  # fast-path result: (sp_b, sp_k, sp_v)
    coefs = None  # generic-path dense zigzag coefficient arrays
    geom = None
    scans_done = 0
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # stray RSTn / TEM
            pos += 2
            continue
        if pos + 4 > n or pos + 2 + 2 > n:
            seglen = None
        else:
            (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if seglen is None or pos + 2 + seglen > n:
            # stream ends inside a marker segment: truncation. With at
            # least one complete scan, decode what arrived (browser
            # behavior); else nothing is usable.
            if scans_done > 0:
                break
            raise ValueError("truncated JPEG marker segment")
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq:
                    tbl = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    tbl = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                qt[tq] = tbl  # zigzag order, as stored
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = {
                    "dict": _decode_table(bits, vals),
                    "flat": _flat_table(bits, vals),
                }
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, h_img, w_img, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = (h_img, w_img, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — decode this scan's entropy data now
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            h_img, w_img, comps = frame
            if len(comps) not in (1, 3):
                raise NotImplementedError("only greyscale / YCbCr JPEG supported")
            ns = body[0]
            sel = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            cid_to_ix = {c["id"]: i for i, c in enumerate(comps)}
            try:
                # scan components in SCAN order (the bitstream's
                # interleave follows the scan header, not SOF)
                scomps = [
                    (cid_to_ix[cid], huff.get((0, t >> 4)), huff.get((1, t & 15)))
                    for cid, t in sel
                ]
            except KeyError:
                raise ValueError("JPEG scan references unknown component")
            segs, pos = _entropy_segments(payload, pos)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w_img // (8 * hmax))
            mcuy = -(-h_img // (8 * vmax))
            geom = (h_img, w_img, comps, hmax, vmax, mcux, mcuy)
            if (
                not progressive
                and coefs is None
                and scans_done == 0
                and (ss, se, ah, al) == (0, 63, 0, 0)
                and [comps[ci]["id"] for ci, _, _ in scomps]
                == [c["id"] for c in comps]
            ):
                for _, dc_t, ac_t in scomps:
                    if dc_t is None or ac_t is None:
                        raise ValueError("JPEG scan missing a Huffman table")
                sparse = _decode_scan_sparse(
                    segs, scomps, comps, restart_interval, mcux, mcuy, fast
                )
            else:
                if sparse is not None:
                    raise ValueError("JPEG re-codes a completed sequential scan")
                if coefs is None:
                    coefs = [
                        np.zeros(
                            (mcuy * c["v"] * mcux * c["h"], 64), dtype=np.int64
                        )
                        for c in comps
                    ]
                try:
                    _decode_scan_generic(
                        segs, scomps, ss, se, ah, al, comps, coefs,
                        restart_interval, mcux, mcuy, hmax, vmax,
                        h_img, w_img, fast, progressive,
                    )
                except (IndexError, ValueError):
                    # IndexError: entropy data ran out mid-scan.
                    # ValueError with the stream ended: the cut landed
                    # mid-byte and the 1-padding decoded as a bogus
                    # symbol. Both mean truncation — with at least one
                    # complete prior scan, decode what arrived (browser
                    # behavior); else it's unusable. A bad symbol with
                    # MORE data following is real corruption: re-raise.
                    if scans_done == 0:
                        raise ValueError("truncated JPEG entropy data")
                    if pos < n:
                        raise
                    break
            scans_done += 1
        # APPn / COM / DNL / others: skipped
    if geom is None or (sparse is None and coefs is None):
        raise ValueError("JPEG missing SOF/SOS")
    h_img, w_img, comps, hmax, vmax, mcux, mcuy = geom

    planes = []
    for ci, comp in enumerate(comps):
        by, bx = mcuy * comp["v"], mcux * comp["h"]
        if sparse is not None:
            sp_b, sp_k, sp_v = sparse
            zzmat = np.zeros((by * bx, 64), dtype=np.float64)
            if sp_b[ci]:
                zzmat[sp_b[ci], sp_k[ci]] = sp_v[ci]
        else:
            zzmat = coefs[ci].astype(np.float64)
        if comp["tq"] not in qt:
            raise ValueError("JPEG missing quantization table")
        zzmat *= qt[comp["tq"]][None, :]  # dequantize (zigzag order)
        flat = np.zeros((by * bx, 64), dtype=np.float64)
        flat[:, _ZZ] = zzmat  # dezigzag every block at once
        flat = flat.reshape(by * bx, 8, 8)
        # batched IDCT: f = Mᵀ F M over every block at once
        pix = np.einsum("ux,nuv,vy->nxy", _DCT, flat, _DCT) + 128.0
        plane = (
            pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        # crop to the component's true size, then floor-upsample to full res
        ch = -(-h_img * comp["v"] // vmax)
        cw = -(-w_img * comp["h"] // hmax)
        plane = plane[:ch, :cw]
        ys = np.arange(h_img) * comp["v"] // vmax
        xs = np.arange(w_img) * comp["h"] // hmax
        planes.append(plane[ys][:, xs])

    if len(planes) == 1:
        out = planes[0][:, :, None]
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec

    def raw_marker(self, b: bytes) -> None:
        """Append marker bytes verbatim (markers are never stuffed).
        Caller must be byte-aligned (pad_to_byte first)."""
        assert self.nbits == 0
        self.out += b

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


# simple valid canonical tables: every DC symbol length 4, every AC
# symbol length 8 (165 ≤ 255 codes; the all-ones code stays unused)
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (public recipe)."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_plane_blocks(plane: np.ndarray, q_zz: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) → (nblocks, 64) quantized
    zigzag coefficients, blocks in raster order. H, W multiples of 8."""
    hh, ww = plane.shape
    blocks = (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coef = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT).reshape(-1, 64)
    zz = coef[:, _ZZ]
    return np.round(zz / q_zz[None, :]).astype(np.int64)


def _emit_ac_first(bw: _BitWriter, zz, k0: int, se: int, al: int, ac_codes) -> None:
    """AC coefficients of one block, first pass (T.81 G.1.2.2): the AC
    point transform is a magnitude shift (toward zero); per-block EOB0
    terminates the band (this encoder never accumulates EOB runs —
    spec-valid, simpler, and what the per-block decoder exercises
    hardest). Sequential AC encoding is the al=0 case."""
    r = 0
    for k in range(k0, se + 1):
        v = int(zz[k])
        av = (v if v >= 0 else -v) >> al
        if av == 0:
            r += 1
            continue
        while r > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            r -= 16
        s = av.bit_length()
        c, ln = ac_codes[(r << 4) | s]
        bw.write(c, ln)
        bw.write(av if v > 0 else (av ^ ((1 << s) - 1)), s)
        r = 0
    if r:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)


def _emit_ac_refine(bw: _BitWriter, zz, k0: int, se: int, al: int, ac_codes) -> None:
    """AC refinement pass (T.81 G.1.2.3): newly-nonzero coefficients
    (shifted magnitude exactly 1) are coded as run/1 + sign; previously
    nonzero coefficients contribute one buffered correction bit each,
    flushed after the NEXT emitted symbol (ZRL, run/1, or the final
    EOB) — mirroring the decoder's walk order exactly. ZRLs are
    suppressed past the last newly-nonzero coefficient (the tail folds
    into EOB)."""
    absv = [0] * (se + 1)
    eobpos = k0 - 1
    for k in range(k0, se + 1):
        v = int(zz[k])
        a = (v if v >= 0 else -v) >> al
        absv[k] = a
        if a == 1:
            eobpos = k
    r = 0
    buf: list[int] = []
    for k in range(k0, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eobpos:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            r -= 16
            for b in buf:
                bw.write(b, 1)
            buf = []
        if t > 1:
            buf.append(t & 1)
            continue
        c, ln = ac_codes[(r << 4) | 1]
        bw.write(c, ln)
        bw.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in buf:
            bw.write(b, 1)
        buf = []
        r = 0
    if r or buf:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)
        for b in buf:
            bw.write(b, 1)


def _emit_scan(
    sc: tuple,
    comp_blocks: list,
    samp: list,
    mcux: int,
    mcuy: int,
    dc_codes,
    ac_codes,
    restart_interval: int,
    h_img: int,
    w_img: int,
) -> bytes:
    """Entropy-code one scan (sequential or progressive band/pass) in
    the same unit order the decoder walks: MCU order when interleaved,
    the component's own block raster when single-component."""
    comp_ixs, ss, se, ah, al = sc
    bw = _BitWriter()
    preds = [0] * len(comp_ixs)
    interleaved = len(comp_ixs) > 1
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    if interleaved:
        nunits = mcux * mcuy
    else:
        ci0 = comp_ixs[0]
        sh0, sv0 = samp[ci0]
        cw = -(-w_img * sh0 // hmax)
        ch = -(-h_img * sv0 // vmax)
        ubw = -(-cw // 8)
        nunits = ubw * (-(-ch // 8))
        stride0 = mcux * sh0
    rst = 0
    for u in range(nunits):
        if restart_interval and u and u % restart_interval == 0:
            bw.pad_to_byte()
            bw.raw_marker(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            preds = [0] * len(comp_ixs)
        if interleaved:
            my, mx = divmod(u, mcux)
            blocks = []
            for si, ci in enumerate(comp_ixs):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blocks.append(
                            (si, ci, (my * sv + by) * (mcux * sh) + (mx * sh + bx))
                        )
        else:
            bry, brx = divmod(u, ubw)
            blocks = [(0, comp_ixs[0], bry * stride0 + brx)]
        for si, ci, bi in blocks:
            zz = comp_blocks[ci][bi]
            if ss == 0:
                v0 = int(zz[0])
                if ah == 0:
                    # DC point transform is an ARITHMETIC right shift
                    v = v0 >> al
                    diff = v - preds[si]
                    preds[si] = v
                    t = _category(diff)
                    code, ln = dc_codes[t]
                    bw.write(code, ln)
                    if t:
                        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
                else:
                    bw.write((v0 >> al) & 1, 1)  # DC refine: raw bit Al
            if se == 0:
                continue
            k0 = ss if ss > 0 else 1
            if ah == 0:
                _emit_ac_first(bw, zz, k0, se, al, ac_codes)
            else:
                _emit_ac_refine(bw, zz, k0, se, al, ac_codes)
    return bw.flush()


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode (h, w)/(h, w, 1) grey or (h, w, 3) RGB uint8 → JPEG
    bytes. Valid and self-describing (tables in DQT/DHT); used for
    fixtures and round-trip tests, not optimized for ratio.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (DC predictors reset) — real web JPEGs use restarts,
    and this exercises the decoder's segment-split path.
    ``progressive=True`` emits SOF2 with the standard scan-script shape
    (interleaved DC first at Al=1 + DC refine, then per-component AC
    first at Al=1 + AC refine): the fully-refined stream carries
    EXACTLY the same quantized coefficients as the sequential encoding,
    so both must decode bit-identically — the parity oracle."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h_img, w_img, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg: 1 or 3 channels only")
    if subsampling == "4:4:4" or nc == 1:
        samp = [(1, 1)] * nc
    elif subsampling == "4:2:0":
        samp = [(2, 2), (1, 1), (1, 1)]
    elif subsampling == "4:2:2":
        samp = [(2, 1), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unsupported subsampling {subsampling}")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    f = img.astype(np.float64)
    if nc == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [f[..., 0]]

    q_lum = _scale_q(_Q_LUM, quality)
    q_chr = _scale_q(_Q_CHR, quality)
    q_zz = [q_lum[_ZZ], q_chr[_ZZ], q_chr[_ZZ]][:nc]  # zigzag order

    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    comp_blocks = []
    for ci, (sh, sv) in enumerate(samp):
        p = planes[ci]
        if (sh, sv) != (hmax, vmax):  # box-mean downsample
            fy, fx = vmax // sv, hmax // sh
            ph = -(-p.shape[0] // fy) * fy
            pw = -(-p.shape[1] // fx) * fx
            pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
            p = pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th = mcuy * sv * 8
        tw = mcux * sh * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        comp_blocks.append(_encode_plane_blocks(p - 128.0, q_zz[ci]))

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    if progressive:
        all_c = list(range(nc))
        script = [(all_c, 0, 0, 0, 1), (all_c, 0, 0, 1, 0)]
        script += [([ci], 1, 63, 0, 1) for ci in range(nc)]
        script += [([ci], 1, 63, 1, 0) for ci in range(nc)]
    else:
        script = [(list(range(nc)), 0, 63, 0, 0)]
    scans = [
        (
            sc,
            _emit_scan(
                sc, comp_blocks, samp, mcux, mcuy,
                dc_codes, ac_codes, restart_interval, h_img, w_img,
            ),
        )
        for sc in script
    ]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(q_lum[_ZZ].astype(np.uint8)))
    if nc == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(q_chr[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h_img, w_img, nc)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC2 if progressive else 0xC0, sof)
    for tc in (0, 1):
        bits, vals = (
            (_ENC_DC_BITS, _ENC_DC_VALS) if tc == 0 else (_ENC_AC_BITS, _ENC_AC_VALS)
        )
        out += seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for (comp_ixs, ss, se, ah, al), entropy in scans:
        sos = bytes([len(comp_ixs)])
        for ci in comp_ixs:
            sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)
