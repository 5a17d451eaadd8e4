"""Pure-stdlib baseline JPEG (SOF0) codec for the multimodal decode seam.

JPEG is the dominant web image format; the container bundles no image
library, so — like the PNG module — this implements the PUBLIC spec
(ITU-T T.81 / ISO 10918-1 baseline sequential DCT, JFIF color) from
scratch with numpy: marker/segment parsing, DQT/DHT table decoding,
canonical Huffman entropy decode (DC predictors, AC run-length, byte
destuffing, restart markers), batched 8×8 IDCT via the orthonormal
DCT-II matrix (one einsum over all blocks), floor-scaled chroma
upsampling, and BT.601 full-range YCbCr→RGB. Supported: 8-bit baseline
(SOF0), greyscale or 3-component YCbCr with any H/V sampling factors
(4:4:4, 4:2:0, 4:2:2, …), optional restart intervals. Progressive
(SOF2), arithmetic coding, 12-bit, and CMYK raise NotImplementedError —
the injection seam stays open for them.

The encoder exists for fixtures and round-trip tests: it emits valid
self-describing baseline JPEGs (its quant + Huffman tables travel in
DQT/DHT, so any compliant decoder can read them) using simple canonical
single-length Huffman tables — correctness over compression.

Scale note: entropy decode collects sparse (block, k, value) triples in
plain Python and defers scatter/dequantize/dezigzag/IDCT to one
whole-array pass per component, and reads the bitstream through a
flat-table reader (one list lookup per Huffman symbol over precomputed
16-bit windows — ``_FastBitReader``; micro-bench-gated ≥2× over the
per-bit reference reader, which remains as the parity oracle; ~2.4×
measured, and the sparse restructure sped BOTH paths another ~2×). The
per-SYMBOL Python loop that remains is inherent to Huffman's sequential
dependency.
"""

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
            break  # next marker segment (multi-scan not supported)
    segs.append(bytes(cur))
    return segs, pos


def decode_jpeg(payload: bytes, meta=None, fast: bool = True) -> np.ndarray:
    """Decode a baseline-sequential (SOF0) JPEG to (h, w, c) uint8.

    Signature matches the multimodal ``decoder(payload, meta)`` seam
    (meta ignored — the SOF0 header is authoritative). Raises
    ValueError for non-JPEG payloads and NotImplementedError for
    non-baseline variants, so callers can fall back. ``fast`` selects
    the flat-table entropy reader (default); ``fast=False`` keeps the
    per-bit reference reader — identical output, used as the parity
    oracle in tests."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    scan = None
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
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
        elif marker == 0xC0:  # SOF0 baseline
            prec, h_img, w_img, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = (h_img, w_img, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            break
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h_img, w_img, comps = frame
    if len(comps) not in (1, 3):
        raise NotImplementedError("only greyscale / YCbCr JPEG supported")
    if len(scan) != len(comps):
        # spec-legal non-interleaved multi-scan baseline (first SOS a
        # component subset) — out of scope for this single-scan decoder
        raise NotImplementedError("multi-scan baseline JPEG unsupported")

    segs, _ = _entropy_segments(payload, pos)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))

    # per component: SPARSE coefficient triples (block, zigzag-k, value)
    # accumulated in plain Python lists — the per-symbol loop touches no
    # numpy at all; scatter + dequantize + dezigzag + IDCT happen ONCE
    # per component as whole-array ops (per-block numpy dispatch was the
    # decode bottleneck after the reader went table-driven)
    sp_b: list[list[int]] = [[] for _ in comps]
    sp_k: list[list[int]] = [[] for _ in comps]
    sp_v: list[list[int]] = [[] for _ in comps]
    tbl_for = {}
    for (cid, tdta), comp in zip(scan, comps):
        if cid != comp["id"]:
            # the MCU interleave below follows SOF order; a scan ordered
            # differently would need reordered decode — out of scope
            raise NotImplementedError("SOS component order differs from SOF")
        tbl_for[cid] = (huff[(0, tdta >> 4)], huff[(1, tdta & 15)])

    mk_reader = _FastBitReader if fast else _BitReader

    def huffd(rd, tables) -> int:
        return rd.huff(tables["flat"]) if fast else _huff_decode(rd, tables["dict"])

    seg_i = 0
    br = mk_reader(segs[0])
    preds = [0] * len(comps)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            br = mk_reader(segs[seg_i])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, comp in enumerate(comps):
            dc_t, ac_t = tbl_for[comp["id"]]
            bx_per_row = mcux * comp["h"]
            eb, ek, ev = sp_b[ci], sp_k[ci], sp_v[ci]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    bpos = (my * comp["v"] + by) * bx_per_row + (mx * comp["h"] + bx)
                    t = huffd(br, dc_t)
                    diff = _extend(br.read_bits(t), t) if t else 0
                    preds[ci] += diff
                    if preds[ci]:
                        eb.append(bpos)
                        ek.append(0)
                        ev.append(preds[ci])
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

    planes = []
    for ci, comp in enumerate(comps):
        by, bx = mcuy * comp["v"], mcux * comp["h"]
        zzmat = np.zeros((by * bx, 64), dtype=np.float64)
        if sp_b[ci]:
            zzmat[sp_b[ci], sp_k[ci]] = sp_v[ci]
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


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w)/(h, w, 1) grey or (h, w, 3) RGB uint8 → baseline
    JPEG bytes. Valid and self-describing (tables in DQT/DHT); used for
    fixtures and round-trip tests, not optimized for ratio.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (DC predictors reset) — real web JPEGs use restarts,
    and this exercises the decoder's segment-split path."""
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
    bw = _BitWriter()
    preds = [0] * nc
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.pad_to_byte()
            bw.raw_marker(
                bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
            )
            preds = [0] * nc
        my, mx = divmod(mcu, mcux)
        for ci, (sh, sv) in enumerate(samp):
            bx_per_row = mcux * sh
            for by in range(sv):
                for bx in range(sh):
                    bi = (my * sv + by) * bx_per_row + (mx * sh + bx)
                    zz = comp_blocks[ci][bi]
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    t = _category(diff)
                    code, ln = dc_codes[t]
                    bw.write(code, ln)
                    if t:
                        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
                    run = 0
                    nz = np.flatnonzero(zz[1:])
                    last = nz[-1] + 1 if nz.size else 0
                    for k in range(1, last + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = ac_codes[0xF0]
                            bw.write(c, ln)
                            run -= 16
                        s = _category(v)
                        c, ln = ac_codes[(run << 4) | s]
                        bw.write(c, ln)
                        bw.write(v if v > 0 else v + (1 << s) - 1, s)
                        run = 0
                    if last < 63:
                        c, ln = ac_codes[0x00]
                        bw.write(c, ln)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(q_lum[_ZZ].astype(np.uint8)))
    if nc == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(q_chr[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h_img, w_img, nc)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for tc in (0, 1):
        bits, vals = (
            (_ENC_DC_BITS, _ENC_DC_VALS) if tc == 0 else (_ENC_AC_BITS, _ENC_AC_VALS)
        )
        out += seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
