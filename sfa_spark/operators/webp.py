"""Pure-stdlib WebP-lossless (VP8L) codec for the multimodal decode seam.

WebP is the third-most-served web image format; the container bundles
no image library, so — like the PNG/JPEG/GIF modules — this implements
the PUBLIC "WebP Lossless Bitstream Specification" (RFC 9649 §3 /
Google VP8L spec) from scratch: RIFF/VP8X container walking, the
LSB-first bit reader, canonical prefix codes (simple 1/2-symbol and
full code-length-coded forms with 16/17/18 repeat codes), meta prefix
(huffman-image) group selection, the LZ77 length/distance prefix
scheme with the 120-entry close-neighborhood distance-to-plane
mapping, the hashed color cache, and all four transforms with their
inverses applied in reverse stream order: predictor (all 14 modes,
incl. Select and the ClampAddSubtract pair with C-truncating /2),
cross-color (signed 3.5 fixed-point deltas), subtract-green, and
color-indexing with sub-byte index packing.

``decode_webp`` handles lossless files (VP8L directly or inside a
VP8X extended container). Lossy VP8 raises NotImplementedError — the
injection seam stays open for it — BUT ``webp_alpha_plane`` decodes
the ALPH chunk of lossy-with-alpha files, whose compression method 1
is this same VP8L entropy stream (headerless, alpha in the green
channel, optional horizontal/vertical/gradient pre-filters): real
libwebp-encoded alpha planes exercise this decoder end-to-end.

The encoder exists for fixtures and round-trip tests: it emits valid
VP8L streams (flat complete canonical codes — correctness over ratio)
with optional subtract-green, fixed-mode predictor, color-indexing
(packed), color cache, and repeated-row LZ77 copies through the
distance-plane code, so every decoder path round-trips against it.

Scale note: entropy decode is a per-symbol Python loop — inherent to
prefix codes' sequential dependency, same as the GIF LZW and JPEG
Huffman loops; all transform inverses except the (sequential by
definition) predictor are whole-array numpy. Decode is O(pixels); fine
for the mapInPandas batch kernels this feeds, where images in a batch
decode independently across partitions.

The 120-entry distance mapping is generated, not transcribed: the
spec's table is exactly all (dx, dy) close offsets sorted by squared
distance, then |dx|, then positive dx first — pinned in tests against
hand-checked spec entries.
"""

from __future__ import annotations

import struct

import numpy as np

# order in which code-length-code lengths are stored (RFC 9649 §3.7.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_NUM_LENGTH_CODES = 24
_NUM_DIST_CODES = 40
_CACHE_MUL = 0x1E35A7BD


def _plane_codes() -> list[tuple[int, int]]:
    """The spec's 120 close-neighborhood (dx, dy) offsets: sorted by
    dx²+dy², ties by |dx| ascending, then dx>0 before dx<0."""
    cand = [
        (dx, dy)
        for dy in range(16)
        for dx in range(-7, 9)
        if not (dy == 0 and dx <= 0)
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return cand[:120]


_PLANE = _plane_codes()


class _Bits:
    """LSB-first bit reader over bytes (VP8L convention) with a
    buffered accumulator so the flat-table symbol reader can peek a
    whole code-length window in one mask (zero-padded past the end;
    ``consume`` still errors on real truncation because only actual
    stream bits count toward the buffer)."""

    __slots__ = ("d", "nd", "bytepos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.d = data
        self.nd = len(data)
        self.bytepos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need and self.bytepos < self.nd:
            self.acc |= self.d[self.bytepos] << self.nbits
            self.bytepos += 1
            self.nbits += 8

    def read(self, nbits: int) -> int:
        if self.nbits < nbits:
            self._fill(nbits)
            if self.nbits < nbits:
                raise ValueError("VP8L bitstream truncated")
        v = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.nbits -= nbits
        return v

    def peek(self, nbits: int) -> int:
        if self.nbits < nbits:
            self._fill(nbits)
        return self.acc & ((1 << nbits) - 1)

    def consume(self, nbits: int) -> None:
        if self.nbits < nbits:
            raise ValueError("VP8L bitstream truncated")
        self.acc >>= nbits
        self.nbits -= nbits


_MAX_CODE_LEN = 15  # VP8L caps prefix code lengths at 15 bits

# flipped to False in tests to run the per-bit parity-oracle reader
_FAST_TABLES = True


def _build_tree(lengths: list[int]):
    """Canonical prefix code from code lengths → decode table.

    Returns ('single', sym) for a one-symbol code (consumes 0 bits);
    otherwise ('flat', table, max_len) where table is a 2^max_len list
    indexed by the NEXT max_len bits of the stream (LSB-first window,
    so each canonical code is bit-reversed into every slot sharing its
    prefix — one peek + one list index per symbol), entries packed as
    (symbol << 4) | code_len; or the per-bit ('walk', dict, max_len)
    parity-oracle form when ``_FAST_TABLES`` is off. Codes are
    canonical in increasing symbol order per length (DEFLATE rule);
    raises on incomplete/oversubscribed codes."""
    nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
    if not nz:
        raise ValueError("empty prefix code")
    if len(nz) == 1:
        return ("single", nz[0][1])
    max_len = max(l for l, _ in nz)
    if max_len > _MAX_CODE_LEN:
        raise ValueError("VP8L prefix code length exceeds 15")
    bl_count = [0] * (max_len + 1)
    for l, _ in nz:
        bl_count[l] += 1
    if sum(c << (max_len - l) for l, c in enumerate(bl_count) if l) != (1 << max_len):
        raise ValueError("prefix code not complete")
    next_code = [0] * (max_len + 1)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    if not _FAST_TABLES:
        table: dict[tuple[int, int], int] = {}
        for sym, l in enumerate(lengths):
            if l > 0:
                table[(l, next_code[l])] = sym
                next_code[l] += 1
        return ("walk", table, max_len)
    flat = [0] * (1 << max_len)
    for sym, l in enumerate(lengths):
        if l > 0:
            c = next_code[l]
            next_code[l] += 1
            rev = 0
            for i in range(l):
                rev |= ((c >> i) & 1) << (l - 1 - i)
            entry = (sym << 4) | l
            step = 1 << l
            for j in range(rev, 1 << max_len, step):
                flat[j] = entry
    return ("flat", flat, max_len)


def _explicit_pair(s0: int, s1: int):
    """Two-symbol simple code: first-read symbol gets bit 0 (explicit,
    NOT canonical)."""
    if _FAST_TABLES:
        return ("flat", [(s0 << 4) | 1, (s1 << 4) | 1], 1)
    return ("walk", {(1, 0): s0, (1, 1): s1}, 1)


def _read_sym(br: _Bits, tree) -> int:
    kind = tree[0]
    if kind == "single":
        return tree[1]
    if kind == "flat":
        e = tree[1][br.peek(tree[2])]
        br.consume(e & 15)
        return e >> 4
    table, max_len = tree[1], tree[2]
    code = 0
    for length in range(1, max_len + 1):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid prefix code in VP8L stream")


def _read_code_lengths(br: _Bits, cl_tree, alphabet: int) -> list[int]:
    """Code lengths for one alphabet via the code-length code
    (literals 0-15; 16 = repeat prev nonzero, 17/18 = zero runs)."""
    if br.read(1):  # an explicit max symbol count caps the reads
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet:
            raise ValueError("VP8L max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    symbol = 0
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code = _read_sym(br, cl_tree)
        if code < 16:
            lengths[symbol] = code
            symbol += 1
            if code:
                prev = code
        else:
            extra, offset = ((2, 3), (3, 3), (7, 11))[code - 16]
            repeat = br.read(extra) + offset
            if symbol + repeat > alphabet:
                raise ValueError("VP8L code-length repeat overruns alphabet")
            fill = prev if code == 16 else 0
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _Bits, alphabet: int):
    """One prefix code: simple (1-2 explicit symbols) or full form."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        s0 = br.read(8) if br.read(1) else br.read(1)
        if s0 >= alphabet:
            raise ValueError("VP8L simple-code symbol out of range")
        if num_symbols == 1:
            return ("single", s0)
        s1 = br.read(8)
        if s1 >= alphabet:
            raise ValueError("VP8L simple-code symbol out of range")
        return _explicit_pair(s0, s1)
    cl_lengths = [0] * 19
    num_codes = br.read(4) + 4
    for i in range(num_codes):
        cl_lengths[_CLC_ORDER[i]] = br.read(3)
    cl_tree = _build_tree(cl_lengths)
    return _build_tree(_read_code_lengths(br, cl_tree, alphabet))


def _prefix_value(br: _Bits, code: int) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649 §3.6.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _div_ceil(a: int, b: int) -> int:
    return (a + b - 1) // b


def _decode_image_stream(br: _Bits, w: int, h: int, level0: bool) -> np.ndarray:
    """Entropy-coded image (optionally with transforms at level 0) →
    (h, w) uint32 ARGB."""
    transforms = []
    seen = set()
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("VP8L transform repeated")
            seen.add(ttype)
            if ttype in (0, 1):  # predictor / cross-color
                bits = br.read(3) + 2
                sub = _decode_image_stream(
                    br, _div_ceil(w, 1 << bits), _div_ceil(h, 1 << bits), False
                )
                transforms.append(("pred" if ttype == 0 else "color", bits, sub))
            elif ttype == 2:
                transforms.append(("sgreen",))
            else:  # color indexing
                n = br.read(8) + 1
                deltas = _decode_image_stream(br, n, 1, False)[0]
                # entries are per-channel deltas from the previous entry
                ch = np.stack(
                    [(deltas >> s) & 0xFF for s in (24, 16, 8, 0)]
                ).astype(np.uint8)
                pal = np.cumsum(ch, axis=1, dtype=np.uint8)
                palette = (
                    (pal[0].astype(np.uint32) << 24)
                    | (pal[1].astype(np.uint32) << 16)
                    | (pal[2].astype(np.uint32) << 8)
                    | pal[3]
                )
                width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
                transforms.append(("palette", width_bits, palette, w))
                w = _div_ceil(w, 1 << width_bits)

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    hbits = 0
    ngroups = 1
    if level0 and br.read(1):
        hbits = br.read(3) + 2
        meta = _decode_image_stream(
            br, _div_ceil(w, 1 << hbits), _div_ceil(h, 1 << hbits), False
        )
        ngroups = int(((meta >> 8) & 0xFFFF).max()) + 1

    green_alpha = 256 + _NUM_LENGTH_CODES + cache_size
    groups = []
    for _ in range(ngroups):
        groups.append(
            tuple(
                _read_prefix_code(br, a)
                for a in (green_alpha, 256, 256, 256, _NUM_DIST_CODES)
            )
        )

    cache = [0] * cache_size if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    meta_idx = ((meta >> 8) & 0xFFFF).tolist() if meta is not None else None

    n = w * h
    out = [0] * n
    pos = 0
    trees = groups[0]
    while pos < n:
        if meta_idx is not None:
            trees = groups[meta_idx[(pos // w) >> hbits][(pos % w) >> hbits]]
        s = _read_sym(br, trees[0])
        if s < 256:
            r = _read_sym(br, trees[1])
            b = _read_sym(br, trees[2])
            a = _read_sym(br, trees[3])
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((_CACHE_MUL * px) & 0xFFFFFFFF) >> cache_shift] = px
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, _read_sym(br, trees[4]))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _PLANE[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[((_CACHE_MUL * px) & 0xFFFFFFFF) >> cache_shift] = px
        else:
            if cache is None:
                raise ValueError("VP8L cache symbol without a color cache")
            out[pos] = cache[s - (256 + _NUM_LENGTH_CODES)]
            pos += 1

    img = np.array(out, dtype=np.uint32).reshape(h, w)
    for t in reversed(transforms):
        if t[0] == "pred":
            img = _inv_predictor(img, t[1], t[2])
        elif t[0] == "color":
            img = _inv_color(img, t[1], t[2])
        elif t[0] == "sgreen":
            img = _inv_subtract_green(img)
        else:
            img = _inv_palette(img, t[1], t[2], t[3])
    return img


# ---------------------------------------------------------------------------
# inverse transforms

def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (r << 16) | b


def _inv_palette(
    img: np.ndarray, width_bits: int, palette: np.ndarray, orig_w: int
) -> np.ndarray:
    g = (img >> 8) & 0xFF
    if width_bits == 0:
        idx = g[:, :orig_w]
    else:
        ppb = 1 << width_bits
        bpp = 8 >> width_bits
        xs = np.arange(orig_w)
        idx = (g[:, xs >> width_bits] >> ((xs & (ppb - 1)) * bpp)) & ((1 << bpp) - 1)
    pal = np.zeros(256, dtype=np.uint32)  # out-of-range indices → transparent black
    pal[: len(palette)] = palette
    return pal[idx]


def _inv_color(img: np.ndarray, bits: int, sub: np.ndarray) -> np.ndarray:
    h, w = img.shape
    cte = sub[np.arange(h) >> bits][:, np.arange(w) >> bits]

    def s8(v: np.ndarray) -> np.ndarray:  # uint8 channel → signed int32
        return v.astype(np.uint8).astype(np.int8).astype(np.int32)

    g2r = s8(cte & 0xFF)
    g2b = s8((cte >> 8) & 0xFF)
    r2b = s8((cte >> 16) & 0xFF)
    g = s8((img >> 8) & 0xFF)
    r = (((img >> 16) & 0xFF).astype(np.int64) + ((g2r * g) >> 5)) & 0xFF
    b = ((img & 0xFF).astype(np.int64) + ((g2b * g) >> 5) + ((r2b * s8(r)) >> 5)) & 0xFF
    return (
        (img & np.uint32(0xFF00FF00))
        | (r.astype(np.uint32) << 16)
        | b.astype(np.uint32)
    )


def _avg2(a: int, b: int) -> int:
    """Per-channel (a+b)>>1 on packed ARGB (carry-safe SWAR)."""
    return (a & b) + (((a ^ b) & 0xFEFEFEFE) >> 1)


def _add_px(a: int, b: int) -> int:
    """Per-channel (a+b)&0xFF on packed ARGB."""
    return (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00) | (
        ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
    )


def _chans(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _select(l: int, t: int, tl: int) -> int:
    lc, tc, tlc = _chans(l), _chans(t), _chans(tl)
    p_l = sum(abs(tc[i] - tlc[i]) for i in range(4))
    p_t = sum(abs(lc[i] - tlc[i]) for i in range(4))
    return l if p_l < p_t else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        d = a - ((tl >> sh) & 0xFF)
        # C truncating division: -3/2 == -1
        v = a + (d // 2 if d >= 0 else -((-d) // 2))
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


_PREDICTORS = (
    lambda l, t, tl, tr: 0xFF000000,
    lambda l, t, tl, tr: l,
    lambda l, t, tl, tr: t,
    lambda l, t, tl, tr: tr,
    lambda l, t, tl, tr: tl,
    lambda l, t, tl, tr: _avg2(_avg2(l, tr), t),
    lambda l, t, tl, tr: _avg2(l, tl),
    lambda l, t, tl, tr: _avg2(l, t),
    lambda l, t, tl, tr: _avg2(tl, t),
    lambda l, t, tl, tr: _avg2(t, tr),
    lambda l, t, tl, tr: _avg2(_avg2(l, tl), _avg2(t, tr)),
    lambda l, t, tl, tr: _select(l, t, tl),
    lambda l, t, tl, tr: _clamp_add_sub_full(l, t, tl),
    lambda l, t, tl, tr: _clamp_add_sub_half(l, t, tl),
)


def _pred_forward(l: int, t: int, tl: int, tr: int, mode: int) -> int:
    if mode >= len(_PREDICTORS):
        raise ValueError("bad VP8L predictor mode")
    return _PREDICTORS[mode](l, t, tl, tr)


def _inv_predictor_ref(img: np.ndarray, bits: int, sub: np.ndarray) -> np.ndarray:
    """Per-pixel reference inverse (parity oracle for the span-
    vectorized path): each pixel's prediction reads already-
    reconstructed neighbors (top-right of the last column is the
    current row's first pixel — the spec's contiguous addressing)."""
    h, w = img.shape
    modes = ((sub >> 8) & 0xFF).tolist()
    a = img.ravel().tolist()
    for pos in range(h * w):
        y, x = divmod(pos, w)
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = a[pos - 1]
        elif x == 0:
            pred = a[pos - w]
        else:
            l = a[pos - 1]
            t = a[pos - w]
            tl = a[pos - w - 1]
            tr = a[pos - w + 1]  # x==w-1 → row y's first pixel, per spec
            pred = _pred_forward(l, t, tl, tr, modes[y >> bits][x >> bits])
        a[pos] = _add_px(a[pos], pred)
    return np.array(a, dtype=np.uint32).reshape(h, w)


def _add_px_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized per-channel (a+b)&0xFF on packed-ARGB uint32 arrays
    (same two-lane SWAR as the scalar ``_add_px``)."""
    hi = np.uint32(0xFF00FF00)
    lo = np.uint32(0x00FF00FF)
    return (((a & hi) + (b & hi)) & hi) | (((a & lo) + (b & lo)) & lo)


def _avg2_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a & b) + (((a ^ b) & np.uint32(0xFEFEFEFE)) >> 1)


# predictor modes whose inputs come only from the previous (finished)
# row — whole block-spans of them vectorize; the rest depend on L and
# stay sequential in x
_ROW_VEC_MODES = {0, 2, 3, 4, 8, 9}


def _inv_predictor(img: np.ndarray, bits: int, sub: np.ndarray) -> np.ndarray:
    """Span-vectorized predictor inverse: row 0 is a per-channel
    cumsum; within a row, each block-span whose mode reads only the
    previous row (black/T/TR/TL and their averages) is one whole-array
    SWAR add, and only L-dependent modes walk pixel-by-pixel. Parity
    with ``_inv_predictor_ref`` is fuzz-tested across all 14 modes."""
    h, w = img.shape
    out = img.copy()
    # row 0: forced L chain (+ black alpha at the origin) = cumsum mod 256
    row0 = np.uint32(0)
    for shift in (24, 16, 8, 0):
        ch = (((out[0] >> shift) & 0xFF).cumsum() + (0xFF if shift == 24 else 0)) & 0xFF
        row0 = row0 | (ch.astype(np.uint32) << shift)
    out[0] = row0
    if h == 1:
        return out
    modes = ((sub >> 8) & 0xFF).tolist()
    if any(m >= len(_PREDICTORS) for mr in modes for m in mr):
        raise ValueError("bad VP8L predictor mode")
    for y in range(1, h):
        prev = out[y - 1]
        row = out[y]
        row[0] = _add_px(int(row[0]), int(prev[0]))  # forced T
        mrow = modes[y >> bits]
        x = 1
        while x < w:
            # coalesce consecutive blocks of the same vector-ness into
            # one run so numpy calls amortize over whole rows, not
            # 16-pixel block spans
            isvec = mrow[x >> bits] in _ROW_VEC_MODES
            x1 = min(w, ((x >> bits) + 1) << bits)
            while x1 < w and (mrow[x1 >> bits] in _ROW_VEC_MODES) == isvec:
                x1 = min(w, ((x1 >> bits) + 1) << bits)
            if isvec:
                distinct = sorted(
                    {mrow[b] for b in range(x >> bits, ((x1 - 1) >> bits) + 1)}
                )
                # numpy only pays off on long runs; short or mode-mixed
                # runs go through the scalar loop below
                isvec = (x1 - x) >= (24 if len(distinct) == 1 else 96)
            if isvec:

                def cand(m: int) -> np.ndarray:
                    if m == 0:
                        return np.full(x1 - x, 0xFF000000, dtype=np.uint32)
                    if m == 2:
                        return prev[x:x1]
                    if m == 4:
                        return prev[x - 1 : x1 - 1]
                    if m == 8:
                        return _avg2_vec(prev[x - 1 : x1 - 1], prev[x:x1])
                    tr = prev[x + 1 : x1 + 1]
                    if x1 == w:  # last column's TR is this row's first pixel
                        tr = np.append(tr, row[0])
                    return tr if m == 3 else _avg2_vec(prev[x:x1], tr)

                if len(distinct) == 1:
                    pred = cand(distinct[0])
                else:
                    marr = np.asarray(mrow, dtype=np.int32)[np.arange(x, x1) >> bits]
                    pred = np.select(
                        [marr == m for m in distinct], [cand(m) for m in distinct]
                    ).astype(np.uint32)
                row[x:x1] = _add_px_vec(row[x:x1], pred)
            else:
                pv = prev[x - 1 : min(x1 + 1, w)].tolist()
                if x1 == w:
                    pv.append(0)  # placeholder; tr overridden at the edge
                res = row[x:x1].tolist()
                l = int(row[x - 1])
                r0 = int(row[0])
                preds = _PREDICTORS
                for i in range(x1 - x):
                    tr = r0 if x + i == w - 1 else pv[i + 2]
                    l = _add_px(
                        res[i], preds[mrow[(x + i) >> bits]](l, pv[i + 1], pv[i], tr)
                    )
                    res[i] = l
                row[x:x1] = res
            x = x1
    return out


# ---------------------------------------------------------------------------
# container + public decode API

def _riff_chunks(payload: bytes) -> list[tuple[bytes, bytes]]:
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    chunks = []
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + sz]
        if len(data) < sz:
            raise ValueError("truncated WebP chunk")
        chunks.append((tag, data))
        pos += 8 + sz + (sz & 1)  # RIFF chunks are even-aligned
    return chunks


def _argb_to_image(img: np.ndarray) -> np.ndarray:
    a = ((img >> 24) & 0xFF).astype(np.uint8)
    rgb = np.dstack(
        [((img >> s) & 0xFF).astype(np.uint8) for s in (16, 8, 0)]
    )
    if bool((a != 255).any()):
        return np.dstack([rgb, a])
    return rgb


def decode_vp8l(data: bytes) -> np.ndarray:
    """Bare VP8L bitstream (the VP8L chunk payload) → (h, w, 3|4) uint8."""
    br = _Bits(data)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    return _argb_to_image(_decode_image_stream(br, w, h, True))


def decode_webp(payload: bytes, meta=None) -> np.ndarray:
    """Decode a lossless WebP → (h, w, 3) uint8, or (h, w, 4) when any
    pixel is non-opaque. Signature matches the multimodal
    ``decoder(payload, meta)`` seam (meta ignored — the header is
    authoritative). Lossy VP8 raises NotImplementedError so the seam
    falls through to the documented fake; corrupt/non-WebP payloads
    raise ValueError."""
    chunks = _riff_chunks(payload)
    for tag, data in chunks:
        if tag == b"VP8L":
            return decode_vp8l(data)
    if any(tag == b"VP8 " for tag, _ in chunks):
        raise NotImplementedError("lossy VP8 decode is the documented seam")
    raise ValueError("WebP container has no VP8L image chunk")


def _unfilter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    """ALPH pre-filters (RFC 9649 §2.4): none/horizontal/vertical/
    gradient, borders falling back to the available neighbor."""
    if method == 0:
        return plane
    h, w = plane.shape
    out = plane.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0
            elif method == 1:  # horizontal
                pred = out[y - 1, 0] if x == 0 else out[y, x - 1]
            elif method == 2:  # vertical
                pred = out[y, x - 1] if y == 0 else out[y - 1, x]
            else:  # gradient
                if y == 0:
                    pred = out[y, x - 1]
                elif x == 0:
                    pred = out[y - 1, x]
                else:
                    g = int(out[y, x - 1]) + int(out[y - 1, x]) - int(out[y - 1, x - 1])
                    pred = 0 if g < 0 else 255 if g > 255 else g
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def webp_alpha_plane(payload: bytes) -> np.ndarray:
    """Decode the ALPH chunk of an extended (VP8X) WebP → (h, w) uint8
    alpha. Compression method 1 is a headerless VP8L image stream with
    alpha in the green channel — real libwebp-encoded files exercise
    the full entropy decoder here even when their color data is lossy."""
    chunks = _riff_chunks(payload)
    vp8x = next((d for t, d in chunks if t == b"VP8X"), None)
    alph = next((d for t, d in chunks if t == b"ALPH"), None)
    if vp8x is None or alph is None or len(vp8x) < 10 or not alph:
        raise ValueError("WebP has no VP8X+ALPH alpha channel")
    w = 1 + int.from_bytes(vp8x[4:7], "little")
    h = 1 + int.from_bytes(vp8x[7:10], "little")
    head = alph[0]
    compression = head & 0x03
    filt = (head >> 2) & 0x03
    if compression == 0:
        if len(alph) - 1 < w * h:
            raise ValueError("raw ALPH data truncated")
        plane = np.frombuffer(alph[1 : 1 + w * h], dtype=np.uint8).reshape(h, w)
        return _unfilter_alpha(plane, filt)
    if compression != 1:
        raise ValueError("unknown ALPH compression method")
    img = _decode_image_stream(_Bits(alph[1:]), w, h, True)
    return _unfilter_alpha(((img >> 8) & 0xFF).astype(np.uint8), filt)


# ---------------------------------------------------------------------------
# fixture encoder

class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:  # LSB-first
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:  # MSB-first
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.out) + (bytes([self.acc & 0xFF]) if self.nbits else b"")
        return out


def _flat_lengths(alphabet: int) -> list[int]:
    """Complete canonical code covering every symbol: 2^L-alphabet
    symbols at L-1 bits, the rest at L (all at L when a power of two)."""
    level = max(1, (alphabet - 1).bit_length())
    n_short = (1 << level) - alphabet
    return [level - 1 if s < n_short and level > 1 else level for s in range(alphabet)]


def _encoder_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical (mirror of _build_tree)."""
    max_len = max(lengths)
    bl_count = [0] * (max_len + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for sym, l in enumerate(lengths):
        if l:
            out[sym] = (next_code[l], l)
            next_code[l] += 1
    return out


def _write_flat_tree(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit one prefix code in the full (code-length-coded) form for a
    run-structured ``lengths`` list (at most two distinct values)."""
    runs = []
    for l in lengths:
        if runs and runs[-1][0] == l:
            runs[-1][1] += 1
        else:
            runs.append([l, 1])
    used = sorted({l for l, _ in runs})
    # code-length-code lengths: one value → {v:1, 16:1}; two → {v1:1, v2:2, 16:2}
    clc = [0] * 19
    if len(used) == 1:
        clc[used[0]] = 1
        clc[16] = 1
    else:
        clc[used[0]] = 1
        clc[used[1]] = 2
        clc[16] = 2
    max_idx = max(_CLC_ORDER.index(s) for s in (*used, 16))
    bw.write(0, 1)  # not simple
    bw.write(max_idx + 1 - 4, 4)
    for i in range(max_idx + 1):
        bw.write(clc[_CLC_ORDER[i]], 3)
    codes = _encoder_codes(clc)
    bw.write(0, 1)  # no explicit max_symbol
    for val, count in runs:
        c, ln = codes[val]
        bw.write_code(c, ln)
        rem = count - 1
        while rem:
            if rem < 3:
                bw.write_code(c, ln)
                rem -= 1
            else:
                r = min(6, rem)
                if rem - r in (1, 2) and r > 3:
                    r -= 1
                rc, rln = codes[16]
                bw.write_code(rc, rln)
                bw.write(r - 3, 2)
                rem -= r


def _len_dist_code(value: int) -> tuple[int, int, int]:
    """value ≥ 1 → (prefix code, extra bits, extra value)."""
    if value <= 4:
        return value - 1, 0, 0
    code = 4
    while True:
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            return code, extra, value - offset - 1
        code += 1


def _write_entropy_image(
    bw: _BitWriter,
    px: list[int],
    w: int,
    level0: bool,
    cache_bits: int = 0,
    row_copy: bool = False,
) -> None:
    """Literal/cache/row-copy emission with flat complete trees."""
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if level0:
        bw.write(0, 1)  # no meta prefix image
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha = 256 + _NUM_LENGTH_CODES + cache_size
    lens = [_flat_lengths(a) for a in (green_alpha, 256, 256, 256, _NUM_DIST_CODES)]
    for l in lens:
        _write_flat_tree(bw, l)
    codes = [_encoder_codes(l) for l in lens]
    cache = [None] * cache_size
    shift = 32 - cache_bits if cache_bits else 0

    def emit(sym: int, tree: int) -> None:
        c, ln = codes[tree][sym]
        bw.write_code(c, ln)

    n = len(px)
    pos = 0
    while pos < n:
        if (
            row_copy
            and pos >= w
            and pos % w == 0
            and pos + w <= n
            and px[pos : pos + w] == px[pos - w : pos]
        ):
            lc, le, lv = _len_dist_code(w)
            emit(256 + lc, 0)
            if le:
                bw.write(lv, le)
            # distance = one row up = plane code (0,1) = index 1 → value 1
            dc, de, dv = _len_dist_code(1)
            emit(dc, 4)
            if de:
                bw.write(dv, de)
            for i in range(w):  # decoder inserts copied pixels — mirror it
                p = px[pos + i]
                if cache_size:
                    cache[((_CACHE_MUL * p) & 0xFFFFFFFF) >> shift] = p
            pos += w
            continue
        p = px[pos]
        if cache_size:
            key = ((_CACHE_MUL * p) & 0xFFFFFFFF) >> shift
            if cache[key] == p:
                emit(256 + _NUM_LENGTH_CODES + key, 0)
                pos += 1
                continue
            cache[key] = p
        emit((p >> 8) & 0xFF, 0)
        emit((p >> 16) & 0xFF, 1)
        emit(p & 0xFF, 2)
        emit((p >> 24) & 0xFF, 3)
        pos += 1


def encode_webp_lossless(
    img: np.ndarray,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    row_copy: bool = False,
) -> bytes:
    """Encode (h, w, 3|4) uint8 → a valid lossless WebP (RIFF+VP8L).

    Fixture encoder: flat complete prefix codes, optional transforms
    (``palette`` is mutually exclusive with the arithmetic transforms),
    optional color cache and repeated-row LZ77 copies — enough surface
    to round-trip every decoder path. Correctness over ratio."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("encode_webp_lossless needs (h, w, 3|4) uint8")
    if palette and (subtract_green or predictor_mode is not None):
        raise ValueError("palette transform excludes arithmetic transforms")
    h, w, c = img.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions out of range")
    a = img[:, :, 3].astype(np.uint32) if c == 4 else np.full((h, w), 255, np.uint32)
    argb = (
        (a << 24)
        | (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    )

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if c == 4 else 0, 1)
    bw.write(0, 3)  # version

    cur = argb
    cur_w = w
    if palette:
        flat = cur.ravel()
        pal, inv = np.unique(flat, return_inverse=True)
        if len(pal) > 256:
            raise ValueError("palette transform needs ≤256 distinct colors")
        n = len(pal)
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n - 1, 8)
        prev = np.concatenate([[np.uint32(0)], pal[:-1]])
        deltas = [
            int(
                ((((p >> 24) - (q >> 24)) & 0xFF) << 24)
                | (((((p >> 16) & 0xFF) - ((q >> 16) & 0xFF)) & 0xFF) << 16)
                | (((((p >> 8) & 0xFF) - ((q >> 8) & 0xFF)) & 0xFF) << 8)
                | (((p & 0xFF) - (q & 0xFF)) & 0xFF)
            )
            for p, q in zip(pal.tolist(), prev.tolist())
        ]
        _write_entropy_image(bw, deltas, n, False)
        width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        idx = inv.reshape(h, w).astype(np.uint32)
        if width_bits:
            ppb = 1 << width_bits
            bpp = 8 >> width_bits
            packed_w = _div_ceil(w, ppb)
            packed = np.zeros((h, packed_w), dtype=np.uint32)
            for x in range(w):
                packed[:, x >> width_bits] |= idx[:, x] << ((x % ppb) * bpp)
            cur = packed << 8
            cur_w = packed_w
        else:
            cur = idx << 8
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            cur = _fwd_subtract_green(cur)
        if predictor_mode is not None:
            bits = 4  # 16×16 blocks
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(bits - 2, 3)
            sub_w = _div_ceil(cur_w, 1 << bits)
            sub_h = _div_ceil(h, 1 << bits)
            sub_px = [0xFF000000 | (predictor_mode << 8)] * (sub_w * sub_h)
            _write_entropy_image(bw, sub_px, sub_w, False)
            cur = _fwd_predictor(cur, bits, predictor_mode)
    bw.write(0, 1)  # end of transforms

    _write_entropy_image(
        bw, cur.ravel().tolist(), cur_w, True, cache_bits=cache_bits,
        row_copy=row_copy,
    )
    stream = bw.bytes()
    vp8l = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _fwd_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) - g) & 0xFF
    b = ((img & 0xFF) - g) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (r << 16) | b


def _sub_px(a: int, b: int) -> int:
    """Per-channel (a-b)&0xFF on packed ARGB."""
    return (((a | 0x01000100) - (b & 0x00FF00FF)) & 0x00FF00FF) | (
        (((a >> 8) | 0x01000100) - ((b >> 8) & 0x00FF00FF)) & 0x00FF00FF
    ) << 8


def _fwd_predictor(img: np.ndarray, bits: int, mode: int) -> np.ndarray:
    h, w = img.shape
    a = img.ravel().tolist()
    out = [0] * (h * w)
    for pos in range(h * w):
        y, x = divmod(pos, w)
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = a[pos - 1]
        elif x == 0:
            pred = a[pos - w]
        else:
            pred = _pred_forward(
                a[pos - 1], a[pos - w], a[pos - w - 1], a[pos - w + 1], mode
            )
        out[pos] = _sub_px(a[pos], pred)
    return np.array(out, dtype=np.uint32).reshape(h, w)
