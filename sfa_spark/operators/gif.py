"""Pure-stdlib GIF (87a/89a) codec for the multimodal decode seam.

GIF remains a common web image format (and the standard container for
short animations); the container bundles no image library, so — like
the PNG and JPEG modules — this implements the PUBLIC spec (GIF89a,
CompuServe 1989 / W3C note) from scratch: logical screen descriptor,
global/local color tables, Graphic Control Extensions (transparency,
disposal), interlaced row order, and variable-width LSB-first LZW with
clear/EOI codes, deferred table growth at 4096, and the GIF width-bump
convention (width grows when the table reaches 2^width, AFTER the
append — the non-"early-change" variant; a published 43-byte 1×1
transparent GIF is pinned in the tests as an external decode vector).

``decode_gif`` returns the FIRST frame composited onto the logical
screen (what single-frame consumers and thumbnailers show): (h, w, 3)
uint8 when the frame is opaque, (h, w, 4) when a transparency index is
declared. ``gif_frame_count`` counts image descriptors so the
frame-sampling planner can treat animated GIFs like tiny videos.

The encoder exists for fixtures and round-trip tests: it emits valid
GIF89a (optionally interlaced, transparent, multi-frame) with a real
LZW compressor — correctness over ratio.

Scale note: LZW's dictionary dependency makes the per-code loop
inherently sequential, like the Huffman loops in the JPEG module; all
post-entropy work (palette lookup, interlace reorder, compositing) is
whole-array numpy. Decode is O(pixels) with small constants — fine for
the mapInPandas batch kernels this feeds.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096


def _lzw_decode(data: bytes, min_code: int, npix: int) -> np.ndarray:
    """Variable-width LSB-first GIF LZW → ``npix`` palette indices."""
    if not 2 <= min_code <= 11:
        raise ValueError("bad GIF LZW minimum code size")
    clear = 1 << min_code
    end_code = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev: bytes | None = None
    while True:
        while nbits < width and pos < n:
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        if nbits < width:
            break  # stream ended without EOI — tolerate, like browsers
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == end_code:
            break
        if code < len(table):
            entry = table[code]
            if not entry:
                raise ValueError("corrupt GIF LZW stream (reserved code)")
            if prev is not None and len(table) < _MAX_CODE:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None and len(table) < _MAX_CODE:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        # GIF convention: width grows when the table REACHES 2^width
        # (checked after the append), capped at 12 bits
        if len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
        if len(out) >= npix:
            break
    if len(out) < npix:
        raise ValueError("GIF LZW data underruns the image")
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    """GIF LZW compressor (clear emitted up front and on a full table;
    width-bump timing mirrors the decoder exactly)."""
    clear = 1 << min_code
    end_code = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int]:
        return {bytes([i]): i for i in range(clear)}, end_code + 1

    emit(clear)
    table, next_code = fresh()
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < _MAX_CODE:
            table[wk] = next_code
            # decoder bumps when its table (one entry behind ours at
            # read time) reaches 2^width — that is when the code we
            # just assigned equals 2^width
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            width = min_code + 1
            table, next_code = fresh()
        w = bytes([b])
    if w:
        emit(table[w])
    emit(end_code)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row output order of an interlaced GIF: data row i belongs at
    screen row order[i]."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (data, position after the 0-length terminator)."""
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-block chain")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + ln])
        if len(chunks[-1]) < ln:
            raise ValueError("truncated GIF sub-block")
        pos += ln


def decode_gif(payload: bytes, meta=None, frame: int = 0) -> np.ndarray:
    """Decode frame ``frame`` (default: first) of a GIF composited onto
    the logical screen → (h, w, 3) uint8, or (h, w, 4) when the frame
    declares a transparency index (transparent pixels get alpha 0;
    screen area outside the frame rectangle is background color, or
    transparent when the background IS the transparent index or no
    global color table exists).

    Signature matches the multimodal ``decoder(payload, meta)`` seam
    (meta ignored — the header is authoritative). Raises ValueError for
    non-GIF / corrupt payloads. Frames beyond the first are decoded
    independently onto the screen (no inter-frame disposal compositing
    — the frame-sampling use case reads frames as independent probes;
    full animation playback is out of scope and documented so)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * ncol], dtype=np.uint8)
        if gct.size < 3 * ncol:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(ncol, 3)
        pos += 3 * ncol
    n = len(payload)
    transparent = None  # index from the most recent GCE
    frames_seen = 0
    while pos < n:
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                gce, pos = _sub_blocks(payload, pos)
                if len(gce) >= 4 and (gce[0] & 0x01):
                    transparent = gce[3]
                else:
                    transparent = None
            else:  # comment / application / plain text: skip
                _, pos = _sub_blocks(payload, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        # image descriptor
        left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
        pos += 10
        ct = gct
        if ipacked & 0x80:
            ncol = 2 << (ipacked & 0x07)
            ct = np.frombuffer(payload[pos : pos + 3 * ncol], dtype=np.uint8)
            if ct.size < 3 * ncol:
                raise ValueError("truncated GIF local color table")
            ct = ct.reshape(ncol, 3)
            pos += 3 * ncol
        min_code = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        if frames_seen != frame:
            frames_seen += 1
            transparent = None
            continue
        if ct is None:
            raise ValueError("GIF image has no color table")
        idx = _lzw_decode(data, min_code, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: reorder data rows to screen rows
            screen_rows = _interlace_order(h)
            de = np.empty_like(idx)
            de[screen_rows] = idx
            idx = de
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index outside color table")
        want_alpha = transparent is not None
        out_c = 4 if want_alpha else 3
        screen = np.zeros((sh, sw, out_c), dtype=np.uint8)
        if gct is not None and bg < len(gct) and not (want_alpha and bg == transparent):
            screen[:, :, :3] = gct[bg]
            if want_alpha:
                screen[:, :, 3] = 255
        rgb = ct[idx]  # (h, w, 3)
        y1, x1 = min(top + h, sh), min(left + w, sw)
        vh, vw = y1 - top, x1 - left
        if vh <= 0 or vw <= 0:
            return screen
        if want_alpha:
            a = np.where(idx == transparent, 0, 255).astype(np.uint8)
            patch = np.dstack([rgb, a])[:vh, :vw]
            mask = patch[:, :, 3] > 0
            region = screen[top:y1, left:x1]
            region[mask] = patch[mask]
        else:
            screen[top:y1, left:x1] = rgb[:vh, :vw]
        return screen
    raise ValueError(f"GIF has no frame {frame}")


def gif_frame_count(payload: bytes) -> int:
    """Number of image descriptors (animation frames) — lets the
    frame-sampling planner treat animated GIFs like tiny videos."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n = len(payload)
    count = 0
    while pos < n:
        b = payload[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            _, pos = _sub_blocks(payload, pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        ipacked = payload[pos + 9]
        pos += 10
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        pos += 1  # LZW min code size
        _, pos = _sub_blocks(payload, pos)
        count += 1
    return count


def _palettize(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 → (palette (n, 3), indices (h, w)); raises when
    the image has more than 256 distinct colors (fixture encoder — no
    quantizer)."""
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("encode_gif fixture encoder needs ≤256 distinct colors")
    return pal.astype(np.uint8), inv.reshape(img.shape[:2]).astype(np.uint8)


def encode_gif(
    frames: np.ndarray | list,
    interlace: bool = False,
    transparent_color: tuple | None = None,
    delay_cs: int = 4,
) -> bytes:
    """Encode one (h, w, 3) uint8 frame — or a list of same-shape
    frames (animated) — into GIF89a bytes. A shared global palette is
    built from all frames' distinct colors (≤256). When
    ``transparent_color`` (an RGB tuple) is given, pixels of exactly
    that color become the transparent index via a GCE. Valid,
    self-describing fixture output — correctness over ratio."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("encode_gif: every frame must be (h, w, 3) uint8")
    pal, _ = _palettize(np.concatenate([f.reshape(-1, 1, 3) for f in frames]))
    ncol = len(pal)
    size_field = max(1, int(np.ceil(np.log2(max(ncol, 2)))))  # 2^size colors
    table = np.zeros((1 << size_field, 3), dtype=np.uint8)
    table[:ncol] = pal
    lut = {tuple(c): i for i, c in enumerate(pal.tolist())}
    t_idx = lut.get(tuple(transparent_color)) if transparent_color else None
    if transparent_color is not None and t_idx is None:
        raise ValueError("transparent_color not present in any frame")

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_field - 1), 0, 0)
    out += table.tobytes()
    min_code = max(2, size_field)
    for f in frames:
        if t_idx is not None or len(frames) > 1:
            gce = bytes(
                [
                    0x01 if t_idx is not None else 0x00,
                    delay_cs & 0xFF,
                    (delay_cs >> 8) & 0xFF,
                    t_idx or 0,
                ]
            )
            out += b"\x21\xf9" + bytes([len(gce)]) + gce + b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00
        )
        # _palettize numbers colors per-frame; remap to the shared table
        fpal, fidx = _palettize(f)
        remap = np.asarray([lut[tuple(c)] for c in fpal.tolist()], dtype=np.uint8)
        idx = remap[fidx]
        if interlace:
            idx = idx[_interlace_order(h)]
        out += bytes([min_code])
        lzw = _lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
