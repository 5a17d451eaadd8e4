"""Pure-stdlib audio codecs + deterministic DSP features for the
multimodal seam.

Training corpora carry audio as opaque binary columns; the container
bundles no audio library, so — like the image modules — this
implements the PUBLIC container formats from scratch with struct +
numpy: RIFF/WAVE (PCM 8/16/24/32-bit, IEEE float32/64, µ-law, A-law,
and WAVE_FORMAT_EXTENSIBLE sub-formats), Sun AU (.snd big-endian:
µ-law, signed PCM 8/16/24/32, float32/64, A-law), and AIFF / AIFF-C
(IFF big-endian, 80-bit extended-float sample rates, NONE/sowt byte
orders, ulaw/alaw/fl32/fl64 compression). G.711 µ-law/A-law expansion
uses the classic public-domain Sun g711.c formulas, vectorized.

All decoders return ``(samples, rate)`` with samples float64 of shape
(n_frames, channels) in [-1, 1) — the contract of the
``audio_or_fake_decoder`` seam that ``extract_audio_features``
consumes through ``mapInPandas``.

Features are deterministic numpy (no library DSP): per-clip RMS /
peak / zero-crossing rate / silence ratio, Hann-windowed rFFT
spectral centroid / rolloff / bandwidth / flatness, and a spectral
landmark fingerprint (per-frame top peaks paired into (f1, f2, Δt)
constellation hashes, k smallest kept — the audio analogue of the
text module's rolling-hash document fingerprints).

External vectors: CPython's bundled pluck-* test clips (PSF-licensed
public test data, tests/fixtures/audio/) — one waveform shipped in
three independent containers (WAV/AIFF/AU) at four PCM depths plus
µ-law and A-law companding, giving cross-container exactness and
cross-compander SNR oracles no fixture writer could fake.

Scale note: everything here is whole-array numpy per payload inside
Arrow-batched ``mapInPandas`` — no per-sample Python loops; clips in
a batch decode independently across partitions.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# G.711 companding (Sun g711.c, public domain)

_BIAS = 0x84


def ulaw_to_linear(u: np.ndarray) -> np.ndarray:
    """µ-law bytes → int16-scale linear values (vectorized)."""
    u = (~np.asarray(u, dtype=np.uint8)).astype(np.int32)
    t = ((u & 0x0F) << 3) + _BIAS
    t <<= (u & 0x70) >> 4
    return np.where(u & 0x80, _BIAS - t, t - _BIAS)


def alaw_to_linear(a: np.ndarray) -> np.ndarray:
    """A-law bytes → int16-scale linear values (vectorized)."""
    a = (np.asarray(a, dtype=np.uint8) ^ 0x55).astype(np.int32)
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t)


# ---------------------------------------------------------------------------
# sample unpacking helpers


def _pcm_to_float(data: bytes, bits: int, big_endian: bool, signed: bool) -> np.ndarray:
    if bits == 8:
        raw = np.frombuffer(data, dtype=np.int8 if signed else np.uint8)
        v = raw.astype(np.float64) if signed else raw.astype(np.float64) - 128.0
        return v / 128.0
    if bits == 24:
        b = np.frombuffer(data, dtype=np.uint8)
        b = b[: (len(b) // 3) * 3].reshape(-1, 3)
        if big_endian:
            v = (
                (b[:, 0].astype(np.int32) << 16)
                | (b[:, 1].astype(np.int32) << 8)
                | b[:, 2]
            )
        else:
            v = (
                (b[:, 2].astype(np.int32) << 16)
                | (b[:, 1].astype(np.int32) << 8)
                | b[:, 0]
            )
        v = np.where(v & 0x800000, v - 0x1000000, v)
        return v.astype(np.float64) / float(1 << 23)
    dt = {16: np.int16, 32: np.int32}[bits]
    v = np.frombuffer(data, dtype=np.dtype(dt).newbyteorder(">" if big_endian else "<"))
    return v.astype(np.float64) / float(1 << (bits - 1))


def _frames(v: np.ndarray, channels: int) -> np.ndarray:
    n = (v.size // channels) * channels
    return v[:n].reshape(-1, channels)


# ---------------------------------------------------------------------------
# WAV (RIFF little-endian)

_WAVE_PCM = 0x0001
_WAVE_FLOAT = 0x0003
_WAVE_ALAW = 0x0006
_WAVE_ULAW = 0x0007
_WAVE_EXT = 0xFFFE


def decode_wav(payload: bytes, meta=None) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (float64 (n_frames, channels) in [-1, 1), rate)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + sz]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("WAVE missing fmt/data chunk")
    tag, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == _WAVE_EXT:
        if len(fmt) < 26:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt")
        (tag,) = struct.unpack("<H", fmt[24:26])  # first 2 bytes of SubFormat GUID
    if channels < 1:
        raise ValueError("WAVE has no channels")
    if tag == _WAVE_PCM:
        if bits not in (8, 16, 24, 32):
            raise ValueError(f"unsupported WAVE PCM depth {bits}")
        v = _pcm_to_float(data, bits, False, signed=bits != 8)
    elif tag == _WAVE_FLOAT:
        dt = {32: "<f4", 64: "<f8"}.get(bits)
        if dt is None:
            raise ValueError(f"unsupported WAVE float depth {bits}")
        v = np.frombuffer(data, dtype=dt).astype(np.float64)
    elif tag == _WAVE_ULAW:
        v = ulaw_to_linear(np.frombuffer(data, np.uint8)).astype(np.float64) / 32768.0
    elif tag == _WAVE_ALAW:
        v = alaw_to_linear(np.frombuffer(data, np.uint8)).astype(np.float64) / 32768.0
    else:
        raise ValueError(f"unsupported WAVE format tag 0x{tag:04x}")
    return _frames(v, channels), rate


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Fixture writer: float (n, ch) in [-1, 1] → PCM WAV bytes."""
    s = np.atleast_2d(np.asarray(samples, dtype=np.float64))
    if s.shape[0] == 1 and s.shape[1] > 1 and samples.ndim == 1:
        s = s.T
    ch = s.shape[1]
    if bits == 16:
        raw = np.clip(np.round(s * 32768.0), -32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        raw = (np.clip(np.round(s * 128.0), -128, 127) + 128).astype(np.uint8).tobytes()
    elif bits == 32:
        raw = np.clip(np.round(s * float(1 << 31)), -(1 << 31), (1 << 31) - 1).astype("<i4").tobytes()
    else:
        raise ValueError("encode_wav supports 8/16/32-bit PCM")
    fmt = struct.pack("<HHIIHH", _WAVE_PCM, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw + (b"\x00" if len(raw) & 1 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# Sun AU (.snd, big-endian)

_AU_ENCODINGS = {
    1: ("ulaw", 8), 2: ("pcm", 8), 3: ("pcm", 16), 4: ("pcm", 24),
    5: ("pcm", 32), 6: ("float", 32), 7: ("float", 64), 27: ("alaw", 8),
}


def decode_au(payload: bytes, meta=None) -> tuple[np.ndarray, int]:
    """Sun/NeXT .au → (float64 (n_frames, channels), rate)."""
    if len(payload) < 24 or payload[:4] != b".snd":
        raise ValueError("not an AU payload")
    offset, size, enc, rate, channels = struct.unpack(">IIIII", payload[4:24])
    if enc not in _AU_ENCODINGS or channels < 1 or offset < 24:
        raise ValueError(f"unsupported AU encoding {enc}")
    end = len(payload) if size == 0xFFFFFFFF else min(len(payload), offset + size)
    data = payload[offset:end]
    kind, bits = _AU_ENCODINGS[enc]
    if kind == "ulaw":
        v = ulaw_to_linear(np.frombuffer(data, np.uint8)).astype(np.float64) / 32768.0
    elif kind == "alaw":
        v = alaw_to_linear(np.frombuffer(data, np.uint8)).astype(np.float64) / 32768.0
    elif kind == "float":
        v = np.frombuffer(data, dtype=">f4" if bits == 32 else ">f8").astype(np.float64)
    else:  # AU PCM is signed at every depth, big-endian
        v = _pcm_to_float(data, bits, True, signed=True)
    return _frames(v, channels), rate


# ---------------------------------------------------------------------------
# AIFF / AIFF-C (IFF big-endian)


def _read_f80(b: bytes) -> float:
    """80-bit IEEE 754 extended float (AIFF sample rates)."""
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def decode_aiff(payload: bytes, meta=None) -> tuple[np.ndarray, int]:
    """AIFF / AIFF-C → (float64 (n_frames, channels), rate). Handles
    NONE (signed big-endian PCM), sowt (little-endian), ulaw/ULAW,
    alaw/ALAW, fl32/FL32, fl64."""
    if len(payload) < 12 or payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF payload")
    is_aifc = payload[8:12] == b"AIFC"
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (sz,) = struct.unpack(">I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + sz]
        if tag == b"COMM":
            comm = body
        elif tag == b"SSND":
            ssnd = body
        pos += 8 + sz + (sz & 1)
    if comm is None or ssnd is None or len(comm) < 18 or len(ssnd) < 8:
        raise ValueError("AIFF missing COMM/SSND chunk")
    channels, _nframes = struct.unpack(">HI", comm[:6])
    (bits,) = struct.unpack(">H", comm[6:8])
    rate = int(round(_read_f80(comm[8:18])))
    comp = comm[18:22] if is_aifc and len(comm) >= 22 else b"NONE"
    off, _block = struct.unpack(">II", ssnd[:8])
    data = ssnd[8 + off :]
    if channels < 1:
        raise ValueError("AIFF has no channels")
    if comp in (b"NONE", b"twos"):
        if bits not in (8, 16, 24, 32):
            raise ValueError(f"unsupported AIFF PCM depth {bits}")
        v = _pcm_to_float(data, bits, True, signed=True)
    elif comp == b"sowt":
        v = _pcm_to_float(data, bits, False, signed=True)
    elif comp in (b"ulaw", b"ULAW"):
        v = ulaw_to_linear(np.frombuffer(data, np.uint8)).astype(np.float64) / 32768.0
    elif comp in (b"alaw", b"ALAW"):
        v = alaw_to_linear(np.frombuffer(data, np.uint8)).astype(np.float64) / 32768.0
    elif comp in (b"fl32", b"FL32"):
        v = np.frombuffer(data, dtype=">f4").astype(np.float64)
    elif comp in (b"fl64", b"FL64"):
        v = np.frombuffer(data, dtype=">f8").astype(np.float64)
    else:
        raise ValueError(f"unsupported AIFF-C compression {comp!r}")
    return _frames(v, channels), rate


# ---------------------------------------------------------------------------
# seam


def audio_or_fake_decoder(payload: bytes, meta) -> tuple[np.ndarray, int]:
    """Production-shaped audio decoder: WAV, AU, and AIFF/AIFC decode
    for real; anything else (MP3, Ogg, FLAC, …) falls back to a
    deterministic fake derived from the payload bytes so pipelines
    keep moving — the same contract as ``image_or_fake_decoder``."""
    for dec in (decode_wav, decode_au, decode_aiff):
        try:
            return dec(payload, meta)
        except (ValueError, struct.error, IndexError):
            continue
    return fake_audio_decoder(payload, meta)


def fake_audio_decoder(payload: bytes, meta) -> tuple[np.ndarray, int]:
    """Deterministic stand-in: payload bytes → centered samples."""
    rate = int((meta or {}).get("sample_rate") or 8000)
    raw = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    return ((raw.astype(np.float64) - 128.0) / 128.0).reshape(-1, 1), rate


# ---------------------------------------------------------------------------
# deterministic DSP features


def _spectrogram(mono: np.ndarray, n_fft: int = 256, hop: int = 128) -> np.ndarray:
    """Hann-windowed power spectrogram (frames, n_fft//2+1)."""
    if mono.size < n_fft:
        mono = np.pad(mono, (0, n_fft - mono.size))
    n_frames = 1 + (mono.size - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
    spec = np.fft.rfft(mono[idx] * win, axis=1)
    return (spec.real**2 + spec.imag**2)


def audio_fingerprint(
    mono: np.ndarray, n_fft: int = 256, hop: int = 128, peaks_per_frame: int = 3,
    fanout: int = 3, k: int = 8,
) -> list[int]:
    """Spectral landmark fingerprint: per-frame top spectral peaks
    paired with peaks up to ``fanout`` frames ahead; each (f1, f2, Δt)
    triple hashes to a 32-bit landmark and the k smallest distinct
    hashes are kept (min-k sketch ⇒ set-resemblance between clips,
    exactly like the text rolling-hash fingerprints)."""
    p = _spectrogram(mono, n_fft, hop)
    if p.shape[0] == 0:
        return []
    top = np.argsort(-p, axis=1)[:, :peaks_per_frame]  # descending power
    top.sort(axis=1)
    hashes = set()
    n = top.shape[0]
    for dt in range(1, fanout + 1):
        if n <= dt:
            break
        f1 = top[:-dt]  # (n-dt, P)
        f2 = top[dt:]
        for i in range(f1.shape[1]):
            for j in range(f2.shape[1]):
                h = (
                    f1[:, i].astype(np.int64) * 1000003
                    + f2[:, j].astype(np.int64) * 8191
                    + dt
                ) * 2654435761 % (1 << 32)
                hashes.update(h.tolist())
    return sorted(hashes)[:k]


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Per-clip deterministic features over the channel-mean signal."""
    s = np.atleast_2d(samples)
    mono = s.mean(axis=1) if s.ndim == 2 else s.ravel()
    n = mono.size
    if n == 0:
        return {
            "duration_s": 0.0, "rms": 0.0, "peak": 0.0, "zcr": 0.0,
            "silence_ratio": 1.0, "centroid_hz": 0.0, "rolloff_hz": 0.0,
            "bandwidth_hz": 0.0, "flatness": 0.0, "fingerprint": [],
        }
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.abs(mono).max())
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    silence = float(np.mean(np.abs(mono) < max(0.02, 0.05 * peak)))
    p = _spectrogram(mono)
    mag = p.mean(axis=0)
    freqs = np.fft.rfftfreq(256, d=1.0 / rate)
    tot = mag.sum()
    if tot > 0:
        centroid = float((freqs * mag).sum() / tot)
        cum = np.cumsum(mag)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * tot))])
        bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * mag).sum() / tot))
        flatness = float(np.exp(np.mean(np.log(mag + 1e-20))) / (mag.mean() + 1e-20))
    else:
        centroid = rolloff = bandwidth = flatness = 0.0
    return {
        "duration_s": n / float(rate), "rms": rms, "peak": peak, "zcr": zcr,
        "silence_ratio": silence, "centroid_hz": centroid, "rolloff_hz": rolloff,
        "bandwidth_hz": bandwidth, "flatness": flatness,
        "fingerprint": audio_fingerprint(mono),
    }


AUDIO_FEATURE_SCHEMA = (
    "media_id long, duration_s double, rms double, peak double, zcr double, "
    "silence_ratio double, centroid_hz double, rolloff_hz double, "
    "bandwidth_hz double, flatness double, fingerprint array<long>"
)


def extract_audio_features(
    media: DataFrame,
    decoder: Callable[[bytes, dict], tuple[np.ndarray, int]] = audio_or_fake_decoder,
) -> DataFrame:
    """Decode → per-clip DSP features through one Arrow-batched
    ``mapInPandas`` pass — the audio counterpart of
    ``multimodal.extract_features`` (same partitioning/batch-shape
    contract; repartition upstream when payloads are large)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                samples, rate = decoder(bytes(payload or b""), meta)
                rows.append({"media_id": int(mid), **audio_features(samples, rate)})
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
