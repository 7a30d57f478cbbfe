"""From-scratch multimodal codecs — public-spec, stdlib-only.

Round-2 shipped the multimodal decode path as honest stubs ("no
image/audio codec exists in the container"). That was too pessimistic:
PNG is zlib (Python stdlib) + chunk framing + per-scanline unfiltering,
and WAV is a RIFF header over raw PCM — both fully implementable from
their public specifications with numpy. This module provides real
encode/decode so operators/multimodal.py decodes REAL bytes:

- PNG (spec: W3C PNG, RFC 2083): 8-bit gray / gray+alpha / RGB / RGBA,
  non-interlaced; all five scanline filters (None/Sub/Up/Average/Paeth)
  on decode, CRC-verified chunks; encoder emits filter-0 scanlines.
- WAV (RIFF PCM): 16-bit little-endian PCM, any channel count/rate.
- nearest-neighbor resize (plain numpy indexing).
- "PNG sequence" frame container: concatenated PNG streams (frame
  boundaries = PNG signatures), the minimal multi-frame payload a
  frame-sampling operator can REALLY decode without a video codec.

Everything is per-payload bounded work inside Arrow batches — the
per-row loop is over images in a batch (same envelope as the grouped
geometry kernels), with all per-pixel math vectorized in numpy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """(h, w) or (h, w, ch) uint8 -> PNG bytes (filter 0 scanlines)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * ch)], axis=1
    ).tobytes()
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, ch) uint8. Supports bit depth 8, color types
    0/2/4/6, non-interlaced; CRC-verified; raises ValueError otherwise."""
    b = bytes(buf)
    if b[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = ch = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            ch = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("bad decompressed length")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(stride, np.int64)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: prefix-sum per channel phase
            rec = cur.copy()
            for i in range(ch, stride):
                rec[i] = (rec[i] + rec[i - ch]) & 0xFF
        elif f == 2:  # Up: fully vectorized
            rec = (cur + prev) & 0xFF
        elif f == 3:  # Average
            rec = cur.copy()
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                rec[i] = (rec[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = cur.copy()
            for i in range(stride):
                a = int(rec[i - ch]) if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                rec[i] = (rec[i] + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"unknown filter {f}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, ch)


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing (the mapping is
    floor(out_index * in_size / out_size) — mirrored by the SQL oracle)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


# ------------------------------------------------------------------ WAV


def wav_encode(samples: np.ndarray, rate: int = 16000, channels: int = 1) -> bytes:
    """int16 PCM samples (interleaved if multichannel) -> WAV bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def wav_decode(buf: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes -> (int16 samples, sample_rate, channels). PCM16 only."""
    b = bytes(buf)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if data is None or rate is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2"), rate, channels


# --------------------------------------------------- PNG-sequence frames


def png_seq_encode(frames: list[np.ndarray]) -> bytes:
    """Concatenated PNG streams — the minimal multi-frame container a
    frame sampler can REALLY parse without a video codec."""
    return b"".join(png_encode(f) for f in frames)


def png_seq_offsets(buf: bytes) -> list[int]:
    """Frame boundaries: every PNG signature offset in the payload."""
    b = bytes(buf)
    out = []
    pos = b.find(PNG_SIG)
    while pos != -1:
        out.append(pos)
        pos = b.find(PNG_SIG, pos + 8)
    return out


def png_seq_decode(buf: bytes) -> list[np.ndarray]:
    offs = png_seq_offsets(buf)
    b = bytes(buf)
    ends = offs[1:] + [len(b)]
    return [png_decode(b[s:e]) for s, e in zip(offs, ends)]
