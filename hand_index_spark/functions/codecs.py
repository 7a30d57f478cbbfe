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


# ----------------------------------------------------------------- JPEG
# Baseline sequential JFIF (ITU-T T.81): 8-bit grayscale or RGB with
# 4:4:4 sampling (no chroma subsampling). The encoder embeds its OWN
# canonical Huffman tables and quantization table in DHT/DQT — JPEG
# files are self-describing, so no externally-published table constants
# are required (the property spec-exact H3 lacks); the decoder reads
# whatever tables the file carries. Quantization/reconstruction use
# floor(x + 0.5) (half-up) so the round-trip arithmetic is expressible
# in the SQL oracle. Lossy by nature: round-trips are exact for images
# that are CONSTANT per 8x8 block (DC-only spectra) and approximate
# otherwise — both properties are tested.

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8x8 DCT-II basis: M[u, x] = c(u) cos((2x+1) u pi / 16)
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.125) if _u == 0 else 0.5
        _DCT_M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# default quantization table: quality-50-ish flat-ish values (embedded
# in DQT, so any table works; q[0,0] drives the DC round-trip math)
DEFAULT_QTABLE = np.full((8, 8), 16, dtype=np.int64)
DEFAULT_QTABLE[0, 0] = 16

# canonical Huffman tables (embedded in DHT): all 12 DC categories at
# code length 4; all 162 AC run/size symbols at code length 8
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG construction."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits: list[int], symbols: list[int]) -> bytes:
    return bytes([tc_th]) + bytes(bits) + bytes(symbols)


def jpeg_encode(arr: np.ndarray, qtable: np.ndarray | None = None) -> bytes:
    """(h, w) or (h, w, 3) uint8 -> baseline JFIF bytes (4:4:4)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and a.shape[2] != 3:
        raise ValueError("jpeg_encode supports grayscale or RGB")
    h, w = a.shape[:2]
    q = DEFAULT_QTABLE if qtable is None else np.asarray(qtable, dtype=np.int64)
    if gray:
        comps = [a.astype(np.float64)]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        comps = [y, cb, cr]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    comps = [
        np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge") for c in comps
    ]
    bw = _BitWriter()
    pred = [0] * len(comps)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, c in enumerate(comps):
                block = c[by : by + 8, bx : bx + 8] - 128.0
                coef = _DCT_M @ block @ _DCT_M.T
                quant = np.floor(coef / q + 0.5).astype(np.int64)
                zz = quant.ravel()[_ZIGZAG]
                # DC: differential, category + amplitude bits
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                cat = _category(diff)
                code, length = _DC_CODES[cat]
                bw.write(code, length)
                if cat:
                    amp = diff if diff >= 0 else diff + (1 << cat) - 1
                    bw.write(amp, cat)
                # AC: run-length of zeros + category
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        zc, zl = _AC_CODES[0xF0]  # ZRL
                        bw.write(zc, zl)
                        run -= 16
                    cat = _category(v)
                    code, length = _AC_CODES[(run << 4) | cat]
                    bw.write(code, length)
                    amp = v if v >= 0 else v + (1 << cat) - 1
                    bw.write(amp, cat)
                    run = 0
                if run:
                    ec, el = _AC_CODES[0x00]  # EOB
                    bw.write(ec, el)
    data = bw.flush()
    ncomp = len(comps)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # sampling 1x1, qtable 0
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    return (
        b"\xff\xd8"  # SOI
        + _marker(0xDB, bytes([0]) + bytes(q.ravel()[_ZIGZAG].astype(np.uint8)))
        + _marker(0xC0, sof)
        + _marker(0xC4, _dht_payload(0x00, _DC_BITS, _DC_SYMBOLS))
        + _marker(0xC4, _dht_payload(0x10, _AC_BITS, _AC_SYMBOLS))
        + _marker(0xDA, sos)
        + data
        + b"\xff\xd9"  # EOI
    )


class _BitReader:
    def __init__(self, b: bytes) -> None:
        self.b = b
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            byte = self.b[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.b[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker in entropy data")
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return out


def _decode_table(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    codes = _canonical_codes(bits, symbols)
    return {(length, code): sym for sym, (code, length) in codes.items()}


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(amp: int, cat: int) -> int:
    if cat == 0:
        return 0
    return amp if amp >= (1 << (cat - 1)) else amp - (1 << cat) + 1


def jpeg_decode(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, ch) uint8. Supports the profile the
    encoder emits: 8-bit, 1 or 3 components, 1x1 sampling, one scan."""
    b = bytes(buf)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    h = w = None
    comps: list[tuple[int, int]] = []  # (comp_id, qtable_id)
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc table, ac table)
    data_start = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker expected")
        tag = b[pos + 1]
        if tag == 0xD9:
            break
        (length,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        body = b[pos + 4 : pos + 2 + length]
        if tag == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(
                    np.int64
                )
                q = np.zeros(64, dtype=np.int64)
                q[_ZIGZAG] = zz
                qtables[tq] = q.reshape(8, 8)
                i += 65
        elif tag == 0xC0:
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("only 1x1 sampling (4:4:4) supported")
                comps.append((cid, tq))
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif tag == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                symbols = list(body[i + 17 : i + 17 + n])
                htables[tc_th] = _decode_table(bits, symbols)
                i += 17 + n
        elif tag == 0xDA:
            ns = body[0]
            by_id = {cid: k for k, (cid, _tq) in enumerate(comps)}
            for ci in range(ns):
                cid, tt = body[1 + 2 * ci : 3 + 2 * ci]
                scan.append((by_id[cid], tt >> 4, tt & 0xF))
            data_start = pos + 2 + length
            break
        pos += 2 + length
    if h is None or data_start is None:
        raise ValueError("missing SOF/SOS")
    end = b.rfind(b"\xff\xd9")
    br = _BitReader(b[data_start : end if end != -1 else len(b)])
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.zeros((ph, pw), dtype=np.float64) for _ in comps]
    pred = [0] * len(comps)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for k, dc_t, ac_t in scan:
                q = qtables[comps[k][1]]
                dct = htables[0x00 | dc_t]
                act = htables[0x10 | ac_t]
                zz = np.zeros(64, dtype=np.int64)
                cat = _read_symbol(br, dct)
                diff = _extend(br.read(cat), cat) if cat else 0
                pred[k] += diff
                zz[0] = pred[k]
                i = 1
                while i < 64:
                    sym = _read_symbol(br, act)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    run, cat = sym >> 4, sym & 0xF
                    i += run
                    if i > 63:
                        raise ValueError("AC run past block end")
                    zz[i] = _extend(br.read(cat), cat)
                    i += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZIGZAG] = zz * q.ravel()[_ZIGZAG]
                block = _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M
                planes[k][by : by + 8, bx : bx + 8] = block
    out = [np.floor(p + 0.5) + 128.0 for p in planes]
    if len(out) == 1:
        img = np.clip(out[0], 0, 255)[:h, :w]
        return img.astype(np.uint8)[:, :, None]
    y, cb, cr = (o[:h, :w] for o in out)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.floor(c + 0.5), 0, 255) for c in (r, g, bch)], axis=-1
    )
    return rgb.astype(np.uint8)


def decode_any_image(buf: bytes) -> np.ndarray:
    """Format-sniffing image decode: PNG or baseline JPEG."""
    b = bytes(buf)
    if b[:8] == PNG_SIG:
        return png_decode(b)
    if b[:2] == b"\xff\xd8":
        return jpeg_decode(b)
    raise ValueError("unrecognized image format (PNG/JPEG supported)")
