"""From-scratch multimodal codecs (functions/codecs.py): PNG/WAV
round-trips, all five PNG scanline filters against independently
hand-built filtered streams, malformed-input rejection, and the real
Spark decode path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hand_index_spark.functions import codecs as C


def test_png_roundtrip_all_color_types():
    g = np.random.Generator(np.random.Philox(7))
    for shape in [(5, 7), (5, 7, 2), (8, 3, 3), (4, 4, 4), (1, 1), (33, 17, 3)]:
        a = g.integers(0, 256, size=shape, dtype=np.uint8)
        dec = C.png_decode(C.png_encode(a))
        want = a[:, :, None] if a.ndim == 2 else a
        assert np.array_equal(dec, want), shape


def _encode_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Independent reference encoder emitting a CHOSEN filter type for
    every scanline — exercises decode paths our own encoder (filter 0)
    never produces."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(int)
    rows = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, int)
        f = np.zeros(stride, int)
        for i in range(stride):
            a = cur[i - ch] if i >= ch else 0
            c = prev[i - ch] if i >= ch else 0
            b = prev[i]
            pred = [0, a, b, (a + b) // 2, C._paeth(a, b, c)][ftype]
            f[i] = (cur[i] - pred) & 0xFF
        rows.append(bytes([ftype]) + bytes(f.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        C.PNG_SIG
        + C._chunk(b"IHDR", ihdr)
        + C._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + C._chunk(b"IEND", b"")
    )


def test_png_decode_all_five_filters():
    g = np.random.Generator(np.random.Philox(11))
    img = g.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for ftype in range(5):
        assert np.array_equal(C.png_decode(_encode_with_filter(img, ftype)), img)


def test_png_rejects_malformed():
    a = np.zeros((4, 4), dtype=np.uint8)
    good = C.png_encode(a)
    with pytest.raises(ValueError, match="signature"):
        C.png_decode(b"JUNK" + good)
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        C.png_decode(bytes(corrupt))


def test_wav_roundtrip_and_reject():
    g = np.random.Generator(np.random.Philox(13))
    s = g.integers(-32768, 32768, size=1000).astype(np.int16)
    dec, rate, ch = C.wav_decode(C.wav_encode(s, 22050, 1))
    assert np.array_equal(dec, s) and rate == 22050 and ch == 1
    with pytest.raises(ValueError):
        C.wav_decode(b"not a riff file at all....")


def test_png_seq_and_resize():
    g = np.random.Generator(np.random.Philox(17))
    frames = [g.integers(0, 256, size=(6, 6, 3), dtype=np.uint8) for _ in range(4)]
    dec = C.png_seq_decode(C.png_seq_encode(frames))
    assert len(dec) == 4 and all(np.array_equal(d, f) for d, f in zip(dec, frames))
    r = C.resize_nearest(frames[0], 3, 2)
    assert r.shape == (2, 3, 3)
    # nearest mapping: src = (out_idx * in) // out
    assert np.array_equal(r[0, 0], frames[0][0, 0])
    assert np.array_equal(r[1, 2], frames[0][3, 4])


def test_decode_image_real_path_spark(spark):
    """decode_image(fake=False) really decodes PNG payloads in Arrow
    batches: exact dims + exact integer-mean round-trip."""
    from pyspark.sql import functions as F

    from hand_index_spark.operators.multimodal import decode_image

    g = np.random.Generator(np.random.Philox(19))
    rows = []
    want = {}
    for did in range(20):
        img = g.integers(0, 256, size=(5 + did % 4, 7, 3), dtype=np.uint8)
        rows.append((did, bytearray(C.png_encode(img))))
        want[did] = (7, img.shape[0], float(int(img.sum(dtype=np.int64))) / img.size)
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = decode_image(df, binary_col="payload", fake=False).collect()
    assert len(got) == 20
    for r in got:
        w, h, mean = want[r.doc_id]
        assert (r.width, r.height) == (w, h)
        assert r.mean_intensity == mean
        # the thumbnail is itself a valid PNG of the 8x8 resize
        t = C.png_decode(bytes(r.thumbnail))
        assert t.shape == (8, 8, 3)


# ------------------------------------------------------- property tests

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_property(w, h, ch, seed):
    g = np.random.Generator(np.random.Philox(seed))
    a = g.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    assert np.array_equal(C.png_decode(C.png_encode(a)), a)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 2000),
    rate=st.integers(8000, 48000),
    ch=st.integers(1, 2),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_property(n, rate, ch, seed):
    g = np.random.Generator(np.random.Philox(seed))
    s = g.integers(-32768, 32768, size=n * ch).astype(np.int16)
    dec, r2, c2 = C.wav_decode(C.wav_encode(s, rate, ch))
    assert np.array_equal(dec, s) and (r2, c2) == (rate, ch)


@settings(max_examples=30, deadline=None)
@given(
    nx=st.integers(1, 4),
    ny=st.integers(1, 4),
    seed=st.integers(0, 2**31),
)
def test_dissolve_grid_tiling_property(nx, ny, seed):
    """Any nx x ny grid tiling with randomly jittered INTERIOR vertices
    (shared corners move together, so edges stay vertex-matched)
    dissolves to one ring whose exact area equals the summed member
    areas."""
    from hand_index_spark.geo import polygon as P

    g = np.random.Generator(np.random.Philox(seed))
    # lattice points with jitter on strictly interior vertices
    gx = np.arange(nx + 1, dtype=float)[:, None].repeat(ny + 1, axis=1)
    gy = np.arange(ny + 1, dtype=float)[None, :].repeat(nx + 1, axis=0)
    jx = g.uniform(-0.3, 0.3, size=gx.shape)
    jy = g.uniform(-0.3, 0.3, size=gy.shape)
    jx[0, :] = jx[-1, :] = jx[:, 0] = jx[:, -1] = 0.0
    jy[0, :] = jy[-1, :] = jy[:, 0] = jy[:, -1] = 0.0
    gx, gy = gx + jx, gy + jy
    tiles = [
        np.array(
            [
                [gx[i, j], gy[i, j]],
                [gx[i + 1, j], gy[i + 1, j]],
                [gx[i + 1, j + 1], gy[i + 1, j + 1]],
                [gx[i, j + 1], gy[i, j + 1]],
            ]
        )
        for i in range(nx)
        for j in range(ny)
    ]
    rings = P.dissolve_rings(tiles)
    assert rings is not None
    total = sum(P.ring_area(r) for r in rings)
    member_sum = sum(abs(P.ring_area(t)) for t in tiles)
    assert abs(total - member_sum) < 1e-9 * max(member_sum, 1.0)


# ------------------------------------------------------------------ JPEG


def test_jpeg_piecewise_constant_blocks_closed_form():
    """Every 8x8-constant block reconstructs per the exact quantization
    closed form (q00=16): rec = clip(2*floor((v-128)/2 + 0.5) + 128).
    Even values round-trip exactly. Exercises DC DPCM + Huffman +
    byte stuffing with genuinely varying block values."""
    g = np.random.Generator(np.random.Philox(29))
    for _ in range(3):
        nbx, nby = int(g.integers(1, 5)), int(g.integers(1, 5))
        vals = g.integers(0, 128, size=(nby, nbx)) * 2  # even -> exact
        img = np.kron(vals, np.ones((8, 8), int)).astype(np.uint8)
        dec = C.jpeg_decode(C.jpeg_encode(img))[:, :, 0]
        assert np.array_equal(dec.astype(int), img.astype(int))


def test_jpeg_gradient_tolerance_and_shapes():
    x = np.arange(40)
    y = np.arange(24)
    img = ((x[None, :] + 2 * y[:, None]) % 200 + 20).astype(np.uint8)
    dec = C.jpeg_decode(C.jpeg_encode(img))[:, :, 0]
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 24
    # non-multiple-of-8 dims survive pad/crop
    d2 = C.jpeg_decode(C.jpeg_encode(img[:19, :37]))
    assert d2.shape == (19, 37, 1)
    # RGB 4:4:4
    rgb = np.stack([img, img[::-1], img // 2], axis=-1).astype(np.uint8)
    drgb = C.jpeg_decode(C.jpeg_encode(rgb))
    assert drgb.shape == rgb.shape
    assert np.abs(drgb.astype(int) - rgb.astype(int)).max() <= 32


def test_jpeg_rejects_malformed():
    with pytest.raises(ValueError, match="SOI"):
        C.jpeg_decode(b"nope")
    img = np.full((8, 8), 100, dtype=np.uint8)
    good = bytearray(C.jpeg_encode(img))
    # progressive SOF2 must be rejected, not mis-decoded
    sof_at = bytes(good).find(b"\xff\xc0")
    good[sof_at + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        C.jpeg_decode(bytes(good))


def test_decode_any_image_sniffs_format():
    img = np.full((8, 8), 200, dtype=np.uint8)
    p = C.decode_any_image(C.png_encode(img))
    j = C.decode_any_image(C.jpeg_encode(img))
    assert p.shape == j.shape == (8, 8, 1)
    assert np.array_equal(p[:, :, 0], img)
    assert np.array_equal(j[:, :, 0], img)  # 200 is even -> exact
    with pytest.raises(ValueError, match="unrecognized"):
        C.decode_any_image(b"GIF89a...")


def test_jpeg_restart_markers_exact_parity():
    """Restart-marker streams (round 5): DRI/RSTn emitted, DC predictors
    reset per segment, and the vectorized cross-segment entropy decoder
    reproduces the serial decoder's pixels EXACTLY for every interval,
    shape and spectrum."""
    from hand_index_spark.functions import codecs as C

    rng = np.random.default_rng(42)
    for shape in [(16, 16), (24, 40, 3), (7, 13), (64, 64)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        ref = C.jpeg_decode(C.jpeg_encode(img))
        for ri in (1, 2, 7, 1000):  # incl. interval > MCU count
            enc = C.jpeg_encode(img, restart_interval=ri)
            assert b"\xff\xdd" in enc  # DRI present
            assert np.array_equal(C.jpeg_decode(enc), ref), (shape, ri)
    # smooth spectrum (EOB-heavy, different symbol mix)
    y, x = np.mgrid[0:40, 0:56]
    img = ((np.sin(x / 9) + np.cos(y / 7)) * 60 + 128).astype(np.uint8)
    ref = C.jpeg_decode(C.jpeg_encode(img))
    for ri in (1, 4):
        assert np.array_equal(
            C.jpeg_decode(C.jpeg_encode(img, restart_interval=ri)), ref
        )


def test_jpeg_restart_default_stream_unchanged():
    """restart_interval=0 (the default) must produce the exact bytes the
    r4 encoder produced — the multimodal driver oracles depend on it."""
    from hand_index_spark.functions import codecs as C

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 24, 3)).astype(np.uint8)
    enc = C.jpeg_encode(img)
    assert b"\xff\xdd" not in enc  # no DRI marker
    assert b"\xff\xd0" not in enc and b"\xff\xd7" not in enc


def test_jpeg_restart_rejects_tampered_markers():
    from hand_index_spark.functions import codecs as C

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    enc = bytearray(C.jpeg_encode(img, restart_interval=1))
    # find the first RST0 marker and break its sequence number
    i = bytes(enc).find(b"\xff\xd0")
    assert i != -1
    enc[i + 1] = 0xD5  # out of sequence
    with pytest.raises(ValueError):
        C.jpeg_decode(bytes(enc))
