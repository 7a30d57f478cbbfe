"""Minimal WKB (Well-Known Binary) codec for Point / Polygon / MultiPolygon.

The reference stores geometry as WKB BLOBs (schema comment "storing
geometry as WKB", produced by ``ST_AsWKB(ST_Force2D(...))`` at
load.py:163 and decoded via ``shapely.wkb.loads`` at
query_geojson.py:129-131). No shapely exists in this environment, so we
implement the public OGC WKB format directly.

Only 2D little-endian encodings are produced (ST_Force2D semantics);
the parser accepts both byte orders and silently drops Z/M dimensions.

Geometry representation used across the engine:

- a *ring* is an ``(N, 2) float64 ndarray`` (closed or open; kernels
  treat first==last as closed and tolerate either),
- a *polygon* is ``list[ring]`` (ring 0 = exterior shell, rest = holes),
- a *multipolygon* is ``list[polygon]``.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6

_Z_FLAG = 0x80000000
_M_FLAG = 0x40000000
_SRID_FLAG = 0x20000000
_ISO_Z = 1000
_ISO_M = 2000


def point_to_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, float(x), float(y))


def polygon_to_wkb(rings: list[np.ndarray]) -> bytes:
    """Encode a polygon (list of (N,2) rings); rings are closed on write."""
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        out.append(struct.pack("<I", len(r)))
        out.append(r.astype("<f8").tobytes())
    return b"".join(out)


def multipolygon_to_wkb(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(polygon_to_wkb(rings))
    return b"".join(out)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        # The reference hits the same coercion need: DuckDB hands back
        # bytearray, shapely wants bytes (query_geojson.py:128).
        self.buf = bytes(buf)
        self.pos = 0

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u32(self, bo: str) -> int:
        v = struct.unpack_from(bo + "I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def coords(self, n: int, dims: int, bo: str) -> np.ndarray:
        cnt = n * dims
        arr = np.frombuffer(
            self.buf, dtype=("<f8" if bo == "<" else ">f8"), count=cnt, offset=self.pos
        )
        self.pos += cnt * 8
        return np.ascontiguousarray(arr.reshape(n, dims)[:, :2].astype(np.float64))


def _geom_type(raw: int) -> tuple[int, int]:
    """Return (base_type, ndims) handling EWKB flags and ISO offsets."""
    dims = 2
    t = raw & ~(_SRID_FLAG)
    if t & _Z_FLAG:
        dims += 1
        t &= ~_Z_FLAG
    if t & _M_FLAG:
        dims += 1
        t &= ~_M_FLAG
    if t >= _ISO_M:
        dims += 1
        t -= _ISO_M
    if t >= _ISO_Z:
        dims += 1
        t -= _ISO_Z
    return t, dims


def parse_wkb(buf: bytes) -> tuple[int, list | np.ndarray]:
    """Parse WKB -> (base_type, payload).

    payload: POINT -> (2,) array; POLYGON -> list[ring]; MULTIPOLYGON ->
    list[list[ring]].
    """
    r = _Reader(buf)
    return _parse_geom(r)


def _parse_geom(r: _Reader):
    bo = "<" if r.u8() == 1 else ">"
    raw = r.u32(bo)
    t, dims = _geom_type(raw)
    if raw & _SRID_FLAG:
        r.u32(bo)  # skip SRID
    if t == WKB_POINT:
        return t, r.coords(1, dims, bo)[0]
    if t == WKB_POLYGON:
        nrings = r.u32(bo)
        return t, [r.coords(r.u32(bo), dims, bo) for _ in range(nrings)]
    if t == WKB_MULTIPOLYGON:
        npolys = r.u32(bo)
        polys = []
        for _ in range(npolys):
            sub_t, rings = _parse_geom(r)
            if sub_t != WKB_POLYGON:
                raise ValueError(f"multipolygon member has type {sub_t}")
            polys.append(rings)
        return t, polys
    raise ValueError(f"unsupported WKB geometry type {t}")


def shells_packed(buffers) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exterior shells of MANY WKB buffers packed into flat arrays:
    (coords (N,2), offsets (R+1,), shell_row (R,) — source row index of
    each shell). Closing vertices are dropped so rings are open.

    The per-buffer header walk is a cheap Python loop over byte offsets;
    every downstream coordinate operation (area, clip, bbox) runs
    vectorized over the single flat array (geo.polygon batch API).
    """
    coords_list: list[np.ndarray] = []
    sizes: list[int] = []
    rows: list[int] = []
    for r, buf in enumerate(buffers):
        if buf is None:
            continue
        for shell in shells(bytes(buf)):
            s = shell
            if len(s) > 1 and s[0, 0] == s[-1, 0] and s[0, 1] == s[-1, 1]:
                s = s[:-1]
            coords_list.append(s)
            sizes.append(len(s))
            rows.append(r)
    if not coords_list:
        return (
            np.zeros((0, 2), dtype=np.float64),
            np.zeros(1, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
        )
    coords = np.concatenate(coords_list, axis=0)
    offsets = np.concatenate([[0], np.cumsum(np.asarray(sizes, dtype=np.int64))])
    return coords, offsets, np.asarray(rows, dtype=np.int64)


def shells(buf: bytes) -> list[np.ndarray]:
    """Exterior shells of a (multi)polygon WKB as a flat ring list."""
    t, payload = parse_wkb(buf)
    if t == WKB_POLYGON:
        return [payload[0]]
    if t == WKB_MULTIPOLYGON:
        return [rings[0] for rings in payload]
    raise ValueError(f"not a polygonal geometry: type {t}")
