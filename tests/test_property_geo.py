"""Property-based tests (hypothesis, derandomized) for the geometry
kernels — invariants that must hold for ALL inputs, not just fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hand_index_spark.geo import albers
from hand_index_spark.geo import cells as h3lite
from hand_index_spark.geo import polygon as P
from hand_index_spark.geo import s2lite
from hand_index_spark.geo import wkb

SET = settings(derandomize=True, max_examples=200, deadline=None)

coord = st.floats(-1e7, 1e7, allow_nan=False, allow_infinity=False)
lat_s = st.floats(-89.9, 89.9, allow_nan=False)
lon_s = st.floats(-179.9, 179.9, allow_nan=False)


@SET
@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=12))
def test_wkb_roundtrip_exact(pts):
    ring = np.asarray(pts, dtype=np.float64)
    buf = wkb.polygon_to_wkb([ring])
    gtype, payload = wkb.parse_wkb(buf)
    assert gtype == wkb.WKB_POLYGON
    closed = np.vstack([ring, ring[:1]]) if not np.array_equal(ring[0], ring[-1]) else ring
    assert np.array_equal(payload[0], closed)  # bit-exact float64 round-trip


@SET
@given(st.lists(st.tuples(lat_s, lon_s), min_size=1, max_size=50), st.integers(0, 29))
def test_s2_parent_hierarchy(pts, level):
    la = np.array([p[0] for p in pts])
    lo = np.array([p[1] for p in pts])
    full = s2lite.encode(la, lo, s2lite.MAX_LEVEL)
    direct = s2lite.encode(la, lo, level)
    assert np.array_equal(direct, s2lite.parent(full, level))
    assert np.array_equal(s2lite.face_of(direct), s2lite.face_of(full))


@SET
@given(st.lists(st.tuples(lat_s, lon_s), min_size=1, max_size=50), st.integers(0, 15))
def test_h3lite_parent_hierarchy(pts, res):
    la = np.array([p[0] for p in pts])
    lo = np.array([p[1] for p in pts])
    cells = h3lite.encode(la, lo, res)
    if res > 0:
        coarse = h3lite.parent(cells, res - 1)
        assert np.array_equal(coarse, h3lite.encode(la, lo, res - 1))


@SET
@given(lat_s, lon_s, st.floats(0.01, 1.5), st.integers(0, 9))
def test_h3lite_cover_contains_point(lat, lon, ext, res):
    """cover_bbox of a window around a point always contains the
    point's cell (a bounded window — a world-spanning bbox at res 15
    would enumerate billions of cells by design)."""
    cell = int(h3lite.encode(np.array([lat]), np.array([lon]), res)[0])
    cover = h3lite.cover_bbox(lon - ext, lat - ext, lon + ext, lat + ext, res)
    assert cell in set(cover.tolist())


@SET
@given(st.lists(st.tuples(st.floats(25, 49), st.floats(-124, -67)), min_size=1, max_size=40))
def test_albers_roundtrip_conus(pts):
    la = np.array([p[0] for p in pts])
    lo = np.array([p[1] for p in pts])
    x, y = albers.forward(lo, la)
    lo2, la2 = albers.inverse(x, y)
    assert np.abs(lo2 - lo).max() < 1e-9
    assert np.abs(la2 - la).max() < 1e-9


@SET
@given(
    st.lists(st.tuples(st.floats(-100, 100), st.floats(-100, 100)), min_size=3, max_size=8),
    st.floats(-50, 50), st.floats(-50, 50), st.floats(1, 60), st.floats(1, 60),
)
def test_clip_area_bounds(pts, cx0, cy0, w, h):
    """Clipped area is never negative and never exceeds either operand."""
    subject = np.asarray(pts, dtype=np.float64)
    clip = np.array([[cx0, cy0], [cx0 + w, cy0], [cx0 + w, cy0 + h], [cx0, cy0 + h]])
    ia = P.intersection_area_convex(subject, clip)
    a = abs(P.ring_area(subject))
    roi_a = w * h
    assert ia >= 0.0
    assert ia <= a + 1e-6 * max(1.0, a)
    assert ia <= roi_a + 1e-6 * roi_a
    # batch kernel agrees with the scalar kernel
    coords, offsets, _ = wkb.shells_packed([wkb.polygon_to_wkb([subject])])
    cc, co = P.batch_clip_convex(coords, offsets, clip)
    ia_b = float(np.abs(P.batch_signed_areas(cc, co))[0]) if len(co) > 1 else 0.0
    assert abs(ia_b - ia) <= 1e-6 * max(1.0, ia)


@SET
@given(st.lists(st.tuples(st.floats(-10, 10), st.floats(-10, 10)), min_size=1, max_size=64))
def test_convex_hull_contains_all_points(pts):
    arr = np.asarray(pts, dtype=np.float64)
    hull = P.convex_hull(arr)
    if len(hull) < 3:
        return
    assert P.points_in_ring(arr[:, 0], arr[:, 1], hull).all()
