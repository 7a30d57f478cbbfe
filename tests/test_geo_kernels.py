"""Geometry-kernel unit tests (pure NumPy, no Spark) — SURVEY.md §5.2 item 1."""

from __future__ import annotations

import numpy as np
import pytest

from hand_index_spark.geo import albers, cells, polygon as P, s2lite, wkb

SQ = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])  # 4x3 rect
TRI = np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]])


# ------------------------------------------------------------------- wkb


def test_wkb_polygon_roundtrip():
    buf = wkb.polygon_to_wkb([SQ])
    t, rings = wkb.parse_wkb(buf)
    assert t == wkb.WKB_POLYGON
    assert np.allclose(rings[0][:-1], SQ)
    assert np.allclose(rings[0][0], rings[0][-1])


def test_wkb_multipolygon_roundtrip_and_shells():
    buf = wkb.multipolygon_to_wkb([[SQ], [TRI + 10.0]])
    t, polys = wkb.parse_wkb(buf)
    assert t == wkb.WKB_MULTIPOLYGON and len(polys) == 2
    sh = wkb.shells(buf)
    assert len(sh) == 2
    assert np.allclose(sh[1][:-1], TRI + 10.0)


def test_wkb_point_and_bytearray_coercion():
    buf = bytearray(wkb.point_to_wkb(1.5, -2.5))
    t, xy = wkb.parse_wkb(buf)
    assert t == wkb.WKB_POINT and tuple(xy) == (1.5, -2.5)


def test_wkb_big_endian_and_z_drop():
    import struct

    # hand-built big-endian 3D point (ISO Z type = 1001)
    buf = struct.pack(">BIddd", 0, 1001, 3.0, 4.0, 99.0)
    t, xy = wkb.parse_wkb(buf)
    assert t == wkb.WKB_POINT and tuple(xy) == (3.0, 4.0)


# --------------------------------------------------------------- polygon


def test_shoelace_area_and_centroid():
    assert P.ring_area(SQ) == pytest.approx(12.0)
    assert P.ring_area(SQ[::-1]) == pytest.approx(-12.0)
    assert P.polygon_area([SQ, TRI]) == pytest.approx(12.0 - 2.0)
    cx, cy = P.ring_centroid(SQ)
    assert (cx, cy) == (pytest.approx(2.0), pytest.approx(1.5))
    cx, cy = P.ring_centroid(TRI)
    assert (cx, cy) == (pytest.approx(2.0 / 3.0), pytest.approx(2.0 / 3.0))


def test_pip_labeled_points():
    px = np.array([2.0, 4.5, 0.0, 4.0, 2.0, -0.1])
    py = np.array([1.0, 1.0, 0.0, 3.0, 3.0, 1.0])
    got = P.points_in_ring(px, py, SQ)
    #            inside out   corner corner edge  out
    assert got.tolist() == [True, False, True, True, True, False]


def test_pip_concave():
    # U-shape: notch from above
    u = np.array([[0, 0], [6, 0], [6, 4], [4, 4], [4, 2], [2, 2], [2, 4], [0, 4]], dtype=float)
    px = np.array([1.0, 3.0, 5.0, 3.0])
    py = np.array([3.0, 3.0, 3.0, 1.0])
    assert P.points_in_ring(px, py, u).tolist() == [True, False, True, True]


def test_clip_known_overlap_areas():
    # unit squares offset by 0.5 -> overlap 0.25
    a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    b = a + 0.5
    assert P.intersection_area_convex(a, b) == pytest.approx(0.25)
    # disjoint
    assert P.intersection_area_convex(a, a + 5.0) == pytest.approx(0.0)
    # contained
    inner = a * 0.5 + 0.25
    assert P.intersection_area_convex(inner, a) == pytest.approx(0.25)
    # unit square fully inside triangle (hypotenuse touches (1,1))
    assert P.intersection_area_convex(a, TRI) == pytest.approx(1.0)
    # half-overlap: square shifted so the hypotenuse bisects it
    c = a + np.array([0.5, 0.5])  # corners (0.5,0.5)..(1.5,1.5), x+y=2 diagonal
    assert P.intersection_area_convex(c, TRI) == pytest.approx(0.5)


def test_rings_intersect_cases():
    a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    assert P.rings_intersect(a, a + 0.5)
    assert not P.rings_intersect(a, a + 5.0)
    assert P.rings_intersect(a, a * 0.2 + 0.4)  # containment
    assert P.rings_intersect(a, a + 1.0)  # corner touch
    # edge-crossing without vertex containment (plus shape)
    h = np.array([[-1, 0.4], [2, 0.4], [2, 0.6], [-1, 0.6]], dtype=float)
    assert P.rings_intersect(a, h)


def test_douglas_peucker_known_reduction():
    # collinear midpoints vanish at any positive tolerance
    ring = np.array([[0, 0], [1, 0.001], [2, 0], [2, 1], [1, 1.001], [0, 1]], dtype=float)
    out = P.douglas_peucker(ring, 0.01)
    assert len(out) == 5  # 4 corners + closure
    assert P.ring_area(out) == pytest.approx(P.ring_area(ring), rel=0.01)
    # tolerance below the deviation keeps everything
    out2 = P.douglas_peucker(ring, 0.0001)
    assert len(out2) == 7


# ---------------------------------------------------------------- albers


def test_albers_origin_and_roundtrip():
    x, y = albers.forward(np.array([albers.LON0]), np.array([albers.LAT0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    rng = np.random.default_rng(7)
    lon = rng.uniform(-125, -66, 200)
    lat = rng.uniform(24, 50, 200)
    x, y = albers.forward(lon, lat)
    lon2, lat2 = albers.inverse(x, y)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)


def test_albers_equal_area_property():
    # a 1-degree cell at two latitudes: projected areas must match true
    # ellipsoidal authalic areas (equal-area projection) within 0.1%
    def cell_area(lon0, lat0):
        ring_ll = np.array(
            [[lon0, lat0], [lon0 + 1, lat0], [lon0 + 1, lat0 + 1], [lon0, lat0 + 1]]
        )
        # densify edges so projected edges curve correctly
        dens = []
        for i in range(4):
            a, b = ring_ll[i], ring_ll[(i + 1) % 4]
            for t in np.linspace(0, 1, 50, endpoint=False):
                dens.append(a + t * (b - a))
        dens = np.array(dens)
        x, y = albers.forward(dens[:, 0], dens[:, 1])
        return abs(P.ring_area(np.column_stack([x, y])))

    a30 = cell_area(-100, 30)
    a45 = cell_area(-100, 45)

    # exact ellipsoidal area of a 1x1 degree cell: a^2 * dlam * (q1-q0)/2
    import math

    def ell(lat0):
        q0 = albers._q(np.array([math.sin(math.radians(lat0))]))[0]
        q1 = albers._q(np.array([math.sin(math.radians(lat0 + 1))]))[0]
        return (math.pi / 180.0) * albers.A * albers.A * (q1 - q0) / 2.0

    assert a30 / ell(30) == pytest.approx(1.0, rel=1e-4)
    assert a45 / ell(45) == pytest.approx(1.0, rel=1e-4)


# ----------------------------------------------------------------- cells


def test_h3lite_hierarchy_and_bounds():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-89, 89, 500)
    lon = rng.uniform(-179, 179, 500)
    c9 = cells.encode(lat, lon, 9)
    c5 = cells.encode(lat, lon, 5)
    assert np.array_equal(cells.parent(c9, 5), c5)
    # bounds contain the encoding point
    for k in [0, 17, 499]:
        lon0, lat0, lon1, lat1 = cells.cell_bounds(int(c9[k]))
        assert lon0 <= lon[k] < lon1 and lat0 <= lat[k] < lat1
    res, _, _ = cells.decompose(c9)
    assert np.all(res == 9)
    assert np.all(c9 > 0)


def test_h3lite_cover_and_ring():
    cv = cells.cover_bbox(-100.0, 40.0, -99.0, 41.0, 5)
    # 1 degree at res5 = 32 cells/side -> 33x33 incl. boundary cells
    assert len(cv) == 33 * 33
    center = int(cells.encode(np.array([40.5]), np.array([-99.5]), 5)[0])
    assert center in set(int(c) for c in cv)
    rg = cells.ring(center, 1)
    assert len(rg) == 9 and center in set(int(c) for c in rg)


def test_s2_properties():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-85, 85, 1000)
    lon = rng.uniform(-179, 179, 1000)
    c = s2lite.encode(lat, lon)
    assert np.all(c & 1 == 1)  # leaf sentinel
    assert s2lite.level_of(int(c[0])) == 30
    p10 = s2lite.parent(c, 10)
    assert s2lite.level_of(int(p10[0])) == 10
    # hierarchy: encoding directly at level 10 == parent of leaf at 10
    c10 = s2lite.encode(lat, lon, 10)
    assert np.array_equal(c10, p10)
    # face correctness for cardinal directions
    assert s2lite.face_of(s2lite.encode(np.array([0.0]), np.array([0.0])))[0] == 0
    assert s2lite.face_of(s2lite.encode(np.array([0.0]), np.array([90.0])))[0] == 1
    assert s2lite.face_of(s2lite.encode(np.array([89.9]), np.array([0.0])))[0] == 2
    assert s2lite.face_of(s2lite.encode(np.array([0.0]), np.array([180.0])))[0] == 3
    assert s2lite.face_of(s2lite.encode(np.array([0.0]), np.array([-90.0])))[0] == 4
    assert s2lite.face_of(s2lite.encode(np.array([-89.9]), np.array([0.0])))[0] == 5
    # locality: two points 0.001 deg apart share a coarse ancestor
    a = s2lite.encode(np.array([37.0]), np.array([-100.0]))
    b = s2lite.encode(np.array([37.001]), np.array([-100.001]))
    assert s2lite.parent(a, 8)[0] == s2lite.parent(b, 8)[0]
    # determinism
    assert np.array_equal(c, s2lite.encode(lat, lon))


def test_s2_hilbert_locality_monotone_on_face():
    # points along a tiny path should produce nearby curve positions
    lat = np.full(100, 30.0)
    lon = np.linspace(-100.0, -99.999, 100)
    c = s2lite.encode(lat, lon)
    # all on same face, positions vary but stay within a small band
    pos = (c >> np.int64(1)) & ((np.int64(1) << np.int64(60)) - np.int64(1))
    spread = pos.max() - pos.min()
    assert spread < np.int64(1) << np.int64(34)  # tight band for ~100m extent


# ------------------------------------------------------------- dissolve


def test_dissolve_l_shape_exact_vs_hull():
    """VERDICT r2 item 4: an L-shaped branch (two rectangles sharing a
    vertex-matched edge) must dissolve to the exact concave boundary —
    area 3.0 — while the convex hull inflates to 3.5."""
    from hand_index_spark.geo import polygon as P

    a = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [0, 1]], float)  # CCW
    b = np.array([[0, 1], [1, 1], [1, 2], [0, 2]], float)  # CCW
    rings = P.dissolve_rings([a, b])
    assert rings is not None and len(rings) == 1
    (ring,) = rings
    assert abs(P.ring_area(ring) - 3.0) == 0.0  # exact
    # boundary is the exact L hexagon (7 distinct vertices incl. the
    # edge-split point (1,1) which is a true corner of the L)
    assert len(ring) == 7
    hull = P.convex_hull(np.concatenate([a, b], axis=0))
    assert P.ring_area(hull) > 3.0  # hull over-approximates (3.5)
    # member order must not matter
    rings2 = P.dissolve_rings([b, a])
    assert np.array_equal(rings2[0], ring)
    # CW input members are normalized
    rings3 = P.dissolve_rings([a[::-1], b])
    assert np.array_equal(rings3[0], ring)


def test_dissolve_ring_with_hole():
    """A 3x3 tiling minus the center tile dissolves to an outer square
    (CCW, area 9) plus a CW hole (area -1): net exact area 8."""
    from hand_index_spark.geo import polygon as P

    tiles = []
    for i in range(3):
        for j in range(3):
            if (i, j) == (1, 1):
                continue
            tiles.append(
                np.array(
                    [[i, j], [i + 1, j], [i + 1, j + 1], [i, j + 1]], float
                )
            )
    rings = P.dissolve_rings(tiles)
    assert rings is not None and len(rings) == 2
    areas = sorted(P.ring_area(r) for r in rings)
    assert areas == [-1.0, 9.0]


def test_dissolve_rejects_overlap_and_duplicates():
    from hand_index_spark.geo import polygon as P

    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    # duplicated member: same directed edges twice -> not a tiling
    assert P.dissolve_rings([sq, sq]) is None
    # fan triangulation of the fixture world dissolves back to the quad
    from hand_index_spark.tables.datagen import _fan_triangles, branch_quads_5070

    for k in (2, 3, 4):
        tid, _, quad = branch_quads_5070()[k]
        tris = _fan_triangles(quad, k)
        rings = P.dissolve_rings(tris)
        assert rings is not None and len(rings) == 1
        aq = abs(P.ring_area(quad))
        assert abs(abs(P.ring_area(rings[0])) - aq) < 1e-12 * aq


def test_union_branches_dissolve_feeds_pipeline(spark):
    """union_branches over an L-shaped 2-member branch: exact dissolved
    area/bbox/centroid (not hull-inflated)."""
    from hand_index_spark.geo import wkb as W
    from hand_index_spark.operators.union_agg import union_branches

    a = np.array([[0, 0], [200, 0], [200, 100], [100, 100], [0, 100]], float)
    b = np.array([[0, 100], [100, 100], [100, 200], [0, 200]], float)
    df = spark.createDataFrame(
        [("br/1/", bytearray(W.polygon_to_wkb([a]))),
         ("br/1/", bytearray(W.polygon_to_wkb([b])))],
        "branch_path string, geom binary",
    )
    row = union_branches(df, simplify_tol=0.0).collect()[0]
    assert row.geom_count == 2
    assert (row.xmin, row.ymin, row.xmax, row.ymax) == (0.0, 0.0, 200.0, 200.0)
    # exact centroid of the L (area 3a^2 with a=100): ((a/6)*5, (a/6)*5)
    # computed analytically: Cx = Cy = 250/3 for this L
    assert abs(row.cx - 250.0 / 3.0) < 1e-9
    assert abs(row.cy - 250.0 / 3.0) < 1e-9
    ring = np.array(row.coords_flat).reshape(-1, 2)
    from hand_index_spark.geo import polygon as P

    assert abs(P.ring_area(ring) - 30000.0) == 0.0


def test_overlay_union_exact_areas():
    """True union for GENUINELY OVERLAPPING members (round-5 kernel,
    geo/polygon.overlay_union): exact areas on the canonical cases."""
    from hand_index_spark.geo import polygon as P

    sq = lambda x0, y0, s: np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float
    )

    def total(rings):
        return sum(P.ring_area(r) for r in rings)

    # two 2x2 squares offset by (1,1): 4 + 4 - 1 = 7
    u = P.overlay_union([sq(0, 0, 2), sq(1, 1, 2)])
    assert u is not None and total(u) == 7.0 and len(u) == 1
    # identical stacked squares collapse to one
    u = P.overlay_union([sq(0, 0, 2), sq(0, 0, 2)])
    assert u is not None and total(u) == 4.0 and len(u) == 1
    # L over a square: 5 + 4 - 3 = 6
    L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3]], float)
    u = P.overlay_union([L, sq(0, 0, 2)])
    assert u is not None and total(u) == 6.0 and len(u) == 1
    # crossing rectangles (plus sign): 3 + 3 - 1 = 5
    r1 = np.array([[0, 1], [3, 1], [3, 2], [0, 2]], float)
    r2 = np.array([[1, 0], [2, 0], [2, 3], [1, 3]], float)
    u = P.overlay_union([r1, r2])
    assert u is not None and total(u) == 5.0 and len(u) == 1
    # overlap creating a HOLE: U-shape + cap -> outer 9 CCW, hole -1.5 CW
    U = np.array(
        [[0, 0], [3, 0], [3, 3], [2, 3], [2, 1], [1, 1], [1, 3], [0, 3]], float
    )
    cap = np.array([[0, 2.5], [3, 2.5], [3, 3], [0, 3]], float)
    u = P.overlay_union([U, cap])
    assert u is not None and total(u) == 7.5
    assert sorted(round(P.ring_area(r), 9) for r in u) == [-1.5, 9.0]
    # edge-matched tiling also works (strict generalization of dissolve)
    u = P.overlay_union([sq(0, 0, 1), sq(1, 0, 1)])
    assert u is not None and total(u) == 2.0 and len(u) == 1
    # 3-way overlap
    u = P.overlay_union([sq(0, 0, 2), sq(1, 0, 2), sq(0.5, 1, 2)])
    assert u is not None and abs(total(u) - 8.0) < 1e-12


def test_union_branches_overlap_uses_overlay_not_hull(spark):
    """Overlapping branch members now dissolve through the overlay
    kernel (union_method='overlay') with the exact concave area — the
    convex hull would report 8.0 for this L-shaped union, not 7.0."""
    from hand_index_spark.geo import polygon as P
    from hand_index_spark.geo import wkb as W
    from hand_index_spark.operators.union_agg import union_branches

    a = np.array([[0, 0], [200, 0], [200, 200], [0, 200]], float)
    b = np.array([[100, 100], [300, 100], [300, 300], [100, 300]], float)
    df = spark.createDataFrame(
        [("br/ov/", bytearray(W.polygon_to_wkb([a]))),
         ("br/ov/", bytearray(W.polygon_to_wkb([b])))],
        "branch_path string, geom binary",
    )
    row = union_branches(df, simplify_tol=0.0).collect()[0]
    assert row.union_method == "overlay"
    ring = np.array(row.coords_flat).reshape(-1, 2)
    # union area = 4e4 + 4e4 - 1e4 = 7e4 (hull would be 8.66e4+)
    assert abs(abs(P.ring_area(ring)) - 70000.0) < 1e-9
    assert (row.xmin, row.ymin, row.xmax, row.ymax) == (0.0, 0.0, 300.0, 300.0)


def test_overlay_union_property_random_rect_sets():
    """Property: for random INTEGER axis-aligned rectangle sets, the
    overlay union's total signed area equals the exact union area from
    coordinate-compression sweep (an independent oracle: strips between
    sorted x-cuts, covered y-intervals merged per strip). Exercises
    proper crossings, T-junctions, collinear overlaps, containment,
    duplicates and disjoint parts in one sweep."""
    import random

    from hand_index_spark.geo import polygon as P

    rng = random.Random(20260817)

    def exact_union_area(rects):
        xs = sorted({r[0] for r in rects} | {r[2] for r in rects})
        total = 0.0
        for x0, x1 in zip(xs[:-1], xs[1:]):
            xm = (x0 + x1) / 2.0
            ivals = sorted(
                (r[1], r[3]) for r in rects if r[0] <= xm <= r[2]
            )
            covered = 0.0
            cur0 = cur1 = None
            for y0, y1 in ivals:
                if cur1 is None or y0 > cur1:
                    if cur1 is not None:
                        covered += cur1 - cur0
                    cur0, cur1 = y0, y1
                else:
                    cur1 = max(cur1, y1)
            if cur1 is not None:
                covered += cur1 - cur0
            total += covered * (x1 - x0)
        return total

    failures = []
    for case in range(60):
        n = rng.randint(2, 6)
        rects = []
        for _ in range(n):
            x0 = rng.randint(0, 12)
            y0 = rng.randint(0, 12)
            rects.append((x0, y0, x0 + rng.randint(1, 8), y0 + rng.randint(1, 8)))
        rings = [
            np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)
            for x0, y0, x1, y1 in rects
        ]
        u = P.overlay_union(rings)
        want = exact_union_area(rects)
        if u is None:
            failures.append((case, rects, "None", want))
            continue
        got = sum(P.ring_area(r) for r in u)
        if abs(got - want) > 1e-9:
            failures.append((case, rects, got, want))
    assert not failures, failures[:3]
