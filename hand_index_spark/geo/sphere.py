"""Great-circle (haversine) geometry on the sphere.

Everything else in the engine's spatial-join family works on planar
integer coordinates (Albers meters — geo/albers.py) where the distance
refine is exact BIGINT arithmetic. Geotagged web pages, though, arrive
as raw WGS84 lat/lon, and "all pages within R meters" across a
continental corpus cannot be answered in one projected plane without
distortion — the classic catalog-engine gap the reference sidesteps by
always projecting first (load.py uses EPSG:5070 for CONUS only). This
module closes it with the standard spherical model: haversine distance
on a sphere of radius 6 371 000 m.

Oracle-parity design (the engine-wide trig rule, see albers.py):
JVM ``Math`` and DuckDB's libm can differ in the last 1-2 ulp on
sin/cos/asin, so raw distance doubles are never compared or output.
Both the band predicate and the output discretize to FLOOR whole
meters, with the operation order written identically on both sides —
a flip would need the true distance within ~1 ulp (~1e-10 m here) of
an integer-meter boundary, which the pinned synthetic fixtures verify
does not happen.

Candidate generation is pure integer arithmetic on milli-degree
coordinates (exactly like the planar grid in operators/distance_join):
latitude cells of ``ceil(R / 111.0)`` milli-degrees (meridian arc on
the 6371 km sphere is ~111 194.9 m/deg, so 111 000 is conservative)
and longitude cells of ``ceil(R / 55.0)`` milli-degrees (valid for
|lat| <= 60 deg where cos(lat) >= 0.5; callers must bound their data,
and the fixture does). Any pair within R then differs by at most one
cell in each axis, so the 3x3-neighborhood equi-join is complete —
ONE shuffle on the packed cell key, zero broadcast, zero Python,
AQE-splittable on hot cells. The only float work is the refine.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0
MAX_ABS_LAT_MILLIDEG = 60000  # cos(lat) >= 0.5 bound for the lon cells

_NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _rad(millideg: Column) -> Column:
    # ((md / 1000.0) * pi) / 180.0 — same left-assoc order as the SQL
    return ((millideg / F.lit(1000.0)) * F.lit(math.pi)) / F.lit(180.0)


def _rad_sql(expr: str) -> str:
    return f"((({expr}) / 1000.0) * pi()) / 180.0"


def haversine_floor_meters(
    lat1_md: Column, lon1_md: Column, lat2_md: Column, lon2_md: Column
) -> Column:
    """Great-circle distance in FLOOR whole meters between two
    milli-degree integer coordinate pairs. Operation order mirrors
    :func:`haversine_floor_meters_sql` term for term."""
    p1, p2 = _rad(lat1_md), _rad(lat2_md)
    s1 = F.sin((p2 - p1) / F.lit(2.0))
    s2 = F.sin((_rad(lon2_md) - _rad(lon1_md)) / F.lit(2.0))
    hav = (s1 * s1) + ((F.cos(p1) * F.cos(p2)) * (s2 * s2))
    d = (F.lit(2.0) * F.asin(F.sqrt(hav))) * F.lit(EARTH_RADIUS_M)
    return F.floor(d).cast("long")


def haversine_floor_meters_sql(
    lat1: str, lon1: str, lat2: str, lon2: str
) -> str:
    """DuckDB twin of :func:`haversine_floor_meters` (identical IEEE
    operation order; floor() before the cast because DuckDB's
    CAST(double AS BIGINT) rounds)."""
    p1, p2 = _rad_sql(lat1), _rad_sql(lat2)
    l1, l2 = _rad_sql(lon1), _rad_sql(lon2)
    s1 = f"sin((({p2}) - ({p1})) / 2.0)"
    s2 = f"sin((({l2}) - ({l1})) / 2.0)"
    hav = f"(({s1}) * ({s1})) + ((cos({p1}) * cos({p2})) * (({s2}) * ({s2})))"
    return (
        f"CAST(floor((2.0 * asin(sqrt({hav}))) * {EARTH_RADIUS_M!r}) "
        "AS BIGINT)"
    )


def geodesic_band_pairs(
    points: DataFrame,
    id_col: str,
    lat_md: str,
    lon_md: str,
    radius_m: int,
) -> DataFrame:
    """All unordered pairs (a_id < b_id) of ``points`` within
    ``radius_m`` great-circle meters (on the floor-meter scale), as
    (a_id, b_id, meters). Coordinates are integer milli-degrees with
    |lat| <= 60 deg.

    Same one-shuffle grid shape as
    :func:`operators.distance_join.distance_band_pairs`; see module
    docstring for the cell-size completeness argument.
    """
    dlat = -(-radius_m // 111)  # ceil(R / 111.0) in millidegrees
    dlon = -(-radius_m // 55)

    cx = F.expr(f"(`{lon_md}` + 180000) div {dlon}")
    cy = F.expr(f"(`{lat_md}` + 90000) div {dlat}")
    base = points.withColumn("__cx", cx).withColumn("__cy", cy)

    left = base.select(
        F.col(id_col).alias("a_id"),
        F.col(lat_md).alias("alat"),
        F.col(lon_md).alias("alon"),
        (F.col("__cx") * F.lit(1 << 21) + F.col("__cy")).alias("__cell"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx, dy in _NEIGHBOR_OFFSETS
        ]
    )
    right = base.select(
        F.col(id_col).alias("b_id"),
        F.col(lat_md).alias("blat"),
        F.col(lon_md).alias("blon"),
        F.explode(offsets).alias("o"),
        F.col("__cx"),
        F.col("__cy"),
    ).select(
        "b_id",
        "blat",
        "blon",
        (
            (F.col("__cx") + F.col("o.ox")) * F.lit(1 << 21)
            + (F.col("__cy") + F.col("o.oy"))
        ).alias("__cell"),
    )

    meters = haversine_floor_meters(
        F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon")
    )
    # both sides are the same corpus: pin the shuffled hash join, never
    # broadcast (operators/distance_join.py measured this faster too)
    return (
        left.hint("shuffle_hash")
        .join(right, "__cell")
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("meters", meters)
        .where(F.col("meters") <= F.lit(int(radius_m)))
        .select("a_id", "b_id", "meters")
    )


# ------------------------------------------------------------ polygon area


def spherical_ring_area(rings: DataFrame, ring_id: str = "ring_id") -> DataFrame:
    """Geodesic polygon area (Chamberlain & Duquette, "Some algorithms
    for polygons on a sphere", JPL): for a closed ring of milli-degree
    vertices (pos-ordered, exterior not crossing the antimeridian),

        area = | sum_i (lam_{i+1} - lam_i) * (2 + sin(phi_i)
                                                + sin(phi_{i+1})) |
               * R^2 / 2

    (divisor derivation: a [phs, phn] x [lw, le] rectangle's term sum
    is 2 * dlam * (sin phn - sin phs), and its true spherical area is
    R^2 * dlam * (sin phn - sin phs) — pinned by the analytic pytest)

    ``rings``(ring_id, pos, lat_md, lon_md) -> (ring_id, n_vertices,
    area_floor_sqm). The term sum folds LEFT-ASSOCIATIVELY over the
    pos-sorted vertex list (the engine-wide ordered-sum rule) and the
    result floors to whole square meters with the identical operation
    order as :func:`spherical_ring_area_sql_terms`, so Spark and the
    DuckDB oracle agree despite the sin() calls (the trig-ulp rule:
    a flip needs the true area within ~1 ulp of an integer boundary).
    One groupBy — no join, no Python; at any scale the cost is one
    keyed shuffle of the vertex table.
    """
    g = rings.groupBy(F.col(ring_id).alias("ring_id")).agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "lat_md", "lon_md"))
        ).alias("vs")
    )
    n = F.size("vs")

    def term(i):
        a = F.element_at(F.col("vs"), i + 1)
        b = F.element_at(F.col("vs"), ((i + 1) % n) + 1)
        lam1, lam2 = _rad(a["lon_md"]), _rad(b["lon_md"])
        ph1, ph2 = _rad(a["lat_md"]), _rad(b["lat_md"])
        return (lam2 - lam1) * (F.lit(2.0) + F.sin(ph1) + F.sin(ph2))

    total = F.aggregate(
        F.transform(F.sequence(F.lit(0), n - 1), term),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    half_r2 = EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0
    return g.select(
        "ring_id",
        n.cast("long").alias("n_vertices"),
        F.floor(F.abs(total) * F.lit(half_r2)).cast("long").alias(
            "area_floor_sqm"
        ),
    )


def spherical_ring_area_sql_terms(vs: str) -> str:
    """DuckDB twin: ``vs`` is a pos-sorted LIST of
    struct(pos, lat_md, lon_md); returns the area_floor_sqm expression
    with the identical operation order (list_sum is the verified
    left-assoc fold; see operators/interpolate.py)."""
    n = f"len({vs})"

    def lat(e):
        return _rad_sql(f"{e}.lat_md")

    def lon(e):
        return _rad_sql(f"{e}.lon_md")

    a, b = f"{vs}[i + 1]", f"{vs}[((i + 1) % {n}) + 1]"
    term = (
        f"(({lon(b)}) - ({lon(a)}))"
        f" * ((2.0 + sin({lat(a)})) + sin({lat(b)}))"
    )
    total = f"list_sum(list_transform(range(0, {n}), i -> {term}))"
    half_r2 = EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0
    return f"CAST(floor(abs({total}) * {half_r2!r}) AS BIGINT)"
