"""Terrain raster operators over integer DEM grids: Horn hillshade,
overview pyramids, and marching-squares contour extraction.

The reference catalogs HAND/REM elevation rasters (load.py builds VRT +
tile manifests over them; query_geojson.py serves ROI reads). These are
the raster-side computations a 100 TB version of that catalog needs,
expressed in Catalyst on the (gx, gy, elev) cell-table layout shared
with operators/hydrology.py:

- **Horn hillshade** (hillshade_cells): the classic 3x3 kernel
  dz/dx = ((c+2f+i) - (a+2d+g)) / 8 — but with the sun direction held
  as an exact integer vector (1, 1, 2) so the whole expression needs NO
  trigonometry: shade = cos(normal, sun) =
  (16 - dzdx8 - dzdy8) / (sqrt(dzdx8^2 + dzdy8^2 + 64) * sqrt(6)).
  Every operation in that formula (integer +- *, sqrt, /, floor) is
  correctly rounded under IEEE-754, so Spark and the DuckDB oracle
  produce bit-identical doubles from the identical expression tree —
  no trig-ulp discretization slack needed. Aspect is reported as the
  integer octant of (dzdx8, dzdy8), pure sign/magnitude comparisons.
  Shape: ONE shuffle_hash self-join on the packed neighbor key with the
  8 offsets exploded on the build side (the d8_flow pattern), then one
  groupBy with the kernel folded into two weighted sums. Interior cells
  only (n_neighbors == 8), like every raster tool's edge rule.

- **Overview pyramid** (overview_pyramid): level L cells are 2^L x 2^L
  blocks of the base grid carrying sum/cnt/min/max — the parquet twin
  of GDAL .ovr / COG overviews the reference's VRT builder assumes.
  Computed HIERARCHICALLY: level L reduces level L-1 (4 rows), not the
  base grid, so total shuffled rows are n * (1/4 + 1/16 + ...) < n/3
  — at 10^12 cells the naive per-level full rescan would read the base
  L times. Sums/counts are BIGINT-exact; no floats anywhere.

- **Marching squares** (contour_segments): the raster->vector
  direction the reference only does for footprints (bounds -> polygon)
  — here full isoline extraction at integer threshold T. Each 2x2 cell
  square classifies its corners (z >= T) into a 4-bit case; the
  standard case table emits 0-2 segments whose endpoints sit on the
  crossed edges at the linear-interpolation parameter
  t = (T - za) / (zb - za). Saddles (cases 5/10) use the fixed
  "separate corners" rule, so output is deterministic without a center
  sample. Coordinates are emitted as floor(1000 * coord) BIGINTs; the
  single correctly-rounded division keeps Spark and DuckDB
  bit-identical. Shape: one shuffle_hash join to assemble the 2x2
  corners (3 exploded offsets), one explode of the per-case segment
  array — zero broadcast, zero Python, AQE-splittable, embarrassingly
  row-parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACK = 1 << 21


def _key(gx, gy):
    return gx * F.lit(_PACK) + gy


# ---------------------------------------------------------------- hillshade

# Sun vector (integer, unnormalized): east + north + 2 up.
SUN = (1, 1, 2)
_SUN_SQ = SUN[0] * SUN[0] + SUN[1] * SUN[1] + SUN[2] * SUN[2]


def hillshade_sql(dzdx8: str, dzdy8: str) -> str:
    """The oracle-side shade expression — SAME op tree as the Spark
    column built in hillshade_cells, so the doubles are bit-identical."""
    sx, sy, sz = SUN
    return (
        f"CAST(floor(1000000.0 * (({8 * sz} - {sx} * ({dzdx8}) - {sy} * ({dzdy8}))"
        f" / (sqrt(CAST(({dzdx8}) * ({dzdx8}) + ({dzdy8}) * ({dzdy8}) + 64.0"
        f" AS DOUBLE)) * sqrt({float(_SUN_SQ)})))) AS BIGINT)"
    )


def octant_sql(dzdx8: str, dzdy8: str) -> str:
    """Aspect octant of the downslope vector (-dzdx8, -dzdy8): the
    45-degree sector index k such that theta = atan2(y, x) falls in
    ((k-1)*45, k*45] degrees, with k = 0 covering [0, 45]; 8 = flat.
    Integer sign/magnitude comparisons only — exact, no atan2."""
    x, y = f"(-({dzdx8}))", f"(-({dzdy8}))"
    return f"""CASE
        WHEN ({dzdx8}) = 0 AND ({dzdy8}) = 0 THEN 8
        WHEN {x} > 0 AND {y} >= 0 AND {x} >= {y} THEN 0
        WHEN {y} > 0 AND {x} >= 0 AND {y} > {x} THEN 1
        WHEN {y} > 0 AND {x} < 0 AND {y} >= -{x} THEN 2
        WHEN {x} < 0 AND {y} >= 0 AND -{x} > {y} THEN 3
        WHEN {x} < 0 AND {y} < 0 AND -{x} >= -{y} THEN 4
        WHEN {y} < 0 AND {x} <= 0 AND -{y} > -{x} THEN 5
        WHEN {y} < 0 AND {x} > 0 AND -{y} >= {x} THEN 6
        ELSE 7 END"""


def hillshade_cells(cells: DataFrame) -> DataFrame:
    """``cells``(gx, gy, elev) -> (gx, gy, dzdx8, dzdy8, slope_sq,
    octant, shade_micro) for every INTERIOR cell (all 8 neighbors
    present). dzdx8/dzdy8 are the 8x-scaled Horn derivatives (exact
    BIGINT); shade_micro = floor(1e6 * shade)."""
    base = cells.select(
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        F.col("elev").cast("long").alias("elev"),
    )
    left = base.select(_key(F.col("gx"), F.col("gy")).alias("__cell"), "gx", "gy")
    # Horn weights: kx = dx * (2 - |dy|), ky = dy * (2 - |dx|)
    offsets = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(dx * (2 - abs(dy))).alias("kx"),
                F.lit(dy * (2 - abs(dx))).alias("ky"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
        ]
    )
    right = base.select(F.explode(offsets).alias("o"), "gx", "gy", "elev").select(
        _key(F.col("gx") - F.col("o.dx"), F.col("gy") - F.col("o.dy")).alias(
            "__cell"
        ),
        (F.col("o.kx") * F.col("elev")).alias("kx_e"),
        (F.col("o.ky") * F.col("elev")).alias("ky_e"),
    )
    sx, sy, sz = SUN
    agg = (
        left.hint("shuffle_hash")
        .join(right, "__cell")
        .groupBy("gx", "gy")
        .agg(
            F.sum("kx_e").alias("dzdx8"),
            F.sum("ky_e").alias("dzdy8"),
            F.count(F.lit(1)).alias("__n"),
        )
        .where(F.col("__n") == 8)
    )
    dzdx8, dzdy8 = F.col("dzdx8"), F.col("dzdy8")
    shade = F.floor(
        F.lit(1000000.0)
        * (
            (F.lit(8 * sz) - F.lit(sx) * dzdx8 - F.lit(sy) * dzdy8)
            / (
                F.sqrt((dzdx8 * dzdx8 + dzdy8 * dzdy8 + F.lit(64)).cast("double"))
                * F.sqrt(F.lit(float(_SUN_SQ)))
            )
        )
    ).cast("long")
    x, y = -dzdx8, -dzdy8
    octant = (
        F.when((dzdx8 == 0) & (dzdy8 == 0), 8)
        .when((x > 0) & (y >= 0) & (x >= y), 0)
        .when((y > 0) & (x >= 0) & (y > x), 1)
        .when((y > 0) & (x < 0) & (y >= -x), 2)
        .when((x < 0) & (y >= 0) & (-x > y), 3)
        .when((x < 0) & (y < 0) & (-x >= -y), 4)
        .when((y < 0) & (x <= 0) & (-y > -x), 5)
        .when((y < 0) & (x > 0) & (-y >= x), 6)
        .otherwise(7)
    )
    return agg.select(
        "gx",
        "gy",
        "dzdx8",
        "dzdy8",
        (dzdx8 * dzdx8 + dzdy8 * dzdy8).alias("slope_sq"),
        octant.cast("int").alias("octant"),
        shade.alias("shade_micro"),
    )


# ----------------------------------------------------------- overview pyramid


def overview_pyramid(cells: DataFrame, levels: int) -> DataFrame:
    """``cells``(gx, gy, elev) -> union of overview levels 1..levels:
    (lvl, gx, gy, z_sum, z_cnt, z_min, z_max) where level-L cell
    (gx, gy) covers base cells [gx*2^L, (gx+1)*2^L) x [same for gy).

    Hierarchical: each level reduces the PREVIOUS level's 4 children —
    sum-of-sums / min-of-mins — so the base table is scanned once.
    """
    if levels < 1:
        raise ValueError("levels must be >= 1")
    prev = cells.select(
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        F.col("elev").cast("long").alias("z_sum"),
        F.lit(1).cast("long").alias("z_cnt"),
        F.col("elev").cast("long").alias("z_min"),
        F.col("elev").cast("long").alias("z_max"),
    )
    out = None
    for lvl in range(1, levels + 1):
        prev = (
            prev.groupBy(
                F.floor(F.col("gx") / 2).alias("gx"),
                F.floor(F.col("gy") / 2).alias("gy"),
            )
            .agg(
                F.sum("z_sum").alias("z_sum"),
                F.sum("z_cnt").alias("z_cnt"),
                F.min("z_min").alias("z_min"),
                F.max("z_max").alias("z_max"),
            )
        )
        lv = prev.select(
            F.lit(lvl).cast("int").alias("lvl"),
            "gx",
            "gy",
            "z_sum",
            "z_cnt",
            "z_min",
            "z_max",
        )
        out = lv if out is None else out.unionByName(lv)
        # keep the lineage short: each level's plan would otherwise
        # nest L aggregates deep; 3-4 levels is fine without a
        # checkpoint, callers going deeper should localCheckpoint here
    return out


# ----------------------------------------------------------- marching squares

# Corner bits: b0 = (gx, gy), b1 = (gx+1, gy), b2 = (gx+1, gy+1),
# b3 = (gx, gy+1); case = b0 + 2*b1 + 4*b2 + 8*b3 with b = (z >= T).
# Edges: 0 = bottom (c0-c1), 1 = right (c1-c2), 2 = top (c3-c2),
# 3 = left (c0-c3). Saddle rule: cases 5/10 keep the two inside
# corners separate (union of the single-corner cases).
CASE_SEGMENTS: dict[int, list[tuple[int, int]]] = {
    0: [],
    1: [(3, 0)],
    2: [(0, 1)],
    3: [(3, 1)],
    4: [(1, 2)],
    5: [(3, 0), (1, 2)],
    6: [(0, 2)],
    7: [(3, 2)],
    8: [(2, 3)],
    9: [(0, 2)],
    10: [(0, 1), (2, 3)],
    11: [(1, 2)],
    12: [(3, 1)],
    13: [(0, 1)],
    14: [(3, 0)],
    15: [],
}


def contour_segments(cells: DataFrame, threshold: int) -> DataFrame:
    """``cells``(gx, gy, elev) -> one row per contour segment of the
    z = threshold isoline: (gx, gy, seg_idx, e1, e2, x1_mil, y1_mil,
    x2_mil, y2_mil) with milli-coordinates floor(1000 * coord).

    Only complete 2x2 squares emit (the bottom-left corner must have
    its E, N and NE neighbors)."""
    t = int(threshold)
    base = cells.select(
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        F.col("elev").cast("long").alias("elev"),
    )
    left = base.select(
        _key(F.col("gx"), F.col("gy")).alias("__cell"),
        "gx",
        "gy",
        F.col("elev").alias("z00"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(s).alias("slot"))
            for dx, dy, s in [(1, 0, 0), (0, 1, 1), (1, 1, 2)]
        ]
    )
    right = base.select(F.explode(offsets).alias("o"), "gx", "gy", "elev").select(
        _key(F.col("gx") - F.col("o.dx"), F.col("gy") - F.col("o.dy")).alias(
            "__cell"
        ),
        F.col("o.slot").alias("slot"),
        "elev",
    )
    sq = (
        left.hint("shuffle_hash")
        .join(right, "__cell")
        .groupBy("gx", "gy")
        .agg(
            F.first("z00").alias("z00"),
            F.max(F.when(F.col("slot") == 0, F.col("elev"))).alias("z10"),
            F.max(F.when(F.col("slot") == 1, F.col("elev"))).alias("z01"),
            F.max(F.when(F.col("slot") == 2, F.col("elev"))).alias("z11"),
            F.count(F.lit(1)).alias("__n"),
        )
        .where(F.col("__n") == 3)
    )
    b = lambda c: F.when(c >= t, 1).otherwise(0)  # noqa: E731
    sq = sq.withColumn(
        "case",
        (
            b(F.col("z00"))
            + F.lit(2) * b(F.col("z10"))
            + F.lit(4) * b(F.col("z11"))
            + F.lit(8) * b(F.col("z01"))
        ).cast("int"),
    )

    # crossing parameter along each edge (only consumed when the case
    # table says the edge is crossed, so the divisor is never zero)
    tt = F.lit(float(t))

    def frac(za, zb):
        return (tt - za.cast("double")) / (zb - za).cast("double")

    gx, gy = F.col("gx").cast("double"), F.col("gy").cast("double")
    # per-edge crossing point (x, y) in grid units
    ex = [
        gx + frac(F.col("z00"), F.col("z10")),  # bottom
        gx + F.lit(1.0),  # right
        gx + frac(F.col("z01"), F.col("z11")),  # top
        gx,  # left
    ]
    ey = [
        gy,  # bottom
        gy + frac(F.col("z10"), F.col("z11")),  # right
        gy + F.lit(1.0),  # top
        gy + frac(F.col("z00"), F.col("z01")),  # left
    ]

    def mil(c):
        return F.floor(F.lit(1000.0) * c).cast("long")

    expr = None
    for case, segs in CASE_SEGMENTS.items():
        if not segs:
            continue  # cases 0/15: when-chain falls through to NULL,
            # and explode(NULL) emits no rows — no empty-array literal
        arr = F.array(
            *[
                F.struct(
                    F.lit(i).alias("seg_idx"),
                    F.lit(e1).alias("e1"),
                    F.lit(e2).alias("e2"),
                    mil(ex[e1]).alias("x1_mil"),
                    mil(ey[e1]).alias("y1_mil"),
                    mil(ex[e2]).alias("x2_mil"),
                    mil(ey[e2]).alias("y2_mil"),
                )
                for i, (e1, e2) in enumerate(segs)
            ]
        )
        cond = F.col("case") == case
        expr = F.when(cond, arr) if expr is None else expr.when(cond, arr)
    out = sq.select(
        "gx", "gy", F.col("case").alias("ms_case"), F.explode(expr).alias("s")
    )
    return out.select(
        F.col("gx").alias("gx"),
        F.col("gy").alias("gy"),
        F.col("ms_case").alias("ms_case"),
        F.col("s.seg_idx").cast("int").alias("seg_idx"),
        F.col("s.e1").cast("int").alias("e1"),
        F.col("s.e2").cast("int").alias("e2"),
        F.col("s.x1_mil").alias("x1_mil"),
        F.col("s.y1_mil").alias("y1_mil"),
        F.col("s.x2_mil").alias("x2_mil"),
        F.col("s.y2_mil").alias("y2_mil"),
    )


# -------------------------------------------------------------- viewshed


def ray_viewshed(cells: DataFrame, ox: int, oy: int) -> DataFrame:
    """Line-of-sight visibility from the observer cell (ox, oy) along
    the 8 cardinal/diagonal rays: a cell at step k is visible iff its
    elevation angle (z - z0) / k STRICTLY exceeds the running maximum
    of all nearer cells on the same ray (ties occlude; step 1 is always
    visible since the running max starts at -infinity).

    ``cells``(gx, gy, elev) -> (ray, k, gx, gy, angle_micro, visible)
    for every on-ray cell. Ray membership is a pure filter
    (dx = 0, dy = 0, or |dx| = |dy|), so the whole operator is one
    windowed pass — ONE keyed shuffle on (ray), no joins, no Python.
    The angle is one correctly-rounded IEEE division of exact integers
    and the running max is order-exact (max is associative), so the
    DuckDB oracle with the identical window is bit-identical.

    The dividing (z - z0) by the STEP count k (not Euclidean distance)
    is exact for occlusion: along any single ray the true distance is
    k or k * sqrt(2) uniformly, so the constant factor cancels in every
    comparison.
    """
    from pyspark.sql import Window

    base = cells.select(
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        F.col("elev").cast("long").alias("elev"),
    )
    z0 = base.where(
        (F.col("gx") == ox) & (F.col("gy") == oy)
    ).select(F.col("elev").alias("z0"))
    dx = F.col("gx") - F.lit(int(ox))
    dy = F.col("gy") - F.lit(int(oy))
    on_ray = (
        ((dx != 0) | (dy != 0))
        & ((dx == 0) | (dy == 0) | (F.abs(dx) == F.abs(dy)))
    )
    sgn = lambda c: F.when(c > 0, 1).when(c < 0, -1).otherwise(0)  # noqa: E731
    ray = (sgn(dx) + 1) * 3 + (sgn(dy) + 1)  # 0..8 skipping 4 (origin)
    k = F.greatest(F.abs(dx), F.abs(dy))
    rays = (
        base.where(on_ray)
        .crossJoin(F.broadcast(z0))  # 1-row scalar
        .select(
            ray.cast("int").alias("ray"),
            k.cast("long").alias("k"),
            "gx",
            "gy",
            (
                (F.col("elev") - F.col("z0")).cast("double")
                / k.cast("double")
            ).alias("angle"),
        )
    )
    w = (
        Window.partitionBy("ray")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.max("angle").over(w)
    return rays.select(
        "ray",
        "k",
        "gx",
        "gy",
        F.floor(F.lit(1000000.0) * F.col("angle")).cast("long").alias(
            "angle_micro"
        ),
        F.when(prior.isNull(), F.lit(True))
        .otherwise(F.col("angle") > prior)
        .alias("visible"),
    )
