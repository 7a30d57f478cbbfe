"""Map matching: snap points to the nearest polyline segment within a
radius (GPS trace -> road network, gauge -> reach line, crawl geotag ->
admin boundary edge).

The candidate stage is the engine's standard grid join — segments
explode to the R-sized cells of their bbox EXPANDED by R (so every
point within true distance R shares a cell key), points carry their one
cell — a single shuffled-hash equi-join on the packed key, zero
broadcast, AQE-skew-splittable, the 100 TB shape. The refine stage is
exact: with integer coordinates, the squared point-to-segment distance
is the rational

    d2 = num / len2,   len2 = |b - a|^2
    num = |p - a|^2 * len2 - dot^2          (0 <= dot <= len2)
        = |p - a|^2 * len2                  (dot <= 0,    clamp to a)
        = |p - b|^2 * len2                  (dot >= len2, clamp to b)

with dot = (p - a) . (b - a) — all BIGINT-exact (candidates are
radius-bounded, so num stays far below 2^63 for city-scale integer
grids; see the caller contract below). The within-radius predicate
``num <= R^2 * len2`` is therefore exact. The per-point argmin orders
by the IEEE double num/len2 (one correctly-rounded division — both
engines compute the identical value) with seg_id as the total-order
tiebreak, so the winner is deterministic and the DuckDB oracle replays
it bit-for-bit.

Caller contract: non-negative integer coordinates; segment endpoints
distinct (degenerate segments are filtered out); coordinate magnitude
small enough that |p - a|^2 * len2 fits BIGINT for radius-bounded
candidates (|w|^2 <= ~(2R + seg_extent)^2, len2 <= seg_extent^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACK = 1 << 21


def snap_to_segments(
    points: DataFrame,
    segments: DataFrame,
    radius: int,
) -> DataFrame:
    """``points``(p_id, px, py) x ``segments``(seg_id, x1, y1, x2, y2)
    -> per point the nearest segment within ``radius``:
    (p_id, seg_id, d2_micro, t_micro, sx_mil, sy_mil) where t is the
    clamped projection parameter along the segment and (sx, sy) the
    snapped coordinate, both floor-scaled."""
    r = int(radius)
    pts = points.select(
        F.col("p_id").cast("long").alias("p_id"),
        F.col("px").cast("long").alias("px"),
        F.col("py").cast("long").alias("py"),
    ).withColumn(
        "__cell",
        F.expr(f"(px div {r}) * {_PACK} + (py div {r})"),
    )
    segs = segments.select(
        F.col("seg_id").cast("long").alias("seg_id"),
        F.col("x1").cast("long").alias("x1"),
        F.col("y1").cast("long").alias("y1"),
        F.col("x2").cast("long").alias("x2"),
        F.col("y2").cast("long").alias("y2"),
    ).where((F.col("x1") != F.col("x2")) | (F.col("y1") != F.col("y2")))
    # cells of the R-expanded bbox: any point with true distance <= R
    # from the segment lies inside it, hence shares a cell key
    seg_cells = (
        segs.withColumn(
            "__cx",
            F.explode(
                F.sequence(
                    F.expr(f"(least(x1, x2) - {r}) div {r}"),
                    F.expr(f"(greatest(x1, x2) + {r}) div {r}"),
                )
            ),
        )
        .withColumn(
            "__cy",
            F.explode(
                F.sequence(
                    F.expr(f"(least(y1, y2) - {r}) div {r}"),
                    F.expr(f"(greatest(y1, y2) + {r}) div {r}"),
                )
            ),
        )
        .withColumn("__cell", F.col("__cx") * F.lit(_PACK) + F.col("__cy"))
        .drop("__cx", "__cy")
    )
    cand = pts.hint("shuffle_hash").join(seg_cells, "__cell")
    dx, dy = F.col("x2") - F.col("x1"), F.col("y2") - F.col("y1")
    wx, wy = F.col("px") - F.col("x1"), F.col("py") - F.col("y1")
    vx, vy = F.col("px") - F.col("x2"), F.col("py") - F.col("y2")
    len2 = (dx * dx + dy * dy).alias("len2")
    dot = (wx * dx + wy * dy).alias("dot")
    cand = cand.select(
        "p_id", "seg_id", "px", "py", "x1", "y1", "x2", "y2", len2, dot,
        (wx * wx + wy * wy).alias("w2"),
        (vx * vx + vy * vy).alias("v2"),
    )
    num = (
        F.when(F.col("dot") <= 0, F.col("w2") * F.col("len2"))
        .when(F.col("dot") >= F.col("len2"), F.col("v2") * F.col("len2"))
        .otherwise(F.col("w2") * F.col("len2") - F.col("dot") * F.col("dot"))
    )
    tcl = F.greatest(F.lit(0), F.least(F.col("dot"), F.col("len2")))
    hits = (
        cand.withColumn("num", num)
        .where(F.col("num") <= F.lit(r * r) * F.col("len2"))
        .withColumn("tcl", tcl)
        .withColumn(
            "d2d", F.col("num").cast("double") / F.col("len2").cast("double")
        )
    )
    best = hits.groupBy("p_id").agg(
        F.min(
            F.struct(
                "d2d", "seg_id", "tcl", "len2", "x1", "y1", "x2", "y2"
            )
        ).alias("b")
    )
    bt = F.col("b.tcl").cast("double") / F.col("b.len2").cast("double")
    bdx = (F.col("b.x2") - F.col("b.x1")).cast("double")
    bdy = (F.col("b.y2") - F.col("b.y1")).cast("double")
    return best.select(
        "p_id",
        F.col("b.seg_id").alias("seg_id"),
        F.floor(F.lit(1000000.0) * F.col("b.d2d")).cast("long").alias("d2_micro"),
        F.floor(F.lit(1000000.0) * bt).cast("long").alias("t_micro"),
        F.floor(F.lit(1000.0) * (F.col("b.x1").cast("double") + bt * bdx))
        .cast("long")
        .alias("sx_mil"),
        F.floor(F.lit(1000.0) * (F.col("b.y1").cast("double") + bt * bdy))
        .cast("long")
        .alias("sy_mil"),
    )
