"""Segment-segment intersection join (vector overlay primitive).

Complements the engine's point-in-polygon joins (operators/assign.py,
operators/spatial_join.py) with the line-geometry overlay the reference
family of tools gets from GEOS: which pairs of linear features (river
reaches x road casings, crawl-frontier traces x tile boundaries) cross.

Pure Catalyst — zero Python, zero broadcast:

- candidate generation: each segment explodes to the grid cells
  covering its bounding box (``sequence x sequence`` of cell ranges,
  same polyfill idiom as operators/spatial_join.py); an equi-join on
  the cell key pairs up segments sharing a cell. A pair sharing k
  cells appears k times -> dedup with DISTINCT before the (cheap)
  exact refine.
- exact refine: the classic four-orientation test on INTEGER
  coordinates. cross(p,q,r) = (qx-px)*(ry-py) - (qy-py)*(rx-px) stays
  inside BIGINT for |coords| < 2^30, so the predicate is exact — no
  epsilon, and the DuckDB oracle replays it bit-for-bit. Segments
  intersect (touching included) iff
    d1*d2 < 0 and d3*d4 < 0                       (proper crossing)
    or any d_i == 0 and the corresponding endpoint
       lies inside the other segment's bbox       (touch / overlap).

Scale shape: one shuffle keyed on covering cell, candidate count is
output-sensitive (segments meet only where they share a cell), refine
is 8 multiplications per pair inside whole-stage codegen. Hot cells
(dense urban line work) split under AQE like every other cell-keyed
join in the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _covering_cells(df: DataFrame, prefix: str, cell: int) -> DataFrame:
    """Explode each segment row to (cell key, id, coords...)."""
    x1, y1 = F.col(f"{prefix}x1"), F.col(f"{prefix}y1")
    x2, y2 = F.col(f"{prefix}x2"), F.col(f"{prefix}y2")
    cx0 = F.expr(f"least({prefix}x1, {prefix}x2) div {cell}")
    cx1 = F.expr(f"greatest({prefix}x1, {prefix}x2) div {cell}")
    cy0 = F.expr(f"least({prefix}y1, {prefix}y2) div {cell}")
    cy1 = F.expr(f"greatest({prefix}y1, {prefix}y2) div {cell}")
    return (
        df.withColumn("__cx", F.explode(F.sequence(cx0, cx1)))
        .withColumn("__cy", F.explode(F.sequence(cy0, cy1)))
        .withColumn("__cell", F.col("__cx") * F.lit(1 << 21) + F.col("__cy"))
        .drop("__cx", "__cy")
    )


def _cross(px, py, qx, qy, rx, ry) -> Column:
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def _on_bbox(px, py, qx, qy, rx, ry) -> Column:
    """r within the closed bbox of segment pq (used only when r is
    collinear with pq, where bbox containment == on-segment)."""
    return (
        (rx >= F.least(px, qx))
        & (rx <= F.greatest(px, qx))
        & (ry >= F.least(py, qy))
        & (ry <= F.greatest(py, qy))
    )


def segment_intersect_join(
    a: DataFrame, b: DataFrame, cell: int
) -> DataFrame:
    """Pairs (a_id, b_id) of segments from ``a`` (a_id, ax1, ay1, ax2,
    ay2) and ``b`` (b_id, bx1, ...) that intersect (touching and
    collinear overlap included). Integer coordinates, |coord| < 2^30.
    ``cell`` is the candidate grid size (>= typical segment extent)."""
    ca = _covering_cells(a, "a", cell)
    cb = _covering_cells(b, "b", cell)
    # both line sets scale together: pin the cell-key shuffled hash
    # join (a broadcast would ship a whole layer past toy sizes)
    cand = ca.hint("shuffle_hash").join(cb, "__cell").select(
        "a_id", "ax1", "ay1", "ax2", "ay2", "b_id", "bx1", "by1", "bx2", "by2"
    ).distinct()

    ax1, ay1, ax2, ay2 = [F.col(c) for c in ("ax1", "ay1", "ax2", "ay2")]
    bx1, by1, bx2, by2 = [F.col(c) for c in ("bx1", "by1", "bx2", "by2")]
    d1 = _cross(bx1, by1, bx2, by2, ax1, ay1)
    d2 = _cross(bx1, by1, bx2, by2, ax2, ay2)
    d3 = _cross(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = _cross(ax1, ay1, ax2, ay2, bx2, by2)

    proper = (
        (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    )
    touch = (
        ((d1 == 0) & _on_bbox(bx1, by1, bx2, by2, ax1, ay1))
        | ((d2 == 0) & _on_bbox(bx1, by1, bx2, by2, ax2, ay2))
        | ((d3 == 0) & _on_bbox(ax1, ay1, ax2, ay2, bx1, by1))
        | ((d4 == 0) & _on_bbox(ax1, ay1, ax2, ay2, bx2, by2))
    )
    return cand.where(proper | touch).select("a_id", "b_id")


def ring_self_intersections(rings: DataFrame) -> DataFrame:
    """OGC-style simple-ring validation: per ring (ring_id,
    coords_flat array<double>, OPEN ring — closure edge implied),
    count pairs of NON-ADJACENT edges that intersect (proper crossing
    or touch). (ring_id, n_bad BIGINT, is_valid) — a simple ring has
    n_bad = 0.

    Shape: the edge pair join is keyed on ring_id, so the work is
    O(edges-per-ring^2) per ring and embarrassingly parallel across
    rings — the per-feature cost a validation pass has anywhere; no
    global candidate structure is needed because edges of different
    rings can never invalidate each other. Coordinates must be
    integer-valued (the cross products are exact in the long math)."""
    nv = (F.size("coords_flat") / 2).cast("int")
    edge_i = F.explode(F.sequence(F.lit(0), nv - 1)).alias("i")
    c = F.col("coords_flat")

    def at(idx):
        return F.element_at(c, idx + 1).cast("long")

    edges = (
        rings.withColumn("nv", nv)
        .select("ring_id", "nv", edge_i, "coords_flat")
        .withColumn("j", (F.col("i") + 1) % F.col("nv"))
        .select(
            "ring_id",
            "nv",
            "i",
            at(F.col("i") * 2).alias("x1"),
            at(F.col("i") * 2 + 1).alias("y1"),
            at(F.col("j") * 2).alias("x2"),
            at(F.col("j") * 2 + 1).alias("y2"),
        )
    )

    e1 = edges.select(
        "ring_id",
        "nv",
        F.col("i").alias("ai"),
        F.col("x1").alias("ax1"),
        F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"),
        F.col("y2").alias("ay2"),
    )
    e2 = edges.select(
        "ring_id",
        F.col("i").alias("bi"),
        F.col("x1").alias("bx1"),
        F.col("y1").alias("by1"),
        F.col("x2").alias("bx2"),
        F.col("y2").alias("by2"),
    )
    pairs = e1.join(e2, "ring_id").where(
        (F.col("bi") > F.col("ai") + 1)
        & ~((F.col("ai") == 0) & (F.col("bi") == F.col("nv") - 1))
    )

    ax1, ay1, ax2, ay2 = [F.col(s) for s in ("ax1", "ay1", "ax2", "ay2")]
    bx1, by1, bx2, by2 = [F.col(s) for s in ("bx1", "by1", "bx2", "by2")]
    d1 = _cross(bx1, by1, bx2, by2, ax1, ay1)
    d2 = _cross(bx1, by1, bx2, by2, ax2, ay2)
    d3 = _cross(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = _cross(ax1, ay1, ax2, ay2, bx2, by2)
    proper = (
        (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    )
    touch = (
        ((d1 == 0) & _on_bbox(bx1, by1, bx2, by2, ax1, ay1))
        | ((d2 == 0) & _on_bbox(bx1, by1, bx2, by2, ax2, ay2))
        | ((d3 == 0) & _on_bbox(ax1, ay1, ax2, ay2, bx1, by1))
        | ((d4 == 0) & _on_bbox(ax1, ay1, ax2, ay2, bx2, by2))
    )
    bad = pairs.withColumn("hit", (proper | touch).cast("long"))
    counts = bad.groupBy("ring_id").agg(F.sum("hit").alias("n_bad"))
    # triangles have no non-adjacent pairs at all — left join keeps them
    return (
        rings.select("ring_id")
        .join(counts, "ring_id", "left")
        .select(
            "ring_id",
            F.coalesce(F.col("n_bad"), F.lit(0)).cast("long").alias("n_bad"),
            (F.coalesce(F.col("n_bad"), F.lit(0)) == 0).alias("is_valid"),
        )
    )
