"""Fixed-radius near-neighbor (distance-band) join.

The reference's spatial surface joins points to polygons (load.py
point-in-polygon paths); the other classic spatial join a catalog
engine needs is point-to-point within a distance band — "every pair of
geotagged pages whose locations are within R meters" (dedup of
near-identical scrape locations, co-location analysis, spatial
blocking for record linkage).

Algorithm (the standard fixed-radius near-neighbor grid):

- work on INTEGER planar coordinates (the engine's Albers forward
  transform already discretizes to whole meters — geo/albers.py);
- bucket every point into a square grid cell of side exactly R
  (``cx = floor(x / R)``, ``cy = floor(y / R)``);
- any pair within distance R differs by at most 1 in each cell
  coordinate, so: keep the LEFT side in its own cell and explode the
  RIGHT side to its 3x3 cell neighborhood, then equi-join on the cell
  key — every qualifying pair is produced exactly once (the left
  point's cell is unique), so no post-join dedup is needed;
- refine with exact integer arithmetic: dx*dx + dy*dy <= R*R in
  BIGINT (no floats anywhere, so the DuckDB oracle matches
  bit-for-bit).

Scale shape: ONE shuffle (the cell-key equi-join), zero broadcast,
zero Python, 9x row expansion on one side only, AQE-splittable when a
cell is hot (urban clusters — same skew story as the H3 hotspots the
north rule calls out). At 100 TB this is the shape you want: candidate
generation is linear in input + output, never O(n^2).

Self-join mode: both sides are the same set; the ``a_id < b_id``
filter keeps exactly one orientation of each unordered pair.

``knn_join_radius`` builds on the same candidate grid for the
two-set kNN join ("k nearest sites within R for every query point"):
grid join -> exact integer refine -> per-query row_number. Unlike
operators/assign.py's kNN (which broadcasts a small tile dimension),
both sides here can be arbitrarily large — the radius bound is what
keeps the candidate set, and therefore the window state, bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _with_cell(df: DataFrame, x: str, y: str, radius: int) -> DataFrame:
    # exact BIGINT division (`div`), never float-divide-then-cast —
    # float64 cannot represent all longs. Inputs are non-negative grid
    # meters, so truncation == floor. The two cell coords pack into one
    # BIGINT key so the join has a single equi-key.
    cx = F.expr(f"`{x}` div {radius}")
    cy = F.expr(f"`{y}` div {radius}")
    return df.withColumn("__cx", cx).withColumn("__cy", cy)


def distance_band_pairs(
    points: DataFrame,
    id_col: str,
    x: str,
    y: str,
    radius: int,
) -> DataFrame:
    """All unordered pairs (a_id < b_id) of ``points`` whose integer
    coordinates are within ``radius`` (Euclidean, inclusive). Returns
    (a_id, b_id, dist2) with dist2 the exact squared distance.

    Coordinates must be non-negative integers (cast to long upstream).
    """
    base = _with_cell(points, x, y, radius)

    left = base.select(
        F.col(id_col).alias("a_id"),
        F.col(x).alias("ax"),
        F.col(y).alias("ay"),
        (F.col("__cx") * F.lit(1 << 21) + F.col("__cy")).alias("__cell"),
    )

    # right side: explode to the 3x3 neighborhood
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx, dy in _NEIGHBOR_OFFSETS
        ]
    )
    right = (
        base.select(
            F.col(id_col).alias("b_id"),
            F.col(x).alias("bx"),
            F.col(y).alias("by"),
            F.col("__cx"),
            F.col("__cy"),
            F.explode(offsets).alias("o"),
        )
        .select(
            "b_id",
            "bx",
            "by",
            (
                (F.col("__cx") + F.col("o.ox")) * F.lit(1 << 21)
                + (F.col("__cy") + F.col("o.oy"))
            ).alias("__cell"),
        )
    )

    r2 = radius * radius
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    # Both sides of this join scale together (same corpus), so a
    # broadcast is never the right strategy past toy sizes — pin the
    # shuffled hash join on the cell key (also what AQE's skew split
    # operates on when a cell is hot).
    return (
        left.hint("shuffle_hash").join(right, "__cell")
        .where(F.col("a_id") < F.col("b_id"))
        .where((dx * dx + dy * dy) <= F.lit(r2))
        .select(
            "a_id",
            "b_id",
            (dx * dx + dy * dy).cast("long").alias("dist2"),
        )
    )


def knn_join_radius(
    queries: DataFrame,
    q_id: str,
    sites: DataFrame,
    s_id: str,
    x: str,
    y: str,
    k: int,
    radius: int,
) -> DataFrame:
    """For each query point, its ``k`` nearest sites among those within
    ``radius``: (q_id, s_id, dist2, rnk). Ties break on site id, so the
    result is total-order deterministic."""
    from pyspark.sql import Window

    q = _with_cell(queries, x, y, radius).select(
        F.col(q_id).alias("q_id"),
        F.col(x).alias("qx"),
        F.col(y).alias("qy"),
        (F.col("__cx") * F.lit(1 << 21) + F.col("__cy")).alias("__cell"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx, dy in _NEIGHBOR_OFFSETS
        ]
    )
    s = (
        _with_cell(sites, x, y, radius)
        .select(
            F.col(s_id).alias("s_id"),
            F.col(x).alias("sx"),
            F.col(y).alias("sy"),
            F.col("__cx"),
            F.col("__cy"),
            F.explode(offsets).alias("o"),
        )
        .select(
            "s_id",
            "sx",
            "sy",
            (
                (F.col("__cx") + F.col("o.ox")) * F.lit(1 << 21)
                + (F.col("__cy") + F.col("o.oy"))
            ).alias("__cell"),
        )
    )
    dx2 = F.col("qx") - F.col("sx")
    dy2 = F.col("qy") - F.col("sy")
    cand = (
        q.hint("shuffle_hash")
        .join(s, "__cell")
        .where((dx2 * dx2 + dy2 * dy2) <= F.lit(radius * radius))
        .select(
            "q_id", "s_id", (dx2 * dx2 + dy2 * dy2).cast("long").alias("dist2")
        )
    )
    w = Window.partitionBy("q_id").orderBy("dist2", "s_id")
    return cand.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= k
    )
