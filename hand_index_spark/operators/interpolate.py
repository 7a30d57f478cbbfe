"""Inverse-distance-weighted (IDW) spatial interpolation.

Estimate a surface value at arbitrary query points from scattered
integer-valued sites — the classic Shepard method with power p=2,
restricted to the k nearest sites within a radius (the production
variant: an unbounded IDW would touch every site for every query):

    idw(q) = sum_i v_i / d2_i  /  sum_i 1 / d2_i

Candidates come from the engine's radius-kNN grid join
(operators/distance_join.knn_join_radius — one shuffle, both sides
scale, no broadcast). Float determinism: each ``v/d2`` and ``1/d2``
term is one IEEE division of exact integers, and the sums run
LEFT-ASSOCIATIVELY over the (dist2, site_id)-sorted neighbor list on
both engines (Spark ``aggregate`` over ``array_sort``; DuckDB
``list_sum`` over an ordered ``list()`` — verified left-assoc, the
engine-wide ordered-sum rule), so the final division is bit-identical
with zero rounding slack. Sites at d2=0 are excluded upstream by
construction (callers put queries and sites on disjoint parity
lattices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .distance_join import knn_join_radius


def idw_interpolate(
    queries: DataFrame,
    q_id: str,
    sites: DataFrame,
    s_id: str,
    x: str,
    y: str,
    val: str,
    k: int,
    radius: int,
) -> DataFrame:
    """(q_id, n_sites, idw) per query point with >= 1 site in range.

    ``queries``(q_id, x, y), ``sites``(s_id, x, y, val) — integer
    coordinates and values; d2 > 0 required (disjoint lattices).
    """
    knn = knn_join_radius(
        queries, q_id, sites.select(F.col(s_id), F.col(x), F.col(y)),
        s_id, x, y, k, radius,
    )
    vals = sites.select(
        F.col(s_id).alias("s_id"), F.col(val).cast("long").alias("v")
    )
    neigh = knn.join(vals, "s_id").groupBy("q_id").agg(
        F.array_sort(
            F.collect_list(F.struct("dist2", "s_id", "v"))
        ).alias("ns")
    )
    num = F.aggregate(
        "ns",
        F.lit(0.0),
        lambda acc, s: acc
        + s["v"].cast("double") / s["dist2"].cast("double"),
    )
    den = F.aggregate(
        "ns",
        F.lit(0.0),
        lambda acc, s: acc + F.lit(1.0) / s["dist2"].cast("double"),
    )
    return neigh.select(
        "q_id",
        F.size("ns").cast("long").alias("n_sites"),
        (num / den).alias("idw"),
    )


def resample_polyline(
    pts: DataFrame,
    spacing: int,
    traj_id: str = "traj_id",
) -> DataFrame:
    """Fixed-spacing resampling of per-trajectory polylines: emit a
    point every ``spacing`` units of arc length along the pos-ordered
    vertex chain — (traj_id, k, seg_idx, sx_mil, sy_mil) with sample k
    at arc length k * spacing, floor-milli-scaled coordinates.

    ``pts``(traj_id, pos, x, y): integer planar coordinates,
    consecutive vertices DISTINCT (zero-length segments would make the
    interpolation parameter 0/0), trajectories bounded (each collects
    to one row — the session/GPS-trace regime; an unbounded-trajectory
    variant would trade the oracle's bit parity for window prefix
    sums, whose segment-tree association differs across engines).

    Float determinism: each segment length is one sqrt of an exact
    integer; every cumulative length is a LEFT-ASSOCIATIVE fold of a
    PREFIX SLICE of the length list (Spark ``aggregate(slice(...))``,
    DuckDB ``list_sum(list_slice(...))`` — the engine-wide ordered-sum
    rule), so segment selection (last j with cum_j <= k * spacing) and
    the interpolation parameter compare bit-identical doubles on both
    engines. O(n^2) prefix folds per trajectory — deliberate, exact,
    and bounded by the vertex-count regime above.
    """
    sp = float(spacing)
    g = (
        pts.groupBy(F.col(traj_id).alias("traj_id"))
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "x", "y"))).alias("vs")
        )
        .where(F.size("vs") >= 2)
    )
    n = F.size("vs")

    def vx(i):  # 0-based vertex access
        return F.element_at(F.col("vs"), i + 1)

    seg_len = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.sqrt(
            (
                (vx(i + 1)["x"] - vx(i)["x"]) * (vx(i + 1)["x"] - vx(i)["x"])
                + (vx(i + 1)["y"] - vx(i)["y"]) * (vx(i + 1)["y"] - vx(i)["y"])
            ).cast("double")
        ),
    )
    g = g.withColumn("lens", seg_len)

    def cum(j):
        # arc length BEFORE segment j: left fold of the first j lengths
        return F.aggregate(
            F.slice(F.col("lens"), 1, j), F.lit(0.0), lambda a, x: a + x
        )

    total = F.aggregate(F.col("lens"), F.lit(0.0), lambda a, x: a + x)
    g = g.withColumn("total", total)
    ks = F.sequence(
        F.lit(0), F.floor(F.col("total") / F.lit(sp)).cast("int")
    )
    s = g.select("traj_id", "vs", "lens", F.explode(ks).alias("k"))
    ksp = F.col("k").cast("double") * F.lit(sp)
    # last segment whose start arc length <= k * spacing
    j = (
        F.size(
            F.filter(
                F.sequence(F.lit(0), F.size("lens") - 1),
                lambda i: cum(i) <= ksp,
            )
        )
        - 1
    )
    s = s.withColumn("j", j)
    t = (ksp - cum(F.col("j"))) / F.element_at(F.col("lens"), F.col("j") + 1)
    a, b = vx(F.col("j")), vx(F.col("j") + 1)
    sx = a["x"].cast("double") + t * (b["x"] - a["x"]).cast("double")
    sy = a["y"].cast("double") + t * (b["y"] - a["y"]).cast("double")
    return s.select(
        "traj_id",
        F.col("k").cast("long").alias("k"),
        F.col("j").cast("long").alias("seg_idx"),
        F.floor(F.lit(1000.0) * sx).cast("long").alias("sx_mil"),
        F.floor(F.lit(1000.0) * sy).cast("long").alias("sy_mil"),
    )
