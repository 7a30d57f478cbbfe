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
