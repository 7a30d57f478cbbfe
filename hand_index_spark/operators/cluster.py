"""Density-based clustering (DBSCAN) as a composition of verified
engine pieces: the grid distance-band self-join supplies the eps
neighborhoods, min-label connected components merge core points, and
border points attach deterministically.

Classic DBSCAN is scan-order-dependent at borders (a border point in
two clusters' reach goes to whichever was expanded first). This
implementation pins the deterministic convention ``border -> its
MINIMUM core-neighbor id's cluster``, which makes the full output a
pure function of the point set — ORACLE-comparable and stable across
partitionings (the property a distributed engine must have anyway).

Scale shape: one grid self-join (bounded cells, no broadcast), one
degree aggregate, two semi-joins, then components over CORE-CORE
edges only — the component graph is the dense skeleton, typically far
smaller than the full neighborhood graph. Zero Python, zero cross
product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dbscan(
    points: DataFrame,
    id_col: str,
    x: str,
    y: str,
    eps: int,
    min_pts: int,
) -> DataFrame:
    """(id, cluster_id, role) for every non-noise point: role 'core'
    (>= min_pts neighbors within eps, self included) or 'border'
    (non-core with a core neighbor; attaches to its minimum core
    neighbor's cluster). Noise points are omitted. cluster_id is the
    minimum core id of the component."""
    from .dedup import min_label_components
    from .distance_join import distance_band_pairs

    pts = points.select(
        F.col(id_col).alias("id"), F.col(x).alias("px"), F.col(y).alias("py")
    )
    pairs = distance_band_pairs(pts, "id", "px", "py", eps).select(
        F.col("a_id").alias("a"), F.col("b_id").alias("b")
    )
    sym = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    ncnt = sym.groupBy("a").agg((F.count("*") + 1).alias("n"))
    core = (
        pts.join(ncnt, pts.id == ncnt.a, "left")
        .where(F.coalesce(F.col("n"), F.lit(1)) >= min_pts)
        .select("id")
        .localCheckpoint(eager=True)
    )
    core_edges = pairs.join(
        core.select(F.col("id").alias("a")), "a", "left_semi"
    ).join(core.select(F.col("id").alias("b")), "b", "left_semi")
    labels = min_label_components(
        core.select(F.col("id").alias("node")), core_edges
    )
    core_out = labels.select(
        F.col("node").alias("id"),
        F.col("label").cast("long").alias("cluster_id"),
        F.lit("core").alias("role"),
    )
    border = (
        sym.join(core.select(F.col("id").alias("b")), "b", "left_semi")
        .join(core.select(F.col("id").alias("a")), "a", "left_anti")
        .groupBy("a")
        .agg(F.min("b").alias("attach"))
    )
    border_out = border.join(
        labels, border.attach == labels.node
    ).select(
        F.col("a").alias("id"),
        F.col("label").cast("long").alias("cluster_id"),
        F.lit("border").alias("role"),
    )
    return core_out.unionByName(border_out)
