"""Global spatial autocorrelation (Moran's I) over a cell grid.

The summary statistic a spatial catalog reports about any per-cell
measure (page density, language mix, link spam score per H3/quadkey
cell): are neighboring cells more alike than chance? Classic global
Moran's I with rook (edge-adjacency) weights:

    I = (n / W) * sum_ij w_ij (x_i - m)(x_j - m) / sum_i (x_i - m)^2

Exactness: the mean subtraction is cleared by scaling with n —
``n*(x_i - m) = n*x_i - S`` with ``S = sum(x)`` — so for integer cell
values the numerator ``num = sum_ij (n*x_i - S)(n*x_j - S)`` and
denominator ``den = sum_i (n*x_i - S)^2`` are exact BIGINTs (the n^2
factors cancel in the ratio), and

    I = CAST(n * num AS DOUBLE) / CAST(W * den AS DOUBLE)

is ONE IEEE division of two exact integers — bit-identical to the
DuckDB oracle with no rounding (the engine's exact-mean rule). Callers
bound |n*x - S| so the products stay inside int64.

Scale shape: the neighbor pairing is ONE self equi-join of the cell
table on the packed 4-neighborhood key (explode to 4 offsets on one
side, exactly like operators/distance_join's 3x3 grid) — shuffle on
the cell key, zero broadcast, zero Python; the rest is two scalar
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROOK = [(1, 0), (-1, 0), (0, 1), (0, -1)]


def morans_i(cells: DataFrame, gx: str, gy: str, val: str) -> DataFrame:
    """``cells``(gx, gy, val) — one row per occupied grid cell, integer
    value — to a single row (n, w_pairs, num, den, morans_i). Ordered
    (directed) adjacent pairs are counted, matching the symmetric
    weight-matrix convention W = sum_ij w_ij.
    """
    base = cells.select(
        F.col(gx).cast("long").alias("gx"),
        F.col(gy).cast("long").alias("gy"),
        F.col(val).cast("long").alias("x"),
    )
    stats = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    # z_i = n*x_i - S, exact (the mean cleared by scaling with n)
    z = base.crossJoin(F.broadcast(stats)).select(
        "gx",
        "gy",
        (F.col("n") * F.col("x") - F.col("s")).alias("z"),
        "n",
    )
    left = z.select(
        (F.col("gx") * F.lit(1 << 21) + F.col("gy")).alias("__cell"),
        F.col("z").alias("za"),
        "n",
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx, dy in _ROOK
        ]
    )
    right = z.select(
        F.explode(offsets).alias("o"), "gx", "gy", F.col("z").alias("zb")
    ).select(
        (
            (F.col("gx") + F.col("o.ox")) * F.lit(1 << 21)
            + (F.col("gy") + F.col("o.oy"))
        ).alias("__cell"),
        "zb",
    )
    pairs = left.hint("shuffle_hash").join(right, "__cell")
    acc = pairs.agg(
        F.count("*").cast("long").alias("w_pairs"),
        F.sum(F.col("za") * F.col("zb")).cast("long").alias("num"),
    )
    # n rides on z (always non-empty), never on pairs (may be empty)
    den = z.agg(
        F.sum(F.col("z") * F.col("z")).cast("long").alias("den"),
        F.first("n").alias("n"),
    )
    out = acc.crossJoin(F.broadcast(den)).select(
        "n",
        "w_pairs",
        "num",
        "den",
        # try_divide: NULL (not an ANSI error) on a constant field
        # (den = 0) or a neighborless grid (w_pairs = 0)
        F.try_divide(
            (F.col("n") * F.col("num")).cast("double"),
            (F.col("w_pairs") * F.col("den")).cast("double"),
        ).alias("morans_i"),
    )
    return out
