"""Per-group convex hull (Andrew's monotone chain).

The reference's union/dissolve path (operators/union_agg.py) already
uses a convex hull internally as the overlap fallback; this exposes the
hull itself as a first-class grouped aggregate — "the footprint of all
page geotags per site", the standard coverage-envelope question.

Shape: groupBy(group) shuffle, then one Arrow-batched NumPy kernel per
group (applyInPandas). The kernel is O(n log n) per group; the shuffle
is the only data movement. Skewed groups are bounded by per-group point
counts, not corpus size — at 100 TB you'd pre-aggregate per (group,
cell) extreme points first (the hull of hulls equals the hull), which
composes with this same kernel; the pre-aggregate is a plain groupBy.

Exactness: all arithmetic is additions/multiplications of the input
coordinates. With integer (or half-integer) inputs of modest magnitude
every cross product and the shoelace sum are exact in float64, so the
emitted stats are bit-exact against a closed-form oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

HULL_SCHEMA = (
    "group_id long, hull_n long, hull_area2 double, sum_hx double, sum_hy double"
)


def _hull_indices(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Monotone chain; strict turns only (collinear points dropped).
    Returns indices into the SORTED order of the hull vertices in
    counter-clockwise boundary order."""
    order = np.lexsort((ys, xs))
    x, y = xs[order], ys[order]
    n = len(x)
    if n <= 2:
        return order[:n]

    def chain(idx):
        out: list[int] = []
        for i in idx:
            while len(out) >= 2:
                ox, oy = x[out[-2]], y[out[-2]]
                ax, ay = x[out[-1]], y[out[-1]]
                if (ax - ox) * (y[i] - oy) - (ay - oy) * (x[i] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = chain(range(n))
    upper = chain(range(n - 1, -1, -1))
    return order[np.array(lower[:-1] + upper[:-1], dtype=np.int64)]


def hull_stats(points: DataFrame, group_col: str, x: str, y: str) -> DataFrame:
    """Per-group hull stats: vertex count, 2x shoelace area (positive,
    CCW), and the coordinate sums over hull vertices."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf[x].to_numpy(dtype=np.float64)
        ys = pdf[y].to_numpy(dtype=np.float64)
        idx = _hull_indices(xs, ys)
        hx, hy = xs[idx], ys[idx]
        # shoelace in boundary order (CCW -> positive), exact for
        # integer/half-integer coords of modest magnitude
        area2 = float(np.sum(hx * np.roll(hy, -1) - np.roll(hx, -1) * hy))
        return pd.DataFrame(
            {
                "group_id": [int(pdf[group_col].iloc[0])],
                "hull_n": [int(len(idx))],
                "hull_area2": [area2],
                "sum_hx": [float(hx.sum())],
                "sum_hy": [float(hy.sum())],
            }
        )

    return points.groupBy(group_col).applyInPandas(kernel, HULL_SCHEMA)
