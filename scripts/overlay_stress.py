#!/usr/bin/env python
"""Scale stress for the round-5b spatial joins:

- distance_band_join at 2,000,000 points (4000x the sf0.01 fixture),
- segment_intersect_join at 1,000,000 x 1,000,000 segments,

both on synthetic integer geometry shaped like the fixture. Records
wall time, output rows, and the executed join node (must be a hash
join on the cell key — never CartesianProduct / BroadcastNestedLoop).

Run from the repo root: python scripts/overlay_stress.py
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def executed_join_nodes(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        ln.strip()
        for ln in plan.splitlines()
        if "Join" in ln or "Cartesian" in ln
    ]


def main() -> None:
    from pyspark.sql import functions as F

    from hand_index_spark.operators.distance_join import distance_band_pairs
    from hand_index_spark.operators.segments import segment_intersect_join
    from hand_index_spark.session import get_spark

    spark = get_spark("overlay_stress", master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # ---- distance band: 2M points in a 40k x 40k grid, R=60
    n = 2_000_000
    span, radius = 40_000, 60
    pts = (
        spark.range(n)
        .select(
            F.col("id"),
            ((F.col("id") % 100003) * 7919 % span).alias("px"),
            ((F.col("id") % 99991) * 104729 % span).alias("py"),
        )
        .localCheckpoint(eager=True)
    )
    pairs = distance_band_pairs(pts, "id", "px", "py", radius)
    t0 = time.time()
    rows = pairs.count()
    dt = time.time() - t0
    joins = executed_join_nodes(pairs)
    print(f"distance_band  n={n:,} R={radius} span={span}")
    print(f"  wall {dt:.2f}s  pairs={rows:,}  rate={n / dt / 1e6:.2f}M pts/s")
    print(f"  join nodes: {joins}")
    assert not any("Cartesian" in j or "NestedLoop" in j for j in joins)

    # ---- segment overlay: 1M x 1M short segments in 120k x 120k
    m = 1_000_000
    sspan, cell = 120_000, 32

    def segs(df, pfx, mx, my, mdx, mdy):
        i = F.col("id")
        return df.select(
            i.alias(f"{pfx}_id"),
            (i * mx % sspan + 16).alias(f"{pfx}x1"),
            (i * my % sspan + 16).alias(f"{pfx}y1"),
            (i * mx % sspan + 16 + (i * mdx % 21) - 10).alias(f"{pfx}x2"),
            (i * my % sspan + 16 + (i * mdy % 21) - 10).alias(f"{pfx}y2"),
        )

    base = spark.range(m).localCheckpoint(eager=True)
    a = segs(base, "a", 37, 59, 17, 29)
    b = segs(base, "b", 41, 53, 19, 23)
    inter = segment_intersect_join(a, b, cell)
    t0 = time.time()
    rows = inter.count()
    dt = time.time() - t0
    joins = executed_join_nodes(inter)
    print(f"segment_overlay  |A|=|B|={m:,} span={sspan} cell={cell}")
    print(
        f"  wall {dt:.2f}s  intersections={rows:,}  "
        f"rate={2 * m / dt / 1e6:.2f}M segs/s"
    )
    print(f"  join nodes: {joins}")
    assert not any("Cartesian" in j or "NestedLoop" in j for j in joins)

    spark.stop()


if __name__ == "__main__":
    main()
