#!/usr/bin/env python
"""Round-5d terrain/mapmatch scale stress: the new shapes at
~1000-8000x the 500-cell fixtures.

1. hillshade: 2048x2048 DEM (4.2M cells; 33.5M exploded neighbor rows
   through ONE shuffled-hash join). Closed-form check: on the plane
   z = 2*gx + 3*gy every interior cell must report exactly
   (dzdx8, dzdy8) = (16, 24) — one distinct row.
2. contours: 2048x2048 pseudo-random integer DEM, marching squares at
   the median threshold; reports segments + cells/s. Closed-form
   check: on the ramp z = gx the T-isoline is one vertical line ->
   exactly H-1 segments, all case 6.
3. overviews: 4096x4096 (16.8M cells), 4 hierarchical levels; sum
   conservation (every level's z_sum total equals the base sum) is
   asserted — the hierarchical reduction must lose nothing.
4. snap: 1M GPS points x 100k road segments on a 200k-unit grid,
   R = 500 — the grid candidate join; asserts every snapped distance
   is within R^2 and the plan is cartesian/Python-free.

Prints one JSON line per section; paste into BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hand_index_spark.session import get_spark  # noqa: E402

HS_W = int(os.environ.get("SPARK_GRAFT_HS_W", 2048))
OVR_W = int(os.environ.get("SPARK_GRAFT_OVR_W", 4096))
SNAP_PTS = int(os.environ.get("SPARK_GRAFT_SNAP_PTS", 1_000_000))
SNAP_SEGS = int(os.environ.get("SPARK_GRAFT_SNAP_SEGS", 100_000))


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def check_plan(df, expect=(), forbid=()):
    p = plan_of(df)
    for e in expect:
        assert e in p, f"plan missing {e}"
    for f in forbid:
        assert f not in p, f"plan contains {f}"


FORBID = ("CartesianProduct", "BroadcastNestedLoop", "EvalPython")


def _grid(spark, w, elev_expr):
    return spark.range(w * w).select(
        (F.col("id") % w).alias("gx"),
        (F.col("id") / w).cast("long").alias("gy"),
        elev_expr.alias("elev"),
    )


def stress_hillshade(spark):
    from hand_index_spark.operators.terrain import hillshade_cells

    w = HS_W
    gx, gy = F.col("id") % w, (F.col("id") / w).cast("long")
    # pseudo-random integer surface
    cells = _grid(
        spark, w, (gx * 37 + gy * 59 + (gx * gy) % 101 + (gx * gx) % 251) % 997
    )
    out = hillshade_cells(cells)
    check_plan(out, expect=("ShuffledHashJoin",), forbid=FORBID)
    t0 = time.monotonic()
    n = out.count()
    wall = time.monotonic() - t0
    assert n == (w - 2) * (w - 2)
    # closed-form plane: one distinct derivative pair across 4.2M cells
    plane = hillshade_cells(_grid(spark, w, (gx * 2 + gy * 3)))
    distinct = plane.select("dzdx8", "dzdy8").distinct().collect()
    assert [(r["dzdx8"], r["dzdy8"]) for r in distinct] == [(16, 24)]
    print(json.dumps({
        "stress": "hillshade_2048", "cells": w * w, "interior": n,
        "wall_s": round(wall, 2), "cells_per_s": int(w * w / wall),
    }))


def stress_contours(spark):
    from hand_index_spark.operators.terrain import contour_segments

    w = HS_W
    gx, gy = F.col("id") % w, (F.col("id") / w).cast("long")
    cells = _grid(
        spark, w, (gx * 37 + gy * 59 + (gx * gy) % 101 + (gx * gx) % 251) % 997
    )
    out = contour_segments(cells, 498)
    check_plan(out, expect=("ShuffledHashJoin",), forbid=FORBID)
    t0 = time.monotonic()
    n = out.count()
    wall = time.monotonic() - t0
    # closed-form ramp: z = gx crossing T = 1000 -> one vertical
    # isoline, exactly w-1 case-6 segments
    ramp = contour_segments(_grid(spark, w, gx), 1000)
    agg = ramp.agg(
        F.count("*").alias("n"), F.min("ms_case").alias("lo"),
        F.max("ms_case").alias("hi"),
    ).collect()[0]
    assert (agg["n"], agg["lo"], agg["hi"]) == (w - 1, 6, 6), agg
    print(json.dumps({
        "stress": "contours_2048", "cells": w * w, "segments": n,
        "wall_s": round(wall, 2), "cells_per_s": int(w * w / wall),
    }))


def stress_overviews(spark):
    from hand_index_spark.operators.terrain import overview_pyramid

    w = OVR_W
    gx, gy = F.col("id") % w, (F.col("id") / w).cast("long")
    cells = _grid(spark, w, (gx * 13 + gy * 7) % 256)
    out = overview_pyramid(cells, levels=4)
    check_plan(out, forbid=FORBID + ("Join",))
    t0 = time.monotonic()
    sums = {
        r["lvl"]: (r["s"], r["c"])
        for r in out.groupBy("lvl")
        .agg(F.sum("z_sum").alias("s"), F.sum("z_cnt").alias("c"))
        .collect()
    }
    wall = time.monotonic() - t0
    base = cells.agg(F.sum("elev")).collect()[0][0]
    for lvl in (1, 2, 3, 4):
        assert sums[lvl] == (base, w * w), (lvl, sums[lvl])
    print(json.dumps({
        "stress": "overviews_4096x4", "cells": w * w, "levels": 4,
        "wall_s": round(wall, 2), "cells_per_s": int(w * w / wall),
    }))


def stress_snap(spark):
    from hand_index_spark.operators.mapmatch import snap_to_segments

    r = 500
    pts = spark.range(SNAP_PTS).select(
        F.col("id").alias("p_id"),
        ((F.col("id") * 7919) % 200001).alias("px"),
        ((F.col("id") * 104729) % 200001).alias("py"),
    )
    s = F.col("id")
    segs = spark.range(SNAP_SEGS).select(
        s.alias("seg_id"),
        ((s * 2711) % 199001).alias("x1"),
        ((s * 3571) % 199001).alias("y1"),
        ((s * 2711) % 199001 + 100 + (s * 97) % 900).alias("x2"),
        ((s * 3571) % 199001 + (s * 131) % 1600 - 800).alias("y2"),
    )
    out = snap_to_segments(pts, segs, r)
    check_plan(out, expect=("ShuffledHashJoin",), forbid=FORBID)
    t0 = time.monotonic()
    agg = out.agg(
        F.count("*").alias("snapped"), F.max("d2_micro").alias("maxd2"),
    ).collect()[0]
    wall = time.monotonic() - t0
    assert agg["maxd2"] <= r * r * 1_000_000
    print(json.dumps({
        "stress": "snap_1m_x_100k", "points": SNAP_PTS, "segments": SNAP_SEGS,
        "snapped": agg["snapped"], "radius": r, "wall_s": round(wall, 2),
        "points_per_s": int(SNAP_PTS / wall),
    }))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(
        "terrain_stress", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    stress_hillshade(spark)
    stress_contours(spark)
    stress_overviews(spark)
    stress_snap(spark)
    spark.stop()


if __name__ == "__main__":
    main()
