#!/usr/bin/env python
"""ROI query path at ~100x catchments (VERDICT r3 item 8).

The pipeline fixture runs roi_query over ~300 catchments; this script
generates ``SPARK_GRAFT_ROI_ROWS`` (default 600k) synthetic catchments
hive-partitioned on h3_index — the layout pipelines/build_index.py
writes — runs the ROI query end-to-end, and proves the scale claims
with numbers instead of plan-shape assertions alone:

* partition pruning: the executed plan's FileSourceScan must carry
  PartitionFilters on h3_index, and the bytes under the SELECTED hive
  partitions (what a directory-pruned scan can touch) are reported
  against the total table bytes — scan cost tracks ROI cells, not
  corpus size;
* refine throughput: wall time and rows/s of the exact-overlap phase
  over the coarse candidates.

Prints one JSON line; paste into BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N = int(os.environ.get("SPARK_GRAFT_ROI_ROWS", 600_000))
OUT = os.environ.get("SPARK_GRAFT_ROI_DIR", "/tmp/hand_index_spark_roi_stress")

# synthetic extent lives in tables/datagen.py (shared with bench.py)
from hand_index_spark.tables.datagen import (  # noqa: E402
    CATCH_HALF as HALF,
    CATCH_LAT0 as LAT0,
    CATCH_LAT1 as LAT1,
    CATCH_LON0 as LON0,
    CATCH_LON1 as LON1,
)

# ROI: a 2x2-degree convex rectangle well inside the extent
ROI_LON0, ROI_LAT0, ROI_LON1, ROI_LAT1 = -98.0, 36.0, -96.0, 38.0


def gen_catchments(spark, n, partition_res):
    """Shared generator (moved to tables/datagen.py in round 5 so
    bench.py's roi_query_600k headline reuses the identical corpus)."""
    from hand_index_spark.tables.datagen import synth_catchments

    return synth_catchments(spark, n, partition_res)


def dir_bytes(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from hand_index_spark.pipelines.build_index import CATCHMENT_PARTITION_RES
    from hand_index_spark.pipelines.query_roi import roi_query
    from hand_index_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        "roi_stress", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    pres = CATCHMENT_PARTITION_RES

    out: dict = {"n_catchments": N, "partition_res": pres}
    tab = f"{OUT}/catchments"
    if not os.path.exists(f"{tab}/_SUCCESS"):
        shutil.rmtree(OUT, ignore_errors=True)
        t0 = time.perf_counter()
        cat = gen_catchments(spark, N, pres)
        (
            cat.repartition(F.col("h3_index"))
            .write.mode("overwrite")
            .partitionBy("h3_index")
            .parquet(tab)
        )
        out["datagen_write_sec"] = round(time.perf_counter() - t0, 1)

    catchments = spark.read.parquet(tab)
    parts = [d for d in os.listdir(tab) if d.startswith("h3_index=")]
    out["n_partitions_total"] = len(parts)
    out["table_bytes_total"] = dir_bytes(tab)

    roi = {
        "type": "Polygon",
        "coordinates": [[
            [ROI_LON0, ROI_LAT0], [ROI_LON1, ROI_LAT0],
            [ROI_LON1, ROI_LAT1], [ROI_LON0, ROI_LAT1],
            [ROI_LON0, ROI_LAT0],
        ]],
    }

    t0 = time.perf_counter()
    kept, attrs, stats = roi_query(spark, catchments, roi)
    out["roi_query_sec"] = round(time.perf_counter() - t0, 2)
    out["stats"] = stats

    # ---- pruning evidence from the EXECUTED plan + the hive layout
    plan = kept._jdf.queryExecution().executedPlan().toString()
    out["plan_has_partition_filters"] = (
        "PartitionFilters: [h3_index" in plan and "INSET" in plan
    )
    scan_line = next(
        (ln.strip() for ln in plan.splitlines() if "PartitionFilters" in ln), ""
    )
    out["scan_line"] = scan_line[:300]
    # the pushed cell set (toString truncates the INSET list, so rebuild
    # it with the exact formula roi_query pushes — deterministic)
    from hand_index_spark.geo import cells as h3lite, polygon as P
    from hand_index_spark.sources.geojson import load_roi
    from hand_index_spark.tables import tilegrid as tg

    ring4326 = load_roi(roi)[0]
    lon_min, lat_min, lon_max, lat_max = P.bbox_of(ring4326)
    cs = 1.0 / (1 << pres)
    buf_cells = int(np.ceil(max(tg.W, tg.H) / cs)) + 1
    pushed = {
        int(c)
        for c in h3lite.cover_bbox(
            lon_min - buf_cells * cs,
            lat_min - buf_cells * cs,
            lon_max + buf_cells * cs,
            lat_max + buf_cells * cs,
            pres,
        )
    }
    sel_bytes = 0
    n_sel = 0
    for d in parts:
        cell = int(d.split("=", 1)[1])
        if cell in pushed:
            n_sel += 1
            sel_bytes += dir_bytes(os.path.join(tab, d))
    out["n_cells_pushed"] = len(pushed)
    out["n_partitions_selected"] = n_sel
    out["selected_bytes"] = sel_bytes
    out["scan_bytes_fraction"] = round(sel_bytes / max(out["table_bytes_total"], 1), 4)
    cells_in_plan = pushed

    # ---- refine throughput: exact phase alone over the coarse set
    from hand_index_spark.geo import albers
    from hand_index_spark.operators.overlap import refine_overlap
    from hand_index_spark.sources.geojson import load_roi

    ring = load_roi(roi)[0]
    x, y = albers.forward(ring[:, 0], ring[:, 1])
    ring5070 = np.column_stack([x, y])
    coarse = catchments.filter(
        F.col("h3_index").isin([int(c) for c in cells_in_plan])
        if cells_in_plan
        else F.lit(True)
    )
    n_coarse = coarse.count()
    t0 = time.perf_counter()
    refine_overlap(coarse, spark, ring5070).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.perf_counter() - t0
    out["refine_candidates"] = n_coarse
    out["refine_sec"] = round(dt, 2)
    out["refine_rows_per_sec"] = round(n_coarse / max(dt, 1e-9))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
