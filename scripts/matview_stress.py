#!/usr/bin/env python
"""Incremental-MV refresh vs full recompute, at two source sizes.

The claim that matters at 100 TB is not a one-off speedup but the
SHAPE: incremental refresh cost is O(delta + |groups|) — flat as the
source grows — while a full recompute is O(table). This script builds
append-only icelite sources at two sizes with the SAME 200k-row delta,
and times both refresh modes at each size (best of 2, per the VM
weather protocol in MEMORY: sandbox-vm-pathology). Expected: full
refresh grows ~linearly with the base; incremental stays ~constant.

Prints one JSON line; conclusions go to BENCH/NOTES.md. Run from the
repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASES = (4_000_000, 16_000_000)
DELTA = 200_000
GROUPS = 1000


def batch(spark, lo, hi):
    from pyspark.sql import functions as F

    return spark.range(lo, hi, numPartitions=16).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % GROUPS).alias("grp"),
        (F.col("id") * 7 % 10007).alias("n_chars"),
    )


def measure(spark, base: int) -> dict:
    from hand_index_spark.tables.icelite import IceliteTable
    from hand_index_spark.tables.matview import MaterializedAgg

    root = tempfile.mkdtemp(prefix=f"mv_stress_{base}_")
    try:
        t = IceliteTable(root, "src")
        t.write(batch(spark, 0, base))

        def mk(name):
            return MaterializedAgg(
                root, name, t,
                ["grp"],
                [("count", "*"), ("sum", "n_chars"),
                 ("min", "n_chars"), ("max", "n_chars")],
            )

        mv = mk("mv_inc")
        mv.refresh(spark)  # initial state (untimed)
        t.write(batch(spark, base, base + DELTA), mode="append")

        inc_times = []
        for i in range(2):  # best-of-2: re-append a fresh delta per repeat
            t0 = time.time()
            s = mv.refresh(spark)
            inc_times.append(time.time() - t0)
            assert s["mode"] == "incremental" and s["delta_rows"] == DELTA, s
            if i == 0:
                t.write(
                    batch(spark, base + DELTA, base + 2 * DELTA), mode="append"
                )

        full_times = []
        for i in range(2):
            fresh = mk(f"mv_full_{i}")
            t0 = time.time()
            s = fresh.refresh(spark)
            full_times.append(time.time() - t0)
            assert s["mode"] == "initial" and s["delta_rows"] >= base, s

        inc = {
            r["grp"]: (r["n"], r["sum__n_chars"])
            for r in mv.serve(spark).collect()
        }
        one = {
            r["grp"]: (r["n"], r["sum__n_chars"])
            for r in mk("mv_full_1").serve(spark).collect()
        }
        assert inc == one, "incremental state diverged from full recompute"

        # the scale-invariant measure: bytes a refresh must SCAN. The
        # toy 2-int-column aggregate is codegen-cheap, so wall time here
        # is job-overhead-bound at both sizes; at production row widths
        # the scan term dominates and this ratio IS the wall-clock win.
        def scanned_bytes(df):
            return sum(
                os.path.getsize(f.removeprefix("file:")) for f in df.inputFiles()
            )

        last = mv.refreshed_snapshot_id()
        t.write(batch(spark, base + 2 * DELTA, base + 3 * DELTA), mode="append")
        inc_bytes = scanned_bytes(t.read_incremental(spark, last))
        full_bytes = scanned_bytes(t.read(spark))
        return {
            "base_rows": base,
            "incremental_refresh_s": round(min(inc_times), 3),
            "full_refresh_s": round(min(full_times), 3),
            "incremental_scan_mb": round(inc_bytes / 1e6, 2),
            "full_scan_mb": round(full_bytes / 1e6, 2),
            "io_reduction": round(full_bytes / inc_bytes, 1),
            "parity": True,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from hand_index_spark.session import get_spark

    spark = get_spark("matview_stress")
    spark.sparkContext.setLogLevel("ERROR")
    rows = [measure(spark, b) for b in BASES]
    small, big = rows[0], rows[-1]
    out = {
        "delta_rows": DELTA,
        "groups": GROUPS,
        "sizes": rows,
        "full_growth": round(
            big["full_refresh_s"] / small["full_refresh_s"], 2
        ),
        "incremental_growth": round(
            big["incremental_refresh_s"] / small["incremental_refresh_s"], 2
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
