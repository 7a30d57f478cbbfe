#!/usr/bin/env python
"""Two-parallelism scaling bench — the sandbox stand-in for the north
rule's N vs 4N executor criterion (BASELINE.json:2,14; driver
instruction: evidence with local[8] vs local[32] on the same input).

Runs the flagship tile-assignment job at both parallelism levels on an
identical synthesized input, reports throughput at each + scaling
efficiency, and appends the table to BENCH/BASELINE.md.

Efficiency = (T_8 / T_32) / (32/8); >= 0.8 is the target. Also asserts
the outputs are identical at both levels (partitioning must not change
results — SURVEY.md §5.2 item 4).
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ROWS = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", 8_000_000))
LEVELS = (8, 32)


def run_level(cpus: int, check_rows: int = 2000) -> tuple[float, list]:
    from pyspark.sql import functions as F

    from hand_index_spark.operators import assign as A
    from hand_index_spark.operators import encode as E
    from hand_index_spark.session import get_spark

    spark = get_spark(
        f"scaling_bench_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    pts = spark.range(ROWS).withColumnRenamed("id", "doc_id")
    pts = E.with_geotag(pts)
    pts = E.with_cells(pts)
    df = A.assign_tiles(pts, spark, pip="convex")
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    sample = (
        df.filter(F.col("doc_id") < check_rows)
        .select("doc_id", "tile_id", "method")
        .orderBy("doc_id")
        .collect()
    )
    spark.stop()
    return dt, [tuple(r) for r in sample]


def main() -> None:
    results = {}
    samples = {}
    for cpus in LEVELS:
        dt, sample = run_level(cpus)
        results[cpus] = dt
        samples[cpus] = sample
        print(f"local[{cpus}]: {ROWS} rows in {dt:.2f}s = {ROWS/dt:,.0f} rows/s")

    identical = samples[LEVELS[0]] == samples[LEVELS[1]]
    n, n4 = LEVELS
    speedup = results[n] / results[n4]
    efficiency = speedup / (n4 / n)
    print(f"speedup {speedup:.2f}x over {n4//n}x cores; efficiency {efficiency:.3f}")
    print(f"outputs identical across parallelism levels: {identical}")

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    row = {
        "rows": ROWS,
        "t8_sec": round(results[n], 2),
        "t32_sec": round(results[n4], 2),
        "rows_per_sec_8": round(ROWS / results[n]),
        "rows_per_sec_32": round(ROWS / results[n4]),
        "efficiency": round(efficiency, 3),
        "identical_output": identical,
    }
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    header_needed = not os.path.exists(path)
    with open(path, "a") as f:
        if header_needed:
            f.write(
                "# BENCH/BASELINE — measured numbers\n\n"
                "Scaling criterion (BASELINE.json:2,14): same flagship\n"
                "tile-assignment job, same input, local[8] vs local[32]\n"
                "(sandbox stand-in for N vs 4N executors); target\n"
                "efficiency >= 0.8.\n\n"
                "| when | rows | local[8] s | local[32] s | rows/s @8 | rows/s @32 | efficiency | identical output |\n"
                "|---|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {stamp} | {row['rows']} | {row['t8_sec']} | {row['t32_sec']} | "
            f"{row['rows_per_sec_8']} | {row['rows_per_sec_32']} | "
            f"{row['efficiency']} | {row['identical_output']} |\n"
        )
    print(json.dumps(row))


if __name__ == "__main__":
    main()
