#!/usr/bin/env python
"""Dump .explain("formatted") for every headline bench query into
plans/r06/<query>_<tag>.txt (tag = before/after). Reuses bench.py's
build_queries so the plans are exactly the benched DataFrames.

Usage: python scripts/dump_plans_r06.py before|after [query,...]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hand_index_spark.session import get_spark

    import bench

    spark = get_spark("dump_plans_r06", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(ROOT, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name, (setup, fn) in bench.build_queries(spark, sf_dir).items():
        if only and name not in only:
            continue
        ctx = setup() if setup is not None else None
        df = fn(ctx)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
