#!/usr/bin/env python
"""HAND-raster CLI: spark-submit entry point for the D8 hydrology
pipeline (operators/hydrology.py) — the computation whose OUTPUT the
reference catalog indexes (its hive layout stores per-catchment HAND
artifacts; here the engine derives them from a DEM). Reads a DEM
parquet with (gx, gy, elev) integer cells, writes three icelite
tables under --output-dir:

    flow_dir      (gx, gy, elev, dir, tx, ty)  — D8 steepest descent
    flow_accum    (gx, gy, acc)                — upstream cell counts
    hand          (gx, gy, hand)               — height above nearest
                                                 drainage (elev <=
                                                 --drain-max-elev),
                                                 2^--doublings-hop reach

    spark-submit --py-files hand_index_spark.zip \\
        hand_index_spark/cli/hand_raster_main.py \\
        --dem-parquet /data/dem.parquet --output-dir /data/hand \\
        --drain-max-elev 3 --doublings 11 --acc-rounds 16
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="D8 flow + HAND from a DEM grid")
    p.add_argument("--dem-parquet", required=True,
                   help="input DEM parquet with integer (gx, gy, elev)")
    p.add_argument("--output-dir", required=True,
                   help="icelite root for flow_dir/flow_accum/hand")
    p.add_argument("--drain-max-elev", type=int, default=0,
                   help="cells with elev <= this are drainage")
    p.add_argument("--doublings", type=int, default=11,
                   help="pointer-doubling rounds (2^J-step path reach)")
    p.add_argument("--acc-rounds", type=int, default=16,
                   help="flow-accumulation relaxation rounds (>= longest "
                        "flow path for the exact upstream counts)")
    p.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    return p.parse_args(argv)


def main(argv=None, spark=None) -> dict:
    args = parse_args(argv)
    from hand_index_spark.operators.hydrology import (
        d8_flow,
        flow_accumulation,
        hand_height,
    )
    from hand_index_spark.session import get_spark
    from hand_index_spark.tables.icelite import IceliteTable

    own = spark is None
    if own:
        master = f"local[{args.cpus}]" if args.cpus else None
        spark = get_spark("hand_raster_cli", master=master)

    dem = spark.read.parquet(args.dem_parquet)
    flow = d8_flow(dem).localCheckpoint(eager=True)

    summary = {
        "flow_dir": IceliteTable(args.output_dir, "flow_dir").write(
            flow, stage="flow_dir"
        ),
        "flow_accum": IceliteTable(args.output_dir, "flow_accum").write(
            flow_accumulation(flow, args.acc_rounds), stage="flow_accum"
        ),
        "hand": IceliteTable(args.output_dir, "hand").write(
            hand_height(flow, args.drain_max_elev, args.doublings),
            stage="hand",
        ),
    }
    print(json.dumps({"tables": sorted(summary)}))
    if own:
        spark.stop()
    return summary


if __name__ == "__main__":
    main()
