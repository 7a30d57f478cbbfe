#!/usr/bin/env python
"""Index-build CLI — the reference's load.py entry point restated
(load.py:303-380): output-dir existence guard (:326-348), --h3-resolution
partition knob (:314), --calb branch-regexp variant (:208-216), resume
(--skip-load generalized to icelite stage fingerprints).

Input geometry/manifest default to the deterministic synthetic world
(no external data in this environment); pass --tiles-parquet /
--manifest-parquet to read real tables with the same schemas
(geom binary, branch_path string, src_file string / file string).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Build the HAND-style spatial index")
    p.add_argument("--output-dir", required=True, help="index root (icelite tables)")
    p.add_argument(
        "--h3-resolution", type=int, default=0,
        help="partition cell resolution for the Catchments table (load.py:314)",
    )
    p.add_argument(
        "--calb", action="store_true",
        help="calb directory layout: branch dir = immediate parent (load.py:208-216)",
    )
    p.add_argument("--simplify-tol", type=float, default=100.0,
                   help="ingest simplification tolerance, meters (load.py:155)")
    p.add_argument("--tiles-parquet", default=None,
                   help="optional parquet of raw sub-polygons (default: synthetic world)")
    p.add_argument("--manifest-parquet", default=None,
                   help="optional parquet of the asset-file manifest")
    p.add_argument("--force", action="store_true",
                   help="allow writing into an existing output dir (resume)")
    p.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    return p.parse_args(argv)


def main(argv=None, spark=None) -> dict:
    args = parse_args(argv)
    # refuse-to-overwrite guard (reference load.py:326-348): an existing
    # NON-icelite dir is suspicious; an icelite root resumes idempotently
    if os.path.exists(args.output_dir) and not args.force:
        if not os.path.isdir(args.output_dir):
            sys.exit(f"output path {args.output_dir!r} exists and is not a directory")
        entries = os.listdir(args.output_dir)
        if entries and not any(
            os.path.isdir(os.path.join(args.output_dir, e, "_meta")) for e in entries
        ):
            sys.exit(
                f"output dir {args.output_dir!r} exists and is not an index root; "
                "pass --force to write anyway"
            )

    from hand_index_spark.pipelines.build_index import build_index
    from hand_index_spark.session import get_spark
    from hand_index_spark.tables import datagen

    own_session = spark is None
    if own_session:
        master = f"local[{args.cpus}]" if args.cpus else None
        spark = get_spark("build_index_cli", master=master)
    tiles = (
        spark.read.parquet(args.tiles_parquet)
        if args.tiles_parquet
        else datagen.tiles_raw(spark)
    )
    manifest = (
        spark.read.parquet(args.manifest_parquet)
        if args.manifest_parquet
        else datagen.file_manifest(spark)
    )
    snaps = build_index(
        spark,
        tiles,
        manifest,
        args.output_dir,
        simplify_tol=args.simplify_tol,
        partition_res=args.h3_resolution,
        calb=args.calb,
        input_fingerprint=(
            f"{args.tiles_parquet or 'synthetic'}|{args.manifest_parquet or 'synthetic'}"
        ),
    )
    summary = {
        name: {"snapshot_id": s["snapshot_id"], "row_count": s["row_count"]}
        for name, s in snaps.items()
    }
    print(json.dumps({"built": summary, "output_dir": args.output_dir}))
    if own_session:
        spark.stop()
    return snaps


if __name__ == "__main__":
    main()
