#!/usr/bin/env python
"""Corpus-dedup CLI: spark-submit entry point for the icelite-staged
near-duplicate pipeline (pipelines/dedup_corpus.py) — the writeback a
training-data crawl runs. Same conventions as build_index_main:
idempotent resume via stage fingerprints, local[N] knob, parquet in.

    spark-submit --py-files hand_index_spark.zip \\
        hand_index_spark/cli/dedup_corpus_main.py \\
        --docs-parquet /data/documents.parquet --output-dir /data/dedup \\
        --perms 8 --rows-per-band 2 --hash-mode xxhash64
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Near-duplicate corpus dedup")
    p.add_argument("--docs-parquet", required=True,
                   help="input corpus parquet with (doc_id, text)")
    p.add_argument("--output-dir", required=True, help="icelite root for the stages")
    p.add_argument("--threshold", type=float, default=0.2,
                   help="exact-Jaccard keep threshold")
    p.add_argument("--cap", type=int, default=50, help="hot-bucket cap")
    p.add_argument("--perms", type=int, default=4,
                   help="MinHash permutations (production: 64-128)")
    p.add_argument("--rows-per-band", type=int, default=2,
                   help="signature rows per LSH band")
    p.add_argument("--hash-mode", choices=("oracle", "xxhash64"), default="xxhash64",
                   help="token hash: oracle (SQL-twin) or xxhash64 (production)")
    p.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    return p.parse_args(argv)


def main(argv=None, spark=None) -> dict:
    args = parse_args(argv)
    from hand_index_spark.operators.dedup import perm_params, rows_bands
    from hand_index_spark.pipelines.dedup_corpus import dedup_corpus
    from hand_index_spark.session import get_spark

    own = spark is None
    if own:
        master = f"local[{args.cpus}]" if args.cpus else None
        spark = get_spark("dedup_corpus_cli", master=master)
    docs = spark.read.parquet(args.docs_parquet)
    fp = (
        f"{args.docs_parquet}|t{args.threshold}|c{args.cap}|p{args.perms}"
        f"|b{args.rows_per_band}|{args.hash_mode}"
    )
    snaps = dedup_corpus(
        spark,
        docs,
        args.output_dir,
        fingerprint=fp,
        threshold=args.threshold,
        cap=args.cap,
        perms=perm_params(args.perms),
        bands=rows_bands(args.perms, args.rows_per_band),
        hash_mode=args.hash_mode,
    )
    print(json.dumps({s: {"rows": v["row_count"]} for s, v in snaps.items()}))
    if own:
        spark.stop()
    return snaps


if __name__ == "__main__":
    main()
