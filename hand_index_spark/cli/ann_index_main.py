#!/usr/bin/env python
"""ANN-index CLI: spark-submit entry point for the persisted IVF index
(pipelines/ann_index.py). Builds (or fingerprint-resumes) the
vectors/centroids/assignments tables; with --query-ids it also serves
top-k from the persisted index and prints the results.

    spark-submit --py-files hand_index_spark.zip \\
        hand_index_spark/cli/ann_index_main.py \\
        --embeddings-parquet /data/embeddings.parquet \\
        --output-dir /data/annidx --query-ids 0,1,2 --k 5
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Build/query the persisted IVF index")
    p.add_argument("--embeddings-parquet", required=True,
                   help="input parquet with (vec_id, embedding array)")
    p.add_argument("--output-dir", required=True, help="icelite root for the index")
    p.add_argument("--n-centroids", type=int, default=16)
    p.add_argument("--rounds", type=int, default=2, help="Lloyd iterations")
    p.add_argument("--query-ids", default=None,
                   help="comma-separated vec_ids to answer top-k for")
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--n-probe", type=int, default=2)
    p.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    return p.parse_args(argv)


def main(argv=None, spark=None) -> dict:
    args = parse_args(argv)
    from pyspark.sql import functions as F

    from hand_index_spark.pipelines.ann_index import build_ann_index, ivf_topk_indexed
    from hand_index_spark.session import get_spark

    own = spark is None
    if own:
        master = f"local[{args.cpus}]" if args.cpus else None
        spark = get_spark("ann_index_cli", master=master)
    emb = spark.read.parquet(args.embeddings_parquet)
    fp = f"{args.embeddings_parquet}|c{args.n_centroids}|r{args.rounds}"
    snaps = build_ann_index(
        spark, emb, args.output_dir, fingerprint=fp,
        n_centroids=args.n_centroids, rounds=args.rounds,
    )
    out = {"built": {s: {"rows": v["row_count"]} for s, v in snaps.items()}}
    if args.query_ids:
        ids = [int(x) for x in args.query_ids.split(",")]
        res = ivf_topk_indexed(
            spark, args.output_dir, F.col("vec_id").isin(ids),
            k=args.k, n_probe=args.n_probe,
        )
        out["topk"] = [
            {"qid": r.qid, "vec_id": r.vec_id, "sim": r.sim, "rank": r.rank}
            for r in res.orderBy("qid", "rank").collect()
        ]
    print(json.dumps(out))
    if own:
        spark.stop()
    return out


if __name__ == "__main__":
    main()
