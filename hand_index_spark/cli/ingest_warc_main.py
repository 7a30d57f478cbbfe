#!/usr/bin/env python
"""WARC-to-index CLI: spark-submit entry point that feeds raw
``.warc.gz`` archives (sources/warc.py) straight into the flagship
checkpointed ingest (pipelines/ingest_pages.py) — archive in,
hive-partitioned assignments + rollup out, resumable mid-job.

This is the full Common-Crawl-shaped path: binaryFile scan (one task
per archive file) -> WARC record parse -> JVM-side text extraction
from the markup -> geotag -> multi-res cells -> fused PIP/kNN/S2
assignment -> salted partitioned icelite write with lineage.

    spark-submit --py-files hand_index_spark.zip \\
        hand_index_spark/cli/ingest_warc_main.py \\
        --warc-glob '/data/crawl/*.warc.gz' --output-dir /data/index
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Ingest WARC archives into the index")
    p.add_argument("--warc-glob", required=True,
                   help="glob of .warc.gz files (sources/warc.py layout)")
    p.add_argument("--output-dir", required=True, help="icelite root")
    p.add_argument("--fingerprint", default=None,
                   help="resume fingerprint (default: the glob)")
    p.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    return p.parse_args(argv)


def main(argv=None, spark=None) -> dict:
    args = parse_args(argv)
    from pyspark.sql import functions as F

    from hand_index_spark.pipelines.ingest_pages import ingest_pages
    from hand_index_spark.session import get_spark
    from hand_index_spark.sources.warc import read_warc
    from hand_index_spark.tables.icelite import IceliteTable

    own = spark is None
    if own:
        master = f"local[{args.cpus}]" if args.cpus else None
        spark = get_spark("ingest_warc_cli", master=master)

    records = read_warc(spark, args.warc_glob)
    # doc_id from the url tail; text extracted JVM-side from the markup
    # (same regexp stage the html_extract_text contract query pins)
    pages = records.select(
        "url",
        F.regexp_extract("url", r"/d(\d+)$", 1).cast("long").alias("doc_id"),
        F.regexp_replace(
            F.decode(F.col("html"), "utf-8"), "<[^>]*>", ""
        ).alias("text"),
    ).filter(F.col("doc_id").isNotNull())

    fp = args.fingerprint or f"warc|{args.warc_glob}"
    snaps = ingest_pages(spark, pages, args.output_dir, fingerprint=fp)
    asg = IceliteTable(args.output_dir, "assignments").read(spark)
    out = {
        "n_assignments": asg.count(),
        "stages": sorted(snaps),
        "resumed": len(snaps) == 0,
    }
    if own:
        print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
