#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline metric: end-to-end seconds across the named queries, plus the
flagship spatial-join throughput (rows/sec) over a synthesized
multi-million-row point table (documents at sf0.1 is only 5k rows —
far too small to measure a 10^12-row design; the synthetic point set
uses the same arithmetic geotag rule, BASELINE.json metric).

Execution is forced with the noop sink so measured time includes full
materialization of every column (count() alone would let Catalyst prune
the work).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

SYNTH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", 4_000_000))


def build_queries(spark, sf_dir):
    from pyspark.sql import functions as F

    from hand_index_spark.operators import assign as A
    from hand_index_spark.operators import encode as E
    from hand_index_spark.entry_queries import RELATIONAL
    from hand_index_spark.pipelines.assign_tiles import assignments_full

    def synth_points(n):
        df = spark.range(n).withColumnRenamed("id", "doc_id")
        return E.with_geotag(df)

    def q_assign_synth(_spark, _sf):
        """Flagship: geotag -> cells -> fused (PIP + kNN + S2), n=SYNTH_ROWS.
        One ArrowEvalPython stage total."""
        pts = synth_points(SYNTH_ROWS)
        pts = E.with_cells(pts)
        return A.assign_tiles(pts, spark, pip="convex", with_s2=True)

    def q_cells_encode_synth(_spark, _sf):
        """Encode-only hot path (pure Catalyst, whole-stage codegen)."""
        return E.with_cells(synth_points(SYNTH_ROWS))

    # NOTE: the zero-Python Catalyst twin (operators/assign_catalyst)
    # was benchmarked here and measured ~20x SLOWER than the Arrow-UDF
    # kernel (26.3s vs 1.3s at 4M rows): its ~5k-node expression tree
    # exceeds JVM codegen budgets and drops to interpreted per-row
    # evaluation, while the NumPy kernel shares subexpressions across
    # the batch explicitly. Kept as a correctness cross-check
    # (tests/test_assign_catalyst.py), excluded from the headline.

    def q_assign_documents(_spark, _sf):
        return assignments_full(spark, sf_dir)

    def q_tile_histogram(_spark, _sf):
        return (
            assignments_full(spark, sf_dir)
            .groupBy("tile_id", "method")
            .agg(F.count(F.lit(1)).alias("n_pages"))
        )

    # LLM-pipeline dedup path (VERDICT r2 item 6): LSH candidates +
    # exact Jaccard over a 1M-row synthetic near-dup corpus — the
    # corpus-proportional passes of dedup_clusters (signatures, band
    # buckets, capped self-join, verify). The input corpus is
    # checkpointed once OUTSIDE the timed region (datagen is not the
    # engine); the engine's own dedup_base/salted materializations run
    # INSIDE every timed iteration (build_queries callables are
    # re-invoked per run below).
    from hand_index_spark.operators.dedup import (
        capped_candidate_pairs,
        dedup_base,
        jaccard_refine,
    )
    from hand_index_spark.tables.datagen import synth_neardup_docs

    dedup_rows = int(os.environ.get("SPARK_GRAFT_DEDUP_BENCH_ROWS", 1_000_000))
    corpus = synth_neardup_docs(spark, dedup_rows).localCheckpoint(eager=True)

    def q_dedup_pairs_1m(_spark, _sf):
        b = dedup_base(corpus)
        return jaccard_refine(
            corpus, capped_candidate_pairs(base=b), threshold=0.2, base=b
        )

    return {
        "assign_synth": q_assign_synth,
        "cells_encode_synth": q_cells_encode_synth,
        "assign_documents": q_assign_documents,
        "tile_histogram": q_tile_histogram,
        "pricing_summary": RELATIONAL["pricing_summary"],
        "join_left_3way": RELATIONAL["join_left_3way"],
        "dedup_pairs_1m": q_dedup_pairs_1m,
    }


def _page_touch_ms() -> float:
    """Host-weather probe: wall time to first-touch 64 MB of fresh pages.
    This VM demand-pages guest memory with ~0.5-1 ms faults in bad
    windows (BENCH/NOTES.md) — identical jobs vary 5x with this number,
    so every bench line records it; read results accordingly."""
    import numpy as np

    t0 = time.perf_counter()
    a = np.zeros(64 * 1024 * 1024 // 8)
    a[:: 4096 // 8] = 1.0  # touch every 4 KiB page
    dt = (time.perf_counter() - t0) * 1000.0
    del a
    return round(dt, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    weather0 = _page_touch_ms()

    from hand_index_spark.session import get_spark

    spark = get_spark(
        "hand_index_spark_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = build_queries(spark, sf_dir)
    timings: dict[str, float] = {}
    for name, fn in queries.items():
        # the DataFrame is REBUILT every iteration so queries with eager
        # internal materialization (dedup_base/salted localCheckpoints)
        # are measured end-to-end, not from a cached checkpoint
        def run_once() -> float:
            # nudge the ContextCleaner first: rebuilt-per-iteration
            # localCheckpoints from the PREVIOUS run are unreferenced
            # but only freed on GC — without this their blocks pile up
            # in executor storage and the measurement drifts upward
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        # warm until stable (this demand-paged VM re-faults worker heaps;
        # cold runs are dominated by kernel time), then median of 3
        prev = None
        for _ in range(5):
            cur = run_once()
            if prev is not None and abs(cur - prev) <= 0.2 * prev:
                break
            prev = cur
        runs = [run_once() for _ in range(3)]
        timings[name] = round(sorted(runs)[1], 3)

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "assign_synth_rows": SYNTH_ROWS,
        "assign_rows_per_sec": round(SYNTH_ROWS / max(timings["assign_synth"], 1e-9)),
        "cpus": cpus,
    }
    # page-fault weather bookends: ~10-30 ms = healthy host, hundreds of
    # ms to seconds = the numbers above are host-bound, not engine-bound
    out["page_touch_ms_before"] = weather0
    out["page_touch_ms_after"] = _page_touch_ms()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
