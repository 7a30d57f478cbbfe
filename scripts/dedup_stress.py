#!/usr/bin/env python
"""Dedup-path stress: measure the VERDICT r2 item-1 fix (materialize
the MinHash signature subtree once) at multi-million-row scale.

Runs LSH candidate generation + exact-Jaccard verification over a
deterministic near-dup corpus two ways:

- **r2 shape** (unmaterialized): every consumer re-derives its subtree
  from the corpus — the plan scans the corpus ~8x (two-band union
  re-derives signatures per band, the sizes join consumes `banded`
  twice, the self-join consumes `salted` twice, jaccard re-splits the
  text);
- **r3 shape** (dedup_base + localCheckpoint): one corpus scan
  materialized, every stage reads the checkpoint.

Prints one JSON line; append the result to BENCH/NOTES.md.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ROWS = int(os.environ.get("SPARK_GRAFT_DEDUP_ROWS", 2_000_000))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
CAP = 50


def scan_count(df) -> int:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().count("Scan ")


def main() -> None:
    from pyspark.sql import functions as F

    from hand_index_spark.operators.dedup import (
        band_buckets,
        capped_candidate_pairs,
        dedup_base,
        exact_dedup_reps,
        id_salt_hash_col,
        jaccard_refine,
        minhash_signatures,
    )
    from hand_index_spark.session import get_spark
    from hand_index_spark.tables.datagen import synth_neardup_docs

    spark = get_spark(
        "dedup_stress", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 4
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_neardup_docs(spark, ROWS).localCheckpoint(eager=True)
    # localCheckpoint the INPUT so both variants read identical in-memory
    # rows: the comparison isolates plan shape, not parquet IO

    def r2_shape():
        # round-2 plan: no materialization anywhere
        reps = exact_dedup_reps(docs)
        banded = band_buckets(minhash_signatures(reps))
        sizes = banded.groupBy("band_idx", "bk").agg(F.count(F.lit(1)).alias("cnt"))
        salted = banded.join(sizes, ["band_idx", "bk"]).withColumn(
            "salt",
            id_salt_hash_col(F.col("doc_id"))
            % F.greatest(F.lit(1).cast("long"), F.expr(f"(cnt + {CAP - 1}) div {CAP}")),
        )
        a = salted.select(F.col("doc_id").alias("id_a"), "band_idx", "bk", "salt")
        b = salted.select(F.col("doc_id").alias("id_b"), "band_idx", "bk", "salt")
        pairs = (
            a.join(b, ["band_idx", "bk", "salt"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        return jaccard_refine(docs, pairs, threshold=0.2)

    def r3_shape():
        base = dedup_base(docs)
        pairs = capped_candidate_pairs(base=base, cap=CAP)
        return jaccard_refine(docs, pairs, threshold=0.2, base=base)

    out: dict = {"rows": ROWS, "cpus": CPUS}
    for name, fn in (("r2_unmaterialized", r2_shape), ("r3_materialized", r3_shape)):
        t0 = time.perf_counter()
        df = fn()
        n = df.count()
        dt = time.perf_counter() - t0
        out[name] = {
            "seconds": round(dt, 2),
            "pairs": n,
            "plan_scans": scan_count(df),
        }
    out["speedup"] = round(
        out["r2_unmaterialized"]["seconds"] / out["r3_materialized"]["seconds"], 2
    )
    assert out["r2_unmaterialized"]["pairs"] == out["r3_materialized"]["pairs"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
