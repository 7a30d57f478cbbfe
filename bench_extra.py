#!/usr/bin/env python
"""Round-6 auxiliary benchmarks (bench.py is frozen for measurement;
extra evidence cited by OPTIMIZATION_r06.md lives here).

Subcommands:
    clip_stress   2M-rectangle tile-clip: Sutherland-Hodgman fold vs the
                  closed-form box_clip_area2 dispatch (VERDICT r5 item 5)
    kernels       single-thread NumPy kernel timings (assign_batch, s2)
    dedup_verify  jaccard verify stage: intersect-once vs double-eval

Each prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)


def _spark():
    from hand_index_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    s = get_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _time_noop(spark, df, n=3):
    best = []
    for _ in range(n):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best.append(time.perf_counter() - t0)
    return sorted(best)[len(best) // 2], min(best)


def clip_stress(n=2_000_000, n_fold=100_000):
    """The S-H fold leg runs on an ``n_fold`` subsample (measured once):
    at its documented ~47k clips/s the full 2M-rect fold leg alone is
    tens of minutes, which is exactly the point of the closed-form
    dispatch. Rates (clips/s) are reported for both so the speedup is
    size-independent; bit-equality is checked on the subsample."""
    from pyspark.sql import functions as F

    from hand_index_spark.operators.clip import (
        box_clip_area2,
        clip_to_box,
        ring_area2,
    )

    spark = _spark()
    tile = 64.0
    d = spark.range(n).select(
        "id",
        ((F.col("id") * 73) % 1000).cast("double").alias("x1"),
        ((F.col("id") * 131) % 1000).cast("double").alias("y1"),
        ((F.col("id") * 73) % 1000 + 8 + (F.col("id") % 5) * 23)
        .cast("double").alias("x2"),
        ((F.col("id") * 131) % 1000 + 8 + ((F.col("id") * 7) % 5) * 23)
        .cast("double").alias("y2"),
    ).localCheckpoint(eager=True)
    t = F.lit(tile)
    tiles = d.withColumn(
        "tx", F.explode(F.sequence(F.floor(F.col("x1") / t).cast("long"),
                                   F.floor(F.col("x2") / t).cast("long")))
    ).withColumn(
        "ty", F.explode(F.sequence(F.floor(F.col("y1") / t).cast("long"),
                                   F.floor(F.col("y2") / t).cast("long")))
    )
    ring = F.array(
        F.struct(F.col("x1").alias("x"), F.col("y1").alias("y")),
        F.struct(F.col("x2").alias("x"), F.col("y1").alias("y")),
        F.struct(F.col("x2").alias("x"), F.col("y2").alias("y")),
        F.struct(F.col("x1").alias("x"), F.col("y2").alias("y")),
    )
    bx = F.col("tx").cast("double") * t
    by = F.col("ty").cast("double") * t
    sub = tiles.filter(F.col("id") < n_fold)
    fold_sub = sub.select(
        "tx", "ty",
        ring_area2(clip_to_box(ring, bx, bx + t, by, by + t)).alias("a2"),
    )
    closed = tiles.select(
        "tx", "ty",
        box_clip_area2(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
                       bx, bx + t, by, by + t).alias("a2"),
    )
    closed_sub = sub.select(
        "tx", "ty",
        box_clip_area2(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
                       bx, bx + t, by, by + t).alias("a2"),
    )
    n_clips_sub = sub.count()
    n_clips = tiles.count()
    t0 = time.perf_counter()
    fold_sub.write.format("noop").mode("overwrite").save()
    fold_sec = time.perf_counter() - t0
    med_c, min_c = _time_noop(spark, closed)
    diff = fold_sub.exceptAll(closed_sub).count() + closed_sub.exceptAll(fold_sub).count()
    fold_rate = n_clips_sub / max(fold_sec, 1e-9)
    closed_rate = n_clips / max(med_c, 1e-9)
    print(json.dumps({
        "metric": "clip_stress", "rects": n, "clips": n_clips,
        "fold_subsample_rects": n_fold, "fold_subsample_clips": n_clips_sub,
        "sh_fold_sec_on_subsample": round(fold_sec, 3),
        "closed_form_sec_full": round(med_c, 3),
        "sh_fold_clips_per_sec": round(fold_rate),
        "closed_clips_per_sec": round(closed_rate),
        "rate_speedup": round(closed_rate / max(fold_rate, 1e-9), 1),
        "diff_rows_subsample": diff,
    }))
    spark.stop()


def kernels(n=4_000_000):
    import numpy as np

    from hand_index_spark.geo import s2lite
    from hand_index_spark.operators import assign as A
    from hand_index_spark.tables import tilegrid as tg

    idx = A.build_tile_index()
    ids = np.arange(n, dtype=np.int64)
    lat, lon = tg.doc_latlon_numpy(ids)
    out = {"metric": "kernels_single_thread", "rows": n}
    for name, fn in [
        ("assign_batch_sec", lambda: A.assign_batch(idx, lat, lon, pip="convex")),
        ("s2_encode_sec", lambda: s2lite.encode(lat, lon, 16)),
    ]:
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(json.dumps(out))


def dedup_verify(n=1_000_000):
    from hand_index_spark.operators import dedup as D
    from hand_index_spark.tables.datagen import synth_neardup_docs

    spark = _spark()
    corpus = synth_neardup_docs(spark, n).localCheckpoint(eager=True)
    base = D.dedup_base(corpus)
    pairs = D.capped_candidate_pairs(base=base).localCheckpoint(eager=True)
    npairs = pairs.count()
    med, mn = _time_noop(
        spark, D.jaccard_refine(corpus, pairs, threshold=0.2, base=base)
    )
    print(json.dumps({
        "metric": "dedup_verify_stage", "corpus_rows": n,
        "candidate_pairs": npairs, "verify_sec_median": round(med, 3),
        "verify_sec_min": round(mn, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "kernels"
    {"clip_stress": clip_stress, "kernels": kernels,
     "dedup_verify": dedup_verify}[cmd]()
