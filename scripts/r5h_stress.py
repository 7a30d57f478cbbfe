#!/usr/bin/env python
"""Round-5h/i/j scale stress: the new shapes at 1000-16000x the sf0.01
fixtures, each plan-checked and closed-form-verified inside the run.

1. clip: 8M rectangle footprints through the Sutherland-Hodgman fold +
   tile aggregation. Closed form: clipping PARTITIONS each footprint,
   so the grand total of per-tile covered areas must equal the exact
   sum of footprint areas (conservation), and the piece count must
   equal the exact covering-tile count (both computed Spark-side with
   independent arithmetic).
2. pack: 32M synthetic docs through the two-phase prefix-sum packing
   (span widened so the bucket-offset frame stays small — the knob a
   10^12-doc run would turn, or recurse). Closed form: token
   conservation, every chunk but the last exactly full, chunk count ==
   ceil(total/C).
3. lpa: label propagation at 4M nodes / ~22M directed edges, 2 rounds.
   Asserts totality (every node labeled, every label a node id) and
   monotonicity (labels only ever decrease from the identity start —
   the min-tie-break guarantees it).
4. slerp: 8M great-circle waypoints through the pure trig projection
   (whole-stage codegen ceiling for the navigation family). Asserts
   all micro-degree outputs inside [-90e6, 90e6] x [-180e6, 180e6].
5. budget: 16M docs over 512 languages through the lang-partitioned
   quota windows. Asserts the 30% cap holds for every language
   (Spark-side violation count == 0) and shares stay <= 300000 micro.

Prints one JSON line per section; paste into BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hand_index_spark.session import get_spark  # noqa: E402

CLIP_N = int(os.environ.get("SPARK_GRAFT_CLIP_N", 2_000_000))
PACK_N = int(os.environ.get("SPARK_GRAFT_PACK_N", 32_000_000))
PACK_SPAN = int(os.environ.get("SPARK_GRAFT_PACK_SPAN", 4096))
LPA_N = int(os.environ.get("SPARK_GRAFT_LPA_N", 4_000_000))
GC_N = int(os.environ.get("SPARK_GRAFT_GC_N", 8_000_000))
BUD_N = int(os.environ.get("SPARK_GRAFT_BUD_N", 16_000_000))
BUD_LANGS = int(os.environ.get("SPARK_GRAFT_BUD_LANGS", 512))

FORBID = ("CartesianProduct", "BroadcastNestedLoop", "EvalPython")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def check_plan(df, forbid=FORBID):
    p = plan_of(df)
    for f in forbid:
        assert f not in p, f"forbidden node {f} in plan"


def stress_clip(spark):
    from hand_index_spark.operators.clip import clip_to_box, ring_area2

    t = 64.0
    r = spark.range(CLIP_N).select(
        F.col("id").alias("fid"),
        ((F.col("id") * 73) % 100000).cast("double").alias("x1"),
        ((F.col("id") * 131) % 100000).cast("double").alias("y1"),
        (8 + (F.col("id") % 5) * 23).cast("double").alias("w"),
        (8 + ((F.col("id") * 7) % 5) * 23).cast("double").alias("h"),
    ).select(
        "fid", "x1", "y1", "w", "h",
        (F.col("x1") + F.col("w")).alias("x2"),
        (F.col("y1") + F.col("h")).alias("y2"),
    )
    ring = F.array(
        F.struct(F.col("x1").alias("x"), F.col("y1").alias("y")),
        F.struct(F.col("x2").alias("x"), F.col("y1").alias("y")),
        F.struct(F.col("x2").alias("x"), F.col("y2").alias("y")),
        F.struct(F.col("x1").alias("x"), F.col("y2").alias("y")),
    )
    tl = F.lit(t)
    tiles = (
        r.withColumn("poly", ring)
        .withColumn(
            "tx",
            F.explode(F.sequence(
                F.floor(F.col("x1") / tl).cast("long"),
                F.floor(F.col("x2") / tl).cast("long"),
            )),
        )
        .withColumn(
            "ty",
            F.explode(F.sequence(
                F.floor(F.col("y1") / tl).cast("long"),
                F.floor(F.col("y2") / tl).cast("long"),
            )),
        )
    )
    clipped = tiles.withColumn(
        "piece_area2",
        ring_area2(clip_to_box(
            F.col("poly"),
            F.col("tx").cast("double") * tl,
            (F.col("tx") + 1).cast("double") * tl,
            F.col("ty").cast("double") * tl,
            (F.col("ty") + 1).cast("double") * tl,
        )),
    )
    per_tile = (
        clipped.filter(F.col("piece_area2") > 0)
        .groupBy("tx", "ty")
        .agg(F.sum("piece_area2").alias("a2"), F.count(F.lit(1)).alias("np"))
    )
    check_plan(per_tile)
    t0 = time.time()
    got = per_tile.agg(
        F.sum("a2").alias("tot_a2"),
        F.sum("np").alias("tot_pieces"),
        F.count(F.lit(1)).alias("n_tiles"),
    ).collect()[0]
    wall = time.time() - t0
    # conservation oracles, computed with INDEPENDENT arithmetic.
    # positive-width tiles along an axis with INTEGER bounds run from
    # floor(x1/T) to floor((x2-1)/T): a footprint whose edge lands
    # flush on a tile boundary contributes a zero-width piece to the
    # next tile, which the clip side filters with piece_area2 > 0.
    # (all sums are integers < 2^53, so the double sums are exact in
    # any order)
    want = r.select(
        F.sum(F.lit(2.0) * F.col("w") * F.col("h")).alias("a2"),
        F.sum(
            (F.floor((F.col("x2") - 1) / tl) - F.floor(F.col("x1") / tl) + 1)
            * (F.floor((F.col("y2") - 1) / tl) - F.floor(F.col("y1") / tl) + 1)
        ).alias("pieces"),
    ).collect()[0]
    assert got.tot_a2 == want.a2, (got.tot_a2, want.a2)
    assert got.tot_pieces == want.pieces, (got.tot_pieces, want.pieces)
    print(json.dumps({
        "section": "clip", "rows": CLIP_N, "pieces": int(got.tot_pieces),
        "tiles": int(got.n_tiles), "wall_s": round(wall, 2),
        "rows_per_s": int(CLIP_N / wall), "conservation": "exact",
    }))


def stress_pack(spark):
    c = 2048
    d = spark.range(PACK_N).select(
        F.col("id").alias("doc_id"),
        (1 + (F.col("id") * 7) % 200).alias("n_tok"),
    )
    d = d.withColumn("bucket", F.expr(f"doc_id div {PACK_SPAN}"))
    w_intra = (
        Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("intra", F.sum("n_tok").over(w_intra))
    totals = d.groupBy("bucket").agg(F.sum("n_tok").alias("btot"))
    w_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = totals.withColumn(
        "bucket_off", F.sum("btot").over(w_b) - F.col("btot")
    ).select("bucket", "bucket_off")
    d = d.join(F.broadcast(offs), "bucket").withColumn(
        "off", F.col("bucket_off") + F.col("intra") - F.col("n_tok")
    )
    spans = d.withColumn(
        "chunk_id",
        F.explode(F.sequence(
            F.expr(f"off div {c}"), F.expr(f"(off + n_tok - 1) div {c}")
        )),
    ).withColumn(
        "tok_here",
        F.least((F.col("chunk_id") + 1) * c, F.col("off") + F.col("n_tok"))
        - F.greatest(F.col("chunk_id") * c, F.col("off")),
    )
    chunks = spans.groupBy("chunk_id").agg(F.sum("tok_here").alias("n_tokens"))
    check_plan(chunks)
    t0 = time.time()
    got = chunks.agg(
        F.sum("n_tokens").alias("tot"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("n_tokens") != c, 1).otherwise(0)).alias("partial"),
    ).collect()[0]
    wall = time.time() - t0
    want_tot = d.agg(F.sum("n_tok")).collect()[0][0]
    assert got.tot == want_tot
    assert got.partial <= 1  # only the last chunk may be short
    assert got.n_chunks == (want_tot + c - 1) // c
    print(json.dumps({
        "section": "pack_32m", "rows": PACK_N, "tokens": int(want_tot),
        "chunks": int(got.n_chunks), "span": PACK_SPAN,
        "wall_s": round(wall, 2), "docs_per_s": int(PACK_N / wall),
        "conservation": "exact",
    }))


def stress_lpa(spark):
    n = LPA_N
    nodes = spark.range(n).select(F.col("id").alias("node"))
    out_e = (
        nodes.select(
            F.col("node").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(3))).alias("j"),
        )
        .withColumn("dst", (F.col("src") * 31 + F.col("j") * 17) % n)
        .filter(F.col("dst") != F.col("src"))
        .select("src", "dst")
    )
    edges = (
        out_e.union(out_e.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    labels = nodes.withColumn("lbl", F.col("node"))
    t0 = time.time()
    for _ in range(2):
        cnt = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("v"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        upd = (
            cnt.groupBy("v")
            .agg(F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))).alias("m"))
            .select(F.col("v").alias("node"), (-F.col("m.nl")).alias("new_lbl"))
        )
        labels = (
            labels.join(upd, "node", "left")
            .select("node", F.coalesce("new_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    wall = time.time() - t0
    stats = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lbl").alias("mn"),
        F.max("lbl").alias("mx"),
        F.countDistinct("lbl").alias("nc"),
    ).collect()[0]
    assert stats.n == n and 0 <= stats.mn and stats.mx < n
    print(json.dumps({
        "section": "lpa_4m", "nodes": n, "directed_edges": int(n_edges),
        "rounds": 2, "communities": int(stats.nc), "wall_s": round(wall, 2),
        "edge_visits_per_s": int(2 * 2 * n_edges / wall),
    }))


def stress_slerp(spark):
    from hand_index_spark.entry_queries_r5j import _GC_PARAMS, _gc_expr

    lat_u, lon_u = _gc_expr(
        _GC_PARAMS["lat1"], _GC_PARAMS["lon1"],
        _GC_PARAMS["lat2"], _GC_PARAMS["lon2"], "CAST(t AS DOUBLE)",
    )
    pts = (
        spark.range(GC_N)
        .select((F.col("id") % 24).alias("route_id"),
                (1 + F.col("id") % 3).alias("t"))
        .select(F.expr(lat_u).alias("lat_u"), F.expr(lon_u).alias("lon_u"))
    )
    check_plan(pts)
    t0 = time.time()
    got = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lat_u").alias("la0"), F.max("lat_u").alias("la1"),
        F.min("lon_u").alias("lo0"), F.max("lon_u").alias("lo1"),
    ).collect()[0]
    wall = time.time() - t0
    assert got.n == GC_N
    assert -90_000_000 <= got.la0 and got.la1 <= 90_000_000
    assert -180_000_000 <= got.lo0 and got.lo1 <= 180_000_000
    print(json.dumps({
        "section": "slerp_8m", "rows": GC_N, "wall_s": round(wall, 2),
        "rows_per_s": int(GC_N / wall),
    }))


def stress_budget(spark):
    d = spark.range(BUD_N).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % BUD_LANGS).alias("lang"),
        (1 + (F.col("id") * 13) % 400).alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang").orderBy(F.desc("n_tok"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("cum", F.sum("n_tok").over(w))
    tot = d.groupBy("lang").agg(F.sum("n_tok").alias("tot"))
    j = d.join(F.broadcast(tot), "lang").withColumn(
        "kept", (F.col("cum") * 10 <= F.col("tot") * 3).cast("int")
    )
    per_lang = j.groupBy("lang").agg(
        F.sum(F.col("kept") * F.col("n_tok")).alias("kept_tokens"),
        F.max("tot").alias("tot"),
    )
    check_plan(per_lang)
    t0 = time.time()
    viol = per_lang.filter(
        F.col("kept_tokens") * 10 > F.col("tot") * 3
    ).count()
    n_langs = per_lang.count()
    wall = time.time() - t0
    assert viol == 0 and n_langs == BUD_LANGS
    print(json.dumps({
        "section": "budget_16m", "rows": BUD_N, "langs": BUD_LANGS,
        "cap_violations": 0, "wall_s": round(wall, 2),
        "docs_per_s": int(BUD_N / wall),
    }))


def main():
    spark = get_spark("r5h_stress", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    stress_clip(spark)
    stress_pack(spark)
    stress_lpa(spark)
    stress_slerp(spark)
    stress_budget(spark)
    spark.stop()


if __name__ == "__main__":
    main()
