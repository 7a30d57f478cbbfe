#!/usr/bin/env python
"""Round-5c scale stress: the four new scale-critical shapes at
~1000x+ the 500-row fixtures.

1. geodesic_band: 2M geotagged points, R=2km — the one-shuffle lat/lon
   grid join; reports pairs + rows/s and asserts the plan has a
   ShuffledHashJoin and no cartesian/broadcast-NL/Python node.
2. triangles: 2M-node ring graph (every node closes a triangle) plus
   20 hub nodes with 20k spokes each — the skew case the
   degree-ordering exists for; naive wedge enumeration would build
   ~20 * 20k^2 = 8e9 hub wedges, the oriented join builds ~none.
3. kde: 2M points, R=50/G=25 kernel (25 candidate cells/pt = 50M
   exploded rows) through the join-free Generate+HashAggregate plan.
4. hand: 1024x1024 DEM (elev = gx + 1024*gy) whose D8 paths run up to
   2046 steps — pointer doubling reaches EVERY cell's drainage in 11
   self-joins; closed form hand == elev checks all 1,048,576 rows.

Prints one JSON line per section; paste into BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hand_index_spark.session import get_spark  # noqa: E402

N_GEO = int(os.environ.get("SPARK_GRAFT_GEO_N", 2_000_000))
N_TRI = int(os.environ.get("SPARK_GRAFT_TRI_N", 2_000_000))
N_KDE = int(os.environ.get("SPARK_GRAFT_KDE_N", 2_000_000))
DEM_W = int(os.environ.get("SPARK_GRAFT_DEM_W", 1024))


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def check_plan(df, expect=(), forbid=()):
    p = plan_of(df)
    for e in expect:
        assert e in p, f"plan missing {e}"
    for f in forbid:
        assert f not in p, f"plan contains {f}"


def stress_geodesic(spark):
    from hand_index_spark.geo.sphere import geodesic_band_pairs

    pts = spark.range(N_GEO).select(
        F.col("id"),
        ((F.col("id") * 9176) % 20000 + 30000).alias("lat"),
        ((F.col("id") * 30269) % 30000 - 15000).alias("lon"),
    )
    out = geodesic_band_pairs(pts, "id", "lat", "lon", 2000)
    check_plan(
        out,
        expect=("ShuffledHashJoin",),
        forbid=("CartesianProduct", "BroadcastNestedLoop", "EvalPython"),
    )
    t0 = time.monotonic()
    pairs = out.count()
    wall = time.monotonic() - t0
    print(json.dumps({
        "stress": "geodesic_band_2km", "points": N_GEO, "pairs": pairs,
        "wall_s": round(wall, 2), "points_per_s": int(N_GEO / wall),
    }))


def stress_triangles(spark):
    from hand_index_spark.operators.graph import triangle_node_counts

    ring = (
        spark.range(N_TRI)
        .select(
            F.col("id").alias("src"),
            F.explode(F.array(F.lit(1), F.lit(2))).alias("s"),
        )
        .withColumn("dst", (F.col("src") + F.col("s")) % F.lit(N_TRI))
        .select("src", "dst")
    )
    hubs = (
        spark.range(20 * 20000)
        .select(
            (F.col("id") % 20).alias("h"),
            (F.col("id") * 101 % F.lit(N_TRI)).alias("spoke"),
        )
        .select(F.col("spoke").alias("src"), (F.col("h") * 1000).alias("dst"))
    )
    edges = ring.union(hubs)
    out = triangle_node_counts(edges)
    check_plan(
        out, forbid=("CartesianProduct", "BroadcastNestedLoop", "EvalPython")
    )
    t0 = time.monotonic()
    row = out.agg(
        F.count("*").alias("nodes"),
        (F.sum("triangles") / 3).cast("long").alias("triangles"),
    ).collect()[0]
    wall = time.monotonic() - t0
    n_edges = 2 * N_TRI + 20 * 20000
    print(json.dumps({
        "stress": "triangles_ring_plus_hubs", "nodes": N_TRI,
        "edges": n_edges, "hub_spokes": 20 * 20000,
        "triangles": row["triangles"], "wall_s": round(wall, 2),
        "edges_per_s": int(n_edges / wall),
    }))


def stress_kde(spark):
    g, r = 25, 50
    p = spark.range(N_KDE).select(
        ((F.col("id") * 7919) % 200000 + 100).alias("px"),
        ((F.col("id") * 104729) % 200000 + 100).alias("py"),
    )
    cand = p.select(
        "px", "py",
        F.expr(
            f"explode(sequence((px - {r} + {g - 1}) DIV {g}, (px + {r}) DIV {g}))"
        ).alias("cx"),
    ).select(
        "px", "py", "cx",
        F.expr(
            f"explode(sequence((py - {r} + {g - 1}) DIV {g}, (py + {r}) DIV {g}))"
        ).alias("cy"),
    )
    d2 = (F.col("px") - F.col("cx") * g) * (F.col("px") - F.col("cx") * g) + (
        F.col("py") - F.col("cy") * g
    ) * (F.col("py") - F.col("cy") * g)
    out = (
        cand.where(d2 < r * r)
        .groupBy("cx", "cy")
        .agg(F.sum(F.lit(r * r) - d2).cast("long").alias("density"))
    )
    check_plan(
        out,
        expect=("HashAggregate",),
        forbid=("Join", "CartesianProduct", "EvalPython"),
    )
    t0 = time.monotonic()
    cells = out.count()
    wall = time.monotonic() - t0
    print(json.dumps({
        "stress": "kde_joinfree", "points": N_KDE,
        "exploded_rows": N_KDE * ((2 * r) // g + 1) ** 2, "cells": cells,
        "wall_s": round(wall, 2), "points_per_s": int(N_KDE / wall),
    }))


def stress_hand(spark):
    from hand_index_spark.operators.hydrology import d8_flow, hand_height

    w = DEM_W
    cells = spark.range(w * w).select(
        (F.col("id") % w).alias("gx"),
        (F.col("id") / w).cast("long").alias("gy"),
    ).select(
        "gx", "gy", (F.col("gx") + F.col("gy") * w).alias("elev")
    )
    t0 = time.monotonic()
    flow = d8_flow(cells).localCheckpoint(eager=True)
    t_flow = time.monotonic() - t0
    # paths run S then W: up to 2*(w-1) = 2046 steps; 2^11 = 2048
    t0 = time.monotonic()
    hand = hand_height(flow, 0, 11)
    bad = hand.where(
        F.col("hand") != F.col("gx") + F.col("gy") * w
    ).count()
    reached = hand.count()
    t_hand = time.monotonic() - t0
    assert bad == 0, f"{bad} cells violate hand == elev"
    assert reached == w * w, f"only {reached} of {w * w} reached drainage"
    print(json.dumps({
        "stress": "hand_pointer_doubling", "cells": w * w,
        "max_path_steps": 2 * (w - 1), "doublings": 11,
        "reached": reached, "closed_form_violations": bad,
        "flow_wall_s": round(t_flow, 2), "hand_wall_s": round(t_hand, 2),
    }))


def stress_textops(spark):
    """Winnowing / CDC / TF-IDF at ~100-400x the 500-doc fixture, on
    synthesized closed-form corpora (no external data)."""
    import hand_index_spark.entry_queries_r5c as R

    # --- winnowing: 100k docs x 40 tokens = 4M token rows
    n_docs = 100_000
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda j: F.concat(
                    F.lit("w"), ((F.col("id") * 37 + j * 101) % 9973).cast("string")
                ),
            ),
        ).alias("text"),
    )
    import tempfile

    tmp = tempfile.mkdtemp(prefix="r5c_text_")
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    t0 = time.monotonic()
    n_fp = R._q_winnow(spark, tmp).count()
    w_wall = time.monotonic() - t0
    print(json.dumps({
        "stress": "winnow_100k_docs", "docs": n_docs, "token_rows": n_docs * 40,
        "fingerprints": n_fp, "wall_s": round(w_wall, 2),
        "docs_per_s": int(n_docs / w_wall),
    }))

    # --- CDC: 30k docs (~250 chars each = 7.5M char rows)
    n_cdc = 30_000
    cdocs = spark.range(n_cdc).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda j: F.concat(
                    F.lit("tok"), ((F.col("id") * 61 + j * 17) % 4999).cast("string")
                ),
            ),
        ).alias("text"),
    )
    tmp2 = tempfile.mkdtemp(prefix="r5c_cdc_")
    cdocs.write.mode("overwrite").parquet(f"{tmp2}/documents.parquet")
    t0 = time.monotonic()
    row = R._q_cdc_chunks(spark, tmp2).agg(
        F.count("*").alias("chunks"), F.sum("ln").alias("chars")
    ).collect()[0]
    c_wall = time.monotonic() - t0
    print(json.dumps({
        "stress": "cdc_30k_docs", "docs": n_cdc, "char_rows": int(row["chars"]),
        "chunks": int(row["chunks"]), "wall_s": round(c_wall, 2),
        "chars_per_s": int(row["chars"] / c_wall),
    }))

    # --- TF-IDF pairs: 100k docs, 1M-term vocab (df ~ 4 under the cap)
    tdocs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda j: F.concat(
                    F.lit("t"),
                    ((F.col("id") * 40 + j) * 2654435761 % 1000003).cast("string"),
                ),
            ),
        ).alias("text"),
    )
    tmp3 = tempfile.mkdtemp(prefix="r5c_tfidf_")
    tdocs.write.mode("overwrite").parquet(f"{tmp3}/documents.parquet")
    t0 = time.monotonic()
    n_pairs = R._q_tfidf_pairs(spark, tmp3).count()
    t_wall = time.monotonic() - t0
    print(json.dumps({
        "stress": "tfidf_100k_docs", "docs": n_docs,
        "pairs_over_threshold": n_pairs, "wall_s": round(t_wall, 2),
        "docs_per_s": int(n_docs / t_wall),
    }))


def main() -> None:
    spark = get_spark(app_name="r5c_stress")
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1:] or ["geodesic", "triangles", "kde", "hand", "textops"]
    fns = {
        "geodesic": stress_geodesic,
        "triangles": stress_triangles,
        "kde": stress_kde,
        "hand": stress_hand,
        "textops": stress_textops,
    }
    for k in which:
        fns[k](spark)


if __name__ == "__main__":
    main()
