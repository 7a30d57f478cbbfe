#!/usr/bin/env python
"""PageRank + webgraph ops at ~1000x the fixture scale (round 5).

The contract query ``pagerank_links`` runs 5 fixed-point iterations
over a 500-node graph; this script proves the SHAPE holds when the
graph is millions of nodes: it synthesizes ``SPARK_GRAFT_PR_NODES``
(default 2M) nodes with the same closed-form 3-out-link formula
(~3N edges after self-loop/dup drop), runs the same join-agg loop
(edges localCheckpoint'd once, per-iteration checkpoint), and reports

* edges/s per iteration (the steady-state cost that scales to 10^12),
* total wall for 5 iterations,
* an invariant check: sum(rank_q) stays within integer-division slack
  of the 2^30 total mass (catches silent loss on any partitioning).

Prints one JSON line; paste into BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hand_index_spark.session import get_spark  # noqa: E402

N = int(os.environ.get("SPARK_GRAFT_PR_NODES", 2_000_000))
ITERS = 5
SCALE = 1 << 30


def main() -> None:
    spark = get_spark(app_name="graph_stress")
    t0 = time.monotonic()
    nodes = spark.range(N).select(F.col("id").alias("node"))
    edges = (
        spark.range(N)
        .select(
            F.col("id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(3))).alias("j"),
        )
        .withColumn("dst", (F.col("src") * 31 + F.col("j") * 17) % F.lit(N))
        .filter(F.col("dst") != F.col("src"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = ((SCALE * 15) // 100) // N
    ranks = nodes.withColumn("rank_q", F.lit(SCALE // N).cast("long"))
    build_s = time.monotonic() - t0

    iter_s = []
    for _ in range(ITERS):
        t1 = time.monotonic()
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr("rank_q div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr("(coalesce(s, 0) * 85) div 100")
                ).cast("long").alias("rank_q"),
            )
            .localCheckpoint(eager=True)
        )
        iter_s.append(round(time.monotonic() - t1, 3))

    mass = ranks.agg(F.sum("rank_q").alias("m")).collect()[0]["m"]
    # every div loses < 1 unit per row; 5 iterations x (per-edge +
    # per-node + damping) bounds the loss far below 1% of total mass
    mass_ok = 0 < mass <= SCALE and (SCALE - mass) < 0.05 * SCALE
    med = sorted(iter_s)[len(iter_s) // 2]
    out = {
        "metric": "pagerank_stress",
        "nodes": N,
        "edges": n_edges,
        "build_s": round(build_s, 3),
        "iter_s": iter_s,
        "median_iter_s": med,
        "edges_per_s_median_iter": int(n_edges / med) if med > 0 else None,
        "total_s": round(build_s + sum(iter_s), 3),
        "rank_mass": int(mass),
        "mass_ok": bool(mass_ok),
    }
    print(json.dumps(out))

    # ---- BFS on the same graph (operators/graph.bfs_levels): seed
    # ~N/1000 nodes, 4 hops; reports per-hop frontier size and wall.
    from hand_index_spark.operators.graph import bfs_levels

    seeds = nodes.where(F.col("node") % 1009 == 0)
    t2 = time.monotonic()
    levels = bfs_levels(edges, seeds, 4)
    per_hop = {
        int(r["hop"]): int(r["n"])
        for r in levels.groupBy("hop").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    bfs_s = time.monotonic() - t2
    print(
        json.dumps(
            {
                "metric": "bfs_stress",
                "nodes": N,
                "edges": n_edges,
                "seeds": per_hop.get(0, 0),
                "per_hop": per_hop,
                "reached": sum(per_hop.values()),
                "wall_s": round(bfs_s, 3),
                "edge_lookups_per_s": int(
                    sum(per_hop.values()) * 3 / bfs_s
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
