"""Bounded-depth BFS over a link graph (frontier expansion).

The crawl-side question PageRank doesn't answer: how FAR is every page
from a trusted seed set (seed-distance is the classic spam/quality
signal, and hop-bounded reachability is the frontier-scheduling
primitive of a crawler).

Shape: the textbook distributed BFS — per round, one equi-join of the
current frontier against the edge list keyed on src, a DISTINCT on the
new frontier, and a left-anti join against the visited set; both the
frontier and the visited set are localCheckpoint'ed per round so round
r never re-derives rounds 0..r-1 (the engine-wide multi-consumer
rule). Rounds are bounded by ``max_hops``; at 100 TB each round is
join work proportional to the frontier's out-edges, never the whole
graph, and the visited set only grows by genuinely new nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_levels(
    edges: DataFrame, seeds: DataFrame, max_hops: int
) -> DataFrame:
    """``edges``(src, dst), ``seeds``(node) -> (node, hop) with hop the
    minimum number of edges from any seed (0 for seeds themselves),
    for all nodes within ``max_hops``. Unreached nodes are absent."""
    visited = seeds.select("node", F.lit(0).cast("long").alias("hop"))
    visited = visited.localCheckpoint(eager=True)
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h).cast("long"))
            .localCheckpoint(eager=True)
        )
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited
