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


def triangle_node_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over an undirected link graph:
    (node, triangles) for every node in at least one triangle.

    Input ``edges``(src, dst) may be directed, duplicated, or contain
    self-loops; the graph is canonicalized to distinct undirected pairs
    first. Counting uses the standard degree-ordering trick (node
    iterator / "compact-forward"): orient every undirected edge from
    the lower (degree, id) endpoint to the higher, so every triangle is
    enumerated EXACTLY once as (u -> v, u -> w, v -> w) with no a<b<c
    post-dedup, and — the 100x property — the wedge join fans out on
    the LOW-degree endpoint: a celebrity page with degree d contributes
    O(d) oriented in-edges but almost no oriented out-wedges, so the
    intermediate never approaches the d^2 wedges a naive enumeration
    builds on skewed webgraphs. Three shuffles total (degree agg, wedge
    join, closing semi-join), zero broadcast, zero Python.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    both = und.select(F.col("a").alias("node"), F.col("b").alias("peer")).union(
        und.select(F.col("b").alias("node"), F.col("a").alias("peer"))
    )
    deg = both.groupBy("node").agg(F.count("*").alias("deg"))
    # rank = deg * 2^40 + node: one BIGINT that totals the (deg, id) order
    ranked = both.join(deg, "node").select(
        "node",
        "peer",
        (F.col("deg") * F.lit(1 << 40) + F.col("node")).alias("nrank"),
    )
    peer_rank = deg.select(
        F.col("node").alias("peer"),
        (F.col("deg") * F.lit(1 << 40) + F.col("node")).alias("prank"),
    )
    oriented = (
        ranked.join(peer_rank, "peer")
        .where(F.col("nrank") < F.col("prank"))
        .select(
            F.col("node").alias("u"),
            F.col("peer").alias("v"),
            F.col("prank").alias("vrank"),
        )
    )
    e1 = oriented.select("u", F.col("v"), "vrank")
    e2 = oriented.select(
        F.col("u").alias("u2"), F.col("v").alias("w"), F.col("vrank").alias("wrank")
    )
    wedges = e1.join(e2, e1.u == e2.u2).where(F.col("vrank") < F.col("wrank"))
    closing = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    )
    tris = wedges.join(closing, ["v", "w"], "left_semi").select("u", "v", "w")
    per_node = (
        tris.select(F.col("u").alias("node"))
        .union(tris.select(F.col("v").alias("node")))
        .union(tris.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    return per_node


def sssp_rounds(
    edges: DataFrame, seeds: DataFrame, rounds: int
) -> DataFrame:
    """Weighted single-source(-set) shortest path by ``rounds`` rounds
    of Bellman-Ford relaxation: ``edges``(src, dst, w) with BIGINT
    weights, ``seeds``(node) at distance 0 -> (node, dist) after
    exactly ``rounds`` relaxations (the true shortest distances once
    ``rounds`` >= the shortest-path hop diameter; running the SAME
    round count as the oracle makes the result well-defined either
    way).

    Per round: one equi-join of the current distance frontier against
    the edge list keyed on src + a min-aggregate — work proportional to
    the relaxed edges, never the whole graph re-derived (per-round
    localCheckpoint, the engine-wide multi-consumer rule). Integer
    weights keep every distance exact.
    """
    dist = seeds.select("node", F.lit(0).cast("long").alias("dist"))
    dist = dist.localCheckpoint(eager=True)
    for r in range(rounds):
        relaxed = (
            dist.join(edges, dist.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.union(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
        # checkpoint between rounds (multi-consumer rule) but leave the
        # final round declarative so the caller composes/audits the plan
        if r < rounds - 1:
            dist = dist.localCheckpoint(eager=True)
    return dist


def k_core(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """k-core by ``rounds`` of synchronous peeling: canonicalize
    ``edges``(src, dst) to distinct undirected pairs, then repeatedly
    drop every node whose remaining degree is < ``k`` (all such nodes
    in a round peel together; cascades propagate one hop per round).
    Returns the surviving (node, deg) — the true k-core once ``rounds``
    covers the longest peel cascade (tests pin the fixpoint).

    Per round: one degree aggregate + two semi-joins to trim the edge
    list — work shrinks with the surviving graph; per-round
    localCheckpoint, final round declarative (engine-wide rules)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for r in range(rounds):
        deg = (
            und.select(F.col("a").alias("node"))
            .union(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node")
        und = und.join(
            keep.select(F.col("node").alias("a")), "a", "left_semi"
        ).join(keep.select(F.col("node").alias("b")), "b", "left_semi")
        if r < rounds - 1:
            und = und.localCheckpoint(eager=True)
    return (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
        .where(F.col("deg") >= k)
    )


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
