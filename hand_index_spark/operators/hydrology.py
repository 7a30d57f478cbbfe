"""D8 hydrology over integer DEM grids: flow direction, flow
accumulation, and HAND (Height Above Nearest Drainage).

This is the reference's namesake domain (NGWPC *hand-index* catalogs
HAND rasters; load.py ingests their catchment vectors) — here the
raster-side computation itself is expressed in Catalyst:

- **D8 flow direction**: each cell drains to its steepest-descent
  neighbor among the 8 adjacent cells, slope = drop / distance with
  distance 1 for cardinals and sqrt(2) for diagonals. The float-free
  trick: for positive integer drops, ``drop_c / 1 > drop_d / sqrt(2)``
  iff ``2*drop_c^2 > drop_d^2`` — and ``2a^2 = b^2`` has NO positive
  integer solutions (sqrt(2) is irrational), so cardinal-vs-diagonal
  comparisons can never tie and the whole argmax is exact BIGINT
  arithmetic. Remaining ties (equal drops at equal distance class)
  break on the fixed ESRI direction priority E,SE,S,SW,W,NW,N,NE.
  Shape: ONE self equi-join of the cell table on the packed
  8-neighborhood key (explode to 8 offsets on one side — the
  morans/distance-join grid pattern), then a max(struct) aggregate;
  zero broadcast, zero Python, AQE-splittable.

- **Flow accumulation**: every cell has at most one outgoing D8 edge,
  so the flow graph is a forest and accumulation(c) = #cells whose
  downstream path passes through c. Computed as ``rounds`` Jacobi
  iterations ``acc' = sum over upstream u of (1 + acc(u))`` — exact
  once ``rounds`` >= the longest flow path (callers/tests pin the
  fixpoint); per-round work is one keyed shuffle over the EDGES, not
  the whole grid re-derived (per-round localCheckpoint).

- **HAND**: height above the first drainage cell on the cell's D8
  path. Drainage cells (and pits) are made absorbing
  (``next(c) = c``), then the next-pointer function is composed by
  POINTER DOUBLING — J rounds of self-join give f^(2^J), so a
  1000-step flow path needs 10 shuffles, not 1000. Absorption
  guarantees f^k(c) is the FIRST drainage cell on the path. Cells
  whose 2^J-step image is not drainage (pit basins, truncated paths)
  are omitted — the oracle composes the identical recurrence.

- **Strahler stream order**: the classic stream-network hierarchy on
  the D8 forest — headwater cells are order 1; a cell's order is the
  max of its upstream orders, +1 when two or more upstream cells tie
  at that max. Computed as synchronized Jacobi rounds from the all-1
  state (``strahler_order``); each round is one keyed shuffle over
  the edges plus a two-level max-of-(order,count) aggregate. The
  recurrence is monotone and converges once ``rounds`` >= the forest
  depth (tests pin the fixpoint); the oracle replays the identical
  bounded recurrence so Spark/DuckDB agree at ANY round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ESRI D8 codes in priority order: E, SE, S, SW, W, NW, N, NE
# (gy increases northward). card = 1 -> distance 1; card = 0 -> sqrt(2).
D8_DIRS = [
    (1, 0, 1, 1),
    (1, -1, 2, 0),
    (0, -1, 4, 1),
    (-1, -1, 8, 0),
    (-1, 0, 16, 1),
    (-1, 1, 32, 0),
    (0, 1, 64, 1),
    (1, 1, 128, 0),
]

_PACK = 1 << 21


def _key(gx, gy):
    return gx * F.lit(_PACK) + gy


def d8_flow(cells: DataFrame) -> DataFrame:
    """``cells``(gx, gy, elev) — integer grid, one row per cell — to
    (gx, gy, elev, dir, tx, ty): ESRI direction code of the steepest
    strictly-downhill neighbor (0 for pits/outlets, which point at
    themselves)."""
    base = cells.select(
        F.col("gx").cast("long").alias("gx"),
        F.col("gy").cast("long").alias("gy"),
        F.col("elev").cast("long").alias("elev"),
    )
    left = base.select(
        _key(F.col("gx"), F.col("gy")).alias("__cell"),
        F.col("gx"), F.col("gy"), F.col("elev"),
    )
    offsets = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(code).alias("code"),
                F.lit(2 if card else 1).alias("mult"),
                F.lit(pri).alias("pri"),
            )
            for pri, (dx, dy, code, card) in enumerate(D8_DIRS)
        ]
    )
    # right row = "I am the neighbor in direction o of the cell at
    # (gx - o.dx, gy - o.dy)"
    right = base.select(
        F.explode(offsets).alias("o"), "gx", "gy", F.col("elev").alias("nelev")
    ).select(
        _key(F.col("gx") - F.col("o.dx"), F.col("gy") - F.col("o.dy")).alias(
            "__cell"
        ),
        F.col("gx").alias("ngx"),
        F.col("gy").alias("ngy"),
        "nelev",
        F.col("o.code").alias("code"),
        F.col("o.mult").alias("mult"),
        F.col("o.pri").alias("pri"),
    )
    cand = (
        left.hint("shuffle_hash")
        .join(right, "__cell")
        .where(F.col("elev") > F.col("nelev"))
        .select(
            "gx",
            "gy",
            "elev",
            # slope rank: 2*drop^2 (cardinal) vs drop^2 (diagonal) —
            # exact, cross-class ties impossible (sqrt2 irrational)
            (
                (F.col("elev") - F.col("nelev"))
                * (F.col("elev") - F.col("nelev"))
                * F.col("mult")
            ).alias("rank"),
            (F.lit(7) - F.col("pri")).alias("inv_pri"),
            "code",
            "ngx",
            "ngy",
        )
    )
    best = cand.groupBy("gx", "gy").agg(
        F.max(
            F.struct("rank", "inv_pri", "code", "ngx", "ngy")
        ).alias("b"),
        F.first("elev").alias("elev"),
    )
    flowing = best.select(
        "gx", "gy", "elev",
        F.col("b.code").cast("long").alias("dir"),
        F.col("b.ngx").alias("tx"),
        F.col("b.ngy").alias("ty"),
    )
    pits = base.join(
        cand.select("gx", "gy").distinct(), ["gx", "gy"], "left_anti"
    ).select(
        "gx", "gy", "elev",
        F.lit(0).cast("long").alias("dir"),
        F.col("gx").alias("tx"),
        F.col("gy").alias("ty"),
    )
    return flowing.unionByName(pits)


def flow_accumulation(flow: DataFrame, rounds: int) -> DataFrame:
    """``flow`` = d8_flow output -> (gx, gy, acc): the number of
    upstream cells within ``rounds`` hops (the full upstream count —
    classic flow accumulation — once ``rounds`` >= the longest flow
    path; tests pin the fixpoint)."""
    edges = (
        flow.where(F.col("dir") > 0)
        .select(
            _key(F.col("gx"), F.col("gy")).alias("u"),
            _key(F.col("tx"), F.col("ty")).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    cells = flow.select(
        "gx", "gy", _key(F.col("gx"), F.col("gy")).alias("c")
    )
    acc = cells.select("c", F.lit(0).cast("long").alias("acc"))
    acc = acc.localCheckpoint(eager=True)
    for r in range(rounds):
        contrib = (
            edges.join(acc, edges.u == acc.c)
            .groupBy("v")
            .agg(F.sum(F.col("acc") + F.lit(1)).alias("inflow"))
        )
        acc = (
            cells.select("c")
            .join(contrib, cells.c == contrib.v, "left")
            .select(
                "c", F.coalesce(F.col("inflow"), F.lit(0)).cast("long").alias("acc")
            )
        )
        if r < rounds - 1:
            acc = acc.localCheckpoint(eager=True)
    return cells.join(acc, "c").select("gx", "gy", "acc")


def watershed_label(flow: DataFrame, doublings: int) -> DataFrame:
    """``flow`` = d8_flow output -> (gx, gy, basin_gx, basin_gy):
    every cell labeled with the PIT/OUTLET its D8 path terminates at —
    watershed (drainage-basin) delineation. Only pits absorb
    (``next = self`` iff dir = 0), so pointer doubling composes to the
    terminal cell; J self-joins cover 2^J-step paths, and once
    2^J >= the longest path EVERY cell is labeled (tests pin the
    fixpoint). The oracle replays the identical composition."""
    nodes = flow.select(
        _key(F.col("gx"), F.col("gy")).alias("c"),
        "gx", "gy",
        (F.col("dir") == 0).alias("pit"),
        F.when(F.col("dir") == 0, _key(F.col("gx"), F.col("gy")))
        .otherwise(_key(F.col("tx"), F.col("ty")))
        .alias("nxt"),
    ).localCheckpoint(eager=True)

    state = nodes.select("c", F.col("nxt").alias("r"))
    for j in range(doublings):
        hop = state.select(F.col("c").alias("c2"), F.col("r").alias("r2"))
        state = state.join(hop, state.r == hop.c2).select(
            "c", F.col("r2").alias("r")
        )
        if j < doublings - 1:
            state = state.localCheckpoint(eager=True)

    pits = nodes.where(F.col("pit")).select(
        F.col("c").alias("pc"),
        F.col("gx").alias("basin_gx"),
        F.col("gy").alias("basin_gy"),
    )
    return (
        state.join(pits, state.r == pits.pc)
        .join(nodes.select("c", "gx", "gy"), "c")
        .select("gx", "gy", "basin_gx", "basin_gy")
    )


def strahler_order(flow: DataFrame, rounds: int) -> DataFrame:
    """``flow`` = d8_flow output -> (gx, gy, sorder): Strahler order of
    every cell in the D8 forest after ``rounds`` synchronized updates
    from the all-1 state (exact Strahler once ``rounds`` >= forest
    depth; tests pin the fixpoint).

    Update rule per cell c with upstream orders U: let m = max(U) and
    k = |{u in U : order(u) = m}|; order'(c) = m + 1 if k >= 2 else m
    (headwaters, U empty, stay 1). The (m, k) pair is one
    groupBy(child, order).count() followed by max(struct(order, k)) —
    (v, order) is unique so the struct max is deterministic."""
    edges = (
        flow.where(F.col("dir") > 0)
        .select(
            _key(F.col("gx"), F.col("gy")).alias("u"),
            _key(F.col("tx"), F.col("ty")).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    cells = flow.select(
        "gx", "gy", _key(F.col("gx"), F.col("gy")).alias("c")
    )
    ordr = cells.select("c", F.lit(1).cast("long").alias("sorder"))
    ordr = ordr.localCheckpoint(eager=True)
    for r in range(rounds):
        per = (
            edges.join(ordr, edges.u == ordr.c)
            .groupBy("v", "sorder")
            .agg(F.count("*").alias("k"))
        )
        best = per.groupBy("v").agg(
            F.max(F.struct("sorder", "k")).alias("m")
        )
        nxt = best.select(
            F.col("v").alias("c"),
            (
                F.col("m.sorder")
                + F.when(F.col("m.k") >= 2, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("sorder"),
        )
        ordr = (
            cells.select("c")
            .join(nxt, "c", "left")
            .select(
                "c",
                F.coalesce(F.col("sorder"), F.lit(1))
                .cast("long")
                .alias("sorder"),
            )
        )
        if r < rounds - 1:
            ordr = ordr.localCheckpoint(eager=True)
    return cells.join(ordr, "c").select("gx", "gy", "sorder")


def hand_height(flow: DataFrame, drain_max_elev: int, doublings: int) -> DataFrame:
    """Height Above Nearest Drainage: for every cell whose D8 path
    reaches a drainage cell (elev <= ``drain_max_elev``) within
    2^``doublings`` steps, (gx, gy, hand) with
    ``hand = elev - elev(first drainage on the path)``.

    Drainage cells and pits absorb (next = self), so pointer doubling
    composes to the FIRST drainage hit; J self-joins cover 2^J-step
    paths (the log-round scale shape)."""
    nodes = flow.select(
        _key(F.col("gx"), F.col("gy")).alias("c"),
        "gx", "gy", "elev",
        (F.col("elev") <= F.lit(int(drain_max_elev))).alias("drain"),
        F.when(
            (F.col("elev") <= F.lit(int(drain_max_elev))) | (F.col("dir") == 0),
            _key(F.col("gx"), F.col("gy")),
        )
        .otherwise(_key(F.col("tx"), F.col("ty")))
        .alias("nxt"),
    ).localCheckpoint(eager=True)

    state = nodes.select("c", F.col("nxt").alias("r"))
    for j in range(doublings):
        hop = state.select(F.col("c").alias("c2"), F.col("r").alias("r2"))
        state = state.join(hop, state.r == hop.c2).select(
            "c", F.col("r2").alias("r")
        )
        if j < doublings - 1:
            state = state.localCheckpoint(eager=True)

    drains = nodes.where(F.col("drain")).select(
        F.col("c").alias("dc"), F.col("elev").alias("delev")
    )
    return (
        state.join(drains, state.r == drains.dc)
        .join(nodes.select("c", "gx", "gy", "elev"), "c")
        .select("gx", "gy", (F.col("elev") - F.col("delev")).alias("hand"))
    )
