"""Round-5 registry batch.

Same contract as every other batch: each query is (a) an idiomatic
Spark program and (b) a DuckDB oracle with identical column names and
arithmetic, registered via the shared _register helper into GEO5/TEXT5.
"""

from __future__ import annotations

from pyspark.sql import functions as F

GEO5: dict = {}
TEXT5: dict = {}
ORACLES5: dict[str, str] = {}


def _register(reg: dict, name: str, fn, oracle: str | None) -> None:
    reg[name] = fn
    if oracle is not None:
        ORACLES5[name] = oracle


# --------------------------------------------------------------------------
# F9: Douglas-Peucker simplification (reference load.py:155-156,
# ST_Simplify at 100 m) — the mapInPandas NumPy kernel in
# operators/simplify.py, with all derived stats (counts, shoelace area,
# vertex sums) computed JVM-side from the simplified ring.
#
# Oracle design (closed-form, exact): 64 deterministic octagons built
# from the integer template (2,0),(4,0),(6,2),(6,4),(4,6),(2,6),(0,4),
# (0,2), scaled by s=1+k%4, translated by (11k,7k), with the first 7
# edges subdivided into S=2 (even k) or 4 (odd k) dyadic parts — every
# inserted vertex is EXACTLY collinear (dyadic rationals: coordinates,
# cross products and deviations are all exact in float64), so DP at
# tol=0.5 provably keeps exactly the 8 corners (+closure): corner
# sagitta >= 0.894*s > 0.5 >> the ~0 subdivision deviation. Counts,
# shoelace area (28*s*s) and corner-coordinate sums (24s+88k, 24s+56k)
# are integer-valued doubles -> bit-exact vs DuckDB arithmetic.

_SIMPLIFY_TEMPLATE = [(2, 0), (4, 0), (6, 2), (6, 4), (4, 6), (2, 6), (0, 4), (0, 2)]
_SIMPLIFY_N = 64
_SIMPLIFY_TOL = 0.5


def _simplify_fixture_rows():
    rows = []
    for k in range(_SIMPLIFY_N):
        s = 1 + k % 4
        sub = 2 if k % 2 == 0 else 4
        dx, dy = 11.0 * k, 7.0 * k
        cs = [(s * x + dx, s * y + dy) for x, y in _SIMPLIFY_TEMPLATE]
        flat: list[float] = []
        for i in range(7):  # last edge left unsubdivided (keeps pts[-1] a corner)
            x0, y0 = cs[i]
            x1, y1 = cs[i + 1]
            for j in range(sub):
                t = j / sub  # dyadic: exact in float64
                flat += [x0 + t * (x1 - x0), y0 + t * (y1 - y0)]
        flat += [cs[7][0], cs[7][1], cs[0][0], cs[0][1]]  # corner 7 + closure
        rows.append((k, flat))
    return rows


def _q_simplify_ring(spark, sf_dir):
    from .operators.simplify import simplify_rings

    rings = spark.createDataFrame(
        _simplify_fixture_rows(), schema="ring_id long, coords_flat array<double>"
    )
    out = simplify_rings(rings, tol=_SIMPLIFY_TOL)
    n = (F.size("simplified") / 2).cast("long")  # closed-ring point count
    xs = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.element_at("simplified", (i * 2 + 1).cast("int")),
    )
    ys = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.element_at("simplified", (i * 2 + 2).cast("int")),
    )
    # shoelace over the closed ring: left-assoc fold, exact integer terms
    shoelace = F.aggregate(
        F.sequence(F.lit(0), n - 2),  # one term per edge of the closed ring
        F.lit(0.0),
        lambda acc, i: acc
        + (
            F.element_at("simplified", (i * 2 + 1).cast("int"))
            * F.element_at("simplified", (i * 2 + 4).cast("int"))
            - F.element_at("simplified", (i * 2 + 3).cast("int"))
            * F.element_at("simplified", (i * 2 + 2).cast("int"))
        ),
    )
    return out.select(
        "ring_id",
        (F.size("coords_flat") / 2).cast("long").alias("n_in"),
        n.alias("n_out"),
        (F.abs(shoelace) / F.lit(2.0)).alias("area"),
        F.aggregate(xs, F.lit(0.0), lambda a, x: a + x).alias("sx"),
        F.aggregate(ys, F.lit(0.0), lambda a, y: a + y).alias("sy"),
    )


_register(
    GEO5,
    "simplify_ring",
    _q_simplify_ring,
    f"""
    SELECT CAST(k AS BIGINT) AS ring_id,
           CAST(7 * (CASE WHEN k % 2 = 0 THEN 2 ELSE 4 END) + 2 AS BIGINT) AS n_in,
           CAST(9 AS BIGINT) AS n_out,
           CAST(28 * (1 + k % 4) * (1 + k % 4) AS DOUBLE) AS area,
           CAST(24 * (1 + k % 4) + 88 * k AS DOUBLE) AS sx,
           CAST(24 * (1 + k % 4) + 56 * k AS DOUBLE) AS sy
    FROM range({_SIMPLIFY_N}) t(k)
    """,
)
