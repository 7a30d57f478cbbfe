"""Hilbert-curve encoding for 2-D locality keys.

The Hilbert curve is the space-filling curve with unit-step
continuity: unlike the Morton/Z-order key (operators/zorder.py),
every pair of consecutive Hilbert indices is a *unit* grid step
(Morton takes long diagonal jumps at power-of-two boundaries), so a
contiguous key range is always a CONNECTED region. The payoff is the
CLUSTERING FACTOR (Moon et al. 2001): a 2-D query box splits into
~2x fewer contiguous key runs under Hilbert than under Morton
(measured in tests/test_r5e_ops.py: ~16.5 vs ~30.8 mean runs on
random 16x16 boxes, never worse on any sampled box) — each run being
a contiguous file segment a range-clustered scan must touch. Two
honest caveats, both measured: the mean per-step |Δkey| of grid
neighbours is ~1.2x BETTER for Morton, and at coarse file
granularity (64 files over a 256^2 key space) the files-touched
counts tie — Hilbert's edge appears as file count grows relative to
box size, i.e. exactly at the 100-TB end. This module is the codec
half of the story; the layout/zone-map machinery is shared with
zorder (tables/icelite.py, tests/test_zonemaps.py).

Algorithm: the classical xy2d bit-walk (Wikipedia "Hilbert curve",
public domain pseudocode): walk bits MSB→LSB, accumulate the quadrant
digit ``(3*rx) XOR ry`` weighted by s², then rotate/reflect the frame.
The rotation makes the recurrence *stateful across rounds*, which is
exactly what a single Catalyst expression cannot express without
exponential inlining — so the operator is built as BITS chained
projections (one per bit). Catalyst's CollapseProject keeps aliases
that are referenced more than once as separate Project nodes, so the
physical plan stays linear in BITS and fully inside WholeStageCodegen
(plan-audited: zero Python, zero joins, zero shuffles).

The DuckDB oracle (:func:`hilbert_sql`) is the same recurrence as BITS
nested subqueries — identical integer arithmetic, bit-for-bit.

Reference parity note: the reference's Iceberg layout uses Z-order via
rewrite_data_files (SURVEY §2.9); Hilbert is the strictly-better
locality key offered alongside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS = 16  # per-dimension key bits; key < 4^16 = 2^32, safely BIGINT


def hilbert_py(x: int, y: int, bits: int = BITS) -> int:
    """Pure-Python reference (tests cross-check Spark/SQL against it)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def with_hilbert(
    df: DataFrame, x: str, y: str, out: str = "hkey", bits: int = BITS
) -> DataFrame:
    """Append the Hilbert index of integer columns (x, y) (low ``bits``
    bits each) as ``out``. One chained projection per bit — linear
    plan, pure codegen."""
    keep = list(df.columns)
    mask = (1 << bits) - 1
    cur = df.select(
        *keep,
        F.col(x).cast("long").bitwiseAND(F.lit(mask)).alias("__hx"),
        F.col(y).cast("long").bitwiseAND(F.lit(mask)).alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        hx, hy, hd = F.col("__hx"), F.col("__hy"), F.col("__hd")
        rx = F.shiftright(hx, b).bitwiseAND(F.lit(1))
        ry = F.shiftright(hy, b).bitwiseAND(F.lit(1))
        cur = cur.select(
            *keep,
            F.when(ry == 1, hx)
            .when(rx == 1, F.lit(s - 1) - hy)
            .otherwise(hy)
            .alias("__hx"),
            F.when(ry == 1, hy)
            .when(rx == 1, F.lit(s - 1) - hx)
            .otherwise(hx)
            .alias("__hy"),
            (hd + F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry)).alias("__hd"),
        )
    return cur.select(*keep, F.col("__hd").alias(out))


def cluster_hilbert(df: DataFrame, x: str, y: str, n_files: int) -> DataFrame:
    """Return df laid out for 2-D locality: range-partitioned and
    sorted by the Hilbert key of (x, y) — the drop-in sibling of
    zorder.cluster_zorder with the better clustering factor. Because
    the curve fills every ALIGNED power-of-two block contiguously,
    an aligned block's keys land in at most 2 of the range-partitioned
    files under any range-boundary sampling (the layout guarantee
    `hilbert_pruned_read` pins)."""
    cur = with_hilbert(df, x, y, out="__hk")
    return (
        cur.repartitionByRange(n_files, "__hk")
        .sortWithinPartitions("__hk")
        .drop("__hk")
    )


def hilbert_sql(
    base_sql: str, keep: list[str], x: str, y: str, out: str = "hkey",
    bits: int = BITS,
) -> str:
    """DuckDB twin of :func:`with_hilbert`: wrap ``base_sql`` (a SELECT
    producing ``keep`` + integer columns ``x``/``y``) in ``bits``
    nested subqueries replaying the identical recurrence."""
    cols = ", ".join(keep)
    mask = (1 << bits) - 1
    q = (
        f"SELECT {cols}, CAST(({x} & {mask}) AS BIGINT) AS __hx, "
        f"CAST(({y} & {mask}) AS BIGINT) AS __hy, "
        f"CAST(0 AS BIGINT) AS __hd FROM ({base_sql})"
    )
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        rx = f"((__hx >> {b}) & 1)"
        ry = f"((__hy >> {b}) & 1)"
        q = f"""SELECT {cols},
  CASE WHEN {ry} = 1 THEN __hx
       WHEN {rx} = 1 THEN {s - 1} - __hy ELSE __hy END AS __hx,
  CASE WHEN {ry} = 1 THEN __hy
       WHEN {rx} = 1 THEN {s - 1} - __hx ELSE __hx END AS __hy,
  __hd + {s * s} * xor(3 * {rx}, {ry}) AS __hd
FROM ({q})"""
    return f"SELECT {cols}, __hd AS {out} FROM ({q})"
