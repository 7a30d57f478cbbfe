"""Z-order (Morton) clustering for multi-dimensional file skipping.

Iceberg's ``OPTIMIZE ... ZORDER BY (x, y)`` rebuilt from scratch: a
bit-interleaved sort key computed entirely JVM-side (five shift/mask
steps per dimension — stays inside whole-stage codegen, no UDF), used
to rewrite a table so that files are clustered in BOTH dimensions at
once. With per-file zone maps on x AND y (tables/icelite.py), a 2-D
box predicate then skips every file whose [min,max] rectangle misses
the box — O(perimeter) files touched instead of the O(stripe) a
single-column sort gives (measured in tests/test_zonemaps.py and
BENCH/NOTES.md).

Why Morton and not the S2 Hilbert in geo/s2lite.py: the table layout
key only needs locality, not the sphere/face machinery, and Morton's
spread is 5 integer ops per dimension with a closed-form SQL twin —
the DuckDB oracle recomputes the exact same key bit-for-bit.

Scale shape: the rewrite is one repartitionByRange on the key (a
single shuffle, AQE-splittable) + a per-partition sort; planning a
pruned read touches only the manifest-sized zone-map table.

Reference parity note: the reference gets this for free from Iceberg's
metadata tables + rewrite_data_files (SURVEY §2.9); this module is the
from-scratch counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # per-dimension key bits; key < 2^32, safely inside BIGINT
_MASKS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread(c: Column) -> Column:
    """Spread the low 16 bits of c so bit i lands at position 2*i.
    The cast to long is load-bearing: int32 inputs would wrap negative
    at ``spread(y) << 1`` (0xAAAAAAAA has bit 31 set)."""
    c = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for sh, mask in _MASKS:
        c = (c.bitwiseOR(F.shiftleft(c, sh))).bitwiseAND(F.lit(mask))
    return c


def _spread_sql(expr: str) -> str:
    s = f"({expr} & 65535)"
    for sh, mask in _MASKS:
        s = f"(({s} | ({s} << {sh})) & {mask})"
    return s


def zorder_key(x: Column, y: Column) -> Column:
    """Morton key interleaving two nonnegative integer columns
    (low 16 bits each): key bit 2*i = x bit i, bit 2*i+1 = y bit i."""
    return _spread(x).bitwiseOR(F.shiftleft(_spread(y), 1)).cast("long")


def zorder_key_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB twin of :func:`zorder_key` — identical shift/mask
    arithmetic, bit-for-bit (all intermediates < 2^33 fit BIGINT)."""
    return f"CAST(({_spread_sql(x_expr)} | ({_spread_sql(y_expr)} << 1)) AS BIGINT)"


def cluster_zorder(df: DataFrame, x: str, y: str, n_files: int) -> DataFrame:
    """Return df laid out for 2-D locality: range-partitioned and
    sorted by the Morton key of (x, y). Writing this frame yields
    files whose per-file (x, y) zone-map rectangles tile the plane in
    compact blocks instead of full-width stripes."""
    k = zorder_key(F.col(x).cast("long"), F.col(y).cast("long"))
    return (
        df.withColumn("__zk", k)
        .repartitionByRange(n_files, "__zk")
        .sortWithinPartitions("__zk")
        .drop("__zk")
    )
