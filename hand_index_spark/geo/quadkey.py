"""Web-Mercator XYZ tile coordinates and Bing-style quadkeys.

The slippy-map tile scheme (OSM XYZ) and its base-4 string form (the
Bing Maps quadkey) are THE interchange cell systems for web-scale map
tiles — the published spec is pure arithmetic, so unlike H3 (whose
base-cell tables cannot be validated in this sandbox — see
tests/test_h3_spec_gap.py) this codec can be SPEC-EXACT and is pinned
to canonical vectors in tests/test_r5c_ops.py.

Spec (Bing Maps tile system / OSM slippy map):

- ``x = (lon + 180) / 360``;
  ``y = 0.5 - ln((1 + sin(lat)) / (1 - sin(lat))) / (4*pi)``
- tile: ``tx = floor(x * 2^z)``, ``ty = floor(y * 2^z)``, clamped to
  ``[0, 2^z - 1]``;
- quadkey digit i (from the most significant bit down):
  ``2 * bit_i(ty) + bit_i(tx)``.

Oracle parity: the tile floor is the only float->int boundary; the
engine-wide trig rule applies (JVM vs libm last-ulp differences — a
flip needs ``x * 2^z`` within 1 ulp of an integer, verified absent on
the pinned fixtures). Everything after the floor is exact integer/bit
arithmetic, expressed identically in Spark and DuckDB.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_CLAMP_LAT = 85.05112878  # spec cutoff: tile space covers +/- this


def tile_xy(lat_md: Column, lon_md: Column, zoom: int) -> tuple[Column, Column]:
    """Web-Mercator tile (tx, ty) at ``zoom`` for integer milli-degree
    coordinates (|lat| must be within the spec's +/-85.05112878 cutoff;
    callers pin their fixtures inside it)."""
    n = float(1 << zoom)
    lon = lon_md / F.lit(1000.0)
    lat = lat_md / F.lit(1000.0)
    x = (lon + F.lit(180.0)) / F.lit(360.0)
    s = F.sin((lat * F.lit(math.pi)) / F.lit(180.0))
    y = F.lit(0.5) - F.log((F.lit(1.0) + s) / (F.lit(1.0) - s)) / F.lit(
        4.0 * math.pi
    )
    tx = F.greatest(
        F.lit(0),
        F.least(F.lit((1 << zoom) - 1), F.floor(x * F.lit(n)).cast("long")),
    )
    ty = F.greatest(
        F.lit(0),
        F.least(F.lit((1 << zoom) - 1), F.floor(y * F.lit(n)).cast("long")),
    )
    return tx.cast("long"), ty.cast("long")


def tile_xy_sql(lat: str, lon: str, zoom: int) -> tuple[str, str]:
    """DuckDB twin of :func:`tile_xy` — identical operation order.
    DuckDB ``4.0 * pi()`` equals the Python double ``4.0 * math.pi``
    (one IEEE multiply of identical operands)."""
    n = float(1 << zoom)
    lim = (1 << zoom) - 1
    x = f"((({lon}) / 1000.0) + 180.0) / 360.0"
    s = f"sin(((({lat}) / 1000.0) * pi()) / 180.0)"
    y = f"0.5 - ln((1.0 + ({s})) / (1.0 - ({s}))) / (4.0 * pi())"
    tx = (
        f"greatest(0, least({lim}, "
        f"CAST(floor(({x}) * {n!r}) AS BIGINT)))"
    )
    ty = (
        f"greatest(0, least({lim}, "
        f"CAST(floor(({y}) * {n!r}) AS BIGINT)))"
    )
    return tx, ty


def quadkey(tx: Column, ty: Column, zoom: int) -> Column:
    """Base-4 quadkey string of tile (tx, ty) at ``zoom`` — digit per
    level, MSB first. Static shift positions only (F.shiftright takes
    int positions)."""
    digits = [
        (
            (F.shiftright(ty, i) % F.lit(2)) * F.lit(2)
            + (F.shiftright(tx, i) % F.lit(2))
        ).cast("string")
        for i in range(zoom - 1, -1, -1)
    ]
    return F.concat(*digits)


def quadkey_sql(tx: str, ty: str, zoom: int) -> str:
    parts = [
        f"CAST(((({ty}) >> {i}) & 1) * 2 + ((({tx}) >> {i}) & 1) AS VARCHAR)"
        for i in range(zoom - 1, -1, -1)
    ]
    return " || ".join(parts)


def tile_xy_py(lat_deg: float, lon_deg: float, zoom: int) -> tuple[int, int]:
    """Independent pure-Python spec implementation for the pinned-vector
    tests (NOT used by the Spark or oracle paths)."""
    lat = max(-_CLAMP_LAT, min(_CLAMP_LAT, lat_deg))
    x = (lon_deg + 180.0) / 360.0
    s = math.sin(math.radians(lat))
    y = 0.5 - math.log((1.0 + s) / (1.0 - s)) / (4.0 * math.pi)
    n = 1 << zoom
    tx = max(0, min(n - 1, int(math.floor(x * n))))
    ty = max(0, min(n - 1, int(math.floor(y * n))))
    return tx, ty


def quadkey_py(tx: int, ty: int, zoom: int) -> str:
    return "".join(
        str(2 * ((ty >> i) & 1) + ((tx >> i) & 1))
        for i in range(zoom - 1, -1, -1)
    )
