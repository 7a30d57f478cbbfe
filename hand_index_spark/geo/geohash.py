"""Geohash (base32) cell codec — pure Catalyst, plus the DuckDB twin.

Third cell scheme next to h3lite (geo/cells.py) and s2lite
(geo/s2lite.py): the classic public geocode (Niemeyer 2008) that
interleaves longitude/latitude bisection bits (lon first) and emits
5-bit groups through the 0-9b-z alphabet. Widely used as a join /
prefix-search key for web geodata, so a catalog engine needs to emit
it for interop even where H3/S2 are the internal keys.

Exactness: the quantizers floor((coord + off) / span * 2^bits) use one
division then one multiply, replayed in the same IEEE order by the SQL
twin; bit interleave and base32 are integer-only. Everything stays
inside whole-stage codegen — shift distances are literals, the
alphabet lookup is element_at on a 32-element array literal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
BITS_PER_AXIS = 15  # 30 bits total = 6 base32 chars


def _quant(coord: Column, offset: float, span: float) -> Column:
    q = F.floor((coord + F.lit(offset)) / F.lit(span) * F.lit(float(1 << BITS_PER_AXIS)))
    return F.least(
        F.greatest(q, F.lit(0)), F.lit((1 << BITS_PER_AXIS) - 1)
    ).cast("long")


def encode_int_col(lat: Column, lon: Column) -> Column:
    """The 30-bit interleaved geohash value (lon bit first, per spec)."""
    lon_q = _quant(lon, 180.0, 360.0)
    lat_q = _quant(lat, 90.0, 180.0)
    acc = F.lit(0).cast("long")
    for i in range(BITS_PER_AXIS):  # bit i counted from the MSB
        src_shift = BITS_PER_AXIS - 1 - i
        lon_bit = F.shiftright(lon_q, src_shift).bitwiseAND(F.lit(1).cast("long"))
        lat_bit = F.shiftright(lat_q, src_shift).bitwiseAND(F.lit(1).cast("long"))
        acc = acc + F.shiftleft(lon_bit, 2 * BITS_PER_AXIS - 1 - 2 * i)
        acc = acc + F.shiftleft(lat_bit, 2 * BITS_PER_AXIS - 2 - 2 * i)
    return acc


def encode_str_col(gh_int: Column) -> Column:
    """6-char base32 geohash string from the 30-bit value."""
    chars = F.array(*[F.lit(c) for c in ALPHABET])
    parts = []
    for j in range(6):
        pos = F.shiftright(gh_int, 25 - 5 * j).bitwiseAND(F.lit(31).cast("long"))
        parts.append(F.element_at(chars, (pos + 1).cast("int")))
    return F.concat(*parts)


def encode_int_sql(lat_expr: str, lon_expr: str) -> str:
    n = 1 << BITS_PER_AXIS
    lon_q = (
        f"LEAST(GREATEST(CAST(floor(({lon_expr} + 180.0) / 360.0 * {float(n)!r}) "
        f"AS BIGINT), 0), {n - 1})"
    )
    lat_q = (
        f"LEAST(GREATEST(CAST(floor(({lat_expr} + 90.0) / 180.0 * {float(n)!r}) "
        f"AS BIGINT), 0), {n - 1})"
    )
    terms = []
    for i in range(BITS_PER_AXIS):
        src_shift = BITS_PER_AXIS - 1 - i
        terms.append(
            f"((({lon_q} >> {src_shift}) & 1) << {2 * BITS_PER_AXIS - 1 - 2 * i})"
        )
        terms.append(
            f"((({lat_q} >> {src_shift}) & 1) << {2 * BITS_PER_AXIS - 2 - 2 * i})"
        )
    return "(" + " + ".join(terms) + ")"


def encode_str_sql(gh_int_expr: str) -> str:
    parts = [
        f"substr('{ALPHABET}', CAST((({gh_int_expr} >> {25 - 5 * j}) & 31) "
        f"AS INTEGER) + 1, 1)"
        for j in range(6)
    ]
    return " || ".join(parts)


# ---------------------------------------------------------------- neighbors
# Round-5gg: de-interleave / re-interleave for neighbor-cell
# computation. Bit layout (encode_int_col): lon bits sit at ODD
# positions (2k+1 for axis bit k counted from the LSB), lat bits at
# EVEN positions (2k) — so both directions are pure integer bit sums
# with literal shift distances (whole-stage codegen, zero Python).


def axis_cols(gh_int: Column) -> tuple[Column, Column]:
    """(lat_q, lon_q) axis indices recovered from the 30-bit value."""
    lat_q = F.lit(0).cast("long")
    lon_q = F.lit(0).cast("long")
    for k in range(BITS_PER_AXIS):
        lat_q = lat_q + F.shiftleft(
            F.shiftright(gh_int, 2 * k).bitwiseAND(F.lit(1).cast("long")), k
        )
        lon_q = lon_q + F.shiftleft(
            F.shiftright(gh_int, 2 * k + 1).bitwiseAND(F.lit(1).cast("long")), k
        )
    return lat_q, lon_q


def interleave_col(lat_q: Column, lon_q: Column) -> Column:
    """The 30-bit value from axis indices (inverse of axis_cols)."""
    acc = F.lit(0).cast("long")
    for k in range(BITS_PER_AXIS):
        acc = acc + F.shiftleft(
            F.shiftright(lat_q, k).bitwiseAND(F.lit(1).cast("long")), 2 * k
        )
        acc = acc + F.shiftleft(
            F.shiftright(lon_q, k).bitwiseAND(F.lit(1).cast("long")), 2 * k + 1
        )
    return acc


def axis_sql(gh_int_expr: str) -> tuple[str, str]:
    lat_terms = [
        f"((({gh_int_expr} >> {2 * k}) & 1) << {k})"
        for k in range(BITS_PER_AXIS)
    ]
    lon_terms = [
        f"((({gh_int_expr} >> {2 * k + 1}) & 1) << {k})"
        for k in range(BITS_PER_AXIS)
    ]
    return "(" + " + ".join(lat_terms) + ")", "(" + " + ".join(lon_terms) + ")"


def interleave_sql(lat_q_expr: str, lon_q_expr: str) -> str:
    terms = []
    for k in range(BITS_PER_AXIS):
        terms.append(f"((({lat_q_expr} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({lon_q_expr} >> {k}) & 1) << {2 * k + 1})")
    return "(" + " + ".join(terms) + ")"
