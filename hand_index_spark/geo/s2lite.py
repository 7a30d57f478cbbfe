"""S2 cell ids from scratch, vectorized (public S2 geometry construction).

Implements the standard published S2 pipeline (s2geometry.io docs):

  lat/lon -> unit xyz -> cube face (argmax |component|) -> (u,v) face
  coords -> (s,t) via the quadratic transform -> 30-bit (i,j) ->
  Hilbert-curve position -> 64-bit cell id
  ``face(3 bits) | curve_position(2*level bits) | 1 (sentinel)``.

The Hilbert traversal uses the canonical 4-entry lookup tables
(swap/invert orientation algebra) and the canonical ValidFaceXYZtoUV
face frames from s2coords.h (signed-major-component divisor on all six
faces). No external s2 library exists in this environment to diff
against, so tests assert the construction's defining properties
(determinism, bijectivity of ij<->pos at fixed orientation,
parent-by-truncation hierarchy, face correctness, locality) plus a
full cross-engine oracle: oracles.s2_cells_sql() re-derives the
identical pipeline in DuckDB SQL and the driver hash-compares both.

Loop structure: 30 iterations over levels, each fully vectorized across
points — suitable for pandas UDFs over Arrow batches.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

_SWAP = 1
_INVERT = 2
# canonical Hilbert sub-cell orderings (public S2 lookup tables)
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # orientation 0:        (0,0) (0,1) (1,1) (1,0)
        [0, 2, 3, 1],  # orientation swap
        [3, 2, 0, 1],  # orientation invert
        [3, 1, 0, 2],  # orientation swap|invert
    ],
    dtype=np.int64,
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _SWAP | _INVERT], dtype=np.int64)
# inverse: _IJ_TO_POS[orientation][ij] = pos
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p


def _build_chunk_tables(nbits: int) -> tuple[np.ndarray, np.ndarray]:
    """Precompose ``nbits`` Hilbert fold levels into one lookup:
    index = orient(2 bits) | i_bits(nbits) | j_bits(nbits) ->
    (2*nbits-bit curve position, next orientation). Pure composition of
    the single-level _IJ_TO_POS/_POS_TO_ORIENT algebra, so folding with
    these tables is bit-identical to the level-by-level loop (pinned in
    tests/test_s2.py) while doing 8 levels per vector pass instead of 1
    (r6: the fold was ~75% of encode()'s runtime)."""
    n = 1 << nbits
    o0 = np.repeat(np.arange(4, dtype=np.int64), n * n)
    ii = np.tile(np.repeat(np.arange(n, dtype=np.int64), n), 4)
    jj = np.tile(np.arange(n, dtype=np.int64), 4 * n)
    orient = o0.copy()
    pos = np.zeros_like(o0)
    for k in range(nbits - 1, -1, -1):
        ij = ((ii >> k) & 1) * 2 + ((jj >> k) & 1)
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << 2) | p
        orient = orient ^ _POS_TO_ORIENT[p]
    return pos.astype(np.int64), orient.astype(np.int64)


_CHUNK_BITS = 8
_POS8, _ORIENT8 = _build_chunk_tables(_CHUNK_BITS)


def _xyz(lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(lam), cos_phi * np.sin(lam), np.sin(phi)


def _face_uv(x, y, z) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cube face (0-5) + gnomonic (u,v) on that face."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    # u/v axes per face — canonical S2 ValidFaceXYZtoUV frames
    # (s2coords.h): the divisor is the SIGNED major component, so
    # negative faces (3-5) keep the spec's u/v signs. (Round-1 shipped
    # inverted signs on faces 3-5; fixed for real-S2 interoperability.)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, me) in enumerate(
        [
            (lambda: y, lambda: z, lambda: x),
            (lambda: -x, lambda: z, lambda: y),
            (lambda: -x, lambda: -y, lambda: z),
            (lambda: z, lambda: y, lambda: x),
            (lambda: z, lambda: -x, lambda: y),
            (lambda: -y, lambda: -x, lambda: z),
        ]
    ):
        m = face == f
        if m.any():
            mm = me()[m]
            u[m] = ue()[m] / mm
            v[m] = ve()[m] / mm
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic uv->st transform (public S2 'quadratic projection')."""
    pos = 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    neg = 1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0.0, pos, neg)


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip((np.floor(s * (1 << MAX_LEVEL))).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def encode(lat: np.ndarray, lon: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized lat/lon degrees -> S2 cell id at ``level``.

    Folds only the top ``level`` Hilbert bit-pairs: the truncated cell
    id depends on nothing below them (the orientation evolves top-down
    and the masked low bits are replaced by the sentinel), so this is
    bit-identical to folding all 30 levels then masking — and ~2x
    faster at the engine's level-16 default.
    """
    x, y, z = _xyz(lat, lon)
    face, u, v = _face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    orient = face & np.int64(_SWAP)
    pos = np.zeros_like(i)
    kk = MAX_LEVEL
    remaining = level
    mask = np.int64((1 << _CHUNK_BITS) - 1)
    while remaining >= _CHUNK_BITS:  # 8 levels per vector pass
        kk -= _CHUNK_BITS
        idx8 = (
            (orient << np.int64(2 * _CHUNK_BITS))
            | (((i >> np.int64(kk)) & mask) << np.int64(_CHUNK_BITS))
            | ((j >> np.int64(kk)) & mask)
        )
        pos = (pos << np.int64(2 * _CHUNK_BITS)) | _POS8[idx8]
        orient = _ORIENT8[idx8]
        remaining -= _CHUNK_BITS
    for k in range(kk - 1, kk - 1 - remaining, -1):
        ibit = (i >> np.int64(k)) & np.int64(1)
        jbit = (j >> np.int64(k)) & np.int64(1)
        ij = ibit * np.int64(2) + jbit
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.int64(2)) | p
        orient = orient ^ _POS_TO_ORIENT[p]
    shift = np.int64(2 * (MAX_LEVEL - level) + 1)
    cell = (face << np.int64(2 * MAX_LEVEL + 1)) | (pos << shift)
    return cell | (np.int64(1) << (shift - np.int64(1)))


def encode_sql_query(pts_sql: str, keys: tuple[str, ...] = ("url",), level: int = 16) -> str:
    """DuckDB SQL producing the identical cell id — the oracle twin of
    :func:`encode` at ``level``.

    ``pts_sql`` is a relation body with columns ``keys`` + lat + lon;
    the result has columns ``keys`` + ``s2_cell``. The whole pipeline is
    mirrored operation-for-operation (same IEEE order): trig via
    ``x * pi() / 180.0`` (numpy's deg2rad is ``x * PI / 180.0``), the
    quadratic st transform, the 30-bit ij discretization, and the
    top-``level`` Hilbert fold with the same lookup tables (the
    truncated cell id depends on nothing below the top bit-pairs — see
    :func:`encode`'s masking). Each fold step is its own subquery layer:
    DuckDB expands *lateral* column aliases by textual substitution, so
    a single-SELECT recurrence would blow up exponentially. The final
    composition wraps through HUGEINT because ``face >= 4`` overflows
    the int64 sign bit (numpy wraps silently; DuckDB BIGINT raises).
    """
    ks = ", ".join(keys)
    # geometric stage: lat/lon -> face, 30-bit (i, j); lateral aliases
    # here are shallow (no recurrence), so substitution stays small
    geom_cols = f"""{ks},
        ({{lat}} * pi() / 180.0) AS phi,
        ({{lon}} * pi() / 180.0) AS lam,
        cos(phi) * cos(lam) AS gx,
        cos(phi) * sin(lam) AS gy,
        sin(phi) AS gz,
        CASE WHEN abs(gx) >= abs(gy)
             THEN CASE WHEN abs(gx) >= abs(gz) THEN 0 ELSE 2 END
             ELSE CASE WHEN abs(gy) >= abs(gz) THEN 1 ELSE 2 END END AS face0,
        CASE face0 WHEN 0 THEN gx WHEN 1 THEN gy ELSE gz END AS major,
        CASE WHEN major < 0 THEN face0 + 3 ELSE face0 END AS face,
        CASE face WHEN 0 THEN gy / gx WHEN 1 THEN -gx / gy
                  WHEN 2 THEN -gx / gz WHEN 3 THEN gz / gx
                  WHEN 4 THEN gz / gy ELSE -gy / gz END AS uu,
        CASE face WHEN 0 THEN gz / gx WHEN 1 THEN gz / gy
                  WHEN 2 THEN -gy / gz WHEN 3 THEN gy / gx
                  WHEN 4 THEN -gx / gy ELSE -gx / gz END AS vv,
        CASE WHEN uu >= 0.0 THEN 0.5 * sqrt(greatest(1.0 + 3.0 * uu, 0.0))
             ELSE 1.0 - 0.5 * sqrt(greatest(1.0 - 3.0 * uu, 0.0)) END AS ss,
        CASE WHEN vv >= 0.0 THEN 0.5 * sqrt(greatest(1.0 + 3.0 * vv, 0.0))
             ELSE 1.0 - 0.5 * sqrt(greatest(1.0 - 3.0 * vv, 0.0)) END AS tt,
        LEAST(GREATEST(CAST(floor(ss * {float(1 << MAX_LEVEL)!r}) AS BIGINT), 0),
              {(1 << MAX_LEVEL) - 1}) AS hi,
        LEAST(GREATEST(CAST(floor(tt * {float(1 << MAX_LEVEL)!r}) AS BIGINT), 0),
              {(1 << MAX_LEVEL) - 1}) AS hj
    """.format(lat="lat", lon="lon")
    base = (
        f"SELECT {ks}, face, hi, hj, face % 2 AS o, CAST(0 AS HUGEINT) AS pos"
        f" FROM (SELECT {geom_cols} FROM ({pts_sql}))"
    )
    pos_branches = " ".join(
        f"WHEN {o * 4 + ij} THEN {int(_IJ_TO_POS[o, ij])}"
        for o in range(4)
        for ij in range(4)
    )
    for t in range(level):
        k = MAX_LEVEL - 1 - t
        base = f"""SELECT {ks}, face, hi, hj,
            CASE WHEN p = 0 THEN xor(o, 1)
                 WHEN p = 3 THEN xor(o, 3) ELSE o END AS o,
            pos * 4 + p AS pos
        FROM (SELECT {ks}, face, hi, hj, o, pos,
                     CASE o * 4 + ((hi >> {k}) & 1) * 2 + ((hj >> {k}) & 1)
                          {pos_branches} END AS p
              FROM ({base}))"""
    shift = 2 * (MAX_LEVEL - level) + 1
    return f"""SELECT {ks},
        CAST(CASE WHEN cell_huge >= {1 << 63} THEN cell_huge - {1 << 64}
                  ELSE cell_huge END AS BIGINT) AS s2_cell
    FROM (SELECT {ks},
                 CAST(face AS HUGEINT) * {1 << (2 * MAX_LEVEL + 1)}
                 + pos * {1 << shift} + {1 << (shift - 1)} AS cell_huge
          FROM ({base}))"""


def parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at ``level`` — prefix truncation + new sentinel bit."""
    cell = np.asarray(cell, dtype=np.int64)
    lsb = np.int64(1) << np.int64(2 * (MAX_LEVEL - level))
    return (cell & ~(lsb - np.int64(1)) & ~lsb) | lsb


def level_of(cell: int) -> int:
    """Level from the position of the trailing sentinel bit."""
    c = int(cell)
    lsb = c & -c
    return MAX_LEVEL - (lsb.bit_length() - 1) // 2


def face_of(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> np.int64(2 * MAX_LEVEL + 1)) & np.int64(7)
