"""EPSG:5070 (NAD83 / CONUS Albers equal-area conic) forward + inverse.

The reference stores geometry in EPSG:5070 and transforms 4326<->5070 for
H3 keying and ROI queries (load.py:165-166; query_geojson.py:59-62,105).
No pyproj exists here, so this implements the standard ellipsoidal Albers
equal-area equations (public Snyder, *Map Projections — A Working
Manual*, USGS PP 1395, eqs. 14-1..14-21) on GRS80, vectorized.

EPSG:5070 parameters (public registry): standard parallels 29.5 / 45.5,
latitude of origin 23, central meridian -96, false easting/northing 0.
"""

from __future__ import annotations

import numpy as np

A = 6378137.0  # GRS80 semi-major axis (m)
F = 1.0 / 298.257222101
E2 = F * (2.0 - F)
E = np.sqrt(E2)

LAT0, LON0 = 23.0, -96.0
LAT1, LAT2 = 29.5, 45.5


def _q(sin_phi: np.ndarray) -> np.ndarray:
    """Snyder eq. 3-12: authalic q."""
    es = E * sin_phi
    return (1.0 - E2) * (
        sin_phi / (1.0 - E2 * sin_phi * sin_phi) - (1.0 / (2.0 * E)) * np.log((1.0 - es) / (1.0 + es))
    )


def _m(phi: np.ndarray) -> np.ndarray:
    """Snyder eq. 14-15."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - E2 * s * s)


_phi0, _phi1, _phi2 = np.radians([LAT0, LAT1, LAT2])
_m1, _m2 = _m(_phi1), _m(_phi2)
_q0, _q1, _q2 = _q(np.sin(_phi0)), _q(np.sin(_phi1)), _q(np.sin(_phi2))
N = (_m1 * _m1 - _m2 * _m2) / (_q2 - _q1)  # eq. 14-14
C = _m1 * _m1 + N * _q1  # eq. 14-13
RHO0 = A * np.sqrt(C - N * _q0) / N  # eq. 14-12a


def forward(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 lon/lat degrees -> EPSG:5070 x/y meters."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    lam = np.radians(lon)
    q = _q(np.sin(phi))
    rho = A * np.sqrt(np.maximum(C - N * q, 0.0)) / N  # eq. 14-12
    theta = N * (lam - np.radians(LON0))  # eq. 14-4
    x = rho * np.sin(theta)  # eq. 14-1
    y = RHO0 - rho * np.cos(theta)  # eq. 14-2
    return x, y


def forward_sql(lon: str = "lon", lat: str = "lat") -> str:
    """DuckDB lateral-alias column chain mirroring :func:`forward`
    operation-for-operation; exposes ``ax``/``ay`` (x/y meters).

    Cross-engine caveat: numpy's array-mode sin/cos/log differ from
    libm by 1-2 ulp, so oracle queries must compare these outputs only
    through a coarse discretization (e.g. floor to whole meters) or a
    downstream cell encoding — never as raw doubles.
    """
    lon0rad = float(np.radians(LON0))
    return f"""
        sin({lat} * pi() / 180.0) AS sp,
        (1.0 - {E2!r}) * (sp / (1.0 - {E2!r} * sp * sp)
            - (1.0 / (2.0 * {E!r}))
              * ln((1.0 - {E!r} * sp) / (1.0 + {E!r} * sp))) AS qv,
        {A!r} * sqrt(greatest({C!r} - {N!r} * qv, 0.0)) / {N!r} AS rho,
        {N!r} * (({lon} * pi() / 180.0) - {lon0rad!r}) AS theta,
        rho * sin(theta) AS ax,
        {RHO0!r} - rho * cos(theta) AS ay
    """


def inverse_sql_query(rel_sql: str, keys: tuple[str, ...], x: str = "ax", y: str = "ay") -> str:
    """DuckDB SQL mirroring :func:`inverse` (8 fixed-point iterations,
    one subquery layer each — lateral aliases would expand the phi
    recurrence exponentially). Input relation needs ``keys`` + x/y
    meter columns; output has ``keys`` + lon/lat degrees. Same ulp
    caveat as :func:`forward_sql`; additionally np.hypot is correctly
    rounded while SQL uses sqrt(x^2+y^2) — consumers must discretize.
    """
    ks = ", ".join(keys)
    lon0rad = float(np.radians(LON0))
    base = f"""SELECT {ks}, qv, lam,
            asin(LEAST(GREATEST(qv / 2.0, -1.0), 1.0)) AS phi
        FROM (SELECT {ks},
                     ({C!r} - (rho * {N!r} / {A!r}) * (rho * {N!r} / {A!r})) / {N!r} AS qv,
                     {lon0rad!r} + atan2({x}, {RHO0!r} - {y}) / {N!r} AS lam
              FROM (SELECT {ks}, {x}, {y},
                           sqrt({x} * {x} + ({RHO0!r} - {y}) * ({RHO0!r} - {y})) AS rho
                    FROM ({rel_sql})))"""
    for _ in range(8):
        base = f"""SELECT {ks}, qv, lam,
            phi + (es2 * es2 / (2.0 * cos(phi))) * (
                qv / (1.0 - {E2!r}) - s / es2
                + (1.0 / (2.0 * {E!r})) * ln((1.0 - {E!r} * s) / (1.0 + {E!r} * s))
            ) AS phi
        FROM (SELECT {ks}, qv, lam, phi, s, 1.0 - {E2!r} * s * s AS es2
              FROM (SELECT {ks}, qv, lam, phi, sin(phi) AS s FROM ({base})))"""
    return f"""SELECT {ks}, lam * 180.0 / pi() AS lon, phi * 180.0 / pi() AS lat
    FROM ({base})"""


def inverse(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:5070 x/y meters -> EPSG:4326 lon/lat degrees (iterative phi)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.hypot(x, RHO0 - y)  # eq. 14-10
    theta = np.arctan2(x, RHO0 - y)  # eq. 14-11 (N > 0)
    q = (C - (rho * N / A) ** 2) / N  # eq. 14-19
    lam = np.radians(LON0) + theta / N  # eq. 14-9
    # iterate eq. 3-16 for phi, seeded with the spherical approximation
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(8):
        s = np.sin(phi)
        es2 = 1.0 - E2 * s * s
        corr = (es2 * es2 / (2.0 * np.cos(phi))) * (
            q / (1.0 - E2)
            - s / es2
            + (1.0 / (2.0 * E)) * np.log((1.0 - E * s) / (1.0 + E * s))
        )
        phi = phi + corr
    return np.degrees(lam), np.degrees(phi)
