"""Tile assignment: broadcast packed-index PIP + kNN-to-nearest-tile.

The engine's semantic core — the Spark-native restatement of the
reference's coarse-then-exact spatial join (query_geojson.py:65-72
``ST_Intersects`` join + :158-248 exact refinement), turned from
polygon-vs-ROI into point-vs-tile at web scale (BASELINE.json:6):

1. the tile polygon dimension is packed into flat NumPy arrays
   (geo.strtree.PackedPolygonIndex) and **broadcast** once;
2. points stream through a *scalar* Arrow-vectorized pandas UDF that
   reads ONLY (lat, lon) and returns a (tile_id, method, dist2) struct —
   every other column (html/text at web scale!) stays JVM-side, never
   crossing the Python boundary;
3. candidate tiles come from O(1) grid-bucket probes; refinement is a
   vectorized half-plane (convex) or ray-cast (general) PIP — no
   per-row Python anywhere;
4. points inside no tile fall back to **kNN**: for the regular tile
   grid, exact nearest-centroid over the 7x7 cell neighborhood (O(1)
   per point — the shape that scales to millions of tiles); generic
   dimensions use a BLAS-shortlisted top-K re-ranked with the exact
   oracle expression. Both paths produce the bit-exact oracle distance
   and its ``ORDER BY dist2, tile_id`` tie-break (verified against full
   brute force in tests/test_spark_ops.py).

Output columns: ``tile_id`` (long, never null), ``method`` ("pip"|"knn"),
``dist2`` (squared centroid distance in deg² for knn rows, -1.0 for pip
rows — sentinel instead of NULL so the DuckDB oracle compares exactly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ByteType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..geo.strtree import PackedPolygonIndex
from ..tables import tilegrid as tg

_KNN_CHUNK = 8192  # points per distance block (cache/memory bound)
_KNN_TOPK = 8
_GRID_RING = 3  # 7x7 neighborhood; nearest live centroid provably inside
                # for this grid's gap density (<=2 dead tiles per row)


def build_tile_index(grid_res: int | None = None) -> PackedPolygonIndex:
    """Packed index over the deterministic tile grid (driver-side),
    annotated with the regular-grid lookup + packed corner arrays."""
    ids, rings = tg.tile_ids_and_rings()
    idx = PackedPolygonIndex(ids, rings, grid_res=grid_res)
    lookup = np.full((tg.NR, tg.NC), -1, dtype=np.int32)
    for pos, tid in enumerate(ids):
        lookup[tid // tg.NC, tid % tg.NC] = pos
    idx.grid_lookup = lookup  # regular-grid annotation (engine-specific)
    # packed (T, 4, 2) corner array for the single-candidate fast path
    idx.quad_corners = np.stack([np.asarray(r, dtype=np.float64) for r in rings])
    return idx


# ------------------------------------------------------------------ kNN


def _knn_grid(
    index, lat: np.ndarray, lon: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Exact nearest centroid via the 7x7 grid neighborhood.

    Candidates are generated in ascending tile_id order, so np.argmin's
    first-minimum == the oracle's ``ORDER BY dist2, tile_id``. Rows whose
    whole neighborhood is dead (impossible for in-extent points, guarded
    anyway) fall back to the generic path.
    """
    lookup = index.grid_lookup
    cx, cy = index.vmean[:, 0], index.vmean[:, 1]
    rc = np.clip(((lat - tg.LAT_MIN) / tg.H).astype(np.int64), 0, tg.NR - 1)
    cc = np.clip(((lon - tg.LON_MIN) / tg.W).astype(np.int64), 0, tg.NC - 1)
    off = np.arange(-_GRID_RING, _GRID_RING + 1, dtype=np.int64)
    # (N, 7) row/col candidates, clipped (duplicates are harmless)
    rr = np.clip(rc[:, None] + off[None, :], 0, tg.NR - 1)
    ccand = np.clip(cc[:, None] + off[None, :], 0, tg.NC - 1)
    # (N, 49) positions in row-major (ascending tile_id) order
    pos = lookup[rr[:, :, None], ccand[:, None, :]].reshape(len(lat), -1)
    alive = pos >= 0
    safe = np.where(alive, pos, 0)
    dx = lon[:, None] - cx[safe]
    dy = lat[:, None] - cy[safe]
    dist = dx * dx + dy * dy  # exact oracle expression
    dist[~alive] = np.inf
    j = np.argmin(dist, axis=1)
    rows = np.arange(len(lat))
    best = pos[rows, j].astype(np.int64)
    d2 = dist[rows, j]
    bad = best < 0
    if bad.any():  # neighborhood fully dead — generic fallback
        p, d = _knn_topk(lat[bad], lon[bad], cx, cy)
        best[bad] = p
        d2[bad] = d
    return best, d2


def _knn_topk(
    lat: np.ndarray, lon: np.ndarray, cx: np.ndarray, cy: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Generic dimension: BLAS shortlist (algebraic -2 p·c + |c|²), then
    exact re-rank of the tile_id-sorted top-K with the oracle expression."""
    t = len(cx)
    k = min(_KNN_TOPK, t)
    c2 = cx * cx + cy * cy  # shortlist scoring only, never output
    C = np.column_stack([cx, cy])
    pos = np.empty(len(lat), dtype=np.int64)
    d2 = np.empty(len(lat), dtype=np.float64)
    for s in range(0, len(lat), _KNN_CHUNK):
        e = min(s + _KNN_CHUNK, len(lat))
        P = np.column_stack([lon[s:e], lat[s:e]])
        score = P @ (C.T * -2.0)
        score += c2[None, :]
        if k < t:
            cand = np.argpartition(score, k - 1, axis=1)[:, :k]
        else:
            cand = np.broadcast_to(np.arange(t), (e - s, t))
        cand = np.sort(cand, axis=1)  # ascending tile order -> tie-break
        dx = lon[s:e, None] - cx[cand]
        dy = lat[s:e, None] - cy[cand]
        dist = dx * dx + dy * dy  # exact oracle expression
        j = np.argmin(dist, axis=1)
        rows = np.arange(e - s)
        pos[s:e] = cand[rows, j]
        d2[s:e] = dist[rows, j]
    return pos, d2


# ----------------------------------------------------------------- core


def _assign_grid_pip(index, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Single-candidate exact PIP for the regular inward-jittered grid.

    Tiles are subsets of their grid rects and rects are disjoint, so a
    point can only be inside the tile of its own cell — one lookup + one
    half-plane quad test per point, ~10x less memory traffic than the
    generic candidate machinery (verified equal in
    tests/test_spark_ops.py::test_grid_fast_path_matches_generic).
    Returns poly positions (-1 = no hit).
    """
    rc = np.clip(((lat - tg.LAT_MIN) / tg.H).astype(np.int64), 0, tg.NR - 1)
    cc = np.clip(((lon - tg.LON_MIN) / tg.W).astype(np.int64), 0, tg.NC - 1)
    pos = index.grid_lookup[rc, cc].astype(np.int64)
    safe = np.where(pos >= 0, pos, 0)
    q = index.quad_corners[safe]  # (N, 4, 2)
    inside = pos >= 0
    for k in range(4):
        x1, y1 = q[:, k, 0], q[:, k, 1]
        x2, y2 = q[:, (k + 1) % 4, 0], q[:, (k + 1) % 4, 1]
        # exact oracle expression (tables/tilegrid determinism contract)
        inside &= (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1) >= 0.0
    return np.where(inside, pos, np.int64(-1))


def assign_batch(
    index: PackedPolygonIndex,
    lat: np.ndarray,
    lon: np.ndarray,
    pip: str = "convex",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pure-NumPy core: (tile_id, method_code 0=pip/1=knn, dist2)."""
    ids_arr = np.asarray(index.ids, dtype=np.int64)
    if pip == "convex" and getattr(index, "grid_lookup", None) is not None:
        assigned = _assign_grid_pip(index, lat, lon)
    else:
        assigned, _ = index.assign_points(lat, lon, pip=pip)
    hit = assigned >= 0
    tile_id = np.where(hit, ids_arr[np.clip(assigned, 0, None)], np.int64(-1))
    mcode = (~hit).astype(np.int8)
    dist2 = np.full(len(lat), -1.0, dtype=np.float64)
    miss = ~hit
    if miss.any():
        if getattr(index, "grid_lookup", None) is not None:
            pos, d2 = _knn_grid(index, lat[miss], lon[miss])
        else:
            pos, d2 = _knn_topk(
                lat[miss], lon[miss], index.vmean[:, 0], index.vmean[:, 1]
            )
        tile_id[miss] = ids_arr[pos]
        dist2[miss] = d2
    return tile_id, mcode, dist2


_ASSIGN_STRUCT = StructType(
    [
        StructField("tile_id", LongType(), False),
        StructField("mcode", ByteType(), False),
        StructField("dist2", DoubleType(), False),
    ]
)
_ASSIGN_S2_STRUCT = StructType(
    _ASSIGN_STRUCT.fields + [StructField("s2_cell", LongType(), False)]
)


def assign_tiles(
    df: DataFrame,
    spark: SparkSession,
    index: PackedPolygonIndex | None = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
    pip: str = "convex",
    with_s2: bool = False,
) -> DataFrame:
    """Append (tile_id, method, dist2 [, s2_cell]) via broadcast + one
    scalar struct UDF.

    Only (lat, lon) cross the Arrow boundary; all other columns —
    arbitrarily wide at web scale — stay in the JVM. ``with_s2=True``
    fuses the S2 encoder into the same UDF: one ArrowEvalPython stage
    instead of two (two stages double the Python worker count per core,
    which oversubscribes the host and measurably *reduces* throughput at
    high core counts — see BENCH/BASELINE.md).
    """
    if index is None:
        index = build_tile_index()
    bcast = spark.sparkContext.broadcast(index)

    if with_s2:
        from ..geo import s2lite
        from .encode import S2_LEVEL

        @pandas_udf(_ASSIGN_S2_STRUCT)
        def _assign(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
            la = lat.to_numpy(dtype=np.float64)
            lo = lon.to_numpy(dtype=np.float64)
            tile_id, mcode, dist2 = assign_batch(bcast.value, la, lo, pip=pip)
            s2 = s2lite.encode(la, lo, S2_LEVEL)
            return pd.DataFrame(
                {"tile_id": tile_id, "mcode": mcode, "dist2": dist2, "s2_cell": s2}
            )
    else:

        @pandas_udf(_ASSIGN_STRUCT)
        def _assign(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
            tile_id, mcode, dist2 = assign_batch(
                bcast.value,
                lat.to_numpy(dtype=np.float64),
                lon.to_numpy(dtype=np.float64),
                pip=pip,
            )
            return pd.DataFrame({"tile_id": tile_id, "mcode": mcode, "dist2": dist2})

    out = (
        df.withColumn("__a", _assign(F.col(lat_col), F.col(lon_col)))
        .withColumn("tile_id", F.col("__a.tile_id"))
        .withColumn(
            "method",
            F.when(F.col("__a.mcode") == 0, F.lit("pip")).otherwise(F.lit("knn")),
        )
        .withColumn("dist2", F.col("__a.dist2"))
    )
    if with_s2:
        out = out.withColumn("s2_cell", F.col("__a.s2_cell"))
    return out.drop("__a")
