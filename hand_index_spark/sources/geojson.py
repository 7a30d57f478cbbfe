"""GeoJSON ROI reader (reference S3: gpd.read_file, query_geojson.py:88-99).

GeoJSON is plain JSON (public RFC 7946); no geopandas needed. Only
Polygon/MultiPolygon features are meaningful as ROIs. Returns exterior
rings as (N,2) lon/lat arrays; CRS defaults to EPSG:4326 like the
reference (query_geojson.py:93-99 normalizes missing CRS to 4326).
"""

from __future__ import annotations

import json

import numpy as np


def _rings_from_geometry(geom: dict) -> list[np.ndarray]:
    t = geom.get("type")
    if t == "Polygon":
        return [np.asarray(geom["coordinates"][0], dtype=np.float64)[:, :2]]
    if t == "MultiPolygon":
        return [
            np.asarray(poly[0], dtype=np.float64)[:, :2]
            for poly in geom["coordinates"]
        ]
    raise ValueError(f"unsupported ROI geometry type: {t}")


def load_roi(obj: str | dict) -> list[np.ndarray]:
    """Parse a GeoJSON file path / string / dict -> list of exterior rings
    (EPSG:4326 lon/lat)."""
    if isinstance(obj, str):
        if obj.lstrip().startswith("{"):
            data = json.loads(obj)
        else:
            with open(obj) as f:
                data = json.load(f)
    else:
        data = obj
    t = data.get("type")
    if t == "FeatureCollection":
        rings: list[np.ndarray] = []
        for feat in data["features"]:
            rings.extend(_rings_from_geometry(feat["geometry"]))
        return rings
    if t == "Feature":
        return _rings_from_geometry(data["geometry"])
    return _rings_from_geometry(data)
