"""Self-contained HTML/SVG visual audit of an ROI query.

The reference ships a 566-LoC folium harness (viz/query_visualization.py:
1-472): query polygon + kept catchments + <=1000 background catchments,
popups with the head-3 hydrotable rows, display simplification. No
folium (or any renderer) exists in this environment, and a map that
needs a tile server is the wrong artifact for an engine repo anyway —
this module emits ONE dependency-free HTML file with inline SVG:

- ROI polygon (EPSG:4326 outline, red);
- kept catchments (green, tooltip = catchment id + overlap% + head-3
  hydrotable paths — the reference's popup content,
  viz/query_visualization.py:355-373);
- a bounded background sample (grey, the reference's --max-catchments
  cap, viz:510-515);
- geometry is reprojected 5070 -> 4326 and display-simplified at 0.001
  degrees exactly like the reference (viz:215-216,266).

Everything drawn is collected AFTER aggregation/limits (presentation
layer only — the engine never collects candidates at scale).
"""

from __future__ import annotations

import html as _html

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..geo import albers
from ..geo import polygon as P
from ..geo import wkb
from ..sources.geojson import load_roi

_W, _H = 900, 640
DISPLAY_SIMPLIFY_DEG = 0.001  # reference viz:215-216,266


def _ring_4326(wkb_buf: bytes) -> np.ndarray:
    shell = wkb.shells(bytes(wkb_buf))[0]
    lon, lat = albers.inverse(shell[:, 0], shell[:, 1])
    ring = np.column_stack([lon, lat])
    return P.douglas_peucker(ring, DISPLAY_SIMPLIFY_DEG)


def _svg_path(ring: np.ndarray, sx, sy) -> str:
    pts = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in ring)
    return pts


def roi_report_html(
    spark: SparkSession,
    catchments: DataFrame,
    roi,
    kept: DataFrame,
    attrs: DataFrame | None,
    stats: dict,
    out_path: str,
    max_background: int = 1000,
) -> str:
    """Render the audit map; returns the output path.

    ``kept``/``attrs`` are roi_query outputs; ``catchments`` supplies the
    background sample via the bbox-envelope range query (P6, viz:145-157).
    """
    roi_ring = load_roi(roi)[0]
    lon_min, lat_min, lon_max, lat_max = P.bbox_of(roi_ring)
    pad = 1.0
    view = (lon_min - pad, lat_min - pad, lon_max + pad, lat_max + pad)

    # background: envelope query in 5070 bounds (P6) + LIMIT (T2)
    bx, by = albers.forward(
        np.array([view[0], view[2]]), np.array([view[1], view[3]])
    )
    bg = (
        catchments.filter(
            (F.col("bbox.xmax") >= float(bx.min()))
            & (F.col("bbox.xmin") <= float(bx.max()))
            & (F.col("bbox.ymax") >= float(by.min()))
            & (F.col("bbox.ymin") <= float(by.max()))
        )
        .select("catchment_id", "geometry")
        .limit(max_background)
        .collect()
    )
    kept_rows = kept.select("catchment_id", "geometry", "overlap_pct").collect()

    popup: dict[str, list[str]] = {}
    if attrs is not None and "csv_path" in attrs.columns:
        w = Window.partitionBy("catchment_id").orderBy("csv_path")
        head3 = (
            attrs.select("catchment_id", "csv_path")
            .filter(F.col("csv_path").isNotNull())
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)  # head-3 popup rows (viz:361-366)
            .collect()
        )
        for r in head3:
            popup.setdefault(r.catchment_id, []).append(r.csv_path)

    def sx(x):
        return (x - view[0]) / (view[2] - view[0]) * _W

    def sy(y):
        return _H - (y - view[1]) / (view[3] - view[1]) * _H

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" style="background:#f8f9fa;border:1px solid #ccc">'
    ]
    kept_ids = {r.catchment_id for r in kept_rows}
    for r in bg:
        if r.catchment_id in kept_ids:
            continue
        ring = _ring_4326(r.geometry)
        parts.append(
            f'<polygon points="{_svg_path(ring, sx, sy)}" fill="#d0d4d9" '
            f'stroke="#9aa0a6" stroke-width="0.5" fill-opacity="0.5">'
            f"<title>{_html.escape(str(r.catchment_id)[:16])} (background)</title>"
            "</polygon>"
        )
    for r in kept_rows:
        ring = _ring_4326(r.geometry)
        tips = [f"catchment {str(r.catchment_id)[:16]}", f"overlap {r.overlap_pct:.2f}%"]
        tips += [f"hydrotable: {p}" for p in popup.get(r.catchment_id, [])[:3]]
        parts.append(
            f'<polygon points="{_svg_path(ring, sx, sy)}" fill="#34a853" '
            f'stroke="#188038" stroke-width="1" fill-opacity="0.55">'
            f"<title>{_html.escape(chr(10).join(tips))}</title></polygon>"
        )
    parts.append(
        f'<polygon points="{_svg_path(roi_ring, sx, sy)}" fill="none" '
        f'stroke="#d93025" stroke-width="2" stroke-dasharray="6,3">'
        "<title>query ROI</title></polygon>"
    )
    legend = (
        f"kept={len(kept_rows)} background={len(bg)} "
        + " ".join(f"{k}={v}" for k, v in sorted(stats.items()))
    )
    parts.append(
        f'<text x="10" y="{_H - 12}" font-family="monospace" font-size="12" '
        f'fill="#202124">{_html.escape(legend)}</text>'
    )
    parts.append("</svg>")
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>ROI query visual audit</title></head><body>"
        "<h3 style='font-family:sans-serif'>ROI query visual audit "
        "(hover polygons for details)</h3>" + "".join(parts) + "</body></html>"
    )
    with open(out_path, "w") as f:
        f.write(doc)
    return out_path
