"""Raster-footprint -> vector ingestion (north rule, BASELINE.json:6).

The reference registers raster assets by *path join only* (load.py:
223-253); the north rule upgrades this to spatial registration: each
raster's affine transform + size define its footprint polygon (the
"rasterio bounds -> polygon" step — pure corner math, no rasterio
needed), which then gets the same bbox/cell treatment as any geometry,
producing the VRT/tile manifest table.

GDAL affine convention: x = a*col + b*row + c; y = d*col + e*row + f,
transform = [a, b, c, d, e, f]. All math is vectorized column
expressions — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo import cells as h3lite


def footprints(df: DataFrame) -> DataFrame:
    """raster_footprints(raster_path, width, height, transform, crs)
    -> + corner coords (x0,y0 .. x3,y3), bbox struct (storage CRS).

    Corners are (0,0), (width,0), (width,height), (0,height) in pixel
    space pushed through the affine.
    """
    a = F.col("transform")[0]
    b = F.col("transform")[1]
    c = F.col("transform")[2]
    d = F.col("transform")[3]
    e = F.col("transform")[4]
    f6 = F.col("transform")[5]
    w = F.col("width").cast("double")
    h = F.col("height").cast("double")

    def px(col, row):
        return a * col + b * row + c

    def py(col, row):
        return d * col + e * row + f6

    zero = F.lit(0.0)
    df = (
        df.withColumn("x0", px(zero, zero))
        .withColumn("y0", py(zero, zero))
        .withColumn("x1", px(w, zero))
        .withColumn("y1", py(w, zero))
        .withColumn("x2", px(w, h))
        .withColumn("y2", py(w, h))
        .withColumn("x3", px(zero, h))
        .withColumn("y3", py(zero, h))
    )
    xmin = F.least("x0", "x1", "x2", "x3")
    xmax = F.greatest("x0", "x1", "x2", "x3")
    ymin = F.least("y0", "y1", "y2", "y3")
    ymax = F.greatest("y0", "y1", "y2", "y3")
    return df.withColumn(
        "bbox",
        F.struct(
            xmin.alias("xmin"), ymin.alias("ymin"), xmax.alias("xmax"), ymax.alias("ymax")
        ),
    )


def tile_manifest(df: DataFrame, to_lonlat=None) -> DataFrame:
    """Footprints -> VRT/tile manifest: tile_id, bbox, paths, cell ids.

    ``to_lonlat(x_col, y_col) -> (lon_col, lat_col)`` converts storage-CRS
    centers for cell keying; identity when footprints are already 4326.
    Grouping key: rasters sharing a bbox collapse into one tile whose
    ``paths`` array lists every member (the VRT-builder semantics).
    """
    fp = footprints(df)
    cx = (F.col("bbox.xmin") + F.col("bbox.xmax")) * F.lit(0.5)
    cy = (F.col("bbox.ymin") + F.col("bbox.ymax")) * F.lit(0.5)
    if to_lonlat is not None:
        lon, lat = to_lonlat(cx, cy)
    else:
        lon, lat = cx, cy
    fp = fp.withColumn("lon", lon).withColumn("lat", lat)
    for res in (5, 6, 7, 8, 9):
        fp = fp.withColumn(
            f"h3_r{res}", h3lite.encode_col(F.col("lat"), F.col("lon"), res)
        )
    return (
        fp.withColumn("tile_id", F.sha2(F.concat_ws(",", "x0", "y0", "x2", "y2"), 256))
        .groupBy(
            "tile_id", "bbox", "h3_r5", "h3_r6", "h3_r7", "h3_r8", "h3_r9"
        )
        .agg(F.sort_array(F.collect_list("raster_path")).alias("paths"))
    )
