"""Pure-NumPy geometry kernels (no shapely/geopandas/pyproj in this env).

Each module is Spark-free so pandas UDFs can wrap it with zero overhead:

- ``wkb``      — WKB Point/Polygon/MultiPolygon codec (public OGC format;
                 reference stores geometry as WKB BLOBs, load.py:163).
- ``polygon``  — shoelace area/centroid, ray-cast point-in-polygon,
                 Sutherland-Hodgman clipping, Douglas-Peucker simplify,
                 polygon-polygon intersection tests.
- ``albers``   — EPSG:5070 CONUS Albers equal-area forward/inverse
                 (public Snyder formulas; reference: ST_Transform
                 4326<->5070, load.py:165-166, query_geojson.py:59-62).
- ``cells``    — hierarchical multi-resolution spatial cell ids
                 ("h3lite", H3-style bit layout; res 5-9) with both a
                 NumPy kernel and a pure Catalyst column-expression
                 builder, plus bbox covering (polyfill) and ring
                 neighborhoods.
- ``s2lite``   — S2 cell ids: cube-face projection + quadratic ST
                 transform + Hilbert curve position (public S2 geometry
                 construction), vectorized.
- ``strtree``  — packed bbox index (STR-style bulk load): brute
                 vectorized bbox-overlap queries + grid buckets for
                 point probes; built once, broadcast to executors.
"""
