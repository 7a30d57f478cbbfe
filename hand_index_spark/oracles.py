"""DuckDB oracle SQL builders for the driver contract (__spark_entry__).

Each function returns ANSI SQL that DuckDB runs against the
pre-registered testdata views; the engine's Spark queries must match
row-for-row (column names aligned, arithmetic operation-ordered to be
bit-identical — see tables/tilegrid.py's determinism contract).
"""

from __future__ import annotations

from .geo import cells as h3lite
from .tables import tilegrid as tg

URL_SQL = (
    "concat('https://site', CAST(doc_id % 97 AS VARCHAR), "
    "'.example/d', CAST(doc_id AS VARCHAR))"
)


def pts_cte(table: str = "documents") -> str:
    """Pages with derived url + geotag (matches operators.encode.with_geotag)."""
    return f"""
    SELECT {URL_SQL} AS url,
           doc_id,
           {tg.doc_lat_expr_sql("doc_id")} AS lat,
           {tg.doc_lon_expr_sql("doc_id")} AS lon,
           text, lang
    FROM {table}
    """


def _pip_cond(p: str = "p", t: str = "t") -> str:
    """Half-plane >= 0 for all 4 CCW edges — identical expression to
    geo.polygon.points_in_convex."""
    edges = [
        ("x_sw", "y_sw", "x_se", "y_se"),
        ("x_se", "y_se", "x_ne", "y_ne"),
        ("x_ne", "y_ne", "x_nw", "y_nw"),
        ("x_nw", "y_nw", "x_sw", "y_sw"),
    ]
    conds = [
        f"({t}.{x2} - {t}.{x1}) * ({p}.lat - {t}.{y1})"
        f" - ({t}.{y2} - {t}.{y1}) * ({p}.lon - {t}.{x1}) >= 0.0"
        for (x1, y1, x2, y2) in edges
    ]
    return " AND ".join(conds)


def assign_cte(table: str = "documents") -> str:
    """Full tile-assignment CTE chain; final relation ``asg`` has columns
    (url, doc_id, lat, lon, text, lang, tile_id, method, dist2)."""
    d2 = "(p.lon - t.cx) * (p.lon - t.cx) + (p.lat - t.cy) * (p.lat - t.cy)"
    return f"""
    WITH tiles AS ({tg.tiles_sql()}),
    pts AS ({pts_cte(table)}),
    pip AS (
        SELECT p.url AS url, min(t.tile_id) AS tile_id
        FROM pts p JOIN tiles t ON {_pip_cond()}
        GROUP BY p.url
    ),
    knn AS (
        SELECT url, tile_id, dist2 FROM (
            SELECT p.url AS url, t.tile_id AS tile_id, {d2} AS dist2,
                   row_number() OVER (
                       PARTITION BY p.url ORDER BY {d2}, t.tile_id
                   ) AS rn
            FROM pts p, tiles t
            WHERE p.url NOT IN (SELECT url FROM pip)
        ) WHERE rn = 1
    ),
    asg AS (
        SELECT p.url, p.doc_id, p.lat, p.lon, p.text, p.lang,
               COALESCE(i.tile_id, k.tile_id) AS tile_id,
               CASE WHEN i.url IS NOT NULL THEN 'pip' ELSE 'knn' END AS method,
               COALESCE(k.dist2, -1.0) AS dist2
        FROM pts p
        LEFT JOIN pip i ON p.url = i.url
        LEFT JOIN knn k ON p.url = k.url
    )
    """


def tile_assign_sql() -> str:
    """Per-record tile assignment — the flagship correctness query."""
    cell = h3lite.encode_sql("lat", "lon", 7)
    return f"""
    {assign_cte()}
    SELECT url, tile_id, method, dist2, {cell} AS cell_id FROM asg
    """


def tile_histogram_sql() -> str:
    """Rows per tile per method — the skew-detection sketch (SURVEY §4.2)."""
    return f"""
    {assign_cte()}
    SELECT tile_id, method, count(*) AS n_pages
    FROM asg GROUP BY tile_id, method
    """


def cells_encode_sql() -> str:
    """Multi-resolution cell encoding (res 5-9) for every page."""
    exprs = ",\n           ".join(
        f"{h3lite.encode_sql('lat', 'lon', r)} AS h3_r{r}" for r in (5, 6, 7, 8, 9)
    )
    return f"""
    WITH pts AS ({pts_cte()})
    SELECT url, {exprs} FROM pts
    """


def cell_parent_sql() -> str:
    """Parent-by-truncation hierarchy check: res9 cell -> res5 parent."""
    c9 = h3lite.encode_sql("lat", "lon", 9)
    c5 = h3lite.encode_sql("lat", "lon", 5)
    return f"""
    WITH pts AS ({pts_cte()})
    SELECT url, {c9} AS h3_r9, {c5} AS h3_r5 FROM pts
    """


def text_invariant_sql() -> str:
    """Byte-identity invariant: sha256(text) keyed by url must survive the
    full assignment pipeline unchanged (BASELINE.json:15)."""
    return f"""
    {assign_cte()}
    SELECT url, sha256(text) AS text_sha, tile_id FROM asg
    """
