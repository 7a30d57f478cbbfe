"""Registry backing __spark_entry__.queries()/oracle_sql().

Every entry implements one operator row from SURVEY.md §2 (cited per
query) as (a) an idiomatic Spark DataFrame program and (b) a DuckDB
oracle SQL string with IDENTICAL column names and arithmetic. Geo
queries get full oracles too because the tile grid is closed-form
arithmetic (tables/tilegrid.py).

Determinism rules used throughout:
- every aggregate/computed column is aliased identically on both sides;
- double aggregates are rounded in-query on both sides;
- ties in any top-k / dedup are broken by explicit unique keys;
- counts/sizes are cast to bigint on both sides (DuckDB len() vs Spark
  size() width mismatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import oracles
from .geo import cells as h3lite
from .operators import assign as A
from .operators import encode as E
from .pipelines.assign_tiles import assignments, web_pages_from_documents

# --------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return E.with_geotag(web_pages_from_documents(spark, sf_dir))


GEO_QUERIES: dict = {}
RELATIONAL: dict = {}
TEXTOPS: dict = {}
ORACLES: dict[str, str] = {}


def _register(registry: dict, name: str, fn, oracle: str | None) -> None:
    registry[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# --------------------------------------------------------------------------
# GEO — the engine core (SURVEY §2 J1/J8/F10, BASELINE.json north rule)


def _q_tile_assign(spark, sf_dir):
    """J1+refine: broadcast-index PIP + kNN tile assignment per page."""
    return assignments(spark, sf_dir)


_register(GEO_QUERIES, "tile_assign", _q_tile_assign, oracles.tile_assign_sql())


def _q_tile_histogram(spark, sf_dir):
    """A6/skew sketch: pages per tile per method (groupBy on cell keys)."""
    return (
        assignments(spark, sf_dir)
        .groupBy("tile_id", "method")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


_register(GEO_QUERIES, "tile_histogram", _q_tile_histogram, oracles.tile_histogram_sql())


def _q_cells_encode(spark, sf_dir):
    """F10 multi-res: h3lite res 5-9, pure Catalyst expressions."""
    pts = _pts(spark, sf_dir)
    pts = E.with_cells(pts, resolutions=(5, 6, 7, 8, 9))
    return pts.select("url", "h3_r5", "h3_r6", "h3_r7", "h3_r8", "h3_r9")


_register(GEO_QUERIES, "cells_encode", _q_cells_encode, oracles.cells_encode_sql())


def _q_cell_parent(spark, sf_dir):
    """Hierarchy invariant: res-9 cell truncated to res 5 == direct res-5
    encode (the oracle computes both directly)."""
    pts = _pts(spark, sf_dir)
    c9 = h3lite.encode_col(F.col("lat"), F.col("lon"), 9)
    pts = pts.withColumn("h3_r9", c9).withColumn(
        "h3_r5", h3lite.parent_col(F.col("h3_r9"), 5, 9)
    )
    return pts.select("url", "h3_r9", "h3_r5")


_register(GEO_QUERIES, "cell_parent", _q_cell_parent, oracles.cell_parent_sql())


def _q_text_invariant(spark, sf_dir):
    """Byte-identity invariant (BASELINE.json:15): sha256(text) per url
    after the full assignment pipeline."""
    pages = _pts(spark, sf_dir)
    pages = E.with_cells(pages, resolutions=(E.PARTITION_RES,))
    asg = A.assign_tiles(pages, spark, pip="convex")
    return asg.select(
        "url", F.sha2(F.col("text"), 256).alias("text_sha"), "tile_id"
    )


_register(GEO_QUERIES, "text_invariant", _q_text_invariant, oracles.text_invariant_sql())


def _q_knn_fallback(spark, sf_dir):
    """J8: the kNN-to-nearest-tile rows only (points in grid gaps)."""
    return assignments(spark, sf_dir).filter(F.col("method") == "knn").select(
        "url", "tile_id", "dist2"
    )


_register(
    GEO_QUERIES,
    "knn_fallback",
    _q_knn_fallback,
    f"""
    {oracles.assign_cte()}
    SELECT url, tile_id, dist2 FROM asg WHERE method = 'knn'
    """,
)


def _q_bbox_filter(spark, sf_dir):
    """P6: bbox envelope predicate (viz/query_visualization.py:145-157)."""
    pts = _pts(spark, sf_dir)
    return pts.filter(
        (F.col("lon") >= -100.0)
        & (F.col("lon") <= -90.0)
        & (F.col("lat") >= 30.0)
        & (F.col("lat") <= 40.0)
    ).select("url", "lat", "lon")


_register(
    GEO_QUERIES,
    "bbox_filter",
    _q_bbox_filter,
    f"""
    WITH pts AS ({oracles.pts_cte()})
    SELECT url, lat, lon FROM pts
    WHERE lon >= -100.0 AND lon <= -90.0 AND lat >= 30.0 AND lat <= 40.0
    """,
)


def _q_s2_cells(spark, sf_dir):
    """S2 cell ids (canonical S2 construction, pandas UDF) — fully
    oracled: geo.s2lite.encode_sql_query re-derives the identical
    face/uv/st/ij/Hilbert pipeline in DuckDB SQL."""
    pts = E.with_s2(_pts(spark, sf_dir))
    return pts.select("url", "s2_cell")


from .geo import s2lite as _s2  # noqa: E402

_register(
    GEO_QUERIES,
    "s2_cells",
    _q_s2_cells,
    _s2.encode_sql_query(oracles.pts_cte(), keys=("url",), level=E.S2_LEVEL),
)


# --------------------------------------------------------------------------
# RELATIONAL — SURVEY §2 operators over the TPC-H-ish tables


def _q_pricing_summary(spark, sf_dir):
    """A2/A3 flagship relational agg (grouped sums/avgs/count, the
    reference's COUNT/boolean-sum shapes scaled up)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_register(
    RELATIONAL,
    "pricing_summary",
    _q_pricing_summary,
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)


def _q_join_left_3way(spark, sf_dir):
    """J5: 3-way LEFT join attribute assembly (query_geojson.py:139-153)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey, "left")
        .join(r, n.n_regionkey == r.r_regionkey, "left")
        .select("o_orderkey", "c_name", "n_name", "r_name")
    )


_register(
    RELATIONAL,
    "join_left_3way",
    _q_join_left_3way,
    """
    SELECT o_orderkey, c_name, n_name, r_name
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)


def _q_window_dedup(spark, sf_dir):
    """J7: first-item-per-group via ranking window (load.py:76-88)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))
    )


_register(
    RELATIONAL,
    "window_dedup",
    _q_window_dedup,
    """
    SELECT o_custkey, o_orderkey AS first_orderkey FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)


def _q_semi_filter(spark, sf_dir):
    """J6/P8: left-semi keep-set filter (query_geojson.py:221-233)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_register(
    RELATIONAL,
    "semi_filter",
    _q_semi_filter,
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0
    )
    """,
)


def _q_anti_orphans(spark, sf_dir):
    """Left-anti complement of J6 (the upsert's conflict detection, A5)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


_register(
    RELATIONAL,
    "anti_orphans",
    _q_anti_orphans,
    """
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)


def _q_topk_orders(spark, sf_dir):
    """T2: deterministic top-k (ORDER BY value DESC, key LIMIT 10)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


_register(
    RELATIONAL,
    "topk_orders",
    _q_topk_orders,
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)


def _q_topn_per_group(spark, sf_dir):
    """T3: head-N per group via ranking window (viz popup's head-3)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


_register(
    RELATIONAL,
    "topn_per_group",
    _q_topn_per_group,
    """
    SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (
                   PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
               ) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)


def _q_distinct_pairs(spark, sf_dir):
    """A4: SELECT DISTINCT (load.py:212)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


_register(
    RELATIONAL,
    "distinct_pairs",
    _q_distinct_pairs,
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)


def _q_union_all(spark, sf_dir):
    """U1: UNION ALL of per-source scans (load.py:139-149)."""
    p = _t(spark, sf_dir, "part")
    small = p.filter(F.col("p_size") < 10).select("p_partkey", "p_size")
    big = p.filter(F.col("p_size") > 40).select("p_partkey", "p_size")
    return small.unionByName(big)


_register(
    RELATIONAL,
    "union_all",
    _q_union_all,
    """
    SELECT p_partkey, p_size FROM part WHERE p_size < 10
    UNION ALL
    SELECT p_partkey, p_size FROM part WHERE p_size > 40
    """,
)


def _q_regexp_path_join(spark, sf_dir):
    """J2/F1: path-derived equi-join via regexp_extract (load.py:206-221).

    lineitem rows play the file manifest; supplier plays Catchments.
    Broadcast hash join on the extracted branch dir.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    files = li.select(
        F.concat(
            F.lit("s3://fix/huc1/branches/b"),
            F.col("l_suppkey").cast("string"),
            F.lit("/file"),
            F.col("l_linenumber").cast("string"),
            F.lit(".csv"),
        ).alias("file")
    )
    files = files.withColumn(
        "branch_path", F.regexp_extract(F.col("file"), r"(.*/branches/[^/]+/)", 1)
    )
    dim = s.select(
        F.concat(
            F.lit("s3://fix/huc1/branches/b"), F.col("s_suppkey").cast("string"), F.lit("/")
        ).alias("branch_path"),
        "s_name",
    )
    return (
        files.join(F.broadcast(dim), "branch_path")
        .select("branch_path", "s_name")
        .distinct()
    )


_register(
    RELATIONAL,
    "regexp_path_join",
    _q_regexp_path_join,
    """
    WITH files AS (
        SELECT concat('s3://fix/huc1/branches/b', CAST(l_suppkey AS VARCHAR),
                      '/file', CAST(l_linenumber AS VARCHAR), '.csv') AS file
        FROM lineitem
    ), extracted AS (
        SELECT file, regexp_extract(file, '(.*/branches/[^/]+/)', 1) AS branch_path
        FROM files
    ), dim AS (
        SELECT concat('s3://fix/huc1/branches/b', CAST(s_suppkey AS VARCHAR), '/')
                   AS branch_path,
               s_name
        FROM supplier
    )
    SELECT DISTINCT e.branch_path, d.s_name
    FROM extracted e JOIN dim d ON e.branch_path = d.branch_path
    """,
)


def _q_upsert_dedup(spark, sf_dir):
    """A5: dedup-on-key upsert surrogate — latest state per key."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order_day"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_register(
    RELATIONAL,
    "upsert_dedup",
    _q_upsert_dedup,
    """
    SELECT o_custkey,
           strftime(max(o_orderdate), '%Y-%m-%d') AS last_order_day,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)


def _q_threshold_mask(spark, sf_dir):
    """P7: composite boolean threshold mask (query_geojson.py:213-219)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45.0)
        | (F.col("l_discount") >= 0.09)
        | (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


_register(
    RELATIONAL,
    "threshold_mask",
    _q_threshold_mask,
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_quantity > 45.0 OR l_discount >= 0.09 OR l_returnflag = 'R'
    """,
)


def _q_bool_sum_stats(spark, sf_dir):
    """A3: boolean-sum stats dict (query_geojson.py:206-211)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("returned_cnt"),
        F.sum((F.col("l_quantity") > 45.0).cast("long")).alias("bulk_cnt"),
        F.count(F.lit(1)).alias("total_cnt"),
    )


_register(
    RELATIONAL,
    "bool_sum_stats",
    _q_bool_sum_stats,
    """
    SELECT CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS returned_cnt,
           CAST(sum(CASE WHEN l_quantity > 45.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS bulk_cnt,
           count(*) AS total_cnt
    FROM lineitem
    """,
)


def _q_events_windowed(spark, sf_dir):
    """Time-bucketed agg on the events stream table (batch form of the
    streaming rollup; north-rule warc_ts handling analogue)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_format(F.col("ts"), "yyyy-MM-dd"))
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


_register(
    RELATIONAL,
    "events_windowed",
    _q_events_windowed,
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)


# --------------------------------------------------------------------------
# TEXTOPS — training-data pipeline operators over `documents`


def _q_token_count(spark, sf_dir):
    """Token counting (whitespace tokenizer)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )


_register(
    TEXTOPS,
    "token_count",
    _q_token_count,
    "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents",
)


def _q_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on sha256(text), min-id representative."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("text_sha", F.sha2(F.col("text"), 256))
        .groupBy("text_sha")
        .agg(
            F.min("doc_id").alias("rep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


_register(
    TEXTOPS,
    "exact_dedup",
    _q_exact_dedup,
    """
    SELECT sha256(text) AS text_sha, min(doc_id) AS rep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)


_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it")
_SW_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS)


def _q_quality_score(spark, sf_dir):
    """Quality scoring: length + stopword-ratio features (vectorized,
    no per-row Python — array lambdas run in the JVM)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("double")
    score = F.round(
        F.least(n_tok / F.lit(200.0), F.lit(1.0)) * F.lit(0.5)
        + (n_stop / F.greatest(n_tok, F.lit(1.0))) * F.lit(5.0) * F.lit(0.5),
        6,
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1.0)), 6).alias("stop_ratio"),
        score.alias("quality"),
    )


_register(
    TEXTOPS,
    "quality_score",
    _q_quality_score,
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
               CAST(len(list_filter(string_split(text, ' '),
                                    x -> x IN ({_SW_LIST}))) AS DOUBLE) AS n_stop
        FROM documents
    )
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           round(n_stop / greatest(n_tok, 1.0), 6) AS stop_ratio,
           round(least(n_tok / 200.0, 1.0) * 0.5
                 + (n_stop / greatest(n_tok, 1.0)) * 5.0 * 0.5, 6) AS quality
    FROM t
    """,
)


_EN = ("the", "and", "of", "is")
_ES = ("el", "la", "de", "es")


def _q_langid(spark, sf_dir):
    """Language-ID heuristic: marker-token voting."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_en = F.size(F.filter(toks, lambda x: x.isin(*_EN))).cast("long")
    n_es = F.size(F.filter(toks, lambda x: x.isin(*_ES))).cast("long")
    return d.select(
        "doc_id",
        n_en.alias("n_en"),
        n_es.alias("n_es"),
        F.when(n_en >= n_es, F.lit("en")).otherwise(F.lit("es")).alias("pred_lang"),
    )


_en_list = ", ".join(f"'{w}'" for w in _EN)
_es_list = ", ".join(f"'{w}'" for w in _ES)
_register(
    TEXTOPS,
    "langid",
    _q_langid,
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '),
                                    x -> x IN ({_en_list}))) AS BIGINT) AS n_en,
               CAST(len(list_filter(string_split(text, ' '),
                                    x -> x IN ({_es_list}))) AS BIGINT) AS n_es
        FROM documents
    )
    SELECT doc_id, n_en, n_es,
           CASE WHEN n_en >= n_es THEN 'en' ELSE 'es' END AS pred_lang
    FROM t
    """,
)


# --------------------------------------------------------------------------
# batch 2: near-dup / similarity / multimodal / sessionization registry

from .entry_queries_ext import GEO2, ORACLES2, TEXT2  # noqa: E402

GEO_QUERIES.update(GEO2)
TEXTOPS.update(TEXT2)
ORACLES.update(ORACLES2)

# batch 3 (round 2): oracles for the formerly pytest-only operators
from .entry_queries_r2 import GEO3, ORACLES3, TEXT3  # noqa: E402

GEO_QUERIES.update(GEO3)
TEXTOPS.update(TEXT3)
ORACLES.update(ORACLES3)

# batch 4 (round 4): large-dim join assignment + persisted ANN pipeline
from .entry_queries_r4 import GEO4, ORACLES4, TEXT4  # noqa: E402

GEO_QUERIES.update(GEO4)
TEXTOPS.update(TEXT4)
ORACLES.update(ORACLES4)

# batch 5 (round 5): Douglas-Peucker driver surface + additions
from .entry_queries_r5 import GEO5, ORACLES5, TEXT5  # noqa: E402

GEO_QUERIES.update(GEO5)
TEXTOPS.update(TEXT5)
ORACLES.update(ORACLES5)

# batch 5b (round 5): distance-band join, segment overlay, convex hull,
# BPE encode, time-series gap fill
from .entry_queries_r5b import GEO5B, ORACLES5B, TEXT5B  # noqa: E402

GEO_QUERIES.update(GEO5B)
TEXTOPS.update(TEXT5B)
ORACLES.update(ORACLES5B)

# batch 5c (round 5): geodesic band join, quadkeys, triangle counts,
# weighted SSSP, IDW interpolation, Moran's I, sitemap extraction
from .entry_queries_r5c import GEO5C, ORACLES5C, TEXT5C  # noqa: E402

GEO_QUERIES.update(GEO5C)
TEXTOPS.update(TEXT5C)
ORACLES.update(ORACLES5C)

# batch 5d (round 5): terrain rasters (hillshade, overview pyramid,
# marching-squares contours) + KN LM scoring, weighted corpus-mix
# sampling, RAG chunking
from .entry_queries_r5d import GEO5D, ORACLES5D, TEXT5D  # noqa: E402

GEO_QUERIES.update(GEO5D)
TEXTOPS.update(TEXT5D)
ORACLES.update(ORACLES5D)


from .entry_queries_r5e import GEO5E, ORACLES5E, TEXT5E  # noqa: E402

GEO_QUERIES.update(GEO5E)
TEXTOPS.update(TEXT5E)
ORACLES.update(ORACLES5E)


from .entry_queries_r5f import GEO5F, ORACLES5F, TEXT5F  # noqa: E402

GEO_QUERIES.update(GEO5F)
TEXTOPS.update(TEXT5F)
ORACLES.update(ORACLES5F)


# batch 5g (round 5): HITS link analysis, CUSUM change detection,
# blocked fuzzy entity resolution, stream-static enrichment join
from .entry_queries_r5g import GEO5G, ORACLES5G, TEXT5G  # noqa: E402

GEO_QUERIES.update(GEO5G)
TEXTOPS.update(TEXT5G)
ORACLES.update(ORACLES5G)


# batch 5h (round 5): Sutherland-Hodgman tile clipping, Minkowski
# buffer, DSIR importance weights, label-propagation communities
from .entry_queries_r5h import GEO5H, ORACLES5H, TEXT5H  # noqa: E402

GEO_QUERIES.update(GEO5H)
TEXTOPS.update(TEXT5H)
ORACLES.update(ORACLES5H)


# batch 5i (round 5): concat-and-chunk sequence packing (two-phase
# distributed prefix sum), lagged autocorrelation, fan triangulation
from .entry_queries_r5i import GEO5I, ORACLES5I, TEXT5I  # noqa: E402

GEO_QUERIES.update(GEO5I)
TEXTOPS.update(TEXT5I)
ORACLES.update(ORACLES5I)


# batch 5j (round 5): per-lang token budgeting, Newman modularity of
# the LPA partition, great-circle slerp waypoints
from .entry_queries_r5j import GEO5J, ORACLES5J, TEXT5J  # noqa: E402

GEO_QUERIES.update(GEO5J)
TEXTOPS.update(TEXT5J)
ORACLES.update(ORACLES5J)


# batch 5k (round 5): inverted-index postings build, per-lang Merkle
# corpus root, golden-record survivorship
from .entry_queries_r5k import GEO5K, ORACLES5K, TEXT5K  # noqa: E402

GEO_QUERIES.update(GEO5K)
TEXTOPS.update(TEXT5K)
ORACLES.update(ORACLES5K)


# batch 5l (round 5): LTTB downsampling, storage-encoding advisor
# (two-phase run detection), last-touch attribution
from .entry_queries_r5l import GEO5L, ORACLES5L, TEXT5L  # noqa: E402

GEO_QUERIES.update(GEO5L)
TEXTOPS.update(TEXT5L)
ORACLES.update(ORACLES5L)


# batch 5m (round 5): bitmap-index set algebra, JSONL roundtrip,
# Pareto skyline
from .entry_queries_r5m import GEO5M, ORACLES5M, TEXT5M  # noqa: E402

GEO_QUERIES.update(GEO5M)
TEXTOPS.update(TEXT5M)
ORACLES.update(ORACLES5M)


# batch 5n (round 5): k-anonymity audit, A/B two-proportion z-test,
# Heaps-law vocabulary growth
from .entry_queries_r5n import GEO5N, ORACLES5N, TEXT5N  # noqa: E402

GEO_QUERIES.update(GEO5N)
TEXTOPS.update(TEXT5N)
ORACLES.update(ORACLES5N)


# batch 5o (round 5): event-bigram sequence mining, exact equi-width
# value histogram
from .entry_queries_r5o import GEO5O, ORACLES5O, TEXT5O  # noqa: E402

GEO_QUERIES.update(GEO5O)
TEXTOPS.update(TEXT5O)
ORACLES.update(ORACLES5O)


# batch 5p (round 5): model evaluation — langid confusion matrix,
# bbox IoU report, calibration reliability bins
from .entry_queries_r5p import GEO5P, ORACLES5P, TEXT5P  # noqa: E402

GEO_QUERIES.update(GEO5P)
TEXTOPS.update(TEXT5P)
ORACLES.update(ORACLES5P)


# batch 5q (round 5): declarative data-quality checks, column entropy
# profiling
from .entry_queries_r5q import GEO5Q, ORACLES5Q, TEXT5Q  # noqa: E402

GEO_QUERIES.update(GEO5Q)
TEXTOPS.update(TEXT5Q)
ORACLES.update(ORACLES5Q)


# batch 5r (round 5): market-basket lift, concentration metrics
from .entry_queries_r5r import GEO5R, ORACLES5R, TEXT5R  # noqa: E402

GEO_QUERIES.update(GEO5R)
TEXTOPS.update(TEXT5R)
ORACLES.update(ORACLES5R)


# batch 5s (round 5): mergeable fixed-bin quantile sketch with
# carried error, time-to-convert survival metrics
from .entry_queries_r5s import GEO5S, ORACLES5S, TEXT5S  # noqa: E402

GEO_QUERIES.update(GEO5S)
TEXTOPS.update(TEXT5S)
ORACLES.update(ORACLES5S)


# batch 5t (round 5): Flesch readability, BPE tokenizer fertility
from .entry_queries_r5t import GEO5T, ORACLES5T, TEXT5T  # noqa: E402

GEO_QUERIES.update(GEO5T)
TEXTOPS.update(TEXT5T)
ORACLES.update(ORACLES5T)


# batch 5u (round 5): per-group OLS linear trend, Benford first-digit
# audit
from .entry_queries_r5u import GEO5U, ORACLES5U, TEXT5U  # noqa: E402

GEO_QUERIES.update(GEO5U)
TEXTOPS.update(TEXT5U)
ORACLES.update(ORACLES5U)


# batch 5v (round 5): gaps-and-islands longest streak, chi-square
# independence grid
from .entry_queries_r5v import GEO5V, ORACLES5V, TEXT5V  # noqa: E402

GEO_QUERIES.update(GEO5V)
TEXTOPS.update(TEXT5V)
ORACLES.update(ORACLES5V)


# batch 5w (round 5): Kendall tau rank agreement, Holt double
# exponential smoothing forecast
from .entry_queries_r5w import GEO5W, ORACLES5W, TEXT5W  # noqa: E402

GEO_QUERIES.update(GEO5W)
TEXTOPS.update(TEXT5W)
ORACLES.update(ORACLES5W)


# batch 5x (round 5): DTW series similarity (nested-fold DP), z-score
# feature scaling
from .entry_queries_r5x import GEO5X, ORACLES5X, TEXT5X  # noqa: E402

GEO_QUERIES.update(GEO5X)
TEXTOPS.update(TEXT5X)
ORACLES.update(ORACLES5X)


# batch 5y (round 5): areal interpolation onto the tile grid,
# discrete Frechet trajectory distance
from .entry_queries_r5y import GEO5Y, ORACLES5Y, TEXT5Y  # noqa: E402

GEO_QUERIES.update(GEO5Y)
TEXTOPS.update(TEXT5Y)
ORACLES.update(ORACLES5Y)


# batch 5z (round 5): DAG topological layering, PSI distribution drift
from .entry_queries_r5z import GEO5Z, ORACLES5Z, TEXT5Z  # noqa: E402

GEO_QUERIES.update(GEO5Z)
TEXTOPS.update(TEXT5Z)
ORACLES.update(ORACLES5Z)


# batch 5aa (round 5): reciprocal-rank fusion, exact midrank ROC AUC
from .entry_queries_r5aa import GEO5AA, ORACLES5AA, TEXT5AA  # noqa: E402

GEO_QUERIES.update(GEO5AA)
TEXTOPS.update(TEXT5AA)
ORACLES.update(ORACLES5AA)


# batch 5bb (round 5): URL path-prefix rollup, Theil-Sen robust slope
from .entry_queries_r5bb import GEO5BB, ORACLES5BB, TEXT5BB  # noqa: E402

GEO_QUERIES.update(GEO5BB)
TEXTOPS.update(TEXT5BB)
ORACLES.update(ORACLES5BB)


# batch 5cc (round 5): NDCG@10 graded ranking eval, seasonal-naive
# MASE backtest
from .entry_queries_r5cc import GEO5CC, ORACLES5CC, TEXT5CC  # noqa: E402

GEO_QUERIES.update(GEO5CC)
TEXTOPS.update(TEXT5CC)
ORACLES.update(ORACLES5CC)


# batch 5dd (round 5): icelite partition-spec evolution, l-diversity
# privacy audit
from .entry_queries_r5dd import GEO5DD, ORACLES5DD, TEXT5DD  # noqa: E402

GEO_QUERIES.update(GEO5DD)
TEXTOPS.update(TEXT5DD)
ORACLES.update(ORACLES5DD)


# batch 5ee (round 5): int8 scalar quantization, exact weighted median
from .entry_queries_r5ee import GEO5EE, ORACLES5EE, TEXT5EE  # noqa: E402

GEO_QUERIES.update(GEO5EE)
TEXTOPS.update(TEXT5EE)
ORACLES.update(ORACLES5EE)


# batch 5ff (round 5): point-set diameter, time-weighted average
from .entry_queries_r5ff import GEO5FF, ORACLES5FF, TEXT5FF  # noqa: E402

GEO_QUERIES.update(GEO5FF)
TEXTOPS.update(TEXT5FF)
ORACLES.update(ORACLES5FF)


# batch 5gg (round 5): geohash neighbor cells, Markov transition
# matrix
from .entry_queries_r5gg import GEO5GG, ORACLES5GG, TEXT5GG  # noqa: E402

GEO_QUERIES.update(GEO5GG)
TEXTOPS.update(TEXT5GG)
ORACLES.update(ORACLES5GG)


# batch 5hh (round 5): Spearman rank correlation, Benjamini-Hochberg
# FDR selection
from .entry_queries_r5hh import GEO5HH, ORACLES5HH, TEXT5HH  # noqa: E402

GEO_QUERIES.update(GEO5HH)
TEXTOPS.update(TEXT5HH)
ORACLES.update(ORACLES5HH)


# batch 5ii (round 5): 1-D Earth Mover's distance, mutual information
from .entry_queries_r5ii import GEO5II, ORACLES5II, TEXT5II  # noqa: E402

GEO_QUERIES.update(GEO5II)
TEXTOPS.update(TEXT5II)
ORACLES.update(ORACLES5II)


# batch 5jj (round 5): bearing rose, clamped running balance
from .entry_queries_r5jj import GEO5JJ, ORACLES5JJ, TEXT5JJ  # noqa: E402

GEO_QUERIES.update(GEO5JJ)
TEXTOPS.update(TEXT5JJ)
ORACLES.update(ORACLES5JJ)


# batch 5kk (round 5): rendezvous hashing, zonemap overlap audit
from .entry_queries_r5kk import GEO5KK, ORACLES5KK, TEXT5KK  # noqa: E402

GEO_QUERIES.update(GEO5KK)
TEXTOPS.update(TEXT5KK)
ORACLES.update(ORACLES5KK)


# batch 5ll (round 5): cross-track deviation, Cohen's kappa
from .entry_queries_r5ll import GEO5LL, ORACLES5LL, TEXT5LL  # noqa: E402

GEO_QUERIES.update(GEO5LL)
TEXTOPS.update(TEXT5LL)
ORACLES.update(ORACLES5LL)


# batch 5mm (round 5): degree power-law fit, group-mode imputation
from .entry_queries_r5mm import GEO5MM, ORACLES5MM, TEXT5MM  # noqa: E402

GEO_QUERIES.update(GEO5MM)
TEXTOPS.update(TEXT5MM)
ORACLES.update(ORACLES5MM)


# batch 5nn (round 5): sweep-line max concurrency, SPRT barrier
# crossing
from .entry_queries_r5nn import GEO5NN, ORACLES5NN, TEXT5NN  # noqa: E402

GEO_QUERIES.update(GEO5NN)
TEXTOPS.update(TEXT5NN)
ORACLES.update(ORACLES5NN)


# batch 5oo (round 5): KMV distinct sketch, audience overlap algebra
from .entry_queries_r5oo import GEO5OO, ORACLES5OO, TEXT5OO  # noqa: E402

GEO_QUERIES.update(GEO5OO)
TEXTOPS.update(TEXT5OO)
ORACLES.update(ORACLES5OO)


# batch 5pp (round 5): spatial coverage gaps, mix-shift decomposition
from .entry_queries_r5pp import GEO5PP, ORACLES5PP, TEXT5PP  # noqa: E402

GEO_QUERIES.update(GEO5PP)
TEXTOPS.update(TEXT5PP)
ORACLES.update(ORACLES5PP)


# batch 5qq (round 5): hexagonal binning, log2 latency histogram
from .entry_queries_r5qq import GEO5QQ, ORACLES5QQ, TEXT5QQ  # noqa: E402

GEO_QUERIES.update(GEO5QQ)
TEXTOPS.update(TEXT5QQ)
ORACLES.update(ORACLES5QQ)


# batch 5rr (round 5): KWIC concordance, feature hashing
from .entry_queries_r5rr import GEO5RR, ORACLES5RR, TEXT5RR  # noqa: E402

GEO_QUERIES.update(GEO5RR)
TEXTOPS.update(TEXT5RR)
ORACLES.update(ORACLES5RR)


# batch 5ss (round 5): GDPR forget-user via icelite DELETE, star
# revenue rollup
from .entry_queries_r5ss import GEO5SS, ORACLES5SS, TEXT5SS  # noqa: E402

GEO_QUERIES.update(GEO5SS)
TEXTOPS.update(TEXT5SS)
ORACLES.update(ORACLES5SS)


# batch 5tt (round 5): business-day arithmetic, dow x hour heatmap
from .entry_queries_r5tt import GEO5TT, ORACLES5TT, TEXT5TT  # noqa: E402

GEO_QUERIES.update(GEO5TT)
TEXTOPS.update(TEXT5TT)
ORACLES.update(ORACLES5TT)


# batch 5uu (round 5): X-bar control chart, winsorized mean
from .entry_queries_r5uu import GEO5UU, ORACLES5UU, TEXT5UU  # noqa: E402

GEO_QUERIES.update(GEO5UU)
TEXTOPS.update(TEXT5UU)
ORACLES.update(ORACLES5UU)


# batch 5vv (round 5): CIDR longest-prefix match, ABC Pareto classes
from .entry_queries_r5vv import GEO5VV, ORACLES5VV, TEXT5VV  # noqa: E402

GEO_QUERIES.update(GEO5VV)
TEXTOPS.update(TEXT5VV)
ORACLES.update(ORACLES5VV)


# batch 5ww (round 5): spatiotemporal co-presence, quantile transform
from .entry_queries_r5ww import GEO5WW, ORACLES5WW, TEXT5WW  # noqa: E402

GEO_QUERIES.update(GEO5WW)
TEXTOPS.update(TEXT5WW)
ORACLES.update(ORACLES5WW)


# batch 5xx (round 5): route-corridor membership, new-vs-returning
from .entry_queries_r5xx import GEO5XX, ORACLES5XX, TEXT5XX  # noqa: E402

GEO_QUERIES.update(GEO5XX)
TEXTOPS.update(TEXT5XX)
ORACLES.update(ORACLES5XX)


# batch 5yy (round 5): OHLC candles with VWAP, top movers
from .entry_queries_r5yy import GEO5YY, ORACLES5YY, TEXT5YY  # noqa: E402

GEO_QUERIES.update(GEO5YY)
TEXTOPS.update(TEXT5YY)
ORACLES.update(ORACLES5YY)


# batch 5zz (round 5, session closer): assignment-path parity,
# method share
from .entry_queries_r5zz import GEO5ZZ, ORACLES5ZZ, TEXT5ZZ  # noqa: E402

GEO_QUERIES.update(GEO5ZZ)
TEXTOPS.update(TEXT5ZZ)
ORACLES.update(ORACLES5ZZ)


# batch 5aaa (round 5): Kaplan-Meier survival, RFM segmentation
from .entry_queries_r5aaa import GEO5AAA, ORACLES5AAA, TEXT5AAA  # noqa: E402

GEO_QUERIES.update(GEO5AAA)
TEXTOPS.update(TEXT5AAA)
ORACLES.update(ORACLES5AAA)


# batch 5bbb (round 5): item-item collaborative filtering, FIFO lots
from .entry_queries_r5bbb import GEO5BBB, ORACLES5BBB, TEXT5BBB  # noqa: E402

GEO_QUERIES.update(GEO5BBB)
TEXTOPS.update(TEXT5BBB)
ORACLES.update(ORACLES5BBB)


# batch 5ccc (round 5): H3-style cover compaction, link prediction
from .entry_queries_r5ccc import GEO5CCC, ORACLES5CCC, TEXT5CCC  # noqa: E402

GEO_QUERIES.update(GEO5CCC)
TEXTOPS.update(TEXT5CCC)
ORACLES.update(ORACLES5CCC)
