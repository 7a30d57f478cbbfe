"""Flagship pipeline: web pages -> geotag -> cells -> tile assignment.

This is the minimum end-to-end slice of SURVEY.md §7 step 4 and the body
of ``__spark_entry__.entry``. The driver's ``documents`` table stands in
for the Common-Crawl-style page table (url, warc_ts, html, text, lang —
BASELINE.json:15): url/html/warc_ts are derived as pure functions of
doc_id so the DuckDB oracle can rebuild the identical input, and ``text``
passes through untouched (the byte-identity invariant).

Scale design (10^12 rows / 1000 executors):
- geotag + multi-res cell encode are pure Catalyst expressions —
  whole-stage codegen, no shuffle, no Python;
- the tile dimension broadcasts once (PackedPolygonIndex, ~100KB per
  1k tiles); assignment is one narrow mapInPandas pass — embarrassingly
  parallel, zero shuffle;
- the only shuffle in the full pipeline is the final
  ``repartition(cell_id)`` before the partitioned write, explicit and
  keyed on the cell id (BASELINE.json:6), with AQE handling residual
  skew after salting (operators.skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import assign as A
from ..operators import encode as E


def web_pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the web_pages input shape from the driver's documents table.

    url is a pure function of doc_id (oracle-reproducible); text/lang
    pass through byte-identical.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(
        F.lit("https://site"),
        (F.col("doc_id") % F.lit(97)).cast("string"),
        F.lit(".example/d"),
        F.col("doc_id").cast("string"),
    )
    return docs.withColumn("url", url)


def assignments(
    spark: SparkSession, sf_dir: str, with_s2: bool = False
) -> DataFrame:
    """(url, tile_id, method, dist2, cell_id [, s2_cell]) per page."""
    pages = web_pages_from_documents(spark, sf_dir)
    pages = E.with_geotag(pages)
    pages = E.with_cells(pages, resolutions=(E.PARTITION_RES,))
    assigned = A.assign_tiles(pages, spark, pip="convex", with_s2=with_s2)
    cols = ["url", "tile_id", "method", "dist2", "cell_id"]
    if with_s2:
        cols.append("s2_cell")
    return assigned.select(*cols)


def assignments_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-width variant: all cell resolutions + s2 + text passthrough,
    used by the bench and the byte-identity invariant test. S2 fuses into
    the assignment UDF: one Python stage total."""
    pages = web_pages_from_documents(spark, sf_dir)
    pages = E.with_geotag(pages)
    pages = E.with_cells(pages)
    return A.assign_tiles(pages, spark, pip="convex", with_s2=True)
