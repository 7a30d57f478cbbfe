"""Round-4 registry batch: large-dimension join-path assignment and the
persisted-ANN pipeline surface (VERDICT r3 items 5 and 7).

Same contract as every other batch: each query is (a) an idiomatic
Spark program and (b) a DuckDB oracle with identical column names and
arithmetic, registered via the shared _register helper into GEO4/TEXT4.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (used by later queries)

from . import oracles
from .operators import assign as A
from .operators import encode as E

GEO4: dict = {}
TEXT4: dict = {}
ORACLES4: dict[str, str] = {}


def _register(reg: dict, name: str, fn, oracle: str | None) -> None:
    reg[name] = fn
    if oracle is not None:
        ORACLES4[name] = oracle


# --------------------------------------------------------------------------
# Large-dimension tile assignment (operators/assign.py:assign_tiles_joined):
# the broadcast-ceiling fallback — cell-key shuffle equi-joins, zero
# broadcast — must produce byte-for-byte the flagship's assignments, so
# it shares tile_assign's oracle verbatim.


def _q_tile_assign_joined(spark, sf_dir):
    """J1+J8 via the no-broadcast plan: PIP equi-join on the point's own
    cell key + 7x7-ring kNN equi-join for misses (dimension past the
    broadcast ceiling at 10^6+ tiles). Same output contract as
    tile_assign."""
    from .pipelines.assign_tiles import web_pages_from_documents

    pages = web_pages_from_documents(spark, sf_dir)
    pages = E.with_geotag(pages)
    pages = E.with_cells(pages, resolutions=(E.PARTITION_RES,))
    assigned = A.assign_tiles_joined(pages, spark, key_col="url")
    return assigned.select("url", "tile_id", "method", "dist2", "cell_id")


_register(GEO4, "tile_assign_joined", _q_tile_assign_joined, oracles.tile_assign_sql())
