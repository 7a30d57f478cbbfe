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


# --------------------------------------------------------------------------
# Persisted ANN index (pipelines/ann_index.py): build the icelite-staged
# IVF index (vectors/centroids/assignments), then answer top-k from the
# tables alone — must equal the in-query ivf_topk math exactly, so it
# shares ann_ivf_topk's oracle (same params).

_IVF_K, _IVF_PROBE, _IVF_CENTS, _IVF_ROUNDS = 3, 2, 16, 2


def _q_ann_ivf_indexed(spark, sf_dir):
    """IVF top-k served from the persisted index: the corpus is scanned
    once at build, queries read only the materialized tables."""
    from pyspark.sql import functions as F

    from .entry_queries_r2 import _fresh_dir
    from .pipelines.ann_index import build_ann_index, ivf_topk_indexed

    root = _fresh_dir("annidx_")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    build_ann_index(
        spark, emb, root, fingerprint="q1",
        n_centroids=_IVF_CENTS, rounds=_IVF_ROUNDS,
    )
    return ivf_topk_indexed(
        spark, root, F.col("vec_id") < 5, k=_IVF_K, n_probe=_IVF_PROBE
    )


from .operators.ann import ivf_oracle_sql as _ivf_oracle_sql  # noqa: E402

_register(
    TEXT4,
    "ann_ivf_indexed",
    _q_ann_ivf_indexed,
    _ivf_oracle_sql(
        "vec_id < 5", k=_IVF_K, n_centroids=_IVF_CENTS,
        n_probe=_IVF_PROBE, rounds=_IVF_ROUNDS, dim=64,
    ),
)


# --------------------------------------------------------------------------
# Temporal joins (operators/temporal.py) — the brief's named custom-
# operator class ("as-of join, range join"), composed from DataFrame
# ops (no UDF). The oracles are the brute-force inequality forms; the
# engine runs the one-shuffle union-timeline / bucketed-equi-join
# shapes and must agree exactly.


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _q_asof_join(spark, sf_dir):
    """As-of join: every event picks its user's latest order at or
    before the event time (point-in-time feature lookup), via ONE
    keyed shuffle — union timeline + running last(ignorenulls)."""
    from .operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders")
    out = asof_join(
        ev, orders, "user_id", "o_custkey", "ts", "o_orderdate",
        ["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss").alias(
            "ts_s"
        ),
        F.col("asof_o_orderkey").alias("asof_orderkey"),
        F.round("asof_o_totalprice", 2).alias("asof_totalprice"),
    )


_register(
    TEXT4,
    "asof_join_latest_order",
    _q_asof_join,
    """
    WITH m AS (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           o_orderkey AS asof_orderkey,
           round(o_totalprice, 2) AS asof_totalprice
    FROM m WHERE rn = 1
    """,
)

_BAND_S = 21600.0  # 6 h follower band


def _q_range_join(spark, sf_dir):
    """Banded range join (self): per anchor event, the count/value-sum
    of same-user events in the following 6 h — inequality band turned
    into a (user, time-bucket) equi-join + exact refine."""
    from .operators.temporal import range_join_bucketed

    ev = _t(spark, sf_dir, "events")
    a = ev.select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
    )
    pairs = range_join_bucketed(a, b, "a_user", "b_user", "a_ts", "b_ts", _BAND_S)
    return pairs.groupBy("anchor_id").agg(
        F.count(F.lit(1)).alias("n_follow"),
        F.round(F.sum("b_value"), 2).alias("sum_follow"),
    )


_register(
    TEXT4,
    "range_join_followers",
    _q_range_join,
    f"""
    SELECT a.event_id AS anchor_id,
           count(*) AS n_follow,
           round(sum(b.value), 2) AS sum_follow
    FROM events a JOIN events b
      ON b.user_id = a.user_id
     AND epoch(b.ts) > epoch(a.ts)
     AND epoch(b.ts) <= epoch(a.ts) + {_BAND_S!r}
    GROUP BY a.event_id
    """,
)
