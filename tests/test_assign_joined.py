"""Large-dimension tile assignment: the cell-key equi-join path and its
auto-switch (VERDICT r3 item 5).

The broadcast path re-sends the packed index to every executor — wrong
plan past ~64 MB (10^6-10^7 real catchment polygons). These tests pin:

1. bit-exact parity of assign_tiles_joined vs the broadcast UDF kernel
   (tile_id, method AND the double dist2) on a corpus that exercises
   both PIP hits and kNN fallbacks;
2. the auto-switch: a sub-threshold index keeps the one-ArrowEvalPython
   broadcast plan, an over-threshold index flips to the join plan;
3. the plan audit: large-dim mode contains NO BroadcastExchange /
   BroadcastHashJoin and NO ArrowEvalPython assignment stage — both
   joins are shuffle equi-joins on cell_key.
"""

from __future__ import annotations

import pytest

from hand_index_spark.operators import assign as A
from hand_index_spark.operators import encode as E


def _pts(spark, n=20000):
    return E.with_geotag(spark.range(n).withColumnRenamed("id", "doc_id"))


def _collect_sorted(df):
    rows = df.select("doc_id", "tile_id", "method", "dist2").collect()
    return sorted((r.doc_id, r.tile_id, r.method, r.dist2) for r in rows)


@pytest.fixture(scope="module")
def both(spark):
    pts = _pts(spark)
    bcast = _collect_sorted(A.assign_tiles(pts, spark, pip="convex"))
    joined = _collect_sorted(
        A.assign_tiles_joined(pts, spark, key_col="doc_id")
    )
    return bcast, joined


def test_joined_matches_broadcast_exactly(both):
    bcast, joined = both
    assert len(bcast) == len(joined)
    assert bcast == joined  # incl. bit-exact dist2 doubles + tie-breaks


def test_joined_covers_both_methods(both):
    bcast, _ = both
    methods = {m for _, _, m, _ in bcast}
    assert methods == {"pip", "knn"}  # corpus exercises the fallback


def test_joined_without_key_col(spark):
    pts = _pts(spark, 3000)
    bcast = _collect_sorted(A.assign_tiles(pts, spark, pip="convex"))
    joined = _collect_sorted(A.assign_tiles_joined(pts, spark))
    assert bcast == joined


def test_auto_switch_to_join_plan(spark):
    pts = _pts(spark, 3000)
    out = A.assign_tiles(
        pts, spark, pip="convex", broadcast_limit_bytes=1, key_col="doc_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "ArrowEvalPython" not in plan
    assert "ShuffledHashJoin" in plan
    # and it still computes the same thing
    assert _collect_sorted(out) == _collect_sorted(
        A.assign_tiles(pts, spark, pip="convex")
    )


def test_default_stays_broadcast_udf(spark):
    pts = _pts(spark, 1000)
    out = A.assign_tiles(pts, spark, pip="convex")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "ShuffledHashJoin" not in plan
    assert A.index_nbytes(A.build_tile_index()) < A.BROADCAST_LIMIT_BYTES


def test_with_s2_parity(spark):
    pts = _pts(spark, 2000)
    b = A.assign_tiles(pts, spark, pip="convex", with_s2=True)
    j = A.assign_tiles_joined(pts, spark, with_s2=True, key_col="doc_id")
    bs = sorted((r.doc_id, r.s2_cell) for r in b.select("doc_id", "s2_cell").collect())
    js = sorted((r.doc_id, r.s2_cell) for r in j.select("doc_id", "s2_cell").collect())
    assert bs == js
