"""Round-6 optimization pins: the assign kNN shortlist + precomputed
edge vectors and the s2 chunked Hilbert fold must be bit-identical to
the unpruned/level-by-level forms they replaced (the fast paths are
pure re-arrangements; any drift is a bug, not a tolerance)."""

from __future__ import annotations

import numpy as np

from hand_index_spark.geo import s2lite
from hand_index_spark.operators import assign as A
from hand_index_spark.tables import tilegrid as tg


def _strip(idx):
    """Remove the r6 annotations so assign_batch takes the original
    49-candidate ring scan + (N,4,2) corner-gather paths."""
    idx.knn_shortlist = None
    idx.edge_x1 = None
    return idx


def test_shortlist_sizes_and_order():
    idx = A.build_tile_index()
    sl = idx.knn_shortlist
    assert sl.shape[0] == tg.NR * tg.NC
    assert sl.shape[1] <= (2 * A._GRID_RING + 1) ** 2
    for row in sl:
        live = row[row >= 0]
        assert len(live) >= 1  # every cell has candidates on this grid
        assert (np.diff(live) > 0).all()  # ascending => tie-break order


def test_assign_batch_bitwise_vs_unpruned():
    fast = A.build_tile_index()
    ref = _strip(A.build_tile_index())
    rng = np.random.RandomState(1234)
    # in-extent + boundary + out-of-extent points
    lat = np.concatenate([
        rng.uniform(tg.LAT_MIN, tg.LAT_MAX, 200_000),
        rng.uniform(tg.LAT_MIN - 5, tg.LAT_MAX + 5, 50_000),
        np.array([tg.LAT_MIN, tg.LAT_MAX, 24.0, 49.999999]),
    ])
    lon = np.concatenate([
        rng.uniform(tg.LON_MIN, tg.LON_MAX, 200_000),
        rng.uniform(tg.LON_MIN - 5, tg.LON_MAX + 5, 50_000),
        np.array([tg.LON_MIN, tg.LON_MAX, -125.0, -66.000001]),
    ])
    tf, mf, df = A.assign_batch(fast, lat, lon, pip="convex")
    tr, mr, dr = A.assign_batch(ref, lat, lon, pip="convex")
    assert np.array_equal(tf, tr)
    assert np.array_equal(mf, mr)
    assert np.array_equal(df.view(np.int64), dr.view(np.int64))  # bitwise


def test_box_clip_area2_bitwise_vs_fold(spark_session=None):
    """The closed-form rectangle clip must equal the Sutherland-Hodgman
    fold bit-for-bit in the fold's exactness regime (integer coords and
    bounds) — the clip_to_tiles dispatch relies on this."""
    from pyspark.sql import functions as F

    from hand_index_spark.operators.clip import (
        box_clip_area2,
        clip_to_box,
        ring_area2,
    )
    from hand_index_spark.session import get_spark

    spark = get_spark("test_box_clip", master="local[4]", shuffle_partitions=4)
    d = spark.range(5000).select(
        "id",
        ((F.col("id") * 73) % 1000).cast("double").alias("x1"),
        ((F.col("id") * 131) % 1000).cast("double").alias("y1"),
        ((F.col("id") * 73) % 1000 + 8 + (F.col("id") % 5) * 23)
        .cast("double").alias("x2"),
        ((F.col("id") * 131) % 1000 + 8 + ((F.col("id") * 7) % 5) * 23)
        .cast("double").alias("y2"),
        ((F.col("id") * 37) % 16 * 64).cast("double").alias("bx"),
        ((F.col("id") * 53) % 16 * 64).cast("double").alias("by"),
    )
    ring = F.array(
        F.struct(F.col("x1").alias("x"), F.col("y1").alias("y")),
        F.struct(F.col("x2").alias("x"), F.col("y1").alias("y")),
        F.struct(F.col("x2").alias("x"), F.col("y2").alias("y")),
        F.struct(F.col("x1").alias("x"), F.col("y2").alias("y")),
    )
    bx, by = F.col("bx"), F.col("by")
    out = d.select(
        ring_area2(clip_to_box(ring, bx, bx + 64.0, by, by + 64.0)).alias("fold"),
        box_clip_area2(
            F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
            bx, bx + 64.0, by, by + 64.0,
        ).alias("closed"),
    ).toPandas()
    assert (
        out["fold"].values.view("int64") == out["closed"].values.view("int64")
    ).all()
    assert (out["closed"] > 0).any() and (out["closed"] == 0).any()


def test_s2_chunked_fold_bitwise():
    rng = np.random.RandomState(99)
    lat = rng.uniform(-89.99, 89.99, 100_000)
    lon = rng.uniform(-180.0, 180.0, 100_000)
    for level in (1, 7, 8, 9, 15, 16, 17, 24, 30):
        got = s2lite.encode(lat, lon, level)
        # reference: the original single-level fold
        x, y, z = s2lite._xyz(lat, lon)
        face, u, v = s2lite._face_uv(x, y, z)
        i = s2lite._st_to_ij(s2lite._uv_to_st(u))
        j = s2lite._st_to_ij(s2lite._uv_to_st(v))
        orient = face & np.int64(s2lite._SWAP)
        pos = np.zeros_like(i)
        ml = s2lite.MAX_LEVEL
        for k in range(ml - 1, ml - 1 - level, -1):
            ij = ((i >> np.int64(k)) & 1) * 2 + ((j >> np.int64(k)) & 1)
            p = s2lite._IJ_TO_POS[orient, ij]
            pos = (pos << np.int64(2)) | p
            orient = orient ^ s2lite._POS_TO_ORIENT[p]
        shift = np.int64(2 * (ml - level) + 1)
        want = (face << np.int64(2 * ml + 1)) | (pos << shift)
        want = want | (np.int64(1) << (shift - np.int64(1)))
        assert np.array_equal(got, want), f"level {level}"
