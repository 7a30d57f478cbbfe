"""Temporal joins (operators/temporal.py): correctness vs brute force
and the plan shapes that make them scale (no cross join, one keyed
shuffle)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hand_index_spark.operators.temporal import asof_join, range_join_bucketed


def _mk(spark):
    base = dt.datetime(2024, 3, 1)
    trades = spark.createDataFrame(
        [
            (i, i % 3, base + dt.timedelta(seconds=37 * i + (i % 7)))
            for i in range(200)
        ],
        "trade_id long, sym long, t timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (100 + i, i % 3, base + dt.timedelta(seconds=50 * i), 10.0 + i)
            for i in range(120)
        ],
        "quote_id long, qsym long, qt timestamp, px double",
    )
    return trades, quotes


def test_asof_matches_bruteforce(spark):
    trades, quotes = _mk(spark)
    got = {
        r.trade_id: (r.asof_quote_id, r.asof_px)
        for r in asof_join(
            trades, quotes, "sym", "qsym", "t", "qt", ["quote_id", "px"]
        ).collect()
    }
    t_rows = trades.collect()
    q_rows = quotes.collect()
    for tr in t_rows:
        cands = [
            q for q in q_rows if q.qsym == tr.sym and q.qt <= tr.t
        ]
        if cands:
            best = max(cands, key=lambda q: (q.qt, q.quote_id))
            assert got[tr.trade_id] == (best.quote_id, best.px), tr
        else:
            assert got[tr.trade_id] == (None, None), tr
    assert len(got) == len(t_rows)  # left-join row preservation


def test_asof_tie_takes_latest_right(spark):
    trades = spark.createDataFrame(
        [(1, 0, dt.datetime(2024, 1, 1, 12))], "trade_id long, sym long, t timestamp"
    )
    quotes = spark.createDataFrame(
        [
            (7, 0, dt.datetime(2024, 1, 1, 12), 1.0),  # same instant as trade
            (9, 0, dt.datetime(2024, 1, 1, 12), 2.0),  # same ts tie -> max id
            (8, 0, dt.datetime(2024, 1, 1, 11), 3.0),
        ],
        "quote_id long, qsym long, qt timestamp, px double",
    )
    r = asof_join(trades, quotes, "sym", "qsym", "t", "qt", ["quote_id", "px"]).first()
    assert (r.asof_quote_id, r.asof_px) == (9, 2.0)  # <= includes equal ts


def test_asof_null_attr_on_matched_row_stays_null(spark):
    """The matched (latest) right row carries ALL its attributes, even
    the null ones — per-column last(ignorenulls) would backfill the
    null px from an older quote and fabricate a mixed row (r4 advice,
    temporal.py)."""
    trades = spark.createDataFrame(
        [(1, 0, dt.datetime(2024, 1, 1, 12))], "trade_id long, sym long, t timestamp"
    )
    quotes = spark.createDataFrame(
        [
            (7, 0, dt.datetime(2024, 1, 1, 10), 1.5),   # older, px non-null
            (9, 0, dt.datetime(2024, 1, 1, 11), None),  # latest, px NULL
        ],
        "quote_id long, qsym long, qt timestamp, px double",
    )
    r = asof_join(trades, quotes, "sym", "qsym", "t", "qt", ["quote_id", "px"]).first()
    assert r.asof_quote_id == 9
    assert r.asof_px is None  # NOT backfilled from quote 7


def test_asof_all_null_right_row_still_matches(spark):
    """A right row whose every carried attribute is null is still a
    real match (the struct carrier is non-null even when all fields
    are null) — distinguishable from 'no match'."""
    trades = spark.createDataFrame(
        [
            (1, 0, dt.datetime(2024, 1, 1, 12)),  # matches the all-null quote
            (2, 5, dt.datetime(2024, 1, 1, 12)),  # no quote for sym 5 at all
        ],
        "trade_id long, sym long, t timestamp",
    )
    quotes = spark.createDataFrame(
        [(None, 0, dt.datetime(2024, 1, 1, 11), None)],
        "quote_id long, qsym long, qt timestamp, px double",
    )
    rows = {
        r.trade_id: (r.asof_quote_id, r.asof_px)
        for r in asof_join(
            trades, quotes, "sym", "qsym", "t", "qt", ["quote_id", "px"]
        ).collect()
    }
    assert rows[1] == (None, None)  # matched the all-null row
    assert rows[2] == (None, None)  # genuinely unmatched


def test_range_join_matches_bruteforce_and_plan(spark):
    trades, quotes = _mk(spark)
    band = 120.0
    out = range_join_bucketed(
        trades, quotes, "sym", "qsym", "t", "qt", band
    )
    got = sorted((r.trade_id, r.quote_id) for r in out.collect())
    t_rows, q_rows = trades.collect(), quotes.collect()
    want = sorted(
        (tr.trade_id, q.quote_id)
        for tr in t_rows
        for q in q_rows
        if q.qsym == tr.sym
        and (q.qt - tr.t).total_seconds() > 0
        and (q.qt - tr.t).total_seconds() <= band
    )
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_plan_single_shuffle_no_join(spark):
    trades, quotes = _mk(spark)
    out = asof_join(trades, quotes, "sym", "qsym", "t", "qt", ["quote_id", "px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the union-timeline form contains NO join operator at all
    for bad in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # one keyed shuffle


def test_range_join_property_boundaries(spark):
    """Property sweep over band widths and adversarial timestamps that
    sit EXACTLY on band edges and bucket boundaries — the cases where a
    bucketing bug (wrong candidate bucket set, off-by-one on the open/
    closed band ends) would diverge from brute force."""
    import itertools

    base = dt.datetime(2024, 6, 1)
    # timestamps engineered to land on exact multiples of the band
    # widths below, plus epsilon offsets around them
    offsets = [0, 1, 59, 60, 61, 119, 120, 121, 180, 240, 300, 3600]
    rows = []
    i = 0
    for k, off in itertools.product(range(3), offsets):
        rows.append((i, k, base + dt.timedelta(seconds=off + k)))
        i += 1
    left = spark.createDataFrame(rows, "lid long, k long, t timestamp")
    right = spark.createDataFrame(
        [(100 + j, r[1], r[2] + dt.timedelta(seconds=d))
         for j, (r, d) in enumerate(
             itertools.product(rows, [-1, 0, 1, 59, 60, 61, 120, 121]))],
        "rid long, rk long, rt timestamp",
    )
    l_rows, r_rows = left.collect(), right.collect()
    for band, closed in [(60.0, False), (60.0, True), (120.0, False)]:
        out = range_join_bucketed(
            left, right, "k", "rk", "t", "rt", band, closed_left=closed
        )
        got = sorted((r.lid, r.rid) for r in out.collect())
        want = sorted(
            (lr.lid, rr.rid)
            for lr in l_rows
            for rr in r_rows
            if rr.rk == lr.k
            and (
                (rr.rt - lr.t).total_seconds() >= 0
                if closed
                else (rr.rt - lr.t).total_seconds() > 0
            )
            and (rr.rt - lr.t).total_seconds() <= band
        )
        assert got == want, (band, closed)


def test_asof_tolerance_matches_bruteforce(spark):
    """tolerance_seconds: a match older than left_ts - tol nulls out
    (pandas merge_asof semantics — since the within-tolerance set is a
    time-suffix, 'latest overall if fresh enough' == 'latest within
    tolerance')."""
    trades, quotes = _mk(spark)
    tol = 300.0
    got = {
        r.trade_id: (r.asof_quote_id, r.asof_px)
        for r in asof_join(
            trades, quotes, "sym", "qsym", "t", "qt", ["quote_id", "px"],
            tolerance_seconds=tol,
        ).collect()
    }
    q_rows = quotes.collect()
    for tr in trades.collect():
        cands = [
            q for q in q_rows
            if q.qsym == tr.sym
            and q.qt <= tr.t
            and (tr.t - q.qt).total_seconds() <= tol
        ]
        if cands:
            best = max(cands, key=lambda q: (q.qt, q.quote_id))
            assert got[tr.trade_id] == (best.quote_id, best.px), tr
        else:
            assert got[tr.trade_id] == (None, None), tr
