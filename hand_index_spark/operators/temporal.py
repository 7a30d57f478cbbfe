"""Temporal joins the built-in operator set lacks: as-of join and
banded range join — named in the round brief as the canonical "custom
operator" class ("e.g., as-of join, range join"), composed here from
existing DataFrame ops (option (a) of the brief's ladder: no UDF, no
mapPartitions).

Both are written for the 10^12-row shape:

* **as-of join** (:func:`asof_join`): the classic distributed pattern —
  UNION the two sides into one keyed timeline, ONE shuffle on the key,
  and a running ``last(..., ignorenulls)`` window carries the most
  recent right-side attributes forward onto every left row. No join
  explosion, no per-row subquery; cost is a single sort per key group
  (exactly what a point-in-time feature lookup needs at training-data
  scale).

* **banded range join** (:func:`range_join_bucketed`): inequality
  bands (t in [t0, t0+W)) become equi-joins by time-bucketing both
  sides at the band width: the left row explodes to the <=2 buckets
  its band spans, joins on (key, bucket) — shuffle-partitionable,
  AQE-splittable, never a cross join — and the exact band predicate
  refines the bucket candidates (the same coarse-join + exact-refine
  shape as the spatial core).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch(col: Column) -> Column:
    """Exact epoch seconds (microsecond-precision double; parquet NTZ
    timestamps cast through 'timestamp' under the pinned-UTC session so
    wall time is preserved — the repo-wide idiom)."""
    return col.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every left row: the right row of the same key with the
    greatest ``right_ts`` <= ``left_ts`` (ties on right_ts broken by
    the greatest first right_col, deterministically). Left rows keep
    all their columns; matched right attributes arrive as
    ``{prefix}{col}``; unmatched rows get nulls.

    ``tolerance_seconds`` bounds staleness (pandas merge_asof's
    ``tolerance``): a match older than ``left_ts - tolerance`` is
    treated as no match (all ``{prefix}*`` columns null). Purely a
    post-window predicate — still one keyed shuffle, no join operator.

    Null semantics: rows with a null key or null timestamp are the
    caller's to filter — a null-ts left row sorts before every right
    row of its key (nulls-first) and therefore matches nothing; null
    keys group together and only see null-key right rows.
    """
    lk, rk = F.col(left_key), F.col(right_key)
    # All right attributes travel as ONE struct so the carried match is a
    # single right ROW: per-column last(ignorenulls) would backfill a null
    # attribute on the matched row from an OLDER right row, fabricating a
    # mixed row that never existed. The struct itself is null on left
    # rows (so ignorenulls skips them) and non-null on every right row,
    # even when all its fields are null.
    assert "__match_ts" not in right_cols  # reserved struct field
    r_struct = F.struct(
        *[F.col(c) for c in right_cols],
        _epoch(F.col(right_ts)).alias("__match_ts"),
    )
    r_tagged = right.select(
        rk.alias("__k"),
        _epoch(F.col(right_ts)).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).alias("__lrow_placeholder"),
        r_struct.alias("__rrow"),
        F.col(right_cols[0]).alias("__ord"),
    )
    l_tagged = left.select(
        lk.alias("__k"),
        _epoch(F.col(left_ts)).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(r_tagged.schema["__rrow"].dataType).alias("__rrow"),
        F.lit(None).cast(right.schema[right_cols[0]].dataType).alias("__ord"),
    )
    r_tagged = r_tagged.select(
        "__k",
        "__t",
        "__is_left",
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        "__rrow",
        "__ord",
    )
    # one keyed timeline: right rows sort BEFORE left rows at equal t
    # (<= semantics); among equal-t right rows the last one wins — the
    # ORDER BY makes that the max first right_col (deterministic)
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_left", "__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("__rrow", ignorenulls=True).over(w).alias("__match"),
    )
    match_ok = F.col("__match").isNotNull()
    if tolerance_seconds is not None:
        match_ok = match_ok & (
            (F.col("__t") - F.col("__match")["__match_ts"])
            <= F.lit(float(tolerance_seconds))
        )
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        *[
            F.when(match_ok, F.col("__match")[c]).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )
    return out


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    band_seconds: float,
    closed_left: bool = False,
) -> DataFrame:
    """Matched pairs (all left columns + all right columns) where
    ``right_key == left_key`` and ``right_ts`` falls in
    ``(left_ts, left_ts + band_seconds]`` (or ``[left_ts, ...]`` with
    ``closed_left``). Bucketing both sides at the band width turns the
    inequality into an equi-join with <=2 candidate buckets per left
    row; the exact predicate refines."""
    w = float(band_seconds)
    lt = _epoch(F.col(left_ts))
    rt = _epoch(F.col(right_ts))
    l2 = (
        left.withColumn("__lt", lt)
        .withColumn("__b0", F.floor(F.col("__lt") / F.lit(w)).cast("long"))
        .withColumn(
            "__bucket",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.col("__b0"),
                        F.floor((F.col("__lt") + F.lit(w)) / F.lit(w)).cast("long"),
                    )
                )
            ),
        )
        .drop("__b0")
    )
    r2 = right.withColumn("__rt", rt).withColumn(
        "__bucket", F.floor(F.col("__rt") / F.lit(w)).cast("long")
    )
    lo = F.col("__rt") >= F.col("__lt") if closed_left else F.col("__rt") > F.col("__lt")
    pairs = l2.alias("l").join(
        r2.alias("r"),
        (F.col(f"l.{left_key}") == F.col(f"r.{right_key}"))
        & (F.col("l.__bucket") == F.col("r.__bucket")),
    )
    refined = pairs.filter(lo & (F.col("__rt") <= F.col("__lt") + F.lit(w)))
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns
    ]
    return refined.select(*keep)


def interval_overlap_join(
    intervals: DataFrame, id_col: str, st: str, en: str, bucket: int
) -> DataFrame:
    """All unordered pairs (a_id < b_id) of half-open integer intervals
    [st, en) that overlap: (a_id, b_id, ov_len).

    The 1-D analogue of the distance-band grid join: each interval
    explodes to the ``bucket``-sized buckets it touches, candidates
    pair up through ONE equi-join on the bucket key, and each
    overlapping pair is emitted exactly once — at the bucket containing
    the LATER start (which lies inside both intervals, so both sides
    cover it). ``bucket`` should be >= the typical interval length;
    long intervals cost ceil(len/bucket) candidate rows, the standard
    banding trade-off (same as range_join_bucketed above).
    """
    b0 = F.expr(f"`{st}` div {bucket}")
    b1 = F.expr(f"(`{en}` - 1) div {bucket}")
    ex = intervals.withColumn("__b", F.explode(F.sequence(b0, b1)))
    a = ex.select(
        F.col(id_col).alias("a_id"),
        F.col(st).alias("a_st"),
        F.col(en).alias("a_en"),
        F.col("__b"),
    )
    b = ex.select(
        F.col(id_col).alias("b_id"),
        F.col(st).alias("b_st"),
        F.col(en).alias("b_en"),
        F.col("__b"),
    )
    later_start = F.greatest(F.col("a_st"), F.col("b_st"))
    return (
        a.hint("shuffle_hash")
        .join(b, "__b")
        .where(F.col("a_id") < F.col("b_id"))
        .where((F.col("a_st") < F.col("b_en")) & (F.col("b_st") < F.col("a_en")))
        .where(F.col("__b") == F.expr(f"greatest(a_st, b_st) div {bucket}"))
        .select(
            "a_id",
            "b_id",
            (
                F.least(F.col("a_en"), F.col("b_en")) - later_start
            ).cast("long").alias("ov_len"),
        )
    )
