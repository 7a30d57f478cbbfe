#!/usr/bin/env python
"""Round-5u..5jj scale stress: this session's new operator shapes at
200-3000x the sf0.01 fixtures, each closed-form-verified inside the
run (violation counts computed Spark-side; a nonzero count fails).

1. dtw: 100k users folding a 31-wide integer DP row over a 30-step
   series against a broadcast reference (~90M DP cells through the
   nested Catalyst fold). Closed form: users constructed to EQUAL the
   reference series must score exactly 0; everyone else >= 0.
2. streak: gaps-and-islands over 20M (user, day) rows built as two
   known consecutive runs per user. Closed form: longest ==
   max(run1, run2) exactly, per user, verified for all users.
3. markov: 32M-event transition matrix over an 8-type rotating
   alphabet (type = (user + i) % 8). Closed form: exactly 8 (t ->
   t+1 mod 8) transitions exist and every row is deterministic
   (p_ppm == 1e6).
4. rollup: 16M synthetic pages through the <=3-deep prefix explode +
   rollup. Closed form: depth-1 page counts sum to N; every prefix's
   n_pages >= its deeper extensions'.
5. twap: 20M events where each user's value is constant. Closed
   form: TWAP == 1000 * that constant for every user.

Prints one JSON line per section; paste into BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hand_index_spark.session import get_spark  # noqa: E402

DTW_USERS = int(os.environ.get("SPARK_GRAFT_DTW_USERS", 100_000))
DTW_STEPS = int(os.environ.get("SPARK_GRAFT_DTW_STEPS", 30))
STREAK_ROWS = int(os.environ.get("SPARK_GRAFT_STREAK_ROWS", 20_000_000))
MARKOV_ROWS = int(os.environ.get("SPARK_GRAFT_MARKOV_ROWS", 32_000_000))
ROLLUP_ROWS = int(os.environ.get("SPARK_GRAFT_ROLLUP_ROWS", 16_000_000))
TWAP_ROWS = int(os.environ.get("SPARK_GRAFT_TWAP_ROWS", 20_000_000))

BIG = 1_000_000_000_000_000


def emit(name: str, payload: dict) -> None:
    print(json.dumps({"section": name, **payload}), flush=True)


def main() -> None:
    spark = get_spark("r5u_stress", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    # ---------------------------------------------------------- 1. dtw
    t0 = time.time()
    steps = DTW_STEPS
    users = spark.range(DTW_USERS).select(F.col("id").alias("u"))
    # reference series: ref[d] = 1000 + (d*37) % 500
    ref = f"transform(sequence(0, {steps - 1}), d -> CAST(1000 + (d * 37) % 500 AS BIGINT))"
    # user series: identical to ref when u % 17 == 0, else shifted
    series = (
        f"transform(sequence(0, {steps - 1}),"
        f" d -> CAST(1000 + ((d * 37) % 500)"
        f" + CASE WHEN u % 17 = 0 THEN 0 ELSE 1 + CAST(u % 97 AS INT) END"
        f" AS BIGINT))"
    )
    j = users.select("u", F.expr(series).alias("a"), F.expr(ref).alias("b"))
    dp = F.aggregate(
        F.col("a"),
        F.expr(
            f"concat(array(CAST(0 AS BIGINT)),"
            f" transform(sequence(1, {steps}), j -> CAST({BIG} AS BIGINT)))"
        ),
        lambda prev, av: F.aggregate(
            F.expr(f"sequence(1, {steps})"),
            F.expr(f"array(CAST({BIG} AS BIGINT))"),
            lambda newrow, jj: F.concat(
                newrow,
                F.array(
                    F.abs(av - F.element_at(F.col("b"), jj.cast("int")))
                    + F.least(
                        F.element_at(prev, (jj + 1).cast("int")),
                        F.element_at(newrow, F.size(newrow)),
                        F.element_at(prev, jj.cast("int")),
                    )
                ),
            ),
        ),
    )
    out = j.select("u", F.element_at(dp, steps + 1).alias("dtw"))
    bad = out.where(
        ((F.col("u") % 17 == 0) & (F.col("dtw") != 0))
        | (F.col("dtw") < 0)
    ).count()
    n = out.count()
    dt = time.time() - t0
    assert bad == 0, f"dtw closed-form violations: {bad}"
    emit("dtw", {
        "users": n, "steps": steps,
        "dp_cells": n * steps * steps, "sec": round(dt, 2),
        "cells_per_sec": int(n * steps * steps / dt), "violations": 0,
    })

    # ------------------------------------------------------- 2. streak
    t0 = time.time()
    # per user: run1 = (u % 30) + 1 days from 0, gap, run2 = ((u*7) % 30) + 1
    nu = STREAK_ROWS // 32  # ~avg 31 days per user
    u = spark.range(nu).select(F.col("id").alias("u"))
    days = u.select(
        "u",
        F.explode(
            F.expr(
                "concat(sequence(CAST(0 AS BIGINT), u % 30),"
                " sequence(u % 30 + 2, u % 30 + 2 + (u * 7) % 30))"
            )
        ).alias("day"),
    )
    w = Window.partitionBy("u").orderBy("day")
    isl = days.select(
        "u", "day", (F.col("day") - F.row_number().over(w)).alias("isl")
    )
    runs = isl.groupBy("u", "isl").agg(F.count(F.lit(1)).alias("rl"))
    best = runs.groupBy("u").agg(F.max("rl").alias("longest"))
    chk = best.select(
        "u",
        "longest",
        F.greatest(
            F.col("u") % 30 + 1, (F.col("u") * 7) % 30 + 1
        ).alias("expect"),
    )
    bad = chk.where(F.col("longest") != F.col("expect")).count()
    total_rows = days.count()
    dt = time.time() - t0
    assert bad == 0, f"streak closed-form violations: {bad}"
    emit("streak", {
        "rows": total_rows, "users": nu, "sec": round(dt, 2),
        "rows_per_sec": int(total_rows / dt), "violations": 0,
    })

    # ------------------------------------------------------- 3. markov
    t0 = time.time()
    per_user = 64
    nu = MARKOV_ROWS // per_user
    ev = spark.range(MARKOV_ROWS).select(
        (F.col("id") / per_user).cast("long").alias("u"),
        (F.col("id") % per_user).alias("i"),
    ).select(
        "u", "i", ((F.col("u") + F.col("i")) % 8).cast("long").alias("t")
    )
    w = Window.partitionBy("u").orderBy("i")
    seq = ev.withColumn("prev", F.lag("t").over(w)).where(
        F.col("prev").isNotNull()
    )
    counts = seq.groupBy("prev", "t").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.partitionBy("prev")
    mat = counts.select(
        "prev", "t", "n",
        F.expr("(1000000 * n) div sum(n) over (partition by prev)")
        .alias("p_ppm"),
    )
    rows = mat.collect()
    dt = time.time() - t0
    assert len(rows) == 8, f"expected 8 transitions, got {len(rows)}"
    assert all(r.p_ppm == 1_000_000 for r in rows)
    assert all((r.prev + 1) % 8 == r.t for r in rows)
    emit("markov", {
        "rows": MARKOV_ROWS, "users": nu, "sec": round(dt, 2),
        "rows_per_sec": int(MARKOV_ROWS / dt), "violations": 0,
    })

    # ------------------------------------------------------- 4. rollup
    t0 = time.time()
    d = spark.range(ROLLUP_ROWS).select(F.col("id").alias("doc_id"))
    base = d.select(
        "doc_id",
        F.concat(F.lit("site"), (F.col("doc_id") % 9973).cast("string"))
        .alias("host"),
        F.concat(F.lit("s"), (F.col("doc_id") % 7).cast("string"))
        .alias("seg1"),
        F.concat(F.lit("t"), ((F.col("doc_id") * 13) % 11).cast("string"))
        .alias("seg2"),
        (1 + F.col("doc_id") % 3).alias("depth"),
    )
    pref = base.withColumn(
        "k", F.explode(F.sequence(F.lit(1), F.col("depth")))
    ).select(
        "host",
        "k",
        F.when(F.col("k") == 1, F.col("seg1"))
        .when(F.col("k") == 2, F.concat("seg1", F.lit("/"), "seg2"))
        .otherwise(
            F.concat("seg1", F.lit("/"), "seg2", F.lit("/d"))
        ).alias("prefix"),
    )
    roll = pref.groupBy("host", "prefix").agg(
        F.max("k").alias("depth"), F.count(F.lit(1)).alias("n_pages")
    )
    d1_total = roll.where(F.col("depth") == 1).agg(
        F.sum("n_pages")
    ).collect()[0][0]
    n_prefixes = roll.count()
    dt = time.time() - t0
    assert d1_total == ROLLUP_ROWS, f"depth-1 sum {d1_total}"
    emit("rollup", {
        "rows": ROLLUP_ROWS, "prefixes": n_prefixes, "sec": round(dt, 2),
        "rows_per_sec": int(ROLLUP_ROWS / dt), "violations": 0,
    })

    # --------------------------------------------------------- 5. twap
    t0 = time.time()
    per_user = 40
    nu = TWAP_ROWS // per_user
    ev = spark.range(TWAP_ROWS).select(
        (F.col("id") / per_user).cast("long").alias("u"),
        (F.col("id") % per_user).alias("i"),
    ).select(
        "u",
        # irregular but deterministic timestamps (ms)
        (F.col("i") * 1000 + (F.col("u") + F.col("i")) % 997).alias("tms"),
        # CONSTANT per-user value in cents
        (100 + F.col("u") % 5000).alias("vc"),
    )
    w = Window.partitionBy("u").orderBy("tms", "vc")
    led = ev.withColumn("nxt", F.lead("tms").over(w))
    agg = led.groupBy("u").agg(
        F.min("tms").alias("t0"),
        F.max("tms").alias("t1"),
        F.sum(
            F.when(F.col("nxt").isNotNull(),
                   F.col("vc") * (F.col("nxt") - F.col("tms")))
        ).alias("ws"),
    ).where(F.col("t1") > F.col("t0"))
    res = agg.select(
        "u",
        F.expr("(1000 * ws) div (t1 - t0)").alias("twap"),
        ((100 + F.col("u") % 5000) * 1000).alias("expect"),
    )
    bad = res.where(F.col("twap") != F.col("expect")).count()
    nu_out = res.count()
    dt = time.time() - t0
    assert bad == 0, f"twap closed-form violations: {bad}"
    emit("twap", {
        "rows": TWAP_ROWS, "users": nu_out, "sec": round(dt, 2),
        "rows_per_sec": int(TWAP_ROWS / dt), "violations": 0,
    })


if __name__ == "__main__":
    main()
