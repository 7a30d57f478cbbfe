"""Time-series gap fill with linear interpolation.

Regularizes an irregular per-key event series onto a dense integer
time grid — the resample step every sensor/metrics/crawl-latency
pipeline runs before windowed modelling. Between two consecutive
observations (t0,v0),(t1,v1) every missing step t in (t0,t1) gets
    v0 + (v1 - v0) * ((t - t0) / (t1 - t0))
No extrapolation beyond a key's first/last observation.

Implementation is join-free: ONE window (lead over the per-key time
order) pairs each observation with its successor, then
``explode(sequence(t0, t1-1))`` emits the grid rows for that bracket;
the final observation of each key is emitted by the same row (lead is
NULL -> sequence collapses to [t0]). So the cost is one keyed
sort-shuffle plus output-proportional explode work — the optimal
distributed shape (no self-join, no range join, no driver loop).

Exactness: the interpolation expression is evaluated in the same IEEE
order by the DuckDB oracle (one division, one multiply, one add on
float64) — basic arithmetic is correctly rounded on both engines, so
results hash-match bit-for-bit with no rounding step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_linear(
    obs: DataFrame, key: str, t: str, v: str
) -> DataFrame:
    """obs(key, t BIGINT, v DOUBLE) -> dense (key, t, value, filled)
    on every integer step between each key's min and max t."""
    w = Window.partitionBy(key).orderBy(t)
    nxt_t = F.lead(t).over(w)
    nxt_v = F.lead(v).over(w)
    bracket = obs.select(
        F.col(key),
        F.col(t).alias("t0"),
        F.col(v).alias("v0"),
        nxt_t.alias("t1"),
        nxt_v.alias("v1"),
    )
    grid_t = F.explode(
        F.sequence(
            F.col("t0"),
            F.coalesce(F.col("t1") - F.lit(1), F.col("t0")),
        )
    )
    g = bracket.withColumn("t", grid_t)
    frac = (F.col("t") - F.col("t0")).cast("double") / (
        F.col("t1") - F.col("t0")
    ).cast("double")
    value = F.when(F.col("t") == F.col("t0"), F.col("v0")).otherwise(
        F.col("v0") + (F.col("v1") - F.col("v0")) * frac
    )
    return g.select(
        F.col(key),
        F.col("t"),
        value.alias("value"),
        (F.col("t") != F.col("t0")).alias("filled"),
    )
