"""HyperLogLog sketch (operators/sketch.py): estimate accuracy across
scales and the property that makes it a SKETCH — mergeable registers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hand_index_spark.operators.sketch import HLL_M, hll_estimate


@pytest.mark.parametrize("n", [500, 5_000, 50_000])
def test_hll_accuracy(spark, n):
    df = spark.range(n).select((F.col("id") * 7 + 3).alias("v"))
    row = hll_estimate(df, "v").collect()[0]
    assert row.n_true == n
    rel = abs(row.est - n) / n
    # standard error for m=256 is ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert rel < 0.20, (n, row.est)


def test_hll_insensitive_to_duplicates_and_partitioning(spark):
    base = spark.range(10_000).select((F.col("id") % 1000).alias("v"))
    e1 = hll_estimate(base.repartition(1), "v").collect()[0]
    e2 = hll_estimate(base.repartition(13), "v").collect()[0]
    # exact harmonic sum => bit-identical estimate under any layout
    assert e1.est == e2.est
    assert e1.n_true == 1000
