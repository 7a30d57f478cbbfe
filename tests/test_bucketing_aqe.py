"""Scale techniques with PLAN evidence: bucketed co-located joins
(shuffle-free) and AQE skew-join splitting (runtime re-plan)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the shuffle —
    the 'repartition/bucketing for co-located joins' scale path. At
    100 TB this is how repeated joins on catchment_id avoid paying the
    exchange every query."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ shape
    try:
        left = spark.range(10000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v1")
        )
        right = spark.range(5000).select(
            F.col("id").alias("k"), (F.col("id") % 31).alias("v2")
        )
        for name, df in (("b_left", left), ("b_right", right)):
            df.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(name)
        bl, br = spark.table("b_left"), spark.table("b_right")
        joined = bl.join(br, "k")
        plan = _plan(joined)
        # both scans are bucketed: no Exchange feeds the join
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result equals the unbucketed join
        assert joined.count() == left.join(right, "k").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join splitting fires on a pathological key (half the
    fact rows share one key): the executed plan must carry the
    skew=true marker on the sort-merge join."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(200000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id") % 512).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(512).select(
            F.col("id").alias("k"), F.col("id").alias("attr")
        )
        joined = fact.join(dim, "k")
        # collect() drives THIS Dataset's queryExecution; the finalized
        # adaptive plan then carries the skew-split marker (count()
        # would compile a separate aggregate plan)
        assert len(joined.collect()) == 200000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
