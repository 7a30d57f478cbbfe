"""icelite zone maps: per-file min/max stats + file skipping on a
non-partition column (what hive directory layout alone cannot prune)."""

import pytest
from pyspark.sql import functions as F

from hand_index_spark.tables.icelite import IceliteTable


def _table(spark, tmp_path, n=100_000, files=16):
    t = IceliteTable(str(tmp_path), "zm")
    df = (
        spark.range(n)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(files, "k")
    )
    t.write(df, stats_cols=["k"])
    return t


def test_pruning_skips_files_and_matches_full_scan(spark, tmp_path):
    t = _table(spark, tmp_path)
    files, total = t.pruned_files(spark, "k", 1000, 1999)
    assert total == 16
    assert 1 <= len(files) <= 2  # range-clustered layout -> ~1 file
    got = t.read_pruned(spark, "k", 1000, 1999)
    full = t.read(spark).filter(F.col("k").between(1000, 1999))
    assert got.count() == 1000
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in full.collect()
    )
    # the pruned plan really reads fewer files
    assert len(got.inputFiles()) < len(t.read(spark).inputFiles())


def test_empty_range_returns_no_rows(spark, tmp_path):
    t = _table(spark, tmp_path, n=1000, files=4)
    files, total = t.pruned_files(spark, "k", 10_000_000, 20_000_000)
    assert files == [] and total == 4
    assert t.read_pruned(spark, "k", 10_000_000, 20_000_000).count() == 0


def test_append_accumulates_zonemaps(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "zm")
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(5000, 6000).select(F.col("id").alias("k"))
    t.write(a.repartitionByRange(2, "k"), stats_cols=["k"])
    t.write(b.repartitionByRange(2, "k"), stats_cols=["k"], mode="append")
    files, total = t.pruned_files(spark, "k", 5000, 5100)
    assert total == 4 and len(files) == 1
    assert t.read_pruned(spark, "k", 5000, 5100).count() == 101
    # full read still sees both writes
    assert t.read(spark).count() == 2000


def test_partitioned_write_keeps_partition_column(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "zmp")
    df = spark.range(1000).select(
        (F.col("id") % 4).alias("p"), F.col("id").alias("k")
    )
    t.write(df, partition_by=["p"], stats_cols=["k"])
    got = t.read_pruned(spark, "k", 100, 199)
    assert "p" in got.columns  # basePath pinned -> hive column recovered
    assert got.count() == 100
    assert got.agg(F.countDistinct("p")).collect()[0][0] == 4


def test_missing_stats_col_raises(spark, tmp_path):
    t = _table(spark, tmp_path, n=100, files=2)
    with pytest.raises(ValueError, match="no zone maps for column"):
        t.pruned_files(spark, "v", 0, 10)
