"""Data-layout clustering evidence: sorting the write by cell id makes
parquet row-group min/max stats selective, so a pushed cell predicate
skips almost every row group (the file-skipping half of the partition-
pruning story; hive dirs prune coarsely, footer stats prune within)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hand_index_spark.operators import encode as E


def _matching_rowgroups(path_glob, col, value):
    total = matching = 0
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= value <= st.max):
                matching += 1
    return matching, total


def test_clustered_layout_skips_rowgroups(spark, tmp_path):
    pts = E.with_cells(
        E.with_geotag(spark.range(200_000).withColumnRenamed("id", "doc_id")),
        resolutions=(E.PARTITION_RES,),
    ).select("doc_id", "lat", "lon", "cell_id")

    scattered = str(tmp_path / "scattered")
    clustered = str(tmp_path / "clustered")
    # same rows, two layouts: shuffled round-robin vs range+sorted
    pts.repartition(16).write.mode("overwrite").parquet(scattered)
    (
        pts.repartitionByRange(16, F.col("cell_id"))
        .sortWithinPartitions("cell_id")
        .write.mode("overwrite")
        .parquet(clustered)
    )

    probe = pts.groupBy("cell_id").count().orderBy(F.desc("count")).first().cell_id
    m_sc, t_sc = _matching_rowgroups(f"{scattered}/part-*.parquet", "cell_id", probe)
    m_cl, t_cl = _matching_rowgroups(f"{clustered}/part-*.parquet", "cell_id", probe)
    print(f"scattered: {m_sc}/{t_sc} row groups match; clustered: {m_cl}/{t_cl}")
    # scattered layout: the hot cell appears in (almost) every row group
    assert m_sc >= t_sc * 0.9
    # clustered layout: footer stats confine it to a couple of groups
    assert m_cl <= max(2, t_cl // 8)

    # and the engine reads the same answer from both layouts
    a = spark.read.parquet(scattered).filter(F.col("cell_id") == probe).count()
    b = spark.read.parquet(clustered).filter(F.col("cell_id") == probe).count()
    assert a == b > 0
