"""Web-page ingest pipeline: the flagship path with checkpoints.

The production shape of BASELINE.json's north rule: a (possibly huge)
web-page table flows through geotag -> multi-res cells -> fused
PIP/kNN/S2 assignment -> hot-cell detection -> salted explicit
repartition on the cell key -> hive-partitioned icelite write with
per-partition lineage rows, resumable mid-job.

Stage graph (each stage = one icelite snapshot, skipped on resume):

  stage "assign":   pages -> assignments table (partitioned by h3_r5)
  stage "rollup":   per-cell/method histogram (the skew sketch, also
                    the operational metric table)

Shuffle count: exactly one (the salted repartition before the
partitioned write); assignment itself is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import assign as A
from ..operators import encode as E
from ..operators.skew import detect_hot_cells, salted_repartition
from ..tables.icelite import IceliteTable

PARTITION_COL = "h3_r5"


def ingest_pages(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    fingerprint: str = "v1",
    num_partitions: int | None = None,
    salt_buckets: int = 8,
) -> dict:
    """Run (or resume) the ingest. ``pages`` needs (url, doc_id, text?);
    returns {stage: snapshot}."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    snaps: dict[str, dict] = {}

    asg_table = IceliteTable(out_root, "assignments")
    if not asg_table.stage_done("assign", fingerprint):
        df = E.with_geotag(pages)
        df = E.with_cells(df)
        df = A.assign_tiles(df, spark, pip="convex", with_s2=True)
        # skew sketch on a sample, then the pipeline's single shuffle:
        # salted repartition keyed on the partition cell
        hot = detect_hot_cells(df, PARTITION_COL, quantile=0.99, sample_fraction=0.1)
        df = salted_repartition(
            df,
            num_partitions,
            cell_col=PARTITION_COL,
            salt_key="url",
            salt_buckets=salt_buckets,
            hot_cells=hot or None,
        )
        snaps["assign"] = asg_table.write(
            df,
            partition_by=[PARTITION_COL],
            stage="assign",
            fingerprint=fingerprint,
            lineage_key="cell_id",
        )

    roll_table = IceliteTable(out_root, "cell_rollup")
    if not roll_table.stage_done("rollup", fingerprint):
        asg = asg_table.read(spark)
        roll = asg.groupBy(PARTITION_COL, "tile_id", "method").agg(
            F.count(F.lit(1)).alias("n_pages")
        )
        snaps["rollup"] = roll_table.write(
            roll, stage="rollup", fingerprint=fingerprint, lineage_key=PARTITION_COL
        )
    return snaps
