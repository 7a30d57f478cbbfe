"""Streaming ingest: file-source stream -> geotag/cells/assignment ->
partitioned sink, with watermarked rollups.

The reference is strictly batch (SURVEY.md §2.10); this module shows the
engine's stages composing unchanged with Structured Streaming — the
shape a continuously-crawled web-page table would use. Batch functions
are applied per micro-batch via the stream-native API (the assignment
UDF is a stateless scalar pandas UDF, streaming-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import assign as A
from ..operators import encode as E


def stream_pages(spark: SparkSession, src_dir: str, schema) -> DataFrame:
    """readStream over a parquet drop directory (one file per crawl
    batch)."""
    return spark.readStream.schema(schema).parquet(src_dir)


def assigned_stream(spark: SparkSession, pages: DataFrame) -> DataFrame:
    """Stateless stage chain: geotag -> cells -> tile assignment."""
    df = E.with_geotag(pages)
    df = E.with_cells(df, resolutions=(E.PARTITION_RES,))
    return A.assign_tiles(df, spark, pip="convex")


def write_assignments(
    df: DataFrame, out_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """Append sink partitioned by cell; exactly-once via checkpoint.
    ``available_now=True`` drains the current backlog then stops —
    the batch-parity mode used in tests."""
    w = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("cell_id")
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def write_assignments_icelite(
    df: DataFrame,
    table,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Stream into the icelite TABLE layer via ``foreachBatch``: each
    micro-batch appends one snapshot (atomic publish + per-partition
    lineage), and the batch id is the stage fingerprint, so a replayed
    micro-batch (foreachBatch is at-least-once after a crash) is
    SKIPPED — exactly-once appends on top of Spark's recovery,
    the streaming twin of the batch pipelines' idempotent resume."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        fp = f"batch-{batch_id}"
        if table.stage_done("stream-append", fp):
            return  # replayed micro-batch: already committed
        table.write(
            batch_df,
            partition_by=partition_by,
            stage="stream-append",
            fingerprint=fp,
            mode="append",
            lineage_key="cell_id",
        )

    w = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def windowed_rollup(pages: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """Watermarked tumbling-window count per cell — the late-data-safe
    streaming analogue of the tile histogram."""
    return (
        pages.withWatermark(ts_col, "1 hour")
        .groupBy(F.window(F.col(ts_col), "1 hour"), F.col("cell_id"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


def stream_ann_ingest(
    spark: SparkSession,
    emb_stream: DataFrame,
    index_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Round 5: continuous ANN index growth — stream new embedding rows
    into the PERSISTED IVF index via ``foreachBatch`` ->
    :func:`pipelines.ann_index.add_vectors`. The quantizer stays
    frozen (the standard serving contract); each micro-batch merges the
    vectors + assignments tables with the batch id as the stage
    fingerprint, so crash-replayed batches are skipped — exactly-once
    index growth on top of Spark's at-least-once recovery, identical to
    the page-ingest sink's contract."""
    from ..pipelines.ann_index import add_vectors

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        add_vectors(spark, index_root, batch_df, fingerprint=f"batch-{batch_id}")

    w = (
        emb_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
