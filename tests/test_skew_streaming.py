"""Skew handling + Structured Streaming ingest tests (SURVEY §2.11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hand_index_spark.operators import assign as A
from hand_index_spark.operators import encode as E
from hand_index_spark.operators.skew import detect_hot_cells, salted_repartition


@pytest.fixture(scope="module")
def assigned(spark):
    base = E.with_geotag(spark.range(30000).withColumnRenamed("id", "doc_id"))
    # urban-hotspot skew: 40% of pages pile into one small neighborhood
    base = base.withColumn(
        "lat",
        F.when(F.col("doc_id") % 5 < 2, F.lit(37.7) + (F.col("doc_id") % 97) / 10000.0)
        .otherwise(F.col("lat")),
    ).withColumn(
        "lon",
        F.when(F.col("doc_id") % 5 < 2, F.lit(-122.4) + (F.col("doc_id") % 89) / 10000.0)
        .otherwise(F.col("lon")),
    )
    base = base.withColumn("url", F.concat(F.lit("u"), F.col("doc_id")))
    base = E.with_cells(base, resolutions=(5,))
    return A.assign_tiles(base, spark).withColumn("cell_id", F.col("h3_r5")).cache()


def test_detect_hot_cells(spark, assigned):
    hot = detect_hot_cells(assigned, "cell_id", quantile=0.95)
    assert 0 < len(hot)
    counts = assigned.groupBy("cell_id").count().toPandas().set_index("cell_id")["count"]
    cold_median = counts.median()
    assert all(counts[h] >= cold_median for h in hot)


def test_salted_repartition_preserves_results(spark, assigned):
    hot = detect_hot_cells(assigned, "cell_id", quantile=0.95)
    salted = salted_repartition(
        assigned, 16, cell_col="cell_id", salt_key="url", hot_cells=hot
    )
    a = assigned.groupBy("cell_id").count().toPandas().sort_values("cell_id").reset_index(drop=True)
    b = salted.groupBy("cell_id").count().toPandas().sort_values("cell_id").reset_index(drop=True)
    assert a.equals(b)
    assert salted.rdd.getNumPartitions() == 16
    # hot cells actually spread over >1 partition
    pid = salted.filter(F.col("cell_id") == hot[0]).withColumn(
        "p", F.spark_partition_id()
    )
    assert pid.select("p").distinct().count() > 1


def test_streaming_ingest_matches_batch(spark, tmp_path):
    from hand_index_spark.streaming.ingest import (
        assigned_stream,
        stream_pages,
        write_assignments,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch_df = spark.range(5000).withColumnRenamed("id", "doc_id")
    batch_df.write.parquet(src)

    pages = stream_pages(spark, src, batch_df.schema)
    q = write_assignments(assigned_stream(spark, pages), out, ckpt)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out)
        .select("doc_id", "tile_id", "method")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want_df = A.assign_tiles(
        E.with_cells(E.with_geotag(batch_df), resolutions=(E.PARTITION_RES,)),
        spark,
    )
    want = (
        want_df.select("doc_id", "tile_id", "method")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics: with a 1-hour watermark, an event arriving
    in a later micro-batch but timestamped beyond the advanced
    watermark is DROPPED from the windowed aggregate (append mode)."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from hand_index_spark.streaming.ingest import windowed_rollup

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)

    def mk(path, rows):
        spark.createDataFrame(
            [(t0 + dt.timedelta(minutes=m), int(c)) for m, c in rows],
            "warc_ts timestamp, cell_id long",
        ).coalesce(1).write.parquet(path)

    import time as _time

    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 0: max event time t0+4h -> watermark becomes t0+3h
    mk(f"{src}/p1", [(0, 1), (60, 1), (240, 1)])
    # batch 1: on-time event (the wm computed from batch 0 takes effect
    # here; Spark grants in-flight rows of THIS batch a one-batch grace)
    mk(f"{src}/p2", [(210, 1)])
    # batch 2: the LATE event (t0+90min, window end t0+2h < wm t0+3h)
    # arrives after the watermark is in force -> must be dropped
    mk(f"{src}/p3", [(90, 1)])
    # the file source orders by modification time: pin p1 < p2 < p3
    now = _time.time()
    for i, p in enumerate(("p1", "p2", "p3")):
        ts = now - 300 + i * 60
        for root, _dirs, files in os.walk(f"{src}/{p}"):
            for fn in files:
                os.utime(os.path.join(root, fn), (ts, ts))
    schema = spark.read.parquet(f"{src}/p1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/p*")
    )
    agg = windowed_rollup(stream, ts_col="warc_ts")
    import uuid as _uuid

    name = f"wm_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # append emits only FINALIZED windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 3, "expected three micro-batches"
    got = {
        (r["window"]["start"].hour, r["n_pages"])
        for r in spark.table(name).collect()
    }
    # finalized windows (end <= final watermark t0+3h): hour 0 with its
    # single event and hour 1 with ONLY the on-time minute-60 event —
    # the late minute-90 arrival was dropped; hour 3/4 stay open
    assert got == {(0, 1), (1, 1)}, got


def test_stateful_sessionize_state_crosses_microbatches(spark):
    """applyInPandasWithState: with the events time-split into two files
    and maxFilesPerTrigger=1, users active in both halves must be
    UPDATED twice (two rows in the update-mode sink) and the second
    update must resume from stored state (monotone counters)."""
    from hand_index_spark.entry_queries_r2 import _q_stream_sessionize

    import pyspark.sql.functions as F

    final = _q_stream_sessionize(spark, "/root/testdata/sf0.001")
    # equality with the batch lag-window sessionizer
    from hand_index_spark.entry_queries_ext import _q_sessionize

    batch = _q_sessionize(spark, "/root/testdata/sf0.001").toPandas()
    got = final.toPandas()
    merged = batch.merge(got, on="user_id", suffixes=("_b", "_s"))
    assert len(merged) == len(batch)
    assert (merged.n_sessions_b == merged.n_sessions_s).all()
    assert (merged.n_events_b == merged.n_events_s).all()


def test_stream_foreachbatch_icelite_exactly_once(spark, tmp_path):
    """foreachBatch -> icelite: each micro-batch commits one snapshot
    keyed by batch id; a full REPLAY (fresh stream checkpoint, same
    table) re-offers every batch and all of them are skipped — no
    duplicate rows (exactly-once on top of at-least-once recovery)."""
    import os

    from pyspark.sql import functions as F

    from hand_index_spark.streaming.ingest import (
        assigned_stream,
        stream_pages,
        write_assignments_icelite,
    )
    from hand_index_spark.tables.icelite import IceliteTable

    pages = spark.range(200).select(
        F.concat(F.lit("https://ex.com/p"), F.col("id")).alias("url"),
        F.col("id").alias("doc_id"),
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    pages.filter(F.col("doc_id") < 100).coalesce(1).write.parquet(f"{src}/f1")
    pages.filter(F.col("doc_id") >= 100).coalesce(1).write.parquet(f"{src}/f2")
    schema = spark.read.parquet(f"{src}/f1").schema
    table = IceliteTable(str(tmp_path / "ice"), "stream_asg")

    def drain(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        q = write_assignments_icelite(
            assigned_stream(spark, stream), table, str(tmp_path / ckpt)
        )
        q.awaitTermination()

    drain("ck1")
    assert table.read(spark).count() == 200
    snaps = table.snapshots()
    assert len(snaps) == 2  # one snapshot per micro-batch
    assert {s["fingerprint"] for s in snaps} == {"batch-0", "batch-1"}
    # replay everything: fresh checkpoint -> both batches re-offered,
    # both skipped by the fingerprint guard
    drain("ck2")
    assert table.read(spark).count() == 200
    assert len(table.snapshots()) == 2


def test_stream_icelite_exactly_once_under_midwrite_crash(
    spark, tmp_path, monkeypatch
):
    """Chaos variant (VERDICT r3 item 9): kill the foreachBatch sink
    MID-WRITE at both dangerous points and resume from the SAME stream
    checkpoint (Spark's actual recovery path, not a fresh replay):

    * crash BEFORE the icelite commit — the batch must leave no visible
      rows (atomic publish) and re-run cleanly on restart;
    * crash AFTER the commit but BEFORE the stream checkpoint records
      the batch — restart re-offers the batch (at-least-once) and the
      fingerprint guard must skip it (no duplicate rows).

    After each recovery: exact row count, one snapshot per batch,
    unique sequential batch fingerprints — a consistent chain.
    """
    import os

    from hand_index_spark.streaming.ingest import (
        assigned_stream,
        write_assignments_icelite,
    )
    from hand_index_spark.tables.icelite import IceliteTable

    pages = spark.range(200).select(
        F.concat(F.lit("https://ex.com/p"), F.col("id")).alias("url"),
        F.col("id").alias("doc_id"),
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    pages.filter(F.col("doc_id") < 100).coalesce(1).write.parquet(f"{src}/f1")
    pages.filter(F.col("doc_id") >= 100).coalesce(1).write.parquet(f"{src}/f2")
    schema = spark.read.parquet(f"{src}/f1").schema
    table = IceliteTable(str(tmp_path / "ice"), "chaos_asg")
    ckpt = str(tmp_path / "ck")  # ONE checkpoint across crash + recovery

    orig_write = IceliteTable.write
    mode = {"crash": None, "fired": False}

    def flaky_write(self, df, **kw):
        if mode["crash"] == "before" and kw.get("fingerprint") == "batch-1" and not mode["fired"]:
            mode["fired"] = True
            raise RuntimeError("injected crash BEFORE icelite commit")
        snap = orig_write(self, df, **kw)
        if mode["crash"] == "after" and kw.get("fingerprint") == "batch-1" and not mode["fired"]:
            mode["fired"] = True
            raise RuntimeError("injected crash AFTER commit, before stream checkpoint")
        return snap

    monkeypatch.setattr(IceliteTable, "write", flaky_write)

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        q = write_assignments_icelite(assigned_stream(spark, stream), table, ckpt)
        q.awaitTermination()

    # ---- crash BEFORE commit: batch-1 must be invisible, then recover
    mode["crash"] = "before"
    with pytest.raises(Exception, match="BEFORE icelite commit"):
        drain()
    assert table.read(spark).count() == 100  # atomic: no partial batch-1
    assert [s["fingerprint"] for s in table.snapshots()] == ["batch-0"]
    drain()  # restart, same checkpoint: batch-1 re-offered and written
    assert table.read(spark).count() == 200
    assert [s["fingerprint"] for s in table.snapshots()] == ["batch-0", "batch-1"]

    # ---- crash AFTER commit: restart re-offers batch-1, guard skips it
    table2 = IceliteTable(str(tmp_path / "ice"), "chaos_asg2")
    ckpt2 = str(tmp_path / "ck2")
    mode.update(crash="after", fired=False)

    def drain2():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        q = write_assignments_icelite(assigned_stream(spark, stream), table2, ckpt2)
        q.awaitTermination()

    with pytest.raises(Exception, match="AFTER commit"):
        drain2()
    assert table2.read(spark).count() == 200  # commit landed pre-crash
    drain2()  # recovery replays batch-1 -> fingerprint guard skips
    assert table2.read(spark).count() == 200  # NO duplicates
    assert [s["fingerprint"] for s in table2.snapshots()] == ["batch-0", "batch-1"]
    # byte-level sanity: every doc_id exactly once
    ids = [r.doc_id for r in table2.read(spark).select("doc_id").collect()]
    assert sorted(ids) == list(range(200))


def test_stream_ann_ingest_grows_index_exactly_once(spark, tmp_path):
    """Round 5: streamed embedding batches grow the persisted IVF index
    via add_vectors; served top-k equals a batch build whose quantizer
    trained on the same initial corpus, and a full checkpoint-fresh
    replay changes nothing (fingerprint-guarded merges)."""
    import os

    from pyspark.sql import functions as F

    from hand_index_spark.pipelines.ann_index import (
        build_ann_index,
        ivf_topk_indexed,
    )
    from hand_index_spark.streaming.ingest import stream_ann_ingest

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    h1 = emb.filter(F.col("vec_id") < 250)

    # reference: one-shot build, quantizer trained on the first half
    ref_root = str(tmp_path / "ref")
    build_ann_index(spark, emb, ref_root, train_pred=F.col("vec_id") < 250)
    ref = sorted(
        (r.qid, r.vec_id, r.sim, r.rank)
        for r in ivf_topk_indexed(
            spark, ref_root, F.col("vec_id") < 5, k=3, n_probe=2
        ).collect()
    )

    # streamed: index built on the first half, second half arrives as
    # two streamed files
    inc_root = str(tmp_path / "inc")
    build_ann_index(spark, h1, inc_root)
    src = str(tmp_path / "src")
    os.makedirs(src)
    emb.filter((F.col("vec_id") >= 250) & (F.col("vec_id") < 375)) \
        .coalesce(1).write.parquet(f"{src}/f1")
    emb.filter(F.col("vec_id") >= 375).coalesce(1).write.parquet(f"{src}/f2")
    schema = spark.read.parquet(f"{src}/f1").schema

    def drain(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        q = stream_ann_ingest(spark, stream, inc_root, str(tmp_path / ckpt))
        q.awaitTermination()

    drain("ck1")
    got = sorted(
        (r.qid, r.vec_id, r.sim, r.rank)
        for r in ivf_topk_indexed(
            spark, inc_root, F.col("vec_id") < 5, k=3, n_probe=2
        ).collect()
    )
    assert got == ref  # streamed growth == batch build, bit-for-bit

    # checkpoint-fresh replay: every batch re-offered, every merge
    # skipped by its fingerprint
    from hand_index_spark.tables.icelite import IceliteTable

    n_before = IceliteTable(inc_root, "vectors").read(spark).count()
    drain("ck2")
    assert IceliteTable(inc_root, "vectors").read(spark).count() == n_before == 500
