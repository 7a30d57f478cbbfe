"""Incremental append scans + incrementally-maintained materialized
aggregates (tables/matview.py): merge(old, delta) must equal a full
recompute exactly, refreshes must read only appended directories, and
rewrite histories must fall back to full refresh instead of silently
double-counting."""

import pytest
from pyspark.sql import functions as F

from hand_index_spark.tables.icelite import IceliteTable, NonAppendHistoryError
from hand_index_spark.tables.matview import MaterializedAgg


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") * 7 % 101).alias("n_chars"),
    )


def _mv(tmp_path, t):
    return MaterializedAgg(
        str(tmp_path),
        "mv",
        t,
        ["lang"],
        [("count", "*"), ("sum", "n_chars"), ("min", "n_chars"), ("max", "n_chars")],
    )


def _expect(df):
    return {
        r["lang"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("s"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
        .collect()
    }


def _got(mv, spark):
    return {
        r["lang"]: (r["n"], r["sum__n_chars"], r["min__n_chars"], r["max__n_chars"])
        for r in mv.serve(spark).collect()
    }


def test_incremental_equals_full_recompute_across_appends(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "src")
    t.write(_batch(spark, 0, 1000))
    mv = _mv(tmp_path, t)
    assert mv.refresh(spark)["mode"] == "initial"
    for lo, hi in [(1000, 1500), (1500, 3000), (3000, 3001)]:
        t.write(_batch(spark, lo, hi), mode="append")
        s = mv.refresh(spark)
        assert s["mode"] == "incremental"
        assert s["delta_rows"] == hi - lo
        assert _got(mv, spark) == _expect(_batch(spark, 0, hi))


def test_noop_refresh_when_source_unchanged(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "src")
    t.write(_batch(spark, 0, 100))
    mv = _mv(tmp_path, t)
    mv.refresh(spark)
    s = mv.refresh(spark)
    assert s["mode"] == "noop" and s["delta_rows"] == 0
    assert _got(mv, spark) == _expect(_batch(spark, 0, 100))


def test_read_incremental_sees_only_new_dirs(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "src")
    t.write(_batch(spark, 0, 100))
    sid = t.current_snapshot()["snapshot_id"]
    t.write(_batch(spark, 100, 160), mode="append")
    delta = t.read_incremental(spark, sid)
    assert delta.count() == 60
    # every scanned file lives OUTSIDE the base snapshot's directories
    base_paths = set(t.snapshots()[0]["data_paths"])
    files = delta.inputFiles()
    assert files
    assert all(
        not any(f"/{b}/" in f for b in base_paths) for f in files
    )


def test_read_incremental_empty_delta(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "src")
    t.write(_batch(spark, 0, 100))
    sid = t.current_snapshot()["snapshot_id"]
    d = t.read_incremental(spark, sid)
    assert d.count() == 0
    assert d.columns == ["doc_id", "lang", "n_chars"]


def test_rewrite_history_falls_back_to_full(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "src")
    t.write(_batch(spark, 0, 500))
    mv = _mv(tmp_path, t)
    mv.refresh(spark)
    t.write(_batch(spark, 500, 800), mode="append")
    t.compact(spark)  # rewrites dirs -> append delta undefined
    sid = mv.refreshed_snapshot_id()
    with pytest.raises(NonAppendHistoryError):
        t.read_incremental(spark, sid)
    s = mv.refresh(spark)
    assert s["mode"] == "full"
    assert _got(mv, spark) == _expect(_batch(spark, 0, 800))
    # and the MV keeps working incrementally after the rebase
    t.write(_batch(spark, 800, 900), mode="append")
    s = mv.refresh(spark)
    assert s["mode"] == "incremental" and s["delta_rows"] == 100
    assert _got(mv, spark) == _expect(_batch(spark, 0, 900))


def test_overwrite_resets_view_not_doubles(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "src")
    t.write(_batch(spark, 0, 500))
    mv = _mv(tmp_path, t)
    mv.refresh(spark)
    t.write(_batch(spark, 200, 300))  # overwrite: table IS this batch now
    s = mv.refresh(spark)
    assert s["mode"] == "full"
    assert _got(mv, spark) == _expect(_batch(spark, 200, 300))


# ------------------------------------------------------------- changelog


def test_changes_append_only_is_pure_inserts(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "src")
    t.write(_batch(spark, 0, 100))
    v0 = t.current_snapshot()["snapshot_id"]
    t.write(_batch(spark, 100, 150), mode="append")
    ch = t.changes(spark, v0, t.current_snapshot()["snapshot_id"])
    rows = ch.collect()
    assert len(rows) == 50
    assert all(r["_change_type"] == "insert" for r in rows)
    assert sorted(r["doc_id"] for r in rows) == list(range(100, 150))


def test_changes_update_is_delete_insert_pair(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "src")
    t.write(_batch(spark, 0, 100))
    v0 = t.current_snapshot()["snapshot_id"]
    upd = _batch(spark, 0, 1).withColumn("n_chars", F.lit(9999))
    t.merge(spark, upd, key="doc_id")
    ch = {
        (r["_change_type"], r["n_chars"])
        for r in t.changes(
            spark, v0, t.current_snapshot()["snapshot_id"]
        ).collect()
    }
    assert ch == {("insert", 9999), ("delete", 0)}


def test_changes_compaction_is_empty(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "src")
    t.write(_batch(spark, 0, 500))
    t.write(_batch(spark, 500, 600), mode="append")
    v = t.current_snapshot()["snapshot_id"]
    t.compact(spark)
    assert t.changes(spark, v, t.current_snapshot()["snapshot_id"]).count() == 0


def test_changes_handles_duplicate_rows_multiset(spark, tmp_path):
    # two identical rows -> removing ONE of them must emit exactly one
    # delete (exceptAll is a multiset diff, not set diff)
    t = IceliteTable(str(tmp_path), "src")
    dup = _batch(spark, 0, 1)
    t.write(dup.unionByName(dup))
    v0 = t.current_snapshot()["snapshot_id"]
    t.write(dup)  # overwrite with a single copy
    rows = t.changes(spark, v0, t.current_snapshot()["snapshot_id"]).collect()
    assert len(rows) == 1 and rows[0]["_change_type"] == "delete"
