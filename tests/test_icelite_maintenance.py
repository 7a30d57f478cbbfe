"""icelite MERGE (row-level upsert) + compaction maintenance semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hand_index_spark.tables.icelite import IceliteTable


def _checksum(spark, t):
    df = t.read(spark)
    cols = ", ".join(df.columns)
    row = df.agg(
        F.expr(f"bit_xor(xxhash64({cols}))").alias("ck"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return row.ck, row.n


def test_merge_upsert_and_time_travel(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "m")
    base = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t.write(base, stage="base", lineage_key="k")
    sid0 = t.current_snapshot()["snapshot_id"]

    updates = spark.range(50, 120).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    t.merge(spark, updates, "k", fingerprint="m1")

    back = {r.k: r.v for r in t.read(spark).collect()}
    assert len(back) == 120  # 50 replaced + 50 untouched + 20 inserted
    for k in range(120):
        assert back[k] == (-1 if k >= 50 else 2 * k), k
    # pre-merge snapshot still time-travels intact (copy-on-write)
    old = {r.k: r.v for r in t.read_snapshot(spark, sid0).collect()}
    assert old == {k: 2 * k for k in range(100)}
    # merge is idempotently resumable like any staged write
    assert t.stage_done("merge", "m1")


def test_merge_rejects_duplicate_update_keys(spark, tmp_path):
    """Duplicate keys in updates would silently break the one-row-per-key
    upsert contract (Iceberg MERGE raises on multiple matches too)."""
    import pytest

    t = IceliteTable(str(tmp_path), "mdup")
    base = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t.write(base, stage="base", lineage_key="k")
    dup_updates = spark.createDataFrame([(3, -1), (3, -2)], "k long, v long")
    with pytest.raises(ValueError, match="duplicate key"):
        t.merge(spark, dup_updates, "k", fingerprint="bad")
    # table unchanged: the failed merge committed nothing
    assert {r.k: r.v for r in t.read(spark).collect()} == {k: 2 * k for k in range(10)}


def test_compact_preserves_checksum_then_vacuum(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "c")
    for i in range(3):
        part = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        t.write(
            part, stage="load", fingerprint=f"p{i}",
            mode="append" if i else "overwrite", lineage_key="k",
        )
    assert len(t.current_snapshot()["data_paths"]) == 3
    ck0, n0 = _checksum(spark, t)

    t.compact(spark)
    snap = t.current_snapshot()
    assert snap["stage"] == "compact"
    assert len(snap["data_paths"]) == 1
    ck1, n1 = _checksum(spark, t)
    assert (ck1, n1) == (ck0, n0)  # byte-identical row set, one dir

    # old dirs remain for time travel until vacuum
    data = os.path.join(str(tmp_path), "c", "data")
    assert len([d for d in os.listdir(data) if d.startswith("d-")]) == 4
    t.vacuum(keep_last=1)
    assert len([d for d in os.listdir(data) if d.startswith("d-")]) == 1
    assert _checksum(spark, t) == (ck0, n0)


def test_concurrent_writer_conflict_is_clean(spark, tmp_path):
    """Optimistic concurrency: a writer holding a STALE view of the
    table must get ConcurrentWriteError (Iceberg CommitFailedException
    semantics), the winner's snapshot must be untouched, and a retry
    with a fresh view must succeed."""
    import json

    import pytest

    from hand_index_spark.tables.icelite import ConcurrentWriteError

    t1 = IceliteTable(str(tmp_path), "t")
    df = spark.range(10).select(F.col("id").alias("k"))
    t1.write(df, stage="a", lineage_key="k")          # snapshot 0
    t1.write(df, stage="b", lineage_key="k")          # snapshot 1 (winner)

    # a second writer that read the table BEFORE snapshot 1 landed
    t2 = IceliteTable(str(tmp_path), "t")
    with open(os.path.join(str(tmp_path), "t", "_meta", "snap-000000.json")) as f:
        stale = json.load(f)
    t2.current_snapshot = lambda: stale  # freeze its stale view
    with pytest.raises(ConcurrentWriteError):
        t2.write(df, stage="c", lineage_key="k")

    # the winner is intact; the loser published nothing
    assert t1.current_snapshot()["snapshot_id"] == 1
    assert t1.current_snapshot()["stage"] == "b"
    assert t1.read(spark).count() == 10
    # retry with a fresh view commits cleanly as snapshot 2
    t3 = IceliteTable(str(tmp_path), "t")
    snap = t3.write(df, stage="c", lineage_key="k")
    assert snap["snapshot_id"] == 2
    # the conflicting attempt's orphan data dir is reclaimable
    removed = t3.vacuum(keep_last=3)
    assert len(removed["removed_dirs"]) >= 1


def test_delete_then_vacuum_is_a_takedown(spark, tmp_path):
    t = IceliteTable(str(tmp_path), "d")
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    t.write(df, stage="base", lineage_key="k")
    sid0 = t.current_snapshot()["snapshot_id"]

    bad = spark.range(10, 30).select(F.col("id").alias("k"))
    t.delete(spark, bad, "k", fingerprint="takedown1")
    left = sorted(r.k for r in t.read(spark).collect())
    assert left == [k for k in range(100) if not 10 <= k < 30]
    # still time-travelable pre-delete...
    assert t.read_snapshot(spark, sid0).count() == 100
    # ...until vacuum finalizes the takedown (old data dirs gone)
    t.vacuum(keep_last=1)
    import os as _os

    data = _os.path.join(str(tmp_path), "d", "data")
    assert len([d for d in _os.listdir(data) if d.startswith("d-")]) == 1
    assert t.read(spark).count() == 80
    assert t.stage_done("delete", "takedown1")  # idempotent resume guard


def test_model_based_op_sequence(spark, tmp_path):
    """Model-based consistency fuzz: a seeded random sequence of
    write/append/merge/delete/compact ops applied to an IceliteTable
    must match a plain python-dict model after every step."""
    import numpy as np

    rng = np.random.default_rng(42)
    t = IceliteTable(str(tmp_path), "fuzz")
    model: dict[int, int] = {}

    def mk_df(items):
        return spark.createDataFrame(
            [(int(k), int(v)) for k, v in items], "k long, v long"
        )

    # initial write
    init = {int(k): int(k * 10) for k in range(50)}
    model.update(init)
    t.write(mk_df(init.items()), stage="init", lineage_key="k")

    for step in range(8):
        op = rng.choice(["merge", "delete", "append", "compact"])
        if op == "merge":
            ks = rng.choice(200, size=rng.integers(1, 20), replace=False)
            ups = {int(k): int(step * 1000 + k) for k in ks}
            model.update(ups)
            t.merge(spark, mk_df(ups.items()), "k", fingerprint=f"m{step}")
        elif op == "delete":
            ks = [int(k) for k in rng.choice(200, size=rng.integers(1, 15), replace=False)]
            for k in ks:
                model.pop(k, None)
            t.delete(
                spark,
                spark.createDataFrame([(k,) for k in ks], "k long"),
                "k",
                fingerprint=f"d{step}",
            )
        elif op == "append":
            # append NEW keys only (append mode does not dedup)
            fresh = {
                int(k) + 1000 * (step + 1): int(step)
                for k in rng.choice(50, size=5, replace=False)
            }
            model.update(fresh)
            t.write(
                mk_df(fresh.items()), stage=f"app{step}",
                mode="append", lineage_key="k",
            )
        else:
            t.compact(spark, stage=f"c{step}")
        got = {r.k: r.v for r in t.read(spark).collect()}
        assert got == model, (step, op)


def test_wap_branch_isolation_audit_publish(spark, tmp_path):
    """Write-audit-publish: a branch write is invisible to published
    readers, the audit gates on per-row predicates in one pass, and
    publish is a fast-forward pointer swap."""
    import pytest
    from hand_index_spark.tables.icelite import ConcurrentWriteError

    t = IceliteTable(str(tmp_path), "wap")
    base = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t.write(base, stage="v1")
    staged = spark.range(10, 15).select(
        F.col("id").alias("k"), F.lit(None).cast("long").alias("v")
    )
    t.write(staged, stage="v2", mode="append", branch="audit")
    # isolation: current still sees only v1; the branch sees the union
    assert t.read(spark).count() == 10
    assert t.read_branch(spark, "audit").count() == 15
    assert t.branches() == ["audit"]
    # audit catches the staged nulls, and a pass-shaped check passes
    bad = t.audit_branch(spark, "audit", row_checks={"v_ok": "v IS NOT NULL"})
    assert not bad["pass"] and not bad["checks"]["v_ok"] and bad["rows"] == 15
    ok = t.audit_branch(spark, "audit", row_checks={"k_ok": "k >= 0"})
    assert ok["pass"]
    # publish fast-forwards current; branch pointer is dropped
    t.publish_branch("audit")
    assert t.read(spark).count() == 15
    assert t.branches() == []
    # a diverged main refuses the fast-forward (stale branch head)
    t.write(base, stage="v3", mode="append", branch="b2")
    t.write(base.limit(1), stage="v4", mode="append")  # main moves on
    with pytest.raises(ConcurrentWriteError, match="fork point"):
        t.publish_branch("b2")


def test_wap_branch_write_does_not_disturb_linear_history(spark, tmp_path):
    """Snapshot ids stay globally monotonic across refs and a plain
    main-branch write after a branch commit still lands cleanly."""
    t = IceliteTable(str(tmp_path), "wapline")
    base = spark.range(5).select(F.col("id").alias("k"))
    s0 = t.write(base, stage="v1")
    s1 = t.write(base, stage="staged", branch="x")
    s2 = t.write(base, stage="v2", mode="append")
    assert (s0["snapshot_id"], s1["snapshot_id"], s2["snapshot_id"]) == (0, 1, 2)
    assert s1["parent_id"] == 0  # branch forked from the published head
    assert s2["parent_id"] == 0  # main ignored the branch commit
    assert t.read(spark).count() == 10
