"""Persisted ANN index pipeline (VERDICT r3 item 7) + the production
dedup-hash recall gate (item 6)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from hand_index_spark.operators import ann
from hand_index_spark.pipelines.ann_index import build_ann_index, ivf_topk_indexed

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(
        (r.qid, r.vec_id, r.sim, r.rank) for r in df.collect()
    )


def test_ann_index_build_query_resume(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    root = str(tmp_path / "annidx")

    snaps = build_ann_index(spark, emb, root)
    assert set(snaps) == {"vectors", "centroids", "assignments"}

    got = _rows(ivf_topk_indexed(spark, root, F.col("vec_id") < 5, k=3, n_probe=2))
    ref = _rows(
        ann.ivf_topk(
            emb, F.col("vec_id") < 5, k=3, n_centroids=16, n_probe=2, rounds=2
        )
    )
    assert got == ref  # persisted index == in-query math, bit-for-bit

    # full resume: every stage fingerprint-matched, nothing rebuilt
    assert build_ann_index(spark, emb, root) == {}

    # crash between centroids and assignments: only the missing stage
    # re-runs, and the raw embeddings are NOT needed to recover it
    shutil.rmtree(f"{root}/assignments")
    snaps3 = build_ann_index(spark, emb, root)
    assert set(snaps3) == {"assignments"}
    assert _rows(ivf_topk_indexed(spark, root, F.col("vec_id") < 5, k=3, n_probe=2)) == got


def test_production_hash_recall_gate(spark):
    """VERDICT r3 item 6: the xxhash64 production dedup path must hold
    planted-truth recall >= 0.99 at 8-perm/4-band with >= 1000x
    candidate reduction — previously only recorded in
    scripts/recall_bench.py output, now pinned in the suite."""
    from hand_index_spark.operators.dedup import (
        capped_candidate_pairs,
        dedup_base,
        perm_params,
        rows_bands,
    )
    from hand_index_spark.tables.datagen import synth_neardup_docs

    n = 20_000
    planted = synth_neardup_docs(spark, n).localCheckpoint(eager=True)
    base = dedup_base(planted)
    truth = {(5 * f, 5 * f + 1) for f in range(n // 5)}
    cand = {
        (r.id_a, r.id_b)
        for r in capped_candidate_pairs(
            base=base,
            perms=perm_params(8),
            bands=rows_bands(8, 2),
            hash_mode="xxhash64",
        ).collect()
    }
    recall = len(cand & truth) / len(truth)
    n_reps = 2 * (n // 5)
    reduction = (n_reps * (n_reps - 1) // 2) / max(len(cand), 1)
    print(
        f"planted-truth recall={recall:.4f} candidates={len(cand)}"
        f" reduction={reduction:.0f}x"
    )
    assert recall >= 0.99
    assert reduction >= 1000


def test_incremental_add_equals_sample_trained_full_build(spark, tmp_path):
    """Sampled quantizer training + incremental growth: building on the
    first half then add_vectors(second half) must serve IDENTICAL
    results to a one-shot build whose quantizer trained on that same
    first half — the centroids are frozen, so the cell map and every
    top-k agree exactly."""
    from hand_index_spark.pipelines.ann_index import add_vectors

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    h1 = emb.filter(F.col("vec_id") < 250)
    h2 = emb.filter(F.col("vec_id") >= 250)

    ref_root = str(tmp_path / "ref")
    build_ann_index(spark, emb, ref_root, train_pred=F.col("vec_id") < 250)
    ref = _rows(ivf_topk_indexed(spark, ref_root, F.col("vec_id") < 5, k=3, n_probe=2))

    inc_root = str(tmp_path / "inc")
    build_ann_index(spark, h1, inc_root)
    snaps = add_vectors(spark, inc_root, h2, fingerprint="grow1")
    assert set(snaps) == {"vectors", "assignments"}
    got = _rows(ivf_topk_indexed(spark, inc_root, F.col("vec_id") < 5, k=3, n_probe=2))
    assert got == ref

    # idempotent: re-adding the same batch is a fingerprint no-op
    assert add_vectors(spark, inc_root, h2, fingerprint="grow1") == {}
    # and the index covers the full corpus
    from hand_index_spark.tables.icelite import IceliteTable

    assert IceliteTable(inc_root, "vectors").read(spark).count() == emb.count()


def test_pq_index_build_query_resume(spark, tmp_path):
    """PQ stages of the persisted index (round 5): served results equal
    the in-query pq_adc_topk math bit-for-bit; stages fingerprint-
    resume; a crash after codebooks recovers without the raw corpus;
    and a PQ build on top of an existing IVF build reuses the shared
    vectors stage."""
    from hand_index_spark.pipelines.ann_index import (
        build_pq_index,
        pq_adc_indexed,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    root = str(tmp_path / "pqidx")

    def rows(df):  # PQ output carries adc_dist, not sim
        return sorted((r.qid, r.vec_id, r.adc_dist, r.rank) for r in df.collect())

    snaps = build_pq_index(spark, emb, root)
    assert set(snaps) == {"vectors", "pq_codebooks", "pq_codes"}

    got = rows(pq_adc_indexed(spark, root, F.col("vec_id") < 5, k=3))
    ref = rows(ann.pq_adc_topk(emb, F.col("vec_id") < 5, k=3))
    assert got == ref  # persisted index == in-query math, bit-for-bit

    assert build_pq_index(spark, emb, root) == {}  # full resume

    shutil.rmtree(f"{root}/pq_codes")
    snaps3 = build_pq_index(spark, emb, root)
    assert set(snaps3) == {"pq_codes"}
    assert rows(pq_adc_indexed(spark, root, F.col("vec_id") < 5, k=3)) == got

    # IVF + PQ share one vectors stage in the same index root
    root2 = str(tmp_path / "both")
    build_ann_index(spark, emb, root2)
    snaps_pq = build_pq_index(spark, emb, root2)
    assert set(snaps_pq) == {"pq_codebooks", "pq_codes"}  # vectors reused
