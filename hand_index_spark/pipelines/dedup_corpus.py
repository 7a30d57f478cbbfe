"""Corpus dedup pipeline: the icelite-staged production form of the
near-duplicate path (the training-data writeback a 100 TB crawl runs).

Where the driver queries materialize the one-scan dedup base with an
in-query localCheckpoint (operators/dedup.py), the PIPELINE form
persists each stage as an icelite table — atomic publish, per-partition
lineage, idempotent mid-job resume (the same contract as
pipelines/ingest_pages.py; north rule, BASELINE.json:6,14):

  stage "reps":       docs -> doc_reps(doc_id, rep_id, sha) — the
                      exact-dedup map (one corpus scan for sha256)
  stage "signatures": rep docs -> signatures(doc_id, mh0..mhN) — the
                      MinHash table every later stage reads; the corpus
                      explode+groupBy pass happens EXACTLY ONCE per
                      fingerprint, survives restarts, and downstream
                      re-runs (new thresholds, new band configs over
                      the same perms) never touch the raw corpus again
  stage "pairs":      signatures -> band/salt/self-join candidates ->
                      exact Jaccard verify vs docs -> dup_pairs
  stage "clusters":   pairs + doc_reps -> min-label components ->
                      clusters(doc_id, cluster_id, cluster_size)
  stage "keep":       canonical writeback — one doc per cluster (the
                      min-id representative), the row set a training
                      pipeline consumes

Scan accounting at scale: the raw corpus is read exactly twice end-to-
end — once for sha256+signatures (stages reps/signatures share one
pass shape), once for the exact-Jaccard token sets in "pairs". Every
other stage reads the small materialized tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..tables.icelite import IceliteTable


def dedup_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_root: str,
    fingerprint: str = "v1",
    threshold: float = 0.2,
    cap: int = D.DEFAULT_BUCKET_CAP,
    perms: list[tuple[int, int]] | None = None,
    bands: tuple[tuple[int, ...], ...] = D.BANDS,
    hash_mode: str = "oracle",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Run (or resume) the dedup pipeline; returns {stage: snapshot}."""
    snaps: dict[str, dict] = {}

    reps_t = IceliteTable(out_root, "doc_reps")
    if not reps_t.stage_done("reps", fingerprint):
        shas = docs.select(
            F.col(id_col), F.sha2(F.col(text_col), 256).alias("sha")
        )
        rep_min = shas.groupBy("sha").agg(F.min(id_col).alias("rep_id"))
        rm = shas.join(rep_min, "sha").select(id_col, "rep_id", "sha")
        snaps["reps"] = reps_t.write(
            rm, stage="reps", fingerprint=fingerprint, lineage_key=id_col
        )

    sig_t = IceliteTable(out_root, "signatures")
    if not sig_t.stage_done("signatures", fingerprint):
        rm = reps_t.read(spark)
        rep_docs = docs.join(
            rm.filter(F.col(id_col) == F.col("rep_id")).select(id_col),
            id_col,
            "left_semi",
        )
        sets = rep_docs.select(
            id_col,
            F.array_distinct(F.split(F.col(text_col), " ")).alias("ws"),
        )
        sig = D._signatures_from_sets(sets, id_col, perms or D.PERMS, hash_mode)
        snaps["signatures"] = sig_t.write(
            sig, stage="signatures", fingerprint=fingerprint, lineage_key=id_col
        )

    pairs_t = IceliteTable(out_root, "dup_pairs")
    if not pairs_t.stage_done("pairs", fingerprint):
        sig = sig_t.read(spark)
        salted = D.salted_buckets_from_sig(sig, id_col, cap, bands)
        cand = D.pairs_from_salted(salted, id_col)
        pairs = D.jaccard_refine(docs, cand, text_col, id_col, threshold)
        snaps["pairs"] = pairs_t.write(
            pairs, stage="pairs", fingerprint=fingerprint, lineage_key="id_a"
        )

    clus_t = IceliteTable(out_root, "clusters")
    if not clus_t.stage_done("clusters", fingerprint):
        rm = reps_t.read(spark)
        pairs = pairs_t.read(spark)
        edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        nodes = rm.select(F.col("rep_id").alias("node")).distinct()
        labels = D.min_label_components(nodes, edges)
        doc_labels = rm.join(labels, rm.rep_id == labels.node).select(
            F.col(id_col), F.col("label").alias("cluster_id")
        )
        from pyspark.sql import Window

        w = Window.partitionBy("cluster_id")
        clusters = doc_labels.withColumn(
            "cluster_size", F.count(F.lit(1)).over(w).cast("long")
        )
        snaps["clusters"] = clus_t.write(
            clusters,
            stage="clusters",
            fingerprint=fingerprint,
            lineage_key="cluster_id",
        )

    keep_t = IceliteTable(out_root, "corpus_dedup")
    if not keep_t.stage_done("keep", fingerprint):
        clusters = clus_t.read(spark)
        keep_ids = clusters.filter(
            F.col(id_col) == F.col("cluster_id")
        ).select(id_col)
        kept = docs.join(keep_ids, id_col, "left_semi")
        snaps["keep"] = keep_t.write(
            kept, stage="keep", fingerprint=fingerprint, lineage_key=id_col
        )
    return snaps
