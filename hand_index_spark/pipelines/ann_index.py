"""Persisted ANN index pipeline (VERDICT r3 item 7): the icelite-staged
production form of IVF search, mirroring pipelines/dedup_corpus.py.

``operators.ann.ivf_topk`` re-runs the Lloyd quantizer and re-normalizes
the corpus on every query — right for a one-shot driver query, wrong
for a serving path at 10^9+ vectors. The pipeline persists each stage
as an icelite table (atomic publish, per-partition lineage, idempotent
fingerprint resume — same contract as the dedup/ingest pipelines):

  stage "vectors":     embeddings -> vectors(vec_id, e, norm) — the
                       normalized corpus, computed once
  stage "centroids":   k-means output (cid, ce, cn) after the fixed
                       deterministic Lloyd rounds — the coarse quantizer
  stage "assignments": (vec_id, cell) nearest-centroid inverted lists

Queries (:func:`ivf_topk_indexed`) read the three tables and do ONLY
probe + re-rank: the corpus is never re-scanned, the quantizer never
re-trained. Scan accounting at scale: raw embeddings are read exactly
once (stage "vectors"); every Lloyd round and every query reads the
materialized tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ann as A
from ..tables.icelite import IceliteTable


def build_ann_index(
    spark: SparkSession,
    emb: DataFrame,
    out_root: str,
    fingerprint: str = "v1",
    n_centroids: int = 16,
    rounds: int = 2,
    train_pred=None,
) -> dict:
    """Run (or resume) the index build; returns {stage: snapshot}.
    Completed stages are fingerprint-matched and skipped, so a mid-build
    crash resumes without re-reading the raw embeddings.

    ``train_pred``: optional Column predicate selecting the quantizer
    TRAINING subset — at 10^9+ vectors k-means runs on a sample while
    the assignment pass covers everything (the standard IVF build).
    With it, Lloyd iterates over the subset only (init: its lowest
    ``n_centroids`` vec_ids); without it the full default is unchanged
    (init ``vec_id < n_centroids``, the frozen oracle behavior)."""
    snaps: dict[str, dict] = {}

    vec_t = IceliteTable(out_root, "vectors")
    if not vec_t.stage_done("vectors", fingerprint):
        base = A.with_vectors(emb).select("vec_id", "e", "norm")
        snaps["vectors"] = vec_t.write(
            base, stage="vectors", fingerprint=fingerprint, lineage_key="vec_id"
        )

    cent_t = IceliteTable(out_root, "centroids")
    if not cent_t.stage_done("centroids", fingerprint):
        base = vec_t.read(spark)
        if train_pred is not None:
            train = base.filter(train_pred).localCheckpoint(eager=True)
            init = train.orderBy("vec_id").limit(n_centroids)
        else:
            train = base
            init = base.filter(F.col("vec_id") < n_centroids)
        cents = init.select(
            F.col("vec_id").alias("cid"),
            F.col("e").alias("ce"),
            F.col("norm").alias("cn"),
        )
        for _ in range(rounds):
            cents = A._lloyd_update(train, cents)
        snaps["centroids"] = cent_t.write(
            cents, stage="centroids", fingerprint=fingerprint, lineage_key="cid"
        )

    asg_t = IceliteTable(out_root, "assignments")
    if not asg_t.stage_done("assignments", fingerprint):
        base = vec_t.read(spark)
        cents = cent_t.read(spark)
        cells = (
            A._rank_cells(base, cents)
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cid").alias("cell"))
        )
        snaps["assignments"] = asg_t.write(
            cells, stage="assignments", fingerprint=fingerprint, lineage_key="cell"
        )
    return snaps


def add_vectors(
    spark: SparkSession,
    out_root: str,
    new_emb: DataFrame,
    fingerprint: str,
) -> dict:
    """Grow the PERSISTED index without retraining: normalize the new
    vectors, assign them against the frozen centroids, and row-level
    MERGE both tables (re-added vec_ids upsert — the copy-on-write
    contract of icelite.merge, time-travelable). The quantizer is
    untouched, so serving continues against a consistent cell map; a
    production deployment retrains/rebuilds when drift accumulates, as
    IVF systems do."""
    vec_t = IceliteTable(out_root, "vectors")
    cent_t = IceliteTable(out_root, "centroids")
    asg_t = IceliteTable(out_root, "assignments")
    snaps: dict[str, dict] = {}
    if not vec_t.stage_done("add-vectors", fingerprint):
        base_new = A.with_vectors(new_emb).select("vec_id", "e", "norm")
        base_new = base_new.localCheckpoint(eager=True)
        snaps["vectors"] = vec_t.merge(
            spark, base_new, "vec_id", stage="add-vectors", fingerprint=fingerprint
        )
    if not asg_t.stage_done("add-assign", fingerprint):
        # re-read the committed new rows (resume-safe: the merge above
        # may have landed in a previous crashed attempt)
        base_new = vec_t.read(spark).join(
            new_emb.select("vec_id"), "vec_id", "left_semi"
        )
        cents = cent_t.read(spark)
        cells_new = (
            A._rank_cells(base_new, cents)
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cid").alias("cell"))
        )
        snaps["assignments"] = asg_t.merge(
            spark, cells_new, "vec_id", stage="add-assign", fingerprint=fingerprint
        )
    return snaps


def ivf_topk_indexed(
    spark: SparkSession,
    out_root: str,
    query_pred: Column,
    k: int = 3,
    n_probe: int = 2,
) -> DataFrame:
    """IVF search against the PERSISTED index: probe the query rows'
    ``n_probe`` nearest cells, equi-join the inverted lists, exact
    re-rank. Bit-compatible with operators.ann.ivf_topk run at the same
    (n_centroids, rounds) — the driver oracle is shared verbatim."""
    base = IceliteTable(out_root, "vectors").read(spark)
    cents = IceliteTable(out_root, "centroids").read(spark)
    cells = IceliteTable(out_root, "assignments").read(spark)
    probes = (
        A._rank_cells(base.filter(query_pred), cents)
        .filter(F.col("rn") <= n_probe)
        .select(F.col("vec_id").alias("qid"), F.col("cid").alias("pcell"))
    )
    cand = (
        probes.join(cells, F.col("pcell") == F.col("cell"))
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id")
        .distinct()
    )
    return A.exact_rerank(base, cand, query_pred, k)


# ------------------------------------------------------------------ PQ
# Round 5: the PQ stages of the persisted index — codebooks + one-byte
# codes land in icelite exactly like the IVF stages, so the 32x-smaller
# code table is what queries scan (the raw vector table is only touched
# for the query rows themselves). Same resume/lineage contract.


def build_pq_index(
    spark: SparkSession,
    emb: DataFrame,
    out_root: str,
    fingerprint: str = "v1",
    m: int = A.PQ_M,
    ncode: int = A.PQ_K,
    rounds: int = A.PQ_ROUNDS,
    dim: int = 64,
) -> dict:
    """Run (or resume) the PQ index build: the shared "vectors" stage
    (skipped if an IVF build already committed it), then
    "pq_codebooks" (sub, cid, cv) via the joint quantized Lloyd and
    "pq_codes" (vec_id, sub, code) — the compressed corpus."""
    snaps: dict[str, dict] = {}
    vec_t = IceliteTable(out_root, "vectors")
    if not vec_t.stage_done("vectors", fingerprint):
        base = A.with_vectors(emb).select("vec_id", "e", "norm")
        snaps["vectors"] = vec_t.write(
            base, stage="vectors", fingerprint=fingerprint, lineage_key="vec_id"
        )

    cb_t = IceliteTable(out_root, "pq_codebooks")
    if not cb_t.stage_done("pq_codebooks", fingerprint):
        subs = A._pq_subvectors(
            vec_t.read(spark), m, dim
        ).localCheckpoint(eager=True)
        cents = subs.filter(F.col("vec_id") < ncode).select(
            "sub", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
        )
        for _ in range(rounds):
            cents = A._pq_lloyd(subs, cents)
        snaps["pq_codebooks"] = cb_t.write(
            cents, stage="pq_codebooks", fingerprint=fingerprint, lineage_key="sub"
        )

    code_t = IceliteTable(out_root, "pq_codes")
    if not code_t.stage_done("pq_codes", fingerprint):
        subs = A._pq_subvectors(vec_t.read(spark), m, dim)
        cents = cb_t.read(spark)
        codes = (
            A._pq_assign(subs, cents)
            .filter(F.col("rn") == 1)
            .select("vec_id", "sub", F.col("cid").alias("code"))
        )
        snaps["pq_codes"] = code_t.write(
            codes, stage="pq_codes", fingerprint=fingerprint, lineage_key="vec_id"
        )
    return snaps


def pq_adc_indexed(
    spark: SparkSession,
    out_root: str,
    query_pred: Column,
    k: int = 3,
    m: int = A.PQ_M,
    dim: int = 64,
) -> DataFrame:
    """ADC search against the PERSISTED PQ index: query subvectors come
    from the vectors table (query rows only), distances from the code
    table + codebooks — the raw corpus is never re-scanned and the
    quantizer never re-trained. Bit-compatible with
    operators.ann.pq_adc_topk at the same (m, ncode, rounds): the
    driver oracle is shared verbatim."""
    base = IceliteTable(out_root, "vectors").read(spark)
    cents = IceliteTable(out_root, "pq_codebooks").read(spark)
    codes = IceliteTable(out_root, "pq_codes").read(spark)
    qsubs = A._pq_subvectors(base.filter(query_pred), m, dim).select(
        F.col("vec_id").alias("qid"), "sub", F.col("sv").alias("qv")
    )
    lut = qsubs.join(F.broadcast(cents), "sub").select(
        "qid", "sub", "cid", A._pq_l2(F.col("qv"), F.col("cv")).alias("d")
    )
    from pyspark.sql import Window

    pair_d = (
        codes.withColumnRenamed("sub", "csub")
        .join(lut, (F.col("csub") == lut.sub) & (F.col("code") == lut.cid))
        .filter(F.col("qid") != F.col("vec_id"))
        .groupBy("qid", "vec_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("sub", "d"))),
                F.lit(0.0),
                lambda acc, x: acc + x["d"],
            ).alias("adc")
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("vec_id"))
    return (
        pair_d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "vec_id",
            F.round("adc", 6).alias("adc_dist"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
