"""Scale-safe near-duplicate detection (the 100 TB dedup path).

Pipeline shape (every stage a bucket-key equi-join or groupBy — no
cross joins anywhere, VERDICT.md round-1 items 3/8):

1. **exact-dedup pre-pass**: collapse byte-identical texts to one
   representative (min id per sha256) so a degenerate corpus (millions
   of identical docs) cannot create a quadratic LSH bucket;
2. **MinHash signatures**: explode distinct tokens -> groupBy min over
   deterministic permutations — pure Catalyst, zero Python;
3. **LSH band buckets with a hot-bucket cap**: docs sharing a band
   bucket are candidates; buckets wider than ``cap`` are split
   deterministically by ``id % ceil(n/cap)`` so the within-bucket
   self-join is bounded at cap^2 rows per split. The split loses
   cross-split candidate pairs — the standard bounded-recall trade; the
   exact-dedup pre-pass already removed the pathological identical-text
   mass, so splits only fire on genuinely hot (near-identical) buckets;
4. **exact-Jaccard verification on candidates only** (LSH-prefilter ->
   exact verify), replacing any all-pairs comparison.

The token hash is a cheap closed-form polynomial expressible in both
Spark and DuckDB SQL (the driver-oracle requirement); production would
swap xxhash64 — the banding mechanics are identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# shared token hash: h(t) = (len(t)*2654435761 + ascii(first)*65599
#                            + ascii(last)*97) % 1000003
TOKEN_HASH_SQL = (
    "((length({t}) * 2654435761 + ascii(substr({t}, 1, 1)) * 65599"
    " + ascii(substr({t}, length({t}), 1)) * 97) % 1000003)"
)

PERMS = [(1299721, 15485863), (7919, 32452843), (104729, 49979687), (224737, 67867967)]
MINHASH_P = 2038074743
BANDS = ((0, 1, 2), (1, 2, 3))  # band -> signature components
DEFAULT_BUCKET_CAP = 50


def token_hash_col(t: Column) -> Column:
    """Same hash as TOKEN_HASH_SQL; substring(t,-1,1) == substr(t,len,1)
    for non-empty tokens in both engines."""
    return (
        F.length(t) * F.lit(2654435761)
        + F.ascii(F.substring(t, 1, 1)) * F.lit(65599)
        + F.ascii(F.substring(t, -1, 1)) * F.lit(97)
    ) % F.lit(1000003)


def exact_dedup_reps(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per byte-identical text — the
    mandatory pre-pass in front of LSH pair generation."""
    reps = (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("__sha"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(reps, id_col, "left_semi")


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, mh0..mh3) — explode + groupBy min, pure Catalyst."""
    toks = docs.select(
        id_col, F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok")
    )
    h = token_hash_col(F.col("tok"))
    aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(PERMS)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def band_buckets(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band_idx, bk) — one row per band."""
    parts = []
    for bi, comps in enumerate(BANDS):
        parts.append(
            sig.select(
                id_col,
                F.lit(bi).alias("band_idx"),
                F.concat_ws("_", *[f"mh{c}" for c in comps]).alias("bk"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def salted_band_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """(id, band_idx, bk, salt) after the exact-dedup pre-pass, with
    buckets wider than ``cap`` split by ``id % ceil(n/cap)`` — the
    bounded self-join groups that candidate generation (and the
    hot-bucket tests) operate on."""
    reps = exact_dedup_reps(docs, text_col, id_col)
    banded = band_buckets(minhash_signatures(reps, text_col, id_col), id_col)
    sizes = banded.groupBy("band_idx", "bk").agg(F.count(F.lit(1)).alias("cnt"))
    return banded.join(sizes, ["band_idx", "bk"]).withColumn(
        "salt",
        F.col(id_col)
        % F.greatest(F.lit(1).cast("long"), F.expr(f"(cnt + {cap - 1}) div {cap}")),
    )


def capped_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) with the exact-dedup pre-pass
    and the hot-bucket cap wired in. All joins are bucket-key equi-joins."""
    salted = salted_band_buckets(docs, text_col, id_col, cap)
    a = salted.select(
        F.col(id_col).alias("id_a"), "band_idx", "bk", "salt"
    )
    b = salted.select(
        F.col(id_col).alias("id_b"), "band_idx", "bk", "salt"
    )
    return (
        a.join(b, ["band_idx", "bk", "salt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def min_label_components(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 25
) -> DataFrame:
    """Connected components via iterative min-label propagation — the
    distributed graph step that turns verified near-dup PAIRS into
    dedup CLUSTERS (each component labeled by its minimum node id).

    Converges in O(component diameter) rounds (each round every node
    takes the min of its own and its neighbors' labels); near-dup
    components are shallow in practice. Every round is two keyed
    shuffles; lineage is truncated per round with localCheckpoint so a
    long chain cannot accumulate a deep plan.

    ``nodes``: one column ``node``; ``edges``: columns (a, b),
    direction-agnostic (symmetrized here).
    """
    sym = edges.select(F.col("a"), F.col("b")).unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    labels = nodes.select(F.col("node"), F.col("node").alias("label"))
    for _ in range(max_iters):
        nbr = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nl"))
        )
        new_labels = (
            labels.join(nbr, labels.node == nbr.a, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"label propagation did not converge in {max_iters} rounds")


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """End-to-end near-dup clustering: LSH candidates -> exact Jaccard
    verify -> connected components. Returns (doc_id, cluster_id,
    cluster_size); singletons cluster to themselves."""
    pairs = jaccard_refine(
        docs, capped_candidate_pairs(docs, text_col, id_col, cap), text_col,
        id_col, threshold,
    )
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    nodes = docs.select(F.col(id_col).alias("node")).distinct()
    labels = min_label_components(nodes, edges)
    w = Window.partitionBy("cluster_id")
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    ).withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("long"))


def jaccard_refine(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
) -> DataFrame:
    """Exact token-set Jaccard on candidate pairs only (id-key joins)."""
    sets = docs.select(
        F.col(id_col), F.array_distinct(F.split(F.col(text_col), " ")).alias("ws")
    )
    j = (
        pairs.join(
            sets.select(F.col(id_col).alias("id_a"), F.col("ws").alias("wa")), "id_a"
        )
        .join(sets.select(F.col(id_col).alias("id_b"), F.col("ws").alias("wb")), "id_b")
        .withColumn(
            "jac",
            F.round(
                F.size(F.array_intersect("wa", "wb")).cast("double")
                / F.size(F.array_union("wa", "wb")).cast("double"),
                6,
            ),
        )
    )
    return j.filter(F.col("jac") >= F.lit(threshold)).select("id_a", "id_b", "jac")
