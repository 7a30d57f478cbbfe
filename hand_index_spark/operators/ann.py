"""Approximate nearest neighbor over embedding columns — the scale path.

Random-hyperplane LSH with **banded tables + multi-probe** (VERDICT.md
round-1 item 4: 4 planes / 16 buckets shrank candidates only 16x):

- ``n_tables`` independent hash tables, each with ``n_planes``
  sign-of-dot-product bits (total planes = n_tables * n_planes >= 16);
- a query probes, per table, its own bucket plus every 1-bit flip
  (multi-probe) — candidates = union over tables/probes of same-bucket
  rows, a bucket-key equi-join, never a cross join;
- exact cosine re-rank within the candidate set (LSH-prefilter ->
  exact verify).

Candidate volume per query ~= n_tables * (1 + n_planes) * N / 2^n_planes:
at the driver's sf0.01 scale (N=500) the defaults (2x8 planes) keep
top-k populated; at 10^12 rows the same operator runs with 4x16 planes
-> ~1000x candidate reduction (measured in tests/test_dedup_ann.py).

Hyperplane components are the deterministic closed form
``((p*37 + i*101) % 19) - 9`` so the DuckDB oracle evaluates the
identical arithmetic (entry_queries_ext builds the SQL twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_TABLES = 2
N_PLANES = 8  # per table; total = 16
PROBE_FLIPS = 1  # multi-probe depth in bit flips


# Pseudo-random hyperplane components via an integer hash QUADRATIC in
# the component index (exact in int64, identical in Spark and DuckDB).
# A hash linear in i is an arithmetic progression mod PM — structured
# inputs then produce massively colliding sign patterns (measured: 200
# clusters -> ~50 distinct 16-bit buckets). The quadratic term breaks
# the progression; the (i+1)(p+1) cross term decorrelates planes.
_PA, _PB, _PC, _PM = 2654435761, 2246822519, 3266489917, 2039


def plane_term(p: int):
    """zip-index lambda: component i of hyperplane p, values in
    [-(PM-1)/2, (PM-1)/2]."""

    def fn(x, i):
        h = (
            (i + 1) * F.lit((p + 1) * _PA)
            + (i + 1) * (i + 2) * F.lit(_PB)
            + F.lit((p + 1) * _PC)
        ) % F.lit(_PM)
        return x * (h.cast("double") - F.lit(float((_PM - 1) // 2)))

    return fn


def plane_component_sql(p: int, i: str) -> str:
    return (
        f"(CAST(((({i} + 1) * {(p + 1) * _PA} + ({i} + 1) * ({i} + 2) * {_PB}"
        f" + {(p + 1) * _PC}) % {_PM}) AS DOUBLE) - {float((_PM - 1) // 2)!r})"
    )


def probe_flip_masks(n_planes: int, probe_flips: int) -> list[int]:
    """Multi-probe bucket-XOR masks: the exact bucket, every 1-bit flip,
    and (depth >= 2) every 2-bit flip."""
    flips = [0]
    if probe_flips >= 1:
        flips += [1 << j for j in range(n_planes)]
    if probe_flips >= 2:
        flips += [
            (1 << a) | (1 << b)
            for a in range(n_planes)
            for b in range(a + 1, n_planes)
        ]
    return flips


def bucket_cols_sql(n_tables: int = N_TABLES, n_planes: int = N_PLANES) -> list[str]:
    """DuckDB column exprs ``b0..b{T-1}`` over an ``e`` array column —
    the single source of truth for every ANN oracle (ann_lsh_topk and
    cosine_dup_pairs must never drift from the engine or each other)."""
    cols = []
    for t in range(n_tables):
        bits = " + ".join(
            "(CASE WHEN list_sum(list_transform(range(1, len(e) + 1), "
            f"i -> e[i] * {plane_component_sql(t * n_planes + j, '(i - 1)')})) >= 0.0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(n_planes)
        )
        cols.append(f"CAST({bits} AS BIGINT) AS b{t}")
    return cols


def candidates_sql(
    query_where: str,
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
    probe_flips: int = PROBE_FLIPS,
) -> str:
    """DuckDB UNION of per-table multi-probe candidate selects over a
    CTE ``e(vec_id, e, norm, b0..)``; mirrors :func:`candidates`."""
    flips = ", ".join(str(f) for f in probe_flip_masks(n_planes, probe_flips))
    parts = []
    for t in range(n_tables):
        parts.append(
            f"""SELECT p.qid, c.vec_id
            FROM (SELECT q.vec_id AS qid, xor(q.b{t}, fl.flip) AS pb
                  FROM e q, (SELECT unnest([{flips}]) AS flip) fl
                  {query_where}) p
            JOIN e c ON c.b{t} = p.pb AND c.vec_id != p.qid"""
        )
    return " UNION ".join(parts)  # UNION dedups (the Spark .distinct())


def bucket_col(e: Column, table: int, n_planes: int = N_PLANES) -> Column:
    """Sign-bit bucket of embedding array ``e`` in hash table ``table``."""
    bucket = None
    for j in range(n_planes):
        p = table * n_planes + j
        dot = F.aggregate(
            F.transform(e, plane_term(p)), F.lit(0.0), lambda a, x: a + x
        )
        bit = F.when(dot >= 0.0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def with_vectors(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """Normalize: e as array<double> + L2 norm."""
    dbl = F.transform(F.col(col), lambda x: x.cast("double"))
    return emb.withColumn("e", dbl).withColumn(
        "norm", F.sqrt(F.aggregate(F.col("e"), F.lit(0.0), lambda a, x: a + x * x))
    )


def exact_cosine(base: DataFrame, cand: DataFrame, query_pred: Column) -> DataFrame:
    """Score candidate pairs (qid, vec_id) with the exact cosine from
    ``base``'s e/norm columns — the shared verify stage of every ANN
    variant (banded LSH, IVF, threshold dedup)."""
    qv = base.filter(query_pred).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("norm").alias("qn")
    )
    cv = base.select("vec_id", F.col("e").alias("ce"), F.col("norm").alias("cn"))
    dot = F.aggregate(
        F.zip_with("qe", "ce", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return cand.join(qv, "qid").join(cv, "vec_id").withColumn(
        "cos", dot / (F.col("qn") * F.col("cn"))
    )


def exact_rerank(
    base: DataFrame, cand: DataFrame, query_pred: Column, k: int
) -> DataFrame:
    """Top-k exact-cosine re-rank of candidates with the oracle's
    ORDER BY cos DESC, vec_id tie-break."""
    sims = exact_cosine(base, cand, query_pred)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "vec_id",
            F.round("cos", 6).alias("sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# mean-update quantization: centroid components are integer sums of
# floor(e*Q + 0.5) divided by Q*count. Integer group sums are exact and
# ORDER-FREE, so the centroids — and therefore the oracle hash — do not
# depend on Spark's nondeterministic float-sum partition order.
KMEANS_Q = 1024.0


def _rank_cells(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Per-vector centroid ranking: broadcast the tiny centroid set
    (map-side, no shuffle) + one per-vector window."""
    dot = F.aggregate(
        F.zip_with("e", "ce", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    ac = base.crossJoin(F.broadcast(cents)).withColumn(
        "ccos", dot / (F.col("norm") * F.col("cn"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cid"))
    return ac.withColumn("rn", F.row_number().over(w))


def _lloyd_update(base: DataFrame, cents: DataFrame) -> DataFrame:
    """One Lloyd round: assign every vector to its nearest centroid
    (max cosine, min-cid tie-break), recompute each cell's centroid as
    the quantized component mean; empty cells keep their old centroid
    (mirrored by the oracle's LEFT JOIN + coalesce)."""
    assigned = (
        _rank_cells(base, cents)
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cell"))
    )
    mem = base.join(assigned, "vec_id").select("cell", "e")
    pe = mem.select("cell", F.posexplode("e").alias("pos", "val"))
    sums = pe.groupBy("cell", "pos").agg(
        F.sum(
            F.floor(F.col("val") * F.lit(KMEANS_Q) + F.lit(0.5)).cast("long")
        ).alias("s"),
        F.count(F.lit(1)).alias("cnt"),
    )
    newc = sums.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s", "cnt"))),
            lambda x: x["s"].cast("double") / (F.lit(KMEANS_Q) * x["cnt"]),
        ).alias("nce")
    )
    out = (
        cents.join(newc, cents.cid == newc.cell, "left")
        .withColumn("ce2", F.coalesce(F.col("nce"), F.col("ce")))
        .select(
            "cid",
            F.col("ce2").alias("ce"),
            F.sqrt(
                F.aggregate(F.col("ce2"), F.lit(0.0), lambda a, x: a + x * x)
            ).alias("cn"),
        )
    )
    # materialize each round's centroids: 16 tiny rows, and without it
    # every later stage would re-run the whole preceding round chain
    return out.localCheckpoint(eager=True)


def ivf_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 2,
    rounds: int = 2,
) -> DataFrame:
    """IVF-style ANN: coarse quantizer -> probe top cells -> exact
    re-rank (the brief's "IVF variant as the scale path").

    The coarse quantizer is real k-means: deterministic closed-form
    init (first ``n_centroids`` vectors) + ``rounds`` Lloyd iterations
    with quantized mean updates (VERDICT r2 item 7 — replaces the
    first-N stand-in; measured better cell balance in
    tests/test_dedup_ann.py). Fixed iteration count keeps the oracle
    expressible as one nested-CTE-per-round SQL (ivf_oracle_sql).
    Cell assignment broadcasts the tiny centroid set against every
    vector (map-side, no shuffle) + one groupBy-key window; queries
    probe their ``n_probe`` nearest cells and re-rank exactly within
    them.
    """
    # materialize the normalized vectors once: every Lloyd round, the
    # final ranking AND the re-rank all consume base — without this each
    # eager round job re-reads the source and re-derives e/norm
    base = with_vectors(emb).localCheckpoint(eager=True)
    cents = base.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce"), F.col("norm").alias("cn")
    )
    for _ in range(rounds):
        cents = _lloyd_update(base, cents)
    ranked = _rank_cells(base, cents)
    cells = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("cvid"), F.col("cid").alias("cell")
    )
    probes = (
        ranked.filter(query_pred & (F.col("rn") <= n_probe))
        .select(F.col("vec_id").alias("qid"), F.col("cid").alias("pcell"))
    )
    cand = (
        probes.join(cells, F.col("pcell") == F.col("cell"))
        .filter(F.col("qid") != F.col("cvid"))
        .select("qid", F.col("cvid").alias("vec_id"))
        .distinct()
    )
    return exact_rerank(base, cand, query_pred, k)


def ivf_oracle_sql(
    query_where: str,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 2,
    rounds: int = 2,
    dim: int = 64,
    cand_filter_sql: str | None = None,
) -> str:
    """DuckDB twin of :func:`ivf_topk` — one CTE chain per Lloyd round
    (a{r} assignment, m{r} quantized component sums, c{r+1} centroids
    with empty-cell carry), then probes/candidates/re-rank. The single
    source of truth for the ann_ivf_topk oracle."""
    rank_sql = (
        "SELECT vec_id, cid, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM ("
        "SELECT v.vec_id, c.cid, list_sum(list_transform(range(1, {d} + 1), "
        "i -> v.e[i] * c.ce[i])) / (v.norm * c.cn) AS ccos FROM e v, c{r} c)"
    )
    ctes = [
        "e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        " AS e FROM embeddings)",
        "e AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x)))"
        " AS norm FROM e0)",
        f"c0 AS (SELECT vec_id AS cid, e AS ce, norm AS cn FROM e"
        f" WHERE vec_id < {n_centroids})",
    ]
    q = f"{KMEANS_Q!r}"
    for r in range(rounds):
        ctes.append(f"a{r} AS ({rank_sql.format(d=dim, r=r)})")
        ctes.append(
            f"m{r} AS (SELECT a.cid AS cell, t.i AS pos,"
            f" sum(CAST(floor(v.e[t.i] * {q} + 0.5) AS BIGINT)) AS s,"
            f" count(*) AS cnt"
            f" FROM (SELECT vec_id, cid FROM a{r} WHERE rn = 1) a"
            f" JOIN e v ON v.vec_id = a.vec_id"
            f" CROSS JOIN range(1, {dim} + 1) t(i)"
            f" GROUP BY a.cid, t.i)"
        )
        ctes.append(
            f"n{r} AS (SELECT cell AS cid,"
            f" list(CAST(s AS DOUBLE) / ({q} * cnt) ORDER BY pos) AS ce"
            f" FROM m{r} GROUP BY cell)"
        )
        ctes.append(
            f"c{r + 1} AS (SELECT o.cid, coalesce(n.ce, o.ce) AS ce,"
            f" sqrt(list_sum(list_transform(coalesce(n.ce, o.ce), x -> x * x)))"
            f" AS cn FROM c{r} o LEFT JOIN n{r} n ON n.cid = o.cid)"
        )
    ctes.append(f"ranked AS ({rank_sql.format(d=dim, r=rounds)})")
    ctes.append("cells AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1)")
    ctes.append(
        f"probes AS (SELECT vec_id AS qid, cid AS pcell FROM ranked"
        f" WHERE {query_where} AND rn <= {n_probe})"
    )
    extra = f" {cand_filter_sql}" if cand_filter_sql else ""
    ctes.append(
        "cand AS (SELECT DISTINCT p.qid, l.vec_id FROM probes p"
        " JOIN cells l ON l.cell = p.pcell AND l.vec_id != p.qid"
        + extra + ")"
    )
    ctes.append(
        f"sims AS (SELECT cand.qid, cand.vec_id,"
        f" list_sum(list_transform(range(1, {dim} + 1),"
        f" i -> q.e[i] * v.e[i])) / (q.norm * v.norm) AS cos"
        f" FROM cand JOIN e q ON q.vec_id = cand.qid"
        f" JOIN e v ON v.vec_id = cand.vec_id)"
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT qid, vec_id, round(cos, 6) AS sim, CAST(rank AS BIGINT) AS rank FROM (
        SELECT qid, vec_id, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
        FROM sims
    ) WHERE rank <= {k}
    """
    )


def candidates(
    base: DataFrame,
    query_pred: Column,
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
    probe_flips: int = PROBE_FLIPS,
) -> DataFrame:
    """Distinct (qid, vec_id) candidate pairs from banded multi-probe
    bucket joins. ``base`` must already carry e/norm/b{t} columns."""
    q = base.filter(query_pred).select(
        F.col("vec_id").alias("qid"),
        *[F.col(f"b{t}").alias(f"qb{t}") for t in range(n_tables)],
    )
    flips = probe_flip_masks(n_planes, probe_flips)
    cand = None
    for t in range(n_tables):
        probes = q.select(
            "qid",
            F.explode(
                F.array(*[F.col(f"qb{t}").bitwiseXOR(F.lit(f)) for f in flips])
            ).alias("pb"),
        )
        c = base.select("vec_id", F.col(f"b{t}").alias("pb"))
        hits = probes.join(c, "pb").filter(F.col("qid") != F.col("vec_id")).select(
            "qid", "vec_id"
        )
        cand = hits if cand is None else cand.unionByName(hits)
    return cand.distinct()


def with_buckets(emb: DataFrame, n_tables: int = N_TABLES, n_planes: int = N_PLANES) -> DataFrame:
    base = with_vectors(emb)
    for t in range(n_tables):
        base = base.withColumn(f"b{t}", bucket_col(F.col("e"), t, n_planes))
    return base


def ann_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
    probe_flips: int = PROBE_FLIPS,
) -> DataFrame:
    """(qid, vec_id, sim, rank) — top-k cosine among LSH candidates.

    ``emb`` needs (vec_id, embedding array<float/double>); queries are
    the rows matching ``query_pred``.
    """
    base = with_buckets(emb, n_tables, n_planes)
    cand = candidates(base, query_pred, n_tables, n_planes, probe_flips)
    return exact_rerank(base, cand, query_pred, k)


# ------------------------------------------------------------------ PQ
# Product quantization (round 5): THE standard memory path for ANN at
# 10^12 vectors — each 64-dim float vector compresses to PQ_M one-byte
# codes (here 8 codes -> 32x smaller than float32), and queries rank
# candidates from a per-query lookup table WITHOUT touching the raw
# vectors (asymmetric distance computation, ADC). Training runs the
# same quantized-Lloyd construction as the IVF coarse quantizer, but
# JOINTLY across all subspaces in one pipeline: codebooks are keyed by
# (sub, cid), so 2 Lloyd rounds train all PQ_M codebooks in 2 passes,
# not 2*PQ_M.

PQ_M = 8        # subspaces (64-dim -> 8-dim subvectors)
PQ_K = 16       # codewords per subspace
PQ_ROUNDS = 2


def _pq_subvectors(base: DataFrame, m: int, dim: int) -> DataFrame:
    d = dim // m
    return base.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice("e", s * d + 1, d),
            )
        ).alias("sub", "sv"),
    )


def _pq_l2(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_assign(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest codeword per (vec_id, sub): broadcast the tiny codebook
    (m*K rows), rank by L2 asc with min-cid tie-break."""
    j = subs.join(F.broadcast(cents), "sub").withColumn(
        "l2", _pq_l2(F.col("sv"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(F.col("l2").asc(), F.col("cid"))
    return j.withColumn("rn", F.row_number().over(w))


def _pq_lloyd(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """One joint Lloyd round over every (sub, cid) codebook cell:
    quantized component means, empty cells carry their old codeword."""
    a = _pq_assign(subs, cents).filter(F.col("rn") == 1).select(
        "vec_id", "sub", F.col("cid").alias("cell")
    )
    mem = subs.join(a, ["vec_id", "sub"]).select("sub", "cell", "sv")
    pe = mem.select("sub", "cell", F.posexplode("sv").alias("pos", "val"))
    sums = pe.groupBy("sub", "cell", "pos").agg(
        F.sum(
            F.floor(F.col("val") * F.lit(KMEANS_Q) + F.lit(0.5)).cast("long")
        ).alias("s"),
        F.count(F.lit(1)).alias("cnt"),
    )
    newc = sums.groupBy("sub", "cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s", "cnt"))),
            lambda x: x["s"].cast("double") / (F.lit(KMEANS_Q) * x["cnt"]),
        ).alias("ncv")
    )
    out = (
        cents.join(
            newc,
            (cents.sub == newc.sub) & (cents.cid == newc.cell),
            "left",
        )
        .select(
            cents.sub.alias("sub"),
            "cid",
            F.coalesce(F.col("ncv"), F.col("cv")).alias("cv"),
        )
    )
    return out.localCheckpoint(eager=True)  # m*K tiny rows per round


def pq_adc_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    m: int = PQ_M,
    ncode: int = PQ_K,
    rounds: int = PQ_ROUNDS,
    dim: int = 64,
) -> DataFrame:
    """PQ-compressed ANN: train codebooks (joint quantized Lloyd),
    encode every vector to ``m`` codes, answer queries by ADC — the
    per-query (sub, code) -> L2 lookup table summed over the m codes in
    FIXED sub order (bit-reproducible), never touching raw vectors at
    query time. Returns (qid, vec_id, adc_dist rounded 6dp, rank<=k).
    """
    base = with_vectors(emb).localCheckpoint(eager=True)
    subs = _pq_subvectors(base, m, dim).localCheckpoint(eager=True)
    cents = subs.filter(F.col("vec_id") < ncode).select(
        "sub", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    for _ in range(rounds):
        cents = _pq_lloyd(subs, cents)
    codes = _pq_assign(subs, cents).filter(F.col("rn") == 1).select(
        "vec_id", "sub", F.col("cid").alias("code")
    )
    qsubs = subs.join(
        base.filter(query_pred).select("vec_id"), "vec_id"
    ).select(F.col("vec_id").alias("qid"), "sub", F.col("sv").alias("qv"))
    lut = qsubs.join(F.broadcast(cents), "sub").select(
        "qid", "sub", "cid", _pq_l2(F.col("qv"), F.col("cv")).alias("d")
    )
    pair_d = (
        codes.withColumnRenamed("sub", "csub")
        .join(
            lut,
            (F.col("csub") == lut.sub) & (F.col("code") == lut.cid),
        )
        .filter(F.col("qid") != F.col("vec_id"))
        .groupBy("qid", "vec_id")
        .agg(
            # fixed-order fold over subs: groupBy float sums are
            # partition-order-dependent; the sorted fold is not
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


def pq_oracle_sql(
    query_where: str,
    k: int = 3,
    m: int = PQ_M,
    ncode: int = PQ_K,
    rounds: int = PQ_ROUNDS,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`pq_adc_topk` — identical arithmetic and
    tie-breaks; one CTE pair per joint Lloyd round."""
    d = dim // m
    l2 = (
        "list_sum(list_transform(range(1, {d} + 1),"
        " i -> (a.sv[i] - c.cv[i]) * (a.sv[i] - c.cv[i])))"
    ).format(d=d)
    assign = (
        "SELECT vec_id, sub, cid, row_number() OVER"
        " (PARTITION BY vec_id, sub ORDER BY l2 ASC, cid) AS rn FROM ("
        "SELECT a.vec_id, a.sub, c.cid, " + l2 + " AS l2"
        " FROM subs a JOIN k{r} c ON c.sub = a.sub)"
    )
    q = f"{KMEANS_Q!r}"
    ctes = [
        "e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        " AS e FROM embeddings)",
        f"subs AS (SELECT vec_id, CAST(t.s AS BIGINT) AS sub,"
        f" e[t.s * {d} + 1 : t.s * {d} + {d}] AS sv"
        f" FROM e0 CROSS JOIN range(0, {m}) t(s))",
        f"k0 AS (SELECT sub, vec_id AS cid, sv AS cv FROM subs"
        f" WHERE vec_id < {ncode})",
    ]
    for r in range(rounds):
        ctes.append(f"a{r} AS ({assign.format(r=r)})")
        ctes.append(
            f"m{r} AS (SELECT a.sub, a.cid AS cell, t.i AS pos,"
            f" sum(CAST(floor(v.sv[t.i] * {q} + 0.5) AS BIGINT)) AS s,"
            f" count(*) AS cnt"
            f" FROM (SELECT vec_id, sub, cid FROM a{r} WHERE rn = 1) a"
            f" JOIN subs v ON v.vec_id = a.vec_id AND v.sub = a.sub"
            f" CROSS JOIN range(1, {d} + 1) t(i)"
            f" GROUP BY a.sub, a.cid, t.i)"
        )
        ctes.append(
            f"n{r} AS (SELECT sub, cell AS cid,"
            f" list(CAST(s AS DOUBLE) / ({q} * cnt) ORDER BY pos) AS cv"
            f" FROM m{r} GROUP BY sub, cell)"
        )
        ctes.append(
            f"k{r + 1} AS (SELECT o.sub, o.cid, coalesce(n.cv, o.cv) AS cv"
            f" FROM k{r} o LEFT JOIN n{r} n"
            f" ON n.sub = o.sub AND n.cid = o.cid)"
        )
    ctes.append(f"af AS ({assign.format(r=rounds)})")
    ctes.append(
        "codes AS (SELECT vec_id, sub, cid AS code FROM af WHERE rn = 1)"
    )
    ctes.append(
        f"qsubs AS (SELECT vec_id AS qid, sub, sv AS qv FROM subs"
        f" WHERE {query_where})"
    )
    ctes.append(
        f"lut AS (SELECT a.qid, a.sub, c.cid,"
        f" list_sum(list_transform(range(1, {d} + 1),"
        f" i -> (a.qv[i] - c.cv[i]) * (a.qv[i] - c.cv[i]))) AS dd"
        f" FROM qsubs a JOIN k{rounds} c ON c.sub = a.sub)"
    )
    ctes.append(
        "pair AS (SELECT l.qid, cd.vec_id,"
        " list_sum(list(l.dd ORDER BY l.sub)) AS adc"
        " FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.cid = cd.code"
        " WHERE l.qid != cd.vec_id GROUP BY l.qid, cd.vec_id)"
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT qid, vec_id, round(adc, 6) AS adc_dist, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT qid, vec_id, adc,
               row_number() OVER (PARTITION BY qid ORDER BY adc ASC, vec_id)
                   AS rank
        FROM pair
    ) WHERE rank <= {k}
    """
    )


def pq_topk_rerank(
    emb: DataFrame,
    query_pred: Column,
    k: int = 10,
    shortlist: int = 100,
    m: int = PQ_M,
    ncode: int = PQ_K,
    rounds: int = PQ_ROUNDS,
    dim: int = 64,
) -> DataFrame:
    """The deployed PQ shape: ADC produces a ``shortlist`` per query
    from codes alone (32x less data touched), then ONLY the shortlist's
    raw vectors are fetched for an exact L2 re-rank. Measured on the
    sf0.01 fixture (near-random synthetic embeddings — a hard case for
    PQ): top-10-in-shortlist recall 0.82 at shortlist=100/ncode=16
    (tests/test_dedup_ann.py pins >= 0.7). At 10^12 rows the shortlist
    join is an equi-join on vec_id against the inverted ADC ranking —
    never a scan of the raw vector table."""
    cand = pq_adc_topk(
        emb, query_pred, k=shortlist, m=m, ncode=ncode, rounds=rounds, dim=dim
    ).select("qid", "vec_id")
    base = with_vectors(emb)
    q = base.filter(query_pred).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    pairs = (
        cand.join(q, "qid")
        .join(
            base.select("vec_id", F.col("e").alias("ve")),
            "vec_id",
        )
        .withColumn("l2", _pq_l2(F.col("qe"), F.col("ve")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("l2").asc(), F.col("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", F.round("l2", 6).alias("l2_dist"),
                F.col("rank").cast("long").alias("rank"))
    )


# --------------------------------------------------------------- IVF+PQ
# The composed production shape (FAISS IVFPQ): the IVF coarse quantizer
# bounds the candidate set to the query's n_probe cells, and PQ/ADC
# ranks those candidates from codes alone — at 10^12 rows a query
# touches n_probe inverted lists of one-byte codes, never the raw
# vector table (except its own row).


def ivfpq_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 2,
    ivf_rounds: int = 2,
    m: int = PQ_M,
    ncode: int = PQ_K,
    pq_rounds: int = PQ_ROUNDS,
    dim: int = 64,
) -> DataFrame:
    base = with_vectors(emb).localCheckpoint(eager=True)
    # IVF coarse: bound candidates to probed cells
    cents = base.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce"), F.col("norm").alias("cn")
    )
    for _ in range(ivf_rounds):
        cents = _lloyd_update(base, cents)
    ranked = _rank_cells(base, cents)
    cells = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("cvid"), F.col("cid").alias("cell")
    )
    probes = ranked.filter(query_pred & (F.col("rn") <= n_probe)).select(
        F.col("vec_id").alias("qid"), F.col("cid").alias("pcell")
    )
    cand = (
        probes.join(cells, F.col("pcell") == F.col("cell"))
        .filter(F.col("qid") != F.col("cvid"))
        .select("qid", F.col("cvid").alias("vec_id"))
        .distinct()
    )
    # PQ: codebooks + codes, then ADC restricted to the candidate set
    subs = _pq_subvectors(base, m, dim).localCheckpoint(eager=True)
    pq_cents = subs.filter(F.col("vec_id") < ncode).select(
        "sub", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    for _ in range(pq_rounds):
        pq_cents = _pq_lloyd(subs, pq_cents)
    codes = _pq_assign(subs, pq_cents).filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("cvec"), "sub", F.col("cid").alias("code")
    )
    qsubs = subs.join(
        base.filter(query_pred).select("vec_id"), "vec_id"
    ).select(F.col("vec_id").alias("qid"), "sub", F.col("sv").alias("qv"))
    lut = qsubs.join(F.broadcast(pq_cents), "sub").select(
        F.col("qid").alias("lqid"),
        F.col("sub").alias("lsub"),
        F.col("cid").alias("lcid"),
        _pq_l2(F.col("qv"), F.col("cv")).alias("d"),
    )
    pair_d = (
        cand.join(codes, cand.vec_id == codes.cvec)
        .join(
            lut,
            (F.col("qid") == F.col("lqid"))
            & (F.col("sub") == F.col("lsub"))
            & (F.col("code") == F.col("lcid")),
        )
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


def ivfpq_oracle_sql(
    query_where: str,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 2,
    ivf_rounds: int = 2,
    m: int = PQ_M,
    ncode: int = PQ_K,
    pq_rounds: int = PQ_ROUNDS,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`ivfpq_topk`: the IVF CTE chain bounds
    candidates, the (p-prefixed) PQ CTE chain produces codes, ADC ranks
    within candidates only."""
    d = dim // m
    # ---- IVF section (identical text to ivf_oracle_sql internals)
    rank_sql = (
        "SELECT vec_id, cid, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM ("
        "SELECT v.vec_id, c.cid, list_sum(list_transform(range(1, {dd} + 1), "
        "i -> v.e[i] * c.ce[i])) / (v.norm * c.cn) AS ccos FROM e v, c{r} c)"
    )
    q = f"{KMEANS_Q!r}"
    ctes = [
        "e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        " AS e FROM embeddings)",
        "e AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x)))"
        " AS norm FROM e0)",
        f"c0 AS (SELECT vec_id AS cid, e AS ce, norm AS cn FROM e"
        f" WHERE vec_id < {n_centroids})",
    ]
    for r in range(ivf_rounds):
        ctes.append(f"a{r} AS ({rank_sql.format(dd=dim, r=r)})")
        ctes.append(
            f"m{r} AS (SELECT a.cid AS cell, t.i AS pos,"
            f" sum(CAST(floor(v.e[t.i] * {q} + 0.5) AS BIGINT)) AS s,"
            f" count(*) AS cnt"
            f" FROM (SELECT vec_id, cid FROM a{r} WHERE rn = 1) a"
            f" JOIN e v ON v.vec_id = a.vec_id"
            f" CROSS JOIN range(1, {dim} + 1) t(i)"
            f" GROUP BY a.cid, t.i)"
        )
        ctes.append(
            f"n{r} AS (SELECT cell AS cid,"
            f" list(CAST(s AS DOUBLE) / ({q} * cnt) ORDER BY pos) AS ce"
            f" FROM m{r} GROUP BY cell)"
        )
        ctes.append(
            f"c{r + 1} AS (SELECT o.cid, coalesce(n.ce, o.ce) AS ce,"
            f" sqrt(list_sum(list_transform(coalesce(n.ce, o.ce), x -> x * x)))"
            f" AS cn FROM c{r} o LEFT JOIN n{r} n ON n.cid = o.cid)"
        )
    ctes.append(f"ranked AS ({rank_sql.format(dd=dim, r=ivf_rounds)})")
    ctes.append("cells AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1)")
    ctes.append(
        f"probes AS (SELECT vec_id AS qid, cid AS pcell FROM ranked"
        f" WHERE {query_where} AND rn <= {n_probe})"
    )
    ctes.append(
        "cand AS (SELECT DISTINCT p.qid, l.vec_id FROM probes p"
        " JOIN cells l ON l.cell = p.pcell AND l.vec_id != p.qid)"
    )
    # ---- PQ section (p-prefixed CTEs; identical text to pq_oracle_sql)
    passign = (
        "SELECT vec_id, sub, cid, row_number() OVER"
        " (PARTITION BY vec_id, sub ORDER BY l2 ASC, cid) AS rn FROM ("
        "SELECT a.vec_id, a.sub, c.cid,"
        " list_sum(list_transform(range(1, {dd} + 1),"
        " i -> (a.sv[i] - c.cv[i]) * (a.sv[i] - c.cv[i]))) AS l2"
        " FROM subs a JOIN pk{r} c ON c.sub = a.sub)"
    )
    ctes.append(
        f"subs AS (SELECT vec_id, CAST(t.s AS BIGINT) AS sub,"
        f" e[t.s * {d} + 1 : t.s * {d} + {d}] AS sv"
        f" FROM e0 CROSS JOIN range(0, {m}) t(s))"
    )
    ctes.append(
        f"pk0 AS (SELECT sub, vec_id AS cid, sv AS cv FROM subs"
        f" WHERE vec_id < {ncode})"
    )
    for r in range(pq_rounds):
        ctes.append(f"pa{r} AS ({passign.format(dd=d, r=r)})")
        ctes.append(
            f"pm{r} AS (SELECT a.sub, a.cid AS cell, t.i AS pos,"
            f" sum(CAST(floor(v.sv[t.i] * {q} + 0.5) AS BIGINT)) AS s,"
            f" count(*) AS cnt"
            f" FROM (SELECT vec_id, sub, cid FROM pa{r} WHERE rn = 1) a"
            f" JOIN subs v ON v.vec_id = a.vec_id AND v.sub = a.sub"
            f" CROSS JOIN range(1, {d} + 1) t(i)"
            f" GROUP BY a.sub, a.cid, t.i)"
        )
        ctes.append(
            f"pn{r} AS (SELECT sub, cell AS cid,"
            f" list(CAST(s AS DOUBLE) / ({q} * cnt) ORDER BY pos) AS cv"
            f" FROM pm{r} GROUP BY sub, cell)"
        )
        ctes.append(
            f"pk{r + 1} AS (SELECT o.sub, o.cid, coalesce(n.cv, o.cv) AS cv"
            f" FROM pk{r} o LEFT JOIN pn{r} n"
            f" ON n.sub = o.sub AND n.cid = o.cid)"
        )
    ctes.append(f"paf AS ({passign.format(dd=d, r=pq_rounds)})")
    ctes.append(
        "codes AS (SELECT vec_id, sub, cid AS code FROM paf WHERE rn = 1)"
    )
    ctes.append(
        f"qsubs AS (SELECT vec_id AS qid, sub, sv AS qv FROM subs"
        f" WHERE {query_where})"
    )
    ctes.append(
        f"lut AS (SELECT a.qid, a.sub, c.cid,"
        f" list_sum(list_transform(range(1, {d} + 1),"
        f" i -> (a.qv[i] - c.cv[i]) * (a.qv[i] - c.cv[i]))) AS dd"
        f" FROM qsubs a JOIN pk{pq_rounds} c ON c.sub = a.sub)"
    )
    ctes.append(
        "pair AS (SELECT cand.qid, cand.vec_id,"
        " list_sum(list(l.dd ORDER BY l.sub)) AS adc"
        " FROM cand"
        " JOIN codes cd ON cd.vec_id = cand.vec_id"
        " JOIN lut l ON l.qid = cand.qid AND l.sub = cd.sub"
        " AND l.cid = cd.code"
        " GROUP BY cand.qid, cand.vec_id)"
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT qid, vec_id, round(adc, 6) AS adc_dist, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT qid, vec_id, adc,
               row_number() OVER (PARTITION BY qid ORDER BY adc ASC, vec_id)
                   AS rank
        FROM pair
    ) WHERE rank <= {k}
    """
    )


def ivf_topk_filtered(
    emb: DataFrame,
    allowed: DataFrame,
    query_pred: Column,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 2,
    rounds: int = 2,
) -> DataFrame:
    """FILTERED vector search (the metadata-constrained ANN every
    serving stack ships): identical to :func:`ivf_topk`, but candidate
    rows must also appear in ``allowed`` (a one-column vec_id frame,
    e.g. docs with lang='en'). The filter applies as a left-semi join
    on the inverted lists BEFORE re-rank — pre-filtering, so the top-k
    is exact over the allowed subset of the probed cells, and the
    re-rank never touches disallowed vectors (at 10^12 rows the
    metadata predicate prunes the candidate fetch itself, not the
    result)."""
    base = with_vectors(emb).localCheckpoint(eager=True)
    cents = base.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce"), F.col("norm").alias("cn")
    )
    for _ in range(rounds):
        cents = _lloyd_update(base, cents)
    ranked = _rank_cells(base, cents)
    cells = (
        ranked.filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("cvid"), F.col("cid").alias("cell"))
        .join(
            allowed.select(F.col(allowed.columns[0]).alias("cvid")),
            "cvid",
            "left_semi",
        )
    )
    probes = ranked.filter(query_pred & (F.col("rn") <= n_probe)).select(
        F.col("vec_id").alias("qid"), F.col("cid").alias("pcell")
    )
    cand = (
        probes.join(cells, F.col("pcell") == F.col("cell"))
        .filter(F.col("qid") != F.col("cvid"))
        .select("qid", F.col("cvid").alias("vec_id"))
        .distinct()
    )
    return exact_rerank(base, cand, query_pred, k)
