"""From-scratch HyperLogLog — the brief's "novel sketch" custom-operator
slot, built so the DuckDB oracle can evaluate the IDENTICAL arithmetic
(the same trick as the MinHash/LSH token hash):

- the hash is a two-step modular polynomial: ``h = ((x % 1000003) *
  2654435761 + 12289) % 2147483647`` — every intermediate fits int64 in
  BOTH engines (DuckDB BIGINT errors on overflow where Spark wraps, so
  the pre-mod keeps parity at 10^12-row id ranges);
- the register rank uses a 24-branch CASE threshold chain instead of
  ``floor(log2(w))`` — log/exp libm results can differ by 1 ulp between
  JVM and C, integer comparisons cannot;
- the harmonic sum Σ 2^-rank is EXACT under any summation order: every
  term is a power of two >= 2^-24, so all partial sums are multiples of
  2^-24 below 2^9 — well inside the 53-bit mantissa — making the
  estimate bit-identical across Spark's nondeterministic partition
  order and DuckDB;
- the small-range correction ``m * ln(m / V)`` is the one libm call;
  its 1-ulp risk is absorbed by the in-query round(4) on both sides.

Production would swap xxhash64 for the parity hash (more entropy per
register); the sketch mechanics — and the one-pass, one-shuffle
groupBy(bucket).max(rank) shape that makes this mergeable across 10^12
rows and across tables — are identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
_HASH_MOD = 2147483647
_W = 23  # remaining-bit width: hash < 2^31, minus p bucket bits
ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # standard alpha_m for m >= 128


def hll_hash_col(x: Column) -> Column:
    """Affine round + QUADRATIC mixing round. The affine map alone
    turns an arithmetic-progression key set into a low-discrepancy
    progression mod P — over-uniform buckets and inflated ranks
    (measured: +60-77% estimates, zero empty registers at n=500/m=256).
    The quadratic round breaks the progression structure (same reason
    the ANN plane hash is quadratic in the index); h < 2^31 keeps h*h
    inside int64 in BOTH engines (DuckDB errors on overflow)."""
    h = (
        (x % F.lit(1000003)) * F.lit(2654435761) + F.lit(12289)
    ) % F.lit(_HASH_MOD)
    return (h * h + F.lit(3) * h + F.lit(7919)) % F.lit(_HASH_MOD)


def hll_hash_sql(x: str) -> str:
    h = f"((({x} % 1000003) * 2654435761 + 12289) % {_HASH_MOD})"
    return f"(({h} * {h} + 3 * {h} + 7919) % {_HASH_MOD})"


def _rank_case_sql(w: str) -> str:
    branches = " ".join(
        f"WHEN {w} >= {1 << (_W - k)} THEN {k}" for k in range(1, _W + 1)
    )
    return f"(CASE {branches} ELSE {_W + 1} END)"


def _rank_case_col(w: Column) -> Column:
    expr = F.lit(_W + 1)
    for k in range(_W, 0, -1):
        expr = F.when(w >= F.lit(1 << (_W - k)), F.lit(k)).otherwise(expr)
    return expr


def hll_estimate(df: DataFrame, col: str) -> DataFrame:
    """One-row frame: (n_true, est, n_empty). ``est`` is the HLL
    cardinality estimate (round 4) of distinct ``col`` values; n_true
    rides along so the driver compare also pins the exact path. One
    scan + one tiny groupBy shuffle; registers are max-mergeable, so
    the same shape unions across partitions, tables, or days."""
    h = hll_hash_col(F.col(col))
    regs = (
        df.select(
            (h % F.lit(HLL_M)).alias("bucket"),
            # floor, not a bare cast: DuckDB CAST(double AS BIGINT)
            # ROUNDS while Spark truncates — floor is identical in both
            # (h is non-negative; /2^8 is exact in binary FP)
            F.floor(h / F.lit(HLL_M)).cast("long").alias("w"),
        )
        .withColumn("rank", _rank_case_col(F.col("w")))
        .groupBy("bucket")
        .agg(F.max("rank").alias("mr"))
    )
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mr"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    n_true = df.agg(F.countDistinct(col).alias("n_true"))
    out = agg.crossJoin(n_true).select(
        "n_true",
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("n_empty"),
        (
            F.lit(ALPHA * HLL_M * HLL_M)
            / (F.col("s_present") + (F.lit(HLL_M) - F.col("n_present")).cast("double"))
        ).alias("raw"),
    )
    corrected = F.when(
        (F.col("raw") <= F.lit(2.5 * HLL_M)) & (F.col("n_empty") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("n_empty").cast("double")),
    ).otherwise(F.col("raw"))
    return out.select("n_true", "n_empty", F.round(corrected, 4).alias("est"))


def hll_estimate_sql(table: str, col: str) -> str:
    """The DuckDB twin of :func:`hll_estimate` — same hash, same CASE
    ranks, same exact harmonic sum, same correction and rounding."""
    h = hll_hash_sql(col)
    rank = _rank_case_sql("w")
    return f"""
    WITH hashes AS (
        SELECT {h} % {HLL_M} AS bucket,
               CAST(floor({h} / {HLL_M}) AS BIGINT) AS w
        FROM {table}
    ), regs AS (
        SELECT bucket, max({rank}) AS mr FROM hashes GROUP BY bucket
    ), agg AS (
        SELECT sum(pow(2.0, -mr)) AS s_present, count(*) AS n_present
        FROM regs
    ), truth AS (
        SELECT count(DISTINCT {col}) AS n_true FROM {table}
    )
    SELECT t.n_true,
           CAST({HLL_M} - a.n_present AS BIGINT) AS n_empty,
           round(
             CASE WHEN ({ALPHA * HLL_M * HLL_M!r}
                        / (a.s_present + CAST({HLL_M} - a.n_present AS DOUBLE)))
                       <= {2.5 * HLL_M!r}
                   AND ({HLL_M} - a.n_present) > 0
                  THEN {float(HLL_M)!r}
                       * ln({float(HLL_M)!r} / CAST({HLL_M} - a.n_present AS DOUBLE))
                  ELSE {ALPHA * HLL_M * HLL_M!r}
                       / (a.s_present + CAST({HLL_M} - a.n_present AS DOUBLE))
             END, 4) AS est
    FROM agg a, truth t
    """


# --------------------------------------------------------------------------
# Count-Min sketch + heavy hitters. The fixed-size hot-key detector the
# brief's skew story needs at 10^12 rows: the sketch is d*w integer
# counters REGARDLESS of key cardinality (a 10^9-host domain costs the
# same 2048-row state as a 10-host one), counters are order-free integer
# sums (exact under any partition order -> bit-identical oracle), and
# sketches merge by addition, so per-partition/day/table sketches union
# for free. The estimate join broadcasts the sketch (<= d*w rows by
# construction) — no shuffle of the probe side. Same portable hash
# family as HLL (affine round + quadratic mixing; every intermediate
# fits int64 in both engines).

CMS_D = 4
CMS_W = 512
# same frozen primes as the MinHash permutation params (dedup.PERMS)
CMS_PARAMS = [
    (1299721, 15485863),
    (7919, 32452843),
    (104729, 49979687),
    (224737, 67867967),
]


def cms_bucket_col(key: Column, j: int) -> Column:
    """Row-j bucket for an integer key. key%1000003 keeps the product
    int64-exact at 10^12-row key ranges; h < 2^31 keeps h*h in int64
    (DuckDB errors on BIGINT overflow where Spark wraps)."""
    a, b = CMS_PARAMS[j]
    h = ((key % F.lit(1000003)) * F.lit(a) + F.lit(b)) % F.lit(_HASH_MOD)
    return ((h * h + F.lit(3) * h + F.lit(7919)) % F.lit(_HASH_MOD)) % F.lit(CMS_W)


def cms_bucket_sql(key: str, j: int) -> str:
    a, b = CMS_PARAMS[j]
    h = f"((({key} % 1000003) * {a} + {b}) % {_HASH_MOD})"
    return f"((({h} * {h} + 3 * {h} + 7919) % {_HASH_MOD}) % {CMS_W})"


def cms_sketch(df: DataFrame, key_col: str) -> DataFrame:
    """(j, bkt, cnt) — one scan, explode to d rows per input row, ONE
    groupBy shuffle whose exchange carries <= d*w rows per map task
    (partial aggregation collapses everything map-side)."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_bucket_col(F.col(key_col), j).alias("bkt"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("p")
    )
    return (
        pairs.select(F.col("p.j").alias("j"), F.col("p.bkt").alias("bkt"))
        .groupBy("j", "bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(df: DataFrame, key_col: str, threshold: int) -> DataFrame:
    """(hot_key, est, true_cnt) for keys whose CMS point estimate
    (min over d rows of the bucket counter) reaches ``threshold``.
    ``true_cnt`` rides along (exact groupBy) so the driver compare also
    pins the sketch's overestimate-only guarantee: est >= true always.
    The sketch side of the probe join is broadcast — it is <= d*w rows
    by construction, the textbook broadcast-able dim."""
    sk = cms_sketch(df, key_col)
    keys = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("true_cnt"))
    probes = keys.select(
        F.col(key_col),
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_bucket_col(F.col(key_col), j).alias("bkt"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select(F.col(key_col), "true_cnt", F.col("p.j").alias("j"), F.col("p.bkt").alias("bkt"))
    est = (
        probes.join(F.broadcast(sk), ["j", "bkt"])
        .groupBy(key_col)
        .agg(
            F.min("cnt").alias("est"),
            F.min("true_cnt").alias("true_cnt"),
        )
    )
    return est.filter(F.col("est") >= F.lit(threshold)).select(
        F.col(key_col).alias("hot_key"),
        F.col("est").cast("long").alias("est"),
        F.col("true_cnt").cast("long").alias("true_cnt"),
    )


def cms_heavy_hitters_sql(keyed_cte: str, threshold: int) -> str:
    """DuckDB twin: ``keyed_cte`` must be a CTE body yielding one
    column ``k`` (one row per input row); the UNION ALL branches are
    the explode, everything else is the same arithmetic."""
    sketch_branches = "\n        UNION ALL ".join(
        f"SELECT {j} AS j, {cms_bucket_sql('k', j)} AS bkt FROM keyed"
        for j in range(CMS_D)
    )
    probe_branches = "\n        UNION ALL ".join(
        f"SELECT k, true_cnt, {j} AS j, {cms_bucket_sql('k', j)} AS bkt FROM keys"
        for j in range(CMS_D)
    )
    return f"""
    WITH keyed AS ({keyed_cte}),
    pairs AS (
        {sketch_branches}
    ),
    sketch AS (
        SELECT j, bkt, count(*) AS cnt FROM pairs GROUP BY j, bkt
    ),
    keys AS (
        SELECT k, count(*) AS true_cnt FROM keyed GROUP BY k
    ),
    probes AS (
        {probe_branches}
    ),
    est AS (
        SELECT p.k, min(s.cnt) AS est, min(p.true_cnt) AS true_cnt
        FROM probes p JOIN sketch s ON s.j = p.j AND s.bkt = p.bkt
        GROUP BY p.k
    )
    SELECT k AS hot_key,
           CAST(est AS BIGINT) AS est,
           CAST(true_cnt AS BIGINT) AS true_cnt
    FROM est WHERE est >= {threshold}
    """


def hll_estimate_grouped(df: DataFrame, group_col: str, col: str) -> DataFrame:
    """Per-group HLL: (group, n_true, n_empty, est). The register
    frame is keyed (group, bucket) — the grouped form of the same
    one-pass shape, which is exactly how per-partition sketches merge
    upward at 10^12 rows (max over registers is associative; grouping
    columns just ride the key). The small-range ln() correction and
    exact harmonic sum carry over unchanged per group."""
    h = hll_hash_col(F.col(col))
    regs = (
        df.select(
            F.col(group_col).alias("g"),
            (h % F.lit(HLL_M)).alias("bucket"),
            F.floor(h / F.lit(HLL_M)).cast("long").alias("w"),
        )
        .withColumn("rank", _rank_case_col(F.col("w")))
        .groupBy("g", "bucket")
        .agg(F.max("rank").alias("mr"))
    )
    agg = regs.groupBy("g").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mr"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    truth = df.groupBy(F.col(group_col).alias("g")).agg(
        F.countDistinct(col).alias("n_true")
    )
    out = agg.join(truth, "g").select(
        "g",
        "n_true",
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("n_empty"),
        (
            F.lit(ALPHA * HLL_M * HLL_M)
            / (F.col("s_present") + (F.lit(HLL_M) - F.col("n_present")).cast("double"))
        ).alias("raw"),
    )
    corrected = F.when(
        (F.col("raw") <= F.lit(2.5 * HLL_M)) & (F.col("n_empty") > 0),
        F.lit(float(HLL_M))
        * F.log(F.lit(float(HLL_M)) / F.col("n_empty").cast("double")),
    ).otherwise(F.col("raw"))
    return out.select(
        F.col("g").alias(group_col),
        "n_true",
        "n_empty",
        F.round(corrected, 4).alias("est"),
    )


def hll_estimate_grouped_sql(table: str, group_col: str, col: str) -> str:
    """DuckDB twin of :func:`hll_estimate_grouped`."""
    h = hll_hash_sql(col)
    rank = _rank_case_sql("w")
    est = f"""({ALPHA * HLL_M * HLL_M!r}
            / (a.s_present + CAST({HLL_M} - a.n_present AS DOUBLE)))"""
    return f"""
    WITH hashes AS (
        SELECT {group_col} AS g, {h} % {HLL_M} AS bucket,
               CAST(floor({h} / {HLL_M}) AS BIGINT) AS w
        FROM {table}
    ), regs AS (
        SELECT g, bucket, max({rank}) AS mr FROM hashes GROUP BY g, bucket
    ), agg AS (
        SELECT g, sum(pow(2.0, -mr)) AS s_present, count(*) AS n_present
        FROM regs GROUP BY g
    ), truth AS (
        SELECT {group_col} AS g, count(DISTINCT {col}) AS n_true
        FROM {table} GROUP BY {group_col}
    )
    SELECT t.g AS {group_col}, t.n_true,
           CAST({HLL_M} - a.n_present AS BIGINT) AS n_empty,
           round(
             CASE WHEN {est} <= {2.5 * HLL_M!r}
                   AND ({HLL_M} - a.n_present) > 0
                  THEN {float(HLL_M)!r}
                       * ln({float(HLL_M)!r}
                            / CAST({HLL_M} - a.n_present AS DOUBLE))
                  ELSE {est}
             END, 4) AS est
    FROM agg a JOIN truth t ON t.g = a.g
    """
