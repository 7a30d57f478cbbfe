"""Round-5g registry batch — four new operator families:

- ``hits_scores``: HITS hubs & authorities over the deterministic web
  link graph (the second classic link-analysis algorithm next to
  ``pagerank_links``) — unnormalized integer iterates, so every
  aggregate is an order-free BIGINT sum and the result is bit-exact on
  any partitioning.
- ``cusum_changepoints``: CUSUM drift/change detection per user over
  the events value stream. The sequential recursion
  ``S_i = max(0, S_{i-1} + (x_i - k))`` is rewritten into its closed
  form ``S_i = P_i - min(0, min_{j<=i} P_j)`` (prefix sums + running
  min), so the whole detector is ONE window pass — the shape that
  scales, instead of a per-row stateful fold.
- ``fuzzy_name_join``: blocked entity resolution — candidate pairs via
  prefix/suffix q-gram blocking (provably complete for one
  substitution on names >= 9 chars: a single edit cannot change both
  the first 4 and the last 4 characters), refined with the exact
  Levenshtein distance. Never an all-pairs comparison.
- ``stream_enrich``: stream-static broadcast enrichment join — the
  canonical production streaming shape (fact stream x dimension
  table) that the stream-stream interval join does not cover.

Contract as every batch: identical column names and bit-identical
arithmetic between the Spark program and the DuckDB oracle.
Reference parity note: the reference engine (NGWPC/hand-index) has no
graph, anomaly-detection, entity-resolution or streaming surface at
all — these extend the engine along the LLM/web-pipeline axis the
brief names as first-class.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import Window
from pyspark.sql import functions as F

GEO5G: dict = {}
TEXT5G: dict = {}
ORACLES5G: dict[str, str] = {}


def _register(reg: dict, name: str, fn, oracle: str | None) -> None:
    reg[name] = fn
    if oracle is not None:
        ORACLES5G[name] = oracle


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _fresh_dir(prefix: str) -> str:
    import tempfile

    return tempfile.mkdtemp(prefix=prefix)


# --------------------------------------------------------------------------
# HITS hubs & authorities over the SAME deterministic link graph as
# pagerank_links (3 pseudo-random out-links per page, self loops
# dropped, dedup'd). Unnormalized iterates with h_0 = 1:
#     a_k(v) = sum_{(u,v) in E} h_{k-1}(u)        (authority)
#     h_k(u) = sum_{(u,v) in E} a_k(v)            (hub)
# Every value is an exact BIGINT (bounded by max_deg^(2*ITERS) — safe
# far past 10^12 nodes at fanout-bounded degree), every aggregate an
# order-free integer sum, so the result is bit-identical on any
# partitioning. Spark runs the half-iteration join-agg loop with the
# edge frame checkpointed ONCE; the oracle unrolls the 2 iterations as
# nested CTEs. Scale shape: per round, two keyed equi-joins + two hash
# aggregates on the edge list — no broadcast of rank state, no
# NestedLoop anywhere (plan-audited).

_HITS_ITERS = 2
_HITS_FANOUT = 3


def _q_hits_scores(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n = d.count()
    nodes = d.select(F.col("doc_id").alias("node"))
    edges = (
        d.select(
            F.col("doc_id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(_HITS_FANOUT))).alias("j"),
        )
        .withColumn(
            "dst", (F.col("src") * F.lit(31) + F.col("j") * F.lit(17)) % F.lit(n)
        )
        .filter(F.col("dst") != F.col("src"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)  # reused 2x per iteration
    )
    hub = nodes.withColumn("h", F.lit(1).cast("long"))
    auth = None
    for _ in range(_HITS_ITERS):
        a_in = (
            edges.join(hub, edges.src == hub.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("s"))
        )
        auth = (
            nodes.join(a_in, "node", "left")
            .select(
                "node", F.coalesce("s", F.lit(0)).cast("long").alias("a")
            )
            .localCheckpoint(eager=True)
        )
        h_out = (
            edges.join(auth, edges.dst == auth.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("s"))
        )
        hub = (
            nodes.join(h_out, "node", "left")
            .select(
                "node", F.coalesce("s", F.lit(0)).cast("long").alias("h")
            )
            .localCheckpoint(eager=True)
        )
    return (
        auth.join(hub, "node")
        .select(F.col("node").alias("doc_id"), F.col("a").alias("authority"),
                F.col("h").alias("hub"))
    )


def _hits_sql() -> str:
    js = ", ".join(str(j) for j in range(1, _HITS_FANOUT + 1))
    head = f"""
    WITH nn AS (SELECT count(*) AS n FROM documents),
    nodes AS (SELECT doc_id AS node FROM documents),
    edges AS (
        SELECT DISTINCT src, dst FROM (
            SELECT doc_id AS src,
                   (doc_id * 31 + j * 17) % (SELECT n FROM nn) AS dst
            FROM documents, unnest([{js}]) AS u(j)
        ) WHERE dst <> src
    ),
    h0 AS (SELECT node, CAST(1 AS BIGINT) AS h FROM nodes)"""
    parts = []
    for k in range(1, _HITS_ITERS + 1):
        parts.append(f""",
    a{k} AS (
        SELECT nodes.node, CAST(coalesce(c.s, 0) AS BIGINT) AS a
        FROM nodes LEFT JOIN (
            SELECT e.dst AS node, sum(h{k - 1}.h) AS s
            FROM edges e JOIN h{k - 1} ON h{k - 1}.node = e.src
            GROUP BY e.dst
        ) c ON c.node = nodes.node
    ),
    h{k} AS (
        SELECT nodes.node, CAST(coalesce(c.s, 0) AS BIGINT) AS h
        FROM nodes LEFT JOIN (
            SELECT e.src AS node, sum(a{k}.a) AS s
            FROM edges e JOIN a{k} ON a{k}.node = e.dst
            GROUP BY e.src
        ) c ON c.node = nodes.node
    )""")
    return (
        head
        + "".join(parts)
        + f"""
    SELECT a{_HITS_ITERS}.node AS doc_id, a{_HITS_ITERS}.a AS authority,
           h{_HITS_ITERS}.h AS hub
    FROM a{_HITS_ITERS} JOIN h{_HITS_ITERS}
      ON h{_HITS_ITERS}.node = a{_HITS_ITERS}.node
    """
    )


_register(TEXT5G, "hits_scores", _q_hits_scores, _hits_sql())


# --------------------------------------------------------------------------
# CUSUM change detection per user. Values quantized to exact cents
# (floor(v*100 + 0.5) — the repo-wide idiom), target k and threshold h
# fixed integers, so every intermediate is a BIGINT and the two
# engines agree bit-for-bit. The textbook recursion
#     S_i = max(0, S_{i-1} + (x_i - k)),  alert when S_i > h
# has the closed form (proved by induction; pytest replays the
# recursion in python):
#     P_i = sum_{j<=i} (x_j - k);  S_i = P_i - min(0, min_{j<=i} P_j)
# so the detector is prefix-sum + running-min — one window partition
# per user, linear in the stream, no per-row state. Output: per-user
# alert count, peak statistic, event count.

_CUSUM_K = 6000  # target, cents (stream mean is ~4963)
_CUSUM_H = 20000  # alert threshold, cents


def _q_cusum_changepoints(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    x = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = e.select("user_id", "event_id", us.alias("us"), x.alias("x"))
    pref = base.withColumn(
        "p", F.sum(F.col("x") - F.lit(_CUSUM_K)).over(w)
    )
    s = pref.withColumn(
        "s", F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(w))
    )
    # max_s as DOUBLE: the oracle's windowed sum(BIGINT) promotes to
    # HUGEINT in DuckDB, which pandas/Arrow materializes as float64 —
    # Spark's int64 was value-equal but hash-red on dtype
    # (CORRECTNESS_r05 / VERDICT r5 item 1b). Values are cents-scale
    # sums, far below 2^53, so the double is exact.
    return s.groupBy("user_id").agg(
        F.sum((F.col("s") > F.lit(_CUSUM_H)).cast("long")).alias("n_alerts"),
        F.max("s").cast("double").alias("max_s"),
        F.count(F.lit(1)).alias("n_events"),
    )


_CUSUM_SQL = f"""
    WITH base AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
      FROM events
    ),
    pref AS (
      SELECT *, sum(x - {_CUSUM_K}) OVER (
                  PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM base
    ),
    st AS (
      SELECT user_id,
             p - least(CAST(0 AS BIGINT), min(p) OVER (
                  PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
      FROM pref
    )
    SELECT user_id,
           CAST(sum(CASE WHEN s > {_CUSUM_H} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alerts,
           max(s) AS max_s,
           count(*) AS n_events
    FROM st GROUP BY user_id
    """

_register(TEXT5G, "cusum_changepoints", _q_cusum_changepoints, _CUSUM_SQL)


# --------------------------------------------------------------------------
# Blocked fuzzy entity resolution. Canonical names are 12-hex-char
# fingerprints (diverse prefixes AND suffixes — unlike TPC-H's
# constant-prefix c_name, which would degenerate prefix blocks to one
# n^2 bucket); each doc also emits a VARIANT with one character
# substituted at a doc-derived position ('q' is not a hex digit, so
# the edit distance is exactly 1). Candidates = (prefix-4 equi-join)
# UNION (suffix-4 equi-join): complete for any single substitution on
# length-12 names because one edit cannot change both ends. Refine =
# exact Levenshtein <= 1 (classic DP, integer, identical on both
# engines). The oracle replays the same blocked join — candidate
# generation is part of the verified semantics, not a hidden
# approximation. Scale shape: two hash equi-joins on 4-char keys +
# distinct + a per-pair O(len^2) integer refine; never all-pairs.


def _q_fuzzy_name_join(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    canon = d.select(
        F.col("doc_id").alias("c_id"),
        F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 12).alias(
            "c_name"
        ),
    )
    var = canon.select(
        F.col("c_id").alias("v_id"),
        F.expr(
            "concat(substring(c_name, 1, cast(c_id % 12 as int)), 'q', "
            "substring(c_name, cast(c_id % 12 as int) + 2, 12))"
        ).alias("v_name"),
    )
    vk = var.select(
        "v_id", "v_name",
        F.substring("v_name", 1, 4).alias("pre"),
        F.substring("v_name", 9, 4).alias("suf"),
    )
    ck = canon.select(
        "c_id", "c_name",
        F.substring("c_name", 1, 4).alias("pre"),
        F.substring("c_name", 9, 4).alias("suf"),
    )
    cand = (
        vk.join(ck, "pre").select("v_id", "c_id")
        .unionAll(vk.join(ck, "suf").select("v_id", "c_id"))
        .distinct()
    )
    return (
        cand.join(var, "v_id")
        .join(canon, "c_id")
        .withColumn("lev", F.levenshtein("v_name", "c_name").cast("long"))
        .filter(F.col("lev") <= 1)
        .select("v_id", "c_id", "lev")
    )


_FUZZY_SQL = """
    WITH canon AS (
      SELECT doc_id AS c_id,
             substr(sha256(CAST(doc_id AS VARCHAR)), 1, 12) AS c_name
      FROM documents
    ),
    var AS (
      SELECT c_id AS v_id,
             substr(c_name, 1, CAST(c_id % 12 AS INT)) || 'q' ||
             substr(c_name, CAST(c_id % 12 AS INT) + 2, 12) AS v_name
      FROM canon
    ),
    vk AS (SELECT v_id, v_name, substr(v_name, 1, 4) AS pre,
                  substr(v_name, 9, 4) AS suf FROM var),
    ck AS (SELECT c_id, c_name, substr(c_name, 1, 4) AS pre,
                  substr(c_name, 9, 4) AS suf FROM canon),
    cand AS (
      SELECT DISTINCT v_id, c_id FROM (
        SELECT vk.v_id, ck.c_id FROM vk JOIN ck ON vk.pre = ck.pre
        UNION ALL
        SELECT vk.v_id, ck.c_id FROM vk JOIN ck ON vk.suf = ck.suf
      )
    )
    SELECT cand.v_id, cand.c_id,
           CAST(levenshtein(var.v_name, canon.c_name) AS BIGINT) AS lev
    FROM cand JOIN var ON var.v_id = cand.v_id
              JOIN canon ON canon.c_id = cand.c_id
    WHERE levenshtein(var.v_name, canon.c_name) <= 1
    """

_register(TEXT5G, "fuzzy_name_join", _q_fuzzy_name_join, _FUZZY_SQL)


# --------------------------------------------------------------------------
# Stream-static enrichment join: the events FILE STREAM joined to the
# static customer dimension (broadcast — the dimension is the small
# side by construction at any corpus scale), then windowed per
# day/segment, drained with availableNow into a memory sink. Proven
# equal to the batch join+aggregate by the oracle. This is the
# production "enrich facts with a dim" streaming shape; state is
# bounded by (days x segments), the join itself is stateless.


def _q_stream_enrich(spark, sf_dir):
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    src_dir = _fresh_dir("stream_enrich_")
    os.symlink(path, os.path.join(src_dir, "events.parquet"))
    stream = spark.readStream.schema(schema).parquet(src_dir)
    dim = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = stream.join(
        F.broadcast(dim), stream.user_id == dim.c_custkey
    )
    agg = (
        joined.withColumn("day", F.date_format(F.col("ts"), "yyyy-MM-dd"))
        .groupBy("day", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


_register(
    TEXT5G,
    "stream_enrich",
    _q_stream_enrich,
    """
    SELECT strftime(e.ts, '%Y-%m-%d') AS day, c.c_mktsegment,
           count(*) AS n_events,
           round(sum(e.value), 4) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)


# --------------------------------------------------------------------------
# Iceberg write-audit-publish (WAP) on icelite: stage a second document
# batch on a branch pointer, prove readers of the published head cannot
# see it, audit the staged rows in one aggregate pass, then fast-forward
# `current` with a single atomic pointer swap. Extends the reference's
# staging-table-then-upsert publish discipline (load.py:62-64,190-196)
# to Iceberg's branch/audit/cherry-pick contract. The oracle recomputes
# the post-publish per-lang aggregate plus the pre-publish row count
# directly from the source table.


def _q_wap_publish(spark, sf_dir):
    from .tables.icelite import IceliteTable

    root = _fresh_dir("icelite_wap_")
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    t = IceliteTable(root, "docs")
    t.write(d.filter(F.col("doc_id") % 2 == 0), stage="v1", fingerprint="a")
    # stage the odd half on a branch: current is NOT moved by this write
    t.write(
        d.filter(F.col("doc_id") % 2 == 1),
        stage="v2",
        fingerprint="b",
        mode="append",
        branch="audit",
    )
    pre_rows = t.read(spark).count()  # published readers: v1 only
    audit = t.audit_branch(
        spark,
        "audit",
        row_checks={
            "doc_id_present": "doc_id IS NOT NULL AND doc_id >= 0",
            "text_present": "text IS NOT NULL",
        },
    )
    if not audit["pass"]:  # the WAP gate: never publish unaudited rows
        raise AssertionError(f"audit failed: {audit}")
    t.publish_branch("audit")
    return (
        t.read(spark)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("long").alias("sum_id"),
        )
        .withColumn("pre_publish_rows", F.lit(pre_rows).cast("long"))
    )


_register(
    TEXT5G,
    "wap_publish",
    _q_wap_publish,
    """
    SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_id,
           CAST((SELECT count(*) FROM documents WHERE doc_id % 2 = 0)
                AS BIGINT) AS pre_publish_rows
    FROM documents
    GROUP BY lang
    """,
)
