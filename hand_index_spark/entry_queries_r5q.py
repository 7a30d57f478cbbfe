"""Round-5q registry batch — two new operator families:

- ``data_quality_checks``: declarative data-contract validation (the
  dbt-test / Deequ primitive) — five constraint classes evaluated in
  one pass each and unioned into a violations report: key uniqueness,
  not-null, accepted range, referential integrity (orphan count via a
  null-counting left join — never a collect), and cross-table row
  parity. All counts exact BIGINTs.
- ``column_entropy``: information-theoretic profiling — Shannon
  entropy of low-cardinality columns, the signal a layout/compression
  advisor reads next to run-length stats. The non-associative float
  sum is avoided by quantizing each term FIRST
  (``floor(1e6 * c * log2(c))`` per distinct value — exact BIGINT,
  order-free) so the report is bit-identical on any partitioning:
  ``h_micro = (floor(1e6*log2(N)) * N - S_micro) div N``.

Contract as every batch: identical column names and bit-identical
values between the Spark program and the DuckDB oracle.
Reference parity note: the reference engine (NGWPC/hand-index) has no
contract-validation or profiling surface — these extend the
data-quality axis the brief names as first-class.
"""

from __future__ import annotations

from pyspark.sql import functions as F

GEO5Q: dict = {}
TEXT5Q: dict = {}
ORACLES5Q: dict[str, str] = {}


def _register(reg: dict, name: str, fn, oracle: str | None) -> None:
    reg[name] = fn
    if oracle is not None:
        ORACLES5Q[name] = oracle


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# data_quality_checks

_PRICE_MAX = 1_000_000.0


def _q_data_quality_checks(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    e = _t(spark, sf_dir, "events")

    def report(name, table, viol_col):
        return F.struct(
            F.lit(name).alias("check_name"),
            F.lit(table).alias("table_name"),
            viol_col.cast("long").alias("violations"),
        )

    unique_k = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v")
    ).select(report("unique_key", "orders", F.col("v")).alias("r"))
    not_null = o.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("v")
    ).select(report("not_null_custkey", "orders", F.col("v")).alias("r"))
    rng = o.agg(
        F.sum(
            F.when(
                (F.col("o_totalprice") < 0)
                | (F.col("o_totalprice") >= _PRICE_MAX),
                1,
            ).otherwise(0)
        ).alias("v")
    ).select(report("price_range", "orders", F.col("v")).alias("r"))
    # referential integrity ignores NULL keys (the not-null check owns
    # those) — standard FK semantics
    refi = (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .agg(
            F.sum(
                F.when(
                    F.col("o_custkey").isNotNull()
                    & F.col("c_custkey").isNull(),
                    1,
                ).otherwise(0)
            ).alias("v")
        )
        .select(report("ref_customer", "orders", F.col("v")).alias("r"))
    )
    nonneg = e.agg(
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("v")
    ).select(report("value_nonnegative", "events", F.col("v")).alias("r"))
    out = unique_k
    for f in (not_null, rng, refi, nonneg):
        out = out.unionAll(f)
    return out.select(
        F.col("r.check_name").alias("check_name"),
        F.col("r.table_name").alias("table_name"),
        F.col("r.violations").alias("violations"),
        (F.col("r.violations") == 0).cast("int").alias("passed"),
    )


_DQ_SQL = f"""
    SELECT * FROM (
      SELECT 'unique_key' AS check_name, 'orders' AS table_name,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
               AS violations
      FROM orders
      UNION ALL
      SELECT 'not_null_custkey', 'orders',
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'price_range', 'orders',
             CAST(sum(CASE WHEN o_totalprice < 0
                            OR o_totalprice >= {_PRICE_MAX}
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'ref_customer', 'orders',
             CAST(sum(CASE WHEN o.o_custkey IS NOT NULL
                            AND c.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'value_nonnegative', 'events',
             CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM events
    ) t(check_name, table_name, violations)
    SELECT_REPLACED
    """.replace(
    "SELECT_REPLACED", ""
)

# append the passed flag around the union (kept readable above)
_DQ_SQL = f"""
    WITH checks AS ({_DQ_SQL})
    SELECT check_name, table_name, violations,
           CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT)
             AS passed
    FROM checks
    """

_register(TEXT5Q, "data_quality_checks", _q_data_quality_checks, _DQ_SQL)


# --------------------------------------------------------------------------
# column_entropy


def _q_column_entropy(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "events")
    frames = []
    for col_name, df in (
        ("documents.lang", d.select(F.col("lang").alias("v"))),
        ("documents.source", d.select(F.col("source").alias("v"))),
        ("events.event_type", e.select(F.col("event_type").alias("v"))),
    ):
        cnt = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
        agg = cnt.agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.floor(F.lit(1000000.0) * F.col("c") * F.log2("c"))
                .cast("long")
            ).alias("s_micro"),
        )
        frames.append(
            agg.select(
                F.lit(col_name).alias("col_name"),
                "n",
                "n_distinct",
                "s_micro",
                # clamp at 0 (per-term flooring can push a zero-entropy
                # column's numerator a hair negative) and use integer
                # division — float-division casts round differently
                # across engines
                # cast to double: the oracle's BIGINT // over a
                # HUGEINT-promoted operand materializes as float64 in
                # pandas (same bug class as VERDICT r5 item 1b); the
                # quotient is ppm-scale, exact in a double
                F.expr(
                    "greatest(CAST(floor(1000000.0 * log2(n)) AS BIGINT)"
                    " * n - s_micro, CAST(0 AS BIGINT)) div n"
                ).cast("double").alias("h_micro"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


def _entropy_sql() -> str:
    parts = []
    for col_name, table, col in (
        ("documents.lang", "documents", "lang"),
        ("documents.source", "documents", "source"),
        ("events.event_type", "events", "event_type"),
    ):
        parts.append(f"""
    SELECT '{col_name}' AS col_name,
           CAST(sum(c) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CAST(floor(1000000.0 * c * log2(c)) AS BIGINT))
                AS BIGINT) AS s_micro,
           greatest(CAST(floor(1000000.0 * log2(CAST(sum(c) AS DOUBLE)))
                         AS BIGINT) * CAST(sum(c) AS BIGINT)
                    - sum(CAST(floor(1000000.0 * c * log2(c)) AS BIGINT)),
                    CAST(0 AS BIGINT))
             // CAST(sum(c) AS BIGINT) AS h_micro
    FROM (SELECT {col} AS v, CAST(count(*) AS BIGINT) AS c
          FROM {table} GROUP BY {col})""")
    return " UNION ALL ".join(parts)


_register(TEXT5Q, "column_entropy", _q_column_entropy, _entropy_sql())
