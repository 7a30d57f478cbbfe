"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship tile-assignment pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (101 queries as of round 4) and EVERY one carries a DuckDB
oracle — including the geo assignment (the tile grid is closed-form
arithmetic, tables/tilegrid.py), the trig-bearing transforms (via
discretization-safe comparisons), iterative graph clustering (via a
recursive-CTE closure), stateful streaming (via batch parity), the
no-broadcast join paths, temporal joins, sketches, and the icelite
maintenance surface. Registry batches: entry_queries.py,
entry_queries_ext.py, entry_queries_r2.py, entry_queries_r4.py; see
COVERAGE.md for the operator -> query map.

Session requirements: NONE. Every query runs green under a bare
``SparkSession.builder.getOrCreate()`` — no Arrow coercion, default
timezone, default shuffle partitions (machine-checked:
tests/test_vanilla_session.py drives ``scripts/verify_contract.py
--vanilla`` over the bug-class-covering sample in a subprocess). All
``createDataFrame`` fixtures pass explicit DDL schemas with pure-Python
values. Timestamp idioms (epoch-cast comparisons) are offset-invariant,
so key ordering never depends on the session timezone; queries that
FORMAT timestamps assume the driver host's default timezone matches the
oracle's (both UTC here, as the vanilla-session test exercises).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hand_index_spark import oracles
from hand_index_spark.entry_queries import GEO_QUERIES, RELATIONAL, TEXTOPS


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: web-page tile assignment (PIP + kNN) at sf0.001."""
    from hand_index_spark.pipelines.assign_tiles import assignments

    return assignments(spark, "/root/testdata/sf0.001", with_s2=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    out.update(GEO_QUERIES)
    out.update(RELATIONAL)
    out.update(TEXTOPS)
    return out


def oracle_sql() -> dict[str, str]:
    from hand_index_spark.entry_queries import ORACLES

    return dict(ORACLES)
