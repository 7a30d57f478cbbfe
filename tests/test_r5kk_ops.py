"""Round-5kk operators: rendezvous hashing, zonemap overlap audit —
python replays plus full oracle parity."""

from __future__ import annotations

import pytest

from tests.compare_util import assert_match, duck_con

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_hrw_oracle(spark, con):
    from hand_index_spark.entry_queries_r5kk import ORACLES5KK, TEXT5KK

    assert_match(
        TEXT5KK["rendezvous_assign"](spark, SF),
        ORACLES5KK["rendezvous_assign"],
        con,
        "rendezvous_assign",
    )


def test_hrw_python_replay_and_minimal_disruption(spark, con):
    from hand_index_spark.entry_queries_r5kk import (
        _HRW_DROP,
        _HRW_MOD,
        _HRW_NODES,
        TEXT5KK,
    )

    def pick(d, nodes):
        best = None
        for n in nodes:
            key = (n - ((d * 2654435761 + n * 40503 + 7919) % _HRW_MOD)
                   * (1 + n % 4) * 100)
            if best is None or key < best[0]:
                best = (key, n)
        return best[1]

    rows = {r.doc_id: r
            for r in TEXT5KK["rendezvous_assign"](spark, SF).collect()}
    all_nodes = list(range(_HRW_NODES))
    drop_nodes = [n for n in all_nodes if n != _HRW_DROP]
    for (d,) in con.sql("SELECT doc_id FROM documents").fetchall():
        r = rows[d]
        assert r.node_full == pick(d, all_nodes)
        assert r.node_minus13 == pick(d, drop_nodes)
        # THE HRW property: only docs on the dropped node move
        assert r.moved == (r.node_full == _HRW_DROP)
        if r.node_full != _HRW_DROP:
            assert r.node_minus13 == r.node_full


def test_duckdb_lambda_chunk_bug_documented():
    """The reason rendezvous_assign's oracle is lambda-free: DuckDB
    1.0 returns CHUNK-DEPENDENT results for list_reduce over
    row-dependent list_transform lists (same row, different answer
    with/without surrounding rows). Pin the repro so a future DuckDB
    upgrade that fixes it is noticed.

    Runs in a SUBPROCESS (r6): the repro exercises buggy native lambda
    code and segfaulted DuckDB once in-process mid-suite (exit 139 at
    2026-08-22, killing the whole run); isolated, a native crash just
    proves the bug is still not fixed instead of taking pytest down."""
    import subprocess
    import sys

    code = """
import duckdb
q = '''
SELECT doc_id, list_reduce(
  list_prepend([CAST(-1 AS BIGINT), CAST(9223372036854775807 AS BIGINT)],
    list_transform([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15],
      n -> [CAST(n AS BIGINT), CAST(n AS BIGINT)
            - ((doc_id * 2654435761 + n * 40503 + 7919) % 1000003)
              * (1 + n % 4) * 100])),
  (acc, x) -> CASE WHEN x[2] < acc[2] THEN x ELSE acc END)[1] AS node
FROM docs ORDER BY doc_id
'''
c = duckdb.connect()
c.sql("CREATE TABLE docs AS SELECT unnest(range(5))::BIGINT AS doc_id")
small = c.sql(q).fetchall()
c.sql("INSERT INTO docs SELECT unnest(range(5, 500))::BIGINT")
big = {d: n for d, n in c.sql(q).fetchall()}
big5 = [(d, big[d]) for d, _ in small]
print("FIXED" if small == big5 else "STILL_BUGGY")
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    if proc.returncode != 0:
        # native crash inside the buggy lambda path — certainly not fixed
        return
    if "FIXED" in proc.stdout:
        pytest.fail(
            "DuckDB list_reduce chunk bug appears FIXED — the "
            "rendezvous_assign oracle can be simplified back to the "
            "fold form (entry_queries_r5kk._hrw_sql)."
        )
    assert "STILL_BUGGY" in proc.stdout, proc.stdout + proc.stderr


def test_zonemap_audit_oracle(spark, con):
    from hand_index_spark.entry_queries_r5kk import GEO5KK, ORACLES5KK

    assert_match(
        GEO5KK["zonemap_overlap_audit"](spark, SF),
        ORACLES5KK["zonemap_overlap_audit"],
        con,
        "zonemap_overlap_audit",
    )


def test_zonemap_audit_python_replay(spark, con):
    from hand_index_spark.entry_queries_r5kk import GEO5KK

    stats: dict = {}
    for lang, n_chars in con.sql(
        "SELECT lang, n_chars FROM documents"
    ).fetchall():
        lo, hi = stats.get(lang, (1 << 60, -(1 << 60)))
        stats[lang] = (min(lo, n_chars), max(hi, n_chars))
    rows = {r.lang: r
            for r in GEO5KK["zonemap_overlap_audit"](spark, SF).collect()}
    assert set(rows) == set(stats)
    for lang, (lo, hi) in stats.items():
        r = rows[lang]
        # metadata consistent with data: the zonemap row equals the
        # true per-partition min/max
        assert (r.file_min, r.file_max) == (lo, hi)
        n_overlap = sum(
            1 for other, (lo2, hi2) in stats.items()
            if other != lang and lo <= hi2 and lo2 <= hi
        )
        assert r.n_overlapping == n_overlap
