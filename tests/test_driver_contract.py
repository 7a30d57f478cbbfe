"""Run every __spark_entry__ query against its DuckDB oracle at sf0.01 —
the exact check the driver performs (SURVEY.md §5.2 item 2)."""

from __future__ import annotations

import pytest

import __spark_entry__ as ENTRY
from tests.compare_util import assert_match, duck_con

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = ENTRY.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns and rows is not None


_QUERIES = ENTRY.queries()
_ORACLES = ENTRY.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_vs_oracle(spark, con, name):
    df = _QUERIES[name](spark, SF_DIR)
    if name in _ORACLES:
        assert_match(df, _ORACLES[name], con, name)
    else:
        assert df.count() >= 0  # rows-only check (driver's weak path)


def test_all_oracle_keys_have_queries():
    assert set(_ORACLES) <= set(_QUERIES)


def test_documents_text_is_ascii(con):
    """Precondition of the multimodal byte-arithmetic oracles: the
    engine sums raw UTF-8 bytes while the SQL iterates codepoints;
    those coincide only for ASCII. Fail HERE if the corpus changes."""
    n = con.sql(
        "SELECT count(*) FROM documents WHERE octet_length(encode(text)) != length(text)"
    ).fetchone()[0]
    assert n == 0, "documents.text contains non-ASCII; byte-sum oracles invalid"
