"""URL canonicalization edge cases — Spark expression vs DuckDB twin
byte parity on hand-picked tricky inputs (the contract query
url_canonicalize pins the bulk path)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hand_index_spark.functions.urlnorm import canonical_url_col, canonical_url_sql

CASES = [
    # (raw, expected canonical)
    ("HTTPS://Site1.Example:443/a/./d9?b=2&a=1#f",
     "https://site1.example/a/d9?a=1&b=2"),
    ("https://site1.example/x/../a/d9?a=1&b=2",
     "https://site1.example/a/d9?a=1&b=2"),
    ("HTTP://HOST.Example:80/p", "http://host.example/p"),
    ("http://host.example:8080/p", "http://host.example:8080/p"),  # non-default port kept
    ("https://h.example/p", "https://h.example/p"),                # no query, no frag
    ("https://h.example/p?z=1", "https://h.example/p?z=1"),        # single param
    ("https://h.example/a/./b/./c", "https://h.example/a/b/c"),    # repeated /./
    ("https://h.example/p#only-frag", "https://h.example/p"),
]


def test_spark_canonicalization(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, u string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url_col(F.col("u")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i], want)


def test_duckdb_twin_matches_spark_semantics():
    con = duckdb.connect()
    for raw, want in CASES:
        got = con.execute(
            f"SELECT {canonical_url_sql('u')} FROM (SELECT ? AS u)", [raw]
        ).fetchone()[0]
        assert got == want, (raw, got, want)
