"""URL canonicalization — the crawl-frontier dedup primitive (two
syntactically different URLs that name the same resource must collapse
before fetch scheduling, dedup, or graph building; at 10^12 pages the
frontier would otherwise multiply by every casing/port/dot-segment
variant).

Deterministic subset implemented (RFC 3986 §6 normalizations that need
no network and no scheme registry):

1. fragment strip            (``#...`` never reaches the server)
2. scheme + authority lowercase
3. default-port strip        (``:443`` for https, ``:80`` for http)
4. dot-segment resolution    (``/./`` and one-level ``/seg/../``)
5. query-parameter sort      (order-insensitive resource identity)

Everything is Catalyst built-ins (regexp_replace / regexp_extract /
split / sort_array) with an exact DuckDB twin — both engines apply the
SAME regexes globally (DuckDB needs the explicit 'g' flag; Spark is
global by default) and the same ascii sort, so canonical strings match
byte-for-byte. Pure per-row expressions: no shuffle, no Python, fully
pushdown-transparent at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_TAIL_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "\\?([^#]*)"


def canonical_url_col(u: Column) -> Column:
    """Canonical form of ``u`` as a Spark column expression."""
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    auth = F.when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring_index(auth, ":443", 1),
    ).otherwise(auth)
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring_index(auth, ":80", 1),
    ).otherwise(auth)
    path = F.regexp_extract(u, _TAIL_RE, 1)
    path = F.regexp_replace(path, "/\\./", "/")
    path = F.regexp_replace(path, "/[^/]+/\\.\\./", "/")
    query = F.regexp_extract(u, _QUERY_RE, 1)
    sorted_q = F.array_join(F.sort_array(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def canonical_url_sql(u: str) -> str:
    """DuckDB twin of :func:`canonical_url_col` (same regexes, global
    'g' flag, same sort)."""
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    auth0 = f"lower(regexp_extract({u}, '{_AUTH_RE}', 1))"
    auth = f"""(CASE
        WHEN {scheme} = 'https' AND {auth0} LIKE '%:443'
            THEN left({auth0}, length({auth0}) - 4)
        WHEN {scheme} = 'http' AND {auth0} LIKE '%:80'
            THEN left({auth0}, length({auth0}) - 3)
        ELSE {auth0} END)"""
    path = (
        f"regexp_replace(regexp_replace("
        f"regexp_extract({u}, '{_TAIL_RE}', 1),"
        f" '/\\./', '/', 'g'), '/[^/]+/\\.\\./', '/', 'g')"
    )
    query = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    sorted_q = f"array_to_string(list_sort(string_split({query}, '&')), '&')"
    return f"""({scheme} || '://' || {auth} || {path}
        || CASE WHEN {query} = '' THEN '' ELSE '?' || {sorted_q} END)"""
