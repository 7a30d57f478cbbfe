"""WARC source unit coverage (the contract query warc_roundtrip pins
the distributed cycle; these pin the byte-level parser edges)."""

import gzip

from hand_index_spark.sources.warc import build_record, parse_warc_bytes


def _rec(url="https://a.example/d1", body=b"<html><body>x</body></html>"):
    return build_record(url, "2025-01-01T00:00:01Z", body)


def test_single_record_roundtrip():
    recs = parse_warc_bytes(_rec())
    assert len(recs) == 1
    r = recs[0]
    assert r["url"] == "https://a.example/d1"
    assert r["warc_ts"] == "2025-01-01T00:00:01Z"
    assert r["http_status"] == 200
    assert r["mime"] == "text/html"
    assert r["html"] == b"<html><body>x</body></html>"


def test_multi_member_gzip_stream():
    # the Common-Crawl layout: one gzip member per record, concatenated
    blob = b"".join(
        gzip.compress(_rec(url=f"https://a.example/d{i}", body=b"b" * i), mtime=0)
        for i in range(1, 5)
    )
    recs = parse_warc_bytes(blob)
    assert [r["url"] for r in recs] == [f"https://a.example/d{i}" for i in range(1, 5)]
    assert [len(r["html"]) for r in recs] == [1, 2, 3, 4]


def test_plain_uncompressed_and_non_response_skipped():
    meta = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\n"
        b"robots: x\r\n\r\n"
    )
    recs = parse_warc_bytes(meta + _rec())
    assert len(recs) == 1  # warcinfo skipped, response kept
    assert recs[0]["http_status"] == 200


def test_binary_body_with_crlf_inside():
    # body containing the record separator must not split the record
    body = b"ab\r\n\r\ncd" * 3
    recs = parse_warc_bytes(_rec(body=body) + _rec(url="https://a.example/d2"))
    assert len(recs) == 2
    assert recs[0]["html"] == body
