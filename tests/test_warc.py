"""WARC source (sources/warc.py): spec-shaped record framing, gzip
multi-member files, HTTP payload splitting, torn-tail tolerance, and
composition with the HTML extractors — the crawl ingestion edge."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from eel_spark.sources.warc import (
    WarcSource,
    parse_warc_stream,
    write_warc,
)


def _http(body: bytes, ctype: bytes = b"text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
        + b"\r\nContent-Length: " + str(len(body)).encode()
        + b"\r\n\r\n" + body
    )


def _records():
    html = (
        b"<html><head><title>T</title></head><body>"
        b"<p>hello crawl world with plenty of words</p>"
        b'<a href="http://next.example/p">n</a></body></html>'
    )
    return [
        {
            "warc_type": "warcinfo",
            "content_type": "application/warc-fields",
            "payload": b"software: eel_spark-test\r\n",
        },
        {
            "warc_type": "request",
            "target_uri": "http://site.example/a",
            "content_type": "application/http;msgtype=request",
            "payload": b"GET /a HTTP/1.1\r\nHost: site.example\r\n\r\n",
        },
        {
            "warc_type": "response",
            "target_uri": "http://site.example/a",
            "content_type": "application/http;msgtype=response",
            "payload": _http(html),
        },
        {
            "warc_type": "response",
            "target_uri": "http://site.example/b",
            "content_type": "application/http;msgtype=response",
            "payload": _http(b"\x89PNG not html", b"image/png"),
        },
    ]


@pytest.mark.parametrize("compress", [False, True])
def test_warc_round_trip(spark, tmp_path, compress):
    ext = "warc.gz" if compress else "warc"
    path = str(tmp_path / f"crawl.{ext}")
    write_warc(_records(), path, compress=compress)
    out = WarcSource(path).to_datastream(spark).df
    rows = {
        (r["warc_type"], r["target_uri"]): r
        for r in out.collect()
    }
    assert len(rows) == 4
    resp = rows[("response", "http://site.example/a")]
    # HTTP message split: status + real content-type + BODY payload
    assert resp["http_status"] == 200
    assert resp["content_type"] == "text/html"
    assert bytes(resp["payload"]).startswith(b"<html>")
    assert rows[("response", "http://site.example/b")]["content_type"] == "image/png"
    req = rows[("request", "http://site.example/a")]
    assert req["http_status"] is None  # requests have no status line split
    info = rows[("warcinfo", None)]
    assert b"eel_spark-test" in bytes(info["payload"])
    assert all(not r["truncated"] for r in rows.values())


def test_warc_composes_with_html_extractors(spark, tmp_path):
    """The ingestion chain the format exists for: WARC responses →
    html_to_text / html_links on the decoded payload."""
    from eel_spark.functions.text import html_links, html_to_text

    path = str(tmp_path / "c.warc.gz")
    write_warc(_records(), path, compress=True)
    pages = (
        WarcSource(path).to_datastream(spark).df
        .where((F.col("warc_type") == "response")
               & (F.col("http_status") == 200)
               & (F.col("content_type") == "text/html"))
        .select(
            "target_uri",
            F.decode("payload", "UTF-8").alias("html"),
        )
    )
    row = pages.select(
        "target_uri",
        html_to_text(F.col("html")).alias("text"),
        html_links(F.col("html")).alias("links"),
    ).first()
    # the </p> block boundary puts the trailing anchor on its own line
    assert row["text"] == "T\nhello crawl world with plenty of words\nn"
    assert row["links"] == ["http://next.example/p"]


def test_warc_torn_tail_and_payload_limit(spark, tmp_path):
    """A truncated fetch keeps every complete record and drops the torn
    tail (never raises); payload_limit bounds single records and flags
    them."""
    import io

    path = tmp_path / "torn.warc"
    write_warc(_records(), str(path), compress=False)
    raw = path.read_bytes()
    torn = tmp_path / "t2.warc"
    torn.write_bytes(raw[: len(raw) - 60])  # cut inside the last record
    out = WarcSource(str(torn)).to_datastream(spark).df
    assert out.count() == 3  # 4th record torn away, first three intact
    # payload_limit: big record flagged, slim columns intact
    recs = list(
        parse_warc_stream(io.BytesIO(raw), "x", payload_limit=5)
    )
    assert len(recs) == 4
    big = [r for r in recs if r["warc_type"] == "response"][0]
    assert big["truncated"] and len(big["payload"]) == 5
    limited = WarcSource(str(path), payload_limit=5).to_datastream(spark).df
    assert limited.where("truncated").count() >= 2


def test_warc_glob_and_multifile(spark, tmp_path):
    write_warc(_records()[:2], str(tmp_path / "a.warc"), compress=False)
    write_warc(_records()[2:], str(tmp_path / "b.warc.gz"), compress=True)
    out = WarcSource(str(tmp_path / "*.warc*")).to_datastream(spark).df
    assert out.count() == 4
    assert out.select("warc_file").distinct().count() == 2


def test_warc_malformed_input_tolerance(spark, tmp_path):
    """r13 review (third pass): torn GZIP members, negative
    Content-Length, LF-only writers, HTTP-looking resource payloads and
    missing inter-record separators must all degrade per the documented
    contract — keep what is intact, never raise, never mangle."""
    import gzip as _gzip
    import io

    # torn .warc.gz: first member intact, second truncated mid-member
    rec1 = (b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 5\r\n"
            b"\r\nhello\r\n\r\n")
    rec2 = (b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 400\r\n"
            b"\r\n" + b"x" * 400 + b"\r\n\r\n")
    torn_gz = tmp_path / "torn.warc.gz"
    torn_gz.write_bytes(_gzip.compress(rec1) + _gzip.compress(rec2)[:-30])
    out = WarcSource(str(torn_gz)).to_datastream(spark).df.collect()
    assert len(out) == 1 and bytes(out[0]["payload"]) == b"hello"

    # negative Content-Length must not swallow the rest of the stream
    neg = (b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: -1\r\n"
           b"\r\n" + rec1)
    assert list(parse_warc_stream(io.BytesIO(neg), "x")) == []

    # LF-only writer: headers split and record parses
    lf = (b"WARC/1.0\nWARC-Type: resource\nContent-Length: 5\n\nhello\n\n")
    recs = list(parse_warc_stream(io.BytesIO(lf), "x"))
    assert len(recs) == 1
    assert recs[0]["warc_type"] == "resource"
    assert recs[0]["payload"] == b"hello"

    # a resource record whose TEXT starts with HTTP/ passes through
    # intact (only records declared application/http or responses split)
    doc = b"HTTP/1.1 is a protocol\r\n\r\nbody text"
    res = (b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Type: text/plain\r\n"
           + f"Content-Length: {len(doc)}".encode() + b"\r\n\r\n"
           + doc + b"\r\n\r\n")
    recs = list(parse_warc_stream(io.BytesIO(res), "x"))
    assert recs[0]["payload"] == doc
    assert recs[0]["http_status"] is None
    assert recs[0]["content_type"] == "text/plain"

    # missing inter-record separator: the next record is resynced from
    # its version line, not destroyed
    glued = (b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 5\r\n"
             b"\r\nhello" + rec1)
    recs = list(parse_warc_stream(io.BytesIO(glued), "x"))
    assert len(recs) == 2
    assert [r["payload"] for r in recs] == [b"hello", b"hello"]

    # LF-only separators keep record_offset exact (4-byte assumption
    # would drift by 2 per record)
    two_lf = lf + lf
    recs = list(parse_warc_stream(io.BytesIO(two_lf), "x"))
    assert [r["record_offset"] for r in recs] == [0, len(lf)]


def test_warc_oversized_archive_guard(spark, tmp_path):
    """One archive is one task (binaryFile rows don't split): a file
    past max_file_bytes must fail LOUDLY with the file name and the
    remedy, not silently risk an executor OOM (r13 verdict)."""
    p = tmp_path / "big.warc"
    write_warc(_records(), str(p))
    src = WarcSource(str(p), max_file_bytes=64)
    with pytest.raises(Exception) as ei:
        src.to_datastream(spark).df.count()
    msg = str(ei.value)
    assert "max_file_bytes=64" in msg and "big.warc" in msg
    # the same file parses fine at the default bound
    assert WarcSource(str(p)).to_datastream(spark).df.count() == len(_records())


def test_warc_html_extract_slot_plan(spark):
    """The born-ungated WARC→extraction slot keeps the ingestion-edge
    plan shape: exactly ONE MapInPandas (the record parse), ZERO
    Exchanges — filter, HTTP-split projection and html_to_text all ride
    the scan."""
    from eel_spark.queries.ops5 import warc_html_extract

    df = warc_html_extract(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1, plan
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
