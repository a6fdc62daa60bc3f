"""WARC / WET source tests: stdlib-built archives → documents frame."""

from __future__ import annotations

import gzip

import pytest

from tsflex_spark.sources.warc import read_warc, read_wet


def _record(
    wtype: str,
    uri: str,
    payload: bytes,
    rec_id: str = "urn:uuid:0001",
    date: str = "2024-03-01T12:30:00Z",
    content_type: str = "text/html",
) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <{rec_id}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


@pytest.fixture()
def warc_file(tmp_path):
    # CommonCrawl layout: each record is its OWN gzip member
    recs = [
        _record("warcinfo", "", b"software: test\r\n", rec_id="urn:uuid:info"),
        _record(
            "response",
            "https://example.com/a",
            b"<html>hello world</html>",
            rec_id="urn:uuid:a",
        ),
        _record("request", "https://example.com/a", b"GET /a HTTP/1.1\r\n"),
        _record(
            "response",
            "https://example.com/b",
            b"B" * 100,
            rec_id="urn:uuid:b",
            content_type="application/octet-stream",
        ),
    ]
    p = tmp_path / "crawl.warc.gz"
    with open(p, "wb") as f:
        for r in recs:
            f.write(gzip.compress(r))
    return str(p)


def test_read_warc_responses_only(spark, warc_file):
    out = read_warc(spark, warc_file).orderBy("record_id").collect()
    assert [r["warc_type"] for r in out] == ["response", "response"]
    a, b = out
    assert a["record_id"] == "urn:uuid:a"
    assert a["target_uri"] == "https://example.com/a"
    assert bytes(a["payload"]) == b"<html>hello world</html>"
    assert a["content_type"] == "text/html"
    assert a["content_length"] == 24
    assert a["warc_date"] is not None and a["warc_date"].year == 2024
    assert bytes(b["payload"]) == b"B" * 100
    assert b["warc_file"].endswith("crawl.warc.gz")


def test_read_warc_all_types_and_truncation(spark, warc_file):
    allr = read_warc(spark, warc_file, record_types=None).collect()
    assert {r["warc_type"] for r in allr} == {"warcinfo", "response", "request"}
    # truncation caps the payload but keeps the DECLARED length
    t = read_warc(spark, warc_file, max_payload_bytes=10).orderBy("record_id").collect()
    big = [r for r in t if r["record_id"] == "urn:uuid:b"][0]
    assert len(bytes(big["payload"])) == 10 and big["content_length"] == 100
    # and parsing stays in sync for the records AFTER a truncated one
    assert len(t) == 2


def test_read_warc_plain_uncompressed(spark, tmp_path):
    p = tmp_path / "one.warc"
    p.write_bytes(_record("response", "http://x/", b"payload!"))
    out = read_warc(spark, str(p)).collect()
    assert len(out) == 1 and bytes(out[0]["payload"]) == b"payload!"


def test_read_wet_documents_shape(spark, tmp_path):
    recs = [
        _record("warcinfo", "", b"wet info"),
        _record(
            "conversion",
            "https://example.com/page",
            "extracted text with unicode: café\n".encode(),
            rec_id="urn:uuid:wet1",
            content_type="text/plain",
        ),
    ]
    p = tmp_path / "crawl.wet.gz"
    with open(p, "wb") as f:
        for r in recs:
            f.write(gzip.compress(r))
    out = read_wet(spark, str(p)).collect()
    assert len(out) == 1
    assert out[0]["text"] == "extracted text with unicode: café\n"
    assert out[0]["target_uri"] == "https://example.com/page"
    assert list(out[0].asDict()) == [
        "warc_file", "record_id", "target_uri", "warc_date", "text",
    ]


def test_read_warc_streaming_source(spark, tmp_path):
    src_dir = tmp_path / "crawl_in"
    src_dir.mkdir()
    with open(src_dir / "part1.warc.gz", "wb") as f:
        f.write(gzip.compress(_record("response", "http://s/1", b"stream one")))
        f.write(gzip.compress(_record("request", "http://s/1", b"GET")))
    with open(src_dir / "part2.warc.gz", "wb") as f:
        f.write(gzip.compress(_record("response", "http://s/2", b"stream two")))

    feats = read_warc(spark, str(src_dir), stream=True)
    assert feats.isStreaming
    sink = str(tmp_path / "sink")
    q = (
        feats.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink).orderBy("target_uri").collect()
    assert [r["target_uri"] for r in out] == ["http://s/1", "http://s/2"]
    assert [bytes(r["payload"]) for r in out] == [b"stream one", b"stream two"]


def test_read_warc_corrupt_tail_stops_cleanly(spark, tmp_path):
    good = _record("response", "http://ok/", b"fine")
    p = tmp_path / "bad.warc"
    p.write_bytes(good + b"NOT A WARC HEADER\r\ngarbage")
    out = read_warc(spark, str(p)).collect()
    # the good record parses; the corrupt remainder stops the file
    assert len(out) == 1 and out[0]["target_uri"] == "http://ok/"
