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


def test_warc_parser_payload_cannot_confuse_framing():
    """Property: framing is Content-Length-driven, so payload bytes —
    including embedded 'WARC/1.0' lines and CRLF header lookalikes —
    never desync the parser."""
    import io

    from hypothesis import given
    from hypothesis import strategies as st

    from tsflex_spark.sources.warc import _parse_warc_stream

    adversarial = st.binary(max_size=200) | st.sampled_from(
        [
            b"WARC/1.0\r\nWARC-Type: response\r\n\r\n",
            b"\r\n\r\nContent-Length: 999\r\n",
            b"WARC/",
        ]
    )

    @given(payloads=st.lists(adversarial, min_size=1, max_size=5))
    def check(payloads):
        blob = b"".join(
            _record("response", f"http://p/{i}", p, rec_id=f"urn:uuid:{i}")
            for i, p in enumerate(payloads)
        )
        recs = list(_parse_warc_stream(io.BytesIO(blob), {"response"}, None))
        assert [r["payload"] for r in recs] == payloads
        assert [r["record_id"] for r in recs] == [
            f"urn:uuid:{i}" for i in range(len(payloads))
        ]

    check()


def test_html_to_text_extraction(spark):
    from tsflex_spark.datapipe.text import html_to_text

    html = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        "<html><head><title>skip me</title><style>body{color:red}</style></head>"
        "<body><script>var x=1; if(x<2){alert('skip')}</script>"
        "<!-- a comment -->"
        "<h1>Title &amp; More</h1>"
        "<p>First &lt;paragraph&gt; with <b>bold</b> text.</p>"
        "<div>Second&nbsp;block</div>"
        "<ul><li>one</li><li>two</li></ul></body></html>"
    )
    df = spark.createDataFrame([(1, html.encode()), (2, b"plain, no markup")],
                               "doc_id long, payload binary")
    out = {r["doc_id"]: r["text"] for r in
           html_to_text(df, "payload").collect()}
    t = out[1]
    assert "skip" not in t and "color:red" not in t and "comment" not in t
    assert "Title & More" in t
    assert "First <paragraph> with bold text." in t
    assert "Second block" in t
    # block tags produced line structure
    lines = t.split("\n")
    assert "one" in lines and "two" in lines
    # HTTP headers stripped
    assert "200 OK" not in t and "Content-Type" not in t
    # non-HTML row passes through
    assert out[2] == "plain, no markup"
    # string input + keep headers path
    sdf = spark.createDataFrame([(3, "<p>hi</p>")], "doc_id long, page string")
    got = html_to_text(sdf, "page", strip_http_headers=False).collect()[0]["text"]
    assert got == "hi"


def test_read_warc_corrupt_tail_stops_cleanly(spark, tmp_path):
    good = _record("response", "http://ok/", b"fine")
    p = tmp_path / "bad.warc"
    p.write_bytes(good + b"NOT A WARC HEADER\r\ngarbage")
    out = read_warc(spark, str(p)).collect()
    # the good record parses; the corrupt remainder stops the file
    assert len(out) == 1 and out[0]["target_uri"] == "http://ok/"
