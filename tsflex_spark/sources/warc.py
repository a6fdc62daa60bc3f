"""WARC / WET source: CommonCrawl-style web-archive ingestion.

The entry point of a web-scale text pipeline is a pile of ``.warc.gz`` /
``.wet.gz`` archives (ISO 28500; CommonCrawl publishes ~90k of them per
crawl). This reader turns them into the ``documents``-shaped frame the
rest of ``datapipe/`` consumes (clean_corpus → dedup → …) with no
external dependency — parsing is stdlib ``gzip`` + header splitting.

Scale design:

- **One task per archive file.** Gzip members are not splittable, and
  CommonCrawl sizes archives (~1 GB) for exactly this unit of work —
  every production Spark/Hadoop WARC reader does file-granular tasks.
  The file list comes from Spark's ``binaryFile`` source, so globs,
  s3a://, hdfs:// and partition-discovery all work and the scheduler
  balances files across executors.
- **Streaming decompression.** Each task holds one file's COMPRESSED
  bytes (the ``binaryFile`` row) and decompresses through a streaming
  ``GzipFile`` (multi-member aware — CommonCrawl gzips each record as
  its own member), so peak memory is compressed size + one record, not
  the ~4-5x decompressed archive.
- **Early projection + truncation.** ``record_types`` filters at parse
  time (a 'response'-only read never materializes request/metadata
  payloads) and ``max_payload_bytes`` caps a pathological record before
  it is buffered, so one 2 GB megapage cannot OOM the task.

Output schema (one row per kept record):
``(warc_file string, record_id string, warc_type string, target_uri
string, warc_date timestamp, content_type string, content_length long,
payload binary | text string)`` — ``read_wet`` decodes the payload to
``text`` (WET files are UTF-8 extracted text by construction);
``read_warc`` keeps raw ``payload`` bytes (HTML, images, anything) plus
the declared ``content_type`` so multimodal consumers
(`datapipe/multimodal.py`) can route on it.
"""

from __future__ import annotations

import io
from typing import Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, payload binary"
)


def _parse_warc_stream(
    stream, record_types: Optional[set], max_payload: Optional[int]
) -> Iterator[dict]:
    """Yield parsed records from a decompressed WARC byte stream.

    WARC framing: ``WARC/1.x`` version line, CRLF header block, empty
    line, ``Content-Length`` payload bytes, two CRLFs. Tolerant of the
    LF-only variants some writers emit.
    """
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            # resync: not a record boundary (corrupt remainder) — stop
            # this file rather than misparse payload bytes as headers
            return
        headers = {}
        while True:
            h = stream.readline()
            if not h or h.strip() == b"":
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            return
        wtype = headers.get(b"warc-type", b"").decode("ascii", "replace")
        keep = record_types is None or wtype in record_types
        if keep:
            take = length if max_payload is None else min(length, max_payload)
            payload = stream.read(take)
            if take < length:
                _discard(stream, length - take)
        else:
            _discard(stream, length)
            payload = b""
        if keep:
            yield {
                "record_id": headers.get(b"warc-record-id", b"").decode(
                    "ascii", "replace"
                ).strip("<>"),
                "warc_type": wtype,
                "target_uri": headers.get(b"warc-target-uri", b"").decode(
                    "utf-8", "replace"
                ).strip("<>"),
                "warc_date": headers.get(b"warc-date", b"").decode(
                    "ascii", "replace"
                ),
                "content_type": headers.get(b"content-type", b"").decode(
                    "ascii", "replace"
                ),
                "content_length": length,
                "payload": payload,
            }


def _discard(stream, n: int) -> None:
    while n > 0:
        chunk = stream.read(min(n, 1 << 20))
        if not chunk:
            return
        n -= len(chunk)


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    record_types: Sequence[str] = ("response",),
    max_payload_bytes: Optional[int] = None,
    stream: bool = False,
) -> DataFrame:
    """Read ``.warc(.gz)`` archives into one row per record.

    ``path`` is anything Spark's ``binaryFile`` source accepts (glob,
    directory, s3a/hdfs). ``record_types`` keeps only those WARC-Type
    values (``None`` keeps all); ``max_payload_bytes`` truncates each
    record's payload at parse time. ``warc_date`` is parsed to a
    timestamp column (NULL when absent/invalid).

    ``stream=True`` reads the same path as a STREAMING source (Spark's
    file stream: new archives appearing under the path become
    micro-batch input) — the parse is a narrow ``mapInPandas``, so the
    continuous-ingestion plan is identical to the batch one; compose
    with the stream-safe curation ops (``redact_pii``, ``filter_lines``,
    ``score_quality_local``, ``dedup_exact_stream``) for a live crawl
    pipeline.
    """
    kept = set(record_types) if record_types is not None else None
    maxp = max_payload_bytes

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                raw = io.BytesIO(bytes(blob))
                src = (
                    gzip.GzipFile(fileobj=raw)  # multi-member aware
                    if fpath.endswith(".gz")
                    else raw
                )
                rows = []
                for rec in _parse_warc_stream(src, kept, maxp):
                    rec["warc_file"] = fpath
                    rows.append(rec)
                if rows:
                    yield pd.DataFrame(rows)

    if stream:
        # streaming file sources require an explicit schema; binaryFile's
        # is fixed by the format
        reader = spark.readStream.format("binaryFile").schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
    else:
        reader = spark.read.format("binaryFile")
    files = reader.load(path).select("path", "content")
    out = files.mapInPandas(parse, _WARC_SCHEMA)
    return out.withColumn(
        "warc_date", F.try_to_timestamp(F.col("warc_date"))
    )


def read_wet(
    spark: SparkSession,
    path: str,
    *,
    max_payload_bytes: Optional[int] = None,
    stream: bool = False,
) -> DataFrame:
    """Read CommonCrawl ``.wet(.gz)`` extracted-text archives into a
    ``documents``-shaped frame: ``(warc_file, record_id, target_uri,
    warc_date, text)`` — one row per conversion record, payload decoded
    as UTF-8 (WET payloads are text by construction). Feed straight into
    ``datapipe.pipeline.clean_corpus``.
    """
    out = read_warc(
        spark,
        path,
        record_types=("conversion",),
        max_payload_bytes=max_payload_bytes,
        stream=stream,
    )
    return out.select(
        "warc_file",
        "record_id",
        "target_uri",
        "warc_date",
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )
