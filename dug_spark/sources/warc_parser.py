"""WARC (ISO 28500 / WARC-1.1) source: the container format Common Crawl
ships web pages in — the real-world ingest for the BASELINE input table
(url, warc_ts, html, ...).

The reference loads pre-fetched files from a local directory
(/root/reference/src/dug/core/loaders/filesystem_loader.py); at web scale
the same role is "read the crawl's WARC segments".  This module is a
from-spec parser (no external WARC library in the sandbox, and none
needed): a WARC file is a sequence of records, each

    WARC/1.0\\r\\n
    <named-field>: <value>\\r\\n ...        (incl. Content-Length: N)
    \\r\\n
    <N block bytes>
    \\r\\n\\r\\n                              (record separator)

and for ``WARC-Type: response`` records the block is an HTTP/1.1
response (status line + headers + \\r\\n\\r\\n + payload).  ``.warc.gz``
files are concatenated per-record gzip members (the Common Crawl
layout) — handled with stdlib zlib, member by member.

Spark-native shape: files arrive as a ``binaryFile`` scan (one Arrow
batch of whole files per task — WARC segments are written ~1 GiB each
exactly so that one file is one work unit) and records are emitted from
``mapInPandas``; no driver-side parsing, no shuffle.  Parsing is
per-file imperative byte-walking — genuinely outside DataFrame algebra,
the documented Pandas-UDF escape hatch.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_RECORDS = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("record_type", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("content_type", StringType(), True),
        StructField("html", BinaryType(), True),
    ]
)

_CRLF = b"\r\n"


def build_warc_record(
    url: str,
    date_iso: str,
    payload: bytes,
    record_type: str = "response",
    http_status: int = 200,
    content_type: str = "text/html",
) -> bytes:
    """One spec-conformant WARC/1.0 record (response records wrap the
    payload in an HTTP/1.1 response block).  Deterministic — used to
    synthesize test/oracle corpora; also the writer half of a WARC
    round-trip."""
    if record_type == "response":
        block = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("ascii") + payload
        block_ct = 'application/http; msgtype=response'
    else:
        block = payload
        block_ct = content_type
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {record_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date_iso}\r\n"
        f"WARC-Record-ID: <urn:uuid:{zlib.crc32(url.encode('utf-8')):012d}>\r\n"
        f"Content-Type: {block_ct}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode("ascii")
    return head + block + _CRLF + _CRLF


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress concatenated gzip members (the .warc.gz layout: one
    member per record) with stdlib zlib; yields decompressed chunks."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        yield d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # trailing garbage — stop rather than spin
            return
        pos += consumed


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes (plain or .gz) into record dicts:
    {url, warc_date (aware datetime), record_type, http_status,
    content_type, payload (bytes)}.

    Spec-driven framing: the block length comes from ``Content-Length``
    alone (never by scanning for separators — payloads legally contain
    ``\\r\\n\\r\\n``); for response records the HTTP header/payload split
    is the FIRST ``\\r\\n\\r\\n`` inside the block, per RFC 9112 §2.1."""
    if data[:2] == b"\x1f\x8b":
        data = b"".join(_gzip_members(data))
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding (separator CRLFs)
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break  # truncated trailer — tolerate, like real crawl tails
        head_lines = data[pos:hdr_end].split(_CRLF)
        if not head_lines or not head_lines[0].startswith(b"WARC/"):
            break
        fields: dict[str, str] = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break  # unframeable record: cannot locate the next one
        block_start = hdr_end + 4
        block = data[block_start : block_start + length]
        pos = block_start + length
        rec_type = fields.get("warc-type", "")
        status: int | None = None
        ctype: str | None = None
        payload = block
        if rec_type == "response" and block[:5] == b"HTTP/":
            http_end = block.find(_CRLF + _CRLF)
            if http_end >= 0:
                http_lines = block[:http_end].split(_CRLF)
                parts = http_lines[0].split(b" ", 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in http_lines[1:]:
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-type":
                        ctype = v.strip().decode("utf-8", "replace")
                payload = block[http_end + 4 :]
        ts = None
        date = fields.get("warc-date")
        if date:
            try:
                ts = datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ").replace(
                    tzinfo=timezone.utc
                )
            except ValueError:
                ts = None
        out.append(
            {
                "url": fields.get("warc-target-uri"),
                "warc_date": ts,
                "record_type": rec_type,
                "http_status": status,
                "content_type": ctype,
                "payload": payload,
            }
        )
    return out


def _records_df(files: DataFrame, record_types: tuple[str, ...]) -> DataFrame:
    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for _, f in pdf.iterrows():
                for r in parse_warc_bytes(bytes(f["content"])):
                    if record_types and r["record_type"] not in record_types:
                        continue
                    rows.append(
                        {
                            "url": r["url"],
                            "warc_ts": r["warc_date"],
                            "record_type": r["record_type"],
                            "http_status": r["http_status"],
                            "content_type": r["content_type"],
                            "html": r["payload"],
                        }
                    )
            yield pd.DataFrame(
                {
                    c: pd.Series(
                        [row[c] for row in rows], dtype="object"
                    )
                    for c in WARC_RECORDS.fieldNames()
                }
            )

    return files.mapInPandas(parse_batches, schema=WARC_RECORDS)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response", "resource"),
) -> DataFrame:
    """WARC files under ``path`` (glob ok; ``.warc`` or ``.warc.gz``) →
    (url, warc_ts, record_type, http_status, content_type, html).
    Default keeps the two payload-bearing record types; pass ``()`` for
    every record (request/metadata/warcinfo included, payload = raw
    block)."""
    files = (
        spark.read.format("binaryFile").load(path).select("path", "content")
    )
    return _records_df(files, record_types)


def parse_warc_column(
    df: DataFrame,
    content_col: str = "content",
    record_types: tuple[str, ...] = ("response", "resource"),
) -> DataFrame:
    """Same extraction over an in-DataFrame binary column of whole WARC
    files (e.g. synthesized segments, or files already landed in a
    table) — the testable core of :func:`read_warc`."""
    return _records_df(df.select(F.col(content_col).alias("content")), record_types)


def warc_to_corpus(records: DataFrame) -> DataFrame:
    """Lift parsed WARC records to the BASELINE corpus shape
    (url, warc_ts, html, text, lang): keep HTTP-200 text/html responses,
    extract text with the pipeline's byte-identical extractor, lang NULL
    (language-ID is a downstream operator — textstats.lang_id*)."""
    from ..functions.text import extract_text_udf

    kept = records.where(
        (F.col("record_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
        & F.col("url").isNotNull()
    )
    return kept.select(
        "url",
        "warc_ts",
        "html",
        extract_text_udf(F.col("html")).alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
