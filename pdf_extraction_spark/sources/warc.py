"""Minimal WARC/1.0 source — the format Common Crawl actually ships.

Pure-Python reader/writer for the subset the pages pipeline needs:
``response`` records with an HTTP payload. The Spark reader pairs
``binaryFile`` (whole-file splits — WARC members aren't arbitrarily
splittable without an index) with a ``mapInPandas`` record parser, so a
directory of .warc files becomes the standard pages frame.

Format per ISO 28500: records are ``WARC/1.0\\r\\n`` + header lines +
``\\r\\n`` + Content-Length body + ``\\r\\n\\r\\n``. Response records
carry an HTTP response whose body is the page payload.
"""

from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .pages import PAGES_SCHEMA

CRLF = b"\r\n"


def write_warc(records, path: str):
    """records: iterable of (url, iso_ts, content_type, payload_bytes) →
    one .warc file (uncompressed)."""
    with open(path, "wb") as f:
        for url, iso_ts, content_type, payload in records:
            http = (
                b"HTTP/1.1 200 OK" + CRLF
                + b"Content-Type: " + content_type.encode("ascii") + CRLF
                + b"Content-Length: " + str(len(payload)).encode("ascii") + CRLF
                + CRLF
                + payload
            )
            headers = (
                b"WARC/1.0" + CRLF
                + b"WARC-Type: response" + CRLF
                + b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
                + b"WARC-Date: " + iso_ts.encode("ascii") + CRLF
                + b"Content-Type: application/http; msgtype=response" + CRLF
                + b"Content-Length: " + str(len(http)).encode("ascii") + CRLF
            )
            f.write(headers + CRLF + http + CRLF + CRLF)


def gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (Common Crawl gzips each
    WARC record separately; decompressing the stream re-concatenates
    them)."""
    import zlib

    out = []
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def iter_warc_records(data: bytes):
    """Yield (headers_dict, body_bytes) for each WARC record."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(CRLF + CRLF, start)
        if head_end < 0:
            break
        headers = {}
        for line in data[start:head_end].split(CRLF)[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
                    "utf-8", "replace"
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + 4
        body = data[body_start : body_start + length]
        yield headers, body
        pos = body_start + length


def _http_payload(body: bytes):
    """Split an HTTP response message into (content_type, payload)."""
    sep = body.find(CRLF + CRLF)
    if sep < 0:
        return "", body
    ctype = ""
    for line in body[:sep].split(CRLF):
        if line.lower().startswith(b"content-type:"):
            ctype = line.split(b":", 1)[1].strip().decode("ascii", "replace")
            break
    return ctype, body[sep + 4 :]


def parse_warc_bytes(data: bytes):
    """WARC file bytes (plain or gzipped) → list of pages-shaped dicts."""
    if data[:2] == b"\x1f\x8b":
        data = gunzip_members(data)
    rows = []
    for headers, body in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).astimezone(
                timezone.utc
            ).replace(tzinfo=None)
        except ValueError:
            ts = None
        _ctype, payload = _http_payload(body)
        rows.append(
            {"url": url, "warc_ts": ts, "html": payload, "text": None, "lang": None}
        )
    return rows


def parse_wet_bytes(data: bytes):
    """WET (extracted-text WARC) bytes → pages rows with ``text``
    pre-filled: ``conversion`` records carry plain UTF-8 text, not HTTP
    (the Common Crawl WET sidecar format)."""
    if data[:2] == b"\x1f\x8b":
        data = gunzip_members(data)
    rows = []
    for headers, body in iter_warc_records(data):
        if headers.get("warc-type") != "conversion":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).astimezone(
                timezone.utc
            ).replace(tzinfo=None)
        except ValueError:
            ts = None
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": None,
                "text": body.decode("utf-8", errors="replace"),
                "lang": None,
            }
        )
    return rows


def write_wet(records, path: str):
    """records: iterable of (url, iso_ts, text) → one .wet file."""
    with open(path, "wb") as f:
        for url, iso_ts, text in records:
            body = text.encode("utf-8")
            headers = (
                b"WARC/1.0" + CRLF
                + b"WARC-Type: conversion" + CRLF
                + b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
                + b"WARC-Date: " + iso_ts.encode("ascii") + CRLF
                + b"Content-Type: text/plain" + CRLF
                + b"Content-Length: " + str(len(body)).encode("ascii") + CRLF
            )
            f.write(headers + CRLF + body + CRLF + CRLF)


def read_wet(spark: SparkSession, glob: str) -> DataFrame:
    """Directory/glob of .wet(.gz) files → pages frame with ``text``
    already extracted (skips the extraction stage entirely — the corpus
    path when Common Crawl's own extraction is acceptable)."""
    raw = spark.read.format("binaryFile").load(glob).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for data in pdf["content"]:
                rows.extend(parse_wet_bytes(bytes(data)))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return raw.mapInPandas(parse, schema=PAGES_SCHEMA)


def read_warc(spark: SparkSession, glob: str) -> DataFrame:
    """Directory/glob of .warc files → pages frame.

    binaryFile gives one row per file; the record parser fans out to one
    row per response record inside a ``mapInPandas`` (records of one
    file stay in one task — WARC isn't block-splittable; parallelism
    comes from file count, which is how Common Crawl shards anyway)."""
    raw = spark.read.format("binaryFile").load(glob).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for data in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(data)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return raw.mapInPandas(parse, schema=PAGES_SCHEMA)
