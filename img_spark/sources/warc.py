"""WARC source: Common-Crawl-style archives → the pages table.

The BASELINE input is an Iceberg/parquet table of Common-Crawl-style
pages; the upstream format those tables are built FROM is WARC
(ISO 28500 — what Common Crawl actually ships). This connector reads
WARC files (plain or gzip, including the member-per-record gzip layout
Common Crawl uses) into the engine's pages schema, so a user can point
the crawler at raw crawl archives without a separate ETL system.

Scale shape: files are read with Spark's ``binaryFile`` source — one
task per file (Common Crawl WARCs are ~1 GB, thousands per crawl, so
file-level parallelism saturates any cluster); record splitting and
HTTP parsing run in the task, Arrow-batched back. No shuffle anywhere.
The parser is a dependency-free subset: WARC/1.0-1.1 named fields,
Content-Length-framed payloads, ``response`` records with an HTTP/1.x
header block. Malformed records are skipped, never fatal (crawl
archives contain garbage by construction).

``text`` and ``lang`` are left empty: in Common Crawl those live in the
WET/metadata sidecars — join them afterwards, or derive text with the
engine's own extractor.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io

from pyspark.sql import DataFrame, SparkSession

_CRLF2 = b"\r\n\r\n"


def _maybe_gunzip(blob: bytes) -> bytes:
    if blob[:2] != b"\x1f\x8b":
        return blob
    # gzip with MULTIPLE members (Common Crawl: one member per record),
    # decompressed member-by-member so a corrupt/truncated TAIL member
    # loses only itself — gzip.GzipFile would throw away the whole file
    import zlib

    out, pos, n = [], 0, len(blob)
    view = memoryview(blob)  # zero-copy slices: a member-per-record
    # archive has tens of thousands of members, and bytes-slicing the
    # remainder per member would be O(n·members) memcpy
    while pos < n and blob[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(view[pos:]))
            d.flush()
        except zlib.error:
            break  # corrupt member: keep everything before it
        if not d.eof:
            break  # truncated final member
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def parse_warc(blob: bytes):
    """Yield dicts for each well-formed record: warc_type, url, date
    (datetime or None), http_status (int or None), content_type, body
    (payload bytes; for response records the HTTP body only)."""
    data = _maybe_gunzip(blob)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data.startswith(b"WARC/", pos):
            break  # no further records
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers: dict = {}
        lines = data[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:  # lines[0] is the WARC/x.y version
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break  # unframed record: cannot resync safely
        body_start = hdr_end + len(_CRLF2)
        payload = data[body_start:body_start + length]
        pos = body_start + length
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": _parse_date(headers.get("warc-date", "")),
            "http_status": None,
            "content_type": headers.get("content-type", ""),
            "body": payload,
        }
        if rec["warc_type"] == "response" and payload[:5] in (
            b"HTTP/",
        ):
            split = payload.find(_CRLF2)
            if split >= 0:
                status_line = payload[:payload.find(b"\r\n")]
                parts = status_line.split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                rec["body"] = payload[split + len(_CRLF2):]
        yield rec


def _parse_date(s: str):
    # WARC/1.0 whole seconds; WARC/1.1 allows fractional seconds
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def read_warc_pages(
    spark: SparkSession,
    path: str,
    status_ok_only: bool = True,
    dedup_urls: bool = True,
) -> DataFrame:
    """WARC file(s)/glob → the engine pages schema (url, warc_ts,
    html binary, text '', lang ''). ``response`` records only;
    ``status_ok_only`` keeps HTTP 2xx (the rows a crawl would have
    fetched). Real archives carry the same URL repeatedly (revisits,
    cross-segment duplicates) while the crawl fetch join assumes a
    unique-url pages table — ``dedup_urls`` keeps the NEWEST capture
    per url (one shuffle on url; pass False for raw record access)."""
    import pandas as pd

    from img_spark.sources.synthweb import PAGES_DDL

    files = spark.read.format("binaryFile").load(path)

    def run(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                try:
                    recs = parse_warc(bytes(blob))
                    for r in recs:
                        if r["warc_type"] != "response" or not r["url"]:
                            continue
                        if status_ok_only and not (
                            r["http_status"] is not None
                            and 200 <= r["http_status"] < 300
                        ):
                            continue
                        rows.append((
                            r["url"],
                            r["date"] or dt.datetime(1970, 1, 1),
                            r["body"],
                            "",
                            "",
                        ))
                except Exception:
                    continue  # corrupt archive member: skip the file tail
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    out = files.select("content").mapInPandas(run, schema=PAGES_DDL)
    if dedup_urls:
        from pyspark.sql import Window, functions as F

        w = Window.partitionBy("url").orderBy(
            F.desc("warc_ts"), F.desc(F.length("html"))
        )
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn")
        )
    return out


# ---------------------------------------------------------------- writer
def build_warc(records) -> bytes:
    """Synthesize a WARC byte stream (one gzip member per record, the
    Common Crawl layout) from (url, date, html_bytes, status) tuples —
    the test/fixture twin of the reader."""
    out = []
    for url, date, html, status in records:
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            "Content-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode() + html
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        out.append(gzip.compress(hdr + http + b"\r\n\r\n"))
    return b"".join(out)


def read_wet_text(spark: SparkSession, path: str) -> DataFrame:
    """WET sidecar (Common Crawl's extracted-text archives: WARC
    ``conversion`` records whose payload is plain UTF-8 text) →
    (url, text). Join onto ``read_warc_pages`` output to fill the
    pages table's ``text`` column:

        pages = read_warc_pages(spark, warc_glob)
        text  = read_wet_text(spark, wet_glob)
        full  = pages.drop("text").join(text, "url", "left") \\
                     .na.fill({"text": ""})

    Same execution shape as the WARC reader: binaryFile + mapInPandas,
    file-level parallelism, no shuffle (the join above broadcasts or
    co-partitions on url at Spark's discretion)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def run(batches):
        for pdf in batches:
            urls, texts = [], []
            for blob in pdf["content"]:
                try:
                    for r in parse_warc(bytes(blob)):
                        if r["warc_type"] != "conversion" or not r["url"]:
                            continue
                        urls.append(r["url"])
                        texts.append(
                            r["body"].decode("utf-8", "replace")
                        )
                except Exception:
                    continue
            yield pd.DataFrame({"url": urls, "text": texts})

    return files.select("content").mapInPandas(
        run, schema="url string, text string"
    )


def build_wet(records) -> bytes:
    """Synthesize a WET byte stream from (url, date, text) tuples —
    the test twin of ``read_wet_text``."""
    out = []
    for url, date, text in records:
        body = text.encode()
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        out.append(gzip.compress(hdr + body + b"\r\n\r\n"))
    return b"".join(out)
