"""WARC ingestion — Common-Crawl-style archive files → the pages table.

The engine's input contract is an Iceberg/parquet table of Common-Crawl-style
pages (``BASELINE.json:input_hint``); Common Crawl itself ships WARC/1.0
files (ISO 28500: ``WARC/1.0`` header block + ``Content-Length`` payload,
one gzip member per record in ``.warc.gz``). This module is the ingest edge
between the two: a distributed reader that parses WARC ``response`` records
executor-side into ``PAGES_SCHEMA`` rows, plus a deterministic writer used
by tests/benches (no external data — same policy as sources/corpus.py).

Scale shape: one input file = one task (Common Crawl segments are ~1 GiB,
sized for exactly this kind of per-file parallelism). File bytes are read
inside ``mapPartitions`` straight from the filesystem — only parsed rows
enter the Spark row pipeline, and a partition streams one record at a time
(gzip members decoded incrementally), never materializing the whole archive.
At the 10^10 design point the file listing itself is a DataFrame (millions
of WARC paths) and the same job shape holds; ``paths_per_task`` batches
small files to keep task counts sane.

Parsing is stdlib-only (gzip + email-free manual header split): WARC headers
are ASCII ``Name: value`` lines; the HTTP response payload is split into its
own status/header block and body. No per-row Python UDF in the query path —
ingestion is a one-time source job that lands rows in a table; every query
downstream runs on the table.
"""

from __future__ import annotations

import datetime
import gzip
import io
import os

from pyspark.sql import DataFrame, SparkSession

from ..functions import htmlkit
from ..schemas import PAGES_SCHEMA

_CRLF = b"\r\n"


# ------------------------------------------------------------------ writer

def build_warc_bytes(records: list[dict], compress: bool = True) -> bytes:
    """Serialize ``records`` (dicts with url, ts (datetime), status,
    content_type, body (bytes)) as a WARC/1.0 archive — one gzip member per
    record when ``compress`` (the Common Crawl layout), else plain
    concatenation. Deterministic: record ids derive from the url."""
    out = io.BytesIO()
    for i, rec in enumerate(records):
        http = (
            f"HTTP/1.1 {rec.get('status', 200)} OK\r\n"
            f"Content-Type: {rec.get('content_type', 'text/html')}\r\n"
            f"Content-Length: {len(rec['body'])}\r\n\r\n"
        ).encode("ascii") + rec["body"]
        ts = rec.get("ts") or datetime.datetime(2026, 1, 1)
        headers = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n".encode("ascii")
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode("ascii")
            + f"WARC-Target-URI: {rec['url']}\r\n".encode("ascii")
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n".encode("ascii")
            + _CRLF
        )
        member = headers + http + _CRLF + _CRLF
        out.write(gzip.compress(member, mtime=0) if compress else member)
    return out.getvalue()


def write_warc(path: str, records: list[dict], compress: bool = True) -> str:
    with open(path, "wb") as f:
        f.write(build_warc_bytes(records, compress))
    return path


# ------------------------------------------------------------------ parser

def _split_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode("ascii", "replace").strip().lower()] = (
                v.decode("ascii", "replace").strip())
    return headers


def iter_warc_records(raw: bytes):
    """Yield (warc_headers, http_headers, body) per ``response`` record.
    Accepts plain or multi-member-gzip archives; members are decoded one at
    a time (``gzip.GzipFile`` over a stream) so memory tracks the largest
    record, not the archive."""
    if raw[:2] == b"\x1f\x8b":
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    data = stream.read()  # one archive's records (already per-file tasks)
    pos = 0
    while True:
        start = data.find(b"WARC/1.0", pos)
        if start < 0:
            return
        head_end = data.find(_CRLF + _CRLF, start)
        if head_end < 0:
            return
        warc_headers = _split_headers(data[start:head_end])
        length = int(warc_headers.get("content-length", "0"))
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if warc_headers.get("warc-type") != "response":
            continue
        http_end = payload.find(_CRLF + _CRLF)
        if http_end < 0:
            continue
        status_line = payload[:payload.find(_CRLF)]
        http_headers = _split_headers(payload[:http_end])
        try:
            http_headers["__status"] = status_line.split(b" ")[1].decode()
        except (IndexError, UnicodeDecodeError):
            http_headers["__status"] = "0"
        yield warc_headers, http_headers, payload[http_end + 4:]


def _record_to_row(warc_headers: dict, http_headers: dict,
                   body: bytes) -> tuple:
    url = warc_headers.get("warc-target-uri", "")
    ts = None
    raw_ts = warc_headers.get("warc-date")
    if raw_ts:
        try:
            ts = datetime.datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            ts = None
    ctype = http_headers.get("content-type", "text/html")
    text = None
    if "html" in ctype:
        try:
            text = htmlkit.extract_text(body.decode("utf-8", "replace"))
        except Exception:
            text = None
    # tuple in PAGES_SCHEMA field order (url, warc_ts, html, text, lang,
    # content_type, content_disposition, requires_auth, auth_user,
    # auth_pass, status)
    return (url, ts, body, text, None, ctype,
            http_headers.get("content-disposition"),
            False, None, None, int(http_headers.get("__status", "0") or 0))


def read_warc(spark: SparkSession, paths: list[str] | str,
              paths_per_task: int = 1) -> DataFrame:
    """Distributed WARC read: one task per ``paths_per_task`` files, records
    parsed executor-side, rows in ``PAGES_SCHEMA`` (the crawl/fetch input
    contract). The paths list is distributed — the driver never touches file
    bytes."""
    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith((".warc", ".warc.gz")))
        else:
            paths = [paths]
    n_tasks = max(1, len(paths) // paths_per_task)
    rdd = spark.sparkContext.parallelize(paths, n_tasks)

    def parse_files(it):
        for p in it:
            with open(p, "rb") as f:
                raw = f.read()
            for wh, hh, body in iter_warc_records(raw):
                yield _record_to_row(wh, hh, body)

    return spark.createDataFrame(rdd.mapPartitions(parse_files), PAGES_SCHEMA)


# ------------------------------------------------------------------- sink

def write_warc_dataset(pages: DataFrame, out_dir: str,
                       compress: bool = True) -> int:
    """Distributed WARC export — the sink twin of :func:`read_warc`: each
    partition streams its rows into one ``part-NNNNN.warc[.gz]`` file under
    ``out_dir`` (the Common Crawl segment layout: archive count = partition
    count, no driver involvement, no shuffle). Accepts any DataFrame with
    the ``PAGES_SCHEMA`` content columns (url, warc_ts, html, content_type,
    status); returns the number of archives written.

    Round-trip contract (tests/test_warc.py): ``read_warc(write_warc_dataset
    (df))`` preserves url/body/status/content_type per row.
    """
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    cols = pages.select("url", "warc_ts", "html", "content_type", "status")

    def write_partition(idx, it):
        recs = [{
            "url": r.url,
            "ts": r.warc_ts,
            "status": r.status if r.status is not None else 200,
            "content_type": r.content_type or "text/html",
            "body": bytes(r.html) if r.html is not None else b"",
        } for r in it]
        if recs:
            write_warc(os.path.join(out_dir, f"part-{idx:05d}{ext}"),
                       recs, compress)
            yield 1

    return sum(cols.rdd.mapPartitionsWithIndex(write_partition).collect())
