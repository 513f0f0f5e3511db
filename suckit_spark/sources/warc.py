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


class WarcFormatError(ValueError):
    """A malformed record: non-WARC leading line, or a missing / invalid /
    truncated ``Content-Length``. Record framing in WARC is length-prefixed;
    without a trustworthy length the only safe recovery boundary is the next
    gzip member (scanning payload BYTES for ``WARC/1.0`` can resurrect
    garbage records out of response bodies that merely contain that
    string)."""


def _gzip_members(fp, chunk_size: int = 1 << 20):
    """Decompress a multi-member gzip stream one member at a time,
    incrementally (``zlib.decompressobj(wbits=31)`` stops at each member
    boundary): memory holds one decompressed member — one record in the
    Common Crawl layout — never the archive.

    A corrupt member (bad gzip header or deflate data → ``zlib.error``) is
    DROPPED, not raised: parsing resyncs at the next gzip magic in the
    COMPRESSED stream. This is the member-boundary recovery the WARC error
    policy promises — scanning compressed bytes for ``\\x1f\\x8b`` is safe
    where scanning decompressed payloads for ``WARC/1.0`` is not, because a
    false-positive magic merely makes the next decompress attempt fail and
    resync again; it can never fabricate a record."""
    import zlib

    tail = b""
    while True:
        data = tail or fp.read(chunk_size)
        if not data:
            return
        d = zlib.decompressobj(wbits=31)
        out = []
        corrupt = False
        first_chunk = True
        while True:
            try:
                out.append(d.decompress(data))
            except zlib.error:
                corrupt = True
                break
            if d.eof:
                tail = d.unused_data
                break
            first_chunk = False
            data = fp.read(chunk_size)
            if not data:          # truncated final member
                tail = b""
                break
        if corrupt:
            # Resync: find the next gzip magic at/after the failing chunk.
            # Skip offset 0 only when the error hit the member's own first
            # chunk (its leading magic must not re-match); a magic split
            # across chunk boundaries is caught by the 1-byte carry.
            buf, search_from = data, (1 if first_chunk else 0)
            while True:
                i = buf.find(b"\x1f\x8b", search_from)
                if i >= 0:
                    tail = buf[i:]
                    break
                nxt = fp.read(chunk_size)
                if not nxt:
                    return
                buf, search_from = buf[-1:] + nxt, 0
            continue
        member = b"".join(out)
        if member:
            yield member
        if not d.eof and not tail:
            return


def _read_record(fp):
    """Read ONE length-framed record off ``fp``: header block, then exactly
    ``Content-Length`` payload bytes. Returns ``(warc_headers, payload)`` or
    ``None`` at EOF; raises :class:`WarcFormatError` on malformed framing."""
    line = fp.readline()
    while line in (b"\r\n", b"\n"):      # inter-record separators
        line = fp.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise WarcFormatError(f"expected a WARC/ version line, got "
                              f"{line[:40]!r}")
    header_lines = []
    while True:
        hl = fp.readline()
        if hl in (b"\r\n", b"\n", b""):
            break
        header_lines.append(hl)
    warc_headers = _split_headers(b"".join(header_lines))
    try:
        length = int(warc_headers["content-length"])
        if length < 0:
            raise ValueError(length)
    except (KeyError, ValueError):
        raise WarcFormatError("missing or invalid Content-Length") from None
    payload = fp.read(length)
    if len(payload) < length:
        raise WarcFormatError("payload truncated mid-record")
    return warc_headers, payload


def _response_record(warc_headers: dict, payload: bytes):
    """(warc_headers, http_headers, body) for a ``response`` record, else
    ``None``."""
    if warc_headers.get("warc-type") != "response":
        return None
    http_end = payload.find(_CRLF + _CRLF)
    if http_end < 0:
        return None
    status_line = payload[:payload.find(_CRLF)]
    http_headers = _split_headers(payload[:http_end])
    try:
        http_headers["__status"] = status_line.split(b" ")[1].decode()
    except (IndexError, UnicodeDecodeError):
        http_headers["__status"] = "0"
    return warc_headers, http_headers, payload[http_end + 4:]


def iter_warc_records(source):
    """Yield (warc_headers, http_headers, body) per ``response`` record.

    ``source`` is a seekable binary file object or ``bytes``; plain and
    multi-member-gzip archives are both accepted. Records are parsed
    record-at-a-time off the stream — gzip members decoded incrementally,
    payloads read by their ``Content-Length`` — so memory tracks the largest
    record, never the archive (the Common Crawl design point is ~1 GiB
    compressed segments; whole-archive materialization is an executor OOM).

    Error policy: a record with a missing/invalid/truncated Content-Length
    is a parse error, NOT a resync point — in a ``.warc.gz`` the rest of
    that gzip member is skipped and parsing resumes at the next member; in a
    plain ``.warc`` there is no safe boundary left, so the remainder of the
    file is dropped. Payload bytes are never scanned for ``WARC/1.0``: a
    response body that happens to contain that string must not fabricate
    records."""
    if isinstance(source, (bytes, bytearray)):
        fp = io.BytesIO(bytes(source))
    else:
        fp = source
    head = fp.read(2)
    fp.seek(-len(head), io.SEEK_CUR)
    if head == b"\x1f\x8b":
        for member in _gzip_members(fp):
            mfp = io.BytesIO(member)
            try:
                while True:
                    rec = _read_record(mfp)
                    if rec is None:
                        break
                    got = _response_record(*rec)
                    if got is not None:
                        yield got
            except WarcFormatError:
                continue          # recover at the next member boundary
    else:
        try:
            while True:
                rec = _read_record(fp)
                if rec is None:
                    return
                got = _response_record(*rec)
                if got is not None:
                    yield got
        except WarcFormatError:
            return                # no safe resync boundary in plain WARC


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
                for wh, hh, body in iter_warc_records(f):
                    yield _record_to_row(wh, hh, body)

    return spark.createDataFrame(rdd.mapPartitions(parse_files), PAGES_SCHEMA)


# -------------------------------------------------------- WET (text side)

def build_wet_bytes(records: list[dict], compress: bool = True) -> bytes:
    """Serialize ``records`` (dicts with url, ts (datetime), text (str)) as
    a WET archive — Common Crawl's extracted-text sibling of WARC:
    ``WARC-Type: conversion`` records whose payload is the plain UTF-8 text
    of the page (no HTTP envelope). One gzip member per record when
    ``compress``. Deterministic, same policy as :func:`build_warc_bytes`."""
    out = io.BytesIO()
    for i, rec in enumerate(records):
        body = rec["text"].encode("utf-8")
        ts = rec.get("ts") or datetime.datetime(2026, 1, 1)
        headers = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n".encode("ascii")
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode("ascii")
            + f"WARC-Target-URI: {rec['url']}\r\n".encode("ascii")
            + b"Content-Type: text/plain\r\n"
            + f"Content-Length: {len(body)}\r\n".encode("ascii")
            + _CRLF
        )
        member = headers + body + _CRLF + _CRLF
        out.write(gzip.compress(member, mtime=0) if compress else member)
    return out.getvalue()


def write_wet(path: str, records: list[dict], compress: bool = True) -> str:
    with open(path, "wb") as f:
        f.write(build_wet_bytes(records, compress))
    return path


def iter_wet_records(source):
    """Yield ``(warc_headers, text)`` per ``conversion`` record. Framing,
    streaming, and corrupt-member recovery are shared with
    :func:`iter_warc_records`'s machinery (length-prefixed records, gzip
    member resync, no payload scanning); non-conversion records are
    skipped, payload bytes decode as UTF-8 with replacement."""
    if isinstance(source, (bytes, bytearray)):
        fp = io.BytesIO(bytes(source))
    else:
        fp = source
    head = fp.read(2)
    fp.seek(-len(head), io.SEEK_CUR)

    def records_of(stream):
        while True:
            rec = _read_record(stream)
            if rec is None:
                return
            yield rec

    if head == b"\x1f\x8b":
        for member in _gzip_members(fp):
            mfp = io.BytesIO(member)
            try:
                for wh, payload in records_of(mfp):
                    if wh.get("warc-type") == "conversion":
                        yield wh, payload.decode("utf-8", "replace")
            except WarcFormatError:
                continue          # recover at the next member boundary
    else:
        try:
            for wh, payload in records_of(fp):
                if wh.get("warc-type") == "conversion":
                    yield wh, payload.decode("utf-8", "replace")
        except WarcFormatError:
            return                # no safe resync boundary in plain WET

#: What read_wet produces — the text-side ingest contract (url + capture
#: time + extracted text), convertible to the documents table via
#: :func:`wet_to_documents`.
WET_SCHEMA = "url string, warc_ts timestamp, text string"


def read_wet(spark: SparkSession, paths: list[str] | str,
             paths_per_task: int = 1) -> DataFrame:
    """Distributed WET read — Common Crawl's extracted-text segments
    straight into (url, warc_ts, text) rows, one task per
    ``paths_per_task`` files, records parsed executor-side (same job shape
    as :func:`read_warc`; ~150 MiB compressed per real WET segment)."""
    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith((".wet", ".wet.gz", ".warc.wet.gz")))
        else:
            paths = [paths]
    n_tasks = max(1, len(paths) // paths_per_task)
    rdd = spark.sparkContext.parallelize(paths, n_tasks)

    def parse_files(it):
        for p in it:
            with open(p, "rb") as f:
                for wh, text in iter_wet_records(f):
                    url = wh.get("warc-target-uri", "")
                    ts = None
                    raw_ts = wh.get("warc-date")
                    if raw_ts:
                        try:
                            ts = datetime.datetime.strptime(
                                raw_ts, "%Y-%m-%dT%H:%M:%SZ")
                        except ValueError:
                            ts = None
                    yield (url, ts, text)

    from pyspark.sql.types import (
        StringType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("text", StringType()),
    ])
    return spark.createDataFrame(rdd.mapPartitions(parse_files), schema)


def wet_to_documents(wet: DataFrame) -> DataFrame:
    """Map WET rows onto the ``documents`` table shape the curation
    operators consume (doc_id, text, lang, source, n_chars): ``doc_id`` =
    ``xxhash64(url)`` (deterministic, partition-order-free — a row_number
    would serialize the corpus through one window), ``source`` = the URL's
    host, ``lang`` = null (feed :func:`...webtext.lang_id_heuristic`
    downstream)."""
    from pyspark.sql import functions as F

    from ..operators.frontier import host_col

    return wet.select(
        F.xxhash64("url").alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        host_col("url").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


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
