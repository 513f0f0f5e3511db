"""WARC ingestion source (sources/warc.py): stdlib parser round-trip plus
the end-to-end contract — a crawl over a WARC-ingested corpus must equal the
crawl over the same corpus handed to the engine directly."""

import datetime
import gzip

import pytest

from suckit_spark.sources import warc


def _records():
    return [
        {"url": "http://h0.example/index.html", "status": 200,
         "content_type": "text/html; charset=UTF-8",
         "ts": datetime.datetime(2026, 1, 2, 3, 4, 5),
         "body": b"<html><body><a href=\"a.html\">a</a></body></html>"},
        {"url": "http://h0.example/a.html", "status": 200,
         "content_type": "text/html",
         "ts": datetime.datetime(2026, 1, 2, 3, 4, 6),
         "body": b"<html><body><p>leaf page</p></body></html>"},
        {"url": "http://h0.example/img.png", "status": 404,
         "content_type": "image/png",
         "ts": datetime.datetime(2026, 1, 2, 3, 4, 7),
         "body": b"\x89PNG\r\n\x1a\nnot-really"},
    ]


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip(compress):
    raw = warc.build_warc_bytes(_records(), compress=compress)
    if compress:
        assert raw[:2] == b"\x1f\x8b"  # multi-member gzip
    got = list(warc.iter_warc_records(raw))
    assert [wh["warc-target-uri"] for wh, _, _ in got] == [
        r["url"] for r in _records()]
    assert [body for _, _, body in got] == [r["body"] for r in _records()]
    assert [hh["__status"] for _, hh, _ in got] == ["200", "200", "404"]
    assert got[0][0]["warc-date"] == "2026-01-02T03:04:05Z"


def test_non_response_records_skipped():
    member = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
              b"Content-Length: 4\r\n\r\ninfo\r\n\r\n")
    raw = member + warc.build_warc_bytes(_records()[:1], compress=False)
    got = list(warc.iter_warc_records(raw))
    assert len(got) == 1
    assert got[0][0]["warc-type"] == "response"


def test_bad_content_length_skips_to_next_gzip_member():
    """A record with a missing Content-Length is a parse error: its gzip
    member is dropped, parsing resumes at the NEXT member (never by scanning
    payload bytes for 'WARC/1.0')."""
    bad = gzip.compress(
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad.example/\r\n\r\n"   # no Content-Length
        b"HTTP/1.1 200 OK\r\n\r\nbody", mtime=0)
    good = warc.build_warc_bytes(_records()[:1], compress=True)
    got = list(warc.iter_warc_records(bad + good))
    assert [wh["warc-target-uri"] for wh, _, _ in got] == [
        "http://h0.example/index.html"]


def test_payload_containing_warc_magic_is_not_resynced():
    """A response body that CONTAINS 'WARC/1.0\\r\\n...' text must not
    fabricate records — framing is by Content-Length only."""
    evil_body = (b"<html>example of a record: WARC/1.0\r\n"
                 b"WARC-Type: response\r\nWARC-Target-URI: http://fake/\r\n"
                 b"Content-Length: 4\r\n\r\nHTTP/1.1 200 OK\r\n\r\nfake</html>")
    recs = [{"url": "http://real.example/", "status": 200,
             "content_type": "text/html", "ts": None, "body": evil_body}]
    for compress in (True, False):
        raw = warc.build_warc_bytes(recs, compress=compress)
        got = list(warc.iter_warc_records(raw))
        assert [wh["warc-target-uri"] for wh, _, _ in got] == [
            "http://real.example/"]
        assert got[0][2] == evil_body


def test_corrupt_gzip_member_alone_yields_nothing():
    """b'\\x1f\\x8b' + garbage must not raise zlib.error out of the iterator
    (one bad Common-Crawl archive must not fail the whole Spark task) — it
    yields no records and terminates cleanly."""
    assert list(warc.iter_warc_records(b"\x1f\x8b" + b"\xde\xad" * 64)) == []


def test_corrupt_gzip_member_resyncs_at_next_member():
    """valid member + corrupt member + valid member: both valid records
    survive; the corrupt middle member is dropped at the next gzip magic."""
    good1 = warc.build_warc_bytes(_records()[:1], compress=True)
    corrupt = b"\x1f\x8b\x08\x00" + b"\x00" * 6 + b"\xba\xdb\xad" * 40
    good2 = warc.build_warc_bytes(_records()[1:2], compress=True)
    got = list(warc.iter_warc_records(good1 + corrupt + good2))
    assert [wh["warc-target-uri"] for wh, _, _ in got] == [
        _records()[0]["url"], _records()[1]["url"]]
    # and a corrupt member mid-stream (valid gzip header, corrupt deflate
    # body many bytes in) also recovers
    real = gzip.compress(b"x" * 500, mtime=0)
    broken = real[:40] + b"\xff\x00\xff\x00" + real[44:]
    got2 = list(warc.iter_warc_records(broken + good2))
    assert [wh["warc-target-uri"] for wh, _, _ in got2] == [
        _records()[1]["url"]]


def test_corrupt_member_resync_across_chunk_boundary():
    """The gzip magic of the next valid member can straddle the reader's
    chunk boundary; the 1-byte carry must still find it."""
    good = warc.build_warc_bytes(_records()[:1], compress=True)
    # corrupt filler sized so the next member's \x1f\x8b straddles a
    # chunk_size boundary when read with tiny chunks
    filler = b"\x1f\x8b" + b"\x07" * 64
    raw = filler + good
    for chunk in range(3, 12):
        import io as _io

        got = list(warc._gzip_members(_io.BytesIO(raw), chunk_size=chunk))
        assert len(got) == 1, chunk


def test_plain_warc_stops_at_unframeable_record():
    """In an uncompressed archive there is no safe resync boundary after a
    framing error: the remainder of the file is dropped, not guessed at."""
    good = warc.build_warc_bytes(_records()[:1], compress=False)
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: not-a-number\r\n\r\njunk")
    tail = warc.build_warc_bytes(_records()[1:2], compress=False)
    got = list(warc.iter_warc_records(good + bad + tail))
    assert [wh["warc-target-uri"] for wh, _, _ in got] == [
        _records()[0]["url"]]


def test_iter_accepts_open_file_streaming(tmp_path):
    """read_warc's task shape: records parsed straight off an open file
    object, no whole-archive read()."""
    p = tmp_path / "s.warc.gz"
    p.write_bytes(warc.build_warc_bytes(_records()))
    with open(p, "rb") as f:
        got = list(warc.iter_warc_records(f))
    assert len(got) == 3


def test_read_warc_rows(spark, tmp_path):
    p1 = warc.write_warc(str(tmp_path / "a.warc.gz"), _records()[:2])
    p2 = warc.write_warc(str(tmp_path / "b.warc.gz"), _records()[2:])
    df = warc.read_warc(spark, [p1, p2])
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {r["url"] for r in _records()}
    idx = rows["http://h0.example/index.html"]
    assert bytes(idx.html) == _records()[0]["body"]
    assert idx.status == 200 and "text/html" in idx.content_type
    assert idx.warc_ts == datetime.datetime(2026, 1, 2, 3, 4, 5)
    assert idx.text and "a" in idx.text
    png = rows["http://h0.example/img.png"]
    assert png.status == 404 and png.text is None
    # directory form resolves both files
    assert warc.read_warc(spark, str(tmp_path)).count() == 3


def test_crawl_over_warc_equals_direct(spark, tmp_path):
    """Ingest parity: WARC -> pages table -> crawl == direct pages -> crawl."""
    from suckit_spark.config import CrawlConfig
    from suckit_spark.plans.crawl import crawl
    from suckit_spark.sources import corpus

    rows = corpus.gen_corpus_rows(n_hosts=2, pages_per_host=6, fanout=2)
    recs = [{"url": r["url"], "status": 200, "content_type": "text/html",
             "ts": r["warc_ts"], "body": r["html"]} for r in rows]
    path = warc.write_warc(str(tmp_path / "site.warc.gz"), recs)

    direct = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        schema=warc.PAGES_SCHEMA)
    ingested = warc.read_warc(spark, path)

    cfg = CrawlConfig(origin=rows[0]["url"], ext_depth=-1,
                      continue_on_error=True)
    a = crawl(spark, cfg, direct)
    b = crawl(spark, cfg, ingested)
    log_a = [(r.url, r.status) for r in a.crawl_log.orderBy("visit_seq").collect()]
    log_b = [(r.url, r.status) for r in b.crawl_log.orderBy("visit_seq").collect()]
    assert log_a == log_b
    bytes_a = {r.path: bytes(r.content) for r in a.mirror.collect()}
    bytes_b = {r.path: bytes(r.content) for r in b.mirror.collect()}
    assert bytes_a == bytes_b
    a.close()
    b.close()


def _wet_records():
    return [
        {"url": "http://h0.example/a.html",
         "ts": datetime.datetime(2026, 1, 2, 3, 4, 5),
         "text": "extracted text of page a\nwith two lines"},
        {"url": "http://h1.example/b.html",
         "ts": datetime.datetime(2026, 1, 2, 3, 4, 6),
         "text": "page b text"},
    ]


@pytest.mark.parametrize("compress", [True, False])
def test_wet_roundtrip(compress):
    raw = warc.build_wet_bytes(_wet_records(), compress=compress)
    got = list(warc.iter_wet_records(raw))
    assert [wh["warc-target-uri"] for wh, _ in got] == [
        r["url"] for r in _wet_records()]
    assert [t for _, t in got] == [r["text"] for r in _wet_records()]


def test_wet_skips_non_conversion_and_recovers_corrupt_member():
    """A WET stream interleaved with a warcinfo record and a corrupt gzip
    member still yields exactly the conversion records."""
    info = gzip.compress(
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
        b"info\r\n\r\n", mtime=0)
    corrupt = b"\x1f\x8b\x08\x00" + b"\x00" * 6 + b"\xb0\x0b" * 30
    a = warc.build_wet_bytes(_wet_records()[:1])
    b = warc.build_wet_bytes(_wet_records()[1:])
    got = list(warc.iter_wet_records(a + info + corrupt + b))
    assert [t for _, t in got] == [r["text"] for r in _wet_records()]


def test_read_wet_to_documents_feeds_curation(spark, tmp_path):
    """Distributed WET read -> documents-shaped table -> a curation
    operator end-to-end; doc_id deterministic (xxhash64(url)), source =
    host."""
    p = tmp_path / "seg-00000.warc.wet.gz"
    p.write_bytes(warc.build_wet_bytes(_wet_records()))
    wet = warc.read_wet(spark, str(tmp_path))
    docs = warc.wet_to_documents(wet)
    rows = {r.source: r for r in docs.collect()}
    assert set(rows) == {"h0.example", "h1.example"}
    assert rows["h1.example"].text == "page b text"
    assert rows["h1.example"].n_chars == len("page b text")
    # deterministic ids: a second read produces identical doc_ids
    again = {r.source: r.doc_id
             for r in warc.wet_to_documents(
                 warc.read_wet(spark, str(tmp_path))).collect()}
    assert {s: r.doc_id for s, r in rows.items()} == again
    # the documents shape drops straight into the curation operators
    from suckit_spark.operators import webtext

    tc = {r.doc_id: r.ws_tokens for r in webtext.token_counts(docs).collect()}
    assert tc[rows["h1.example"].doc_id] == 3


def test_warc_dataset_roundtrip(spark, tmp_path):
    """Distributed sink -> distributed reader round-trip: one archive per
    partition, rows preserved."""
    from suckit_spark.sources import corpus

    rows = corpus.gen_corpus_rows(n_hosts=3, pages_per_host=8, fanout=2)
    direct = spark.createDataFrame(
        [tuple(r.values()) for r in rows], schema=warc.PAGES_SCHEMA
    ).repartition(4)
    out = str(tmp_path / "segments")
    n_archives = warc.write_warc_dataset(direct, out)
    assert 1 <= n_archives <= 4
    back = warc.read_warc(spark, out)
    a = {r.url: (bytes(r.html), r.status) for r in direct.collect()}
    b = {r.url: (bytes(r.html), r.status) for r in back.collect()}
    assert a == b
