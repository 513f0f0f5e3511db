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
