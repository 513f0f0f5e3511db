"""Pure-Python oracle behavior: one test per reference integration test
(filters.rs / external.rs / auth.rs / charset_*.rs scenarios, FIXTURES.md §2-3).

The oracle transcribes scraper.rs literally; these tests pin the loop
semantics that the Spark engine is then verified against (test_crawl_spark)."""

import posixpath

import pytest

from suckit_spark.config import CrawlConfig
from suckit_spark.oracle import CrawlAbort, crawl_oracle
from suckit_spark.sources import fixtures


def run(cfg_kwargs, rows=None):
    cfg = CrawlConfig(origin="http://0.0.0.0/", continue_on_error=True,
                      **cfg_kwargs)
    rows = rows if rows is not None else fixtures.site_a()
    return crawl_oracle(cfg, fixtures.pages_dict(rows))


def norm_files(res):
    return {posixpath.normpath(p): c for p, c in res.files.items()}


def test_plain_crawl_defaults():
    res = run({})
    files = norm_files(res)
    assert set(files) == {
        "0.0.0.0/index.html", "0.0.0.0/jpeg.jpg", "0.0.0.0/mp3.mp3",
        "0.0.0.0/file.txt", "0.0.0.0/no_download_no_visit.html",
        "0.0.0.0/should_not_get_visited.html",
    }
    # google.com discovered (in seen) but never visited (ext_depth=0 default)
    assert "https://google.com/" in res.seen
    assert "https://google.com/" not in res.visited
    assert files["0.0.0.0/file.txt"] == b"Hello"
    assert files["0.0.0.0/mp3.mp3"] == b""
    # links rewritten relative; non-visited google link too (scraper.rs:218)
    index = files["0.0.0.0/index.html"].decode()
    assert 'href="jpeg.jpg"' in index
    assert 'href="../google.com/index.html"' in index
    # BFS visit order: origin, then index links in document order, then
    # no_download_no_visit.html's child
    assert res.visited == [
        "http://0.0.0.0/",
        "http://0.0.0.0/jpeg.jpg", "http://0.0.0.0/mp3.mp3",
        "http://0.0.0.0/file.txt", "http://0.0.0.0/no_download_no_visit.html",
        "http://0.0.0.0/should_not_get_visited.html",
    ]


def test_visit_include(caplog=None):
    # filters.rs:50-73: --include-visit mp[3-4] => index + mp3 only
    res = run({"include_visit": "mp[3-4]"})
    assert set(norm_files(res)) == {"0.0.0.0/index.html", "0.0.0.0/mp3.mp3"}


def test_visit_include_multiple():
    # filters.rs:77-100
    res = run({"include_visit": r"(mp[3-4])|(txt)"})
    assert set(norm_files(res)) == {
        "0.0.0.0/index.html", "0.0.0.0/mp3.mp3", "0.0.0.0/file.txt"}


def test_visit_exclude():
    # filters.rs:104-124: no *.jpg in the mirror
    res = run({"exclude_visit": "jpe?g"})
    assert not any(p.endswith(".jpg") for p in res.files)
    assert "0.0.0.0/mp3.mp3" in norm_files(res)


def test_download_include():
    # filters.rs:128-153: -i mp[3-4] => only mp3 saved; index visited not saved
    res = run({"include_download": "mp[3-4]"})
    assert set(norm_files(res)) == {"0.0.0.0/mp3.mp3"}
    assert "http://0.0.0.0/" in res.visited
    assert "http://0.0.0.0/jpeg.jpg" in res.visited


def test_download_exclude():
    # filters.rs:182-202: everything but jpeg saved
    res = run({"exclude_download": "jpe?g"})
    files = norm_files(res)
    assert "0.0.0.0/jpeg.jpg" not in files
    assert "0.0.0.0/mp3.mp3" in files and "0.0.0.0/index.html" in files


def test_visit_filter_is_download_filter():
    # filters.rs:16-46: excluded page is never even visited
    res = run({"exclude_download": "no_download_no_visit.html",
               "visit_filter_is_download_filter": True})
    assert "http://0.0.0.0/no_download_no_visit.html" not in res.visited
    assert "http://0.0.0.0/should_not_get_visited.html" not in res.visited
    assert "0.0.0.0/should_not_get_visited.html" not in norm_files(res)


def test_ext_depth_one():
    # external.rs:16-39: -d 0 --ext-depth 1 => exactly origin + google
    res = run({"depth": 0, "ext_depth": 1})
    assert set(norm_files(res)) == {"0.0.0.0/index.html", "google.com/index.html"}
    assert res.visited == ["http://0.0.0.0/", "https://google.com/"]


def test_ext_depth_zero():
    # external.rs:41-62: no google.com dir
    res = run({"depth": 0, "ext_depth": 0})
    assert set(norm_files(res)) == {"0.0.0.0/index.html"}


def test_auth_wrong_host():
    # auth.rs:13-40: creds scoped to another host => only the 401 body saved
    res = run({"auth": ("username", "password", "example.com")},
              rows=fixtures.site_a(requires_auth=True))
    files = norm_files(res)
    assert set(files) == {"0.0.0.0/index.html"}
    assert files["0.0.0.0/index.html"] == b""  # empty 401 body


def test_auth_origin_host_default():
    # auth.rs:43-64: host defaults to origin => full crawl
    res = run({"auth": ("username", "password")},
              rows=fixtures.site_a(requires_auth=True))
    assert len(res.files) > 1
    assert norm_files(res)["0.0.0.0/file.txt"] == b"Hello"


def test_auth_wrong_password():
    res = run({"auth": ("username", "wrong")},
              rows=fixtures.site_a(requires_auth=True))
    assert set(norm_files(res)) == {"0.0.0.0/index.html"}


@pytest.mark.parametrize("meta,header,identical", [
    (True, False, True),    # charset_html_found.rs: meta declares cp1252
    (False, True, True),    # charset_http_found.rs: header declares cp1252
    (False, False, False),  # charset_*_not_found.rs: mojibake via utf-8 default
])
def test_charset_round_trip(meta, header, identical):
    rows = fixtures.site_charset(meta, header)
    cfg = CrawlConfig(origin="http://0.0.0.0/charset.html",
                      continue_on_error=True)
    res = crawl_oracle(cfg, fixtures.pages_dict(rows))
    saved = norm_files(res)["0.0.0.0/charset.html"]
    src = rows[0]["html"]
    assert (saved == src) is identical
    if not identical:
        assert b"\xef\xbf\xbd" in saved  # U+FFFD replacement, utf-8-encoded


def test_content_disposition_symlink():
    res = run({}, rows=fixtures.site_disposition())
    files = norm_files(res)
    assert files["named_track.mp3"] == b"MP3DATA"
    assert "0.0.0.0/track.mp3" not in files
    # symlink canonical path -> filename, relative (disk.rs:35-65)
    assert res.symlinks[urlpath := "0.0.0.0//track.mp3"] == "../../named_track.mp3" \
        or res.symlinks.get("0.0.0.0//track.mp3", "").endswith("named_track.mp3")


def test_error_without_continue():
    rows = [r for r in fixtures.site_a() if r["url"] != "http://0.0.0.0/file.txt"]
    cfg = CrawlConfig(origin="http://0.0.0.0/")
    with pytest.raises(CrawlAbort):
        crawl_oracle(cfg, fixtures.pages_dict(rows))


def test_error_with_continue():
    rows = [r for r in fixtures.site_a() if r["url"] != "http://0.0.0.0/file.txt"]
    res = run({})
    res2 = crawl_oracle(CrawlConfig(origin="http://0.0.0.0/",
                                    continue_on_error=True),
                        fixtures.pages_dict(rows))
    assert ("http://0.0.0.0/file.txt", 1, 0, True, "error") in res2.log


def test_dry_run():
    res = run({"dry_run": True})
    assert res.files == {}
    assert len(res.visited) == 6


def test_fragment_inclusive_dedup():
    # page#a and page#b both enqueue and both fetch (scraper.rs:202)
    index = (b'<html><body><a href="p.html#a">1</a>'
             b'<a href="p.html#b">2</a><a href="p.html#a">3</a></body></html>')
    rows = [
        fixtures._row("http://0.0.0.0/", index, "text/html"),
        fixtures._row("http://0.0.0.0/p.html", b"<html></html>", "text/html"),
    ]
    res = run({}, rows=rows)
    assert res.visited == ["http://0.0.0.0/", "http://0.0.0.0/p.html#a",
                           "http://0.0.0.0/p.html#b"]
    assert {"http://0.0.0.0/p.html#a", "http://0.0.0.0/p.html#b"} <= res.seen
    # both save to the fragment-free path
    assert set(norm_files(res)) == {"0.0.0.0/index.html", "0.0.0.0/p.html"}


def test_depth_gate_first_discovery_wins():
    # A URL first seen beyond the depth gate is inserted into path_map but not
    # enqueued — and later shallow discoveries cannot resurrect it
    # (scraper.rs:202-216 check order: map_url_path first, gates second).
    deep = (b'<html><body><a href="victim.html">v</a></body></html>')
    index = (b'<html><body><a href="mid.html">m</a></body></html>')
    mid = (b'<html><body><a href="victim.html">v</a></body></html>')
    rows = [
        fixtures._row("http://0.0.0.0/", index, "text/html"),
        fixtures._row("http://0.0.0.0/mid.html", mid, "text/html"),
        fixtures._row("http://0.0.0.0/victim.html", b"<html></html>", "text/html"),
    ]
    res = run({"depth": 1}, rows=rows)
    # mid at depth 1; victim discovered at depth 1 (gate 1<1 false) => never
    # visited even though it is "reachable" at depth 2 from nothing else
    assert "http://0.0.0.0/victim.html" not in res.visited
    assert "http://0.0.0.0/victim.html" in res.seen
