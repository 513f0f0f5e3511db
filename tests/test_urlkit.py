"""Golden vectors for the URL kernel, transcribed from the reference's unit
tests (url_helper.rs:47-127, scraper.rs:352-400, downloader.rs:200-228)."""

import pytest

from suckit_spark.config import CrawlConfig, parse_auth
from suckit_spark.functions import urlkit

LONG = "a" * 256 + ".html"

TO_PATH_CASES = [
    ("https://lwn.net/", False, "lwn.net/index.html"),
    ("https://lwn.net", False, "lwn.net/index.html"),
    ("https://lwn.net/Kernel/index.html", False, "lwn.net/Kernel/index.html"),
    ("https://lwn.net/Kernel/", False, "lwn.net/Kernel/index.html"),
    ("https://lwn.net/Kernel", False, "lwn.net/Kernel/index_no_slash.html"),
    ("https://lwn.net/Kernel/#fragment", True, "lwn.net/Kernel/index.html#fragment"),
    ("https://lwn.net/Kernel/#fragment", False, "lwn.net/Kernel/index.html"),
    (f"https://lwn.net/Kernel/{LONG}", False,
     "lwn.net/Kernel/5ca82767de71fe8930587e82bb994903.html"),
    ("https://google.com/foobar/platform-redirect/?next=/configuration/releases/",
     False,
     "google.com/foobar/platform-redirect/__querystring__next=/configuration/releases/index.html"),
]


@pytest.mark.parametrize("url,frag,expected", TO_PATH_CASES)
def test_to_path_golden(url, frag, expected):
    assert urlkit.to_path(url, frag) == expected


def test_to_path_port_dropped():
    # host_str() has no port (url_helper.rs:11): mirrors live under the host.
    assert urlkit.to_path("http://0.0.0.0:8080/x.html", False) == "0.0.0.0//x.html"
    assert urlkit.to_path("http://0.0.0.0:8080/d/x.html", False) == "0.0.0.0/d/x.html"


def test_to_path_single_segment_file():
    # Path::new("/file.txt").parent() == "/" -> doubled slash, normalized by
    # any path consumer (Rust Components does the same).
    assert urlkit.to_path("http://0.0.0.0/file.txt", False) == "0.0.0.0//file.txt"


def test_normalize_url():
    assert urlkit.normalize_url("///d.com/x") == "https://d.com/x"
    assert urlkit.normalize_url("//d.com/x") == "https://d.com/x"
    assert urlkit.normalize_url("/abs/path") == "/abs/path"
    assert urlkit.normalize_url("rel.html") == "rel.html"


def test_resolve_and_serialize():
    assert urlkit.resolve("http://0.0.0.0/", "jpeg.jpg") == "http://0.0.0.0/jpeg.jpg"
    assert urlkit.resolve("http://0.0.0.0/", "https://google.com") == "https://google.com/"
    assert urlkit.resolve("http://a.com/d/x.html", "../y.html") == "http://a.com/y.html"
    assert urlkit.resolve("http://a.com/", "p#frag") == "http://a.com/p#frag"
    # default port elision + host lowercasing (Url::as_str normalization)
    assert urlkit.resolve("http://a.com/", "http://B.com:80/Q") == "http://b.com/Q"


def test_visit_shape_filter():
    # pseudo-links dropped (scraper.rs:357-368)
    assert not urlkit.visit_url_shape_ok("mailto:a@b.c")
    assert not urlkit.visit_url_shape_ok("javascript:void(0)")
    assert not urlkit.visit_url_shape_ok("data:text/plain,hi")
    # absolute with host passes; relative passes
    assert urlkit.visit_url_shape_ok("https://google.com")
    assert urlkit.visit_url_shape_ok("jpeg.jpg")
    assert urlkit.visit_url_shape_ok("/abs/path.html")
    assert urlkit.visit_url_shape_ok("//scheme-relative.com/x")


def test_domain_classifier():
    # IP hosts have domain None; None == None => same domain (scraper.rs:383-400)
    assert urlkit.is_on_another_domain("https://google.com", "http://0.0.0.0/")
    assert not urlkit.is_on_another_domain("http://127.0.0.1/x", "http://0.0.0.0/")
    assert not urlkit.is_on_another_domain("rel/path.html", "http://0.0.0.0/")
    assert urlkit.is_on_another_domain("http://other.com/", "http://example.com/")
    assert not urlkit.is_on_another_domain("http://example.com/y", "http://example.com/")
    # scheme-relative normalized before the check
    assert urlkit.is_on_another_domain("//other.com/x", "http://example.com/")


def test_relative_link():
    assert urlkit.relative_link("0.0.0.0/index.html", "0.0.0.0/jpeg.jpg") == "jpeg.jpg"
    assert urlkit.relative_link("0.0.0.0/index.html", "google.com/index.html") == \
        "../google.com/index.html"
    assert urlkit.relative_link("a.com/d/index.html", "a.com/index.html#f") == \
        "../index.html#f"
    assert urlkit.relative_link("0.0.0.0/index.html", "0.0.0.0//file.txt") == "file.txt"


def test_parse_auth_vectors():
    # downloader.rs:200-228
    with pytest.raises(ValueError):
        parse_auth(["", "pw"], "https://example.com/")
    assert parse_auth(["username"], "https://example.com/") == \
        ("username", None, "example.com")
    assert parse_auth(["un", "pw", "h", "t"][:3], "https://example.com/") == \
        ("un", "pw", "h")


def test_visit_filter_defaults():
    cfg = CrawlConfig(origin="http://0.0.0.0/")
    assert cfg.visit_ok("anything.html")
    assert not cfg.visit_ok("mailto:x@y.z")
    cfg2 = cfg.with_(include_visit="mp[3-4]")
    assert cfg2.visit_ok("mp3.mp3")
    assert not cfg2.visit_ok("jpeg.jpg")
    cfg3 = cfg.with_(exclude_visit="jpe?g")
    assert not cfg3.visit_ok("jpeg.jpg")
    assert not cfg3.visit_ok("x.jpg")
    assert cfg3.visit_ok("file.txt")


def test_filter_aliasing():
    cfg = CrawlConfig(
        origin="http://0.0.0.0/",
        exclude_download="no_download_no_visit.html",
        visit_filter_is_download_filter=True,
    )
    assert cfg.exclude_visit == "no_download_no_visit.html"
    assert not cfg.visit_ok("no_download_no_visit.html")


def test_canonical_origin():
    assert urlkit.canonical_origin("http://EXAMPLE.com") == "http://example.com/"
    with pytest.raises(ValueError):
        urlkit.canonical_origin("not a url")
