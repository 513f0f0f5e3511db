"""robots.txt broadcast-rule gate (north_rule extension)."""

from suckit_spark.config import CrawlConfig
from suckit_spark.operators.robots import parse_robots
from suckit_spark.plans.crawl import crawl
from suckit_spark.sources import fixtures


def test_parse_robots():
    content = """
# comment
User-agent: *
Disallow: /private/
Disallow: /tmp

User-agent: evilbot
Disallow: /
"""
    assert parse_robots(content) == ["/private/", "/tmp"]
    assert parse_robots("User-agent: evilbot\nDisallow: /") == []
    assert parse_robots("") == []


def _site_with_robots():
    index = (b'<html><body><a href="ok.html">ok</a>'
             b'<a href="private/secret.html">s</a></body></html>')
    return [
        fixtures._row("http://0.0.0.0/", index, "text/html"),
        fixtures._row("http://0.0.0.0/ok.html", b"<html></html>", "text/html"),
        fixtures._row("http://0.0.0.0/private/secret.html",
                      b"<html></html>", "text/html"),
        fixtures._row("http://0.0.0.0/robots.txt",
                      b"User-agent: *\nDisallow: /private/\n", "text/plain"),
    ]


def test_robots_blocks_disallowed(spark):
    rows = _site_with_robots()
    cfg = CrawlConfig(origin="http://0.0.0.0/", continue_on_error=True,
                      respect_robots=True)
    res = crawl(spark, cfg, fixtures.pages_df(spark, rows))
    visited = {r.url for r in res.crawl_log.collect()}
    assert "http://0.0.0.0/ok.html" in visited
    assert "http://0.0.0.0/private/secret.html" not in visited
    # blocked URL is not even in the seen set (eligible on future crawls)
    seen = {r.url for r in res.seen.collect()}
    assert "http://0.0.0.0/private/secret.html" not in seen


def test_robots_off_by_default(spark):
    rows = _site_with_robots()
    cfg = CrawlConfig(origin="http://0.0.0.0/", continue_on_error=True)
    res = crawl(spark, cfg, fixtures.pages_df(spark, rows))
    visited = {r.url for r in res.crawl_log.collect()}
    assert "http://0.0.0.0/private/secret.html" in visited
