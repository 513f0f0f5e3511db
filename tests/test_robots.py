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


# ---------------------------------------------------------------- round 3

def test_parse_robots_agent_sections():
    content = """
User-agent: suckit
Disallow: /only-suckit/

User-agent: *
Disallow: /everyone/

User-agent: cratebot
User-agent: spiderling
Disallow: /crate/
"""
    # specific section wins over * when the token is a substring of the UA
    assert parse_robots(content, "suckit/2.0") == ["/only-suckit/"]
    # consecutive User-agent lines share one rule group
    assert parse_robots(content, "Mozilla-compatible SPIDERLING") == ["/crate/"]
    # no specific match -> the * group applies
    assert parse_robots(content, "otherbot") == ["/everyone/"]
    # anonymous probe (no UA) -> * group only
    assert parse_robots(content) == ["/everyone/"]
    # several matching specific groups union their rules
    multi = ("User-agent: suck\nDisallow: /a/\n\n"
             "User-agent: kit\nDisallow: /b/\n")
    assert parse_robots(multi, "suckit") == ["/a/", "/b/"]


def test_robots_join_gate_matches_dict_gate(spark):
    """Unit level: the distributed (host, prefixes) table + equi-join gate
    admits exactly the urls the broadcast-dict UDF gate admits."""
    from pyspark.sql import functions as F
    from suckit_spark.operators import robots as robots_ops

    rows = _site_with_robots() + [
        fixtures._row("http://other.example/robots.txt",
                      b"User-agent: *\nDisallow: /x\n", "text/plain"),
    ]
    pages = fixtures.pages_df(spark, rows)
    cands = spark.createDataFrame(
        [("http://0.0.0.0/ok.html",),
         ("http://0.0.0.0/private/secret.html",),
         ("http://0.0.0.0/private/secret.html#frag",),
         ("http://0.0.0.0/",),
         ("http://other.example/x.html",),
         ("http://other.example/y.html",),
         ("http://norules.example/anything",)], "url string")

    rules = robots_ops.collect_robots_rules(pages, "suckit")
    udf_gate = robots_ops.apply_robots(
        cands, robots_ops.allowed_filter(spark, rules))
    rules_df = robots_ops.robots_rules_df(pages, "suckit")
    join_gate = robots_ops.apply_robots_join(cands, rules_df)

    got_udf = {r.url for r in udf_gate.collect()}
    got_join = {r.url for r in join_gate.collect()}
    assert got_join == got_udf
    assert "http://other.example/x.html" not in got_join
    assert "http://norules.example/anything" in got_join
    assert join_gate.columns == cands.columns  # helper cols dropped


def test_crawl_join_path_matches_broadcast_path(spark):
    """Whole-crawl equivalence: robots_join_threshold=0 forces the rules-table
    join gate; the crawl must equal the broadcast-dict crawl exactly."""
    rows = _site_with_robots()
    base = CrawlConfig(origin="http://0.0.0.0/", continue_on_error=True,
                       respect_robots=True)
    dict_res = crawl(spark, base, fixtures.pages_df(spark, rows))
    join_res = crawl(spark, base.with_(robots_join_threshold=0),
                     fixtures.pages_df(spark, rows))
    dict_log = [(r.url, r.status) for r in
                dict_res.crawl_log.orderBy("visit_seq").collect()]
    join_log = [(r.url, r.status) for r in
                join_res.crawl_log.orderBy("visit_seq").collect()]
    assert join_log == dict_log
    assert ({r.url for r in join_res.seen.collect()}
            == {r.url for r in dict_res.seen.collect()})
    assert "http://0.0.0.0/private/secret.html" not in {
        r.url for r in join_res.seen.collect()}
    dict_res.close()
    join_res.close()
