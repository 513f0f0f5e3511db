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


# --------------------------------------------------- Crawl-delay directive

def test_parse_crawl_delay_groups():
    from suckit_spark.operators.robots import parse_crawl_delay

    txt = ("User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
           "User-agent: suckit\nCrawl-delay: 0.5\n")
    assert parse_crawl_delay(txt, "suckit/1.0") == 0.5   # specific wins
    assert parse_crawl_delay(txt, "otherbot") == 2.0     # * fallback
    assert parse_crawl_delay("User-agent: *\nDisallow: /x\n", "ua") is None
    # unparsable / negative values are ignored
    assert parse_crawl_delay(
        "User-agent: *\nCrawl-delay: soon\n", "ua") is None
    assert parse_crawl_delay(
        "User-agent: *\nCrawl-delay: -3\n", "ua") is None
    # multiple applicable groups: the strictest (max) applies
    two = ("User-agent: a\nCrawl-delay: 1\n\n"
           "User-agent: b\nCrawl-delay: 4\n")
    assert parse_crawl_delay(two, "a-and-b") == 4.0


def test_politeness_sleep_honors_host_delay():
    import time as _time

    from suckit_spark.config import CrawlConfig
    from suckit_spark.operators.live_fetch import politeness_sleep

    cfg = CrawlConfig(origin="http://h/", delay=0)
    t0 = _time.monotonic()
    slept = politeness_sleep(cfg, "http://h/p.html", host_delay=0.2)
    assert slept == 0.2 and _time.monotonic() - t0 >= 0.2
    # stricter of cfg.delay and host delay wins
    assert politeness_sleep(cfg.with_(delay=0), "u", host_delay=0.0) == 0.0


def test_live_crawl_applies_crawl_delay(spark):
    """robots Crawl-delay slows the live fetch: same 3-page site crawled
    with and without a 0.6 s per-request delay differs by >= 1 s of wall
    time (3 sequential requests with jobs=1)."""
    import threading
    import time as _time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from suckit_spark.plans.crawl import crawl as _crawl
    from suckit_spark.schemas import PAGES_SCHEMA

    def handler(delay_line: bytes):
        class _H(BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path == "/robots.txt":
                    body = b"User-agent: *\n" + delay_line
                elif self.path == "/index.html":
                    body = (b'<html><body><a href="a.html">a</a>'
                            b'<a href="b.html">b</a></body></html>')
                else:
                    body = b"<html><body>leaf</body></html>"
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass
        return _H

    walls = {}
    # Untimed warm-up crawl: the FIRST live crawl in a Spark session pays
    # ~14 s of one-time cost (plan codegen, Arrow python worker spin-up,
    # first parquet-write path — measured identical on round-4 and round-5
    # code), which lands entirely on the "plain" leg and inverts the
    # comparison whenever this test runs cold. Warm once so both timed
    # crawls measure the delay, not the session.
    for name, line in (("warmup", b"Disallow: /none\n"),
                       ("plain", b"Disallow: /none\n"),
                       ("delayed", b"Crawl-delay: 0.6\n")):
        srv = ThreadingHTTPServer(("127.0.0.1", 0), handler(line))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            base = f"http://127.0.0.1:{srv.server_address[1]}"
            cfg = CrawlConfig(origin=f"{base}/index.html", live_fetch=True,
                              respect_robots=True, continue_on_error=True,
                              jobs=1)
            t0 = _time.monotonic()
            res = _crawl(spark, cfg,
                         spark.createDataFrame([], PAGES_SCHEMA))
            assert res.crawl_log.count() == 3
            walls[name] = _time.monotonic() - t0
            res.close()
        finally:
            srv.shutdown()
            srv.server_close()
    assert walls["delayed"] - walls["plain"] >= 1.0, walls
