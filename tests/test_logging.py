"""S9 log sink (reference logger.rs + scraper.rs:286-291): verbose mode
echoes Downloaded/Visited/error lines per URL, in canonical order, on the
driver."""

import logging

from suckit_spark.config import CrawlConfig
from suckit_spark.oracle import crawl_oracle
from suckit_spark.plans.crawl import crawl
from suckit_spark.sources import fixtures


def test_verbose_echoes_every_url(spark, caplog):
    rows = fixtures.site_a()
    cfg = CrawlConfig(origin="http://0.0.0.0/", continue_on_error=True,
                      verbose=True)
    with caplog.at_level(logging.INFO, logger="suckit_spark"):
        result = crawl(spark, cfg, fixtures.pages_df(spark, rows))
        n_visited = result.crawl_log.count()
    per_url = [r for r in caplog.records
               if r.message.startswith(("Downloaded: ", "Visited: ",
                                        "Couldn't download a page"))]
    assert len(per_url) == n_visited
    # echo order matches the canonical visit order
    oracle = crawl_oracle(cfg, fixtures.pages_dict(rows))
    echoed = []
    for r in per_url:
        m = r.message
        if m.startswith("Couldn't download a page, "):
            echoed.append(m[len("Couldn't download a page, "):])
        else:
            echoed.append(m.split(": ", 1)[1])
    assert echoed == oracle.visited
    # summary line per superstep
    assert any(r.message.startswith("superstep ") for r in caplog.records)


def test_quiet_by_default(spark, caplog):
    rows = fixtures.site_a()
    cfg = CrawlConfig(origin="http://0.0.0.0/", continue_on_error=True)
    with caplog.at_level(logging.INFO, logger="suckit_spark"):
        crawl(spark, cfg, fixtures.pages_df(spark, rows)).crawl_log.count()
    assert not [r for r in caplog.records
                if r.message.startswith(("Downloaded", "Visited"))]
