"""Driver log surface (reference logger.rs).

The reference prints ``<time>: [<LEVEL>] <message>`` to stdout (logger.rs:
17-22) and, per visited URL, ``Downloaded: <url>`` / ``Visited: <url>``
(scraper.rs:286-291) plus ``Couldn't download a page`` warnings
(scraper.rs:275-281). The Spark realization keeps the same line shape via
Python ``logging`` on the DRIVER only:

* summary ``info`` lines are free (one per superstep);
* per-URL echo is gated behind ``CrawlConfig.verbose`` and reads each
  superstep's already-materialized crawl-log delta — O(delta) driver
  traffic, a debug surface, never part of the dataflow. At the 10^10 design
  point verbose stays off and the crawl_log TABLE is the log sink.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

LOGGER = logging.getLogger("suckit_spark")


def _ensure_handler() -> None:
    if not LOGGER.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s: [%(levelname)s] %(message)s"))
        LOGGER.addHandler(h)
        LOGGER.setLevel(logging.INFO)


def info(message: str) -> None:
    _ensure_handler()
    LOGGER.info(message)


def warn(message: str) -> None:
    _ensure_handler()
    LOGGER.warning(message)


def echo_superstep(log_delta: DataFrame, step: int) -> None:
    """Per-URL echo of one superstep, in canonical order: ``Downloaded:`` for
    persisted pages, ``Visited:`` for parse-only pages (scraper.rs:286-291),
    a warning per fetch error (scraper.rs:279)."""
    rows = (log_delta.select("url", "downloaded", "status", "order_key")
            .orderBy("order_key").collect())
    for r in rows:
        if r.status == "error":
            warn(f"Couldn't download a page, {r.url}")
        elif r.downloaded:
            info(f"Downloaded: {r.url}")
        else:
            info(f"Visited: {r.url}")
    info(f"superstep {step}: {len(rows)} pages")
