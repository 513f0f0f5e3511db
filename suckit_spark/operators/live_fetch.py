"""Live HTTP fetch stage (reference downloader.rs:73-184).

The corpus-join fetch (plans/crawl.py S2) is the deterministic sandbox
realization; this module is the real-network one: a ``mapInPandas`` stage
that GETs each selected frontier row with a per-request builder honoring the
reference's whole client surface — ``user_agent`` (downloader.rs:92-97),
``cookie`` (downloader.rs:99-104), per-host basic auth (downloader.rs:55-71),
``disable_certs_checks`` (downloader.rs:84-89), the ``tries`` retry loop
(downloader.rs:174-184), and the ``delay``/``random_range`` politeness sleep
(scraper.rs:337-350).

Scale shape: the stage is embarrassingly parallel (no shuffle — it maps the
already-budgeted, already-salted frontier partition-wise); each partition
reuses one opener. Transport failures retry ``tries`` times then surface as
``found=False`` (crawl marks the row a fetch error); HTTP error statuses are
*responses* (the reference saves the 401 body, auth.rs:13-40), not retries.

Tests drive this against an in-process loopback ``http.server`` — no
external network is ever touched in the sandbox.
"""

from __future__ import annotations

import base64
import ssl
import time
import urllib.error
import urllib.request
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from ..config import CrawlConfig, build_auth_map
from ..functions import urlkit

#: What the crawl loop's corpus join produces — live fetch emits the same
#: shape so the downstream page pipeline is fetch-mode-agnostic.
FETCHED_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("fetch_url", StringType()),
    StructField("depth", IntegerType()),
    StructField("ext_depth", IntegerType()),
    StructField("superstep", IntegerType()),
    StructField("order_key", ArrayType(LongType())),
    StructField("html", BinaryType()),
    StructField("content_type", StringType()),
    StructField("content_disposition", StringType()),
    StructField("requires_auth", BooleanType()),   # corpus-sim column: False
    StructField("auth_user", StringType()),
    StructField("auth_pass", StringType()),
    StructField("status", IntegerType()),
    StructField("found", BooleanType()),
])


def build_request(cfg: CrawlConfig, url: str) -> urllib.request.Request:
    """One GET request with the reference's headers: UA always; Cookie when
    configured; basic auth only when the URL's host has an auth-map entry
    (credentials never leak cross-host, downloader.rs:55-62)."""
    headers = {"User-Agent": cfg.user_agent}
    if cfg.cookie:
        headers["Cookie"] = cfg.cookie
    host = urlkit.url_host(url)
    cred = build_auth_map(list(cfg.auth), cfg.origin).get(host) if host else None
    if cred:
        user, password = cred
        token = base64.b64encode(
            f"{user}:{password or ''}".encode("utf-8")).decode("ascii")
        headers["Authorization"] = f"Basic {token}"
    return urllib.request.Request(url, headers=headers)


def make_ssl_context(cfg: CrawlConfig) -> ssl.SSLContext:
    """TLS verification opt-out (downloader.rs:84-89)."""
    ctx = ssl.create_default_context()
    if cfg.disable_certs_checks:
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    return ctx


def _default_opener(cfg: CrawlConfig):
    ctx = make_ssl_context(cfg)

    def opener(req: urllib.request.Request):
        try:
            with urllib.request.urlopen(req, timeout=30, context=ctx) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:
            # An HTTP error status is a response, not a transport failure:
            # the reference processes e.g. the 401 body like any page.
            return e.code, dict(e.headers or {}), e.read()

    return opener


def politeness_sleep(cfg: CrawlConfig, url: str) -> float:
    """Per-request politeness delay: ``delay`` + a deterministic pseudo-random
    extra in [0, random_range) seconds (scraper.rs:337-350 uses rand; we key
    on the url hash so runs are reproducible). Returns the seconds slept."""
    extra = 0.0
    if cfg.random_range > 0:
        import zlib
        extra = (zlib.crc32(url.encode("utf-8"))
                 % (cfg.random_range * 1000)) / 1000.0
    total = cfg.delay + extra
    if total > 0:
        time.sleep(total)
    return total


def fetch_one(cfg: CrawlConfig, url: str, opener=None) -> dict:
    """GET ``url`` with up to ``cfg.tries`` attempts on transport failure
    (downloader.rs:174-184). Returns body/headers/status, or
    ``found=False`` once the retry budget is exhausted."""
    opener = opener or _default_opener(cfg)
    req = build_request(cfg, url)
    last_err: Exception | None = None
    for _ in range(max(1, cfg.tries)):
        try:
            status, headers, body = opener(req)
        except Exception as e:  # transport failure: retry
            last_err = e
            continue
        lower = {k.lower(): v for k, v in headers.items()}
        return {
            "html": body,
            "content_type": lower.get("content-type"),
            "content_disposition": lower.get("content-disposition"),
            "status": int(status),
            "found": True,
            "error": None,
        }
    return {
        "html": None, "content_type": None, "content_disposition": None,
        "status": 0, "found": False, "error": repr(last_err),
    }


def fetch_frontier(frontier: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """The live S2: map the selected frontier to fetched rows, one HTTP GET
    per row, partition-parallel, no shuffle."""

    # C1 (reference worker pool, args.rs:22-29): ``jobs`` bounds the number
    # of simultaneous connections — realized as the fetch stage's partition
    # count. jobs=1 (the reference default) serializes requests exactly like
    # the single-worker crawl.
    if cfg.jobs and cfg.jobs > 0:
        frontier = frontier.repartition(cfg.jobs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        opener = _default_opener(cfg)
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                politeness_sleep(cfg, row["fetch_url"])
                got = fetch_one(cfg, row["fetch_url"], opener=opener)
                out.append({
                    "url": row["url"], "fetch_url": row["fetch_url"],
                    "depth": row["depth"], "ext_depth": row["ext_depth"],
                    "superstep": row["superstep"],
                    "order_key": row["order_key"],
                    "html": got["html"],
                    "content_type": got["content_type"],
                    "content_disposition": got["content_disposition"],
                    "requires_auth": False,
                    "auth_user": None, "auth_pass": None,
                    "status": got["status"], "found": got["found"],
                })
            yield (pd.DataFrame(out) if out
                   else pd.DataFrame(columns=[f.name for f in FETCHED_SCHEMA]))

    return frontier.mapInPandas(run, FETCHED_SCHEMA)
