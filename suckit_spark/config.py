"""Crawl configuration — the engine's equivalent of the reference CLI surface.

Mirrors all 19 typed fields of the reference's ``Args`` (reference:
/root/reference/src/args.rs:8-162) plus the scale knobs the PySpark engine adds
(per-host politeness budgets, bloom prefilter, salting, checkpointing, robots).

The config is a frozen value object: regex filters are compiled once on the
driver and the whole object is captured by the Arrow UDF closures (it is tiny,
so ordinary task serialization is the broadcast).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

from .functions import urlkit

#: args.depth == -1 means unbounded recursion (scraper.rs:30).
INFINITE_DEPTH = -1

AUTH_CHUNK_SIZE = 3  # downloader.rs:12


def parse_auth(auth: list[str], origin: str) -> tuple[str, str | None, str]:
    """Parse one ``user [pass [host]]`` auth chunk (downloader.rs:22-52):
    empty strings -> None; host defaults to the origin host; a missing/None
    username is an error."""
    vals = [s if s != "" else None for s in auth]
    origin_host = urlkit.url_host(origin)
    if len(vals) >= 1 and vals[0] is not None:
        username = vals[0]
        password = vals[1] if len(vals) >= 2 else None
        host = vals[2] if len(vals) >= 3 and vals[2] is not None else origin_host
        if host is None:
            raise ValueError("Invalid arguments supplied to auth")
        return (username, password, host)
    raise ValueError("Invalid arguments supplied to auth")


def build_auth_map(auth: list[str], origin: str) -> dict[str, tuple[str, str | None]]:
    """Chunk the flat auth list by 3 into host -> (user, pass) (downloader.rs:64-71)."""
    auth_map: dict[str, tuple[str, str | None]] = {}
    for i in range(0, len(auth), AUTH_CHUNK_SIZE):
        username, password, host = parse_auth(auth[i : i + AUTH_CHUNK_SIZE], origin)
        auth_map[host] = (username, password)
    return auth_map


@dataclass(frozen=True)
class CrawlConfig:
    """Whole-run crawl configuration (reference Args, args.rs:8-162)."""

    origin: str
    output: str | None = None
    jobs: int = 1                       # per-superstep parallelism hint
    depth: int = INFINITE_DEPTH         # local recursion depth; -1 = infinite
    ext_depth: int = 0                  # external-domain depth; -1 = infinite
    tries: int = 20
    delay: int = 0                      # politeness delay (seconds)
    random_range: int = 0
    user_agent: str = "suckit"
    cookie: str = ""
    include_visit: str = ".*"
    exclude_visit: str = "$^"
    include_download: str = ".*"
    exclude_download: str = "$^"
    visit_filter_is_download_filter: bool = False
    auth: tuple[str, ...] = ()
    continue_on_error: bool = False
    dry_run: bool = False
    disable_certs_checks: bool = False
    verbose: bool = False

    # ---- Engine extensions (BASELINE.json north_rule; no reference counterpart)
    #: cap on pages fetched per host per superstep (None = unlimited); excess
    #: frontier rows are deferred to the next superstep in stable order.
    host_budget: int | None = None
    #: honor robots.txt Disallow rules found in the pages table.
    respect_robots: bool = False
    #: robots gate realization by scale (operators/robots.py): when the
    #: corpus has at least this many robots.txt hosts, the rules become a
    #: distributed ``(host, prefixes)`` table and candidates are gated by an
    #: equi-join on host (no driver collect of the rules); below it, the
    #: rules are a driver dict + broadcast pandas-UDF filter (cheapest when
    #: the dict is small). None = always the broadcast dict. Live mode always
    #: uses the dict (rules accrue incrementally, one host at a time).
    robots_join_threshold: int | None = 10_000
    #: compact the in-memory seen-delta list into one materialized table
    #: whenever it exceeds this many deltas: the anti-join reads a lazy union
    #: of per-superstep deltas, and at thousands of supersteps an uncompacted
    #: union plan gets very wide (plan/serialization cost grows per step).
    #: Compaction costs one O(seen) localCheckpoint every K steps — amortized
    #: O(seen/K) — and caps the union width at K. None disables.
    seen_compact_interval: int | None = 16
    #: bloom prefilter in front of the seen anti-join once seen exceeds this
    #: many rows (None disables).
    bloom_threshold: int | None = 10_000
    bloom_fpp: float = 0.03
    #: approximate seen-set mode (the 10^10-scale path): once the bloom is
    #: engaged, SKIP the exact residual anti-join — the filter alone decides
    #: membership. Per-superstep dedup cost becomes O(candidates) with no
    #: shuffle of the seen side; false positives drop a candidate (coverage
    #: loss bounded by bloom_fpp), never visit one twice. Default off: the
    #: exact anti-join is the reference-parity contract.
    bloom_exclusive: bool = False
    #: which approximate seen-set sketch backs the prefilter / exclusive
    #: mode once bloom_threshold engages: "bloom" (smallest memory) or
    #: "cuckoo" (supports DELETION — un-see urls for re-crawl workflows;
    #: north_star's deletion fallback). Both are range-partitioned,
    #: executor-built, broadcast-probed.
    seen_sketch: str = "bloom"
    #: mega-host skew: the politeness-budget window is the crawl's only
    #: host-keyed ranking stage; with >1 salt bucket it runs as a two-phase
    #: (salted pre-rank, then exact re-rank over <= budget*buckets survivors
    #: per host) so one mega-host cannot serialize the stage onto a single
    #: task. Exact in all cases; 1 disables the pre-phase.
    #: (A frontier_partitions knob existed in round 1 but was dead: the fetch
    #: join's exchange IS the per-superstep url-hash repartition, so an extra
    #: repartition would only add a shuffle.)
    skew_salt_buckets: int = 16
    #: small-frontier fetch fast path: when the frontier holds at most this
    #: many rows, the fetch pushes the frontier's fetch_urls into the corpus
    #: scan as an IN filter (bucket pruning + parquet page stats skip most
    #: of the corpus). Exact — the filter keeps every possible join match.
    #: Default 0 (off): the per-superstep collect + literal-IN planning costs
    #: ~0.5 s, which LOSES whenever the corpus scan is cheap (measured -20%
    #: throughput on the light-page bench corpus); enable it only when scan
    #: decode dominates tail supersteps (very heavy pages, very wide
    #: corpora, remote object storage).
    fetch_in_filter_threshold: int = 0
    #: frontier priority (north_rule "priority queue"): SQL expression over
    #: frontier columns (url, fetch_url, depth, ext_depth, superstep,
    #: order_key); higher fetches first within each host's budget, ties by
    #: canonical order_key. None = exact FIFO reference parity. Only
    #: meaningful with host_budget (an unbudgeted superstep fetches its whole
    #: frontier anyway).
    priority_expr: str | None = None
    #: fetch realization: False = deterministic corpus join (the sandbox /
    #: replay path); True = real HTTP GETs via operators/live_fetch.py
    #: (honors user_agent, cookie, auth, tries, disable_certs_checks,
    #: delay/random_range — reference downloader.rs:73-184).
    live_fetch: bool = False
    #: parquet-snapshot checkpoint directory (Iceberg-style atomic superstep
    #: commits with a JSON manifest); None = in-memory localCheckpoint only.
    checkpoint_dir: str | None = None
    #: safety valve for runaway crawls (tests/bench); None = unbounded.
    max_supersteps: int | None = None
    #: wall-clock budget (seconds): stop at the first superstep BOUNDARY
    #: after the budget elapses — the BSP realization of the reference
    #: benchmark protocol (tests/benchmark.py:21-77 runs the crawler for a
    #: fixed RUN_TIME then SIGINTs it and counts pages). At least one
    #: superstep always runs; completed supersteps are never discarded, so
    #: the result is a valid resumable prefix of the full crawl. None =
    #: unbounded.
    max_wall_sec: float | None = None

    def __post_init__(self):
        object.__setattr__(self, "origin", urlkit.canonical_origin(self.origin))
        if self.visit_filter_is_download_filter:
            # Filter aliasing (scraper.rs:52-56).
            object.__setattr__(self, "include_visit", self.include_download)
            object.__setattr__(self, "exclude_visit", self.exclude_download)
        # Validate regexes and auth eagerly (reference compiles at arg parse).
        for pat in (self.include_visit, self.exclude_visit,
                    self.include_download, self.exclude_download):
            re.compile(pat)
        build_auth_map(list(self.auth), self.origin)

    # Compiled-once accessors (kept as methods so the dataclass stays picklable
    # without dragging compiled pattern objects through serialization).
    def visit_ok(self, raw_candidate: str) -> bool:
        """Visit filter on the *raw* candidate string (scraper.rs:352-369)."""
        if re.search(self.exclude_visit, raw_candidate) or not re.search(
            self.include_visit, raw_candidate
        ):
            return False
        return urlkit.visit_url_shape_ok(raw_candidate)

    def download_ok(self, url: str) -> bool:
        """Download filter on the resolved URL string (scraper.rs:238-239);
        gates persistence only — the page is fetched and parsed regardless."""
        return not re.search(self.exclude_download, url) and bool(
            re.search(self.include_download, url)
        )

    def auth_map(self) -> dict[str, tuple[str, str | None]]:
        return build_auth_map(list(self.auth), self.origin)

    def with_(self, **kw) -> "CrawlConfig":
        return replace(self, **kw)
