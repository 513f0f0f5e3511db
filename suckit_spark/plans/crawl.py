"""The bulk-synchronous crawl loop: one superstep per BFS queue generation.

With ``jobs=1`` the reference's FIFO channel makes the crawl an exact BFS —
every URL enqueued during generation *s* is processed after all of generation
*s* and before anything they enqueue (scraper.rs:50,316). That queue
discipline maps 1:1 onto a driver loop of set-oriented DataFrame operations:

    superstep s:
      frontier_s  --politeness budget-->  (selected, deferred)
        --LEFT JOIN pages ON fetch_url-->                 (the "fetch": the
              join exchange hash-partitions the frontier by canonical URL;
              the pages side is bucketed by url, so it never shuffles)
        --mapInPandas(page pipeline P1-P11)-->            (one Arrow stage)
        --mirror delta -> parquet (Iceberg-append shape)-->
        --posexplode(links)--> candidates
        --first-wins window dedup--> --bloom + anti-join seen-->
        --depth gates--> frontier_{s+1} (∪ deferred)
      append crawl_log / seen / metrics; commit snapshot
    until frontier empty                                   (exact termination;
                                       the reference polls an empty channel 10
                                       times, scraper.rs:315-321 — BSP needs no
                                       heuristic)

Determinism: each row carries ``order_key`` = parent's key + [link position].
(superstep, order_key) sorts the log in exactly the order the reference's
single worker would visit, with no global sequencing bottleneck in the loop
itself — a scalar ``visit_seq`` is assigned only in ``finalize`` (tests), via
one window over the final log.
"""

from __future__ import annotations

import os
import tempfile
import time
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from ..config import INFINITE_DEPTH, CrawlConfig
from ..operators import dedup as dedup_ops
from ..operators import frontier as frontier_ops
from ..operators.page_pipeline import make_page_pipeline
from ..schemas import (
    FRONTIER_SCHEMA, METRICS_SCHEMA, PAGE_RESULT_SCHEMA, PAGES_SCHEMA,
    SEEN_SCHEMA,
)
from ..functions import urlkit
from .checkpoint import CrawlCheckpoint

#: live-mode robots.txt fetches for hosts a superstep introduces run on the
#: driver up to this many (a Spark job costs more than it saves for a
#: handful); larger waves distribute the fetches as one Arrow stage.
_ROBOTS_DRIVER_FETCH_MAX = 4


class CrawlAbort(RuntimeError):
    """Fetch failure without --continue-on-error (scraper.rs:275-281)."""




@dataclass
class CrawlResult:
    mirror: DataFrame
    crawl_log: DataFrame          # ordered, with visit_seq
    seen: DataFrame
    metrics: DataFrame
    supersteps: int
    wall_times: list[float] = dc_field(default_factory=list)
    #: per-superstep phase breakdown (fetch+parse+mirror write / small deltas
    #: / candidate dedup / commit), for scaling diagnosis
    phase_times: list[dict] = dc_field(default_factory=list)
    #: parquet spill dir holding mirror deltas (delete only after consuming
    #: result.mirror)
    spill_dir: str | None = None
    #: True when spill_dir is a crawl-created temp dir (safe to delete);
    #: False when it is the caller's checkpoint_dir.
    owns_spill_dir: bool = False

    def close(self) -> None:
        """Delete the temp spill dir backing ``mirror``. Call once the mirror
        (and log/metrics) DataFrames are fully consumed; they are invalid
        afterwards. No-op when the spill dir is the caller's checkpoint_dir."""
        import shutil

        if self.owns_spill_dir and self.spill_dir:
            shutil.rmtree(self.spill_dir, ignore_errors=True)

    def materialize_mirror(self, output_dir: str) -> None:
        """Write the actual file tree (disk.rs parity): bytes per path, plus
        symlinks for content-disposition filenames. Executor-side
        ``foreachPartition`` — no driver collect."""
        import os

        def write_partition(rows):
            for r in rows:
                if r.filename:
                    fpath = os.path.join(output_dir, r.filename)
                    os.makedirs(os.path.dirname(fpath) or output_dir, exist_ok=True)
                    with open(fpath, "wb") as f:
                        f.write(bytes(r.content) if r.content is not None else b"")
                    link = os.path.join(output_dir, r.path)
                    os.makedirs(os.path.dirname(link), exist_ok=True)
                    if not os.path.lexists(link):
                        os.symlink(r.symlink_target, link)
                else:
                    fpath = os.path.join(output_dir, r.path)
                    os.makedirs(os.path.dirname(fpath), exist_ok=True)
                    with open(fpath, "wb") as f:
                        f.write(bytes(r.content) if r.content is not None else b"")

        os.makedirs(output_dir, exist_ok=True)
        self.mirror.foreachPartition(write_partition)


def _normalize_pages(pages: DataFrame) -> DataFrame:
    """Ensure every PAGES_SCHEMA column exists (missing -> null)."""
    existing = set(pages.columns)
    cols = [
        F.col(f.name) if f.name in existing else F.lit(None).cast(f.dataType).alias(f.name)
        for f in PAGES_SCHEMA.fields
    ]
    return pages.select(*cols)


def _seed_frontier(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    origin = cfg.origin
    row = [(origin, urlkit.strip_fragment(origin), 0, 0, 0, [0])]
    return spark.createDataFrame(row, FRONTIER_SCHEMA)


def crawl(
    spark: SparkSession,
    cfg: CrawlConfig,
    pages: DataFrame,
    resume: bool = False,
    stop_event=None,
) -> CrawlResult:
    """Run the full crawl; returns result DataFrames (nothing collected).

    ``stop_event`` (a ``threading.Event``-like object) requests a graceful
    stop: checked at the same superstep boundary as ``max_wall_sec``, after
    at least one superstep, so every completed superstep remains a valid
    resumable prefix. This is the BSP realization of interrupting the
    reference mid-crawl (tests/benchmark.py SIGINTs the process and the
    already-written files persist)."""
    pages = _normalize_pages(pages)
    # Column-prune the fetch side once: the page pipeline consumes the raw
    # body + fetch metadata; ``text``/``lang``/``warc_ts`` are corpus
    # annotations it never reads. Pruning here (not relying on Catalyst,
    # which cannot prune through the vUDF's opaque column use) keeps ~half
    # the corpus bytes out of every superstep's scan/decode.
    fetch_pages = pages.select(
        "url", "html", "content_type", "content_disposition",
        "requires_auth", "auth_user", "auth_pass", "status")
    # Fetch-side layout (north_rule partitioning discipline): the corpus side
    # of the per-superstep join must not be exchanged per superstep. A
    # url-bucketed table (sources/corpus.prepare_pages_table; Iceberg
    # ``bucket(N, url)`` at the design point) already satisfies this — its
    # scan reports ``Bucketed: true``. Any other input (the library default:
    # an arbitrary in-memory DataFrame) is re-laid-out ONCE here:
    # hash-repartition by url + sort within partitions + persist serialized.
    # InMemoryTableScan preserves both partitioning and ordering, so each
    # superstep's sort-merge fetch join exchanges and sorts ONLY the frontier
    # (previously the whole corpus re-shuffled AND re-sorted per superstep).
    owns_pages_cache = False
    if not cfg.live_fetch and not _scan_is_bucketed(spark, fetch_pages):
        from pyspark import StorageLevel
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        fetch_pages = (
            fetch_pages.repartition(n_part, "url")
            .sortWithinPartitions("url")
            .persist(StorageLevel.MEMORY_AND_DISK))
        owns_pages_cache = True
    ckpt = CrawlCheckpoint(spark, cfg.checkpoint_dir) if cfg.checkpoint_dir else None

    # Content-bearing superstep output is streamed to table storage (the
    # Iceberg-append shape; Parquet fallback), never accumulated in executor
    # memory: at 10^10-URL scale a crawl's mirror is far bigger than cluster
    # RAM, and even at bench scale pinning every superstep's rewritten bytes
    # in the block manager causes GC/eviction thrash. The checkpoint dir
    # doubles as that storage; without one, a temp spill dir serves.
    spill_dir = cfg.checkpoint_dir or tempfile.mkdtemp(prefix="suckit_spill_")

    # The seen set is kept as a list of per-superstep delta DataFrames (each
    # one already materialized): the anti-join reads their lazy union, so a
    # superstep never pays to re-copy the whole accumulated seen table —
    # O(total) work per superstep becomes O(delta). (Iceberg snapshots are
    # exactly this append-only shape; SURVEY.md §4.)
    if resume and ckpt is not None and ckpt.last_superstep() is not None:
        state = ckpt.load()
        frontier = state["frontier"]
        seen_deltas = [state["seen"]]
        seen_count = state["seen"].count()
        step = state["superstep"] + 1
        mirror_deltas = ([_mirror_view(state["result"])]
                         if state["result"] is not None else [])
        log_deltas = [state["crawl_log"]] if state["crawl_log"] is not None else []
        metric_deltas = [state["metrics"]] if state["metrics"] is not None else []
    else:
        frontier = _seed_frontier(spark, cfg)
        seen_deltas = [spark.createDataFrame([(cfg.origin, 0)], SEEN_SCHEMA)]
        seen_count = 1
        step = 0
        mirror_deltas, log_deltas, metric_deltas = [], [], []

    pipeline = make_page_pipeline(cfg, emit_page_text=False)
    wall_times: list[float] = []
    phase_times: list[dict] = []
    seen = _union_all(spark, seen_deltas, SEEN_SCHEMA)
    # Seen rows not yet covered by a committed snapshot (the seed row on a
    # fresh start; empty on resume — everything loaded was committed). Each
    # commit flushes these so the append-only seen log stays complete.
    pending_seen = [] if (resume and ckpt is not None
                          and step > 0) else list(seen_deltas)

    # seen-set sketch: BloomState or CuckooState (same interface)
    bloom_state = None

    robots_udf = None
    robots_rules_table: DataFrame | None = None
    live_robots_rules: dict | None = None
    if cfg.respect_robots:
        from ..operators import robots as robots_ops
        if cfg.live_fetch:
            # live mode: rules are fetched over HTTP per newly-seen host,
            # incrementally, inside the loop (one robots.txt per host ever).
            live_robots_rules = {}
        else:
            # Gate realization by scale (robots.py module doc): a driver
            # dict + broadcast UDF while the robots host count is small; a
            # distributed (host, prefixes) table + equi-join gate past
            # robots_join_threshold, where the dict itself would be GBs.
            thr = cfg.robots_join_threshold
            n_robots_hosts = (
                pages.filter(F.col("url").endswith("/robots.txt")).count()
                if thr is not None else 0)
            if thr is not None and n_robots_hosts >= thr:
                robots_rules_table = robots_ops.robots_rules_df(
                    pages, cfg.user_agent).localCheckpoint(eager=True)
            else:
                rules = robots_ops.collect_robots_rules(pages, cfg.user_agent)
                robots_udf = robots_ops.allowed_filter(spark, rules)

    # Cookie state, live mode (reference cookie_store(true)): (a) a per-run
    # token keys each worker process's accumulating CookieJar (full attribute
    # semantics, same-worker requests); (b) a driver-held relay store folds
    # every response's Set-Cookie — shipped back through the superstep
    # parquet, one pruned column read — into the NEXT superstep's request
    # headers, so a session cookie minted on one executor reaches requests on
    # every other. Driver state is one entry per cookie-setting host (same
    # scale envelope as the live robots dict).
    live_jar_key = None
    live_cookie_store: dict = {}
    live_robots_delays: dict = {}
    if cfg.live_fetch:
        import uuid
        live_jar_key = f"crawl-{uuid.uuid4().hex}"

    frontier_count = frontier.count()
    crawl_t0 = time.monotonic()
    steps_run = 0
    while frontier_count > 0:
        if cfg.max_supersteps is not None and step >= cfg.max_supersteps:
            break
        # Wall-clock budget (reference benchmark protocol: fixed RUN_TIME,
        # count pages): checked at the superstep BOUNDARY, after at least
        # one superstep, so every completed superstep remains a valid
        # resumable prefix.
        if (cfg.max_wall_sec is not None and steps_run > 0
                and time.monotonic() - crawl_t0 >= cfg.max_wall_sec):
            break
        # Graceful interrupt (same boundary semantics as the wall budget).
        if stop_event is not None and steps_run > 0 and stop_event.is_set():
            break
        t0 = time.monotonic()

        # C3: per-host politeness budget — overflow defers, order preserved;
        # salted two-phase window so a mega-host cannot serialize the stage.
        selected, deferred = frontier_ops.apply_host_budget(
            frontier, cfg.host_budget, salt_buckets=cfg.skew_salt_buckets,
            priority_expr=cfg.priority_expr)

        # S2/S3: the fetch = LEFT OUTER join against the pages corpus,
        # preserving every frontier row (a missing page is a fetch error, not
        # a dropped row). Shuffle discipline: only the FRONTIER side may be
        # exchanged — the join key is the canonical URL, so that exchange IS
        # the explicit url-hash repartition of each superstep (north_rule);
        # the pages side must expose a reusable url partitioning (Iceberg
        # ``bucket(N, url)`` at the 10^10 design point; a parquet ``bucketBy``
        # table in the sandbox, scripts/submit_crawl.py) so its scan avoids
        # both exchange and sort. A flat un-bucketed corpus was re-laid-out
        # ONCE above (repartition + sort + persist), so it joins the same way.
        # (Broadcasting a small frontier is NOT an option here: Spark cannot
        # build the preserved side of an outer join, so a broadcast hint on
        # the frontier of a right-outer join silently degrades to shuffling
        # the whole corpus.) Host-skew salting applies to the host-keyed
        # stages (budget window, metrics), not this url-keyed join — url
        # hashes of one mega-host already spread uniformly.
        if cfg.live_fetch:
            from ..operators import live_fetch as live_fetch_ops
            if cfg.respect_robots:
                # Fetch robots.txt for hosts this superstep introduces.
                # Two realizations by host count (the same scale gate corpus
                # mode has): below robots_join_threshold the driver holds a
                # small rules dict (one entry per host), re-broadcast only
                # when it grew; PAST the threshold the rules live in a
                # distributed (host, prefixes) DataFrame fed directly by the
                # distributed robots fetches — the driver never stores a
                # prefix again (a 10^8-host live crawl would otherwise grow
                # a GB-scale dict and re-broadcast it every wave), and the
                # gate becomes the same apply_robots_join equi-join the
                # corpus path uses. Crawl-delays stay driver-side either
                # way: one float per host that declares one — rare, and the
                # fetch stage needs them as a plain dict.
                from ..operators import robots as robots_ops
                bases_df = (
                    selected.select(
                        F.regexp_extract(
                            "fetch_url", "^(https?://[^/]+)", 1).alias("base"),
                        frontier_ops.host_col().alias("h"))
                    .filter(F.col("h").isNotNull()).distinct())
                if live_robots_rules is not None:
                    bases = bases_df.collect()
                    new_hosts = [
                        (r.base, r.h) for r in bases
                        if r.h not in live_robots_rules]
                else:
                    # join mode: membership lives in the rules table; only
                    # genuinely new hosts ever reach the driver (one tiny
                    # row each, per wave).
                    new_hosts = [
                        (r.base, r.h) for r in bases_df.join(
                            robots_rules_table.select(
                                F.col("host").alias("h")),
                            on="h", how="left_anti").collect()]
                grew = bool(new_hosts)
                # A frontier wave can introduce thousands of hosts; fetching
                # each robots.txt from the driver would serialize the
                # superstep on network latency. Past a handful, distribute
                # the fetches as one Arrow stage (jobs-bounded, the same
                # parallelism envelope as the page fetch itself); the collect
                # is one tiny row per new host. Below the threshold a Spark
                # job costs more than it saves.
                if len(new_hosts) <= _ROBOTS_DRIVER_FETCH_MAX:
                    fetched_txt = [
                        (h, live_fetch_ops.fetch_robots_txt(cfg, base))
                        for base, h in new_hosts]
                else:
                    bdf = spark.createDataFrame(
                        new_hosts, "base string, h string").repartition(
                        min(len(new_hosts), max(cfg.jobs, 1) * 4))
                    cfg_ser = cfg

                    def _fetch_robots(batches):
                        from ..operators import live_fetch as lf
                        for pdf in batches:
                            pdf = pdf.assign(txt=[
                                lf.fetch_robots_txt(cfg_ser, b)
                                for b in pdf["base"]])
                            yield pdf[["h", "txt"]]

                    fetched_txt = [
                        (r.h, r.txt) for r in bdf.mapInPandas(
                            _fetch_robots, "h string, txt string").collect()]
                new_rule_rows = []
                for h, txt in fetched_txt:
                    prefixes = robots_ops.parse_robots(txt, cfg.user_agent)
                    if live_robots_rules is not None:
                        live_robots_rules[h] = prefixes
                    else:
                        new_rule_rows.append((h, prefixes))
                    # de-facto Crawl-delay directive: per-host politeness
                    # floor, enforced in the fetch stage (stricter of this
                    # and cfg.delay wins)
                    d = robots_ops.parse_crawl_delay(txt, cfg.user_agent)
                    if d is not None:
                        live_robots_delays[h] = d
                thr = cfg.robots_join_threshold
                if (live_robots_rules is not None and thr is not None
                        and len(live_robots_rules) >= thr):
                    # Threshold crossing: seed the distributed rules table
                    # from the dict, then stop maintaining the dict. (At
                    # real scale the union-per-wave below is an append to a
                    # rules TABLE — Iceberg append in production; an
                    # eagerly-materialized localCheckpoint caps lineage in
                    # the sandbox.)
                    robots_rules_table = spark.createDataFrame(
                        list(live_robots_rules.items()),
                        "host string, prefixes array<string>",
                    ).localCheckpoint(eager=True)
                    live_robots_rules = None
                    robots_udf = None
                elif live_robots_rules is None and new_rule_rows:
                    robots_rules_table = robots_rules_table.unionByName(
                        spark.createDataFrame(
                            new_rule_rows,
                            "host string, prefixes array<string>")
                    ).localCheckpoint(eager=True)
                if live_robots_rules is not None and (
                        grew or robots_udf is None):
                    robots_udf = robots_ops.allowed_filter(
                        spark, dict(live_robots_rules))
                # Re-gate the SELECTED rows with the refreshed rules before
                # fetching: a URL admitted to the frontier before its host's
                # robots.txt existed (every seed; each new host's first
                # wave — its links were gated when the host had no rules and
                # allow-by-default applied) must still not be FETCHED if the
                # just-fetched rules disallow it. Dropped rows stay in the
                # seen set: the rules that exclude them are now loaded, so
                # re-discovery would be dropped at candidate time anyway.
                if live_robots_rules is not None:
                    selected = robots_ops.apply_robots(
                        selected, robots_udf, url_col="fetch_url")
                else:
                    selected = robots_ops.apply_robots_join(
                        selected, robots_rules_table, url_col="fetch_url")
            fetched = live_fetch_ops.fetch_frontier(
                selected, cfg, jar_key=live_jar_key,
                relay_cookies=live_fetch_ops.render_cookie_headers(
                    live_cookie_store),
                host_delays=dict(live_robots_delays))
        else:
            pages_k = fetch_pages.withColumnRenamed("url", "page_url")
            # Small-frontier fast path: push the (few) fetch_urls into the
            # corpus scan as an IN filter — bucket pruning + row-group stats
            # skip almost all of the corpus, so a tail superstep costs
            # O(frontier), not O(corpus scan). Exact: the filter keeps every
            # possible match of the left join. Driver traffic is bounded by
            # the threshold (a few hundred KB of url strings).
            if 0 < frontier_count <= cfg.fetch_in_filter_threshold:
                urls = sorted({r.fetch_url for r in
                               selected.select("fetch_url").collect()})
                pages_k = pages_k.filter(F.col("page_url").isin(urls))
            fetched = selected.join(
                pages_k,
                on=F.col("fetch_url") == F.col("page_url"),
                how="left",
            )
            fetched = fetched.withColumn(
                "found", F.col("page_url").isNotNull()).drop("page_url")

        # P1-P11 fused in one Arrow stage, then ONE write job per superstep:
        # the full (content-bearing) page result streams straight to table
        # storage (Iceberg-append shape; parquet fallback). Every downstream
        # consumer — mirror view, crawl log, metrics, candidate explode —
        # is a COLUMN-PRUNED read of that parquet, so the heavy content
        # bytes pass through executor memory exactly once (no block-manager
        # cache of multi-GB supersteps, which thrashed at high core counts)
        # and the old second materialization job for the small deltas is
        # gone. n_bytes is precomputed so the log never re-reads content.
        result = fetched.mapInPandas(pipeline, PAGE_RESULT_SCHEMA)
        store = result.drop("page_text").withColumn(
            "n_bytes",
            F.coalesce(F.length("content"), F.lit(0)).cast("long"))
        if cfg.dry_run:
            # dry run persists no page bytes anywhere — not even spill.
            store = store.withColumn("content", F.lit(None).cast("binary"))
        step_path = os.path.join(spill_dir, f"step={step:06d}", "result")
        # Error count rides the WRITE job as an Observation (one driver job
        # per superstep saved vs the old status-pruned head(1) read): the
        # C6 abort path only re-reads the store for the failing url when
        # the observed count says there is one.
        store_obs = Observation(f"store_{step}")
        store = store.observe(
            store_obs,
            F.sum((F.col("status") == "error").cast("long")).alias("n_err"))
        t_fetch0 = time.monotonic()
        store.write.mode("overwrite").parquet(step_path)
        t_fetch = time.monotonic() - t_fetch0
        n_err_step = int(store_obs.get["n_err"] or 0)
        # Explicit schema: re-reading with inference would cost a driver job
        # per superstep just to re-discover a schema we already know.
        result_pq = spark.read.schema(_result_store_schema()).parquet(step_path)

        # Mirror view (lazy projection; content IS NULL marks dry-run rows,
        # never a real saved page — 'ok' pages always carry bytes, empty 401
        # bodies included).
        mirror_delta = _mirror_view(result_pq)

        # Harvest Set-Cookie responses into the relay store (live mode): a
        # column-pruned read of the superstep parquet, bounded by the pages
        # that actually set cookies this superstep. The relay scopes cookies
        # to the WHOLE fetch host (Domain/Path attributes are intentionally
        # not honored — a /app-scoped cookie is also sent to /other on the
        # same host, and a Domain=.example.com cookie does NOT fan out to
        # sibling subdomains); Secure and deletion ARE honored (see
        # merge_set_cookie_lines). Full RFC scoping lives in the per-worker
        # CookieJar that handles same-executor requests.
        if cfg.live_fetch:
            from ..operators import live_fetch as live_fetch_ops
            sc_rows = (
                result_pq.filter(F.col("set_cookie").isNotNull())
                .select(frontier_ops.host_col("fetch_url").alias("h"),
                        "set_cookie").collect())
            for r in sc_rows:
                if r.h:
                    live_fetch_ops.merge_set_cookie_lines(
                        live_cookie_store, r.h, r.set_cookie)

        # C6: error policy — the count came free with the write job; the
        # url-bearing read runs only on the (rare) abort path itself.
        if not cfg.continue_on_error and n_err_step > 0:
            err = result_pq.filter(
                F.col("status") == "error").select("url").head(1)
            if err:
                raise CrawlAbort(f"Couldn't download a page: {err[0].url}")

        # P4-P8: explode candidates, gate, dedup, grow the seen set.
        t_cand0 = time.monotonic()
        cand = (
            result_pq.select(
                F.col("url").alias("parent_url"),
                F.col("depth"), F.col("ext_depth"),
                F.col("order_key").alias("parent_key"),
                F.explode("links").alias("link"),
            )
            .select(
                F.col("link.url").alias("url"),
                F.col("link.external").alias("external"),
                F.col("depth"), F.col("ext_depth"),
                F.concat("parent_key", F.array(F.col("link.pos").cast("long")))
                .alias("order_key"),
            )
        )
        # robots.txt gate (broadcast rules or rules-table join): blocked
        # candidates are dropped at discovery time — never enqueued, never
        # marked seen.
        if robots_udf is not None:
            from ..operators import robots as robots_ops
            cand = robots_ops.apply_robots(cand, robots_udf)
        elif robots_rules_table is not None:
            from ..operators import robots as robots_ops
            cand = robots_ops.apply_robots_join(cand, robots_rules_table)

        # First-wins within the superstep (window, order-preserving) then
        # exact anti-join against seen, bloom-prefiltered when seen is large.
        # The bloom is built incrementally (BloomState): once engaged, each
        # superstep ORs only its seen DELTA into the filter — build cost is
        # O(delta), never a rebuild over the accumulated seen table.
        winners = dedup_ops.first_wins(cand, "url", "order_key")
        if cfg.bloom_exclusive and bloom_state is not None:
            # Approximate seen-set mode: probe only, no O(seen) shuffle.
            new_urls = dedup_ops.probe_unseen(winners, bloom_state)
        else:
            new_urls = dedup_ops.anti_join_seen(
                winners, seen, "url",
                seen_count=seen_count,
                bloom_threshold=cfg.bloom_threshold,
                bloom_fpp=cfg.bloom_fpp,
                bloom_state=bloom_state,
            )
        # F5/F6: depth gates choose which newly-seen URLs are actually
        # fetched (defined here so the gate predicate can ride the
        # checkpoint job as an Observation).
        local_gate = (
            F.lit(True) if cfg.depth == INFINITE_DEPTH
            else F.col("depth") < cfg.depth)
        ext_gate = (
            F.lit(True) if cfg.ext_depth == INFINITE_DEPTH
            else F.col("ext_depth") < cfg.ext_depth)
        gate_pred = ((~F.col("external") & local_gate)
                     | (F.col("external") & ext_gate))
        # The new-seen and next-frontier row counts ride the checkpoint's
        # materialization job as an Observation — no separate aggregation
        # job per superstep (the flat "rest" barrier the N->4N scaling
        # curve pays at every level).
        counts_obs = Observation(f"new_{step}")
        new_urls = new_urls.observe(
            counts_obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(gate_pred.cast("long")).alias("gated"))
        new_urls = new_urls.localCheckpoint(eager=True)
        t_cand = time.monotonic() - t_cand0

        next_frontier = (
            new_urls.filter(
                (~F.col("external") & local_gate) | (F.col("external") & ext_gate))
            .select(
                "url",
                F.split(F.col("url"), "#", 2).getItem(0).alias("fetch_url"),
                F.when(~F.col("external"), F.col("depth") + 1)
                .otherwise(F.col("depth")).alias("depth"),
                F.when(F.col("external"), F.col("ext_depth") + 1)
                .otherwise(F.col("ext_depth")).alias("ext_depth"),
                F.lit(step + 1).alias("superstep"),
                "order_key",
            )
        )
        if deferred is not None:
            next_frontier = next_frontier.unionByName(
                deferred.withColumn("superstep", F.lit(step + 1)))

        # Small (content-free) delta for this superstep: a lazy column-pruned
        # projection of the superstep parquet (stable storage — no
        # checkpoint job needed); metrics stay a lazy rollup over it.
        t_deltas0 = time.monotonic()
        log_delta = result_pq.select(
            "url", "depth", "ext_depth", "superstep", "order_key",
            F.col("download").alias("downloaded"), "status",
            frontier_ops.host_col("fetch_url").alias("__host"),
            F.col("n_bytes").alias("__n_bytes"),
        )
        metrics_delta = (
            log_delta.groupBy(
                F.lit(step).alias("superstep"),
                F.col("__host").alias("host"))
            .agg(
                F.count("*").alias("pages"),
                F.sum("__n_bytes").alias("bytes"),
                F.sum((F.col("status") == "error").cast("long")).alias("errors"),
                F.lit(0).cast("long").alias("new_urls"),
            )
        )
        t_deltas = time.monotonic() - t_deltas0

        # Commit the superstep. next_frontier is a cheap projection over the
        # already-checkpointed new_urls, so it only needs its own
        # materialization when a budget deferral chains it to the previous
        # frontier's lineage. The new-seen and next-frontier row counts were
        # observed during the checkpoint job itself (counts_obs above) —
        # zero extra jobs.
        if deferred is not None:
            next_frontier = next_frontier.localCheckpoint(eager=True)
        counts = counts_obs.get
        new_count = int(counts["n"] or 0)
        seen_count += new_count
        seen_delta = new_urls.select("url", F.lit(step).alias("superstep"))
        seen_deltas.append(seen_delta)
        pending_seen.append(seen_delta)
        seen = _union_all(spark, seen_deltas, SEEN_SCHEMA)
        # Seen-delta compaction: the anti-join reads this lazy union, whose
        # plan grows one branch per superstep — at thousands of supersteps
        # the planning/serialization cost alone would dominate. Collapse the
        # union into ONE materialized table whenever it exceeds K deltas:
        # O(seen) once every K steps (amortized O(seen/K)), union width
        # capped at K, and the per-delta localCheckpoint blocks it replaces
        # become collectable. (The parquet checkpoint layout already has this
        # shape — step deltas + periodic manifests; this is the in-memory
        # twin.)
        if (cfg.seen_compact_interval is not None
                and len(seen_deltas) > cfg.seen_compact_interval):
            seen = seen.localCheckpoint(eager=True)
            seen_deltas = [seen]
        # Maintain the incremental seen-set sketch once past the threshold
        # (bloom by default; cuckoo when deletions must stay possible).
        if cfg.bloom_threshold is not None and seen_count >= cfg.bloom_threshold:
            if bloom_state is None:
                if cfg.seen_sketch == "cuckoo":
                    from ..operators.cuckoo import CuckooState
                    bloom_state = CuckooState(
                        "url", capacity=seen_count * CuckooState.GROWTH)
                else:
                    bloom_state = dedup_ops.BloomState(
                        "url",
                        capacity=seen_count * dedup_ops.BloomState.GROWTH,
                        fpp=cfg.bloom_fpp)
                bloom_state.add(seen, seen_count)
            else:
                bloom_state.add(seen_delta, new_count, full_seen=seen)
        frontier = next_frontier
        if deferred is not None:
            frontier_count = frontier.count()
        else:
            frontier_count = int(counts["gated"] or 0)

        # S9 log sink (logger.rs): verbose echoes every URL of the superstep
        # in canonical order on the driver — debug surface, off by default.
        if cfg.verbose:
            from .. import logger as logkit
            logkit.echo_superstep(log_delta, step)

        # all three are lazy views over the superstep's parquet store
        mirror_deltas.append(mirror_delta)
        log_deltas.append(log_delta)
        metric_deltas.append(metrics_delta)

        wall = time.monotonic() - t0
        wall_times.append(wall)
        phase_times.append({
            "superstep": step,
            "fetch_parse_mirror": round(t_fetch, 3),
            "small_deltas": round(t_deltas, 3),
            "cand_dedup": round(t_cand, 3),
            "rest": round(wall - t_fetch - t_deltas - t_cand, 3),
        })
        if ckpt is not None:
            ckpt.commit(
                step,
                frontier=frontier,
                seen_delta=_union_all(spark, pending_seen, SEEN_SCHEMA),
                log_delta=log_delta,
                metrics_delta=metrics_delta,
                stats={"frontier_rows": frontier_count, "new_urls": new_count,
                       "wall_sec": wall},
            )
            pending_seen = []
        step += 1
        steps_run += 1

    if owns_pages_cache:
        # Nothing returned depends on the corpus cache (mirror is
        # parquet-backed; log/seen are checkpointed).
        fetch_pages.unpersist()

    spark_ = spark
    mirror = _union_all(spark_, mirror_deltas, _mirror_schema())
    log = _union_all(spark_, log_deltas, _log_schema())
    metrics = _union_all(spark_, metric_deltas, METRICS_SCHEMA)

    # Canonical jobs=1 visit order (single window, finalize-only — the loop
    # itself never needs a global ordering).
    from pyspark.sql.window import Window
    w = Window.orderBy("superstep", "order_key")
    log = log.withColumn("visit_seq", F.row_number().over(w).cast("long")).select(
        "url", "depth", "ext_depth", "superstep", "order_key", "visit_seq",
        "downloaded", "status")

    return CrawlResult(
        mirror=mirror, crawl_log=log, seen=seen, metrics=metrics,
        supersteps=step, wall_times=wall_times, phase_times=phase_times,
        spill_dir=spill_dir, owns_spill_dir=cfg.checkpoint_dir is None,
    )


def _scan_is_bucketed(spark: SparkSession, fetch_pages: DataFrame) -> bool:
    """True iff the pages input exposes a url-bucketed layout the fetch join
    can reuse. The probe must be a JOIN plan: on a bare scan the planner
    reports ``Bucketed: false (disabled by query planner)`` because nothing
    requires the distribution — probing that (round-2 regression) made
    crawl() re-layout already-bucketed tables. Broadcast is disabled during
    planning so a small corpus can't hide its buckets behind a
    BroadcastHashJoin."""
    probe = spark.createDataFrame([("",)], "fetch_url string")
    joined = probe.join(
        fetch_pages.select(F.col("url").alias("page_url")),
        on=F.col("fetch_url") == F.col("page_url"), how="left")
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        return "Bucketed: true" in _plan_string(joined)
    finally:
        spark.conf.set(key, old)


def _plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """Physical-plan text (what ``df.explain(mode)`` prints), as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def _symlink_target_col():
    """Relative target from the canonical path's directory to the
    content-disposition filename at the output root (disk.rs:35-65)."""
    # Count real directory components: Rust Path::components (and posixpath)
    # skip empty segments from doubled slashes.
    segs = F.filter(F.split(F.col("path"), "/"), lambda x: x != F.lit(""))
    depth = F.size(segs) - F.lit(1)
    ups = F.concat_ws("", F.array_repeat(F.lit("../"), depth))
    return F.concat(ups, F.col("filename"))


def _union_all(spark, dfs, schema):
    if not dfs:
        return spark.createDataFrame([], schema)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _mirror_schema():
    from ..schemas import MIRROR_SCHEMA
    return MIRROR_SCHEMA


def _result_store_schema():
    """Per-superstep parquet store: PAGE_RESULT minus page_text (produced by
    the parse pass but consumed by nothing in the loop — shipping it through
    Arrow + parquet would roughly double the write bytes of an HTML-heavy
    superstep) plus the precomputed n_bytes."""
    from pyspark.sql.types import LongType, StructField, StructType
    fields = [f for f in PAGE_RESULT_SCHEMA.fields if f.name != "page_text"]
    return StructType(fields + [StructField("n_bytes", LongType())])


def _mirror_view(result_pq: DataFrame) -> DataFrame:
    """Mirror projection over a superstep result store (see crawl loop)."""
    return (
        result_pq.filter(
            (F.col("status") == "ok") & F.col("download")
            & F.col("content").isNotNull())
        .select(
            "url", "path", "filename", "content", "superstep",
            F.when(F.col("filename").isNotNull(), _symlink_target_col())
            .alias("symlink_target"),
        )
    )


def _log_schema():
    from pyspark.sql.types import (
        ArrayType, BooleanType, IntegerType, LongType, StringType,
        StructField, StructType,
    )
    return StructType([
        StructField("url", StringType()),
        StructField("depth", IntegerType()),
        StructField("ext_depth", IntegerType()),
        StructField("superstep", IntegerType()),
        StructField("order_key", ArrayType(LongType())),
        StructField("downloaded", BooleanType()),
        StructField("status", StringType()),
    ])
