"""``python -m suckit_spark`` — the reference's CLI surface on the Spark engine.

Accepts the reference binary's exact flag set (all 19 fields of ``Args``,
reference args.rs:8-162, same short/long names and defaults), so a user of
``suckit <url> -o dir -j 8 -d 2 ...`` can switch to
``python -m suckit_spark <url> -o dir -j 8 -d 2 ...`` unchanged. Default
execution is a LIVE crawl (real HTTP GETs, operators/live_fetch.py), exactly
like the reference; the engine-only extensions (replaying a Common-Crawl-style
pages table or WARC segments instead of the network, politeness budgets,
robots, checkpoints) live under a separate "engine" flag group.

The mirror is written as a real file tree (files + content-disposition
symlinks, disk.rs parity) under ``--output``; like the reference, no
``--output`` means the current directory (disk.rs:14-16: ``None`` path =>
bare relative paths).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="suckit_spark",
        description="Recursively visit and download a website as a local "
                    "mirror, on Spark (flag-compatible with the reference "
                    "suckit CLI).")
    # ---- reference Args, args.rs:8-162 (same names, shorts, defaults) ----
    p.add_argument("url", help="Entry point of the scraping")
    p.add_argument("-V", "--version", action="version",
                   version="suckit_spark 0.2.0 (reference-parity: "
                           "Skallwar/suckit v0.2.0)")
    p.add_argument("-o", "--output", default=None, help="Output directory")
    p.add_argument("-j", "--jobs", type=int, default=1,
                   help="Maximum number of workers to use concurrently")
    p.add_argument("-d", "--depth", type=int, default=-1,
                   help="Maximum recursion depth to reach when visiting. "
                        "Default is -1 (infinity)")
    p.add_argument("--ext-depth", type=int, default=0,
                   help="Maximum recursion depth to reach when visiting "
                        "external domains. Default is 0. -1 means infinity")
    p.add_argument("-t", "--tries", type=int, default=20,
                   help="Maximum amount of retries on download failure")
    p.add_argument("-v", "--verbose", action="store_true",
                   help="Enable more information regarding the scraping "
                        "process")
    p.add_argument("--delay", type=int, default=0,
                   help="Add a delay in seconds between downloads")
    p.add_argument("--random-range", type=int, default=0,
                   help="Generate an extra random delay between downloads, "
                        "from 0 to this number, added to the base delay")
    p.add_argument("-u", "--user-agent", default="suckit",
                   help="User agent to be used for sending requests")
    p.add_argument("--cookie", default="",
                   help="Cookie to send with each request, format: "
                        "key1=value1;key2=value2")
    p.add_argument("--include-visit", default=".*",
                   help="Regex filter to limit to only visiting pages that "
                        "match this expression")
    p.add_argument("--exclude-visit", default="$^",
                   help="Regex filter to exclude visiting pages that match "
                        "this expression")
    p.add_argument("-i", "--include-download", default=".*",
                   help="Regex filter to limit to only saving pages that "
                        "match this expression")
    p.add_argument("-e", "--exclude-download", default="$^",
                   help="Regex filter to exclude saving pages that match "
                        "this expression")
    p.add_argument("--visit-filter-is-download-filter", action="store_true",
                   help="Use the download filter in/exclude regexes for "
                        "visiting as well")
    p.add_argument("-a", "--auth", action="append", nargs="+", default=[],
                   help='HTTP basic auth space-separated as "username '
                        'password host"; repeatable for multiple credentials')
    p.add_argument("-c", "--continue-on-error", action="store_true",
                   help="Flag to enable or disable exit on error")
    p.add_argument("--dry-run", action="store_true",
                   help="Do everything without saving the files to the disk")
    p.add_argument("--disable-certs-checks", action="store_true",
                   help="Disable SSL certificates verification")

    # ---- engine extensions (no reference counterpart) ----
    g = p.add_argument_group("engine (Spark) options")
    g.add_argument("--pages-parquet", default=None, metavar="DIR",
                   help="replay mode: fetch = join against this parquet "
                        "pages table instead of live HTTP")
    g.add_argument("--warc-dir", default=None, metavar="DIR",
                   help="replay mode: ingest .warc/.warc.gz segments in DIR "
                        "as the pages corpus")
    g.add_argument("--master", default="local[*]",
                   help="Spark master (default local[*])")
    g.add_argument("--shuffle-partitions", type=int, default=None)
    g.add_argument("--host-budget", type=int, default=None,
                   help="max pages fetched per host per superstep")
    g.add_argument("--respect-robots", action="store_true",
                   help="honor robots.txt Disallow rules")
    g.add_argument("--checkpoint-dir", default=None,
                   help="resumable superstep snapshots under this directory")
    g.add_argument("--resume", action="store_true",
                   help="continue an interrupted crawl from the last "
                        "committed superstep in --checkpoint-dir")
    g.add_argument("--max-supersteps", type=int, default=None)
    g.add_argument("--max-wall-sec", type=float, default=None,
                   help="stop at the first superstep boundary past this "
                        "wall-clock budget")
    g.add_argument("--stats-json", default=None, metavar="FILE",
                   help="write a one-line JSON crawl summary here")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)

    from .config import CrawlConfig
    from .plans.crawl import CrawlAbort, crawl
    from .schemas import PAGES_SCHEMA

    # Reference auth shape: a flat string list chunked by 3 (downloader.rs:
    # 64-71); each CLI occurrence may carry the triple as one quoted string
    # or as separate tokens.
    flat_auth = tuple(
        tok for group in args.auth for item in group for tok in item.split())

    cfg = CrawlConfig(
        origin=args.url,
        output=args.output,
        jobs=args.jobs,
        depth=args.depth,
        ext_depth=args.ext_depth,
        tries=args.tries,
        delay=args.delay,
        random_range=args.random_range,
        user_agent=args.user_agent,
        cookie=args.cookie,
        include_visit=args.include_visit,
        exclude_visit=args.exclude_visit,
        include_download=args.include_download,
        exclude_download=args.exclude_download,
        visit_filter_is_download_filter=args.visit_filter_is_download_filter,
        auth=flat_auth,
        continue_on_error=args.continue_on_error,
        dry_run=args.dry_run,
        disable_certs_checks=args.disable_certs_checks,
        verbose=args.verbose,
        live_fetch=not (args.pages_parquet or args.warc_dir),
        host_budget=args.host_budget,
        respect_robots=args.respect_robots,
        checkpoint_dir=args.checkpoint_dir,
        max_supersteps=args.max_supersteps,
        max_wall_sec=args.max_wall_sec,
    )

    owns_spark = spark is None
    if owns_spark:
        from pyspark.sql import SparkSession
        spark = (
            SparkSession.builder.appName("suckit-spark-cli")
            .master(args.master)
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.ui.enabled", "false")
            .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        if args.shuffle_partitions:
            spark.conf.set("spark.sql.shuffle.partitions",
                           str(args.shuffle_partitions))
    elif args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(args.shuffle_partitions))

    try:
        if args.warc_dir:
            from .sources import warc as warc_src
            pages = warc_src.read_warc(spark, args.warc_dir)
        elif args.pages_parquet:
            pages = spark.read.parquet(args.pages_parquet)
        else:
            pages = spark.createDataFrame([], PAGES_SCHEMA)

        if args.resume and not args.checkpoint_dir:
            print("ERROR: --resume requires --checkpoint-dir",
                  file=sys.stderr)
            return 2

        # First Ctrl-C: graceful stop at the next superstep boundary (all
        # committed work persists — the reference's SIGINT-mid-crawl shape,
        # tests/benchmark.py). Second Ctrl-C: default hard interrupt.
        import signal
        import threading
        stop_event = threading.Event()
        prev_handler = None

        def _on_sigint(signum, frame):
            if stop_event.is_set():
                signal.signal(signal.SIGINT, prev_handler or signal.SIG_DFL)
                raise KeyboardInterrupt
            stop_event.set()
            print("interrupt: stopping at the next superstep boundary "
                  "(^C again to kill)", file=sys.stderr)

        try:
            prev_handler = signal.signal(signal.SIGINT, _on_sigint)
        except ValueError:
            prev_handler = None  # not the main thread (e.g. under a test)

        t0 = time.monotonic()
        try:
            result = crawl(spark, cfg, pages, resume=args.resume,
                           stop_event=stop_event)
        except CrawlAbort as exc:
            # reference: error! panics the process with a non-zero status
            print(f"ERROR: {exc}", file=sys.stderr)
            return 1
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGINT, prev_handler)
        visited = result.crawl_log.count()
        if not cfg.dry_run:
            # disk.rs:14-16 — no --output means the current directory.
            result.materialize_mirror(args.output or ".")
        wall = time.monotonic() - t0

        stats = {
            "urls_visited": visited,
            "supersteps": result.supersteps,
            "wall_sec": round(wall, 3),
            "dry_run": cfg.dry_run,
            "interrupted": stop_event.is_set(),
            "output": None if cfg.dry_run else (args.output or "."),
        }
        print(json.dumps({"crawl": stats}))
        if args.stats_json:
            with open(args.stats_json, "w") as f:
                f.write(json.dumps({"crawl": stats}) + "\n")
        result.close()
        return 0
    finally:
        if owns_spark:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
