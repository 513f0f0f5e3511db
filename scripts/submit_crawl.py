#!/usr/bin/env python3
"""spark-submit entry point for the BSP crawl (north_rule execution path).

Run the crawl as a cluster job::

    spark-submit --master <master> \
        --py-files suckit_spark.zip \
        scripts/submit_crawl.py \
        --hosts 40 --pages-per-host 400 --mega-factor 8 \
        --stats-file /tmp/crawl_stats.json

The session comes from spark-submit (master/executors/conf are cluster
flags, not code); the job only sets SQL-level knobs. Input is either the
deterministic synthetic corpus (``--hosts/--pages-per-host``) or any
parquet directory with the PAGES_SCHEMA columns (``--pages-parquet``).
Outputs a single JSON stats line to ``--stats-file`` (and stdout) so a
wrapper can parse throughput without scraping Spark logs.

This file is also the template for a real cluster run: on YARN/k8s the
same invocation works with ``--master yarn``/``k8s://...`` and N vs 4N
executors via ``--num-executors`` — the sandbox realization swaps those
for ``local[8]`` vs ``local[32]`` (BASELINE.md driver mandate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=40)
    ap.add_argument("--pages-per-host", type=int, default=400)
    ap.add_argument("--fanout", type=int, default=3)
    ap.add_argument("--mega-factor", type=int, default=8)
    ap.add_argument("--body-kb", type=int, default=0,
                    help="pad synthetic pages to ~N KiB (compute-"
                         "representative corpus)")
    ap.add_argument("--buckets", type=int, default=64,
                    help="bucket count for the generated pages table")
    ap.add_argument("--pages-parquet", default=None,
                    help="read the pages corpus from parquet instead of "
                         "generating it")
    ap.add_argument("--warc-dir", default=None,
                    help="ingest the pages corpus from WARC archives "
                         "(.warc/.warc.gz files) in this directory")
    ap.add_argument("--origin", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the last committed superstep in "
                         "--checkpoint-dir")
    ap.add_argument("--max-supersteps", type=int, default=None,
                    help="stop after N supersteps (partial, resumable run)")
    ap.add_argument("--mirror-out", default=None,
                    help="write the mirror table to this parquet dir")
    ap.add_argument("--stats-file", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("suckit-spark-crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The generated pages table is bucketed+sorted with one file per
        # bucket; this lets the fetch-join SMJ consume the on-disk order
        # directly (no per-superstep re-sort of the corpus).
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        # Bound the Arrow batch so python workers stream ~100 MB peaks
        # instead of materializing a whole partition of 64 KiB pages.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
        # Push small-frontier IN lists as real eq-chains (not a min/max
        # range, useless for scattered urls) so sorted buckets can prune at
        # page level too.
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "5000")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(os.environ.get("SUCKIT_LOG_LEVEL", "ERROR"))
    cores = spark.sparkContext.defaultParallelism
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(args.shuffle_partitions))
    else:
        spark.conf.set("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))

    from suckit_spark.config import CrawlConfig
    from suckit_spark.plans.crawl import crawl
    from suckit_spark.sources import corpus

    if args.warc_dir:
        # Ingest WARC archives (Common Crawl layout) as the pages corpus —
        # one task per archive file (sources/warc.py).
        from suckit_spark.sources import warc as warc_src
        pages = warc_src.read_warc(spark, args.warc_dir)
        origin = args.origin
        if origin is None:
            raise SystemExit("--origin is required with --warc-dir")
    elif args.pages_parquet:
        pages = spark.read.parquet(args.pages_parquet)
        origin = args.origin
        if origin is None:
            raise SystemExit("--origin is required with --pages-parquet")
    else:
        import tempfile

        gen = corpus.gen_corpus_df(
            spark, args.hosts, args.pages_per_host, fanout=args.fanout,
            mega_host_factor=args.mega_factor, partitions=cores * 2,
            body_kb=args.body_kb,
        )
        # Fetch-side layout is owned by sources/corpus.prepare_pages_table
        # (url-bucketed+sorted; per-superstep join exchanges only the
        # frontier).
        bucket_dir = os.path.join(
            tempfile.mkdtemp(prefix="suckit_corpus_"), "pages_bucketed")
        pages = corpus.prepare_pages_table(
            spark, gen, bucket_dir, n_buckets=args.buckets)
        origin = args.origin or corpus.page_url(0, 0, args.hosts)
    n_pages = pages.count()  # materialize before timing

    # Bloom threshold: the broadcast-bloom prefilter earns its keep when the
    # seen table is too big to anti-join cheaply (the 10^10 design point);
    # below ~10^6 rows the exact join is faster than building + broadcasting
    # the filter every superstep, so the bench-scale crawl runs exact.
    cfg = CrawlConfig(
        origin=origin, ext_depth=-1, continue_on_error=True,
        bloom_threshold=1_000_000,
        checkpoint_dir=args.checkpoint_dir,
        max_supersteps=args.max_supersteps,
    )
    if args.resume and not args.checkpoint_dir:
        raise SystemExit("--resume requires --checkpoint-dir")
    t0 = time.monotonic()
    result = crawl(spark, cfg, pages, resume=args.resume)
    visited = result.crawl_log.count()
    wall = time.monotonic() - t0
    if args.mirror_out:
        result.mirror.write.mode("overwrite").parquet(args.mirror_out)

    stats = {
        "corpus_pages": n_pages,
        "urls_visited": visited,
        "supersteps": result.supersteps,
        "superstep_wall_sec": [round(w, 3) for w in result.wall_times],
        "phase_times": result.phase_times,
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(visited / wall, 1),
        "cores": cores,
        "master": spark.sparkContext.master,
    }
    line = json.dumps({"crawl": stats})
    print(line)
    sys.stdout.flush()
    if args.stats_file:
        with open(args.stats_file, "w") as f:
            f.write(line + "\n")
    spark.stop()
    # Clean up the run's scratch (generated corpus table + mirror spill) —
    # everything the caller needs is in the stats/mirror-out.
    import shutil
    if result.spill_dir and not args.checkpoint_dir:
        shutil.rmtree(result.spill_dir, ignore_errors=True)
    if not args.pages_parquet and not args.warc_dir:
        shutil.rmtree(os.path.dirname(bucket_dir), ignore_errors=True)


if __name__ == "__main__":
    main()
