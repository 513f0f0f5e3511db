#!/usr/bin/env python3
"""Speed-regression gate — the reference's own perf protocol, on the engine.

The reference ships ``tests/speed_regression.py``: crawl a local webserver at
1/2/4 threads, ``TEST_RETRIES`` times each, average, compare against the LAST
row recorded in ``speed.csv`` (``readlines()[-1]``, reference
tests/speed_regression.py:60 — NOT the best-ever line; a best-ever gate on a
noisy shared box eventually fails permanently once one lucky fast row
lands), print the per-configuration slowdown, and append the new row. This
is the same harness for the Spark engine: a live crawl of the in-process
loopback site (sources/loopback.py — real sockets, no external network) at
``jobs`` = 1/2/4 fetch partitions, averaged over retries, appended to
``BENCH/speed.csv``, with the regression verdict against the previous row.

Usage::

    python scripts/speed_regression.py [--retries 3] [--pages 800]
                                       [--filename BENCH/speed.csv]

Exit code 1 when any configuration regresses more than ``--tolerance``
(default 10%) against the previous recorded row — usable as a CI gate.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JOB_LEVELS = [1, 2, 4]
TEST_NAMES = ["Single worker", "Two workers", "Four workers"]


def load_best_result(filename: str) -> list[float]:
    """The LAST prior row — the reference's exact protocol
    (tests/speed_regression.py:60 reads ``readlines()[-1]``): each run gates
    against its predecessor, so one unusually fast run on a quiet box raises
    the bar for exactly one successor instead of forever."""
    try:
        with open(filename) as f:
            rows = [[float(x) for x in row] for row in csv.reader(f) if row]
    except OSError:
        rows = []
    if not rows:
        return [float("inf")] * len(JOB_LEVELS)
    return rows[-1][:len(JOB_LEVELS)]


def write_new_result(filename: str, result: list[float]) -> None:
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    with open(filename, "a", newline="") as f:
        csv.writer(f).writerow([f"{x:.3f}" for x in result])


def compute_new_result(spark, n_pages: int, retries: int) -> list[float]:
    from suckit_spark.config import CrawlConfig
    from suckit_spark.plans.crawl import crawl
    from suckit_spark.schemas import PAGES_SCHEMA
    from suckit_spark.sources.loopback import LoopbackSite

    empty = spark.createDataFrame([], PAGES_SCHEMA)
    res = []
    with LoopbackSite(n_pages=n_pages, fanout=8) as base:
        for jobs in JOB_LEVELS:
            cfg = CrawlConfig(origin=f"{base}/p0.html", live_fetch=True,
                              jobs=jobs, continue_on_error=True)
            total = 0.0
            for i in range(retries):
                t0 = time.monotonic()
                result = crawl(spark, cfg, empty)
                n = result.crawl_log.count()
                total += time.monotonic() - t0
                result.close()
                print(f"  jobs={jobs} try {i + 1}/{retries}: "
                      f"{n} urls in {time.monotonic() - t0:.2f}s",
                      flush=True)
            res.append(total / retries)
    return res


def main() -> int:
    ap = argparse.ArgumentParser(description="suckit_spark speed regression")
    ap.add_argument("-f", "--filename",
                    default=os.path.join(REPO, "BENCH", "speed.csv"))
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--pages", type=int, default=800)
    ap.add_argument("--tolerance", type=float, default=10.0,
                    help="max allowed %% slowdown vs previous row")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("suckit-speed-regression")
             .master(f"local[{min(os.cpu_count() or 4, 8)}]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    old = load_best_result(args.filename)
    new = compute_new_result(spark, args.pages, args.retries)
    spark.stop()

    failed = False
    for name, prev, cur in zip(TEST_NAMES, old, new):
        if prev == float("inf"):
            print(f"{name}: {cur:.3f}s (first recorded run)")
            continue
        speed_up = cur * 100.0 / prev - 100.0
        verdict = "slower" if speed_up > 0 else "faster"
        print(f"{name}: {cur:.3f}s vs last {prev:.3f}s "
              f"({abs(speed_up):.1f}% {verdict})")
        if speed_up > args.tolerance:
            failed = True
    write_new_result(args.filename, new)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
