#!/usr/bin/env python3
"""Hardware-ceiling probe for the scaling benchmark (BENCH/BASELINE.md).

Runs the page pipeline's scalar core (``process_page``: charset detect,
single-pass HTML scan, link resolve/rewrite, re-encode) in N independent OS
processes with no Spark involved, and reports aggregate pages/sec at each N.
This bounds what any executor framework can achieve on this box and separates
"the dataflow doesn't scale" from "the box is contended": if pure processes
scale ~linearly but the Spark job doesn't, the gap is scheduling/IO/worker
overhead, not the operator.

Usage: python scripts/parse_scaling_probe.py [body_kb] [seconds_per_level]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BODY_KB = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 12.0


def work(args):
    from suckit_spark.config import CrawlConfig
    from suckit_spark.operators.page_pipeline import process_page
    from suckit_spark.sources import corpus

    cfg = CrawlConfig(origin="http://h0.example/p0.html",
                      ext_depth=-1, continue_on_error=True)
    _n, seed = args
    rows = [corpus.page_row(0, j + seed, 64, 2400, 8, 42, BODY_KB)
            for j in range(40)]
    t0 = time.perf_counter()
    done = 0
    while time.perf_counter() - t0 < SECONDS:
        r = rows[done % 40]
        process_page(cfg, r["url"], r["html"], r["content_type"])
        done += 1
    return done / (time.perf_counter() - t0)


def main() -> None:
    results = {}
    for nproc in (1, 4, 8, 16, 32):
        with mp.Pool(nproc) as pool:
            rates = pool.map(work, [(i, i * 40) for i in range(nproc)])
        results[nproc] = sum(rates)
        print(f"{nproc:2d} procs: {results[nproc]:8.1f} pages/s "
              f"({results[nproc] / nproc:6.1f} per proc)", flush=True)
    if 4 in results and 16 in results:
        print(f"4->16 scaling efficiency: "
              f"{results[16] / results[4] / 4:.3f}")
    if 8 in results and 32 in results:
        print(f"8->32 scaling efficiency: "
              f"{results[32] / results[8] / 4:.3f}")


if __name__ == "__main__":
    main()
