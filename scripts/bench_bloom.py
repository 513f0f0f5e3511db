#!/usr/bin/env python3
"""Micro-bench: the per-superstep seen-set membership check at crawl steady
state — exact left-anti join vs the incrementally-maintained bloom prefilter
(operators/dedup.py BloomState). Writes BENCH/BLOOM.md.

Steady state per superstep: the filter already exists (geometry sized once);
the superstep pays (a) OR-ing its new-urls delta into the filter and (b) the
probe + residual anti-join on might-contain rows. That is what competes with
the plain anti-join — a from-scratch rebuild per superstep is NOT the design
and loses (measured; see BENCH/BLOOM.md history).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEN_N = int(os.environ.get("BLOOM_BENCH_SEEN", "20000000"))
CAND_N = int(os.environ.get("BLOOM_BENCH_CAND", "500000"))
NEW_FRAC = 0.2
REPS = 3


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from suckit_spark.operators import dedup as dedup_ops

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bloom-bench")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    url = F.format_string(
        "http://h%d.example/page/%d",
        F.pmod("id", F.lit(997)).cast("int"), F.col("id").cast("int"))
    seen = spark.range(SEEN_N).select(url.alias("url")) \
        .localCheckpoint(eager=True)
    n_new = int(CAND_N * NEW_FRAC)
    cand = (
        spark.range(SEEN_N - (CAND_N - n_new), SEEN_N + n_new)
        .select(url.alias("url"))
        .localCheckpoint(eager=True)
    )
    # The OR-in delta is the PREVIOUS superstep's new urls — disjoint from
    # this superstep's candidates (adding this superstep's new urls before
    # probing them would trivially flag them all seen).
    delta = spark.range(SEEN_N + n_new, SEEN_N + 2 * n_new) \
        .select(url.alias("url")).localCheckpoint(eager=True)

    def timed(fn):
        best = None
        for _ in range(REPS):
            t0 = time.monotonic()
            fn()
            best = (time.monotonic() - t0 if best is None
                    else min(best, time.monotonic() - t0))
        return round(best, 3)

    n_exact = cand.join(seen, "url", "left_anti").count()
    t_exact = timed(lambda: cand.join(seen, "url", "left_anti").count())
    # half-size seen set: shows the exact join's cost scaling with the seen
    # side (the bloom-exclusive path is O(candidates), independent of it)
    seen_half = spark.range(SEEN_N // 2).select(url.alias("url")) \
        .localCheckpoint(eager=True)
    t_exact_half = timed(lambda: cand.join(
        seen_half, "url", "left_anti").count())
    seen_half.unpersist()

    # One-time geometry + initial build (amortized over the whole crawl).
    state = dedup_ops.BloomState("url", capacity=SEEN_N * 4, fpp=0.01)
    t0 = time.monotonic()
    state.add(seen, SEEN_N)
    t_initial_build = round(time.monotonic() - t0, 3)

    def steady_backstop():
        # (a) fold the previous superstep's delta into the filter
        state.count -= n_new           # keep capacity fixed across reps
        state.add(delta, n_new)
        # (b) probe + exact residual anti-join (parity mode)
        dedup_ops.anti_join_seen(cand, seen, "url",
                                 bloom_state=state).count()

    def steady_exclusive():
        state.count -= n_new
        state.add(delta, n_new)
        # probe only — the approximate seen-set mode, no O(seen) shuffle
        dedup_ops.probe_unseen(cand, state).count()

    n_bloom = dedup_ops.anti_join_seen(cand, seen, "url",
                                       bloom_state=state).count()
    n_excl = dedup_ops.probe_unseen(cand, state).count()
    t_backstop = timed(steady_backstop)
    t_exclusive = timed(steady_exclusive)
    assert n_exact == n_bloom == n_new, (n_exact, n_bloom, n_new)
    # exclusive mode may only lose false positives — a small fraction
    assert n_new >= n_excl > n_new * 0.9, (n_excl, n_new)

    out = {
        "seen_rows": SEEN_N, "cand_rows": CAND_N, "new_rows": n_new,
        "t_exact_anti_join_sec": t_exact,
        "t_exact_anti_join_half_seen_sec": t_exact_half,
        "t_bloom_backstop_sec": t_backstop,
        "t_bloom_exclusive_sec": t_exclusive,
        "t_bloom_initial_build_sec": t_initial_build,
        "exclusive_false_positive_drops": n_new - n_excl,
        "bloom_bits_per_range": state.m, "bloom_hashes": state.k,
        "num_ranges": state.num_ranges,
        "speedup_exclusive": round(t_exact / t_exclusive, 2),
    }
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BLOOM.md", "w") as f:
        f.write(f"""# BENCH/BLOOM — seen-set membership at crawl steady state

Seen set {SEEN_N:,} urls; per superstep {CAND_N:,} candidates
({int(NEW_FRAC * 100)}% genuinely new) and a {n_new:,}-url seen delta.
local[8], best of {REPS} runs. The filter build runs fully on executors
(positions -> bit_or word aggregation with map-side combine -> per-range
Arrow pack); incremental maintenance collects only the delta's set words
(O(delta), sparse) — the driver never materializes raw positions.

| per-superstep path | sec |
|---|---|
| exact left-anti join, {SEEN_N // 2:,}-url seen set | {t_exact_half} |
| exact left-anti join, {SEEN_N:,}-url seen set | {t_exact} |
| bloom + exact residual anti-join (parity mode) | {t_backstop} |
| bloom EXCLUSIVE (approximate seen-set: delta OR-in + probe) | {t_exclusive} |

Exclusive-mode speedup **{out['speedup_exclusive']}x** and — the point —
its cost is O(candidates), independent of seen-set size, while both exact
paths shuffle the full seen side every superstep (the anti-join must
exchange the big side regardless of how few candidates survive the
prefilter; that is why the backstop row can never beat the plain join by
much on one box). False-positive drops this run:
{out['exclusive_false_positive_drops']} of {n_new:,} new urls (fpp 0.01).
Filter geometry: {state.m:,} bits x {state.num_ranges} range(s),
k={state.k}; one-time initial build {t_initial_build} s.

Engage with ``CrawlConfig(bloom_exclusive=True)`` (default stays the exact
reference-parity join).

Reproduce: `python scripts/bench_bloom.py`.
""")
    spark.stop()


if __name__ == "__main__":
    main()
