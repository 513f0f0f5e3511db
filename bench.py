#!/usr/bin/env python3
"""Benchmark harness.

Default mode (driver contract): runs the headline queries + a full BSP crawl
(``$SPARK_GRAFT_CRAWL_TRIALS`` back-to-back trials, default 3 — the headline
crawl numbers are the MEDIAN trial, each trial's load_avg recorded; single
numbers on a co-tenanted box are ±20% noise) at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "crawl": {...}}

Scaling mode (``--scaling``, north_rule evidence): submits the identical
crawl job via spark-submit at local[N] and local[4N] (default 2 vs 8 task
slots — sized so even the 4N level keeps the shared box unstarved; see
BENCH/BASELINE.md "Level sizing") on the same input and writes throughput
at both levels plus the scaling efficiency to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CRAWL_HOSTS = int(os.environ.get("SPARK_GRAFT_CRAWL_HOSTS", "40"))
CRAWL_PAGES_PER_HOST = int(os.environ.get("SPARK_GRAFT_CRAWL_PAGES", "400"))
MEGA_FACTOR = int(os.environ.get("SPARK_GRAFT_MEGA_FACTOR", "8"))
CRAWL_BODY_KB = int(os.environ.get("SPARK_GRAFT_CRAWL_BODY_KB", "0"))

#: Fetch-side corpus layout for the bench crawl: "bucketed" (default) =
#: url-bucketed on-disk parquet table (the 10^10-design-point layout: corpus
#: never exchanged, scan serves the SMJ order directly); "cached" =
#: in-memory url-hash-partitioned persist (crawl()'s own re-layout path).
#: Measured A/B on this box, 3 alternating crawl-only trials each at the
#: bench shape (BENCH/FETCH_LAYOUT.md): bucketed 817 median URLs/s vs
#: cached 758 — the on-disk bucket scan WINS even at a ~30 MB corpus (the
#: OS page cache serves the re-reads; the cached path pays block-manager
#: pressure against the superstep checkpoints), and it is the only layout
#: that exists at 10^10, so there is nothing to adapt on corpus size.
#: The knob stays for reproducing the A/B.
FETCH_LAYOUT = os.environ.get("SPARK_GRAFT_FETCH_LAYOUT", "bucketed")

#: headline query subset (full set runs in the driver's correctness gate)
HEADLINE = [
    "superstep_metrics_agg", "dedup_anti_join", "first_wins_window",
    "exact_dedup", "ngram_jaccard_pairs", "minhash_lsh_pairs",
    "simhash_near_pairs", "cosine_topk", "ann_bucketed_topk",
    "quality_score", "token_counts", "bfs_frontier_levels",
    # round-3 curation/analytics additions
    "pagerank_fixed_point", "repeated_spans", "benchmark_overlap",
    # round-4: PII scrub (narrow/scan-bound) + paragraph-style chunk dedup
    "pii_redact", "chunk_dedup",
    # round-5: newline-paragraph chunk dedup (CCNet parity) + GPT-3-setting
    # (n=13) decontamination — the sparse-hit regime real runs use
    "chunk_dedup_paragraphs", "benchmark_overlap_13",
    # round-5: CCNet-shape LM perplexity quality signal (unigram + the
    # conditional-bigram KenLM-direction variant)
    "lm_perplexity", "lm_perplexity_bigram",
]


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("suckit-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bucketed pages table: consume the on-disk per-bucket sort directly
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _median_trial(trials: list[dict], key: str) -> dict:
    """The trial holding the median ``key`` (lower-median for even counts) —
    the headline is always a real recorded run, never an interpolation."""
    ordered = sorted(trials, key=lambda t: t[key])
    return ordered[(len(ordered) - 1) // 2]


def run_crawl(spark, cpus: int, trials: int | None = None) -> dict:
    """The north-metric job: full BSP crawl of the deterministic synthetic
    corpus (seeded link graph with a mega-host skew component).

    Runs ``trials`` back-to-back crawls over the SAME prepared corpus and
    reports the MEDIAN trial as the headline, with every trial's wall /
    throughput / load_avg recorded alongside. Single numbers on this shared
    box are ±20% co-tenancy noise (BENCH/FETCH_LAYOUT.md measured 666-996
    URLs/s for identical code by ambient load); a median over >=3 trials
    with per-trial load context is the smallest honest record. Protocol
    precedent: the reference's speed gate averages TEST_RETRIES runs
    (reference tests/speed_regression.py)."""
    from suckit_spark.config import CrawlConfig
    from suckit_spark.plans.crawl import crawl
    from suckit_spark.sources import corpus

    import shutil
    import tempfile

    if trials is None:
        trials = int(os.environ.get("SPARK_GRAFT_CRAWL_TRIALS", "3"))

    gen = corpus.gen_corpus_df(
        spark, CRAWL_HOSTS, CRAWL_PAGES_PER_HOST, fanout=3,
        mega_host_factor=MEGA_FACTOR, partitions=cpus * 2,
        body_kb=CRAWL_BODY_KB,
    )
    # Fetch-side layout (see FETCH_LAYOUT above).
    layout = FETCH_LAYOUT
    bucket_dir = None
    if layout == "bucketed":
        # url-bucketed+sorted table (built before timing, like any corpus
        # prep) — the crawl's per-superstep join then exchanges only the
        # frontier and the scan serves the on-disk order.
        bucket_dir = tempfile.mkdtemp(prefix="suckit_bench_corpus_")
        pages = corpus.prepare_pages_table(
            spark, gen, os.path.join(bucket_dir, "pages"), n_buckets=64,
            table_name="bench_pages_bucketed")
    else:
        # cached: hand crawl() the raw DataFrame; it re-lays-out once into
        # an in-memory url-hash-partitioned persist. Materialize the render
        # before timing (same pre-timing prep the bucketed path gets).
        from pyspark import StorageLevel
        pages = gen.persist(StorageLevel.MEMORY_AND_DISK)
    n_pages = pages.count()  # materialize corpus before timing the crawl

    cfg = CrawlConfig(
        origin=corpus.page_url(0, 0, CRAWL_HOSTS),
        ext_depth=-1, continue_on_error=True,
        bloom_threshold=50_000,
    )
    trial_stats: list[dict] = []
    for _ in range(max(1, trials)):
        t0 = time.monotonic()
        result = crawl(spark, cfg, pages)
        visited = result.crawl_log.count()
        wall = time.monotonic() - t0
        result.close()  # drop the temp mirror spill dir per trial
        trial_stats.append({
            "urls_visited": visited,
            "supersteps": result.supersteps,
            "superstep_wall_sec": [round(w, 3) for w in result.wall_times],
            "wall_sec": round(wall, 3),
            "urls_per_sec": round(visited / wall, 1),
            "load_avg_1m": round(os.getloadavg()[0], 2),
        })
    if bucket_dir is not None:
        spark.sql("DROP TABLE IF EXISTS bench_pages_bucketed")
        shutil.rmtree(bucket_dir, ignore_errors=True)
    else:
        pages.unpersist()
    med = _median_trial(trial_stats, "urls_per_sec")
    return {
        "corpus_pages": n_pages,
        "urls_visited": med["urls_visited"],
        "supersteps": med["supersteps"],
        "superstep_wall_sec": med["superstep_wall_sec"],
        "wall_sec": med["wall_sec"],
        "urls_per_sec": med["urls_per_sec"],   # MEDIAN over trials
        "cpus": cpus,
        "fetch_layout": layout,
        "n_trials": len(trial_stats),
        "trials": [{k: t[k] for k in
                    ("wall_sec", "urls_per_sec", "load_avg_1m")}
                   for t in trial_stats],
    }


def run_live_crawl(spark) -> dict:
    """Live-fetch bench point (reference tests/benchmark.py:21-77 protocol:
    crawl a real site for a fixed wall time, count pages downloaded). The
    sandbox realization crawls an in-process loopback ``ThreadingHTTPServer``
    (sources/loopback.py) over real sockets with ``jobs`` parallel fetch
    partitions and a ``max_wall_sec`` budget; no external network."""
    from suckit_spark.config import CrawlConfig
    from suckit_spark.plans.crawl import crawl
    from suckit_spark.schemas import PAGES_SCHEMA
    from suckit_spark.sources.loopback import LoopbackSite

    n_pages = int(os.environ.get("SPARK_GRAFT_LIVE_PAGES", "4000"))
    run_time = float(os.environ.get("SPARK_GRAFT_LIVE_RUN_TIME", "20"))
    jobs = int(os.environ.get("SPARK_GRAFT_LIVE_JOBS", "8"))
    trials = int(os.environ.get("SPARK_GRAFT_LIVE_TRIALS", "3"))

    trial_stats: list[dict] = []
    with LoopbackSite(n_pages=n_pages, fanout=8) as base:
        cfg = CrawlConfig(
            origin=f"{base}/p0.html", live_fetch=True, jobs=jobs,
            continue_on_error=True, max_wall_sec=run_time)
        for _ in range(max(1, trials)):
            t0 = time.monotonic()
            result = crawl(spark, cfg,
                           spark.createDataFrame([], PAGES_SCHEMA))
            pages_downloaded = result.mirror.count()
            wall = time.monotonic() - t0
            trial_stats.append({
                "wall_sec": round(wall, 3),
                "pages_downloaded": pages_downloaded,
                "pages_per_sec": round(pages_downloaded / wall, 1),
                "supersteps": result.supersteps,
                "load_avg_1m": round(os.getloadavg()[0], 2),
            })
            result.close()
    med = _median_trial(trial_stats, "pages_per_sec")
    return {
        "site_pages": n_pages,
        "jobs": jobs,
        "run_time_budget_sec": run_time,
        "wall_sec": med["wall_sec"],
        "pages_downloaded": med["pages_downloaded"],
        "pages_per_sec": med["pages_per_sec"],   # MEDIAN over trials
        "supersteps": med["supersteps"],
        "n_trials": len(trial_stats),
        "trials": [{k: t[k] for k in
                    ("wall_sec", "pages_per_sec", "load_avg_1m")}
                   for t in trial_stats],
    }


def warm_session(spark) -> None:
    """One untimed pass over the cold paths (codegen, parquet reader, Arrow
    python workers) so the first timed query measures its plan, not JVM
    start-up."""
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    spark.range(100_000).selectExpr("sum(id)").toPandas()


def run_queries(spark) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        n = df.count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main_bench():
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warm_session(spark)
    # queries first: the crawl's retained superstep checkpoints would
    # otherwise pressure the query timings
    t_window = time.monotonic()
    query_secs = run_queries(spark)
    crawl_stats = run_crawl(spark, CPUS)
    wall_window = time.monotonic() - t_window
    # value = sum of per-query seconds + ONE (median) corpus crawl wall.
    # DEFINITION CHANGE vs r1-r3 (recorded here and in BENCH/BASELINE.md
    # "Headline definitions"): the old window was a single t0..t1 around
    # run_queries+run_crawl, which also counted corpus generation, the
    # bucket-table write, and inter-job overhead. With >=3 crawl trials that
    # window would triple-count corpus crawls, so r4+ sums the components
    # instead; ``wall_window_sec`` below preserves the old-style full window
    # (now spanning ALL crawl trials + prep) for cross-round comparison.
    total = sum(query_secs.values()) + crawl_stats["wall_sec"]
    live_stats = None
    if os.environ.get("SPARK_GRAFT_LIVE_BENCH", "1") != "0":
        live_stats = run_live_crawl(spark)
    print(json.dumps({
        "metric": "crawl_urls_per_sec",
        "value": round(total, 3),
        "unit": "sec",
        "value_definition": ("sum(headline query secs) + median-trial crawl "
                            "wall; r1-r3 'value' was one wall window around "
                            "queries+single crawl incl. corpus prep — see "
                            "wall_window_sec"),
        "wall_window_sec": round(wall_window, 3),
        "queries": query_secs,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "crawl": crawl_stats,
        "live_crawl": live_stats,
        "urls_per_sec": crawl_stats["urls_per_sec"],
        # co-tenancy context for the shared box: same-code trials span
        # 666-996 urls/s depending on ambient load (BENCH/FETCH_LAYOUT.md);
        # 1/5/15-min load averages at exit let a reader normalize.
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


def _build_pyfiles_zip(dest: str) -> str:
    """Package suckit_spark as the --py-files artifact (what a real cluster
    submit ships to executors)."""
    import zipfile

    root = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(dest, "suckit_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(root, "suckit_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return zpath


def _phase_table(lo_stats: dict, hi_stats: dict, lo: int, hi: int) -> str:
    """Markdown table: per-phase totals at both levels + speedup, from the
    crawl's phase_times instrumentation."""
    lo_ph = lo_stats.get("phase_times") or []
    hi_ph = hi_stats.get("phase_times") or []
    if not lo_ph or not hi_ph:
        return "(phase_times missing from one of the runs)"
    keys = [k for k in lo_ph[0] if k != "superstep"]
    lines = [f"| phase | N={lo} total (s) | 4N={hi} total (s) | speedup |",
             "|---|---|---|---|"]
    for k in keys:
        a = sum(p.get(k, 0.0) for p in lo_ph)
        b = sum(p.get(k, 0.0) for p in hi_ph)
        sp = a / b if b > 0 else float("inf")
        lines.append(f"| {k} | {a:.1f} | {b:.1f} | {sp:.2f}x |")
    # the two heaviest supersteps, phase by phase — where non-scaling hides
    heavy = sorted(range(len(lo_ph)),
                   key=lambda i: -sum(v for kk, v in lo_ph[i].items()
                                      if kk != "superstep"))[:2]
    lines.append("")
    lines.append(f"Heaviest supersteps at N={lo}, phase by phase "
                 f"(N={lo} -> 4N={hi} seconds):")
    for i in sorted(heavy):
        if i >= len(hi_ph):
            continue
        parts = ", ".join(
            f"{k}: {lo_ph[i][k]:.1f}->{hi_ph[i][k]:.1f}" for k in keys)
        lines.append(f"- superstep {lo_ph[i]['superstep']}: {parts}")
    return "\n".join(lines)


def _submit_crawl_level(cpus: int, zpath: str, tmp: str, *, s_hosts: int,
                        s_pages: int, s_fanout: int, s_mega: int,
                        s_body_kb: int) -> dict:
    """One ``spark-submit --master local[cpus]`` crawl of the scaling corpus;
    returns the child's crawl stats dict (wall, urls/s, phase_times)."""
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    spark_submit = os.path.join(
        os.path.dirname(__import__("pyspark").__file__), "bin",
        "spark-submit")
    stats_file = os.path.join(tmp, f"stats_{cpus}_{s_pages}.json")
    cmd = [
        spark_submit,
        "--master", f"local[{cpus}]",
        "--driver-memory", "48g",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(root, "scripts", "submit_crawl.py"),
        "--hosts", str(s_hosts),
        "--pages-per-host", str(s_pages),
        "--fanout", str(s_fanout),
        "--mega-factor", str(s_mega),
        "--body-kb", str(s_body_kb),
        "--stats-file", stats_file,
    ]
    env = dict(os.environ)
    env.pop("PYSPARK_DRIVER_PYTHON", None)
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(cmd, env=env, capture_output=True,
                          text=True, timeout=7200)
    if proc.returncode != 0:
        # Surface the child's stderr — a bare CalledProcessError
        # shows only the command line.
        sys.stderr.write(proc.stderr[-8000:] + "\n")
        raise SystemExit(
            f"spark-submit at local[{cpus}] failed "
            f"(exit {proc.returncode}); stderr above")
    with open(stats_file) as f:
        return json.loads(f.read())["crawl"]


def _refuse_dirty_box():
    """Another live Spark JVM on this machine skews the levels unequally —
    refuse to measure scaling on a dirty box."""
    import subprocess

    probe = subprocess.run(["pgrep", "-f", "SparkSubmit|pyspark.daemon"],
                           capture_output=True, text=True)
    if probe.stdout.strip():
        raise SystemExit(
            "refusing to run --scaling: live Spark processes found "
            f"(pids {probe.stdout.split()}); stop them first")


def main_scaling():
    """Run the identical crawl job via real ``spark-submit --py-files`` at
    N, 2N and 4N cores (default 2/4/8 — the sandbox realization of the
    N vs 4N executor criterion plus a midpoint so the efficiency curve has
    shape); write BENCH/BASELINE.md with throughput + scaling efficiency."""
    import tempfile

    _refuse_dirty_box()

    # The scaling corpus is bigger and compute-representative (64 KiB pages,
    # flat high-fanout graph): per-superstep parse work has to dominate the
    # fixed BSP barrier cost or no core count can show 3.2x — the same reason
    # a real cluster benches scaling on real page weights, not stubs.
    s_hosts = int(os.environ.get("SPARK_GRAFT_SCALE_HOSTS", "64"))
    s_pages = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "2400"))
    s_fanout = int(os.environ.get("SPARK_GRAFT_SCALE_FANOUT", "8"))
    s_mega = int(os.environ.get("SPARK_GRAFT_SCALE_MEGA", "4"))
    s_body_kb = int(os.environ.get("SPARK_GRAFT_SCALE_BODY_KB", "64"))

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        zpath = _build_pyfiles_zip(tmp)
        # Level sizing: a local[n] task slot drives ~2 OS threads (the JVM
        # task thread plus its Arrow python worker), plus JVM scan/write/GC
        # threads, and the driver needs headroom. N=2 vs 4N=8 keeps even the
        # big level's ~20 threads comfortably inside the 32-CPU box, so the
        # measurement reflects the dataflow, not slot-vs-CPU co-tenancy —
        # the same reason a real cluster sizes executors to node cores.
        # Measured on this box: 2v8 eff 0.858; 4v16 eff 0.48-0.64 across
        # runs (16 slots ≈ 32+ threads saturate the box and steal the JVM's
        # scan/compression parallelism). Pinning (taskset) was tried and
        # rejected: starving the forked python workers and driver inside
        # the pinned set produced wild per-superstep variance.
        n_small = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
        # Three points (N, 2N, 4N) give the efficiency CURVE a shape: a
        # single 2-point ratio can hide a knee (great to 2N, flat after).
        # The pass/fail criterion is still read on N vs 4N.
        levels = [int(x) for x in os.environ.get(
            "SPARK_GRAFT_SCALE_LEVELS",
            f"{n_small},{n_small * 2},{n_small * 4}").split(",")]
        # lo/hi and every "eff vs N" ratio read levels[0]/levels[-1]: an
        # unsorted or duplicated env override would silently compute wrong
        # efficiencies, so normalize (sorted) and reject duplicates.
        if len(set(levels)) != len(levels):
            raise SystemExit(
                f"SPARK_GRAFT_SCALE_LEVELS has duplicates: {levels}")
        levels = sorted(levels)
        for cpus in levels:
            results[cpus] = _submit_crawl_level(
                cpus, zpath, tmp, s_hosts=s_hosts, s_pages=s_pages,
                s_fanout=s_fanout, s_mega=s_mega, s_body_kb=s_body_kb)

    lo, hi = levels[0], levels[-1]
    t8, t32 = results[lo]["wall_sec"], results[hi]["wall_sec"]
    u8, u32 = results[lo]["urls_per_sec"], results[hi]["urls_per_sec"]
    eff = (t8 / t32) / (hi / lo)
    level_rows = "\n".join(
        f"| {'N' if c == lo else f'{c // lo}N'} | {c} "
        f"| {results[c]['wall_sec']} | {results[c]['urls_per_sec']} "
        f"| {results[c]['supersteps']} "
        f"| {(t8 / results[c]['wall_sec']) / (c / lo):.3f} |"
        for c in levels)
    os.makedirs("BENCH", exist_ok=True)
    # The fresh run replaces only the headline sections; the repeatability
    # history ("## Repeatability ..." onward — the multi-trial medians the
    # criterion is read on) is carried over verbatim.
    history = ""
    try:
        with open("BENCH/BASELINE.md") as f:
            prev = f.read()
        i = prev.find("## Repeatability")
        if i >= 0:
            history = "\n" + prev[i:]
    except OSError:
        pass
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — crawl throughput & scaling evidence

Same job, same deterministic input ({results[lo]['corpus_pages']} pages,
{s_hosts} hosts, ~{s_body_kb} KiB/page, fanout {s_fanout}, mega-host factor
{s_mega}), {len(levels)} parallelism levels
(sandbox realization of the N vs 4N executor criterion, BASELINE.md, plus
a 2N midpoint so the efficiency curve has shape), each
run as a separate `spark-submit --master local[n] --py-files
suckit_spark.zip scripts/submit_crawl.py` job — the same invocation shape a
real cluster uses with `--master yarn --num-executors {{N,...,4N}}`:

| level | cores | wall (s) | URLs/sec | supersteps | eff vs N |
|---|---|---|---|---|---|
{level_rows}

Scaling efficiency `eff = (T_N / T_4N) / {hi // lo}` = **{eff:.3f}** (target >= 0.8
means wall-time improves 3.2x+ from 4x cores; values below reflect
fixed-cost superstep barriers at this corpus size — see BENCH notes).

Throughput ratio u_4N / u_N = {u32 / max(u8, 1e-9):.2f}x.

Per-superstep wall times (s):
{chr(10).join(f"- local[{c}]: {results[c]['superstep_wall_sec']}"
              for c in levels)}

## Per-phase scaling (which stage does / does not scale)

Phase legend: `fetch_parse_mirror` = fetch join + Arrow page pipeline +
mirror parquet write (the compute bulk); `cand_dedup` = candidate explode +
first-wins window + seen anti-join; `small_deltas` = log/metrics
checkpoint; `rest` = counts + commit barrier.

{_phase_table(results[lo], results[hi], lo, hi)}

Reproduce: `python bench.py --scaling` (packages suckit_spark.zip and runs
both spark-submit jobs).
""")
        f.write(history)
    print(json.dumps({"eff": eff, "n_small": lo,
                      "n8": results[lo], "n32": results[hi]}))


def _phase_shares(stats: dict) -> dict:
    """Total seconds per phase over the whole crawl, plus each phase's share
    of the summed phase time."""
    totals: dict[str, float] = {}
    for p in stats.get("phase_times") or []:
        for k, v in p.items():
            if k != "superstep":
                totals[k] = totals.get(k, 0.0) + v
    s = sum(totals.values()) or 1.0
    return {k: {"total_sec": round(v, 1), "share": round(v / s, 4)}
            for k, v in totals.items()}


def main_barrier_share():
    """Measure how the cand_dedup barrier share moves from the 1x scaling
    corpus to a 10x-page corpus at the SAME parallelism (local[4N]).

    cand_dedup (candidate explode + first-wins agg + seen anti-join) has a
    fixed per-superstep barrier cost that scales only ~1.2x with cores; the
    scale question is whether it stays sub-dominant as frontier deltas
    grow. Page COUNT is what grows its input (candidates are URLs, not
    bodies), so the 10x run multiplies pages-per-host by 10 and shrinks
    bodies 64->16 KiB: shrinking bodies shrinks the fetch/parse compute,
    which makes cand_dedup's share LARGER — i.e. the test is conservative.
    Appends a '## Barrier share' section to BENCH/BASELINE.md (inside the
    carried-over history region, so --scaling rewrites preserve it)."""
    import tempfile

    _refuse_dirty_box()
    s_hosts = int(os.environ.get("SPARK_GRAFT_SCALE_HOSTS", "64"))
    s_pages = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "2400"))
    s_fanout = int(os.environ.get("SPARK_GRAFT_SCALE_FANOUT", "8"))
    s_mega = int(os.environ.get("SPARK_GRAFT_SCALE_MEGA", "4"))
    cpus = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2")) * 4
    mult = int(os.environ.get("SPARK_GRAFT_SCALE_10X_MULT", "10"))

    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        zpath = _build_pyfiles_zip(tmp)
        for tag, pages, body_kb in (("1x", s_pages, 16),
                                    ("10x", s_pages * mult, 16)):
            stats = _submit_crawl_level(
                cpus, zpath, tmp, s_hosts=s_hosts, s_pages=pages,
                s_fanout=s_fanout, s_mega=s_mega, s_body_kb=body_kb)
            out[tag] = {
                "corpus_pages": stats["corpus_pages"],
                "wall_sec": stats["wall_sec"],
                "urls_per_sec": stats["urls_per_sec"],
                "supersteps": stats["supersteps"],
                "phases": _phase_shares(stats),
            }
    lines = [
        "", "## Barrier share at 10x corpus (cand_dedup sub-dominance)", "",
        f"Same job at local[{cpus}], 16 KiB bodies (conservative: smaller",
        "bodies shrink the scaling compute, INFLATING the barrier share),",
        f"pages-per-host x{mult}. cand_dedup = candidate explode +",
        "first-wins agg + seen anti-join — the phase that only scaled",
        "~1.2x with cores; the question is whether it stays sub-dominant",
        "when frontier deltas grow 10x.", "",
        "| corpus | pages | wall (s) | URLs/s | cand_dedup total (s) "
        "| cand_dedup share |",
        "|---|---|---|---|---|---|",
    ]
    for tag in ("1x", "10x"):
        r = out[tag]
        cd = r["phases"].get("cand_dedup", {"total_sec": 0, "share": 0})
        lines.append(
            f"| {tag} | {r['corpus_pages']} | {r['wall_sec']} "
            f"| {r['urls_per_sec']} | {cd['total_sec']} "
            f"| {cd['share'] * 100:.1f}% |")
    lines += ["", "Full phase totals (s):", ""]
    for tag in ("1x", "10x"):
        ph = ", ".join(f"{k} {v['total_sec']}"
                       for k, v in out[tag]["phases"].items())
        lines.append(f"- {tag}: {ph}")
    lines.append("")
    with open("BENCH/BASELINE.md", "a") as f:
        f.write("\n".join(lines))
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--barrier-share" in sys.argv:
        main_barrier_share()
    elif os.environ.get("_SUCKIT_BENCH_CRAWL_ONLY"):
        spark = build_spark(CPUS)
        spark.sparkContext.setLogLevel("ERROR")
        warm_session(spark)
        stats = run_crawl(spark, CPUS)
        print(json.dumps({"crawl": stats}))
        spark.stop()
    else:
        main_bench()
