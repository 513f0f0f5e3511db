#!/usr/bin/env python3
"""One-off probe: what does a superstep's fetch join actually cost, and does
an IN-pushed frontier prune the corpus scan?

Times, on the scaling-bench corpus shape (bucketed, 64 KiB bodies):
  a) full-scan left join (big-frontier shape)
  b) IN-filtered join, default parquet inFilterThreshold (10 -> range)
  c) IN-filtered join, inFilterThreshold raised (real In predicate ->
     column-index page pruning within sorted buckets)
Prints scan plans' SelectedBucketsCount + wall times. Run alone on the box.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

HOSTS = int(os.environ.get("PROBE_HOSTS", "64"))
PAGES = int(os.environ.get("PROBE_PAGES", "2400"))
BODY_KB = int(os.environ.get("PROBE_BODY_KB", "64"))
CPUS = int(os.environ.get("PROBE_CPUS", "8"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS * 2))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from suckit_spark.sources import corpus  # noqa: E402

tmp = tempfile.mkdtemp(prefix="probe_corpus_")
gen = corpus.gen_corpus_df(spark, HOSTS, PAGES, fanout=8, mega_host_factor=4,
                           partitions=CPUS * 2, body_kb=BODY_KB)
t0 = time.monotonic()
pages = corpus.prepare_pages_table(
    spark, gen, os.path.join(tmp, "pages"), n_buckets=64,
    table_name="probe_pages")
n = pages.count()
print(f"corpus {n} pages built in {time.monotonic()-t0:.1f}s", flush=True)

fetch_cols = pages.select("url", "html", "content_type", "status")
pages_k = fetch_cols.withColumnRenamed("url", "page_url")

# frontier: 100 scattered urls
urls = [corpus.page_url(h % HOSTS, (h * 37) % PAGES, HOSTS) for h in range(100)]
frontier = spark.createDataFrame([(u,) for u in urls], "fetch_url string")


def run(tag, pk):
    joined = frontier.join(pk, F.col("fetch_url") == F.col("page_url"), "left")
    t = time.monotonic()
    out = joined.select(F.count("html")).head()[0]
    w = time.monotonic() - t
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted")
    sel = [ln.strip() for ln in plan.splitlines()
           if "SelectedBucketsCount" in ln or "PushedFilters" in ln]
    print(f"{tag}: {w:.2f}s matched={out} {sel[:2]}", flush=True)


run("warmup-full", pages_k)
run("a full-scan", pages_k)
run("b IN thr=10", pages_k.filter(F.col("page_url").isin(urls)))
spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "5000")
run("c IN thr=5000", pages_k.filter(F.col("page_url").isin(urls)))
spark.conf.set("spark.sql.optimizer.inSetConversionThreshold", "100000")
run("d In-expr thr=5000", pages_k.filter(F.col("page_url").isin(urls)))

spark.sql("DROP TABLE IF EXISTS probe_pages")
import shutil
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
