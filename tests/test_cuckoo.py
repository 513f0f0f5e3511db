"""Cuckoo-filter seen-set (operators/cuckoo.py): membership, DELETION,
growth, exact-backstop parity, and the crawl-level seen_sketch="cuckoo"
mode (north_star: cuckoo fallback for deletions)."""

from pyspark.sql import functions as F

from suckit_spark.config import CrawlConfig
from suckit_spark.operators import dedup as dedup_ops
from suckit_spark.operators.cuckoo import CuckooState
from suckit_spark.oracle import crawl_oracle
from suckit_spark.plans.crawl import crawl
from suckit_spark.sources import corpus
from suckit_spark.sources.fixtures import pages_df


def urls_df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("http://h.example/u"), "id").alias("url"))


def test_no_false_negatives_and_low_fp(spark):
    st = CuckooState("url", capacity=20_000)
    st.add(urls_df(spark, 0, 5000), 5000)
    present = urls_df(spark, 0, 5000).withColumn(
        "mc", st.might_contain_col(spark, F.col("url")))
    assert present.filter(~F.col("mc")).count() == 0  # never a false negative
    absent = urls_df(spark, 5000, 15_000).withColumn(
        "mc", st.might_contain_col(spark, F.col("url")))
    fps = absent.filter(F.col("mc")).count()
    assert fps < 30  # ~1.2e-4 expected over 10k probes

def test_delete_unsees(spark):
    st = CuckooState("url", capacity=20_000)
    st.add(urls_df(spark, 0, 4000), 4000)
    removed = st.delete(urls_df(spark, 0, 1000))
    assert removed == 1000
    gone = urls_df(spark, 0, 1000).withColumn(
        "mc", st.might_contain_col(spark, F.col("url")))
    # deleted urls read unseen again (up to fp collisions with the 3000 kept)
    assert gone.filter(F.col("mc")).count() < 5
    kept = urls_df(spark, 1000, 4000).withColumn(
        "mc", st.might_contain_col(spark, F.col("url")))
    assert kept.filter(~F.col("mc")).count() == 0  # deletes never break kept


def test_growth_rebuild(spark):
    st = CuckooState("url", capacity=1000)
    st.add(urls_df(spark, 0, 900), 900)
    st.add(urls_df(spark, 900, 3000), 2100, full_seen=urls_df(spark, 0, 3000))
    assert st.capacity >= 3000
    present = urls_df(spark, 0, 3000).withColumn(
        "mc", st.might_contain_col(spark, F.col("url")))
    assert present.filter(~F.col("mc")).count() == 0


def test_anti_join_with_cuckoo_state_exact(spark):
    st = CuckooState("url", capacity=10_000)
    st.add(urls_df(spark, 0, 2000), 2000)
    cand = urls_df(spark, 1500, 2500)
    out = dedup_ops.anti_join_seen(
        cand, urls_df(spark, 0, 2000), "url", bloom_state=st)
    got = {r.url for r in out.collect()}
    assert got == {f"http://h.example/u{i}" for i in range(2000, 2500)}


def test_crawl_with_cuckoo_sketch_matches_oracle(spark):
    n_hosts, per_host = 4, 10
    rows = corpus.gen_corpus_rows(n_hosts, per_host, fanout=2)
    cfg = CrawlConfig(origin=corpus.page_url(1, 0, n_hosts), ext_depth=-1,
                      continue_on_error=True, bloom_threshold=1,
                      seen_sketch="cuckoo")
    oracle = crawl_oracle(cfg, {r["url"]: r for r in rows})
    result = crawl(spark, cfg, pages_df(spark, rows))
    assert {r.url for r in result.seen.collect()} == oracle.seen
    assert [r.url for r in result.crawl_log.orderBy("visit_seq").collect()] \
        == oracle.visited


def test_delete_decrements_count(spark):
    st = CuckooState("url", capacity=20_000)
    st.add(urls_df(spark, 0, 4000), 4000)
    assert st.count == 4000
    removed = st.delete(urls_df(spark, 0, 1500))
    assert removed == 1500
    assert st.count == 2500  # growth accounting follows real occupancy


def test_cuckoo_growth_without_full_seen_raises(spark):
    import pytest

    st = CuckooState("url", capacity=1000)
    st.add(urls_df(spark, 0, 900), 900)
    with pytest.raises(ValueError, match="full_seen"):
        st.add(urls_df(spark, 900, 3000), 2100)
    # previously-added urls still read seen (state not corrupted by the raise)
    present = urls_df(spark, 0, 900).withColumn(
        "mc", st.might_contain_col(spark, F.col("url")))
    assert present.filter(~F.col("mc")).count() == 0


def test_bloom_growth_without_full_seen_raises(spark):
    import pytest

    st = dedup_ops.BloomState("url", capacity=1000, fpp=0.03)
    st.add(urls_df(spark, 0, 900), 900)
    with pytest.raises(ValueError, match="full_seen"):
        st.add(urls_df(spark, 900, 3000), 2100)
    present = urls_df(spark, 0, 900).withColumn(
        "mc", st.might_contain_col(spark, F.col("url")))
    assert present.filter(~F.col("mc")).count() == 0
