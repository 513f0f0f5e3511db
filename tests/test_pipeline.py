"""Crawl → corpus bridge (suckit_spark/pipeline.py): the documents table
built from a finished crawl feeds the curation operators directly, and its
``text`` is byte-identical to the text of the ORIGINAL fetched page (the
input_hint invariant — link rewriting never touches character data)."""

from pyspark.sql import functions as F

from suckit_spark import CrawlConfig, crawl, pipeline
from suckit_spark.functions import htmlkit
from suckit_spark.operators import webtext
from suckit_spark.sources import fixtures


def _run(spark):
    cfg = CrawlConfig(origin="http://0.0.0.0/", continue_on_error=True)
    return crawl(spark, cfg, fixtures.pages_df(spark, fixtures.site_a()))


def test_corpus_text_matches_original_pages(spark):
    res = _run(spark)
    corpus = pipeline.corpus_from_crawl(spark, res)
    got = {r.url: r for r in corpus.collect()}

    # oracle: extract_text over the ORIGINAL (pre-rewrite) page bytes
    originals = {
        r["url"]: htmlkit.extract_text(
            r["html"].decode("utf-8", errors="replace"))
        for r in fixtures.site_a()
        if (r.get("content_type") or "text/html").startswith("text/html")}
    crawled_html = set(got) & set(originals)
    assert crawled_html  # the site's html pages were crawled
    for url in crawled_html:
        assert got[url].text == originals[url], url

    # schema contract: every column the webtext operators consume
    row = next(iter(got.values()))
    assert row.source == "0.0.0.0"
    assert row.n_chars == len(row.text)
    assert isinstance(row.doc_id, int)
    res.close()


def test_corpus_feeds_curation_operators(spark):
    res = _run(spark)
    corpus = pipeline.corpus_from_crawl(spark, res)
    n = corpus.count()

    # the whole curation chain runs on the bridged table unmodified
    assert webtext.exact_dedup(corpus).count() <= n
    q = webtext.quality_score(corpus)
    assert q.count() == n and "quality" in q.columns
    sampled = webtext.stratified_sample(
        corpus, rates={"0.0.0.0": 1.0}, default_rate=0.0)
    assert sampled.count() == n  # every doc is from the crawled host
    reps = webtext.repetition_scores(corpus)
    assert reps.count() == n
    res.close()


def test_page_store_exposes_all_supersteps(spark):
    res = _run(spark)
    store = pipeline.page_store(spark, res)
    assert store.select("superstep").distinct().count() == res.supersteps
    # error rows (dead cross-host links) are visible here, not in the mirror
    assert store.filter(F.col("status") == "error").count() >= 0
    res.close()
