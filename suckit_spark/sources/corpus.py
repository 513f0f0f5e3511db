"""Deterministic synthetic web corpus generator (FIXTURES.md §5).

Builds a seeded host/link graph standing in for the 10^10-URL design point:
``n_hosts`` hosts of ``pages_per_host`` pages, each page linking ``fanout``
same-host pages plus one cross-host page, with one mega-host carrying
``mega_host_factor ×`` the pages (the skew/salting stressor, SURVEY.md §2.4
C4). Everything is a pure function of (indices, seed) — no randomness at
generation time beyond the seed, no external data.

Generation is distributed: the driver creates only the (host, page) index
ranges; page bodies are rendered executor-side in a mapInPandas stage, so a
10^6-page corpus never passes through the driver.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import htmlkit
from ..schemas import PAGES_SCHEMA

WARC_TS = datetime.datetime(2026, 1, 1, 0, 0, 0)


def host_name(i: int, n_hosts: int) -> str:
    return f"h{i}.example"


def page_url(host_i: int, page_j: int, n_hosts: int) -> str:
    return f"http://{host_name(host_i, n_hosts)}/p{page_j}.html"


def page_body(host_i: int, page_j: int, n_hosts: int, pages: int,
              fanout: int, seed: int, body_kb: int = 0) -> bytes:
    """Render one page: ``fanout`` same-host links (deterministic stride) and
    one cross-host link. ``body_kb`` pads the page with deterministic filler
    paragraphs to roughly that many KiB — real Common-Crawl pages are tens of
    KB, and a compute-representative corpus needs the parse/rewrite stage to
    scan realistic byte volumes (the scaling bench sets this; unit tests keep
    it 0 for speed)."""
    links = []
    for k in range(1, fanout + 1):
        target = (page_j * k + k + seed) % pages
        links.append(f'<a href="p{target}.html">l{k}</a>')
    cross_host = (host_i + page_j + 1) % n_hosts
    cross_page = (page_j * 7 + seed) % pages
    links.append(
        f'<a href="http://{host_name(cross_host, n_hosts)}/p{cross_page}.html">x</a>')
    filler = ""
    if body_kb > 0:
        para = (f"<p>Filler paragraph {{i}} for host {host_i} page {page_j} "
                f"seed {seed}: the quick brown fox jumps over the lazy dog "
                "while zero-copy Arrow batches stream columnar bytes through "
                "a fused scan stage.</p>\n")
        per = len(para)
        n_paras = max(1, (body_kb * 1024) // per)
        filler = "".join(para.format(i=i) for i in range(n_paras))
    body = (
        "<!DOCTYPE html>\n<html><head><meta charset=\"UTF-8\">"
        f"<title>h{host_i} p{page_j}</title></head>\n<body>\n"
        f"<p>Deterministic sentence for host {host_i} page {page_j} "
        f"seed {seed}.</p>\n" + filler + "\n".join(links) + "\n</body></html>\n"
    )
    return body.encode("utf-8")


def page_row(host_i: int, page_j: int, n_hosts: int, pages: int,
             fanout: int, seed: int, body_kb: int = 0) -> dict:
    body = page_body(host_i, page_j, n_hosts, pages, fanout, seed, body_kb)
    return {
        "url": page_url(host_i, page_j, n_hosts),
        "warc_ts": WARC_TS,
        "html": body,
        "text": htmlkit.extract_text(body.decode("utf-8")),
        "lang": "en",
        "content_type": "text/html",
        "content_disposition": None,
        "requires_auth": False,
        "auth_user": None,
        "auth_pass": None,
        "status": 200,
    }


def gen_corpus_rows(n_hosts: int, pages_per_host: int, fanout: int = 3,
                    mega_host_factor: int = 1, seed: int = 42,
                    body_kb: int = 0) -> list[dict]:
    """Driver-side generation (tests only — small corpora)."""
    rows = []
    for i in range(n_hosts):
        pages = pages_per_host * (mega_host_factor if i == 0 else 1)
        for j in range(pages):
            rows.append(page_row(i, j, n_hosts, pages, fanout, seed, body_kb))
    return rows


def gen_corpus_df(spark: SparkSession, n_hosts: int, pages_per_host: int,
                  fanout: int = 3, mega_host_factor: int = 1,
                  seed: int = 42, partitions: int | None = None,
                  body_kb: int = 0) -> DataFrame:
    """Distributed generation: explode (host, page) index space executor-side,
    render bodies in a vectorized stage."""
    import pandas as pd

    hosts = spark.range(n_hosts).select(
        F.col("id").cast("int").alias("host_i"),
        F.when(F.col("id") == 0, pages_per_host * mega_host_factor)
        .otherwise(pages_per_host).alias("pages"),
    )
    idx = hosts.select(
        "host_i", "pages",
        F.explode(F.sequence(F.lit(0), F.col("pages") - 1)).alias("page_j"),
    )
    if partitions:
        idx = idx.repartition(partitions, "host_i", "page_j")

    def render(batches):
        for pdf in batches:
            out = [
                page_row(int(r.host_i), int(r.page_j), n_hosts, int(r.pages),
                         fanout, seed, body_kb)
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame(out)

    return idx.mapInPandas(render, PAGES_SCHEMA)


def prepare_pages_table(
    spark: SparkSession,
    pages: DataFrame,
    path: str,
    n_buckets: int = 64,
    table_name: str = "pages_bucketed",
) -> DataFrame:
    """Write ``pages`` as a url-bucketed+sorted parquet table and return a
    DataFrame scanning it — the first-class fetch-side layout.

    This is the sandbox stand-in for Iceberg ``bucket(N, url)`` partitioning
    (north_rule): the per-superstep fetch join exchanges ONLY the frontier;
    the corpus scan reuses the bucket partitioning, and with
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` plus the
    pre-repartition below (one file per bucket) the sort-merge join consumes
    the on-disk order directly — no per-superstep corpus exchange OR sort.

    Bucket count is a property of the TABLE, not of this run's parallelism:
    N- and 4N-core clusters read the identical layout (BASELINE.md scaling
    protocol).
    """
    (pages.repartition(n_buckets, "url")
        .write.format("parquet")
        .bucketBy(n_buckets, "url").sortBy("url")
        .option("path", path).mode("overwrite")
        .saveAsTable(table_name))
    return spark.table(table_name)


def corpus_pages_dict(n_hosts: int, pages_per_host: int, fanout: int = 3,
                      mega_host_factor: int = 1, seed: int = 42) -> dict[str, dict]:
    return {r["url"]: r
            for r in gen_corpus_rows(n_hosts, pages_per_host, fanout,
                                     mega_host_factor, seed)}
