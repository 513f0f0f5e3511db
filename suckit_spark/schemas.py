"""Explicit StructType constants for every table the engine touches.

The reference is schema-fixed at compile time (SURVEY.md §1); we mirror that —
no inference anywhere.
"""

from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, IntegerType, LongType, StringType,
    StructField, StructType, TimestampType,
)

#: Common-Crawl-style pages corpus (BASELINE.json:input_hint) plus the fetch-
#: simulation columns the fixture sites need (FIXTURES.md §1).
PAGES_SCHEMA = StructType([
    StructField("url", StringType()),                 # absolute, fragment-free
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("content_type", StringType()),        # nullable -> text/html
    StructField("content_disposition", StringType()),
    StructField("requires_auth", BooleanType()),
    StructField("auth_user", StringType()),
    StructField("auth_pass", StringType()),
    StructField("status", IntegerType()),
])

#: One frontier row = reference work-queue item (Url, depth, ext_depth)
#: (scraper.rs:40-41) + the deterministic ordering key: order_key is the chain
#: of link positions from the origin (parent's key + this link's document-order
#: index). (superstep, order_key) sorts rows in exactly the order the
#: reference's FIFO channel would deliver them with jobs=1.
FRONTIER_SCHEMA = StructType([
    StructField("url", StringType()),                 # full URL incl. fragment
    StructField("fetch_url", StringType()),           # fragment-free join key
    StructField("depth", IntegerType()),
    StructField("ext_depth", IntegerType()),
    StructField("superstep", IntegerType()),
    StructField("order_key", ArrayType(LongType())),
])

SEEN_SCHEMA = StructType([
    StructField("url", StringType()),                 # fragment-INCLUSIVE (scraper.rs:202)
    StructField("superstep", IntegerType()),
])

#: Output of the fused per-page Arrow stage (P1-P11): one row per fetched page.
PAGE_RESULT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("fetch_url", StringType()),
    StructField("depth", IntegerType()),
    StructField("ext_depth", IntegerType()),
    StructField("superstep", IntegerType()),
    StructField("order_key", ArrayType(LongType())),
    StructField("status", StringType()),              # ok | error
    StructField("http_status", IntegerType()),
    StructField("kind", StringType()),                # html | other
    StructField("path", StringType()),                # to_path(url, False)
    StructField("filename", StringType()),            # content-disposition name
    StructField("content", BinaryType()),             # rewritten / passthrough
    StructField("page_text", StringType()),           # extracted text contract
    StructField("charset", StringType()),
    StructField("download", BooleanType()),           # download-filter verdict
    StructField("links", ArrayType(StructType([
        StructField("raw", StringType()),             # raw attribute value
        StructField("url", StringType()),             # resolved, incl. fragment
        StructField("pos", IntegerType()),            # document-order index
        StructField("external", BooleanType()),
    ]))),
    #: live mode only: the response's Set-Cookie header(s), newline-joined —
    #: the driver folds them into the next superstep's requests (the
    #: distributed realization of the reference's client-wide cookie store,
    #: downloader.rs:73-83). Always null in corpus mode.
    StructField("set_cookie", StringType()),
])

CRAWL_LOG_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("depth", IntegerType()),
    StructField("ext_depth", IntegerType()),
    StructField("superstep", IntegerType()),
    StructField("order_key", ArrayType(LongType())),
    StructField("visit_seq", LongType()),
    StructField("downloaded", BooleanType()),
    StructField("status", StringType()),
])

MIRROR_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("path", StringType()),
    StructField("filename", StringType()),
    StructField("content", BinaryType()),
    StructField("superstep", IntegerType()),
    StructField("symlink_target", StringType()),
])

#: Per-superstep, per-host metrics + per-partition lineage (north_rule).
METRICS_SCHEMA = StructType([
    StructField("superstep", IntegerType()),
    StructField("host", StringType()),
    StructField("pages", LongType()),
    StructField("bytes", LongType()),
    StructField("errors", LongType()),
    StructField("new_urls", LongType()),
])
