"""suckit_spark: a from-scratch PySpark-native reimplementation of the crawl
semantics of Skallwar/suckit as a bulk-synchronous frontier over Parquet
tables (SURVEY.md is the blueprint; /root/reference is the behavioral spec)."""

from .config import CrawlConfig, INFINITE_DEPTH
from .plans.crawl import crawl, CrawlResult, CrawlAbort

__all__ = ["CrawlConfig", "INFINITE_DEPTH", "crawl", "CrawlResult", "CrawlAbort"]
