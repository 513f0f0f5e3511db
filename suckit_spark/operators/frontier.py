"""Frontier scheduling operators: per-host politeness budgets and skew-aware
repartitioning.

The reference's only scheduler is an unbounded FIFO channel — no host
fairness, and politeness is a per-worker sleep (scraper.rs:50,337-350). At
scale both become explicit set operations (north_rule):

* politeness: within a superstep, each host fetches at most ``budget`` URLs;
  the overflow is *deferred* to the next superstep in stable (order_key)
  order — no work is ever dropped, the crawl stays fully deterministic for a
  given config, and no host is hammered with an unbounded burst. (Deferral
  can shift which parent first discovers a URL, so the visit order is the
  budgeted crawl's own canonical order, not the unbudgeted one's.)
* skew: the frontier is repartitioned on the url hash; hosts that dominate a
  superstep get an extra salt so one mega-host cannot serialize a stage onto
  a single task (SURVEY.md §2.4 C4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def host_col(url_col: str = "fetch_url") -> F.Column:
    """Lowercased host without port, JVM-side (parse_url is codegen'd)."""
    return F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))


def apply_host_budget(frontier: DataFrame, budget: int | None):
    """Split the frontier into (selected, deferred) by per-host rank.

    Rank order is the canonical visit order (order_key), so deferral never
    reorders the crawl — deferred rows keep their order_key and sort ahead of
    anything discovered later.
    """
    if budget is None:
        return frontier, None
    w = Window.partitionBy(host_col()).orderBy(F.col("order_key"))
    ranked = frontier.withColumn("__rank", F.row_number().over(w))
    selected = ranked.filter(F.col("__rank") <= budget).drop("__rank")
    deferred = ranked.filter(F.col("__rank") > budget).drop("__rank")
    return selected, deferred


def repartition_frontier(
    frontier: DataFrame,
    num_partitions: int | None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Spread the fetch stage evenly: partition by (url hash, salt).

    The salt term is derived from the full URL hash, so rows of one mega-host
    (which share a host but not a url) already spread; the explicit composite
    key documents intent and keeps the partitioning stable for AQE to refine.
    """
    keys = [F.xxhash64("fetch_url"), F.pmod(F.xxhash64("url", F.lit(7)), F.lit(salt_buckets))]
    if num_partitions:
        return frontier.repartition(num_partitions, *keys)
    return frontier.repartition(*keys)
